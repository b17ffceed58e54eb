"""Source-format coverage beyond parquet (SURVEY.md §2.1): CSV and JSON
round-trips with explicit schemas (no inference -- the engine's schema
stance, `stock_harvester.py:51-61`), lossless for the flat events model.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from delta_lake_stock_pipeline_spark.sources.fixtures import load_table


def _events(spark, sf_dir):
    # Truncate ts to seconds: CSV/JSON default timestamp formats are
    # second-precision in round-trip; sub-second fidelity is a parquet
    # concern (covered by every other test).
    return (
        load_table(spark, sf_dir, "events")
        .withColumn("ts", F.date_trunc("second", "ts"))
        .limit(200)
    )


def _roundtrip(df, path, fmt, **read_opts):
    df.write.format(fmt).mode("overwrite").options(header=True).save(path)
    return (
        df.sparkSession.read.format(fmt)
        .options(**read_opts)
        .schema(df.schema)
        .load(path)
    )


def test_csv_roundtrip(spark, sf_dir, tmp_path):
    events = _events(spark, sf_dir)
    got = _roundtrip(events, str(tmp_path / "csv"), "csv", header=True)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, events.collect()))
    assert got.schema == events.schema


def test_json_roundtrip(spark, sf_dir, tmp_path):
    events = _events(spark, sf_dir)
    got = _roundtrip(events, str(tmp_path / "json"), "json")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, events.collect()))
    assert got.schema == events.schema


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    events = _events(spark, sf_dir)
    got = _roundtrip(events, str(tmp_path / "orc"), "orc")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, events.collect()))
    assert got.schema == events.schema


def test_python_datasource_plans_partition_per_ticker(spark):
    """The custom Python DataSource (Spark 4 connector API) must plan one
    InputPartition per ticker -- the distributed-fetch shape that replaces
    the reference's driver-side REST loop -- honor its options, and
    synthesize deterministically across reads."""
    from delta_lake_stock_pipeline_spark.sources.ticks import (
        register_ticks_source,
    )

    register_ticks_source(spark)
    df = (
        spark.read.format("spark_graft_ticks")
        .option("tickers", "AA,BB,CC")
        .option("n", "7")
        .load()
    )
    assert df.rdd.getNumPartitions() == 3
    rows = df.collect()
    assert len(rows) == 21
    assert {r["ticker"] for r in rows} == {"AA", "BB", "CC"}
    again = sorted(map(tuple, df.collect()))
    assert again == sorted(map(tuple, rows))
    # Executor-side rows match the driver-side formula bit-for-bit.
    from delta_lake_stock_pipeline_spark.sources.ticks import tick_row

    expected = sorted(
        tick_row(t, i, s)
        for i, t in enumerate(["AA", "BB", "CC"])
        for s in range(7)
    )
    assert again == expected
