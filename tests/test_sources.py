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


def _roundtrip(df, path, fmt, write_opts=None, **read_opts):
    df.write.format(fmt).mode("overwrite").options(
        header=True, **(write_opts or {})
    ).save(path)
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


def test_xml_roundtrip(spark, sf_dir, tmp_path):
    # Spark 4 built-in XML source; props holds JSON ('{', '"', ':') so the
    # round-trip exercises XML escaping of markup-significant characters.
    events = _events(spark, sf_dir)
    got = _roundtrip(
        events, str(tmp_path / "xml"), "xml",
        write_opts={"rowTag": "event"},
        rowTag="event", ignoreSurroundingSpaces="false",
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, events.collect()))
    assert got.schema == events.schema


def test_xml_escapes_markup_characters(spark, tmp_path):
    """Values containing XML metacharacters must survive the sink/source
    pair byte-for-byte -- the failure mode unique to a markup format."""
    rows = [(1, 'a<b>&"c"</b>'), (2, "x]]>y"), (3, "  pad  ")]
    df = spark.createDataFrame(rows, "id bigint, s string")
    path = str(tmp_path / "esc")
    df.write.format("xml").option("rowTag", "r").save(path)
    got = (
        spark.read.format("xml")
        .option("rowTag", "r")
        # default true TRIMS element text -- the markup-format gotcha this
        # test exists to pin (src_xml_roundtrip's reader sets it too)
        .option("ignoreSurroundingSpaces", "false")
        .schema(df.schema)
        .load(path)
    )
    assert sorted(map(tuple, got.collect())) == sorted(rows)


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
