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
