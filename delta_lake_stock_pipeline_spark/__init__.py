"""PySpark-native analytics engine with the capabilities of
lubobali/delta-lake-stock-pipeline, generalized and extended.

Built from scratch, Spark-first: DataFrame/SQL logical plans optimized by
Catalyst, columnar parquet storage with partition pruning, pandas-UDF escape
hatches only where built-in operators cannot express the semantics.

Layout (SURVEY.md SS7):
    session      -- SparkSession builder (AQE, Arrow, shuffle sizing)
    sources      -- fixture loaders, view registration, stock synthesizer
    operators    -- relational query library: one public fn per operator,
                    signature ``(spark, sf_dir) -> DataFrame``
    functions    -- reusable column-expression helpers (temporal, json, vector)
    plans        -- storage lifecycle: partitioned writes, compaction,
                    z-order emulation, health checks, catalog DDL
    streaming    -- Structured Streaming operators (windows, watermarks)
"""

__version__ = "0.1.0"
