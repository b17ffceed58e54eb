from __future__ import annotations

import os

import pytest

from delta_lake_stock_pipeline_spark.session import get_spark

# Default sf0.001 keeps the suite fast; set SPARK_GRAFT_TEST_SF_DIR to run
# the same assertions at the driver's correctness scale (sf0.01) or above.
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="tests", shuffle_partitions=8)
    yield spark
    from delta_lake_stock_pipeline_spark.operators.dedup import clear_posts_cache
    from delta_lake_stock_pipeline_spark.operators.formats import (
        clear_roundtrip_dirs,
    )
    from delta_lake_stock_pipeline_spark.operators.storage_lifecycle import (
        clear_lifecycle_dirs,
    )
    from delta_lake_stock_pipeline_spark.operators.similarity import (
        clear_ann_dirs,
    )
    from delta_lake_stock_pipeline_spark.streaming.windows import clear_mv_dirs

    clear_posts_cache()
    clear_roundtrip_dirs()
    clear_lifecycle_dirs()
    clear_mv_dirs()
    clear_ann_dirs()
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
