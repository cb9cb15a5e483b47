from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "4g")

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    # Deliberately a VANILLA session, not the engine factory: the driver
    # verifies queries() with its own SparkSession, so the suite must be
    # correct without any factory-preset conf (the round-1 nanos-read
    # failure was exactly this gap).  Only parallelism/UI knobs here.
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master(f"local[{os.environ['SPARK_GRAFT_CPUS']}]")
        .appName("automated_batch_data_pipeline_nyc_spark-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.driver.memory", os.environ["SPARK_GRAFT_DRIVER_MEM"])
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("WARN")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_ORACLE
