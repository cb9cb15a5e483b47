"""External-JDBC branch of S5 against Spark's bundled embedded Derby
(VERDICT r9 item 5 — the last documented-untested §2 branch).

The reference's real external-database hop is the Postgres extract in
``dags/nyc_taxi_pipeline_dag.py:144-146``; the sandbox has no network
and no Postgres driver jar, but Spark ships Derby (the Hive-metastore
dependency), whose EMBEDDED driver runs a file-backed SQL database
inside the driver JVM — so the full external branch (write.jdbc
overwrite + append, spark.read.jdbc with bound-partitioned reads,
read_sql_table's jdbc_url path with predicate pushdown to the remote
engine) executes for real, no network needed.

At 100 TB the same code points at a real warehouse: the partitioned
read's (column, lowerBound, upperBound, numPartitions) turns into N
range-predicate queries issued from N executors in parallel, and the
pushed predicates run remotely so only matching rows cross the wire.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    """A file-backed embedded Derby database seeded with 1100 rows
    (1000 overwrite + 100 append — both write.jdbc modes exercised)."""
    home = tmp_path_factory.mktemp("derby_home")
    # keep derby.log inside the test tmp dir, not the repo cwd
    spark._jvm.java.lang.System.setProperty("derby.system.home", str(home))
    url = f"jdbc:derby:{home}/testdb;create=true"
    props = {"driver": DERBY_DRIVER}

    src = spark.range(0, 1000).select(
        "id",
        (F.col("id") % 7).alias("grp"),
        (F.col("id") * 2).cast("double").alias("val"),
    )
    src.write.jdbc(url, "events_ext", mode="overwrite", properties=props)
    extra = spark.range(1000, 1100).select(
        "id",
        (F.col("id") % 7).alias("grp"),
        (F.col("id") * 2).cast("double").alias("val"),
    )
    extra.write.jdbc(url, "events_ext", mode="append", properties=props)
    return url


def test_jdbc_write_read_roundtrip(spark, derby_url):
    got = spark.read.jdbc(
        derby_url, "events_ext", properties={"driver": DERBY_DRIVER}
    )
    assert got.count() == 1100
    agg = got.agg(
        F.sum("id").alias("s"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    assert agg.s == sum(range(1100)) and agg.n == 1100


def test_jdbc_partitioned_predicate_read(spark, derby_url):
    """Bound-partitioned read: N parallel range queries against the
    database, each executor fetching only its id stripe; a filter on
    top is PUSHED to the remote engine (visible in the scan's
    PushedFilters), so non-matching rows never cross the connection."""
    got = spark.read.jdbc(
        derby_url,
        "events_ext",
        column="id",
        lowerBound=0,
        upperBound=1100,
        numPartitions=4,
        properties={"driver": DERBY_DRIVER},
    )
    assert got.rdd.getNumPartitions() == 4
    flt = got.filter(F.col("grp") == 3)
    plan = flt._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters:" in plan and "EqualTo(grp,3)" in plan, plan
    expect = [i for i in range(1100) if i % 7 == 3]
    ids = sorted(r.id for r in flt.select("id").collect())
    assert ids == expect


def test_read_sql_table_external_branch(spark, derby_url):
    """S5's jdbc_url branch (sources/readers.py read_sql_table): the
    predicate lands in the JDBC scan's pushed filters and the rows
    round-trip exactly."""
    from automated_batch_data_pipeline_nyc_spark.sources.readers import (
        read_sql_table,
    )

    df = read_sql_table(
        spark,
        "events_ext",
        predicate="grp = 5 AND id < 100",
        jdbc_url=derby_url,
        driver=DERBY_DRIVER,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters:" in plan and "EqualTo(grp,5)" in plan, plan
    rows = sorted((r.id, r.val) for r in df.collect())
    assert rows == [(i, float(i * 2)) for i in range(100) if i % 7 == 5]


def test_jdbc_append_vs_overwrite_modes(spark, derby_url, tmp_path):
    """Write-mode semantics on the external branch: overwrite replaces
    the table, append accumulates (S10/S11 semantics over JDBC)."""
    url = derby_url
    props = {"driver": DERBY_DRIVER}
    t = "modes_ext"
    spark.range(0, 10).write.jdbc(url, t, mode="overwrite", properties=props)
    spark.range(10, 15).write.jdbc(url, t, mode="append", properties=props)
    assert spark.read.jdbc(url, t, properties=props).count() == 15
    spark.range(0, 3).write.jdbc(url, t, mode="overwrite", properties=props)
    assert spark.read.jdbc(url, t, properties=props).count() == 3
