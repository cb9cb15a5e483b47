"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship reference-shaped pipeline at
sf0.001; ``queries()``/``oracle_sql()`` expose the full declared suite
(automated_batch_data_pipeline_nyc_spark.suite) — one entry per operator from SURVEY.md §2 plus the
LLM-pipeline additions, each with a DuckDB oracle where the semantics
are SQL-expressible.

IMPORTANT — 50-slot verification window: the driver hash-verifies only
the FIRST 50 entries of ``queries()`` per round, in iteration order.
That order is therefore set EXPLICITLY by ``suite.DRIVER_WINDOW`` (the
round's verification budget) followed by the never-verified queue and
then previously-green queries; registering a new query does NOT put it
in the window — add it to ``DRIVER_WINDOW`` (evicting something
deliberately) or to ``_NEXT_WINDOW_QUEUE``.  tests/test_suite_contract.py
pins the window so accidental evictions fail CI.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from automated_batch_data_pipeline_nyc_spark.suite import QUERIES, oracle_queries, spark_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's whole DAG (clean -> quality gates ->
    time-bucket enrichment -> modeled aggregate) on sf0.001 events."""
    from automated_batch_data_pipeline_nyc_spark.plans import run_reference_pipeline
    from automated_batch_data_pipeline_nyc_spark.sources import read_parquet

    events = read_parquet(spark, "/root/testdata/sf0.001/events.parquet")
    results = run_reference_pipeline(spark, events)
    return results["model"]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return spark_queries()


def oracle_sql() -> dict[str, str]:
    return oracle_queries()
