"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["spread"]


def spread(df: DataFrame, multiple: int = 1) -> DataFrame:
    """Guarantee at least ``defaultParallelism * multiple`` partitions
    before a compute-heavy map stage (signatures, sketches, UDF batches).

    Parquet splits at row-group granularity, so a small input file plans
    as ONE task and serializes an expensive per-row computation on a
    single core no matter how many the cluster has.  At 100 TB the scan
    already yields thousands of splits and this is a no-op — the guard
    only fires in the small-input regime, where the round-robin shuffle
    it adds is proportionally tiny.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * multiple
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
