"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["spread", "epoch_micros"]


def epoch_micros(df: DataFrame, col_name: str) -> Column:
    """Integer microseconds-since-epoch for a timestamp column — the
    same number for TIMESTAMP and TIMESTAMP_NTZ inputs, independent of
    ``spark.sql.session.timeZone``.

    ``unix_micros`` only accepts TIMESTAMP (LTZ); casting NTZ→LTZ first
    would re-interpret the wall-clock value in the *session* zone, so a
    consumer running in a non-UTC session would get shifted integers.
    For NTZ we instead subtract the NTZ epoch literal with
    ``timestampdiff`` — pure wall-clock arithmetic, no zone anywhere —
    which also matches DuckDB's ``epoch_us`` on its (naive) TIMESTAMP.
    """
    dtype = dict(df.dtypes).get(col_name)
    if dtype is None:
        raise ValueError(
            f"epoch_micros: column {col_name!r} not found in "
            f"[{', '.join(c for c, _ in df.dtypes)}]"
        )
    if dtype == "timestamp_ntz":
        return F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', `{col_name}`)"
        )
    if dtype != "timestamp":
        raise ValueError(
            f"epoch_micros: column {col_name!r} is {dtype}, expected "
            "timestamp or timestamp_ntz (cast dates/strings explicitly first)"
        )
    return F.unix_micros(F.col(col_name))


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
    # NOTE: df.rdd.getNumPartitions() forces plan analysis + physical
    # planning for `df` — cheap once per query, NOT cheap inside a loop.
    # Keep spread() at pipeline boundaries, never per-iteration.
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
