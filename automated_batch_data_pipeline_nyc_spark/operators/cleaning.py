"""The reference's core cleaning job, reimagined Spark-first.

Reference pipeline (spark-apps/clean_nyc_taxi_pipeline.py:7-19):
    read.parquet -> dropna() -> dropDuplicates() ->
    withColumn('pickup_month', month(pickup_ts)) -> coalesce(1).write.csv

Engine version: same logical transform, but the CSV hop is gone (type
erasure + re-inference made the reference lossy) and the sink is
month-partitioned Parquet (the reference's own commented-out intent at
spark-apps/clean_nyc_taxi_pipeline.py:16).

Scale notes:
- ``dropna``/``withColumn`` are narrow — no shuffle.
- ``dropDuplicates()`` is the one shuffle: a hash repartition on all
  columns with map-side partial aggregation.  At 100 TB this is the
  dominant cost; AQE coalesces the post-shuffle partitions and handles
  skew.  For the keyed variant pass ``subset`` so the shuffle hashes
  only the key columns (narrower exchange rows).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import month_of_year

__all__ = [
    "clean_pipeline",
    "drop_null_rows",
    "dedup_exact_rows",
    "with_derived_month",
    "enforce_schema",
    "impute_group_mean",
]


def drop_null_rows(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """P1: df.dropna() — drop rows with any NULL (optionally keyed)."""
    return df.dropna(how="any", subset=list(subset) if subset else None)


def dedup_exact_rows(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """P2: exact duplicate removal.  Full-row or keyed."""
    return df.dropDuplicates(list(subset)) if subset else df.dropDuplicates()


def with_derived_month(df: DataFrame, ts_col: str, out_col: str = "pickup_month") -> DataFrame:
    """P3/F3: the reference's derived ``pickup_month`` column."""
    return df.withColumn(out_col, month_of_year(ts_col))


def clean_pipeline(
    df: DataFrame,
    ts_col: str,
    month_col: str = "pickup_month",
    dropna_subset: Sequence[str] | None = None,
    dedup_subset: Sequence[str] | None = None,
    extra_columns: dict[str, Column] | None = None,
) -> DataFrame:
    """P1 -> P2 -> P3 composed: the end-to-end cleaning slice."""
    out = drop_null_rows(df, dropna_subset)
    out = dedup_exact_rows(out, dedup_subset)
    out = with_derived_month(out, ts_col, month_col)
    for name, col in (extra_columns or {}).items():
        out = out.withColumn(name, col)
    return out


def enforce_schema(
    df: DataFrame,
    schema,
    drop_extra: bool = True,
    fail_on_missing: bool = True,
) -> DataFrame:
    """Align an incoming frame to a contract schema: project columns in
    the contract's order, cast each to the contracted type, drop (or
    reject) extras, and NULL-fill or reject missing columns.

    The ingest-time guard a long-lived pipeline needs once producers
    evolve independently (the reference's autodetect-everywhere posture
    — dags/nyc_taxi_pipeline_dag.py:119 — silently propagates drift
    instead).  Casting uses Spark ``cast`` semantics (non-coercible
    values become NULL, surfaced by the quality gates downstream).
    Map-only: projections and casts never shuffle.
    """
    in_cols = set(df.columns)
    contract = {f.name: f.dataType for f in schema.fields}
    missing = [c for c in contract if c not in in_cols]
    if missing and fail_on_missing:
        raise ValueError(f"enforce_schema: missing columns {missing}")
    extra = [c for c in df.columns if c not in contract]
    if extra and not drop_extra:
        raise ValueError(f"enforce_schema: unexpected columns {extra}")
    return df.select(
        *[
            (F.col(name) if name in in_cols else F.lit(None)).cast(dtype).alias(name)
            for name, dtype in contract.items()
        ]
    )


def impute_group_mean(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    out_col: str | None = None,
    decimal_type: str = "decimal(18,2)",
) -> DataFrame:
    """Null imputation with the GROUP mean of the observed values — the
    standard feature-repair step between :func:`drop_null_rows` (too
    destructive when the column is merely sparse) and a constant
    ``fill_defaults`` (too blunt when groups differ systematically).

    The mean is computed per group over non-null values only, as an
    exact DECIMAL sum divided once by the non-null count — the same
    cross-engine exactness recipe as the money aggregates (float
    summation order can never shift an imputed value).  A group with no
    observed values at all keeps its NULLs (0/0 — surfaced, not
    invented; chain a global-constant fill if needed).

    Adds ``out_col`` (default ``{value_col}_imputed``) and
    ``{value_col}_was_null``; original columns pass through.

    Plan shape: ONE shuffle on the group key (a window over the
    partition — both the sum and count land in the same Window node),
    then map-only coalesce.  Key the group on a corpus-cardinality
    column: a handful of huge groups hits the single-task-per-group
    window limit documented at ``window_percentile_ranks``.
    """
    from pyspark.sql import Window

    out_col = out_col or f"{value_col}_imputed"
    w = Window.partitionBy(*group_cols)
    v = F.col(value_col)
    mean = (
        F.sum(v.cast(decimal_type)).over(w).cast("double")
        / F.count(v).over(w).cast("double")
    )
    return df.withColumns(
        {
            f"{value_col}_was_null": v.isNull(),
            out_col: F.coalesce(v, mean),
        }
    )
