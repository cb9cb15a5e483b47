"""Incremental-load operators: upsert merge and snapshot diff.

The reference's README promises (but never implements) monthly
incremental loading (README.md:220-222); its load path is append-only
``to_sql`` (dags/nyc_taxi_pipeline_dag.py:99).  These operators supply
the real warehouse semantics on plain DataFrames — no table-format
dependency — so a consumer can run MERGE-style reloads into partitioned
Parquet (pair with ``write_parquet``'s dynamic partition overwrite).

Scale notes:
- both are one full-outer shuffle on the key; with the target stored
  bucketed on the key (``write_table_bucketed``) the target side of
  that shuffle disappears.
- ``IS DISTINCT FROM`` (null-safe inequality) drives change detection —
  column-by-column, no row serialization, so it codegens and needs no
  cross-engine string formatting to verify.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["merge_upsert", "snapshot_diff"]


def merge_upsert(
    target: DataFrame, updates: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """MERGE: update matched rows from *updates*, keep unmatched target
    rows, insert unmatched update rows.  Both frames must share a
    schema; the result has the target's column order."""
    cols = target.columns
    if set(cols) != set(updates.columns):
        raise ValueError("merge_upsert requires identical schemas")
    non_keys = [c for c in cols if c not in keys]
    u = updates.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"__u_{c}") for c in non_keys],
    ).withColumn("__from_u", F.lit(True))
    j = target.join(u, on=list(keys), how="full_outer")
    return j.select(
        *[F.col(k) for k in keys],
        *[
            F.when(F.col("__from_u").isNotNull(), F.col(f"__u_{c}"))
            .otherwise(F.col(c))
            .alias(c)
            for c in non_keys
        ],
    ).select(*cols)


def snapshot_diff(
    old: DataFrame, new: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Row-level diff between two snapshots of the same table:
    one row per key that was added, removed, or changed, with
    ``change_type`` in {'added', 'removed', 'changed'}.  Unchanged keys
    are dropped.  Null-safe per-column comparison (IS DISTINCT FROM),
    so NULL -> value and value -> NULL both count as changes."""
    cols = old.columns
    if set(cols) != set(new.columns):
        raise ValueError("snapshot_diff requires identical schemas")
    non_keys = [c for c in cols if c not in keys]
    o = old.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"__o_{c}") for c in non_keys],
    ).withColumn("__in_o", F.lit(True))
    n = new.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"__n_{c}") for c in non_keys],
    ).withColumn("__in_n", F.lit(True))
    j = o.join(n, on=list(keys), how="full_outer")
    changed = F.lit(False)
    for c in non_keys:
        changed = changed | ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
    change_type = (
        F.when(F.col("__in_o").isNull(), F.lit("added"))
        .when(F.col("__in_n").isNull(), F.lit("removed"))
        .when(changed, F.lit("changed"))
    )
    return (
        j.withColumn("change_type", change_type)
        .filter(F.col("change_type").isNotNull())
        .select(
            *[F.col(k) for k in keys],
            "change_type",
            *[
                F.coalesce(F.col(f"__n_{c}"), F.col(f"__o_{c}")).alias(c)
                for c in non_keys
            ],
        )
    )
