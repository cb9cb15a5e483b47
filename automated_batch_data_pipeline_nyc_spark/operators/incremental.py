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

__all__ = [
    "merge_upsert",
    "snapshot_diff",
    "scd2_apply",
    "cdc_apply",
    "agg_state",
    "merge_agg_state",
]


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


def scd2_apply(
    history: DataFrame,
    snapshot: DataFrame,
    keys: Sequence[str],
    effective_ts: str,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    current_col: str = "is_current",
    close_missing: bool = False,
) -> DataFrame:
    """Slowly-changing-dimension type 2: merge a full *snapshot* into a
    versioned *history* table at ``effective_ts``.

    History carries ``(keys…, attrs…, valid_from, valid_to, is_current)``;
    the snapshot carries ``(keys…, attrs…)``.  Per key:

    - attrs changed  → the current row is **closed** (``valid_to`` =
      effective_ts, ``is_current`` = false) and a new current row opens,
    - new key        → a new current row opens,
    - unchanged      → the current row passes through untouched,
    - key missing from the snapshot → closed only when
      ``close_missing=True`` (source-deletes tracked as closures).

    Non-current (already-closed) history rows pass through by
    definition — they are immutable.

    Plan shape: ONE full-outer shuffle of the *current* slice against
    the snapshot on the key (closed history is union-ed around it,
    never shuffled), then each joined row emits 0-2 output rows via an
    ``inline`` over a compacted struct array — no second join, no
    window.  Change detection is column-wise null-safe equality
    (codegen-friendly), as in :func:`snapshot_diff`.  With history
    stored bucketed on the key the current-side shuffle also
    disappears.
    """
    scd_cols = [from_col, to_col, current_col]
    cols = history.columns
    attr_cols = [c for c in cols if c not in keys and c not in scd_cols]
    if set(snapshot.columns) != set(list(keys) + attr_cols):
        raise ValueError("scd2_apply: snapshot must carry exactly keys + attrs")

    past = history.filter(~F.col(current_col))
    cur = history.filter(F.col(current_col))

    c = cur.select(
        *[F.col(k) for k in keys],
        *[F.col(a).alias(f"__c_{a}") for a in attr_cols],
        F.col(from_col).alias("__c_from"),
    ).withColumn("__in_c", F.lit(True))
    s = snapshot.select(
        *[F.col(k) for k in keys],
        *[F.col(a).alias(f"__s_{a}") for a in attr_cols],
    ).withColumn("__in_s", F.lit(True))
    j = c.join(s, on=list(keys), how="full_outer")

    changed = F.lit(False)
    for a in attr_cols:
        changed = changed | ~F.col(f"__c_{a}").eqNullSafe(F.col(f"__s_{a}"))
    in_c = F.col("__in_c").isNotNull()
    in_s = F.col("__in_s").isNotNull()
    eff = F.lit(effective_ts).cast("timestamp")
    null_ts = F.lit(None).cast("timestamp")

    def _row(attr_side: str, vfrom, vto, is_cur: bool):
        return F.struct(
            *[F.col(k).alias(k) for k in keys],
            *[F.col(f"__{attr_side}_{a}").alias(a) for a in attr_cols],
            vfrom.alias(from_col),
            vto.alias(to_col),
            F.lit(is_cur).alias(current_col),
        )

    keep_cur = F.when(
        in_c & ((in_s & ~changed) | (~in_s & F.lit(not close_missing))),
        _row("c", F.col("__c_from"), null_ts, True),
    )
    close_cur = F.when(
        in_c & ((in_s & changed) | (~in_s & F.lit(close_missing))),
        _row("c", F.col("__c_from"), eff, False),
    )
    open_new = F.when(in_s & (~in_c | changed), _row("s", eff, null_ts, True))

    emitted = j.select(
        F.explode(
            F.filter(
                F.array(keep_cur, close_cur, open_new), lambda r: r.isNotNull()
            )
        ).alias("__r")
    ).select("__r.*")
    return past.select(*cols).unionByName(emitted.select(*cols))


def cdc_apply(
    target: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    op_col: str = "op",
    validate_unique: bool = False,
) -> DataFrame:
    """Apply a CDC change feed — insert/update/DELETE tombstones — to a
    snapshot in one pass.

    ``changes`` carries the target's schema plus ``op_col`` in
    {'I', 'U', 'D'}.  Semantics match a warehouse MERGE with a WHEN
    MATCHED AND op='D' THEN DELETE branch: deletes drop the key,
    upserts (I/U) replace or add the row.  PRECONDITION: at most one
    change row per key.  A feed violating it does NOT error by default
    — the full-outer join fans out and the output silently carries
    duplicated (and for U-then-D contradictory) rows per key, which is
    plausible-looking wrong data.  Pre-collapse multi-change feeds to
    the LAST change per key (standard CDC compaction — the
    ``cdc_compact_feed`` suite pattern / ``snapshot_diff`` output
    qualifies), or pass ``validate_unique=True`` to spend one extra
    aggregate over the FEED (never the target — feeds are small) and
    raise on duplicate keys instead.

    Plan shape: one full-outer shuffle of target vs feed on the keys
    (same cost as ``merge_upsert``); the delete branch is a filter on
    the joined row, not a second anti-join pass over the target.
    """
    cols = target.columns
    if op_col not in changes.columns:
        raise ValueError(f"cdc_apply: changes frame lacks op column {op_col!r}")
    if set(cols) != set(changes.columns) - {op_col}:
        raise ValueError("cdc_apply requires target schema + op column")
    if validate_unique:
        dup = (
            changes.groupBy(*[F.col(k) for k in keys])
            .agg(F.count("*").alias("__n"))
            .filter(F.col("__n") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            raise ValueError(
                "cdc_apply: change feed has multiple rows for key "
                f"{tuple(dup[0][k] for k in keys)!r}; pre-collapse to the "
                "last change per key (cdc_compact_feed pattern)"
            )
    non_keys = [c for c in cols if c not in keys]
    u = changes.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"__u_{c}") for c in non_keys],
        F.col(op_col).alias("__op"),
    )
    j = target.join(u, on=list(keys), how="full_outer")
    merged = j.filter(
        F.col("__op").isNull() | (F.col("__op") != "D")
    ).select(
        *[F.col(k) for k in keys],
        *[
            F.when(F.col("__op").isNotNull(), F.col(f"__u_{c}"))
            .otherwise(F.col(c))
            .alias(c)
            for c in non_keys
        ],
    )
    return merged.select(*cols)


def agg_state(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    decimal_type: str = "decimal(18,2)",
) -> DataFrame:
    """Partial-aggregate STATE for one measure: per key,
    ``(n, sum_v, min_v, max_v)`` with the sum carried in exact DECIMAL.

    This is the incremental-rollup primitive: the state table is tiny
    (one row per key), every component is an algebraic aggregate
    (mergeable by sum/sum/min/max), and :func:`merge_agg_state` folds a
    new batch's state into it WITHOUT rescanning history — the pattern
    that turns a 100 TB daily full recompute into a scan of just the
    new partition.  Derived stats (mean = sum/n) are computed at read
    time, never stored, so merging stays exact.
    """
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(value_col).cast(decimal_type)).alias("sum_v"),
        F.min(F.col(value_col).cast(decimal_type)).alias("min_v"),
        F.max(F.col(value_col).cast(decimal_type)).alias("max_v"),
    )


def merge_agg_state(state: DataFrame, delta_state: DataFrame) -> DataFrame:
    """Merge two :func:`agg_state` tables (history ⊕ new batch) into
    one — pure union + re-aggregate, exploiting that every component is
    algebraic: counts and DECIMAL sums add, min/max fold.

    Plan shape: NO join — ``unionByName`` then one groupBy whose input
    is two state tables (key-sized, not corpus-sized).  With both
    states stored bucketed on the key the exchange disappears entirely.
    Commutative and associative: days can merge in any order, so
    backfills and out-of-order loads converge to the same state.
    """
    keys = [c for c in state.columns if c not in ("n", "sum_v", "min_v", "max_v")]
    if set(state.columns) != set(delta_state.columns):
        raise ValueError("merge_agg_state requires identical state schemas")
    return (
        state.unionByName(delta_state)
        .groupBy(*keys)
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_v").alias("sum_v"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"),
        )
    )
