"""merge_upsert / snapshot_diff semantics, including null transitions."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from automated_batch_data_pipeline_nyc_spark.operators.incremental import (
    merge_upsert,
    snapshot_diff,
)

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType()),
        T.StructField("x", T.DoubleType()),
    ]
)


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_merge_upsert_update_insert_keep(spark):
    target = _df(spark, [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)])
    updates = _df(spark, [(2, "B", 20.0), (4, "d", 4.0)])
    out = {r["k"]: (r["v"], r["x"]) for r in merge_upsert(target, updates, ["k"]).collect()}
    assert out == {1: ("a", 1.0), 2: ("B", 20.0), 3: ("c", 3.0), 4: ("d", 4.0)}


def test_merge_upsert_matched_null_wins(spark):
    # a matched update carrying NULL must set NULL, not keep the target
    target = _df(spark, [(1, "a", 1.0)])
    updates = _df(spark, [(1, None, None)])
    row = merge_upsert(target, updates, ["k"]).collect()[0]
    assert row["v"] is None and row["x"] is None


def test_merge_upsert_schema_mismatch_raises(spark):
    target = _df(spark, [(1, "a", 1.0)])
    with pytest.raises(ValueError, match="identical schemas"):
        merge_upsert(target, target.drop("x"), ["k"])


def test_snapshot_diff_classifies_all_transitions(spark):
    old = _df(spark, [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0), (4, "d", None)])
    new = _df(spark, [(1, "a", 1.0), (2, "B", 2.0), (4, "d", 4.0), (5, "e", 5.0)])
    out = {r["k"]: r["change_type"] for r in snapshot_diff(old, new, ["k"]).collect()}
    # 1 unchanged (absent), 2 changed, 3 removed, 4 null->value = changed, 5 added
    assert out == {2: "changed", 3: "removed", 4: "changed", 5: "added"}


def test_snapshot_diff_identical_snapshots_empty(spark):
    df = _df(spark, [(1, "a", 1.0), (2, None, None)])
    assert snapshot_diff(df, df, ["k"]).count() == 0


# ---------------------------------------------------------------------------
# SCD type 2
# ---------------------------------------------------------------------------

def _scd2_hist(spark, rows):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("v", T.StringType()),
            T.StructField("valid_from", T.TimestampType()),
            T.StructField("valid_to", T.TimestampType()),
            T.StructField("is_current", T.BooleanType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


def test_scd2_apply_transitions(spark):
    import datetime as dt

    from automated_batch_data_pipeline_nyc_spark.operators.incremental import scd2_apply

    t0 = dt.datetime(2026, 1, 1)
    t1 = dt.datetime(2026, 2, 1)
    hist = _scd2_hist(
        spark,
        [
            (1, "a", t0, None, True),     # unchanged in snapshot
            (2, "b", t0, None, True),     # changed in snapshot
            (3, "c", t0, None, True),     # missing from snapshot
            (2, "old", dt.datetime(2025, 6, 1), t0, False),  # closed row: immutable
        ],
    )
    snap = spark.createDataFrame([(1, "a"), (2, "B"), (4, "d")], ["k", "v"])

    out = scd2_apply(hist, snap, ["k"], "2026-02-01 00:00:00").collect()
    rows = {(r.k, r.v): r for r in out}
    assert len(out) == 6
    # unchanged key passes through still-open
    assert rows[(1, "a")].valid_to is None and rows[(1, "a")].is_current
    # changed key: old version closed at t1, new version open from t1
    assert rows[(2, "b")].valid_to == t1 and not rows[(2, "b")].is_current
    assert rows[(2, "B")].valid_from == t1 and rows[(2, "B")].is_current
    # missing key stays open (close_missing=False)
    assert rows[(3, "c")].is_current and rows[(3, "c")].valid_to is None
    # new key opens at t1
    assert rows[(4, "d")].valid_from == t1 and rows[(4, "d")].is_current
    # pre-existing closed row untouched
    assert rows[(2, "old")].valid_to == t0 and not rows[(2, "old")].is_current

    # with close_missing=True the missing key is closed instead
    out2 = scd2_apply(hist, snap, ["k"], "2026-02-01 00:00:00", close_missing=True)
    r3 = [r for r in out2.collect() if r.k == 3][0]
    assert r3.valid_to == t1 and not r3.is_current


def test_scd2_apply_rejects_schema_drift(spark):
    import datetime as dt

    from automated_batch_data_pipeline_nyc_spark.operators.incremental import scd2_apply

    hist = _scd2_hist(spark, [(1, "a", dt.datetime(2026, 1, 1), None, True)])
    bad = spark.createDataFrame([(1, "a", 9)], ["k", "v", "extra"])
    with pytest.raises(ValueError, match="keys \\+ attrs"):
        scd2_apply(hist, bad, ["k"], "2026-02-01 00:00:00")


def test_cdc_apply_insert_update_delete(spark):
    from automated_batch_data_pipeline_nyc_spark.operators.incremental import cdc_apply

    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["k", "s", "v"]
    )
    changes = spark.createDataFrame(
        [
            (2, "B", 25.0, "U"),   # update
            (3, None, None, "D"),  # delete tombstone
            (4, "d", 40.0, "I"),   # insert
        ],
        ["k", "s", "v", "op"],
    )
    got = {r.k: (r.s, r.v) for r in cdc_apply(target, changes, ["k"]).collect()}
    assert got == {1: ("a", 10.0), 2: ("B", 25.0), 4: ("d", 40.0)}

    with pytest.raises(ValueError):
        cdc_apply(target, changes.drop("v"), ["k"])


def test_cdc_apply_rejects_missing_op_column(spark):
    from automated_batch_data_pipeline_nyc_spark.operators.incremental import cdc_apply

    target = spark.createDataFrame([(1, "a")], ["k", "s"])
    no_op = spark.createDataFrame([(1, "b")], ["k", "s"])
    with pytest.raises(ValueError, match="op column"):
        cdc_apply(target, no_op, ["k"])


def test_cdc_apply_validate_unique_guard(spark):
    from automated_batch_data_pipeline_nyc_spark.operators.incremental import cdc_apply

    target = spark.createDataFrame([(1, "a", 10.0)], ["k", "s", "v"])
    multi = spark.createDataFrame(
        [(1, "B", 25.0, "U"), (1, None, None, "D")],  # U then D, same key
        ["k", "s", "v", "op"],
    )
    # default: documented silent fan-out (duplicated rows), no error
    assert cdc_apply(target, multi, ["k"]).count() == 1  # D filters one branch
    with pytest.raises(ValueError, match="multiple rows"):
        cdc_apply(target, multi, ["k"], validate_unique=True)
    # a clean feed passes the guard unchanged
    clean = spark.createDataFrame([(1, "B", 25.0, "U")], ["k", "s", "v", "op"])
    got = cdc_apply(target, clean, ["k"], validate_unique=True).collect()
    assert [(r.k, r.s, r.v) for r in got] == [(1, "B", 25.0)]


def test_agg_state_merge_law_any_order(spark):
    """merge_agg_state is commutative/associative and equals the direct
    aggregate — the invariant that lets daily states merge out of order
    (backfills) and still converge to the full-recompute answer."""
    from automated_batch_data_pipeline_nyc_spark.operators.incremental import (
        agg_state,
        merge_agg_state,
    )

    rows = [
        ("a", 1, 10.25), ("a", 1, 5.50), ("b", 1, 7.00),
        ("a", 2, 1.75), ("b", 2, 99.99), ("c", 2, 3.00),
        ("b", 3, 0.01), ("c", 3, 3.00),
    ]
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, ["k", "day", "v"])
    days = [agg_state(df.filter(F.col("day") == d), ["k"], "v") for d in (1, 2, 3)]

    def as_dict(state):
        return {
            r.k: (r.n, float(r.sum_v), float(r.min_v), float(r.max_v))
            for r in state.collect()
        }

    direct = as_dict(agg_state(df, ["k"], "v"))
    fwd = as_dict(merge_agg_state(merge_agg_state(days[0], days[1]), days[2]))
    rev = as_dict(merge_agg_state(days[2], merge_agg_state(days[1], days[0])))
    assert fwd == direct and rev == direct
    # a day with no rows for a key merges as identity
    assert direct["c"] == (2, 6.00, 3.00, 3.00)

    with pytest.raises(ValueError, match="identical state schemas"):
        merge_agg_state(days[0], days[1].withColumnRenamed("sum_v", "s"))
