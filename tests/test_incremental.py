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
