"""Physical-plan contracts — the 100 TB posture, enforced.

Correctness tests prove the small-sf answer; these prove the *shape*
that survives a 1000-executor scale-up: filters reach the parquet
scan, scans prune columns, dimension joins broadcast, top-k never
globally sorts, and no production path contains an unblocked
cartesian/nested-loop join.  A regression here is a performance bug
even while every oracle still matches.
"""

from __future__ import annotations

import pytest

from automated_batch_data_pipeline_nyc_spark.suite import QUERIES

from .conftest import SF_SMOKE


def _plan(spark, name: str) -> str:
    df = QUERIES[name].spark(spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushed_to_scan(spark):
    plan = _plan(spark, "filter_equality")
    assert "EqualTo(event_type,purchase)" in plan, "predicate not pushed to parquet scan"


def test_scan_prunes_columns(spark):
    plan = _plan(spark, "projection_rename_drop")
    # only the three projected columns may be read from parquet
    assert "ReadSchema: struct<c_custkey:bigint,c_name:string,c_mktsegment:string>" in plan


def test_dim_joins_broadcast(spark):
    plan = _plan(spark, "join_broadcast_dims")
    assert plan.count("BroadcastHashJoin") >= 1
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pricing_summary_pushes_date_filter(spark):
    plan = _plan(spark, "pricing_summary")
    assert "LessThanOrEqual(l_shipdate" in plan


def test_topk_uses_take_ordered(spark):
    plan = _plan(spark, "top_k_customers")
    assert "TakeOrderedAndProject" in plan, "top-k must not globally sort"


def test_window_topk_group_limit_pushdown(spark):
    plan = _plan(spark, "window_topk_per_group")
    assert "WindowGroupLimit" in plan, "rank filter not pushed into the window sort"


@pytest.mark.parametrize(
    "name",
    [
        # every production (non-oracle-cross-check) pairwise path must
        # be key-blocked: equi-join on bucket/gram/chunk keys only.
        "dedup_ngram_jaccard_prefix",
        "dedup_embedding_cosine_lsh",
        "dedup_minhash",
        "dedup_simhash",
        "similarity_lsh_topk",
        "similarity_topk",
    ],
)
def test_no_unblocked_pair_joins_in_production_paths(spark, name):
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan, name
    assert "BroadcastNestedLoopJoin" not in plan, name
