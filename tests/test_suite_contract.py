"""Pin the driver verification window (suite.DRIVER_WINDOW).

The driver hash-verifies only the FIRST 50 entries of
``__spark_entry__.queries()`` per round (CORRECTNESS_r{N}.json key list
== dict iteration order).  Round 2 lost two thirds of the suite's
driver coverage to an accidental mid-file insertion; these tests make
any unintended eviction a hard CI failure.
"""

from __future__ import annotations

import json
import os

from automated_batch_data_pipeline_nyc_spark import suite

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: The round-11 window, frozen.  Changing the window is LEGAL — it is the
#: per-round verification budget and MUST rotate — but has to be done by
#: editing both suite.DRIVER_WINDOW and this list, i.e. deliberately.
EXPECTED_WINDOW = [
    "clean_pipeline",
    "schema_contract_enforced",
    "url_ingest_roundtrip",
    "sql_extract_roundtrip",
    "window_range_frame_sum",
    "set_ops_multiset",
    "asof_nearest_event",
    "gopher_quality_rules",
    "user_activity_streaks",
    "bloom_prefilter_join",
    "bloom_fpp_audit",
    "bpe_pair_counts",
    "semdedup_prune",
    "k_anonymity_events",
    "profile_orders_table",
    "dsir_importance_weights",
    "incremental_agg_merge",
    "psi_drift_orders",
    "temperature_lang_rates",
    "gapfill_user_hourly",
    "corr_matrix_lineitem",
    "benford_price_audit",
    "basket_brand_lift",
    "bucketed_join_roundtrip",
    "incremental_join_view",
    "streaming_upsert_apply",
    "c4_cleaning_rules",
    "impute_group_mean",
    "join_size_estimate_cm",
    "hierarchy_share_rollup",
    "session_path_trigrams",
    "rfm_segments",
    "cusum_changepoint_daily",
    "rolling_corr_daily",
    "market_concentration_hhi",
    "keyness_log_odds",
    "ab_test_conversion",
    "cohort_ltv_curve",
    "neyman_allocation_orders",
    "txlog_time_travel",
    "graph_bfs_hops",
    "survival_kaplan_meier",
    "gini_revenue_concentration",
    "seasonal_dow_anomalies",
    "user_event_entropy",
    "l_diversity_events",
    "zipf_vocab_fit",
    "dedup_minhash_transitive",
    "similarity_ivf_topk",
    "dedup_graph_triangles",
]




def test_window_is_first_50():
    assert list(suite.QUERIES)[:50] == EXPECTED_WINDOW
    assert suite.DRIVER_WINDOW == EXPECTED_WINDOW


#: Rows-only slots in the r11 window: NONE — every slot this round is
#: oracle-backed, so the driver runs the full rows+schema+hash check on
#: all 50 (the four tail slots are this round's rows-only -> bound-audit
#: conversions, now oracle-backed).  The 5 remaining rows-only-by-design
#: queries were all driver-executed in r7 and sit in
#: _PREVIOUSLY_VERIFIED until the stale-first rotation brings them back.
ROWS_ONLY_SLOTS: set = set()


def test_window_oracle_coverage():
    for name in suite.DRIVER_WINDOW:
        if name in ROWS_ONLY_SLOTS:
            assert suite.QUERIES[name].oracle is None, name
        else:
            assert suite.QUERIES[name].oracle is not None, name


def test_window_drains_debt_then_reverifies_stale():
    """Lifecycle-stable rotation invariant (VERDICT r8 item 1).

    The r8 version of this test pinned a point-in-time snapshot
    ("never-verified == window[:4] | queue") that went red the moment
    the driver committed CORRECTNESS_r08.json and turned those four
    slots green.  The invariant that actually matters, and that stays
    true both while the builder is rotating and after the driver lands
    a new record, is:

      1. every never-driver-verified query is scheduled — it sits in
         DRIVER_WINDOW (this round's slots) or _NEXT_WINDOW_QUEUE
         (next round's slots); debt can never silently fall off;
      2. _NEXT_WINDOW_QUEUE holds ONLY never-verified queries — once
         the driver turns a queued query green the next rotation must
         move it out;
      3. never-verified window slots form a contiguous HEAD of the
         window (debt drains first, stale re-verification fills the
         tail) — trivially true once the driver has run the window;
      4. the reference-pipeline canary is in every window.

    Rows-only-by-design queries count as driver-executed via their
    recorded spark_rows (err == "no_oracle" means "no SQL oracle
    exists", not "failed")."""
    green: set[str] = set()
    for fname in sorted(os.listdir(REPO)):
        if not (fname.startswith("CORRECTNESS_r") and fname.endswith(".json")):
            continue
        for name, row in json.load(open(os.path.join(REPO, fname))).items():
            ok = row.get("hash_match")
            if ok is None:
                ok = row.get("rows_match")
            if ok is None:
                ok = (
                    row.get("spark_rows") is not None
                    and row.get("err") in (None, "no_oracle")
                )
            if ok:
                green.add(name)
    never = {n for n in suite.QUERIES if n not in green}
    # 1. all debt is scheduled
    assert never <= set(suite.DRIVER_WINDOW) | set(suite._NEXT_WINDOW_QUEUE)
    # 2. the queue holds only debt
    assert set(suite._NEXT_WINDOW_QUEUE) <= never
    # 3. debt occupies a contiguous head of the window
    in_window_never = [n for n in suite.DRIVER_WINDOW if n in never]
    assert suite.DRIVER_WINDOW[: len(in_window_never)] == in_window_never
    # 4. standing canary: the reference clean_nyc_taxi_pipeline surface
    # is re-verified every round (VERDICT r7 item 3)
    assert "clean_pipeline" in suite.DRIVER_WINDOW


def test_rotation_covers_every_registration_exactly_once():
    rotated = (
        suite.DRIVER_WINDOW
        + suite._NEXT_WINDOW_QUEUE
        + suite._PREVIOUSLY_VERIFIED
    )
    assert sorted(rotated) == sorted(suite.QUERIES)
    assert len(rotated) == len(set(rotated))


def test_entry_module_exposes_rotated_order():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert list(mod.queries())[:50] == EXPECTED_WINDOW
    oracles = mod.oracle_sql()
    for name in EXPECTED_WINDOW:
        if name in ROWS_ONLY_SLOTS:
            assert name not in oracles, name
        else:
            assert name in oracles, name


def test_queries_md_is_current():
    """QUERIES.md is generated from the live suite; stale inventory docs
    mislead coverage review.  Regenerate with tools/gen_queries_md.py."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "gen_queries_md", os.path.join(REPO, "tools", "gen_queries_md.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    before = open(os.path.join(REPO, "QUERIES.md")).read()
    mod.main()  # regenerates QUERIES.md in place
    content = open(os.path.join(REPO, "QUERIES.md")).read()
    assert content == before, "QUERIES.md was stale — commit the regenerated file"
    assert f"**{len(suite.QUERIES)} registered**" in content
    for name in suite.DRIVER_WINDOW:
        assert f"`{name}`" in content
