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

#: The round-6 window, frozen.  Changing the window is LEGAL — it is the
#: per-round verification budget and MUST rotate — but has to be done by
#: editing both suite.DRIVER_WINDOW and this list, i.e. deliberately.
EXPECTED_WINDOW = [
    "window_percentile_ranks",
    "clean_pipeline_dirty",
    "scalar_function_battery",
    "containment_pairs_blocked",
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
]


def test_window_is_first_50():
    assert list(suite.QUERIES)[:50] == EXPECTED_WINDOW
    assert suite.DRIVER_WINDOW == EXPECTED_WINDOW


def test_window_is_all_oracle_backed():
    for name in suite.DRIVER_WINDOW:
        assert suite.QUERIES[name].oracle is not None, name


def test_window_targets_never_verified_queries():
    """Every r6 window slot goes to a query with no prior driver-green row."""
    green: set[str] = set()
    for fname in (
        "CORRECTNESS_r01.json",
        "CORRECTNESS_r02.json",
        "CORRECTNESS_r03.json",
        "CORRECTNESS_r04.json",
        "CORRECTNESS_r05.json",
    ):
        path = os.path.join(REPO, fname)
        if not os.path.exists(path):
            continue
        for name, row in json.load(open(path)).items():
            if row.get("hash_match"):
                green.add(name)
    assert not green & set(suite.DRIVER_WINDOW)


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
