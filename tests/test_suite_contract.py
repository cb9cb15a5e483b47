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

#: The round-4 window, frozen.  Changing the window is LEGAL — it is the
#: per-round verification budget and MUST rotate — but has to be done by
#: editing both suite.DRIVER_WINDOW and this list, i.e. deliberately.
EXPECTED_WINDOW = [
    "streaming_sessionize",
    "streaming_dedup_counts",
    "streaming_enriched_totals",
    "streaming_interval_join",
    "streaming_ewma",
    "local_supplier_volume",
    "revenue_forecast_band",
    "bilateral_trade_volume",
    "returned_item_customers",
    "promo_revenue_share",
    "large_volume_customers",
    "brand_bracket_revenue",
    "market_share_by_year",
    "top_supplier_revenue",
    "dominant_part_suppliers",
    "sole_supplier_open_orders",
    "idle_rich_customers",
    "small_quantity_revenue",
    "customer_order_distribution",
    "quality_classifier_scores",
    "quality_classifier_bucketed",
    "bm25_search",
    "hybrid_retrieval_rrf",
    "cdc_apply_orders",
    "cdc_compact_feed",
    "session_window_native",
    "line_boilerplate_removal",
    "html_text_extraction",
    "inverted_index_postings",
    "dedup_survivor_by_quality",
    "dedup_incremental_batch",
    "null_safe_enrich",
    "join_full_outer",
    "window_percentile_ranks_dist",
    "ewma_by_user",
    "user_value_drawdown",
    "corpus_filter_funnel",
    "rolling_zscore_anomalies",
    "sink_quarantine_roundtrip",
    "bigram_logprob_scores",
    "dedup_graph_triangles",
    "equi_depth_histogram",
    "skew_salted_agg",
    "rolling_hour_window",
    "sliding_window_counts",
    "rolling_distinct_users",
    "first_event_per_user",
    "event_transition_matrix",
    "revenue_share_of_total",
    "topk_with_ties_per_nation",
]


def test_window_is_first_50():
    assert list(suite.QUERIES)[:50] == EXPECTED_WINDOW
    assert suite.DRIVER_WINDOW == EXPECTED_WINDOW


def test_window_is_all_oracle_backed():
    for name in suite.DRIVER_WINDOW:
        assert suite.QUERIES[name].oracle is not None, name


def test_window_targets_never_verified_queries():
    """Every r4 window slot goes to a query with no prior driver-green row."""
    green: set[str] = set()
    for fname in (
        "CORRECTNESS_r01.json",
        "CORRECTNESS_r02.json",
        "CORRECTNESS_r03.json",
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
