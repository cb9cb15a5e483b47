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

#: The round-7 window, frozen.  Changing the window is LEGAL — it is the
#: per-round verification budget and MUST rotate — but has to be done by
#: editing both suite.DRIVER_WINDOW and this list, i.e. deliberately.
EXPECTED_WINDOW = [
    "ks_drift_price",
    "bootstrap_revenue_ci",
    "auc_price_basket_size",
    "chi2_event_dow",
    "acf_daily_revenue",
    "trimmed_mean_prices",
    "kmv_distinct_users",
    "dp_event_counts",
    "did_revenue_effect",
    "fdr_event_value_tests",
    "embedding_pca_project",
    "dedup_minhash",
    "dedup_minhash_transitive",
    "dedup_simhash",
    "embedding_centroids",
    "embedding_centroids_udaf",
    "similarity_ivf_topk",
    "approx_quantiles",
    "hll_mergeable_rollup",
    "bpe_train_merges",
    "bpe_encode_tokens",
    "dedup_graph_kcore",
    "mahalanobis_outliers",
    "hll_audience_overlap",
    "approx_distinct",
    "similarity_topk",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "clean_pipeline",
    "filter_equality",
    "filter_null_disjunction",
    "filter_hour_range",
    "projection_rename_drop",
    "constant_column_stamp",
    "string_filter_generic",
    "time_bucket_enrich",
    "datetime_parts",
    "datetime_coerce",
    "string_trim",
    "json_extract_props",
    "row_count",
    "filtered_count",
    "null_matrix",
    "group_agg_stats",
    "time_bucket_rollup",
    "distinct_count",
    "pricing_summary",
    "join_broadcast_dims",
    "join_left_enrich",
    "join_semi",
]



def test_window_is_first_50():
    assert list(suite.QUERIES)[:50] == EXPECTED_WINDOW
    assert suite.DRIVER_WINDOW == EXPECTED_WINDOW


#: The 14 rows-only queries in the r7 window — no SQL-expressible
#: oracle by design (each docstring states why); the driver records a
#: rows-only row for them.  Everything else gets the full hash check.
#: (dedup_graph_kcore was promoted to oracle-backed in r7 via the
#: bounded-unroll peel SQL — VERDICT r6 item 4.)
ROWS_ONLY_SLOTS = {
    "embedding_pca_project",
    "dedup_minhash",
    "dedup_minhash_transitive",
    "dedup_simhash",
    "embedding_centroids",
    "embedding_centroids_udaf",
    "similarity_ivf_topk",
    "approx_quantiles",
    "hll_mergeable_rollup",
    "bpe_train_merges",
    "bpe_encode_tokens",
    "mahalanobis_outliers",
    "hll_audience_overlap",
    "approx_distinct",
}


def test_window_oracle_coverage():
    for name in suite.DRIVER_WINDOW:
        if name in ROWS_ONLY_SLOTS:
            assert suite.QUERIES[name].oracle is None, name
        else:
            assert suite.QUERIES[name].oracle is not None, name


def test_window_drains_debt_then_reverifies_stale():
    """r7 slots 1-25 = every never-driver-verified query (debt -> 0);
    slots 26-50 = stale-first re-verification of r1/r2-green queries."""
    green: set[str] = set()
    for fname in (
        "CORRECTNESS_r01.json",
        "CORRECTNESS_r02.json",
        "CORRECTNESS_r03.json",
        "CORRECTNESS_r04.json",
        "CORRECTNESS_r05.json",
        "CORRECTNESS_r06.json",
    ):
        path = os.path.join(REPO, fname)
        if not os.path.exists(path):
            continue
        for name, row in json.load(open(path)).items():
            ok = row.get("hash_match")
            if ok is None:
                ok = row.get("rows_match")
            if ok:
                green.add(name)
    never = [n for n in suite.QUERIES if n not in green]
    # never-verified = the 25 debt slots this window drains, plus any
    # same-round registrations queued for the NEXT window (r8 slots).
    assert set(never) == set(suite.DRIVER_WINDOW[:25]) | set(
        suite._NEXT_WINDOW_QUEUE
    )
    assert not set(suite.DRIVER_WINDOW[25:]) - green
    # queue holds ONLY this round's registrations (zero-debt steady
    # state: nothing older than the current round may be queued)
    assert suite._NEXT_WINDOW_QUEUE == [
        "lm_perplexity_scores",
        "binaryfile_ingest_roundtrip",
        "ivf_probe_verified",
        "temporal_split_audit",
    ]


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
