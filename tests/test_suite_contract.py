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

#: The round-3 window, frozen.  Changing the window is LEGAL — it is the
#: per-round verification budget and MUST rotate — but has to be done by
#: editing both suite.DRIVER_WINDOW and this list, i.e. deliberately.
EXPECTED_WINDOW = [
    "dedup_ngram_jaccard_prefix",
    "dedup_ngram_jaccard_freq",
    "duplicated_ngram_spans",
    "dedup_embedding_cosine_lsh",
    "dedup_components",
    "dedup_pipeline_transitive",
    "url_canonical_dedup",
    "edit_distance_pairs",
    "fuzzy_levenshtein",
    "knn_join_batch",
    "embedding_gram_matrix",
    "embedding_quantize",
    "embedding_group_mean",
    "multimodal_payload_meta",
    "sink_roundtrip",
    "csv_roundtrip",
    "json_roundtrip",
    "orc_roundtrip",
    "schema_evolution_roundtrip",
    "merge_upsert_orders",
    "snapshot_diff_orders",
    "scd2_orders_history",
    "asof_click_attribution",
    "sessionize_events",
    "interval_overlap_pairs",
    "resample_gap_fill",
    "funnel_signup_purchase",
    "sample_hash_fraction",
    "train_test_split_counts",
    "mixture_by_source",
    "sample_per_group",
    "weighted_sample_per_group",
    "token_budget_mixture",
    "shuffle_shard_assign",
    "split_leakproof_by_content",
    "chunk_documents",
    "pack_token_windows",
    "corpus_prep",
    "redact_pii",
    "tfidf_top_terms",
    "repetition_scores",
    "decontaminate_overlap",
    "domain_stats",
    "token_divergence",
    "text_normalize_nfc",
    "exact_moment_stats",
    "group_linear_fit",
    "mutual_information",
    "pagerank_order_part",
    "cross_source_contamination",
]


def test_window_is_first_50():
    assert list(suite.QUERIES)[:50] == EXPECTED_WINDOW
    assert suite.DRIVER_WINDOW == EXPECTED_WINDOW


def test_window_is_all_oracle_backed():
    for name in suite.DRIVER_WINDOW:
        assert suite.QUERIES[name].oracle is not None, name


def test_window_targets_never_verified_queries():
    """Every r3 window slot goes to a query with no prior driver-green row."""
    green: set[str] = set()
    for fname in ("CORRECTNESS_r01.json", "CORRECTNESS_r02.json"):
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
