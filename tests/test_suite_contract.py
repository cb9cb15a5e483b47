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

#: The round-5 window, frozen.  Changing the window is LEGAL — it is the
#: per-round verification budget and MUST rotate — but has to be done by
#: editing both suite.DRIVER_WINDOW and this list, i.e. deliberately.
EXPECTED_WINDOW = [
    "multimodal_image_decode",
    "multimodal_image_resize",
    "multimodal_audio_features",
    "multimodal_video_frames",
    "multimodal_format_sniff",
    "table_modes_roundtrip",
    "similarity_lsh_topk",
    "kmeans_step_verified",
    "streaming_countmin",
    "containment_pairs_prefix",
    "dedup_minhash_portable",
    "dedup_simhash_portable",
    "asof_next_purchase",
    "cheapest_part_supplier_region",
    "late_ship_priority_counts",
    "nation_year_profit",
    "important_part_values",
    "ship_delay_priority_mix",
    "part_supplier_variety",
    "string_agg_per_group",
    "grouping_sets_quantity",
    "cube_order_counts",
    "grouped_median",
    "grouped_mode",
    "having_filter",
    "conditional_agg",
    "robust_spread",
    "value_histogram",
    "window_first_last",
    "window_rank_ntile",
    "window_cume_nth",
    "date_arithmetic",
    "exists_subquery",
    "unpivot_part_metrics",
    "fill_defaults",
    "word_counts",
    "regexp_extract_supplier",
    "clip_outliers",
    "zorder_bucket_stats",
    "compact_roundtrip",
    "manifest_partition_counts",
    "kfold_assign_counts",
    "embedding_norm_buckets",
    "events_dow_hour_matrix",
    "pmi_top_bigrams",
    "dedup_family_size_hist",
    "order_lead_time_monthly",
    "supplier_pareto_share",
    "countmin_heavy_hitters",
    "skew_salted_join",
]


def test_window_is_first_50():
    assert list(suite.QUERIES)[:50] == EXPECTED_WINDOW
    assert suite.DRIVER_WINDOW == EXPECTED_WINDOW


def test_window_is_all_oracle_backed():
    for name in suite.DRIVER_WINDOW:
        assert suite.QUERIES[name].oracle is not None, name


def test_window_targets_never_verified_queries():
    """Every r5 window slot goes to a query with no prior driver-green row."""
    green: set[str] = set()
    for fname in (
        "CORRECTNESS_r01.json",
        "CORRECTNESS_r02.json",
        "CORRECTNESS_r03.json",
        "CORRECTNESS_r04.json",
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
