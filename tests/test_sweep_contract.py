"""Pin the scale-sweep contract (bench.py --sweep).

The sweep names queries and driving tables statically; a suite rename
or a fixture change would otherwise surface only at the end of a
~10-minute measurement run.  No Spark session needed — this is pure
registry/metadata validation.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from automated_batch_data_pipeline_nyc_spark import suite


def test_sweep_queries_are_registered():
    unknown = [
        (fam, q)
        for fam, members in bench.SWEEP_FAMILIES.items()
        for q, _ in members
        if q not in suite.QUERIES
    ]
    assert not unknown, f"sweep names unregistered queries: {unknown}"


def test_sweep_driving_tables_exist_in_fixtures():
    tables = {t for members in bench.SWEEP_FAMILIES.values() for _, t in members}
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        for t in tables:
            path = f"/root/testdata/{sf}/{t}.parquet"
            assert os.path.exists(path), path


def test_sweep_excludes_the_on2_oracle_forms():
    """The three declared O(n²) cross-check twins are bench-excluded;
    the sweep must not time them either (a quadratic form would
    dominate the family total and fake a super-linear exponent for a
    path no user runs at scale)."""
    swept = {q for members in bench.SWEEP_FAMILIES.values() for q, _ in members}
    assert not swept & {
        "dedup_ngram_jaccard",
        "dedup_embedding_cosine",
        "containment_pairs_blocked",
    }


def test_sweep_markers_are_intact_in_scaling_md():
    md = open(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALING.md")).read()
    b = md.find(bench._SWEEP_MARK_BEGIN)
    e = md.find(bench._SWEEP_MARK_END)
    assert b != -1 and e != -1 and b < e
