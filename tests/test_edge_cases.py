"""Edge-case hardening: degenerate inputs every operator must survive.

Empty frames, single rows, all-identical corpora, null keys — the
shapes that show up at partition boundaries long before 100 TB does.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from automated_batch_data_pipeline_nyc_spark.operators import dedup as dd
from automated_batch_data_pipeline_nyc_spark.operators import similarity as sim
from automated_batch_data_pipeline_nyc_spark.operators.windows import sessionize

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, DOCS_SCHEMA)


def test_exact_dedup_empty_and_identical(spark):
    empty = _docs(spark, [])
    assert dd.exact_dedup(empty, "text", "doc_id").count() == 0
    same = _docs(spark, [(i, "same text") for i in range(10)])
    out = dd.exact_dedup(same, "text", "doc_id").collect()
    assert [(r["doc_id"], r["text"]) for r in out] == [(0, "same text")]


def test_exact_dedup_idempotent(spark):
    df = _docs(spark, [(1, "a"), (2, "a"), (3, "b"), (4, "")])
    once = dd.exact_dedup(df, "text", "doc_id")
    twice = dd.exact_dedup(once, "text", "doc_id")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_minhash_dedup_single_row_and_empty_text(spark):
    df = _docs(spark, [(1, "only document here")])
    assert dd.minhash_dedup(df, "text", "doc_id").count() == 1
    weird = _docs(spark, [(1, ""), (2, ""), (3, "real words in here now")])
    out = dd.minhash_dedup(weird, "text", "doc_id")
    # the two empty docs are perfect duplicates: one survives
    assert out.count() == 2


def test_simhash_pairs_on_identical_corpus(spark):
    same = _docs(spark, [(i, "alpha beta gamma delta") for i in range(4)])
    sigs = dd.with_simhash(same, "text").select("doc_id", "simhash")
    pairs = dd.simhash_candidate_pairs(sigs, "doc_id", "simhash").collect()
    # all C(4,2)=6 pairs at Hamming 0
    assert len(pairs) == 6
    assert all(r["hamming"] == 0 for r in pairs)


def test_simhash_max_hamming_guard(spark):
    df = _docs(spark, [(1, "x")])
    sigs = dd.with_simhash(df, "text").select("doc_id", "simhash")
    with pytest.raises(ValueError, match="chunks"):
        dd.simhash_candidate_pairs(sigs, "doc_id", "simhash", max_hamming=16)


@pytest.mark.parametrize("order", ["lex", "freq"])
def test_jaccard_prefix_catches_all_pairs_vs_naive(spark, order):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "completely different words appear in this one"),
        (4, "the quick brown fox jumps over the lazy dog"),
        # adversarial for the length/positional filters: same prefix
        # gram at very different positions and set sizes
        (5, "the quick"),
        (6, "a b c d e f g h i j k l m n o p the quick"),
        (7, "a b c d e f g h i j k l m n o p the quick"),
    ]
    df = _docs(spark, rows)
    fast = {
        (r["id_a"], r["id_b"])
        for r in dd.jaccard_prefix_pairs(
            df, "doc_id", "text", threshold=0.5, order=order
        ).collect()
    }
    naive = {
        (r["id_a"], r["id_b"])
        for r in dd.ngram_jaccard_pairs(
            df.withColumn("blk", F.lit(1)), "doc_id", "text", "blk", threshold=0.5
        ).collect()
    }
    assert fast == naive, "prefix filtering must be lossless"
    assert (6, 7) in fast  # identical long docs survive the filters

    with pytest.raises(ValueError, match="order"):
        dd.jaccard_prefix_pairs(df, "doc_id", "text", order="nope")


def test_cosine_lsh_pairs_identical_vectors_always_collide(spark):
    vec = [1.0, 0.0, 2.0, -1.0]
    df = spark.createDataFrame(
        [(i, vec) for i in range(3)] + [(9, [-5.0, 1.0, -2.0, 4.0])],
        T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.FloatType())),
            ]
        ),
    )
    pairs = sim.cosine_lsh_pairs(
        df, "vec_id", "embedding", dim=4, threshold=0.99, planes_per_band=4, bands=2
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert got == {(0, 1), (0, 2), (1, 2)}  # identical vectors share every bucket


def test_sessionize_single_event_and_null_gap_boundaries(spark):
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_id", T.LongType()),
        ]
    )
    one = spark.createDataFrame([(7, t0, 1)], schema)
    out = sessionize(one, "user_id", "ts", "event_id").collect()
    assert out[0]["session_id"] == 1
    # exactly-at-gap is the SAME session (strict > comparison)
    rows = [
        (7, t0, 1),
        (7, t0 + datetime.timedelta(minutes=30), 2),
        (7, t0 + datetime.timedelta(minutes=60, seconds=1), 3),
    ]
    out = (
        sessionize(spark.createDataFrame(rows, schema), "user_id", "ts", "event_id")
        .orderBy("event_id")
        .collect()
    )
    assert [r["session_id"] for r in out] == [1, 1, 2]


def test_embedding_centroid_paths_agree(spark):
    """JVM exploded-avg centroids == applyInPandas/numpy centroids
    (within float tolerance — this equivalence is the correctness
    evidence for both rows-only suite entries)."""
    import math

    from automated_batch_data_pipeline_nyc_spark.sources import read_parquet

    emb = read_parquet(spark, "/root/testdata/sf0.001/embeddings.parquet")
    jvm = {
        (r["label"], r["dim"]): r["centroid"]
        for r in sim.embedding_centroids_exploded(emb, "label", "embedding").collect()
    }
    pdv = {
        r["label"]: r["centroid"]
        for r in sim.embedding_centroids_pandas(emb, "label", "embedding").collect()
    }
    assert {k for k, _ in jvm} == set(pdv)
    for (label, dim), v in jvm.items():
        assert math.isclose(v, pdv[label][dim], rel_tol=1e-9, abs_tol=1e-12), (label, dim)


def test_ewma_by_user_history_cap_fails_fast(spark, monkeypatch):
    """ewma_by_user's SCALE CAVEAT is enforced in code: a key whose
    collected history exceeds EWMA_MAX_HISTORY raises (assert_true)
    with a pointer to the streaming production form, instead of
    silently growing one aggregation buffer toward OOM (VERDICT r4
    item 4).  The cap is read at query-build time, so tightening it to
    1 makes every multi-event user pathological."""
    from pyspark.errors import SparkRuntimeException

    from automated_batch_data_pipeline_nyc_spark import suite

    q = suite.QUERIES["ewma_by_user"].spark
    # default cap: the sf0.001 fixture is far below 2M rows per key
    assert q(spark, "/root/testdata/sf0.001").count() > 0
    monkeypatch.setattr(suite, "EWMA_MAX_HISTORY", 1)
    with pytest.raises(SparkRuntimeException, match="EWMA_MAX_HISTORY=1"):
        q(spark, "/root/testdata/sf0.001").count()


def test_k_anonymity_audit_and_summary(spark):
    from automated_batch_data_pipeline_nyc_spark.operators.quality import (
        k_anonymity_audit,
        k_anonymity_summary,
    )

    rows = (
        [("a", 30, i) for i in range(6)]      # safe group (n=6)
        + [("a", 40, 100)]                    # risky singleton
        + [("b", 30, 200), ("b", 30, 201)]    # risky pair
    )
    df = spark.createDataFrame(rows, ["city", "age", "rid"])
    risky = {
        (r.city, r.age): r.n
        for r in k_anonymity_audit(df, ["city", "age"], k=5).collect()
    }
    assert risky == {("a", 40): 1, ("b", 30): 2}
    s = k_anonymity_summary(df, ["city", "age"], k=5).collect()[0]
    assert (s.n_groups, s.n_risky_groups, s.n_rows_at_risk, s.effective_k) == (
        3, 2, 3, 1,
    )
    with pytest.raises(ValueError):
        k_anonymity_audit(df, ["city"], k=1)


def test_profile_table_nulls_complex_and_approx(spark):
    from automated_batch_data_pipeline_nyc_spark.operators.quality import (
        profile_table,
    )

    df = spark.createDataFrame(
        [(1, "a", [1, 2]), (2, None, [3]), (None, "b", None)],
        T.StructType([
            T.StructField("x", T.LongType()),
            T.StructField("s", T.StringType()),
            T.StructField("arr", T.ArrayType(T.LongType())),
        ]),
    )
    prof = {r.column: r for r in profile_table(df).collect()}
    assert set(prof) == {"x", "s", "arr"}
    assert (prof["x"].n_rows, prof["x"].n_nulls, prof["x"].n_distinct) == (3, 1, 2)
    assert (prof["x"].min_value, prof["x"].max_value) == ("1", "2")
    assert (prof["s"].n_nulls, prof["s"].min_value) == (1, "a")
    # complex column: counts only, stats NULL
    assert prof["arr"].n_nulls == 1
    assert prof["arr"].n_distinct is None and prof["arr"].min_value is None
    # approx path keeps the same schema and exact null accounting
    aprof = {r.column: r for r in profile_table(df, approx_distinct=True).collect()}
    assert aprof["x"].n_nulls == 1 and aprof["x"].n_distinct >= 1


def test_psi_identical_and_shifted_distributions(spark):
    """PSI ≈ 0 when the two windows share a distribution; large when the
    distribution shifts; every bin appears even when empty; edges must
    ascend."""
    from automated_batch_data_pipeline_nyc_spark.operators.quality import (
        population_stability_index,
    )

    base = spark.createDataFrame([(float(v),) for v in range(100)], ["v"])
    same = population_stability_index(base, base, "v", [25.0, 50.0, 75.0])
    rows = same.collect()
    assert len(rows) == 4 and {r.bin_id for r in rows} == {0, 1, 2, 3}
    assert abs(sum(r.psi_term for r in rows)) < 1e-9  # identical → PSI 0

    shifted = spark.createDataFrame(
        [(float(v),) for v in range(75, 175)], ["v"]
    )
    drift = population_stability_index(base, shifted, "v", [25.0, 50.0, 75.0])
    terms = {r.bin_id: r for r in drift.collect()}
    assert sum(r.psi_term for r in terms.values()) > 0.25  # "shifted" regime
    # bin 0 is empty on the actual side but still present, smoothed
    assert terms[0].n_actual == 0 and terms[0].p_actual > 0

    import pytest as _p

    with _p.raises(ValueError, match="ascending"):
        population_stability_index(base, base, "v", [50.0, 25.0])


def test_gap_fill_interpolate_reference(spark):
    """Gap-fill vs a hand-computed reference: dense grid per key, exact
    lerp on interior gaps, no extrapolation past the edges, LOCF
    carries, multi-observation slots sum."""
    from automated_batch_data_pipeline_nyc_spark.operators.timeseries import (
        gap_fill_interpolate,
    )

    rows = [
        # key a: obs at slots 0 and 30 (step 10): two interior gaps
        ("a", "1970-01-01 00:00:05", 10.0),
        ("a", "1970-01-01 00:00:31", 40.0),
        ("a", "1970-01-01 00:00:35", 2.0),   # same slot as :31 -> sums
        # key b: single observation -> single-slot grid
        ("b", "1970-01-01 00:00:59", 7.5),
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "v"]).select(
        "k", F.col("ts").cast("timestamp"), "v"
    )
    out = {
        (r.k, r.slot_s): (r.n_obs, r.v_obs, r.v_lerp, r.v_locf)
        for r in gap_fill_interpolate(df, ["k"], "ts", "v", 10).collect()
    }
    assert len(out) == 5  # a: slots 0,10,20,30; b: slot 50
    assert out[("a", 0)] == (1, 10.0, 10.0, 10.0)
    assert out[("a", 10)] == (0, None, (10 * 30 + 32 * 10) / 30, 10.0)
    assert out[("a", 20)] == (0, None, (10 * 30 + 32 * 20) / 30, 10.0)
    assert out[("a", 30)] == (2, 42.0, 42.0, 42.0)
    assert out[("b", 50)] == (1, 7.5, 7.5, 7.5)
    with pytest.raises(ValueError, match="positive"):
        gap_fill_interpolate(df, ["k"], "ts", "v", 0)


def test_gap_fill_edges_stay_null(spark):
    """Slots before the first / after the last observation of a key get
    NULL v_lerp (no extrapolation) — the grid spans observations only,
    so edge NULLs can only arise from NULL-valued buckets."""
    from automated_batch_data_pipeline_nyc_spark.operators.timeseries import (
        gap_fill_interpolate,
    )

    df = spark.createDataFrame(
        [("a", "1970-01-01 00:00:05", 1.0), ("a", "1970-01-01 00:00:25", 3.0)],
        ["k", "ts", "v"],
    ).select("k", F.col("ts").cast("timestamp"), "v")
    out = gap_fill_interpolate(df, ["k"], "ts", "v", 10).collect()
    assert {r.slot_s: r.v_lerp for r in out} == {0: 1.0, 10: 2.0, 20: 3.0}
