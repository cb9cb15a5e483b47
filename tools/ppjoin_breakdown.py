"""Stage-level breakdown of jaccard_prefix_pairs (optimization r13).

Times each stage of the PPJoin in isolation on a warmed bench-like
session so the 5s wall of the 9 consumer queries can be attributed:
g build/persist, candidate join+distinct, verify joins, full operator.

    python tools/ppjoin_breakdown.py [--sf DIR] [--reps N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CPUS", "32")


def t(label, fn, reps=3):
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    print(f"{label:34s} " + " ".join(f"{x:.3f}" for x in times))


def main():
    sf = "/root/testdata/sf0.1"
    if "--sf" in sys.argv:
        sf = sys.argv[sys.argv.index("--sf") + 1]

    from pyspark.sql import functions as F

    from automated_batch_data_pipeline_nyc_spark.operators import dedup as dd
    from automated_batch_data_pipeline_nyc_spark.operators.util import spread
    from automated_batch_data_pipeline_nyc_spark.session import get_session
    from automated_batch_data_pipeline_nyc_spark.sources import read_parquet
    from bench import _warm_session

    spark = get_session("ppjoin_breakdown")
    spark.sparkContext.setLogLevel("ERROR")
    _warm_session(spark, [sf])

    docs = read_parquet(spark, os.path.join(sf, "documents.parquet"))

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    id_col, text_col, n, threshold = "doc_id", "text", 2, 0.8
    toks = F.split(F.lower(F.col(text_col)), " ")
    grams = F.array_sort(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
            )
        )
    )

    def build_g():
        return spread(docs.select(F.col(id_col), F.col(text_col))).select(
            F.col(id_col),
            F.transform(grams, lambda s: F.xxhash64(s)).alias("__h"),
        )

    # warm the operator once (JIT)
    dd.jaccard_prefix_pairs(docs, id_col, text_col, n=n, threshold=threshold)

    t("A g compute (noop, no persist)", lambda: noop(build_g()))

    def stage_b():
        g = build_g().persist()
        noop(g)
        g.unpersist()

    t("B g persist+materialize", stage_b)

    def make_cand(g):
        prefix_len = (
            F.size("__h") - F.ceil(F.lit(threshold) * F.size("__h") - F.lit(1e-9)) + 1
        ).cast("int")
        p = g.select(
            F.col(id_col),
            F.size("__h").alias("__sz"),
            F.posexplode(F.slice(F.col("__h"), 1, prefix_len)).alias(
                "__pos", "__gram"
            ),
        )
        a, b = p.alias("a"), p.alias("b")
        tl = F.lit(threshold)
        need = F.ceil(
            F.lit(threshold / (1.0 + threshold)) * (F.col("a.__sz") + F.col("b.__sz"))
            - F.lit(1e-9)
        )
        overlap_ub = (
            F.least(F.col("a.__pos"), F.col("b.__pos"))
            + 1
            + F.least(
                F.col("a.__sz") - F.col("a.__pos") - 1,
                F.col("b.__sz") - F.col("b.__pos") - 1,
            )
        )
        return (
            a.join(
                b,
                (F.col("a.__gram") == F.col("b.__gram"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
                & (F.col("b.__sz").cast("double") >= tl * F.col("a.__sz"))
                & (F.col("a.__sz").cast("double") >= tl * F.col("b.__sz"))
                & (overlap_ub >= need),
            )
            .select(
                F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
            )
            .distinct()
        )

    def stage_c():
        g = build_g().persist()
        noop(make_cand(g))
        g.unpersist()

    t("C g+cand join+distinct", stage_c)

    def stage_d():
        g = build_g().persist()
        cand = make_cand(g)
        pairs = (
            cand.join(
                g.select(F.col(id_col).alias("id_a"), F.col("__h").alias("__ha")),
                "id_a",
            )
            .join(
                g.select(F.col(id_col).alias("id_b"), F.col("__h").alias("__hb")),
                "id_b",
            )
            .select(
                "id_a",
                "id_b",
                (
                    F.size(F.array_intersect("__ha", "__hb")).cast("double")
                    / F.size(F.array_union("__ha", "__hb")).cast("double")
                ).alias("jaccard"),
            )
            .filter(F.col("jaccard") >= threshold)
        )
        noop(pairs)
        g.unpersist()

    t("D g+cand+verify (no ckpt)", stage_d)

    t(
        "E full operator (with ckpt)",
        lambda: noop(
            dd.jaccard_prefix_pairs(docs, id_col, text_col, n=n, threshold=threshold)
        ),
    )

    # count the candidate/pair volumes once for the record
    g = build_g().persist()
    cand = make_cand(g)
    print("cand pairs:", cand.count())
    g.unpersist()


if __name__ == "__main__":
    main()
