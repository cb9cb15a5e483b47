"""Bench harness: time every suite query, print ONE machine-parseable JSON line.

Usage: ``python bench.py`` (driver contract)

- data:    $SPARK_GRAFT_SF_DIR   (default /root/testdata/sf0.1)
- master:  local[$SPARK_GRAFT_CPUS] (default 32)
- output:  one JSON line on stdout:
  {"metric": "suite_wall_seconds", "value": <total>, "unit": "sec",
   "queries": {"<name>": <sec>, ...}, "sf": <sf>}

Each query is executed to completion with the noop sink (full pipeline
runs — scan, shuffle, aggregate — but nothing is collected to the
driver, so the timing measures the engine, not result transfer).
Failures are recorded as -1 for that query instead of killing the run.

Two suite entries are deliberately NOT timed: the unblocked O(n^2)
forms that exist purely as small-sf oracle cross-checks for their
production twins (see the suite docs for dedup_ngram_jaccard /
dedup_embedding_cosine vs *_prefix / *_lsh).  They are listed in the
output under "excluded" so the omission is visible, not silent.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def _run() -> dict:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from automated_batch_data_pipeline_nyc_spark.session import get_session
    from automated_batch_data_pipeline_nyc_spark.suite import QUERIES

    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    spark = get_session("automated_batch_data_pipeline_nyc_spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/codegen path once so the first timed query doesn't
    # absorb session bring-up.
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    # Oracle-only O(n^2) cross-check forms; their scale-safe twins
    # (dedup_ngram_jaccard_prefix / dedup_embedding_cosine_lsh) are the
    # timed production paths.
    excluded = ["dedup_ngram_jaccard", "dedup_embedding_cosine"]

    timings: dict[str, float] = {}
    total = 0.0
    for name, q in QUERIES.items():
        if name in excluded:
            continue
        t0 = time.perf_counter()
        try:
            q.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
        except Exception as exc:  # keep benching; surface the failure
            print(f"bench: {name} FAILED: {exc!r}", file=sys.stderr)
            dt = -1.0
        timings[name] = round(dt, 4)
        if dt > 0:
            total += dt

    return {
        "metric": "suite_wall_seconds",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "excluded": excluded,
        "sf": sf,
    }


if __name__ == "__main__":
    result = _run()
    print(json.dumps(result))
