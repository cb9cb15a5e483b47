"""Bench harness: time every suite query, print machine-parseable JSON.

Usage: ``python bench.py`` (driver contract)

- data:    $SPARK_GRAFT_SF_DIR   (default /root/testdata/sf0.1)
- master:  local[$SPARK_GRAFT_CPUS] (default 32)
- output:  the full per-query JSON object (with the ~150-entry
  "queries" timing map) goes to STDERR; stdout carries the same full
  line FIRST and then ends with ONE SHORT summary line
  {"metric": "suite_wall_seconds", "value": <total>,
   "value_calibrated": <total normalized to the anchor host speed>,
   "value_production": <total minus verification-only forms>,
   "unit": "sec", "sf": <sf>, "calib_s": <host calibration>,
   "n_runs": N, "picked_run": N, "n_queries": N, "n_failed": N,
   "slowest": {...top5}}
  When the cold calib probe exceeds 1.15x the anchor OR any warm
  (mid-run/final) probe exceeds the steady gate, the whole suite
  re-measures in a fresh subprocess (up to 3 runs); the record is the
  run with the best (clean, min value_calibrated, min calib_steady_s)
  pick key — see _RERUN_GATE/_pick_key below (VERDICT r9 item 6 +
  r10 item 1).
  The driver keeps only a ~2 KB tail of stdout, which truncated round
  2's single 4 KB line and lost the head "value" field — the short
  LAST line always survives tail capture and parses on its own.

Each query is executed to completion with the noop sink (full pipeline
runs — scan, shuffle, aggregate — but nothing is collected to the
driver, so the timing measures the engine, not result transfer).
Failures are recorded as -1 for that query instead of killing the run.

Three suite entries are deliberately NOT timed: the unblocked O(n^2)
forms that exist purely as small-sf oracle cross-checks for their
production twins (see the suite docs for dedup_ngram_jaccard /
dedup_embedding_cosine / containment_pairs_blocked vs *_prefix /
*_lsh).  They are listed in the output under "excluded" so the
omission is visible, not silent.  Five further timed entries are
verification-only forms reported separately ("verification_forms" /
"value_production").
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

#: calib_s measured on the round-3 driver host (the cleanest run so
#: far) — the anchor for cross-round normalization.  value_calibrated
#: = value * (CALIB_ANCHOR_S / calib_s): >1x means the run's host was
#: slower than the anchor host, and the query times scale accordingly.
CALIB_ANCHOR_S = 0.55


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
    # ... and the Python/Arrow worker pool: the first mapInPandas stage
    # otherwise absorbs ~2-3 s of daemon spin-up, charging it to
    # whichever query happens to run first after a window rotation
    # (round 5 measured 3.0 s first run vs 0.7 s steady-state on the
    # same query).
    spark.range(1_000).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()
    # ... and the first-REAL-query machinery: parquet reader/footer
    # paths, the cache manager (persist), and the localCheckpoint RDD
    # path each initialize lazily, and round 10 measured whichever
    # query sits in window slot 1 absorbing ~6 s of these one-time
    # session costs at sf0.1 (8.3 s cold vs 1.8 s warm for the same
    # query, both fresh frames).  Warm them on the 5-row region table
    # so slot-1 timings compare across rounds on query cost, not
    # rotation position.
    warm = spark.read.parquet(os.path.join(sf_dir, "region.parquet"))
    warm.persist().count()
    warm.localCheckpoint(eager=True).count()
    warm.unpersist()

    # Host-speed calibration anchor: a fixed CPU-bound workload timed on
    # the warmed session.  This host's effective CPU allocation varies
    # run-to-run (round-4 measured 2-8x inflation from outside load), so
    # cross-round query-time comparisons should be read relative to
    # calib_s, not as absolutes.
    def _calib_compute() -> float:
        t0 = time.perf_counter()
        spark.range(200_000_000).selectExpr(
            # double accumulators: ANSI-safe (a bigint sum of 2e8 64-bit
            # hashes overflows), still one xxhash64 + fma per row
            "sum(cast(xxhash64(id) as double))",
            "sum(cast(id as double) * cast(id as double))",
        ).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # Second probe: per-JOB scheduling overhead (round-7 addition).
    # calib_s measures raw compute throughput, but iterative queries
    # (BPE training, BFS, streaming micro-batches) are dominated by
    # Spark job/stage launch latency, which swings independently of CPU
    # speed on shared hosts — round 7 measured the same iterative query
    # at 4 s and 25 s minutes apart while calib_s moved only 1.16x.
    # 20 tiny two-stage jobs isolate that latency: read cross-round
    # swings in job-heavy queries relative to calib_jobs_s, and
    # everything else relative to calib_s.
    def _calib_jobs() -> float:
        t0 = time.perf_counter()
        for _ in range(20):
            spark.range(32, numPartitions=32).selectExpr(
                "id % 4 AS g"
            ).groupBy("g").count().write.format("noop").mode(
                "overwrite"
            ).save()
        return time.perf_counter() - t0

    # INTERLEAVED probes (VERDICT r7 item 2a): one sample before the
    # loop, one mid-loop, one after, all recorded — a host-load shift
    # mid-run is then visible in the record itself.  IMPORTANT
    # (measured r8): the probe has a JVM warm-up curve — the identical
    # job measures ~0.58 s on first execution and ~0.17-0.23 s once the
    # codegen/JIT paths are hot — so the FIRST sample is the only one
    # comparable to CALIB_ANCHOR_S (every r3-r7 record was a first-shot
    # probe), and it alone feeds value_calibrated.  The later samples
    # are steady-state: compare them to EACH OTHER (calib_steady_s =
    # their min) to detect mid-run load shifts; never mix the two
    # regimes in one median (an r8 draft did, inflating the calibrated
    # total 1.6x on a quiet host).
    calib_samples = [_calib_compute()]
    calib_jobs_samples = [_calib_jobs()]

    # Oracle-only O(n^2) cross-check forms; their scale-safe twins
    # (dedup_ngram_jaccard_prefix / dedup_embedding_cosine_lsh /
    # containment_pairs_prefix) are the timed production paths.
    excluded = [
        "dedup_ngram_jaccard",
        "dedup_embedding_cosine",
        "containment_pairs_blocked",
    ]

    run_list = [n for n in QUERIES if n not in excluded]
    midpoint = len(run_list) // 2
    timings: dict[str, float] = {}
    total = 0.0
    for i, name in enumerate(run_list):
        if i == midpoint:  # mid-run calibration sample
            calib_samples.append(_calib_compute())
            calib_jobs_samples.append(_calib_jobs())
        q = QUERIES[name]
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
    calib_samples.append(_calib_compute())
    calib_jobs_samples.append(_calib_jobs())
    # first-shot = anchor-comparable; warm tail = intra-run drift signal
    calib_s = round(calib_samples[0], 3)
    calib_jobs_s = round(calib_jobs_samples[0], 3)
    calib_steady_s = round(sorted(calib_samples[1:])[0], 3)
    calib_jobs_steady_s = round(sorted(calib_jobs_samples[1:])[0], 3)

    # Production-path subtotal (VERDICT r7 item 5): these timed entries
    # exist to cross-verify a production twin rather than as the path a
    # user would run at 100 TB — portable md5-32 signature twins of the
    # engine-hash dedups, single-step/probe verification forms of the
    # iterative clustering ops, and the between-batch O(increment x
    # corpus-candidate) verification shape of incremental dedup.  They
    # stay timed (a regression there is still a regression) but are
    # reported separately so a swing in a verification form cannot
    # drown a regression in a real path, and vice versa.
    verification_forms = [
        "dedup_minhash_portable",   # md5-32 twin of dedup_minhash
        "dedup_simhash_portable",   # md5-32 twin of dedup_simhash
        "kmeans_step_verified",     # one-step twin of embedding_centroids
        "ivf_probe_verified",       # hash-verified twin of similarity_ivf_topk
        "dedup_incremental_batch",  # between-batch verification shape
    ]
    verification_s = sum(
        t for n, t in timings.items() if n in verification_forms and t > 0
    )
    production_total = total - verification_s

    return {
        "metric": "suite_wall_seconds",
        "value": round(total, 3),
        "unit": "sec",
        # Wall time normalized to the reference host speed (VERDICT r4
        # item 5): CALIB_ANCHOR_S is the round-3 driver host's calib_s,
        # so value_calibrated is directly comparable across rounds even
        # when the host's effective CPU allocation swings 2-8x.
        "value_calibrated": round(total * (CALIB_ANCHOR_S / calib_s), 3)
        if calib_s > 0
        else None,
        "queries": timings,
        # Per-query calibrated timings (VERDICT r5 item 8): cross-round
        # per-query diffs read these directly instead of re-normalizing
        # by hand.  Failures stay -1 (never scaled).
        "queries_calibrated": {
            n: (round(t * (CALIB_ANCHOR_S / calib_s), 4) if t > 0 else t)
            for n, t in timings.items()
        }
        if calib_s > 0
        else None,
        "excluded": excluded,
        "sf": sf,
        "calib_s": calib_s,
        "calib_anchor_s": CALIB_ANCHOR_S,
        # Per-job scheduling-latency probe (20 tiny two-stage jobs);
        # no anchor yet — record and compare across rounds to attribute
        # swings in iterative/streaming queries to scheduler latency
        # rather than plan changes.
        "calib_jobs_s": calib_jobs_s,
        # All three interleaved samples (start / mid / end), so a
        # mid-run load shift is visible in the record itself; the
        # *_steady_s fields are the min of the two WARM samples (the
        # first sample is the anchor-comparable cold shot).
        "calib_samples": [round(s, 3) for s in calib_samples],
        "calib_jobs_samples": [round(s, 3) for s in calib_jobs_samples],
        "calib_steady_s": calib_steady_s,
        "calib_jobs_steady_s": calib_jobs_steady_s,
        # Production-path subtotal: full total minus the verification-
        # only forms listed under "verification_forms".
        "value_production": round(production_total, 3),
        "value_production_calibrated": round(
            production_total * (CALIB_ANCHOR_S / calib_s), 3
        )
        if calib_s > 0
        else None,
        "verification_forms": verification_forms,
    }


#: Auto-rerun noise gate (VERDICT r9 item 6; picker rebuilt per VERDICT
#: r10 item 1): a run is presumed host-load-contaminated — and the suite
#: re-measured in a fresh subprocess, up to _MAX_BENCH_RUNS total — when
#: EITHER probe regime shows load:
#:   - the cold first-shot probe exceeds _RERUN_GATE x CALIB_ANCHOR_S
#:     (session bring-up on a loaded host), or
#:   - ANY warm sample (mid-run / final) exceeds _STEADY_RERUN_GATE_S —
#:     a load burst DURING the run that the cold probe predates.  Warm
#:     samples are JIT-hot so they live in their own regime: quiet-host
#:     warm shots measure 0.17-0.31 s (r8-r10 records); the r10 driver
#:     artifact's loaded run read 0.427/0.376 while its COLD probe
#:     happened to land quiet (0.5) and slipped the old gate.
#: Each run executes in a FRESH subprocess — reusing one JVM would hand
#: rerun N a warm JIT/codegen path, making its "cold" calib_s
#: anchor-incomparable and biasing the pick toward whichever run went
#: last.
_RERUN_GATE = 1.15
_STEADY_RERUN_GATE_S = 0.35
_MAX_BENCH_RUNS = 3


def _run_looks_loaded(r: dict) -> str | None:
    """Reason string when a run's probes show host load, else None."""
    if r["calib_s"] > _RERUN_GATE * CALIB_ANCHOR_S:
        return (
            f"cold calib_s={r['calib_s']} exceeds "
            f"{_RERUN_GATE}x anchor ({CALIB_ANCHOR_S})"
        )
    warm = r.get("calib_samples", [])[1:]
    if warm and max(warm) > _STEADY_RERUN_GATE_S:
        return (
            f"warm calib samples {warm} exceed "
            f"{_STEADY_RERUN_GATE_S}s — mid-run load burst"
        )
    return None


def _pick_key(r: dict):
    """Pick order among measured runs (VERDICT r10 item 1 + ADVICE r10):
    clean runs beat runs with failures (a failed query contributes no
    time, so a dirty run can LOOK fastest), then min calibrated suite
    wall — the number the record actually reports — then min steady
    probe, then raw wall.  NEVER the cold probe alone: a 0.5 s cold
    shot cannot represent a 7-minute suite (the r10 driver session
    picked the louder run exactly that way)."""
    n_failed = sum(1 for t in r["queries"].values() if t < 0)
    calib = r["value_calibrated"]
    return (
        n_failed > 0,
        calib if calib is not None else float("inf"),
        r["calib_steady_s"],
        r["value"],
    )


def _run_child() -> dict:
    """One full suite measurement in a fresh python+JVM."""
    import subprocess

    env = dict(os.environ, SPARK_GRAFT_BENCH_CHILD="1")
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        env=env,
        stdout=subprocess.PIPE,
        stderr=None,  # live progress passes through
        text=True,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"bench child exited {proc.returncode}")
    # child stdout is exactly one JSON line
    return json.loads(proc.stdout.strip().splitlines()[-1])


if __name__ == "__main__":
    if os.environ.get("SPARK_GRAFT_BENCH_CHILD") == "1":
        print(json.dumps(_run()))
        sys.exit(0)

    runs = [_run_child()]
    while len(runs) < _MAX_BENCH_RUNS and (reason := _run_looks_loaded(runs[-1])):
        print(
            f"bench: run {len(runs)} {reason} — host looks loaded, "
            f"re-measuring ({len(runs) + 1}/{_MAX_BENCH_RUNS})",
            file=sys.stderr,
        )
        runs.append(_run_child())
    picked = min(range(len(runs)), key=lambda i: _pick_key(runs[i]))
    result = runs[picked]
    # Run metadata IN the record (VERDICT r9 item 6): the committed
    # numbers carry how many measurements were taken and what every
    # run's probes saw, so a noise artifact can't masquerade as the
    # round's truth.
    result["n_runs"] = len(runs)
    result["picked_run"] = picked + 1
    result["rerun_gate"] = _RERUN_GATE
    result["steady_rerun_gate_s"] = _STEADY_RERUN_GATE_S
    result["pick_key"] = "(n_failed>0, value_calibrated, calib_steady_s, value)"
    result["runs_summary"] = [
        {
            "calib_s": r["calib_s"],
            "calib_steady_s": r["calib_steady_s"],
            "calib_samples": r.get("calib_samples"),
            "calib_jobs_s": r["calib_jobs_s"],
            "value": r["value"],
            "value_calibrated": r["value_calibrated"],
            "n_failed": sum(1 for t in r["queries"].values() if t < 0),
            "loaded": _run_looks_loaded(r),
        }
        for r in runs
    ]
    full = json.dumps(result)
    # Full detail: stderr (always) + first stdout line (for direct runs).
    print(full, file=sys.stderr)
    print(full)
    sys.stdout.flush()
    # Persist the complete result object so per-query timings survive the
    # driver's ~2 KB stdout tail capture (VERDICT r3 item 4) — cross-round
    # regression analysis diffs BENCH_full.json, not the truncated stdout.
    try:
        repo = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(repo, "BENCH_full.json"), "w") as fh:
            json.dump(result, fh, indent=1, sort_keys=True)
            fh.write("\n")
    except OSError as exc:
        print(f"bench: could not write BENCH_full.json: {exc!r}", file=sys.stderr)
    # Short summary LAST on stdout so any tail capture parses it.
    failed = sorted(n for n, t in result["queries"].items() if t < 0)
    slowest = dict(
        sorted(
            ((n, t) for n, t in result["queries"].items() if t > 0),
            key=lambda kv: -kv[1],
        )[:5]
    )
    summary = {
        "metric": result["metric"],
        "value": result["value"],
        "value_calibrated": result["value_calibrated"],
        "value_production": result["value_production"],
        "value_production_calibrated": result["value_production_calibrated"],
        "unit": result["unit"],
        "sf": result["sf"],
        "calib_s": result["calib_s"],
        "calib_jobs_s": result["calib_jobs_s"],
        "n_runs": result.get("n_runs", 1),
        "picked_run": result.get("picked_run", 1),
        "n_queries": len(result["queries"]),
        "n_failed": len(failed),
        "failed": failed[:10],
        "slowest": slowest,
    }
    print(json.dumps(summary))
