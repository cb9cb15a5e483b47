"""Streaming §2.8: the windowed-count stream must agree with batch.

Strategy: stage the sf0.001 events table as plain parquet files (the
stream source needs an explicit schema; the staging hop also repairs
the fixture's TIMESTAMP(NANOS)), then

1. complete-mode memory sink: the full windowed aggregate must equal
   the identical batch aggregation exactly (counts exact, float sums
   to 1e-9 relative — summation order differs across micro-batches);
2. append-mode parquet sink with a 1-hour watermark: every emitted
   (window, type) row must match the batch result exactly, and the
   backlog run (availableNow, maxFilesPerTrigger=1) must emit at
   least one closed window.
"""

from __future__ import annotations

import math
import shutil

import pytest
from pyspark.sql import functions as F

from automated_batch_data_pipeline_nyc_spark.sources import read_parquet
from automated_batch_data_pipeline_nyc_spark.streaming import (
    read_event_stream,
    sessionize_stream,
    windowed_event_counts,
    write_stream_to_parquet,
)

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def staged_events(spark, tmp_path_factory):
    """Stage events as 4 time-quartile files with ascending mtimes —
    an incremental load arriving in (rough) event-time order.  The file
    stream source picks files up in mtime order, so each micro-batch
    only ever advances event time and the watermark never drops data
    (a time-shuffled staging WOULD lose late rows — that's semantics,
    not a bug, but it would make exact batch comparison impossible)."""
    import glob
    import os

    src = str(tmp_path_factory.mktemp("events_stream_src"))
    batch = read_parquet(spark, f"{SF_SMOKE}/events.parquet").filter(
        F.col("ts").isNotNull()
    )
    # several files => several micro-batches under maxFilesPerTrigger=1,
    # so the watermark actually advances between triggers.
    staging = str(tmp_path_factory.mktemp("events_stream_staging"))
    batch.repartitionByRange(4, "ts").sortWithinPartitions("ts").write.mode(
        "overwrite"
    ).parquet(staging)
    for i, part in enumerate(sorted(glob.glob(f"{staging}/part-*.parquet"))):
        dest = os.path.join(src, f"chunk_{i}.parquet")
        shutil.move(part, dest)
        os.utime(dest, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))
    yield src, batch
    shutil.rmtree(src, ignore_errors=True)


def _batch_expected(batch):
    return (
        batch.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def _key(row):
    return (row["window_start"], row["window_end"], row["event_type"])


def test_windowed_counts_complete_mode_equals_batch(spark, staged_events):
    src, batch = staged_events
    stream = read_event_stream(spark, src, max_files_per_trigger=1)
    q = (
        windowed_event_counts(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("wec_complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(180)
    finally:
        q.stop()
    got = {_key(r): r for r in spark.table("wec_complete").collect()}
    want = {_key(r): r for r in _batch_expected(batch).collect()}
    assert set(got) == set(want)
    for k, row in want.items():
        assert got[k]["n_events"] == row["n_events"], k
        assert math.isclose(
            got[k]["total_value"], row["total_value"], rel_tol=1e-9
        ), k


def test_append_parquet_sink_emits_closed_windows(spark, staged_events, tmp_path):
    src, batch = staged_events
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream = read_event_stream(spark, src, max_files_per_trigger=1)
    q = write_stream_to_parquet(
        windowed_event_counts(stream, watermark="1 hour"), out, ckpt
    )
    try:
        assert q.awaitTermination(180)
    finally:
        q.stop()
    emitted = {_key(r): r for r in spark.read.parquet(out).collect()}
    # append mode withholds windows the watermark hasn't closed; with
    # time-ordered input nothing is dropped as late, so the emitted set
    # is exactly the batch windows closed by the final watermark
    # (window_end <= max event time - 1h), value-exact per row.
    assert emitted, "watermark never closed any window"
    max_ts = batch.agg(F.max("ts")).collect()[0][0]
    want = {
        _key(r): r
        for r in _batch_expected(batch).collect()
        if (max_ts - r["window_end"]).total_seconds() >= 3600
    }
    assert set(emitted) == set(want)
    for k, row in want.items():
        assert emitted[k]["n_events"] == row["n_events"], k
        assert math.isclose(
            emitted[k]["total_value"], row["total_value"], rel_tol=1e-9
        ), k


def test_stateful_sessionizer_matches_batch_closed_sessions(spark, staged_events):
    """applyInPandasWithState sessionizer vs the batch sessionize
    operator: the stream emits a session when a later same-user event
    closes it, so emitted sessions == batch sessions minus each user's
    final (still-open) session."""
    from automated_batch_data_pipeline_nyc_spark.operators.windows import sessionize

    src, batch = staged_events
    stream = read_event_stream(spark, src, max_files_per_trigger=1)
    q = (
        sessionize_stream(stream, gap_s=1800)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("sessions_stream")
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(180)
    finally:
        q.stop()
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.table("sessions_stream").collect()
    }
    s = sessionize(
        batch.filter(F.col("user_id").isNotNull()), "user_id", "ts", "event_id"
    )
    agg = s.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
    )
    last = agg.groupBy("user_id").agg(F.max("session_id").alias("last_sid"))
    closed = agg.join(
        last,
        (agg.user_id == last.user_id) & (agg.session_id == last.last_sid),
        "left_anti",
    )
    want = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in closed.collect()
    }
    assert got == want
    assert got, "no session ever closed — staging produced a degenerate stream"


def test_stream_static_join_equals_batch(spark, staged_events, tmp_path):
    """Stream-static enrichment: joining each micro-batch against a
    static dim must produce exactly the batch join's rows."""
    from automated_batch_data_pipeline_nyc_spark.streaming import enrich_stream_static

    src, batch = staged_events
    dim = (
        batch.select("user_id").distinct().filter(F.col("user_id").isNotNull())
        .withColumn("tier", F.when(F.col("user_id") % 2 == 0, "even").otherwise("odd"))
    )
    stream = read_event_stream(spark, src, max_files_per_trigger=2)
    enriched = enrich_stream_static(
        stream.filter(F.col("user_id").isNotNull()), dim, on="user_id"
    )
    q = (
        enriched.writeStream.format("memory")
        .queryName("t_ss_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("t_ss_join").groupBy("tier").count().collect()
    want = (
        batch.filter(F.col("user_id").isNotNull())
        .join(dim, "user_id")
        .groupBy("tier")
        .count()
        .collect()
    )
    assert {r.tier: r["count"] for r in got} == {r.tier: r["count"] for r in want}


def test_streaming_dedup_within_watermark(spark, staged_events, tmp_path):
    """Re-delivered events (same event_id) collapse to one row."""
    import glob
    import os
    import shutil as sh

    from automated_batch_data_pipeline_nyc_spark.streaming import dedup_stream

    src, batch = staged_events
    # duplicate every file: at-least-once delivery simulation; copies
    # get later mtimes so they arrive in later micro-batches while the
    # originals are still inside the watermark horizon.
    dup_src = str(tmp_path / "dup_src")
    os.makedirs(dup_src)
    for i, f in enumerate(sorted(glob.glob(f"{src}/*.parquet"))):
        sh.copy(f, os.path.join(dup_src, f"a_{i}.parquet"))
        sh.copy(f, os.path.join(dup_src, f"b_{i}.parquet"))
        os.utime(os.path.join(dup_src, f"a_{i}.parquet"), (1_700_000_000 + i, ) * 2)
        os.utime(os.path.join(dup_src, f"b_{i}.parquet"), (1_700_000_100 + i, ) * 2)
    stream = read_event_stream(spark, dup_src, max_files_per_trigger=2)
    deduped = dedup_stream(stream, ["event_id"], ts_col="ts", watermark="10 hours")
    q = (
        deduped.writeStream.format("memory")
        .queryName("t_dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n = spark.table("t_dedup_stream").count()
    assert n == batch.count(), "every re-delivered event_id must collapse to one row"


def test_foreach_batch_upsert_latest_wins(spark, staged_events, tmp_path):
    """Streaming MERGE sink: the final table holds one row per user
    with that user's latest event."""
    from automated_batch_data_pipeline_nyc_spark.streaming import foreach_batch_upsert

    src, batch = staged_events
    clean = batch.filter(F.col("user_id").isNotNull())
    stream = read_event_stream(spark, src, max_files_per_trigger=1).filter(
        F.col("user_id").isNotNull()
    )
    try:
        q = foreach_batch_upsert(
            stream,
            "t_user_latest",
            ["user_id"],
            checkpoint=str(tmp_path / "ckpt"),
            order_col="ts",
        )
        q.awaitTermination(180)
        got = spark.table("t_user_latest")
        assert got.groupBy("user_id").count().filter(F.col("count") > 1).count() == 0
        # spot-check: each user's stored ts is their max event ts
        from pyspark.sql import functions as FF

        want = clean.groupBy("user_id").agg(FF.max("ts").alias("max_ts"))
        bad = (
            got.join(want, "user_id")
            .filter(FF.col("ts") != FF.col("max_ts"))
            .count()
        )
        assert bad == 0
    finally:
        spark.sql("DROP TABLE IF EXISTS t_user_latest")


def test_stream_stream_interval_join_equals_batch(spark, staged_events):
    """Inner stream-stream join with a time-range bound emits exactly the
    batch join's pairs (append mode, each pair once)."""
    import uuid

    from automated_batch_data_pipeline_nyc_spark.streaming.jobs import (
        join_streams_interval,
        read_event_stream,
    )

    src, batch = staged_events
    views = (
        read_event_stream(spark, src)
        .filter(F.col("event_type") == "view")
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select(F.col("user_id").alias("u"), F.col("ts").alias("v_ts"))
    )
    purchases = (
        read_event_stream(spark, src)
        .filter(F.col("event_type") == "purchase")
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select(
            F.col("user_id").alias("u"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("p_id"),
        )
    )
    joined = join_streams_interval(
        views, purchases, key="u", left_ts="v_ts", right_ts="p_ts",
        within="1 hour", watermark="1440 hours",
    )
    name = f"ssj_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    got = {
        (r.u, r.v_ts, r.p_id) for r in spark.table(name).collect()
    }

    events = batch
    v = events.filter(
        (F.col("event_type") == "view") & F.col("user_id").isNotNull()
    ).select(F.col("user_id").alias("u"), F.col("ts").alias("v_ts"))
    p = events.filter(
        (F.col("event_type") == "purchase") & F.col("user_id").isNotNull()
    ).select(
        F.col("user_id").alias("pu"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_id"),
    )
    want = {
        (r.u, r.v_ts, r.p_id)
        for r in v.join(
            p,
            (v.u == p.pu)
            & (p.p_ts >= v.v_ts)
            & (p.p_ts <= F.expr("v_ts + INTERVAL 1 hour")),
        ).collect()
    }
    assert got == want and len(want) > 0


def test_stream_join_accepts_shared_ts_names(spark, staged_events):
    """Both sides naturally carry a column named after the event time; the
    interval bound must stay resolvable (regression: a bare F.expr on the
    left_ts name was ambiguous)."""
    from automated_batch_data_pipeline_nyc_spark.streaming.jobs import (
        join_streams_interval,
        read_event_stream,
    )

    src, _batch = staged_events
    left = (
        read_event_stream(spark, src)
        .filter(F.col("event_type") == "view")
        .select("user_id", F.col("ts").alias("l_ts"), F.col("ts"))
    )
    right = (
        read_event_stream(spark, src)
        .filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("r_ts"), F.col("ts"))
    )
    # analysis-time check only: building the join must not raise even
    # though both sides still expose a raw `ts` column
    joined = join_streams_interval(
        left.drop("ts"), right, key="user_id",
        left_ts="l_ts", right_ts="r_ts", within="1 hour",
    )
    assert "r_ts" in joined.columns and "l_ts" in joined.columns


def test_streaming_ewma_state_carries_across_batches(spark, staged_events):
    """One file per micro-batch: the EWMA state must carry between
    triggers and the terminal per-key value must equal the batch fold."""
    import uuid

    from automated_batch_data_pipeline_nyc_spark.streaming.jobs import (
        ewma_stream,
        read_event_stream,
    )

    src, batch = staged_events
    out = ewma_stream(read_event_stream(spark, src, max_files_per_trigger=1))
    name = f"ewma_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(180)
    finally:
        q.stop()
    final = {
        r.user_id: (r.n_events, r.ewma)
        for r in spark.table(name)
        .groupBy("user_id")
        .agg(F.max(F.struct("n_events", "ewma")).alias("s"))
        .select("user_id", F.col("s.n_events").alias("n_events"),
                F.col("s.ewma").alias("ewma"))
        .collect()
    }
    # independent batch fold over the same rows
    e = batch.filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    arr = F.transform(
        F.array_sort(F.collect_list(F.struct("ts", "event_id", "value"))),
        lambda x: x["value"],
    )
    agged = e.groupBy("user_id").agg(arr.alias("vs"), F.count(F.lit(1)).alias("n"))
    fold = F.aggregate(
        F.slice(F.col("vs"), 2, F.greatest(F.size("vs") - 1, F.lit(0))),
        F.element_at(F.col("vs"), 1),
        lambda s, x: F.lit(0.3) * x + F.lit(0.7) * s,
    )
    want = {
        r.user_id: (r.n, r.f)
        for r in agged.select("user_id", "n", fold.alias("f")).collect()
    }
    assert set(final) == set(want)
    for u in want:
        assert final[u][0] == want[u][0], u
        assert final[u][1] == want[u][1], (u, final[u], want[u])


def test_streaming_ewma_rejects_out_of_order_batches(spark, tmp_path):
    """Time-shuffled chunked delivery must FAIL loudly, not silently
    mis-smooth: the kernel checks each batch's min event time against the
    carried last-seen timestamp."""
    import datetime
    import os

    from pyspark.sql.utils import StreamingQueryException

    from automated_batch_data_pipeline_nyc_spark.streaming.jobs import (
        ewma_stream,
        read_event_stream,
    )

    base = datetime.datetime(2024, 1, 1, 12, 0, 0)
    late = [(i, base + datetime.timedelta(hours=2, seconds=i), 1, "view", 1.0, "{}")
            for i in range(5)]
    early = [(10 + i, base + datetime.timedelta(seconds=i), 1, "view", 1.0, "{}")
             for i in range(5)]
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    src = str(tmp_path / "ooo")
    os.makedirs(src)
    # file 0 carries the LATE window, file 1 the EARLY one — mtime order
    # makes the late window arrive first
    for i, rows in enumerate((late, early)):
        f = os.path.join(src, f"chunk_{i}.parquet")
        spark.createDataFrame(rows, cols).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f + ".dir")
        import glob
        import shutil

        part = glob.glob(f"{f}.dir/part-*.parquet")[0]
        shutil.move(part, f)
        shutil.rmtree(f + ".dir")
        os.utime(f, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))

    out = ewma_stream(read_event_stream(spark, src, max_files_per_trigger=1))
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("ewma_ooo")
        .trigger(availableNow=True)
        .start()
    )
    try:
        with pytest.raises(StreamingQueryException, match="out-of-order"):
            q.awaitTermination(120)
            q.processAllAvailable()
    finally:
        q.stop()


def test_streaming_ewma_rejects_tie_straddling_batches(spark, tmp_path):
    """A timestamp tie straddling two micro-batches with event_ids in the
    wrong order must FAIL loudly (round-4 fix): the carried (last_us,
    last_id) pair detects ts == carried ts with a smaller id, which the
    old timestamp-only guard silently accepted and mis-folded."""
    import datetime
    import glob
    import os
    import shutil

    from pyspark.sql.utils import StreamingQueryException

    from automated_batch_data_pipeline_nyc_spark.streaming.jobs import (
        ewma_stream,
        read_event_stream,
    )

    base = datetime.datetime(2024, 1, 1, 12, 0, 0)
    tie_ts = base + datetime.timedelta(seconds=100)
    # batch 0 ends at (tie_ts, id=20); batch 1 starts at (tie_ts, id=7):
    # same timestamp, smaller id — the (ts, id) fold order is violated
    first = [(1, base, 1, "view", 1.0, "{}"), (20, tie_ts, 1, "view", 2.0, "{}")]
    second = [(7, tie_ts, 1, "view", 3.0, "{}")]
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    src = str(tmp_path / "tie")
    os.makedirs(src)
    for i, rows in enumerate((first, second)):
        f = os.path.join(src, f"chunk_{i}.parquet")
        spark.createDataFrame(rows, cols).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f + ".dir")
        part = glob.glob(f"{f}.dir/part-*.parquet")[0]
        shutil.move(part, f)
        shutil.rmtree(f + ".dir")
        os.utime(f, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))

    out = ewma_stream(read_event_stream(spark, src, max_files_per_trigger=1))
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("ewma_tie")
        .trigger(availableNow=True)
        .start()
    )
    try:
        with pytest.raises(StreamingQueryException, match="tie straddles"):
            q.awaitTermination(120)
            q.processAllAvailable()
    finally:
        q.stop()


def test_streaming_countmin_equals_batch_sketch(spark, staged_events):
    """Sketch cells are linear, so the incrementally maintained
    streaming CM sketch (one file per micro-batch) must equal the
    from-scratch batch sketch cell-for-cell."""
    import uuid

    from automated_batch_data_pipeline_nyc_spark.operators.stats import (
        countmin_sketch,
    )

    src, batch = staged_events
    stream_sk = countmin_sketch(
        read_event_stream(spark, src, max_files_per_trigger=1),
        "user_id", depth=4, width=64,
    )
    name = f"cm_{uuid.uuid4().hex[:8]}"
    q = (
        stream_sk.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(300)
    finally:
        q.stop()
    got = {(r.row, r.bucket): r.cnt for r in spark.table(name).collect()}
    want = {
        (r.row, r.bucket): r.cnt
        for r in countmin_sketch(batch, "user_id", depth=4, width=64).collect()
    }
    assert got == want


def test_stream_txlog_sink_exactly_once(spark, staged_events, tmp_path):
    """Streaming sink into the versioned transaction log: each
    micro-batch is one atomic append commit; restarting the finished
    stream commits nothing new, and a simulated foreachBatch replay
    (same app_id + batch_id) is recognized in the log and skipped, so
    the table contents stay exact — not merely deduplicated at read
    time."""
    from automated_batch_data_pipeline_nyc_spark.sources import txlog
    from automated_batch_data_pipeline_nyc_spark.streaming.jobs import (
        read_event_stream,
        stream_txlog_sink,
    )

    src, batch = staged_events
    table = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    stream = read_event_stream(spark, src, max_files_per_trigger=2)
    q = stream_txlog_sink(stream, table, ckpt, app_id="events-loader")
    q.awaitTermination(180)

    want = batch.count()
    assert txlog.read_table(spark, table).count() == want
    hist = txlog.table_history(spark, table).collect()
    assert len(hist) >= 2  # maxFilesPerTrigger=2 over >2 files
    assert all(r.op == "append" for r in hist)

    # restart over the same checkpoint: backlog already processed,
    # no new versions
    v_before = txlog.current_version(table)
    q2 = stream_txlog_sink(stream, table, ckpt, app_id="events-loader")
    q2.awaitTermination(180)
    assert txlog.current_version(table) == v_before
    assert txlog.read_table(spark, table).count() == want

    # simulated crash-replay of the last batch: same txn → skipped
    last_batch = max(
        e["txn_batch"]
        for e in txlog._read_log(table)
        if "txn_batch" in e
    )
    assert (
        txlog.commit(
            batch.limit(5), table, mode="append",
            txn=("events-loader", last_batch),
        )
        is None
    )
    assert txlog.read_table(spark, table).count() == want
    # a NEW batch id from the same app does commit
    v = txlog.commit(
        batch.limit(5), table, mode="append",
        txn=("events-loader", last_batch + 1),
    )
    assert v == v_before + 1
    assert txlog.read_table(spark, table).count() == want + 5


def test_foreach_batch_upsert_partitioned_prunes(spark, staged_events, tmp_path):
    """Partition-pruned streaming MERGE (the scale path for
    foreach_batch_upsert's O(|table|)-per-batch rewrite): semantics
    match the table-rewrite sink — one row per key, latest order_col
    wins — and a follow-up batch touching ONE partition leaves every
    other partition's files physically untouched."""
    import glob
    import os

    from automated_batch_data_pipeline_nyc_spark.streaming.jobs import (
        foreach_batch_upsert_partitioned,
    )

    src, batch = staged_events
    part = F.pmod(F.col("user_id"), F.lit(8)).cast("long")
    clean = batch.filter(F.col("user_id").isNotNull()).withColumn("p", part)
    target = str(tmp_path / "user_latest")

    stream = (
        read_event_stream(spark, src, max_files_per_trigger=1)
        .filter(F.col("user_id").isNotNull())
        .withColumn("p", part)
    )
    q = foreach_batch_upsert_partitioned(
        stream,
        target,
        ["user_id"],
        partition_col="p",
        checkpoint=str(tmp_path / "ckpt1"),
        order_col="ts",
    )
    q.awaitTermination(180)

    got = spark.read.parquet(target)
    assert got.groupBy("user_id").count().filter(F.col("count") > 1).count() == 0
    want = clean.groupBy("user_id").agg(F.max("ts").alias("max_ts"))
    assert (
        got.join(want, "user_id").filter(F.col("ts") != F.col("max_ts")).count()
        == 0
    )

    # snapshot the physical file state of every partition
    def snap(p):
        return {
            f: os.path.getmtime(f)
            for f in glob.glob(os.path.join(target, f"p={p}", "*.parquet"))
        }

    before = {p: snap(p) for p in range(8)}
    assert any(before.values())

    # second stream: rows for exactly ONE user (one partition)
    victim = clean.filter(F.col("p") == 3).select("user_id").first().user_id
    upd = (
        clean.filter(F.col("user_id") == victim)
        .limit(1)
        .withColumn("ts", F.col("ts") + F.expr("INTERVAL 1000 days"))
    )
    src2 = str(tmp_path / "src2")
    upd.write.parquet(src2)
    stream2 = (
        read_event_stream(spark, src2, max_files_per_trigger=1)
        .filter(F.col("user_id").isNotNull())
        .withColumn("p", part)
    )
    q2 = foreach_batch_upsert_partitioned(
        stream2,
        target,
        ["user_id"],
        partition_col="p",
        checkpoint=str(tmp_path / "ckpt2"),
        order_col="ts",
    )
    q2.awaitTermination(180)

    after = {p: snap(p) for p in range(8)}
    for p in range(8):
        if p == 3:
            assert after[p] != before[p], "touched partition must rewrite"
        else:
            assert after[p] == before[p], (
                f"untouched partition p={p} was rewritten — pruning failed"
            )
    # and the merge applied: the victim's row carries the advanced ts
    new_ts = (
        spark.read.parquet(target)
        .filter(F.col("user_id") == victim)
        .first()
        .ts
    )
    old_max = (
        clean.filter(F.col("user_id") == victim)
        .agg(F.max("ts"))
        .first()[0]
    )
    assert new_ts > old_max


def test_stream_conf_scope_sets_and_restores(spark):
    """The suite's stateful streams run with _STREAM_STATE_PARTITIONS
    state-store partitions (VERDICT r9 item 3: commit waves, not data,
    dominate availableNow micro-batch wall time) and the scope must
    restore the session default even when the body raises — a leaked
    override would silently re-plan every later batch query."""
    from automated_batch_data_pipeline_nyc_spark.suite import (
        _STREAM_STATE_PARTITIONS,
        _stream_conf_scope,
    )

    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    with _stream_conf_scope(spark):
        assert spark.conf.get(key) == str(_STREAM_STATE_PARTITIONS)
    assert spark.conf.get(key) == before

    import pytest as _p

    with _p.raises(RuntimeError, match="boom"):
        with _stream_conf_scope(spark):
            raise RuntimeError("boom")
    assert spark.conf.get(key) == before, "scope must restore on raise"
