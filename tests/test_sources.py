"""Reader/writer surface (S1-S15, M2/M3) — round-trip evidence for the
source/sink rows of SURVEY.md §2 that no oracle query exercises."""

from __future__ import annotations

import glob
import os
import pathlib
import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from automated_batch_data_pipeline_nyc_spark.sources import read_parquet
from automated_batch_data_pipeline_nyc_spark.sources.readers import (
    fetch_url,
    from_rows,
    read_csv,
    read_csv_glob,
    read_sql_table,
)
from automated_batch_data_pipeline_nyc_spark.sources.writers import (
    export_csv_single_file,
    write_csv,
    write_parquet,
    write_table,
)

from .conftest import SF_SMOKE

NATION_SCHEMA = T.StructType(
    [
        T.StructField("n_nationkey", T.LongType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.LongType()),
    ]
)


@pytest.fixture()
def nation(spark):
    return read_parquet(spark, f"{SF_SMOKE}/nation.parquet").select(
        "n_nationkey", "n_name", "n_regionkey"
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_csv_write_read_roundtrip(spark, nation, tmp_path):
    out = str(tmp_path / "nation_csv")
    write_csv(nation, out)
    back = read_csv(spark, out, schema=NATION_SCHEMA)
    assert _rows(back) == _rows(nation)


def test_csv_glob_read_and_empty_glob_raises(spark, nation, tmp_path):
    out = str(tmp_path / "nation_csv")
    write_csv(nation, out)
    back = read_csv_glob(spark, f"{out}/part-*.csv", schema=NATION_SCHEMA)
    assert back.count() == nation.count()
    with pytest.raises(FileNotFoundError):
        read_csv_glob(spark, str(tmp_path / "nope" / "*.csv"))


def test_single_file_csv_export_is_one_deterministic_file(spark, nation, tmp_path):
    out = str(tmp_path / "export")
    export_csv_single_file(nation, out, order_by=["n_nationkey"])
    parts = glob.glob(f"{out}/part-*.csv")
    assert len(parts) == 1, "coalesce(1) must yield exactly one data file"
    lines = pathlib.Path(parts[0]).read_text().strip().splitlines()
    assert lines[0] == "n_nationkey,n_name,n_regionkey"
    keys = [int(line.split(",")[0]) for line in lines[1:]]
    assert keys == sorted(keys), "export must be ordered"


def test_write_table_modes_and_sql_extract(spark, nation):
    write_table(nation, "t_nation_modes", mode="overwrite")        # S11
    write_table(nation, "t_nation_modes", mode="append")           # S10
    assert spark.table("t_nation_modes").count() == 2 * nation.count()
    write_table(nation, "t_nation_modes", mode="ignore")           # M2: no-op
    assert spark.table("t_nation_modes").count() == 2 * nation.count()
    # S5: catalog extract with predicate pushdown surface
    sub = read_sql_table(spark, "t_nation_modes", predicate="n_regionkey = 0")
    assert sub.count() == 2 * nation.filter("n_regionkey = 0").count()
    spark.sql("DROP TABLE t_nation_modes")


def test_partitioned_parquet_sink_prunes_partitions(spark, nation, tmp_path):
    out = str(tmp_path / "nation_part")
    write_parquet(nation, out, partition_by=["n_regionkey"])
    back = spark.read.parquet(out).filter(F.col("n_regionkey") == 1)
    plan = back._jdf.queryExecution().executedPlan().toString()
    # partition filter must prune directories, not appear as a data filter
    assert back.count() == nation.filter("n_regionkey = 1").count()
    assert "PartitionFilters: [isnotnull(n_regionkey" in plan


def test_from_rows_local_source(spark):
    df = from_rows(spark, [(1, "a"), (2, "b")], ["id", "tag"])
    assert _rows(df) == [(1, "a"), (2, "b")]


def test_fetch_url_file_scheme(tmp_path):
    src = tmp_path / "payload.bin"
    src.write_bytes(b"spark-graft")
    dest = tmp_path / "fetched" / "payload.bin"
    got = fetch_url(src.as_uri(), str(dest))
    assert got == str(dest)
    assert dest.read_bytes() == b"spark-graft"


def test_fetch_url_manifest_distributed(spark, tmp_path):
    from automated_batch_data_pipeline_nyc_spark.sources.readers import fetch_url_manifest

    srcs = []
    for i in range(6):
        p = tmp_path / f"src_{i}.bin"
        p.write_bytes(b"payload-%d" % i)
        srcs.append(p)
    rows = [(s.as_uri(), str(tmp_path / "fetched" / f"out_{i}.bin")) for i, s in enumerate(srcs)]
    rows.append(("file:///nonexistent/nope.bin", str(tmp_path / "fetched" / "nope.bin")))
    manifest = spark.createDataFrame(rows, ["url", "dest"]).repartition(3)
    result = fetch_url_manifest(manifest).collect()
    by_url = {r["url"]: r for r in result}
    assert len(result) == 7
    ok = [r for r in result if r["ok"]]
    assert len(ok) == 6
    for i, s in enumerate(srcs):
        r = by_url[s.as_uri()]
        assert r["size_bytes"] == len(b"payload-%d" % i)
        assert pathlib.Path(r["dest"]).read_bytes() == b"payload-%d" % i
    bad = by_url["file:///nonexistent/nope.bin"]
    assert not bad["ok"] and bad["error"]


def test_compact_parquet_reduces_files(spark, tmp_path):
    from automated_batch_data_pipeline_nyc_spark.sources.writers import compact_parquet

    import glob

    path = str(tmp_path / "fragmented")
    # 40 tiny files — the streaming-sink accretion pattern
    spark.range(10000).repartition(40).write.parquet(path)
    assert len(glob.glob(f"{path}/part-*.parquet")) == 40
    before = spark.read.parquet(path).selectExpr("sum(id)").head()[0]
    n = compact_parquet(spark, path, target_file_mb=128)
    files_after = glob.glob(f"{path}/part-*.parquet")
    assert len(files_after) == n == 1
    assert spark.read.parquet(path).selectExpr("sum(id)").head()[0] == before


def test_enforce_schema_alignment(spark):
    from pyspark.sql import types as T

    from automated_batch_data_pipeline_nyc_spark.operators.cleaning import enforce_schema

    contract = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("amount", T.DoubleType()),
            T.StructField("note", T.StringType()),
        ]
    )
    src = spark.createDataFrame(
        [("7", "1.5", "x", True)], ["id", "amount", "extra", "flag"]
    )
    out = enforce_schema(src, contract, fail_on_missing=False)
    assert out.columns == ["id", "amount", "note"]
    row = out.head()
    assert row.id == 7 and row.amount == 1.5 and row.note is None
    assert [f.dataType for f in out.schema.fields] == [
        T.LongType(), T.DoubleType(), T.StringType()
    ]
    import pytest as _pt

    with _pt.raises(ValueError):
        enforce_schema(src, contract)  # 'note' missing, fail_on_missing=True
    with _pt.raises(ValueError):
        enforce_schema(src.select("id", "amount", "flag"), contract,
                       drop_extra=False, fail_on_missing=False)


def test_dynamic_partition_pruning_fires(spark, tmp_path):
    """Fact partitioned on the join key + selective broadcast dim =>
    Catalyst injects a runtime partition filter (DPP) into the fact
    scan, so only the dim-selected partitions are read.  At 100 TB this
    is the difference between scanning 1/k of the fact table and all of
    it — pinned here so a conf or plan regression is loud."""
    from automated_batch_data_pipeline_nyc_spark.sources.readers import read_parquet
    from automated_batch_data_pipeline_nyc_spark.sources.writers import write_parquet

    from .conftest import SF_SMOKE
    import os

    orders = read_parquet(spark, os.path.join(SF_SMOKE, "orders.parquet"))
    fact_path = str(tmp_path / "orders_by_priority")
    write_parquet(orders, fact_path, partition_by=["o_orderpriority"])

    fact = spark.read.parquet(fact_path)
    dim = spark.createDataFrame(
        [("1-URGENT", "hot"), ("5-LOW", "cold")], ["o_orderpriority", "tier"]
    ).filter("tier = 'hot'")
    from pyspark.sql import functions as F

    joined = fact.join(F.broadcast(dim), "o_orderpriority").groupBy("tier").agg(
        F.count(F.lit(1)).alias("n")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan
    rows = {r.tier: r.n for r in joined.collect()}
    urgent = orders.filter("o_orderpriority = '1-URGENT'").count()
    assert rows == {"hot": urgent}


def test_quarantine_write_routes_one_pass(spark, tmp_path):
    from automated_batch_data_pipeline_nyc_spark.sources.writers import quarantine_write

    df = spark.createDataFrame(
        [(i, float(i) if i % 3 else None) for i in range(30)], ["k", "v"]
    ).withColumn("_valid", F.col("v").isNotNull())
    out = str(tmp_path / "routed")
    quarantine_write(df, out)
    import os

    dirs = sorted(d for d in os.listdir(out) if d.startswith("_valid="))
    assert dirs == ["_valid=false", "_valid=true"], "both routes written side by side"
    back = spark.read.parquet(out)
    ok = back.filter(F.col("_valid").cast("boolean")).count()
    bad = back.filter(~F.col("_valid").cast("boolean")).count()
    assert ok == 20 and bad == 10
    # valid partition prunes: reading just the accepted route sees no rejects
    accepted = spark.read.parquet(out + "/_valid=true")
    assert accepted.filter(F.col("v").isNull()).count() == 0


def test_manifest_for_dir_counts_per_file(spark, tmp_path):
    from automated_batch_data_pipeline_nyc_spark.sources.writers import (
        manifest_for_dir,
        write_parquet,
    )

    df = spark.range(1000).withColumn("p", F.col("id") % 4)
    out = str(tmp_path / "m")
    write_parquet(df.repartition(4, "p"), out, partition_by=["p"])
    man = manifest_for_dir(spark, out).collect()
    assert sum(r.n_rows for r in man) == 1000
    assert all(r.file.startswith("p=") and "part-" in r.file for r in man), (
        "paths must be relative to the dataset root"
    )
    # manifest detects a partial load: drop one file, counts change
    import glob
    import os

    victim = glob.glob(f"{out}/p=0/part-*.parquet")[0]
    os.remove(victim)
    man2 = manifest_for_dir(spark, out).collect()
    assert sum(r.n_rows for r in man2) < 1000


def test_manifest_for_dir_decodes_uri_escaped_paths(spark, tmp_path):
    """Dataset roots / partition values that URI-encode (spaces, '%',
    '+', non-ASCII) must still relativize — input_file_name() returns
    URL-encoded URIs (round-4 fix)."""
    from automated_batch_data_pipeline_nyc_spark.sources.writers import (
        manifest_for_dir,
        write_parquet,
    )

    out = str(tmp_path / "ware house 100%" / "löad+1")
    df = spark.range(100).withColumn("p", F.col("id") % 2)
    write_parquet(df.repartition(2, "p"), out, partition_by=["p"])
    man = manifest_for_dir(spark, out).collect()
    assert sum(r.n_rows for r in man) == 100
    assert all(r.file.startswith("p=") for r in man), (
        f"paths must be relative even under an escaping base: "
        f"{[r.file for r in man]}"
    )


# ---------------------------------------------------------------------------
# Versioned transaction log (sources/txlog.py)
# ---------------------------------------------------------------------------

def test_txlog_append_overwrite_time_travel(spark, tmp_path):
    from automated_batch_data_pipeline_nyc_spark.sources import txlog

    t = str(tmp_path / "tbl")
    df = lambda lo, hi: spark.range(lo, hi).withColumn("v", F.col("id") * 2)
    assert txlog.commit(df(0, 10), t, mode="overwrite") == 0
    assert txlog.commit(df(10, 15), t, mode="append") == 1
    assert txlog.commit(df(100, 103), t, mode="overwrite") == 2
    assert txlog.commit(df(103, 104), t, mode="append") == 3
    assert txlog.current_version(t) == 3
    # snapshots: v0=10 rows, v1=15, v2=3 (overwrite reset), v3=4
    for v, n in [(0, 10), (1, 15), (2, 3), (3, 4)]:
        assert txlog.read_table(spark, t, version=v).count() == n
    assert txlog.read_table(spark, t).count() == 4  # latest
    got = sorted(r.id for r in txlog.read_table(spark, t).collect())
    assert got == [100, 101, 102, 103]
    hist = {r.version: r.op for r in txlog.table_history(spark, t).collect()}
    assert hist == {0: "overwrite", 1: "append", 2: "overwrite", 3: "append"}
    with pytest.raises(ValueError, match="version 9 does not exist"):
        txlog.read_table(spark, t, version=9)


def test_txlog_commit_conflict_and_retry(spark, tmp_path):
    from automated_batch_data_pipeline_nyc_spark.sources import txlog

    t = str(tmp_path / "tbl")
    txlog.commit(spark.range(5), t, mode="overwrite")
    # simulate a concurrent writer that already took version 1
    stolen = os.path.join(t, "_txlog", f"{1:010d}.json")
    with open(stolen, "w") as fh:
        fh.write('{"version": 1, "op": "append", "add": [], "n_add": 0}')
    # the loser must re-read the log and land on version 2
    assert txlog.commit(spark.range(5, 8), t, mode="append") == 2
    assert txlog.read_table(spark, t).count() == 8
    # with retries exhausted (every slot pre-stolen) it fails loudly
    for v in (3, 4, 5):
        with open(os.path.join(t, "_txlog", f"{v:010d}.json"), "w") as fh:
            fh.write(f'{{"version": {v}, "op": "append", "add": [], "n_add": 0}}')

    with pytest.raises(txlog.ConcurrentCommitError):
        # every retry recomputes the same next version list and loses
        txlog.commit(spark.range(1), t, mode="append", max_retries=0)


def test_txlog_txn_recheck_after_lost_race(spark, tmp_path, monkeypatch):
    """A zombie driver and its restart share (app_id, batch_id).  If the
    twin publishes BETWEEN our version read and our put-if-absent link,
    the in-loop idempotence re-check must turn the retry into a
    recognized replay (return None, stage dir reclaimed) — not a second
    commit of the same batch (ADVICE r5)."""
    import json as _json

    from automated_batch_data_pipeline_nyc_spark.sources import txlog

    t = str(tmp_path / "tbl")
    txlog.commit(spark.range(10), t, mode="overwrite")  # v0, no txn

    real_link = os.link
    state = {"raced": False}

    def link_losing_to_twin(src, dst, *a, **kw):
        if not state["raced"]:
            state["raced"] = True
            v = int(os.path.basename(dst)[:-5])
            with open(dst, "w") as fh:  # the twin's identical-txn commit
                _json.dump(
                    {"version": v, "op": "append", "add": [], "n_add": 0,
                     "txn_app": "job", "txn_batch": 7}, fh,
                )
            raise FileExistsError(dst)
        return real_link(src, dst, *a, **kw)

    monkeypatch.setattr(os, "link", link_losing_to_twin)
    out = txlog.commit(spark.range(5), t, mode="append", txn=("job", 7))
    assert out is None, "replay after losing to the twin must not commit"
    assert state["raced"]
    assert txlog.current_version(t) == 1  # only the twin's entry landed
    # the loser's staged-but-unpublished files were reclaimed
    staged = [
        d for d in os.listdir(os.path.join(t, "data"))
        if any(f.endswith(".parquet")
               for f in os.listdir(os.path.join(t, "data", d)))
    ]
    live = {os.path.dirname(f) for f in
            [e for entry in txlog._read_log(t) for e in entry["add"]]}
    assert all(os.path.join("data", d) in live for d in staged)


def test_txlog_staging_garbage_invisible_and_vacuum(spark, tmp_path):
    from automated_batch_data_pipeline_nyc_spark.sources import txlog

    t = str(tmp_path / "tbl")
    txlog.commit(spark.range(10), t, mode="overwrite")          # v0
    txlog.commit(spark.range(10, 12), t, mode="append")         # v1
    txlog.commit(spark.range(50, 53), t, mode="overwrite")      # v2
    # a crashed writer's data dir (no log entry) must be invisible
    spark.range(999, 1009).write.parquet(
        os.path.join(t, "data", "vdeadbeefdead")
    )
    assert txlog.read_table(spark, t).count() == 3
    assert sorted(r.id for r in txlog.read_table(spark, t).collect()) == [50, 51, 52]

    # vacuum(keep_versions=1): v0/v1 published history is dead and goes
    # immediately; the UNREFERENCED orphan dir is indistinguishable from
    # an in-flight commit's staged data, so the default mtime retention
    # window must protect it (ADVICE r5: deleting it would corrupt a
    # concurrent commit that publishes after vacuum).
    orphan = os.path.join(t, "data", "vdeadbeefdead")
    n_orphan = len([f for f in os.listdir(orphan) if f.endswith(".parquet")])
    removed = txlog.vacuum(t, keep_versions=1)
    assert removed > 0
    assert os.path.isdir(orphan) and len(
        [f for f in os.listdir(orphan) if f.endswith(".parquet")]
    ) == n_orphan, "fresh unreferenced files must survive default retention"
    assert txlog.read_table(spark, t).count() == 3          # head intact
    with pytest.raises(ValueError, match="vacuumed"):
        txlog.read_table(spark, t, version=1)               # history gone
    # retention_seconds=0 (caller asserts no writer in flight) reclaims it
    assert txlog.vacuum(t, keep_versions=1, retention_seconds=0) == n_orphan
    assert not os.path.exists(orphan)
    # an aged-out orphan (mtime older than the window) is crash garbage
    spark.range(5).write.parquet(orphan)
    old = time.time() - 48 * 3600
    for f in os.listdir(orphan):
        os.utime(os.path.join(orphan, f), (old, old))
    assert txlog.vacuum(t, keep_versions=1) >= 1
    assert not os.path.exists(orphan)

    # keep_versions=2 retains both snapshots' files
    txlog.commit(spark.range(60, 64), t, mode="append")     # v3
    assert txlog.vacuum(t, keep_versions=2) == 0            # v2 live in both
    assert txlog.read_table(spark, t, version=2).count() == 3
    assert txlog.read_table(spark, t, version=3).count() == 7

    with pytest.raises(ValueError, match="keep_versions"):
        txlog.vacuum(t, keep_versions=0)
    with pytest.raises(ValueError, match="mode must be"):
        txlog.commit(spark.range(1), t, mode="merge")


def test_txlog_vacuum_spares_inflight_marker_only_dir(spark, tmp_path):
    """ADVICE r6 (medium): a concurrent commit's staging dir in the
    instant after df.write creates it — before any .parquet part lands —
    is marker-only, yet very much alive.  vacuum must NOT rmtree it
    under the default retention window; only aged-out marker-only dirs
    (and dirs this run itself emptied) are reclaimed."""
    import time as _time

    from automated_batch_data_pipeline_nyc_spark.sources import txlog

    t = str(tmp_path / "tbl")
    txlog.commit(spark.range(5), t, mode="overwrite")  # v0
    # simulate the in-flight writer's just-created staging dir:
    # directory + job marker exist, no parquet yet
    inflight = os.path.join(t, "data", "vinflight00001")
    os.makedirs(inflight)
    open(os.path.join(inflight, "_SUCCESS"), "w").close()
    txlog.vacuum(t, keep_versions=1)
    assert os.path.isdir(inflight), (
        "fresh marker-only staging dir must survive the retention window"
    )
    # aged past the window it is crash garbage and goes
    old = _time.time() - 48 * 3600
    os.utime(inflight, (old, old))
    txlog.vacuum(t, keep_versions=1)
    assert not os.path.exists(inflight)
    # and a vanished file mid-sweep must not abort vacuum (race guard):
    # nothing to assert beyond "no exception" — exercised implicitly by
    # repeated vacuums above sharing the same walk windows
    assert txlog.read_table(spark, t).count() == 5


def test_txlog_randomized_protocol_vs_model(spark, tmp_path):
    """Randomized protocol check: a seeded sequence of append/overwrite
    commits and vacuums against the real log, mirrored by a pure-Python
    model of what every snapshot must contain.  After each op the head
    read must equal the model; at the end, every retained version
    time-travels to its model snapshot and every vacuumed version
    raises loudly."""
    import random

    from automated_batch_data_pipeline_nyc_spark.sources import txlog

    rng = random.Random(7)
    t = str(tmp_path / "tbl")
    model: list[set[int]] = []  # model[v] = expected id set at version v
    nxt = 0

    def fresh_ids(k):
        nonlocal nxt
        ids = set(range(nxt, nxt + k))
        nxt += k
        return ids

    vacuumed_below = 0  # versions < this are unreadable
    for step in range(14):
        op = rng.choice(["append", "append", "overwrite", "vacuum"])
        if op == "vacuum" and model:
            keep = rng.choice([1, 2])
            txlog.vacuum(t, keep_versions=keep, retention_seconds=0)
            vacuumed_below = max(vacuumed_below, len(model) - keep)
        elif op in ("append", "overwrite"):
            ids = fresh_ids(rng.randint(1, 5))
            df = spark.createDataFrame([(i,) for i in sorted(ids)], "id long")
            mode = op if model else "overwrite"
            txlog.commit(df, t, mode=mode)
            prev = model[-1] if (model and mode == "append") else set()
            model.append(prev | ids)
        if model:
            got = {r.id for r in txlog.read_table(spark, t).collect()}
            assert got == model[-1], f"head mismatch at step {step}"
            assert txlog.current_version(t) == len(model) - 1

    # time travel: retained versions must reproduce their snapshots;
    # versions below the retention point either raise loudly (files
    # reclaimed) or — when every file they reference is still live in a
    # retained snapshot, e.g. pure-append history — still reproduce
    # exactly.  What must NEVER happen is a silent wrong result.
    for v, want in enumerate(model):
        try:
            got = {r.id for r in txlog.read_table(spark, t, version=v).collect()}
        except ValueError:
            assert v < vacuumed_below, f"retained v{v} must stay readable"
            continue
        assert got == want, f"time travel mismatch at v{v}"
