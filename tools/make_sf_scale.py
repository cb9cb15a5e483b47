"""Derive a scaled-up fixture set from sf0.1 for the scale sweep.

    python tools/make_sf_scale.py [K] [out_dir]

Builds ``sf0.5``-equivalent parquet (default K=5 replicas of sf0.1)
under ``/tmp/spark_graft_scale/sf0.5``.  The driver fixtures stop at
sf0.1, but the 100 TB claims need at least one measured leg ABOVE the
verification scale — so the sweep (bench.py --sweep) extends the curve
with data derived to preserve each family's per-replica workload
character while keeping replicas disjoint:

- ``documents``: replica k>0 remaps every whitespace word into a
  DISJOINT per-replica vocabulary (``w -> w~k``).  Within a replica
  all n-gram structure, df profile and near-dup pair structure are
  preserved EXACTLY (a rename cannot change shingle set sizes or
  Jaccard); across replicas the gram spaces are TRULY disjoint, so
  pair density per row stays that of the original corpus instead of
  exploding quadratically (what naive replication does — and what the
  pre-r12 vocab-bijection variant did too: with a 31-word fixture
  vocabulary, bijections of the vocab onto itself left every replica
  in one shared 31x31 gram space, and the sf1 leg measured alpha~2
  on every gram-pair query purely from cross-replica collisions).
- ``embeddings``: replica k flips a seeded sign pattern per dimension —
  an orthogonal involution, so norms and within-replica cosine
  structure are exact; across replicas vectors decorrelate.
- ``lineitem``/``orders``/``customer``/``supplier``/``part``: replica k
  shifts every key by k*stride consistently (facts reference replica
  k's dims), so each replica is a disjoint TPC-H-ish world and every
  join/group cardinality scales exactly by K.  nation/region (fixed
  25/5-row dims) are shared.
- ``events``: event_id/user_id shift per replica (per-user counts and
  session structure preserved), timestamps unchanged (K times the
  traffic in the same window — the realistic way event volume grows).

Deterministic throughout (seeded by replica index) — two runs produce
byte-identical tables, so sweep numbers are reproducible.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
STRIDE = 1 << 40  # far above any sf0.1 key


def _shift(table: pa.Table, cols: list[str], k: int) -> pa.Table:
    for c in cols:
        if c in table.column_names:
            shifted = pc.add(table[c], pa.scalar(k * STRIDE, table[c].type))
            table = table.set_column(
                table.column_names.index(c), c, shifted
            )
    return table


def _remap_words(texts: list, mapping: dict) -> list:
    out = []
    for t in texts:
        if t is None:
            out.append(None)
            continue
        out.append(" ".join(mapping.get(w, w) for w in t.split(" ")))
    return out


def main() -> None:
    k_total = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    out_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else f"/tmp/spark_graft_scale/sf{k_total * 0.1:g}"
    )
    os.makedirs(out_dir, exist_ok=True)

    # fixed dims: shared across replicas
    for t in ("region", "nation"):
        pq.write_table(
            pq.read_table(os.path.join(SRC, f"{t}.parquet")),
            os.path.join(out_dir, f"{t}.parquet"),
        )

    key_cols = {
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "events": ["event_id", "user_id"],
    }
    for t, cols in key_cols.items():
        src = pq.read_table(os.path.join(SRC, f"{t}.parquet"))
        parts = [_shift(src, cols, k) for k in range(k_total)]
        pq.write_table(
            pa.concat_tables(parts), os.path.join(out_dir, f"{t}.parquet")
        )

    # documents: per-replica vocabulary bijection
    docs = pq.read_table(os.path.join(SRC, "documents.parquet"))
    texts = docs["text"].to_pylist()
    vocab = sorted({w for t in texts if t for w in t.split(" ")})
    replicas = [docs]
    for k in range(1, k_total):
        # Replica k speaks a DISJOINT vocabulary: every word gets a
        # replica suffix ('~' appears in no fixture word, and words are
        # whitespace-atomic to every gram/shingle operator, so within-
        # replica n-gram structure, df profile and Jaccard geometry are
        # preserved EXACTLY).  The r11 sweep used a seeded bijection of
        # the vocab onto ITSELF here — but the fixture vocabulary is
        # only 31 words, so all replicas shared one 31x31 gram space
        # and cross-replica gram collisions grew candidate pairs ~K^2:
        # the r12 sf1 leg measured alpha~1.8-2.0 across every gram-pair
        # and dup-graph query, a pure replication artifact (the engine
        # plans were identical; the DATA quadratically entangled).
        # Disjoint vocabularies make pair density per row invariant in
        # K, which is the property the sweep needs the fixture to hold.
        mapping = {w: f"{w}~{k}" for w in vocab}
        new_texts = _remap_words(texts, mapping)
        rep = _shift(docs, ["doc_id"], k)
        rep = rep.set_column(
            rep.column_names.index("text"),
            "text",
            pa.array(new_texts, type=pa.string()),
        )
        # n_chars tracks the remapped text (bijection keeps totals close
        # but not identical — recompute so the column stays truthful)
        rep = rep.set_column(
            rep.column_names.index("n_chars"),
            "n_chars",
            pa.array(
                [len(t) if t is not None else None for t in new_texts],
                type=pa.int64(),
            ),
        )
        replicas.append(rep)
    pq.write_table(
        pa.concat_tables(replicas), os.path.join(out_dir, "documents.parquet")
    )

    # embeddings: per-replica orthogonal sign flip
    emb = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
    vecs = np.array(emb["embedding"].to_pylist(), dtype=np.float32)
    dim = vecs.shape[1]
    replicas = [emb]
    for k in range(1, k_total):
        rng = np.random.default_rng(2000 + k)
        signs = rng.choice([-1.0, 1.0], size=dim).astype(np.float32)
        flipped = vecs * signs
        rep = _shift(emb, ["vec_id"], k)
        rep = rep.set_column(
            rep.column_names.index("embedding"),
            "embedding",
            pa.array(flipped.tolist(), type=emb.schema.field("embedding").type),
        )
        replicas.append(rep)
    pq.write_table(
        pa.concat_tables(replicas), os.path.join(out_dir, "embeddings.parquet")
    )

    for t in sorted(
        f[:-8] for f in os.listdir(out_dir) if f.endswith(".parquet")
    ):
        n = pq.read_metadata(os.path.join(out_dir, f"{t}.parquet")).num_rows
        print(f"{t}: {n} rows")
    print(f"wrote {out_dir}")


if __name__ == "__main__":
    main()
