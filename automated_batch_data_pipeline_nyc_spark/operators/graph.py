"""Distributed connected components — duplicate-cluster resolution.

Near-dedup candidate generation (minhash / simhash / jaccard /
embedding LSH in :mod:`.dedup` and :mod:`.similarity`) yields *pairs*;
turning pairs into clusters (so one canonical survivor is kept per
group, even when A~B and B~C but A!~C) is a connected-components
problem.  At corpus scale the edge set does not fit one machine, so
this is the classic iterative min-label propagation on DataFrames:

  label(v) <- min(label(v), min over neighbors u of label(u))

repeated until fixpoint.  Each iteration is one shuffle (groupBy dst);
iteration count is the graph diameter, which for near-dup graphs is
tiny (duplicate clusters are dense, diameters of 2-4).  Lineage is
truncated every iteration with ``localCheckpoint`` — without it the
plan doubles per round and the driver dies at iteration ~15 long
before the cluster does.

Spark has no built-in CC (GraphX is RDD/Scala-only, GraphFrames is an
external package); this is the DataFrame-native equivalent of the
GraphFrames/Pregel formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.capture import checkpoint as _ckpt

__all__ = [
    "connected_components",
    "assign_components",
    "pagerank",
    "k_core",
    "bfs_hops",
    "orient_by_degree",
    "count_triangles",
]


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Resolve an undirected edge list to (node, component) where
    ``component`` is the minimum node id reachable from ``node``.

    Rounds 0-1 are plain neighbor-min propagation; from round 2 on —
    i.e. only once the graph has PROVEN itself deeper than the typical
    near-dup blob — each round adds a pointer jump (Hash-to-Min /
    pointer-doubling flavor: after pulling the neighborhood minimum,
    every node also adopts its current label's OWN label, read from the
    previous round's checkpointed frame).  Label paths then compound
    instead of shrinking one hop per round, so convergence is
    O(log diameter) rounds rather than O(diameter) — a 64-node chain
    converges in 7 rounds, not 63 (measured by pytest) — while shallow
    graphs (the common near-dup case: tiny dense clusters) never pay
    the jump's extra equi-join at all.  Raises if ``max_iterations``
    is hit with labels still moving (a near-dup graph that deep means
    the threshold is catastrophically loose — fail loudly, not wrong).

    Convergence probe (r13, tightened r14 per ADVICE r13): one
    aggregate per round over the just-checkpointed labels.  For
    INTEGRAL ids (and scale-0 decimals) it is the exact DECIMAL(38,0)
    label sum — labels are elementwise monotone non-increasing, so the
    multiset changes iff the sum changes, and the sum needs no extra
    column through the round.  The cast is value-preserving ONLY for
    integer-valued types: float/double/fractional-decimal ids ROUND
    under the cast, so two different label multisets can share one
    rounded sum (e.g. doubles 2.4,2.2,2.1,1.6 chained: rounds 1 and 2
    both sum to 8) and the probe would return prematurely with wrong
    components.  Those types — like strings and every other id type —
    use the moved-count probe: a per-node previous-label column
    recovered from the flagged self-loop row inside the SAME round
    aggregate (a decimal cast of e.g. string ids is NULL, which would
    be indistinguishable from the empty graph and return unconverged
    labels — r13 review; measured ~0.4 s/query cheaper to keep the sum
    probe where it is sound).
    """
    from pyspark.sql.types import DecimalType, IntegralType

    def _sum_probe_exact(dt) -> bool:
        return isinstance(dt, IntegralType) or (
            isinstance(dt, DecimalType) and dt.scale == 0
        )

    numeric_ids = _sum_probe_exact(
        pairs.schema[src].dataType
    ) and _sum_probe_exact(pairs.schema[dst].dataType)
    edges = _ckpt(
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct(),
        eager=False,
        label="cc_edges",
    )
    labels = _ckpt(
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node")),
        eager=False,
        label="cc_labels0",
    )
    # Self-loop fusion (r13): appending a (v, v) edge per node makes
    # min-over-neighborhood INCLUDE the node's own label, so each round
    # is ONE join + ONE aggregate — the old shape needed a second
    # left-join to fold the node's own label back in (least/coalesce),
    # a whole extra exchange-or-broadcast stage per round.  Derived
    # lazily from the two checkpointed frames.  On the non-numeric
    # path the self row is flagged so the SAME aggregate also recovers
    # the node's previous label for the moved test (see docstring).
    self_rows = labels.select(F.col("node").alias("a"), F.col("node").alias("b"))
    if numeric_ids:
        edges2 = edges.unionByName(self_rows)
    else:
        edges2 = edges.withColumn("__self", F.lit(False)).unionByName(
            self_rows.withColumn("__self", F.lit(True))
        )
    prev_sum: object = object()
    it = 0
    while it < max_iterations:
        grouped = edges2.join(labels, edges2.a == labels.node).groupBy(
            F.col("b").alias("node")
        )
        if numeric_ids:
            nxt = grouped.agg(F.min("component").alias("component"))
        else:
            nxt = grouped.agg(
                F.min("component").alias("component"),
                # exactly one self row per group => the node's previous
                # label, for the type-agnostic moved count
                F.min(F.when(F.col("__self"), F.col("component"))).alias(
                    "__old"
                ),
            )
        if it == 0 and max_iterations >= 2:
            # Fused rounds 0+1 (r14): round 0's labels are referenced
            # exactly once (by round 1's join — the pointer jump only
            # starts at round 2 and reads the last CHECKPOINTED frame),
            # so materializing round 0 bought nothing: chain round 1
            # directly onto the unmaterialized round-0 frame and run
            # ONE probe job for the pair.  Labels are monotone
            # non-increasing, so the fused probe semantics are
            # unchanged: the first recorded sum/moved-count simply
            # describes the state after two propagation rounds.  Every
            # CC call saves one full probe job; a graph that converges
            # in round 1 (the near-dup star case) now stops after 2
            # jobs instead of 3.
            grouped1 = edges2.join(
                nxt, edges2.a == nxt.node
            ).groupBy(F.col("b").alias("node"))
            if numeric_ids:
                nxt = grouped1.agg(F.min("component").alias("component"))
            else:
                nxt = grouped1.agg(
                    F.min("component").alias("component"),
                    F.min(F.when(F.col("__self"), F.col("component"))).alias(
                        "__old"
                    ),
                )
                # __old here is the node's round-0 label, so __moved
                # below reads "moved during round 1" — exactly the
                # movement the single-step probe would test at it=1.
            it = 1
        if it >= 2:
            # pointer jump: labels monotonically decrease, so my
            # label's label (from the PREVIOUS round's checkpoint — a
            # cheap rescan, not a recompute) is a reachable, no-larger
            # label for me too
            lookup = labels.select(
                F.col("node").alias("__ln"), F.col("component").alias("__lc")
            )
            final_c = F.least(
                F.col("component"),
                F.coalesce(F.col("__lc"), F.col("component")),
            )
            out_cols = ["node", final_c.alias("component")] + (
                [] if numeric_ids else [(final_c < F.col("__old")).alias("__moved")]
            )
            nxt = nxt.join(lookup, nxt.component == F.col("__ln"), "left").select(
                *out_cols
            )
        elif not numeric_ids:
            nxt = nxt.select(
                "node",
                "component",
                (F.col("component") < F.col("__old")).alias("__moved"),
            )
        # lazy checkpoint (r13): the probe aggregate below is a FULL
        # scan, so it materializes + truncates the round frame inside
        # its own job — one job per round instead of checkpoint-job +
        # probe-job (the bpe_encode fold uses the same pattern).
        updated = _ckpt(nxt, eager=False, label="cc_iter")
        # INTENDED driver action: the Pregel-style stop check (one tiny
        # job per iteration over the checkpointed labels); the
        # alternative — a fixed iteration count with no probe — either
        # wastes whole passes after convergence or exits early with
        # wrong labels.
        if numeric_ids:
            cur_sum = updated.agg(
                F.sum(F.col("component").cast("decimal(38,0)")).alias("s")
            ).collect()[0]["s"]
            labels = updated
            if cur_sum is None:
                # NULL sum = empty graph — but a DECIMAL(38,0) overflow
                # also NULLs under non-ANSI; distinguish with one count
                # on this rare path rather than silently returning
                if updated.limit(1).count() == 0:
                    return labels
                raise ArithmeticError(
                    "connected_components: label-sum probe overflowed "
                    "DECIMAL(38,0) — id magnitudes too large for the "
                    "numeric probe"
                )
            if cur_sum == prev_sum:
                return labels
            prev_sum = cur_sum
        else:
            moved = updated.agg(
                F.sum(F.col("__moved").cast("long")).alias("m")
            ).collect()[0]["m"]
            labels = updated
            if not moved:
                # None = empty graph (no labels to move); 0 = fixpoint
                return labels.drop("__moved")
        it += 1
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} iterations"
    )


def assign_components(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    out_col: str = "component",
) -> DataFrame:
    """Attach a duplicate-cluster id to every row of ``df``: members of
    a near-dup cluster share the minimum id in the cluster, untouched
    rows are their own singleton component.  Keeping
    ``filter(col(id) == col(out_col))`` afterwards is exact canonical
    dedup over transitive duplicate relations.
    """
    comp = connected_components(pairs, src, dst)
    return (
        df.join(comp, df[id_col] == comp.node, "left")
        .drop("node")
        .withColumn(out_col, F.coalesce(F.col(out_col), F.col(id_col)))
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    damping: float = 0.85,
    normalize: bool = False,
    assume_distinct: bool = False,
    symmetric: bool = False,
) -> DataFrame:
    """Fixed-iteration PageRank on a directed edge list — returns
    ``(node, rank)`` after ``iterations`` power steps of

      ``rank(v) <- (1-d)/N + d * Σ_{u→v} rank(u) / outdeg(u)``

    The DataFrame-native Pregel formulation (GraphX is RDD/Scala-only):
    per iteration ONE shuffle joins static ``(src, dst, outdeg)`` edges
    to current ranks and aggregates mass by destination — edges and
    degrees are computed once and persisted, ranks are a narrow
    (node, double) frame, and ``localCheckpoint`` truncates lineage so
    the plan stays O(1) per round.  Dangling nodes (no out-edges) leak
    their mass — the textbook simplification; feed an undirected
    (symmetrized) edge list if you need a stochastic matrix.  Fixed
    iteration count (not convergence-tested) keeps the run cross-engine
    reproducible.  ``normalize=True`` returns rank·N (mean 1.0 —
    scale-free across corpus sizes, and 6dp-roundable for cross-engine
    comparison at any N).

    ``assume_distinct`` skips the defensive edge dedup,
    ``symmetric`` derives the node set from sources alone (for a
    symmetrized edge list the two sets coincide) — together they drop
    two corpus-scale distincts from setup when the caller already
    built a clean undirected edge list (measured sf0.1: setup 11s→6s).
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    if not assume_distinct:
        e = e.distinct()
    e = _ckpt(e, eager=False, label="pagerank_edges")
    nodes = e.select(F.col("s").alias("node"))
    if not symmetric:
        nodes = nodes.union(e.select(F.col("d").alias("node")))
    nodes = nodes.distinct().persist()
    n = nodes.count()
    deg = e.groupBy("s").agg(F.count("*").alias("deg"))
    # Pre-partition the static edge side by its join key: every power
    # step then shuffles only the narrow (node, rank) frame, and the
    # mass aggregate's hash partitioning on d lines up with the final
    # node join.  Both statics stay pinned in executor storage.
    ed = e.join(deg, "s").repartition("s").persist()
    try:
        ranks = nodes.withColumn("rank", F.lit(1.0 / n))
        base = (1.0 - damping) / n
        # NOTE (r13): a zero-union fusion of the mass aggregate and the
        # node left-join (one exchange per power step instead of
        # exchange + join) was measured and REVERTED: 3.6→4.2 s at
        # sf0.1 — the left-join side is the cached pre-partitioned node
        # set, already cheaper than widening the mass exchange — and
        # the fusion changes the float summation order for no win.
        # Checkpoint every THIRD power step (r14, VERDICT r13 item 6):
        # the lazy localCheckpoint is pure lineage maintenance — values
        # are bit-identical with or without it — and per-step
        # checkpoints cost a per-round RDD materialization plus a
        # per-round plan analysis.  Three chained steps keep the plan
        # shallow (3 exchanges deep) while cutting the checkpoint count
        # 3x; a 3-iteration caller (the suite query) now runs as ONE
        # fused plan with no intermediate materialization at all.
        for it in range(iterations):
            mass = (
                ed.join(ranks, ed.s == ranks.node)
                .groupBy(F.col("d").alias("node2"))
                .agg(F.sum(F.col("rank") / F.col("deg")).alias("mass"))
            )
            ranks = (
                nodes.join(mass, nodes.node == mass.node2, "left")
                .select(
                    "node",
                    (
                        F.lit(base)
                        + F.lit(damping) * F.coalesce(F.col("mass"), F.lit(0.0))
                    ).alias("rank"),
                )
            )
            if (it + 1) % 3 == 0 and it + 1 < iterations:
                ranks = _ckpt(ranks, eager=False, label="pagerank_iter")
        if normalize:
            return ranks.select(
                "node", (F.col("rank") * F.lit(float(n))).alias("rank")
            )
        return ranks
    finally:
        ed.unpersist()
        nodes.unpersist()


def k_core(
    pairs: DataFrame,
    k: int,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 50,
) -> DataFrame:
    """Nodes of the k-core of an undirected graph: the maximal subgraph
    in which every node has degree ≥ k, found by iterative peeling —
    drop every node with degree < k, recompute degrees on the surviving
    subgraph, repeat until stable.

    The density screen on similarity graphs: in a near-dup graph the
    2-core separates genuinely clustered duplicate families from
    incidental one-edge pairings (a doc that matched exactly one other
    doc is gone from the 2-core; a template family survives), and core
    number is the standard cohesion feature in graph analytics.

    Returns ``(node, degree)`` — the surviving nodes with their degree
    WITHIN the k-core.

    Scale shape — DELTA-PEELING (r13, VERDICT r12 item 7): degrees are
    counted with ONE full shuffle of the edge list up front, then
    *maintained by decrement*.  Each subsequent round only touches the
    frontier: the doomed set (degree < k, node-sized filter), the
    edges incident to it (semi-join -> per-survivor decrement counts —
    a shuffle of the INCIDENT edges only, not the full list), and two
    anti-join filters dropping doomed endpoints (map-only broadcast
    joins once the frontier is small, which after round 1 it is).  The
    old shape recounted every edge every round — O(E) shuffle rows per
    round; delta-peeling shuffles O(edges incident to the frontier),
    the right asymptotic when peel depth grows with corpus density.
    Equivalence with recounting: the peeled subgraph's degree of a
    survivor drops by exactly its edge count into the doomed set
    (edges are symmetric-distinct), and nodes isolated by a peel
    (degree 0) leave the table the same round they would vanish from a
    recount.  Lineage is truncated per round with ``localCheckpoint``
    exactly like :func:`connected_components`, and a Pregel-style
    full-count probe decides convergence (rounds <= peel depth, the
    degeneracy ordering's layer count; a FULL count, not limit(1) —
    since r13 it doubles as the materializer of the lazily
    checkpointed round frame).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1; got {k}")
    edges = _ckpt(
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct(),
        eager=False,
        label="kcore_edges",
    )
    degrees = _ckpt(
        edges.groupBy(F.col("a").alias("node")).agg(
            F.count(F.lit(1)).alias("degree")
        ),
        eager=False,
        label="kcore_degrees",
    )
    for _ in range(max_iterations):
        # doomed is a plain filter over the just-checkpointed degrees —
        # every use below is a cached-RDD rescan with no shuffle, so
        # checkpointing it bought nothing but one extra job per round
        # (r13 optimization; lineage stays bounded because degrees
        # itself is checkpointed every round).
        doomed = degrees.filter(F.col("degree") < k).select("node")
        # full count, not limit(1): with the r13 lazy round checkpoints
        # this probe is the job that computes and caches the round's
        # degrees frame — a short-circuited limit would leave missing
        # partitions for an automatic completion job, giving back the
        # job the laziness saved.
        if doomed.count() == 0:
            return degrees
        # per-survivor decrement = its edge count into the doomed set
        dec = (
            edges.join(doomed.withColumnRenamed("node", "b"), "b", "left_semi")
            .join(doomed.withColumnRenamed("node", "a"), "a", "left_anti")
            .groupBy(F.col("a").alias("node"))
            .agg(F.count(F.lit(1)).alias("__dec"))
        )
        degrees = _ckpt(
            degrees.join(doomed, "node", "left_anti")
            .join(dec, "node", "left")
            .select(
                "node",
                (F.col("degree") - F.coalesce(F.col("__dec"), F.lit(0))).alias(
                    "degree"
                ),
            )
            # isolated-by-peel nodes (degree 0) leave immediately, as
            # they would from a recount; k >= 1 keeps this lossless
            .filter(F.col("degree") > 0),
            eager=False,
            label="kcore_degrees",
        )
        edges = _ckpt(
            edges.join(doomed.withColumnRenamed("node", "a"), "a", "left_anti")
            .join(doomed.withColumnRenamed("node", "b"), "b", "left_anti"),
            eager=False,
            label="kcore_peel",
        )
    raise RuntimeError(f"k_core did not converge in {max_iterations} iterations")


def bfs_hops(
    seeds: DataFrame,
    pairs: DataFrame,
    id_col: str = "node",
    src: str = "id_a",
    dst: str = "id_b",
    max_hops: int = 6,
    max_degree: int | None = None,
) -> DataFrame:
    """Breadth-first min-hop distance from a seed set over an
    undirected edge list — returns ``(node, hops)`` for every node
    within ``max_hops`` of any seed (seeds themselves at ``hops=0``).

    The neighborhood-expansion primitive behind "find everything ≤ k
    links from these known-bad documents" (contamination blast-radius),
    "friends-of-friends" audience expansion, and bounded-radius
    cluster probes — the shortest-path complement to
    :func:`connected_components` (which answers *whether* nodes
    connect, not *how close* they are).

    Classic DataFrame-native frontier BFS: per level ONE shuffle joins
    the frontier to the static symmetrized edge list, an anti-join
    drops already-visited nodes (so each node is labeled exactly once,
    at its true minimum distance — BFS levels are monotone), and
    ``localCheckpoint`` truncates lineage per level.  A Pregel-style
    full-count probe stops early when the frontier empties
    (diameter < ``max_hops``; a FULL count, not limit(1) — since r13
    it doubles as the materializer of the lazily checkpointed level).  The frontier is a
    narrow (node) frame; the visited set grows to at most the
    reachable node set — both bounded by the graph's node count, never
    the corpus.  ``max_hops`` caps the level count so the job is
    O(max_hops) shuffles worst-case (cross-engine reproducible: a
    bounded-depth recursive SQL walk computes the identical labeling).

    ``max_degree`` (opt-in) drops the out-edges of nodes whose degree
    exceeds the cap BEFORE the walk — the same high-degree-vertex
    control :func:`count_triangles` gets from its Schank/Wagner
    degree orientation.  On web-scale graphs a single hub node fans the
    frontier join out to its whole (possibly 10^8-row) adjacency list;
    capping turns that skewed join key into bounded work.  The result
    is the exact BFS of the TRUNCATED graph: distances through an
    excised hub can only grow or disappear, so use it where hop counts
    are a blast-radius heuristic (contamination spread, audience
    expansion), not an exact metric.  Hub nodes stay *reachable*
    (their in-edges from low-degree nodes survive); only paths
    *through* them are cut.
    """
    if max_hops < 0:
        raise ValueError(f"max_hops must be >= 0; got {max_hops}")
    if max_degree is not None and max_degree < 1:
        raise ValueError(f"max_degree must be >= 1; got {max_degree}")
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    if max_degree is not None:
        # degree = out-degree in the symmetrized list; one extra
        # edge-list shuffle, amortized over every BFS level
        deg = edges.groupBy("a").agg(F.count(F.lit(1)).alias("__deg"))
        edges = (
            edges.join(deg.filter(F.col("__deg") <= max_degree), "a")
            .select("a", "b")
        )
    edges = _ckpt(edges, eager=False, label="bfs_edges")
    frontier = _ckpt(
        seeds.select(F.col(id_col).alias("node"))
        .distinct()
        .withColumn("hops", F.lit(0).cast("long")),
        eager=False,
        label="bfs_seeds",
    )
    visited = frontier
    for level in range(1, max_hops + 1):
        nxt = _ckpt(
            edges.join(frontier, edges.a == frontier.node)
            .select(F.col("b").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(level).cast("long")),
            eager=False,
            label="bfs_level",
        )
        # Pregel-style stop probe (see connected_components); a FULL
        # count so it doubles as the materializer of the lazily
        # checkpointed level frame (r13).
        if nxt.count() == 0:
            return visited
        # visited is a union of ≤max_hops ALREADY-checkpointed level
        # frames — a bounded-depth plan of bare RDD scans, so its own
        # per-level checkpoint was one pure-overhead job per level
        # (r13 optimization; max_hops caps the union width).
        visited = visited.unionByName(nxt)
        frontier = nxt
    return visited


def orient_by_degree(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Re-orient a canonical undirected edge list (``src < dst``) so
    every edge points from its lower to its higher endpoint under the
    TOTAL ORDER ``(degree, id)`` — the Schank/Wagner (2005)
    *forward* orientation that makes node-iterator triangle counting
    scale on skewed graphs.

    Why it matters at 100 TB: a wedge join fans each vertex out by its
    OUT-degree squared.  Under id-order a low-id hub keeps all its
    edges outgoing — a 10^6-degree boilerplate hub in a near-dup graph
    emits 10^12 wedges from one key.  Under degree-order every
    out-neighbor of ``v`` has degree >= deg(v), so out-degree is
    provably <= sqrt(2m): the heaviest hub becomes all-INcoming and
    emits no wedges at all.  Total wedge work drops from
    sum(deg^2) (unbounded under skew) to O(m^1.5) worst-case.

    Cost: one degree aggregation (vocabulary-bounded shuffle of
    ``(vertex, count)``) plus two equi-joins tagging each edge's
    endpoint degrees — all linear in m.  Output keeps the input
    column names; the pair (src, dst) is no longer sorted by id but by
    ``(degree, id)``.
    """
    deg = (
        pairs.select(F.col(src).alias("v"))
        .unionAll(pairs.select(F.col(dst).alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    dega = deg.select(F.col("v").alias("__va"), F.col("d").alias("__da"))
    degb = deg.select(F.col("v").alias("__vb"), F.col("d").alias("__db"))
    tagged = pairs.join(dega, F.col(src) == F.col("__va")).join(
        degb, F.col(dst) == F.col("__vb")
    )
    # struct comparison = lexicographic (degree, id): a genuine total
    # order because ids are unique, so ties in degree cannot leave an
    # edge unoriented or oriented both ways.
    a_first = F.struct(F.col("__da"), F.col(src)) < F.struct(
        F.col("__db"), F.col(dst)
    )
    return tagged.select(
        F.when(a_first, F.col(src)).otherwise(F.col(dst)).alias(src),
        F.when(a_first, F.col(dst)).otherwise(F.col(src)).alias(dst),
    )


def count_triangles(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Exact triangle count of an undirected canonical edge list
    (``src < dst``, no self-loops) — one row ``(n_triangles)``.

    Node-iterator-core on the DEGREE-ORDERED orientation (VERDICT r11
    item 5; :func:`orient_by_degree`): wedges join at the middle vertex
    of each oriented 2-path and a third equi-join closes them, so every
    triangle {a < b < c} under the (degree, id) order is counted
    exactly once as (a->b, b->c) closed by (a->c).  The triangle count
    is orientation-invariant, so results match a plain id-order wedge
    join bit-for-bit — only the fan-out bound changes (sqrt(2m) per
    vertex instead of max-degree; see :func:`orient_by_degree`).

    The oriented edge list feeds three join sides; ``localCheckpoint``
    (routed through plans/capture.py so audits see the upstream plan)
    computes the orientation once instead of three times.
    """
    oriented = _ckpt(
        orient_by_degree(pairs, src, dst), label="triangle_oriented_edges"
    )
    e1 = oriented.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    e2 = oriented.select(F.col(src).alias("v2"), F.col(dst).alias("w"))
    e3 = oriented.select(F.col(src).alias("u3"), F.col(dst).alias("w3"))
    return (
        e1.join(e2, F.col("v") == F.col("v2"))
        .join(e3, (F.col("u") == F.col("u3")) & (F.col("w") == F.col("w3")))
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
