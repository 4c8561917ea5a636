"""Distributed graph operators: dedup-cluster connected components and
integer-exact PageRank over dependency edges.

Neither exists in the reference (its dedup stops at pairwise simhash
"seen before?" suppression, ``Page.hpp:121-161``, and it has no notion of
a dependency graph) — but both are the canonical NEXT stage of the
pipelines this engine already runs: near-dup pair mining
(``operators/dedup.py``, ``operators/winnow.py``) produces EDGES, and a
training-data dedup must group those edges into clusters and pick one
survivor per cluster; import-edge extraction (``functions/code.py``)
produces a dependency graph whose stationary rank is the classic
"importance" signal for code search ranking.

Scale design
------------
``connected_components`` is the alternating large-star / small-star
algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond", ACM SoCC 2014): the state is the EDGE SET itself (never an
adjacency list — no ``collect_list`` of a hot node's neighbours), each
half-round is one groupBy-min + one self-join on the grouping key (the
post-aggregation join reuses the exchange), and convergence is
O(log n) rounds on real graphs.  Every round ends in an eager
``localCheckpoint`` so the driver loop's lineage stays flat (on a real
cluster with executor churn, swap for ``checkpoint`` against reliable
storage — the call sites are the two ``localCheckpoint`` lines; the
algorithm itself is restart-safe from any round's edge set).

``pagerank_int`` is fixed-point integer PageRank: ranks are bigint
micro-units and each edge contributes ``(rank * num) DIV (den * outdeg)``.
Integer sums are associative-exact — the result is bit-identical at any
parallelism AND in any other engine (the DuckDB oracle runs the same
recurrence), unlike float PageRank where accumulation order drifts.
Per iteration: one join on ``src`` + one groupBy on ``dst`` — the two
inherent shuffles of topology-driven propagation.  Dangling-node mass is
NOT redistributed (documented spec, same choice as GraphX's default
``staticPageRank``); ranks therefore need no global scalar per round, so
an iteration is a pure dataflow with no driver-side collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon_edges(edges: DataFrame, a: str, b: str) -> DataFrame:
    """Distinct undirected edge set as (a, b) longs, self-loops dropped."""
    e = edges.select(
        F.col(a).cast("long").alias("a"), F.col(b).cast("long").alias("b")
    ).filter(F.col("a") != F.col("b"))
    return e.distinct()


def _large_star(e: DataFrame) -> DataFrame:
    """For each node u: m = min({u} ∪ N(u)); emit (v, m) for v ∈ N(u), v > u.

    Connects every LARGER neighbour to the local minimum; strictly-greater
    guard keeps edges pointing downward (no (m, m) self rows)."""
    sym = e.unionAll(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    mins = sym.groupBy("a").agg(F.min("b").alias("mb"))
    m = F.least(F.col("a"), F.col("mb"))
    out = (
        sym.join(mins, "a")
        .filter(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), m.alias("b"))
    )
    return out.filter(F.col("a") != F.col("b")).distinct()


def _small_star(e: DataFrame) -> DataFrame:
    """Orient each edge (hi, lo); for each hi: m = min(lo's); emit (lo, m)
    for every lo, plus (hi, m)."""
    oriented = e.select(
        F.greatest("a", "b").alias("hi"), F.least("a", "b").alias("lo")
    )
    mins = oriented.groupBy("hi").agg(F.min("lo").alias("m"))
    lo_edges = oriented.join(mins, "hi").select(
        F.col("lo").alias("a"), F.col("m").alias("b")
    )
    hi_edges = mins.select(F.col("hi").alias("a"), F.col("m").alias("b"))
    out = lo_edges.unionAll(hi_edges)
    return out.filter(F.col("a") != F.col("b")).distinct()


# Driver fastpath guard: below this many edges the component labels are
# computed with a driver-side union-find instead of the distributed star
# loop.  The star loop's per-round cost at small sizes is pure job-launch
# latency (~8-10 Spark jobs per alternation × 3-6 rounds, measured ~1.5 s on
# a cached 7k-edge clone graph where the union-find answers in ~10 ms); the
# distributed path stays the default the moment the edge set is big.  Same
# cap-plus-fallback discipline as cfg.tombstone_fastpath_max and the wand
# fastpath (operators/wand.py): the guard is a limit-count (short-circuits,
# never scans a web-scale edge set), results are bit-identical (component =
# smallest reachable node id, which any correct CC produces).
CC_FASTPATH_MAX_EDGES = 2_000_000


def _cc_union_find(rows) -> list[tuple[int, int]]:
    """(node, component) via union-find with path halving; component =
    min node id of the set — the exact distributed contract."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for r in rows:
        u, v = r[0], r[1]
        if u not in parent:
            parent[u] = u
        if v not in parent:
            parent[v] = v
        ru, rv = find(u), find(v)
        if ru != rv:
            # union by min id: smaller root wins, so every root IS the
            # component label when the loop ends
            if ru < rv:
                parent[rv] = ru
            else:
                parent[ru] = rv
    return [(x, find(x)) for x in parent]


def connected_components(
    edges: DataFrame,
    a: str = "a",
    b: str = "b",
    max_rounds: int = 50,
    fastpath_max_edges: int = CC_FASTPATH_MAX_EDGES,
) -> DataFrame:
    """→ (node, component): component = the SMALLEST node id reachable from
    ``node`` (an order-independent, algorithm-independent label — any
    correct CC produces the identical output, which is what makes the
    entry DuckDB-oracle-able via a transitive-closure recursive CTE).

    Every node appearing in ``edges`` gets a row — including nodes whose
    only edges are self-loops (they form their own singleton component).
    Raises if the star-contraction has not converged after ``max_rounds``
    alternations (2·log₂(n) rounds suffice in theory; real graphs converge
    in a handful)."""
    # Materialize the input ONCE before anything derives from it: nodes and
    # e below would otherwise each re-execute the caller's full edge lineage
    # (for curate's neardup stage that lineage is the whole MinHash-LSH pair
    # mine — measured 116 s at 50k docs, paid twice = the dominant cost of
    # the curate_pipeline bench before this checkpoint existed).
    raw = edges.select(
        F.col(a).cast("long").alias("a"), F.col(b).cast("long").alias("b")
    ).localCheckpoint(eager=True)
    # Driver union-find fastpath (see CC_FASTPATH_MAX_EDGES): the guard is a
    # limit-count over the already-checkpointed edges, so an over-cap graph
    # costs one short-circuiting job, never a full scan or collect.
    if (
        fastpath_max_edges
        and raw.limit(fastpath_max_edges + 1).count() <= fastpath_max_edges
    ):
        out = _cc_union_find(raw.collect())
        return edges.sparkSession.createDataFrame(
            out, "node long, component long"
        )
    # Node universe from the RAW endpoints, BEFORE the self-loop drop: a
    # node whose only edge is (x, x) still gets its singleton row.  Derived
    # from the checkpoint, so this is one cheap distinct, not a re-mine.
    nodes = (
        raw.select(F.col("a").alias("node"))
        .unionAll(raw.select(F.col("b").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    e = raw.filter(F.col("a") != F.col("b")).distinct().localCheckpoint(eager=True)

    prev_e, prev_sig = e, None
    for _ in range(max_rounds):
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        # Order-independent edge-set signature: one tiny aggregate row.
        # XOR-fold (not SUM): no ANSI overflow, and edges are DISTINCT so
        # the xor over the set is a strong fingerprint alongside the count.
        sig = e.agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(a, b))").alias("h"),
        ).collect()[0]
        sig = (sig["n"], sig["h"])
        if sig == prev_sig:
            # Signature match is probabilistic (xor of hashes can collide);
            # confirm with an EXACT set comparison before declaring the
            # fixpoint.  Runs once per convergence in the common case, on
            # two already-checkpointed equal-sized frames.
            if e.exceptAll(prev_e).isEmpty():
                break
        prev_e, prev_sig = e, sig
    else:
        raise RuntimeError(f"connected_components: no convergence in {max_rounds} rounds")

    # Converged state is a star forest: (v, root) for every non-root v.
    mapping = e.select(F.col("a").alias("node"), F.col("b").alias("component"))
    return (
        nodes.join(mapping, "node", "left")
        .select("node", F.coalesce("component", "node").alias("component"))
    )


def pagerank_int(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    iterations: int = 5,
    init: int = 1_000_000_000,
    base: int = 150_000_000,
    num: int = 85,
    den: int = 100,
) -> DataFrame:
    """Fixed-point integer PageRank → (node, rank:long).

    Spec (exactly reproducible in any engine — the driver oracle unrolls
    the same recurrence in DuckDB SQL)::

        r_0(v)     = init
        r_{t+1}(v) = base + Σ_{(u,v) ∈ E} (r_t(u) · num) DIV (den · outdeg(u))

    over the DISTINCT edge set with self-loops removed.  ``DIV`` is
    integer division (all quantities non-negative, so floor == trunc and
    Spark ``DIV`` ≡ DuckDB ``//``).  Dangling nodes contribute nothing
    (mass leaks — documented; avoids a per-round global scalar).

    Overflow bound: total mass never exceeds ``N·max(init, base/(1-num/den))``,
    so with the defaults ranks stay < N·10⁹ — multiply headroom to 2⁶³
    holds through N ≈ 10⁸ nodes per the ``rank·num`` product; for larger
    graphs shrink ``init``/``base`` (the recurrence is scale-covariant).

    ``nodes``: optional (node_col) universe; defaults to every endpoint of
    ``edges``.  Ranks exist only for universe nodes — an edge whose src
    falls outside the universe contributes nothing (its src has no rank)."""
    e = _canon_edges(edges, src, dst).withColumnRenamed("a", "src").withColumnRenamed(
        "b", "dst"
    )
    deg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    # Edges + outdeg materialized once; every iteration joins this frame.
    ed = e.join(deg, "src").localCheckpoint(eager=True)

    if nodes is None:
        universe = (
            ed.select(F.col("src").alias("node"))
            .unionAll(ed.select(F.col("dst").alias("node")))
            .distinct()
        )
    else:
        universe = nodes.select(F.col(node_col).cast("long").alias("node")).distinct()
    universe = universe.localCheckpoint(eager=True)

    ranks = universe.select("node", F.lit(init).cast("long").alias("rank"))
    contrib_expr = F.expr(f"(rank * {int(num)}) DIV ({int(den)} * outdeg)")
    for _ in range(int(iterations)):
        contribs = (
            ed.join(ranks, ed["src"] == ranks["node"])
            .select(F.col("dst"), contrib_expr.alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            universe.join(contribs, universe["node"] == contribs["dst"], "left")
            .select(
                "node",
                (F.lit(base).cast("long") + F.coalesce(F.col("s"), F.lit(0))).alias(
                    "rank"
                ),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
