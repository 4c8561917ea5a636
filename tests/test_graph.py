"""Graph operators (operators/graph.py) vs pure-Python oracles.

Connected components is checked against a union-find on seeded random
graphs plus the shape edge-cases (path, star, disjoint cliques, empty);
PageRank against a dict-based evaluation of the exact integer recurrence.
Both operators are deterministic by construction (min-label / integer
arithmetic), so equality is exact, not approximate.
"""

from __future__ import annotations

import random


def _cc_oracle(edges):
    """Union-find → {node: min node id of its component}."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    return {n: find(n) for n in parent}


def _run_cc(spark, edges):
    from searchenginesimple_spark.operators.graph import connected_components

    df = spark.createDataFrame(edges, "a long, b long")
    rows = connected_components(df).collect()
    got = {r["node"]: r["component"] for r in rows}
    # exactly one row per node — duplicate/conflicting rows must not be
    # silently masked by the dict collapse
    assert len(rows) == len(got)
    return got


def test_cc_shapes(spark):
    # path 0-1-2-3-4 → all label 0
    assert _run_cc(spark, [(i, i + 1) for i in range(4)]) == {i: 0 for i in range(5)}
    # star centred on the LARGEST id (stresses large-star's v>u orientation)
    assert _run_cc(spark, [(9, i) for i in range(4)]) == {
        **{i: 0 for i in range(4)},
        9: 0,
    }
    # two disjoint cliques + duplicate/reversed/self edges
    edges = [(1, 2), (2, 3), (3, 1), (2, 1), (1, 1), (10, 11), (11, 10)]
    assert _run_cc(spark, edges) == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_cc_empty(spark):
    from searchenginesimple_spark.operators.graph import connected_components

    e = spark.createDataFrame([], "a long, b long")
    assert connected_components(e).count() == 0


def test_cc_self_loop_only_node(spark):
    """A node whose only edge is a self-loop is a singleton component —
    it must get a row, not vanish with the self-loop drop."""
    assert _run_cc(spark, [(7, 7), (1, 2)]) == {7: 7, 1: 1, 2: 1}


def test_cc_random_vs_union_find(spark):
    rng = random.Random(42)
    for trial in range(3):
        n = 60 + 40 * trial
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(int(n * 1.3))
        ]
        edges = [e for e in edges if e[0] != e[1]]
        assert _run_cc(spark, edges) == _cc_oracle(edges)


def _pr_oracle(edges, nodes, iterations=5, init=10**9, base=150_000_000, num=85, den=100):
    es = {(a, b) for a, b in edges if a != b}
    deg = {}
    for a, _ in es:
        deg[a] = deg.get(a, 0) + 1
    r = {v: init for v in nodes}
    for _ in range(iterations):
        nxt = {v: base for v in nodes}
        for u, v in es:
            if u in r and v in nxt:
                nxt[v] += (r[u] * num) // (den * deg[u])
        r = nxt
    return r


def test_pagerank_matches_integer_oracle(spark):
    from searchenginesimple_spark.operators.graph import pagerank_int

    rng = random.Random(7)
    n = 50
    edges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(120)})
    nodes = list(range(n))  # includes dangling + unreferenced nodes
    df_e = spark.createDataFrame(edges, "src long, dst long")
    df_n = spark.createDataFrame([(v,) for v in nodes], "node long")
    got = {
        r["node"]: r["rank"]
        for r in pagerank_int(df_e, nodes=df_n, iterations=5).collect()
    }
    assert got == _pr_oracle(edges, nodes)


def test_pagerank_hub_ranks_highest(spark):
    """All edges point at one hub → the hub's rank dominates, everyone
    else sits at the dangling floor after iteration 1."""
    from searchenginesimple_spark.operators.graph import pagerank_int

    edges = [(i, 99) for i in range(1, 9)]
    df_e = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank_int(df_e, iterations=3).collect()}
    assert set(got) == {*range(1, 9), 99}
    floor = 150_000_000
    assert all(got[i] == floor for i in range(1, 9))
    assert got[99] == max(got.values()) and got[99] > 10**9


def test_pagerank_parallelism_invariant(spark):
    """Integer recurrence ⇒ bit-identical result at a different shuffle
    partitioning (the oracle-exactness claim)."""
    from searchenginesimple_spark.operators.graph import pagerank_int

    rng = random.Random(3)
    edges = list({(rng.randrange(30), rng.randrange(30)) for _ in range(80)})
    df_e = spark.createDataFrame(edges, "src long, dst long").repartition(7)
    a = {r["node"]: r["rank"] for r in pagerank_int(df_e, iterations=4).collect()}
    df_e2 = spark.createDataFrame(edges, "src long, dst long").repartition(1)
    b = {r["node"]: r["rank"] for r in pagerank_int(df_e2, iterations=4).collect()}
    assert a == b


def test_cc_fastpath_equals_distributed(spark):
    """r6: connected_components takes a driver union-find fastpath below
    CC_FASTPATH_MAX_EDGES, with the star loop as the at-scale path.  Both
    must produce the identical (node, component) labelling — component =
    smallest reachable id — including self-loop singletons and duplicate/
    reversed edges."""
    from searchenginesimple_spark.operators.graph import connected_components

    rng = random.Random(7)
    edges = [(rng.randrange(80), rng.randrange(80)) for _ in range(100)]
    edges += [(200, 200), (5, 5)]  # self-loop singleton + member self-loop
    df = spark.createDataFrame(edges, "a long, b long")
    fast = sorted(map(tuple, connected_components(df).collect()))
    dist = sorted(
        map(tuple, connected_components(df, fastpath_max_edges=0).collect())
    )
    assert fast == dist and len(fast) > 0
