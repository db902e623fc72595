"""Connected components: chains, separate clusters, convergence guard,
and agreement with a Python union-find on a random graph."""

from __future__ import annotations

import random

import pytest

from cli_rag_spark.operators.components import connected_components


def _cc(spark, pairs, **kw):
    edges = spark.createDataFrame(pairs, "src long, dst long")
    return {r.node: r.component for r in connected_components(edges, **kw).collect()}


def test_chain_collapses_to_min(spark):
    # 0-1, 1-2, 2-3, 3-4: diameter 4, all must reach 0
    got = _cc(spark, [(0, 1), (1, 2), (2, 3), (3, 4)])
    assert got == {i: 0 for i in range(5)}


def test_separate_clusters_stay_separate(spark):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11), (20, 21), (21, 20)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_matches_union_find_on_random_graph(spark):
    rng = random.Random(3)
    pairs = [(rng.randrange(60), rng.randrange(60)) for _ in range(50)]
    pairs = [(a, b) for a, b in pairs if a != b]
    parent = list(range(60))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = {x for p in pairs for x in p}
    want = {n: find(n) for n in nodes}
    # canonicalize union-find roots to min-of-component
    comp_min: dict = {}
    for n, r in want.items():
        comp_min[r] = min(comp_min.get(r, n), n)
    want = {n: comp_min[r] for n, r in want.items()}
    assert _cc(spark, pairs) == want


def test_nonconvergence_raises(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        _cc(spark, [(i, i + 1) for i in range(30)], max_iter=2)


def test_empty_edges_yield_empty_components(spark):
    edges = spark.createDataFrame([], "src long, dst long")
    assert connected_components(edges).count() == 0


def test_triangle_count_known_graphs(spark):
    from cli_rag_spark.operators.components import triangle_count

    def census(edges):
        df = spark.createDataFrame(edges, ["src", "dst"])
        return triangle_count(df).collect()[0]

    # K4: 4 triangles, 4 nodes, 6 edges
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    r = census(k4)
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (4, 6, 4)

    # path graph: zero triangles
    r = census([(1, 2), (2, 3), (3, 4)])
    assert r.n_triangles == 0

    # star hub: zero triangles, wedge count stays degree-bounded
    r = census([(0, i) for i in range(1, 8)])
    assert r.n_triangles == 0

    # duplicate edges / reversed edges / self loops are normalized away
    r = census([(1, 2), (2, 1), (1, 1), (2, 3), (1, 3), (1, 3)])
    assert (r.n_edges, r.n_triangles) == (3, 1)


def test_triangle_count_rejects_wide_ids(spark):
    import pytest
    from cli_rag_spark.operators.components import triangle_count

    df = spark.createDataFrame([(1, 1 << 32), (1 << 32, 2)], ["src", "dst"])
    with pytest.raises(ValueError, match="2\\^31"):
        triangle_count(df).collect()
    neg = spark.createDataFrame([(-1, 2)], ["src", "dst"])
    with pytest.raises(ValueError, match="remap"):
        triangle_count(neg).collect()
