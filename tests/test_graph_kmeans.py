"""Unit tests for the iterative operators: connected components
(plain + edge-folding contraction) against a Python union-find golden,
and k-means determinism/coverage. The DuckDB recursive-CTE /
unrolled-SQL oracles cover these at sf0.01; here we cover shapes the
testdata graph doesn't produce (long chains, isolated nodes, rings)."""

from __future__ import annotations

import numpy as np
import pytest

from a_share_data_pipeline_spark.operators.graph import connected_components
from a_share_data_pipeline_spark.operators.kmeans import kmeans_assignments


def _union_find(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component = min node of the set
    comp = {}
    for v in range(n_nodes):
        r = find(v)
        comp.setdefault(r, []).append(v)
    return {v: min(vs) for r, vs in comp.items() for v in vs}


def _run(spark, n_nodes, edges, **kw):
    nodes = spark.createDataFrame([(i,) for i in range(n_nodes)], "id long")
    e = spark.createDataFrame(edges or [(0, 0)], "a long, b long")
    if not edges:
        e = e.limit(0)
    out = connected_components(nodes, e, id_col="id", **kw)
    return {r.id: r.component for r in out.collect()}


@pytest.mark.parametrize("fold", [False, True])
def test_chain_ring_isolated(spark, fold):
    # chain 0..7, ring 10..13, isolated 20
    edges = [(i, i + 1) for i in range(7)] + [(10, 11), (11, 12), (12, 13), (13, 10)]
    got = _run(spark, 21, edges, fold_edges=fold)
    golden = _union_find(21, edges)
    assert got == golden
    assert got[7] == 0 and got[13] == 10 and got[20] == 20


@pytest.mark.parametrize("fold", [False, True])
@pytest.mark.parametrize("seed", [3, 11])
def test_random_graph_matches_union_find(spark, fold, seed):
    rng = np.random.RandomState(seed)
    n = 60
    edges = [tuple(sorted(map(int, rng.choice(n, 2, replace=False)))) for _ in range(45)]
    got = _run(spark, n, edges, fold_edges=fold)
    assert got == _union_find(n, edges)


def test_no_edges_all_singletons(spark):
    got = _run(spark, 5, [])
    assert got == {i: i for i in range(5)}


def test_kmeans_deterministic_and_total(spark):
    rng = np.random.RandomState(42)
    rows = [(int(i), [float(x) for x in rng.randn(8)]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    a1 = {r.vec_id: (r.cluster, r.rd) for r in kmeans_assignments(df, k=4, iters=2).collect()}
    a2 = {r.vec_id: (r.cluster, r.rd) for r in kmeans_assignments(df, k=4, iters=2).collect()}
    assert a1 == a2  # deterministic across runs
    assert set(a1) == set(range(50))  # every vector assigned
    assert {c for c, _ in a1.values()} <= set(range(4))
    assert all(rd >= 0 for _, rd in a1.values())


@pytest.mark.parametrize("fold", [False, True])
def test_stray_endpoints_drop_edges(spark, fold):
    """endpoints ⊆ nodes contract: an edge touching a node NOT in the
    nodes frame disappears entirely — its valid endpoint stays a
    singleton, connectivity never flows through the stray node, and
    the output is keyed exactly by the nodes input."""
    nodes = spark.createDataFrame([(i,) for i in range(5)], "id long")
    # (0,1) valid; (2,99) stray endpoint; (3,98),(98,4) would connect
    # 3-4 through stray 98 if the guard leaked
    e = spark.createDataFrame(
        [(0, 1), (2, 99), (3, 98), (98, 4)], "a long, b long"
    )
    out = connected_components(nodes, e, id_col="id", fold_edges=fold)
    got = {r.id: r.component for r in out.collect()}
    assert got == {0: 0, 1: 0, 2: 2, 3: 3, 4: 4}
