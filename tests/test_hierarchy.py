"""Single-linkage hierarchical clustering tests (pure-Python union-find
oracle — the same agglomerative semantics sklearn/scipy implement for
linkage='single') and the Girvan–Newman driver bridge."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bluegraph_spark.operators.hierarchy import (
    single_linkage_clusters,
    single_linkage_dendrogram,
)


def _py_single_linkage(edges, n_clusters=None, threshold=None):
    """Union-find single linkage under the (dist, src, dst) total order;
    min-id canonical labels."""
    nodes = sorted({n for e in edges for n in e[:2]})
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra == rb:
            return False
        parent[max(ra, rb)] = min(ra, rb)
        return True

    k = len(nodes)
    for s, t, d in sorted(edges, key=lambda e: (e[2], e[0], e[1])):
        if threshold is not None and d > threshold:
            break
        if n_clusters is not None and k <= n_clusters:
            break
        if union(s, t):
            k -= 1
    return {n: find(n) for n in nodes}


@pytest.fixture(scope="module")
def dist_edges(spark):
    rows = []
    for i in range(30):
        s, t = f"h{(i * 3) % 10}", f"h{(i * 7 + 1) % 10}"
        if s != t:
            rows.append((min(s, t), max(s, t), float(1 + (i * 13) % 17)))
    rows = sorted(set(rows))
    # two extra disconnected islands
    rows += [("x1", "x2", 0.5), ("y1", "y2", 99.0)]
    return spark.createDataFrame(rows, "src string, dst string, distance double"), rows


def test_dendrogram_is_sorted_forest(dist_edges):
    df, rows = dist_edges
    d = single_linkage_dendrogram(df).collect()
    ranks = sorted(r.merge_rank for r in d)
    assert ranks == list(range(1, len(d) + 1))
    by_rank = sorted(d, key=lambda r: r.merge_rank)
    keys = [(r.distance, r.src, r.dst) for r in by_rank]
    assert keys == sorted(keys)
    # forest size = V - components
    nodes = {n for e in rows for n in e[:2]}
    want = _py_single_linkage(rows, n_clusters=1)
    n_comp = len(set(want.values()))
    assert len(d) == len(nodes) - n_comp


@pytest.mark.parametrize("k", [1, 3, 5, 8])
def test_n_clusters_matches_union_find(dist_edges, k):
    df, rows = dist_edges
    res = single_linkage_clusters(df, n_clusters=k)
    got = {r.id: r.cluster for r in res.labels.collect()}
    want = _py_single_linkage(rows, n_clusters=k)
    assert got == want
    assert res.n_clusters == len(set(want.values()))


@pytest.mark.parametrize("t", [0.4, 3.0, 10.0, 100.0])
def test_threshold_matches_union_find(dist_edges, t):
    df, rows = dist_edges
    res = single_linkage_clusters(df, threshold=t)
    got = {r.id: r.cluster for r in res.labels.collect()}
    want = _py_single_linkage(rows, threshold=t)
    assert got == want
    assert res.n_clusters == len(set(want.values()))


def test_exactly_one_mode_required(dist_edges):
    df, _ = dist_edges
    with pytest.raises(ValueError):
        single_linkage_clusters(df)
    with pytest.raises(ValueError):
        single_linkage_clusters(df, n_clusters=2, threshold=1.0)
    with pytest.raises(ValueError):
        single_linkage_clusters(df, n_clusters=0)


def test_girvan_newman_two_cliques(spark):
    """Two 4-cliques joined by one bridge edge: the 2-community GN split
    must be the cliques — same answer nx gives the reference."""
    from bluegraph_spark.operators.centrality_bridge import (
        girvan_newman_communities,
    )

    a = [f"a{i}" for i in range(4)]
    b = [f"b{i}" for i in range(4)]
    rows = []
    for grp in (a, b):
        rows += [
            (grp[i], grp[j], 1.0)
            for i in range(4)
            for j in range(i + 1, 4)
        ]
    rows.append(("a0", "b0", 1.0))
    df = spark.createDataFrame(rows, "src string, dst string, w double")
    res = girvan_newman_communities(df, n_communities=2)
    got = {r.id: r.community for r in res.collect()}
    assert {got[x] for x in a} == {"a0"}
    assert {got[x] for x in b} == {"b0"}

    inter = girvan_newman_communities(df, n_communities=3, intermediate=True)
    row = {r.id: list(r.communities) for r in inter.collect()}
    assert all(len(v) >= 1 for v in row.values())

    with pytest.raises(ValueError, match="edges"):
        girvan_newman_communities(df, n_communities=2, max_edges=3)
