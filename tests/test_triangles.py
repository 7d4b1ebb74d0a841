"""Triangle counts vs nx.triangles (exact)."""

import networkx as nx

from bluegraph_spark.operators.triangles import triangle_count_global, triangle_counts

from tests.graph_fixtures import (
    karate,
    nx_nodes_df,
    nx_to_edges_df,
    random_graph,
    triangle_graph,
)


def check(spark, g):
    got = {
        r.id: r.triangles
        for r in triangle_counts(
            nx_to_edges_df(spark, g), nodes=nx_nodes_df(spark, g)
        ).collect()
    }
    want = {str(k): v for k, v in nx.triangles(g).items()}
    assert got == want
    assert triangle_count_global(nx_to_edges_df(spark, g)) == sum(want.values()) // 3


def test_cliques(spark):
    check(spark, triangle_graph())


def test_karate(spark):
    check(spark, karate())


def test_random(spark):
    check(spark, random_graph())


def test_triangle_free(spark):
    check(spark, nx.cycle_graph(8))
