"""Connected components vs nx.connected_components (exact labels)."""

import networkx as nx

from bluegraph_spark.operators.components import connected_components
from bluegraph_spark.plans.checkpoint import SuperstepCheckpointer

from tests.graph_fixtures import components_graph, karate, nx_nodes_df, nx_to_edges_df


def expected_labels(g):
    out = {}
    for comp in nx.connected_components(g):
        lbl = min(str(v) for v in comp)
        for v in comp:
            out[str(v)] = lbl
    return out


def test_blocks_and_isolated(spark):
    g = components_graph()
    res = connected_components(
        nx_to_edges_df(spark, g), nodes=nx_nodes_df(spark, g)
    )
    assert res.converged
    got = {r.id: r.component for r in res.components.collect()}
    assert got == expected_labels(g)


def test_single_component(spark):
    g = karate()
    res = connected_components(nx_to_edges_df(spark, g))
    assert res.converged
    got = {r.id: r.component for r in res.components.collect()}
    assert got == expected_labels(g)


def test_long_path_graph(spark):
    # worst case for label spread: path of 64 nodes + a bridge variant
    g = nx.path_graph(64)
    res = connected_components(nx_to_edges_df(spark, g))
    assert res.converged
    got = {r.id: r.component for r in res.components.collect()}
    assert got == expected_labels(g)


def test_bridged_blocks(spark):
    g = components_graph()
    g.add_edge(0, 30)  # bridge the 5-block and the 20-block
    res = connected_components(nx_to_edges_df(spark, g), nodes=nx_nodes_df(spark, g))
    got = {r.id: r.component for r in res.components.collect()}
    assert got == expected_labels(g)


def test_empty_edges_all_isolated(spark):
    g = nx.empty_graph(5)
    edges = spark.createDataFrame([], "src string, dst string")
    res = connected_components(edges, nodes=nx_nodes_df(spark, g))
    got = {r.id: r.component for r in res.components.collect()}
    assert got == {str(v): str(v) for v in g.nodes}


def test_checkpoint_resume(spark, tmp_path):
    g = components_graph()
    edges = nx_to_edges_df(spark, g)
    cp = SuperstepCheckpointer(str(tmp_path), "cc")
    partial = connected_components(edges, max_rounds=1, checkpointer=cp)
    assert not partial.converged
    resumed = connected_components(
        edges, nodes=nx_nodes_df(spark, g), checkpointer=cp, resume=True
    )
    assert resumed.converged
    got = {r.id: r.component for r in resumed.components.collect()}
    assert got == expected_labels(g)
