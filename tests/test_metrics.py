"""Degree/density/modularity/coverage/performance vs NetworkX."""

import networkx as nx
import pytest

from bluegraph_spark.operators.metrics import (
    coverage,
    degree_centrality,
    density,
    modularity,
    performance,
)

from tests.graph_fixtures import karate, nx_nodes_df, nx_to_edges_df, random_graph


def labels_df(spark, g, attr="club"):
    return (
        nx_nodes_df(spark, g)
        .sparkSession.createDataFrame(
            [(str(v), str(d.get(attr, v))) for v, d in g.nodes(data=True)],
            "id string, community string",
        )
    )


def test_weighted_degree(spark):
    g = random_graph()
    got = {
        r.id: r.degree
        for r in degree_centrality(
            nx_to_edges_df(spark, g, weight="mi"),
            weight_col="mi",
            nodes=nx_nodes_df(spark, g),
        ).collect()
    }
    want = dict(g.degree(weight="mi"))
    for k, v in want.items():
        assert got[str(k)] == pytest.approx(v, abs=1e-9)


def test_density(spark):
    g = random_graph()
    assert density(nx_to_edges_df(spark, g), nx_nodes_df(spark, g)) == pytest.approx(
        nx.density(g), abs=1e-12
    )


def test_modularity_coverage_performance(spark):
    g = karate()
    part = {v: d["club"] for v, d in g.nodes(data=True)}
    edges = nx_to_edges_df(spark, g)
    lab = labels_df(spark, g)
    communities = [
        {v for v in g if part[v] == c} for c in sorted(set(part.values()))
    ]
    # weight=None: karate_club_graph edges carry a built-in 'weight' attr
    # that nx.modularity would otherwise pick up by default
    assert modularity(edges, lab) == pytest.approx(
        nx.algorithms.community.modularity(g, communities, weight=None), abs=1e-9
    )
    cov, perf = nx.algorithms.community.partition_quality(g, communities)
    assert coverage(edges, lab) == pytest.approx(cov, abs=1e-9)
    assert performance(edges, lab) == pytest.approx(perf, abs=1e-9)


def test_weighted_modularity(spark):
    g = karate()
    part = {v: d["club"] for v, d in g.nodes(data=True)}
    communities = [
        {v for v in g if part[v] == c} for c in sorted(set(part.values()))
    ]
    got = modularity(
        nx_to_edges_df(spark, g, weight="strength"),
        labels_df(spark, g),
        weight_col="strength",
    )
    want = nx.algorithms.community.modularity(g, communities, weight="strength")
    assert got == pytest.approx(want, abs=1e-9)
