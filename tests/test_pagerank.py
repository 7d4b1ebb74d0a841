"""PageRank vs the NetworkX oracle (reference semantics:
/root/reference/bluegraph/backends/networkx/analyse/metrics.py:36-41,
nx.pagerank defaults alpha=0.85 tol=1e-6 max_iter=100; north rule requires
allclose 1e-6)."""

import networkx as nx
import numpy as np
import pytest

from bluegraph_spark.operators.pagerank import pagerank
from bluegraph_spark.plans.checkpoint import SuperstepCheckpointer

from tests.graph_fixtures import (
    karate,
    pagerank_oracle,
    nx_nodes_df,
    nx_to_edges_df,
    random_digraph,
    random_graph,
)


def assert_matches_nx(result, nx_scores, atol=1e-6):
    got = {r.id: r.rank for r in result.ranks.collect()}
    assert set(got) == {str(k) for k in nx_scores}
    a = np.array([got[str(k)] for k in sorted(nx_scores)])
    b = np.array([nx_scores[k] for k in sorted(nx_scores)])
    assert np.allclose(a, b, atol=atol), np.abs(a - b).max()


def test_karate_unweighted(spark):
    g = karate()
    res = pagerank(nx_to_edges_df(spark, g))
    assert res.converged
    assert_matches_nx(res, pagerank_oracle(g))


def test_karate_weighted(spark):
    g = karate()
    res = pagerank(nx_to_edges_df(spark, g, weight="strength"), weight_col="strength")
    assert res.converged
    assert_matches_nx(res, pagerank_oracle(g, weight="strength"))


def test_random_graph_weighted(spark):
    g = random_graph()
    res = pagerank(nx_to_edges_df(spark, g, weight="mi"), weight_col="mi")
    assert res.converged
    assert_matches_nx(res, pagerank_oracle(g, weight="mi"))


def test_directed_with_dangling(spark):
    g = random_digraph()
    res = pagerank(
        nx_to_edges_df(spark, g, weight="w"),
        weight_col="w",
        directed=True,
        nodes=nx_nodes_df(spark, g),
    )
    assert res.converged
    assert_matches_nx(res, pagerank_oracle(g, weight="w"))


def test_isolated_vertices_uniform_base(spark):
    g = karate()
    g.add_nodes_from([100, 101])  # isolated => dangling in nx terms
    res = pagerank(nx_to_edges_df(spark, g), nodes=nx_nodes_df(spark, g))
    assert res.converged
    assert_matches_nx(res, pagerank_oracle(g))


def test_fixed_iterations_mode(spark):
    g = karate()
    res = pagerank(nx_to_edges_df(spark, g), tol=0.0, max_iter=5)
    assert res.iterations == 5 and not res.converged


def test_checkpoint_resume(spark, tmp_path):
    g = karate()
    edges = nx_to_edges_df(spark, g, weight="strength")

    full = pagerank(edges, weight_col="strength")

    cp = SuperstepCheckpointer(str(tmp_path), "pr")
    partial = pagerank(edges, weight_col="strength", max_iter=3, checkpointer=cp)
    assert not partial.converged and cp.latest() == 3
    # metrics + lineage recorded per superstep
    m = cp.load_metrics(3)
    assert "err" in m and "lineage" in m and m["total_rows"] == g.number_of_nodes()

    resumed = pagerank(
        edges, weight_col="strength", checkpointer=cp, resume=True
    )
    assert resumed.converged
    got_full = {r.id: r.rank for r in full.ranks.collect()}
    got_res = {r.id: r.rank for r in resumed.ranks.collect()}
    for k in got_full:
        assert got_res[k] == pytest.approx(got_full[k], abs=1e-12)
    # resume skipped the already-done supersteps
    assert resumed.iterations == full.iterations
