"""Synchronous deterministic LPA vs a pure-Python oracle of the same spec
(SURVEY.md §5: the reference's asyn_lpa is randomized, so the engine defines
the deterministic synchronous min-label variant and must match it exactly)."""

import networkx as nx

from bluegraph_spark.operators.lpa import label_propagation
from bluegraph_spark.plans.checkpoint import SuperstepCheckpointer

from tests.graph_fixtures import karate, nx_nodes_df, nx_to_edges_df


def lpa_oracle(g, weight=None, max_iter=20):
    """Same spec as bluegraph_spark.operators.lpa (labels are string ids;
    weighted-majority; min-label tie-break; sync updates)."""
    labels = {n: str(n) for n in g.nodes}
    for _ in range(max_iter):
        new, changed = {}, 0
        for n in g.nodes:
            if len(g[n]) == 0:
                new[n] = labels[n]
                continue
            scores = {}
            for nbr, e in g[n].items():
                w = float(e.get(weight, 1.0)) if weight else 1.0
                scores[labels[nbr]] = scores.get(labels[nbr], 0.0) + w
            best = min(scores.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            new[n] = best
            if best != labels[n]:
                changed += 1
        labels = new
        if changed == 0:
            return labels, True
    return labels, False


def run_both(spark, g, weight=None, max_iter=20):
    res = label_propagation(
        nx_to_edges_df(spark, g, weight=weight),
        weight_col=weight,
        max_iter=max_iter,
        nodes=nx_nodes_df(spark, g),
    )
    want, conv = lpa_oracle(g, weight=weight, max_iter=max_iter)
    got = {r.id: r.label for r in res.labels.collect()}
    assert res.converged == conv
    assert got == {str(k): v for k, v in want.items()}
    return res


def test_karate_unweighted(spark):
    run_both(spark, karate())


def test_two_cliques_bridge(spark):
    g = nx.union(
        nx.relabel_nodes(nx.complete_graph(6), lambda v: v),
        nx.relabel_nodes(nx.complete_graph(6), lambda v: v + 10),
    )
    g.add_edge(0, 10)
    res = run_both(spark, g)
    labels = {r.id: r.label for r in res.labels.collect()}
    assert len(set(labels.values())) >= 2  # the cliques keep distinct labels


def test_integer_weighted(spark):
    g = karate()
    for u, v in g.edges:
        g[u][v]["f"] = float((u * 7 + v * 13) % 5 + 1)  # deterministic ints
    run_both(spark, g, weight="f")


def test_isolated_keep_own_label(spark):
    g = nx.complete_graph(4)
    g.add_nodes_from([100, 101])
    res = run_both(spark, g)
    labels = {r.id: r.label for r in res.labels.collect()}
    assert labels["100"] == "100" and labels["101"] == "101"


def test_checkpoint_resume(spark, tmp_path):
    g = karate()
    edges = nx_to_edges_df(spark, g)
    cp = SuperstepCheckpointer(str(tmp_path), "lpa")
    partial = label_propagation(edges, max_iter=1, checkpointer=cp)
    assert not partial.converged
    resumed = label_propagation(edges, checkpointer=cp, resume=True)
    want, _ = lpa_oracle(g)
    got = {r.id: r.label for r in resumed.labels.collect()}
    assert got == {str(k): v for k, v in want.items()}
