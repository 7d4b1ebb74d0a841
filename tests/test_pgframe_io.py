"""PGFrame IO round-trips + point lookups + batch metric driver
(reference parity: core/io.py:529-548, 1037-1067, 1254-1311;
core/analyse/metrics.py:66-96)."""

import pytest
from pyspark.sql import functions as F

from bluegraph_spark.operators.metrics import compute_all_node_metrics
from bluegraph_spark.pgframe import SparkPGFrame

from .graph_fixtures import karate, nx_to_edges_df, pagerank_oracle


@pytest.fixture()
def small_pg(spark):
    nodes = spark.createDataFrame(
        [("a", 1.0, ["X"]), ("b", 2.0, ["X", "Y"]), ("c", 3.0, ["Y"])],
        "id string, score double, type array<string>",
    )
    edges = spark.createDataFrame(
        [("a", "b", 0.5), ("b", "c", 1.5)], "src string, dst string, mi double"
    )
    return SparkPGFrame(nodes, edges)


def test_json_roundtrip(spark, small_pg):
    payload = small_pg.to_json()
    assert len(payload["nodes"]) == 3 and len(payload["edges"]) == 2
    back = SparkPGFrame.from_json(spark, payload)
    assert back.number_of_nodes() == 3
    assert back.number_of_edges() == 2
    assert back.get_node("b")["score"] == 2.0
    assert sorted(back.get_node("b")["type"]) == ["X", "Y"]


def test_json_file_roundtrip(spark, small_pg, tmp_path):
    path = str(tmp_path / "g.json")
    small_pg.export_json(path)
    back = SparkPGFrame.load_json(spark, path)
    assert back.get_edge("a", "b")["mi"] == 0.5
    # undirected lookup works in either orientation
    assert back.get_edge("b", "a")["mi"] == 0.5


def test_csv_roundtrip(spark, small_pg, tmp_path):
    np, ep = str(tmp_path / "nodes"), str(tmp_path / "edges")
    small_pg.to_csv(np, ep)
    back = SparkPGFrame.from_csv(spark, np, ep, array_props=("type",))
    assert back.number_of_nodes() == 3
    assert back.get_node_property_values("score") == {"a": 1.0, "b": 2.0, "c": 3.0}
    assert sorted(back.get_node("b")["type"]) == ["X", "Y"]
    assert back.get_edge_property_values("mi")[("a", "b")] == 0.5


def test_point_lookups_missing(small_pg):
    assert small_pg.get_node("zz") is None
    assert small_pg.get_edge("a", "c") is None


def test_compute_all_node_metrics_karate(spark):
    g = karate()
    edges = nx_to_edges_df(spark, g, weight="strength")
    df = compute_all_node_metrics(
        edges,
        degree_weights=(None, "strength"),
        pagerank_weights=("strength",),
    )
    assert set(df.columns) == {"id", "degree", "degree_strength", "pagerank_strength"}
    rows = {r["id"]: r for r in df.collect()}
    # unweighted degree oracle
    for n, d in g.degree():
        assert rows[str(n)]["degree"] == pytest.approx(d)
    # weighted degree oracle
    for n, d in g.degree(weight="strength"):
        assert rows[str(n)]["degree_strength"] == pytest.approx(d)
    # weighted pagerank oracle at 1e-6
    pr = pagerank_oracle(g, weight="strength")
    for n, v in pr.items():
        assert rows[str(n)]["pagerank_strength"] == pytest.approx(v, abs=1e-6)
