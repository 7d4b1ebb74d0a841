"""SparkPGEncoder tests: sklearn-convention differential checks computed
by hand (multi-hot, smooth-idf TF-IDF with L2 rows, population-std
scaling + mean imputation), determinism, and shape contracts."""

from __future__ import annotations

import math

import pytest

from bluegraph_spark.pgframe import SparkPGFrame
from bluegraph_spark.preprocess import SparkPGEncoder


@pytest.fixture(scope="module")
def enc_frame(spark):
    nodes = spark.createDataFrame(
        [
            ("a", ["X", "Y"], "hello world foo", 10.0),
            ("b", ["Y"], "world bar bar baz", 20.0),
            ("c", None, None, None),
        ],
        "id string, type array<string>, desc string, score double",
    )
    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    pg = SparkPGFrame(nodes, edges, directed=True)
    pg._node_prop_types = {"type": "category", "desc": "text", "score": "numeric"}
    return pg


def test_encoder_hand_computed(enc_frame):
    enc = SparkPGEncoder(
        node_properties=["type", "desc", "score"], text_encoding_max_dimension=4
    )
    out = enc.fit_transform(enc_frame)
    rows = {r.id: list(r.features) for r in out._nodes.collect()}

    # text: n=3 docs; df: world 2, bar/baz/foo/hello 1 → top-4 by
    # (df desc, term asc): world, bar, baz, foo → sorted vocab
    assert enc._node_encoders["desc"].vocab == ["bar", "baz", "foo", "world"]
    idf1 = math.log(4 / 2) + 1  # df=1
    idf2 = math.log(4 / 3) + 1  # df=2 (world)
    raw_a = [0.0, 0.0, idf1, idf2]  # "hello world foo": foo, world
    nrm = math.sqrt(sum(x * x for x in raw_a))
    want_a_text = [round(x / nrm, 12) if nrm else 0.0 for x in raw_a]
    # property order is sorted: desc(4) + score(1) + type(2)
    assert rows["a"][:4] == pytest.approx(want_a_text, abs=1e-9)
    # numeric: mean 15, population std 5; a → -1, b → +1, c imputed → 0
    assert rows["a"][4] == pytest.approx(-1.0)
    assert rows["b"][4] == pytest.approx(1.0)
    assert rows["c"][4] == pytest.approx(0.0)
    # category vocab sorted [X, Y]; a=[1,1], b=[0,1], c(null)=[0,0]
    assert rows["a"][5:] == [1.0, 1.0]
    assert rows["b"][5:] == [0.0, 1.0]
    assert rows["c"][5:] == [0.0, 0.0]
    assert enc.feature_dim == 7


def test_encoder_deterministic_across_partitionings(enc_frame, spark):
    e1 = SparkPGEncoder(
        node_properties=["type", "desc", "score"], text_encoding_max_dimension=3
    ).fit(enc_frame)
    pg2 = SparkPGFrame(
        enc_frame._nodes.repartition(5),
        enc_frame._edges,
        directed=True,
    )
    pg2._node_prop_types = dict(enc_frame._node_prop_types)
    e2 = SparkPGEncoder(
        node_properties=["type", "desc", "score"], text_encoding_max_dimension=3
    ).fit(pg2)
    for p in ("type", "desc", "score"):
        a, b = e1._node_encoders[p], e2._node_encoders[p]
        assert (a.vocab, a.idf, a.mean, a.std) == (b.vocab, b.idf, b.mean, b.std)


def test_encoder_edge_properties(spark):
    nodes = spark.createDataFrame([("a",), ("b",)], "id string")
    edges = spark.createDataFrame(
        [("a", "b", 4.0), ("b", "a", 6.0)], "src string, dst string, w double"
    )
    pg = SparkPGFrame(nodes, edges, directed=True)
    pg._edge_prop_types = {"w": "numeric"}
    enc = SparkPGEncoder(node_properties=[], edge_properties=["w"])
    out = enc.fit_transform(pg)
    feats = sorted(
        tuple(r.features) for r in out._edges.select("features").collect()
    )
    assert feats == [(-1.0,), (1.0,)]


def test_category_vocabulary_gate_raises(spark):
    nodes = spark.createDataFrame(
        [(str(i), f"cat{i}") for i in range(8)], "id string, kind string"
    )
    edges = spark.createDataFrame([], "src string, dst string")
    pg = SparkPGFrame(nodes, edges, directed=True)
    pg._node_prop_types = {"kind": "category"}
    enc = SparkPGEncoder(node_properties=["kind"], category_max_dimension=5)
    with pytest.raises(ValueError, match="distinct values"):
        enc.fit(pg)
    # at or under the cap the fit succeeds
    ok = SparkPGEncoder(node_properties=["kind"], category_max_dimension=8)
    ok.fit(pg)
    assert ok._node_encoders["kind"].dim == 8
