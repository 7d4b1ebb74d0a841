"""EmbeddingPipeline: fit -> embedding table -> neighbors -> save/load
roundtrip (reference downstream/pipelines.py:27-241 semantics)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bluegraph_spark.pgframe import SparkPGFrame
from bluegraph_spark.pipelines import EmbeddingPipeline, EmbeddingPipelineError


@pytest.fixture(scope="module")
def pipe_frame(spark):
    rows = []
    for i in range(24):
        rows.append((f"p{(i * 5) % 12}", f"p{(i * 7 + 1) % 12}", float(1 + i % 3)))
    edges = spark.createDataFrame(rows, "src string, dst string, w double")
    nodes = edges.select(F.col("src").alias("id")).union(
        edges.select("dst")).distinct()
    return SparkPGFrame(nodes, edges, directed=False)


def test_fit_neighbors_roundtrip(pipe_frame, spark, tmp_path):
    pipe = EmbeddingPipeline(
        embedder_params={"dim": 4, "iteration_weights": (1.0, 0.5), "seed": 3}
    )
    assert pipe.is_transductive() and not pipe.is_inductive()
    with pytest.raises(EmbeddingPipelineError):
        pipe.generate_embedding_table()
    pipe.run_fitting(pipe_frame, weight_col="w")

    table = pipe.generate_embedding_table()
    n = pipe_frame.number_of_nodes()
    assert table.count() == n
    assert table.columns == ["id", "embedding"]

    got = pipe.retrieve_embeddings(["p0", "nope"])
    assert got["p0"] is not None and len(got["p0"]) == 4
    assert got["nope"] is None

    nb = pipe.get_neighbors(point_ids=["p0"], k=3)
    rows = nb.collect()
    assert {r.query_id for r in rows} == {"p0"}
    assert len(rows) == 3
    assert all(r.neighbor_id != "p0" for r in rows)

    with pytest.raises(EmbeddingPipelineError):
        pipe.run_prediction(None)

    path = str(tmp_path / "pipe")
    pipe.save(path)
    loaded = EmbeddingPipeline.load(spark, path)
    a = sorted(map(tuple, table.collect()))
    b = sorted(map(tuple, loaded.generate_embedding_table().collect()))
    assert a == b
    nb2 = sorted(map(tuple, loaded.get_neighbors(point_ids=["p0"], k=3).collect()))
    assert nb2 == sorted(map(tuple, nb.collect()))
