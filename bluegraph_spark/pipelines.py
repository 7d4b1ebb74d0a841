"""Embedding pipeline: preprocess → embed → similarity index, persistable.

Reference: ``EmbeddingPipeline``
(/root/reference/bluegraph/downstream/pipelines.py:27-241) — a container
stacking an optional property preprocessor, an embedder, and a similarity
index, with ``run_fitting`` / ``generate_embedding_table`` /
``get_neighbors`` / ``save`` / ``load``. The reference pickles sklearn /
StellarGraph objects into a zip; this engine's pipeline state is a
parquet embedding table plus a JSON params file — cluster-readable,
versionable, and resumable, with every stage one of this engine's
deterministic operators:

- preprocess: :class:`bluegraph_spark.preprocess.SparkPGEncoder`
  (optional — fitted for downstream consumers; FastRP is structural and
  does not consume node features).
- embed: :func:`bluegraph_spark.operators.embeddings.fastrp_embeddings`
  (transductive — like the reference's default node2vec mode,
  ``run_prediction`` on unseen data raises, mirroring
  ``is_transductive``, pipelines.py:45-59).
- similarity: exact cosine top-k
  (:func:`bluegraph_spark.operators.similarity.cosine_topk`) or the LSH
  variant for corpus scale.

Same (graph, params) ⇒ bit-identical saved pipeline on any cluster size.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class EmbeddingPipelineError(ValueError):
    """Reference EmbeddingPipelineException analogue."""


class EmbeddingPipeline:
    def __init__(
        self,
        encoder=None,
        embedder_params: dict[str, Any] | None = None,
        similarity: str = "cosine",
        lsh_params: dict[str, Any] | None = None,
    ):
        self.encoder = encoder
        self.embedder_params = dict(embedder_params or {"dim": 16})
        self.similarity = similarity
        self.lsh_params = dict(lsh_params or {})
        self._embeddings: DataFrame | None = None

    # ------------------------------------------------------------- fit

    def is_transductive(self) -> bool:
        return True

    def is_inductive(self) -> bool:
        return False

    def run_fitting(self, pg, weight_col: str | None = None) -> "EmbeddingPipeline":
        """Fit every stage on a :class:`SparkPGFrame` (reference
        run_fitting, pipelines.py:61-90)."""
        if self.encoder is not None:
            self.encoder.fit(pg)
        edges = pg.edges(props=[weight_col] if weight_col else None)
        emb = __import__(
            "bluegraph_spark.operators.embeddings", fromlist=["fastrp_embeddings"]
        ).fastrp_embeddings(
            edges,
            weight_col=weight_col,
            directed=pg.directed,
            **self.embedder_params,
        )
        self._embeddings = emb
        return self

    def run_prediction(self, *_args, **_kwargs):
        raise EmbeddingPipelineError(
            "this pipeline is transductive (FastRP): unseen-point prediction "
            "is undefined — refit on the extended graph instead (the "
            "reference raises the same way for transductive embedders, "
            "pipelines.py:92-124)"
        )

    # ----------------------------------------------------------- query

    def _require_fitted(self) -> DataFrame:
        if self._embeddings is None:
            raise EmbeddingPipelineError("pipeline is not fitted/loaded yet")
        return self._embeddings

    def generate_embedding_table(self) -> DataFrame:
        """(id, embedding) — reference pipelines.py:126-134."""
        emb = self._require_fitted()
        return emb.select(F.col("id"), F.col("emb").alias("embedding"))

    def get_point_ids(self) -> DataFrame:
        return self._require_fitted().select("id")

    def retrieve_embeddings(self, ids: list) -> dict:
        emb = self._require_fitted()
        rows = emb.filter(F.col("id").isin(list(ids))).collect()
        found = {r["id"]: list(r["emb"]) for r in rows}
        # reference semantics: unknown points map to None (pipelines.py:140-151)
        return {i: found.get(i) for i in ids}

    def get_neighbors(
        self, point_ids: DataFrame | list | None = None, k: int = 10
    ) -> DataFrame:
        """Top-k cosine neighbors of the given points (default: all) among
        the fitted points — (query_id, neighbor_id, cosine, rank)."""
        from bluegraph_spark.operators.similarity import (
            cosine_topk,
            lsh_cosine_topk,
        )

        table = self.generate_embedding_table().withColumnRenamed(
            "id", "vec_id"
        )
        if point_ids is None:
            queries = table
        else:
            if isinstance(point_ids, list):
                spark = table.sparkSession
                ids_df = spark.createDataFrame(
                    [(i,) for i in point_ids], "vec_id string"
                )
            else:
                ids_df = point_ids.select(F.col("id").alias("vec_id"))
            queries = table.join(ids_df, "vec_id")
        if self.similarity == "cosine":
            return cosine_topk(queries, table, k)
        if self.similarity == "lsh-cosine":
            return lsh_cosine_topk(queries, table, k, **self.lsh_params)
        raise EmbeddingPipelineError(
            f"unknown similarity {self.similarity!r}"
        )

    # ----------------------------------------------------------- io

    def save(self, path: str) -> None:
        """Parquet embedding table + JSON params (the reference's zip of
        pickles, pipelines.py:205-230, made cluster-readable)."""
        emb = self._require_fitted()
        os.makedirs(path, exist_ok=True)
        emb.write.mode("overwrite").parquet(os.path.join(path, "embeddings"))
        params = {
            "embedder": "fastrp",
            "embedder_params": self.embedder_params,
            "similarity": self.similarity,
            "lsh_params": self.lsh_params,
        }
        with open(os.path.join(path, "pipeline.json"), "w") as f:
            json.dump(params, f, indent=1)

    @classmethod
    def load(cls, spark, path: str) -> "EmbeddingPipeline":
        with open(os.path.join(path, "pipeline.json")) as f:
            params = json.load(f)
        out = cls(
            embedder_params=params["embedder_params"],
            similarity=params["similarity"],
            lsh_params=params["lsh_params"],
        )
        out._embeddings = spark.read.parquet(os.path.join(path, "embeddings"))
        return out
