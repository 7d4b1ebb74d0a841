"""Similarity search over embedding columns (array<float>).

Two paths, per the engine policy for 100 TB pipelines:
- ``cosine_topk``: brute-force exact top-k — the correctness baseline. The
  dot product is a pure Catalyst ``zip_with``/``aggregate`` fold (JVM
  codegen, no Python); the pair space is a join on a constant key, which
  AQE re-splits. Use only when |queries| × |corpus| is small or as the
  in-bucket verifier.
- ``lsh_cosine_topk``: random-hyperplane LSH — signatures from
  deterministic, seeded pseudo-random planes (xxhash64-derived weights, no
  RNG state, identical across runs/partitionings), bucket equi-join, exact
  cosine within bucket, top-k per query with multiprobe via several
  independent tables. Recall < 1 by construction; the scale path.

(The reference's similarity layer is Faiss/sklearn on the driver,
/root/reference/bluegraph/downstream/similarity.py:41-66 — inventoried
out-of-scope in SURVEY.md §2.13; these operators are its distributed
replacement.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _norm(vec):
    return F.sqrt(F.aggregate(vec, F.lit(0.0), lambda a, x: a + x * x))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def _prep(df: DataFrame, id_col: str, vec_col: str, name: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias(f"{name}_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias(f"{name}_vec"),
    )


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, cosine, rank): exact brute-force top-k.

    Self-matches (same id) are excluded. Deterministic tie-break on
    neighbor id.
    """
    q = _prep(queries, id_col, vec_col, "q")
    c = _prep(corpus, id_col, vec_col, "c")
    pairs = q.crossJoin(c).filter(F.col("q_id") != F.col("c_id"))
    scored = pairs.select(
        F.col("q_id").alias("query_id"),
        F.col("c_id").alias("neighbor_id"),
        (
            _dot(F.col("q_vec"), F.col("c_vec"))
            / (_norm(F.col("q_vec")) * _norm(F.col("c_vec")))
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _plane_table(spark, dim: int, planes: int, seed: int) -> DataFrame:
    """Deterministic pseudo-random hyperplanes: weight(p, d) in [-1, 1)."""
    return (
        spark.range(planes)
        .withColumnRenamed("id", "plane")
        .crossJoin(spark.range(dim).withColumnRenamed("id", "pos"))
        .select(
            "plane",
            "pos",
            (
                (F.abs(F.xxhash64(F.lit(seed), "plane", "pos")) % F.lit(2**52))
                / F.lit(float(2**51))
                - 1.0
            ).alias("w"),
        )
    )


def lsh_signatures(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 12,
    seed: int = 42,
) -> DataFrame:
    """(id, bucket): sign-bit bucket of each vector under ``planes``
    deterministic hyperplanes."""
    spark = df.sparkSession
    dim = len(df.select(vec_col).first()[0])
    pl = _plane_table(spark, dim, planes, seed)
    flat = df.select(
        F.col(id_col).alias("id"), F.posexplode(vec_col).alias("pos", "x")
    )
    bits = (
        flat.join(F.broadcast(pl), "pos")
        .groupBy("id", "plane")
        .agg(F.sum(F.col("x").cast("double") * F.col("w")).alias("proj"))
        .groupBy("id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("plane", F.when(F.col("proj") >= 0, "1").otherwise("0").alias("b"))
                        )
                    ),
                    lambda s: s["b"],
                ),
                "",
            ).alias("bucket")
        )
    )
    return bits


def lsh_cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 12,
    tables: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: union of ``tables`` independent LSH tables, exact
    cosine inside shared buckets, top-k per query."""
    q = _prep(queries, id_col, vec_col, "q")
    c = _prep(corpus, id_col, vec_col, "c")
    cand = None
    for t in range(tables):
        qs = lsh_signatures(queries, id_col, vec_col, planes, seed + 1000 * t)
        cs = lsh_signatures(corpus, id_col, vec_col, planes, seed + 1000 * t)
        pairs = qs.withColumnRenamed("id", "query_id").join(
            cs.withColumnRenamed("id", "neighbor_id"), "bucket"
        ).select("query_id", "neighbor_id")
        cand = pairs if cand is None else cand.unionByName(pairs)
    cand = cand.filter(F.col("query_id") != F.col("neighbor_id")).distinct()
    scored = (
        cand.join(q.withColumnRenamed("q_id", "query_id"), "query_id")
        .join(c.withColumnRenamed("c_id", "neighbor_id"), "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot(F.col("q_vec"), F.col("c_vec"))
                / (_norm(F.col("q_vec")) * _norm(F.col("c_vec")))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
