"""Neighborhood queries: top-n neighbors by edge weight.

Reference: ``PathFinder.top_neighbors``
(/root/reference/bluegraph/core/analyse/paths.py:150-159) — rank a vertex's
neighbors by edge weight, keep n. Spark generalization: computed for every
vertex at once with a window (partitionBy vertex, orderBy weight desc),
which is the form a 100 TB run needs anyway; the single-vertex lookup is a
filter on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bluegraph_spark.pgframe import symmetrize_edges


def top_neighbors(
    edges: DataFrame,
    n: int,
    weight_col: str = "weight",
    vertex: str | None = None,
    directed: bool = False,
) -> DataFrame:
    """(id, neighbor, weight, rank) — top-n per vertex, deterministic
    (weight desc, neighbor id asc tie-break)."""
    e = edges.select(
        F.col("src"),
        F.col("dst"),
        F.col(weight_col).cast("double").alias("weight"),
    )
    if not directed:
        e = symmetrize_edges(e)
    if vertex is not None:
        e = e.filter(F.col("src") == F.lit(vertex))
    w = Window.partitionBy("src").orderBy(F.desc("weight"), F.asc("dst"))
    return (
        e.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n)
        .select(F.col("src").alias("id"), F.col("dst").alias("neighbor"), "weight", "rank")
    )
