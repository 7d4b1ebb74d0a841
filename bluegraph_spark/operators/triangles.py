"""Per-vertex and global triangle counting (degree-ordered closure).

North-rule addition (no reference operator; oracle = ``nx.triangles``).
Classic distributed formulation (Suri & Vassilvitskii, WWW'11 "Counting
triangles and the curse of the last reducer"): orient every undirected edge
from the endpoint with smaller (degree, id) to the larger — a total order,
so each triangle is counted exactly once as a wedge at its lowest-degree
corner closed by an oriented edge. The orientation bounds every vertex's
out-degree by O(sqrt(m)), which is precisely the hub-skew mitigation for
the wedge join.

Plan: degree aggregation → orientation join → wedge self-join → closure
semi-join → corner explode + count. All joins are equi-joins Catalyst can
shuffle/broadcast as sizes dictate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _oriented(edges: DataFrame) -> DataFrame:
    e = (
        edges.select(
            F.col("src").cast("string").alias("a"),
            F.col("dst").cast("string").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("id"))
        .unionByName(e.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    withk = (
        e.join(deg.select(F.col("id").alias("a"), F.col("deg").alias("_da")), "a")
        .join(deg.select(F.col("id").alias("b"), F.col("deg").alias("_db")), "b")
    )
    ka = F.struct(F.col("_da").alias("d"), F.col("a").alias("i"))
    kb = F.struct(F.col("_db").alias("d"), F.col("b").alias("i"))
    return withk.select(
        F.when(ka < kb, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(ka < kb, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(ka < kb, kb).otherwise(ka).alias("kv"),
    )


def triangles(edges: DataFrame) -> DataFrame:
    """Triangle corner table: one row (x, y, z) per triangle.

    The oriented edge table feeds three plan branches (both wedge sides and
    the closure probe); persisting it keeps the upstream edge expression —
    often an expensive co-occurrence join — at one evaluation.
    """
    o = _oriented(edges).persist()
    e1, e2 = o.alias("e1"), o.alias("e2")
    wedges = e1.join(
        e2,
        (F.col("e1.u") == F.col("e2.u")) & (F.col("e1.kv") < F.col("e2.kv")),
    ).select(
        F.col("e1.u").alias("x"),
        F.col("e1.v").alias("y"),
        F.col("e2.v").alias("z"),
    )
    closure = o.select(F.col("u").alias("y"), F.col("v").alias("z"))
    return wedges.join(closure, ["y", "z"], "left_semi")


def triangle_counts(edges: DataFrame, nodes: DataFrame | None = None) -> DataFrame:
    """Per-vertex triangle counts (id, triangles), matching nx.triangles."""
    tri = triangles(edges)
    corners = (
        tri.select(F.col("x").alias("id"))
        .unionByName(tri.select(F.col("y").alias("id")))
        .unionByName(tri.select(F.col("z").alias("id")))
    )
    counts = corners.groupBy("id").agg(F.count("*").alias("triangles"))
    if nodes is None:
        vertices = (
            edges.select(F.col("src").cast("string").alias("id"))
            .unionByName(edges.select(F.col("dst").cast("string").alias("id")))
            .distinct()
        )
    else:
        vertices = nodes.select(
            F.col(nodes.columns[0]).cast("string").alias("id")
        ).distinct()
    return vertices.join(counts, "id", "left").select(
        "id", F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles")
    )


def triangle_count_global(edges: DataFrame) -> int:
    """Total number of distinct triangles in the graph."""
    return triangles(edges).count()
