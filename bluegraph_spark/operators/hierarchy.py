"""Hierarchical (single-linkage agglomerative) clustering, distributed.

Reference surface: ``CommunityDetector.detect_communities(
strategy="hierarchical")`` (/root/reference/bluegraph/core/analyse/
communities.py:88-108) runs sklearn ``AgglomerativeClustering`` over
driver-resident node feature vectors with the graph adjacency as a
connectivity constraint — single-node, O(V²) memory. This module is the
Spark-first re-expression for the connectivity-constrained case the
reference actually uses: **single-linkage agglomerative clustering over an
edge distance table**, computed as a composition of two operators this
engine already trusts at scale:

- the **minimum spanning forest IS the single-linkage dendrogram**
  (classic equivalence — Gower & Ross 1969): sorting the forest's edges
  by weight gives the exact merge sequence of single-linkage
  agglomeration, and
- **cutting the k−1 heaviest forest edges** (or every edge above a
  distance threshold) and labeling the remaining **connected components**
  yields the k-cluster (resp. threshold) flat clustering.

Both building blocks are hash-exact-oracled distributed operators
(operators/mst.py — Borůvka, unique under the (weight, src, dst) total
order; operators/components.py — large-star/small-star), so the
composition is deterministic end to end: same edges ⇒ same dendrogram ⇒
same flat clusters on any cluster size. Feature-vector inputs plug in by
building the distance edge table first (e.g. embedding cosine/L2 over
LSH-candidate pairs — operators/similarity.py — or NPMI distance from the
co-occurrence builder), which keeps the pairwise step sparse instead of
the reference's dense O(V²) matrix.

Other linkages (ward/average/complete, the sklearn defaults) need
inter-cluster distance recomputation per merge and have no known
shuffle-bounded formulation; they stay out of the distributed surface
(use the reference for those, at reference scale).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bluegraph_spark.operators.components import connected_components
from bluegraph_spark.operators.mst import minimum_spanning_forest


def _global_rank(df: DataFrame, cols: list[str], out: str) -> DataFrame:
    """Dense 1-based global rank of each row under the ``cols`` total
    order, distributed: range-partition on the key, rank within each
    partition, add driver-side partition offsets — the node_index shape
    (operators/linkpred.py), generalized to a composite key. The ranged
    layout is frozen (eager localCheckpoint) before the counts collect so
    the offsets and the window job read the SAME partitioning
    (repartitionByRange re-samples boundaries per execution)."""
    from bluegraph_spark.plans.stats_guard import (
        release_local_checkpoint,
        stats_safe_local_checkpoint,
    )

    spark = df.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    ranged = stats_safe_local_checkpoint(
        df.repartitionByRange(n_parts, *cols).withColumn(
            "_pid", F.spark_partition_id()
        )
    )
    counts = {
        r["_pid"]: r["cnt"]
        for r in ranged.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_df = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()], "_pid int, _off long"
    )
    w = Window.partitionBy("_pid").orderBy(*cols)
    res = stats_safe_local_checkpoint(
        ranged.join(F.broadcast(off_df), "_pid")
        .withColumn(out, (F.row_number().over(w) + F.col("_off")).cast("int"))
        .drop("_pid", "_off")
    )
    release_local_checkpoint(ranged)
    return res


def single_linkage_dendrogram(
    edges: DataFrame, distance_col: str = "distance"
) -> DataFrame:
    """The single-linkage merge sequence: ``(src, dst, distance,
    merge_rank)`` — the minimum-spanning-forest edges ranked by the
    (distance, src, dst) total order. ``merge_rank`` i is the i-th
    agglomeration; cutting after rank r leaves V − r clusters (V = number
    of vertices, for a connected input). The rank is computed with the
    distributed range-partition + offsets construction — no
    single-partition global window."""
    mst = minimum_spanning_forest(edges, weight_col=distance_col)
    # tree_edges canonicalizes its weight column name to "weight"
    return _global_rank(
        mst.tree_edges.select(
            "src", "dst", F.col("weight").alias(distance_col)
        ),
        [distance_col, "src", "dst"],
        "merge_rank",
    )


@dataclass
class HierarchicalResult:
    labels: DataFrame  # (id, cluster) — cluster = min id in the cluster
    n_clusters: int
    # forest edges undone to reach n_clusters; -1 in threshold mode
    # (a height cut never materializes the forest, so no count exists)
    cut_edges: int
    history: list[dict[str, Any]] = field(default_factory=list)


def single_linkage_clusters(
    edges: DataFrame,
    distance_col: str = "distance",
    n_clusters: int | None = None,
    threshold: float | None = None,
) -> HierarchicalResult:
    """Flat single-linkage clustering of ``(src, dst, distance)``.

    Exactly one of ``n_clusters`` / ``threshold`` must be given:

    - ``threshold``: clusters = connected components of the sub-graph with
      ``distance <= threshold``. (Equivalent to cutting the dendrogram at
      that height; computed directly on the filtered input — the MST is
      not needed for a height cut, and CC on the raw filtered edges
      shuffles the same or less.)
    - ``n_clusters``: the dendrogram's k−1 heaviest merges are undone —
      drop the ``n_clusters − c₀``-heaviest forest edges (c₀ = component
      count of the full input) and label components. Deterministic under
      the forest's (weight, src, dst) total order.

    Labels are min-id canonical (the CC operator's contract), so they
    hash-compare against any independent implementation using the same
    canonicalization.
    """
    if (n_clusters is None) == (threshold is None):
        raise ValueError("give exactly one of n_clusters / threshold")

    # One execution of the (often expensive — e.g. a lazy co-occurrence
    # self-join) upstream edge expression: every consumer below — the MST
    # build, the vertex set (used twice: the count and the CC isolated-node
    # anti-join), the threshold filter — otherwise re-executes it from
    # source. Measured at sf0.1 (hierarchy_suppliers): 3 full co-occurrence
    # builds → 1, ~34s → ~14s end to end.
    from bluegraph_spark.plans.stats_guard import stats_safe_local_checkpoint

    edges = stats_safe_local_checkpoint(
        edges.select("src", "dst", distance_col)
    )
    nodes = stats_safe_local_checkpoint(
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )

    if threshold is not None:
        kept = edges.filter(F.col(distance_col) <= threshold)
        res = connected_components(kept, nodes=nodes)
        n = res.components.select("component").distinct().count()
        cut = -1
    else:
        if n_clusters < 1:
            raise ValueError("n_clusters must be >= 1")
        mst = minimum_spanning_forest(edges, weight_col=distance_col)
        forest = mst.tree_edges.persist()
        try:
            m = forest.count()
            v = nodes.count()
            c0 = v - m  # components of the full input
            cut = max(0, min(n_clusters - c0, m))
            # only the cut-th heaviest merges matter — a TakeOrdered of
            # `cut` rows (k−1 in practice), not a full dendrogram rank
            if cut:
                top = forest.orderBy(
                    F.col("weight").desc(), F.col("src").desc(), F.col("dst").desc()
                ).limit(cut)
                kept = forest.join(top, ["src", "dst"], "left_anti")
            else:
                kept = forest
            res = connected_components(kept.select("src", "dst"), nodes=nodes)
            n = c0 + cut
        finally:
            forest.unpersist()

    return HierarchicalResult(
        labels=res.components.withColumnRenamed("component", "cluster"),
        n_clusters=int(n),
        cut_edges=int(cut),
        history=res.history,
    )
