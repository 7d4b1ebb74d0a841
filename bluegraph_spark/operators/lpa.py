"""Synchronous, deterministic label propagation (community detection).

Reference semantics: ``asyn_lpa_communities(G, weight=...)`` called by
/root/reference/bluegraph/backends/networkx/analyse/communities.py:116-119.
The reference algorithm is asynchronous and *randomized* (ties and visit
order break randomly; its own test only asserts ≥1 community,
tests/analyse/test_communities.py:112-114), so a distributed engine cannot
— and per SURVEY.md §5 should not — replay it. The engine spec here is the
deterministic synchronous variant:

- every vertex starts with its own id as label;
- each superstep, every vertex adopts the label with the largest incident
  weight sum among its neighbors' *previous* labels, ties broken by the
  smallest label; vertices with no neighbors keep their label;
- stop when no label changes (fixpoint) or after ``max_iter`` supersteps
  (synchronous LPA can 2-cycle on bipartite-ish structures; the cap is the
  standard remedy).

The matching pure-Python oracle lives in the test suite; exact equality of
labels is asserted at convergence (north rule).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bluegraph_spark.pgframe import symmetrize_edges
from bluegraph_spark.plans.checkpoint import SuperstepCheckpointer


@dataclass
class LPAResult:
    labels: DataFrame  # (id, label)
    iterations: int
    converged: bool
    history: list[dict[str, Any]] = field(default_factory=list)


def label_propagation(
    edges: DataFrame,
    weight_col: str | None = None,
    max_iter: int = 20,
    nodes: DataFrame | None = None,
    checkpointer: SuperstepCheckpointer | None = None,
    resume: bool = False,
) -> LPAResult:
    """Deterministic synchronous LPA over undirected ``(src, dst[, w])``."""
    spark = edges.sparkSession
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    e = symmetrize_edges(
        edges.select(
            F.col("src").cast("string").alias("src"),
            F.col("dst").cast("string").alias("dst"),
            w.alias("w"),
        ).filter(F.col("src") != F.col("dst"))
    )

    if nodes is None:
        vertices = (
            e.select(F.col("src").alias("id"))
            .unionByName(e.select(F.col("dst").alias("id")))
            .distinct()
        )
    else:
        vertices = nodes.select(
            F.col(nodes.columns[0]).cast("string").alias("id")
        ).distinct()

    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = e.repartition(n_parts, "src").persist()

    start_iter = 0
    if resume and checkpointer is not None and checkpointer.latest() is not None:
        start_iter = checkpointer.latest()
        labels = checkpointer.load(spark, start_iter)
        if checkpointer.load_metrics(start_iter).get("converged"):
            return LPAResult(
                labels.select("id", "label"), start_iter, True,
                checkpointer.metrics_log(),
            )
    else:
        labels = vertices.withColumn("label", F.col("id"))
        if checkpointer is not None:
            labels = checkpointer.save(0, labels)
        else:
            labels = labels.localCheckpoint()

    history: list[dict[str, Any]] = []
    converged = False
    it = start_iter
    while it < max_iter:
        it += 1
        scores = (
            e.join(labels.select(F.col("id").alias("src"), "label"), "src")
            .groupBy(F.col("dst").alias("id"), "label")
            .agg(F.sum("w").alias("s"))
        )
        pick = Window.partitionBy("id").orderBy(F.desc("s"), F.asc("label"))
        best = (
            scores.withColumn("_rn", F.row_number().over(pick))
            .filter(F.col("_rn") == 1)
            .select("id", F.col("label").alias("_new"))
        )
        new_labels = (
            labels.join(best, "id", "left")
            .select(
                "id",
                F.coalesce("_new", "label").alias("label"),
                (F.coalesce("_new", "label") != F.col("label")).alias("_changed"),
            )
        )
        if checkpointer is not None:
            new_labels = checkpointer.save(it, new_labels, {"pending": True})
        else:
            new_labels = new_labels.localCheckpoint()
        changes = new_labels.filter("_changed").count()
        rec = {"iteration": it, "changes": int(changes), "converged": changes == 0}
        history.append(rec)
        if checkpointer is not None:
            from bluegraph_spark.operators.pagerank import _update_metrics

            _update_metrics(checkpointer, it, rec)
        labels = new_labels.drop("_changed") if changes == 0 else new_labels
        if changes == 0:
            converged = True
            break

    e.unpersist()
    return LPAResult(labels.select("id", "label"), it, converged, history)
