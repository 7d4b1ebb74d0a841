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

Superstep plan (same scale design as pagerank.py): the symmetrized edge
table is CSR-blocked (hash-partitioned by src, sorted, cached) so the
per-superstep label join re-shuffles only the small label state; the
weighted-majority argmax is a ``min_by`` over (-weight, label) — struct
ordering gives the max-weight / min-label tie-break in one aggregation, no
window; the change count rides the checkpoint materialization as an
observed metric; AQE and the shuffle width are frozen inside the loop.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from bluegraph_spark.pgframe import symmetrize_edges
from bluegraph_spark.plans.checkpoint import SuperstepCheckpointer
from bluegraph_spark.plans.isolation import loop_partitions, loop_session, rebind
from bluegraph_spark.plans.stats_guard import (
    release_local_checkpoint,
    stats_safe_local_checkpoint,
)


@dataclass
class LPAResult:
    labels: DataFrame  # (id, label)
    iterations: int
    converged: bool
    history: list[dict[str, Any]] = field(default_factory=list)
    # physical plan of the first superstep (pre-materialization) + its
    # executed shuffle-exchange count for the plan-guard test
    superstep_plan: str | None = None
    superstep_exchanges: int | None = None


def label_propagation(
    edges: DataFrame,
    weight_col: str | None = None,
    max_iter: int = 20,
    nodes: DataFrame | None = None,
    checkpointer: SuperstepCheckpointer | None = None,
    resume: bool = False,
    partitions: int | None = None,
) -> LPAResult:
    """Deterministic synchronous LPA over undirected ``(src, dst[, w])``.

    Conf isolation: like :func:`pagerank`, the superstep loop pins AQE off
    and the shuffle width — on its own ``newSession()`` of the caller's
    SparkContext, so the caller's conf is never mutated.
    """
    caller = edges.sparkSession
    spark = loop_session(caller)
    edges = rebind(edges, spark)
    if nodes is not None:
        nodes = rebind(nodes, spark)
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    # Ids (and therefore labels) keep their native type; the min-label
    # tie-break uses that type's ordering (numeric for ints, lexicographic
    # for strings). Long shuffles/joins are several times cheaper at scale.
    e = symmetrize_edges(
        edges.select(
            F.col("src").alias("src"),
            F.col("dst").alias("dst"),
            w.alias("w"),
        ).filter(F.col("src") != F.col("dst"))
    )

    conf_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))

    # Resume of a run already marked converged returns BEFORE building (and
    # fully materializing) the CSR edge cache — the loop below would never
    # run, so paying a complete pass over the edges on this path is waste.
    if resume and checkpointer is not None and checkpointer.latest() is not None:
        last = checkpointer.latest()
        if checkpointer.load_metrics(last).get("converged"):
            labels = checkpointer.load(spark, last)
            return LPAResult(
                rebind(labels.select("id", "label"), caller), last, True,
                checkpointer.metrics_log(),
            )

    # One pass over the (possibly expensive) source: cache the symmetrized
    # raw edges, size the loop partitioning off the cached count, build the
    # CSR-blocked cache from it, then drop the raw cache.
    e0 = e.persist()

    if partitions:
        n_parts = int(partitions)
    else:
        n_edges = e0.count()
        n_parts = loop_partitions(n_edges, conf_parts)
    e = e0.repartition(n_parts, "src").sortWithinPartitions("src").persist()

    # Vertex set from the CSR cache, NOT from e0: the label-init checkpoint
    # below runs after e0 is dropped, and a vertices plan rooted on e0
    # would silently re-execute the full (possibly expensive) upstream edge
    # expression at that point — measured as an extra complete
    # co-occurrence join per LPA call on lazy inputs.
    if nodes is None:
        # symmetrized + self-loop-free: the src set IS the vertex set
        vertices = e.select(F.col("src").alias("id")).distinct()
    else:
        id_type = dict(edges.dtypes).get("src", "string")
        first = nodes.columns[0]
        if dict(nodes.dtypes)[first] == id_type and first == "id":
            # no-op alias/cast would be optimizer-stripped and strand the
            # checkpoint-captured partitioning (see pagerank.py)
            vertices = nodes.select("id").distinct()
        else:
            vertices = nodes.select(
                F.col(first).cast(id_type).alias("id")
            ).distinct()

    # Materialize the CSR cache under AQE, then freeze the plan BEFORE the
    # initial labels materialize: a localCheckpoint taken under AQE captures
    # UnknownPartitioning (see pagerank.py — measured as avoidable state
    # shuffles on superstep 1). Conf pins land on the loop's own session.
    e.count()
    e0.unpersist()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))

    start_iter = 0
    if resume and checkpointer is not None and checkpointer.latest() is not None:
        # non-converged resume (the converged case returned above)
        start_iter = checkpointer.latest()
        labels = checkpointer.load(spark, start_iter)
    else:
        base = vertices.repartition(n_parts, "id")
        if checkpointer is not None:
            labels = checkpointer.save(0, base.withColumn("label", F.col("id")))
        else:
            # Checkpoint the single-column vertex set and add label = id as
            # a lazy projection ABOVE the scan: checkpointing (id, id AS
            # label) lets the optimizer express the captured partitioning
            # through the label alias instead of id, which strands both
            # superstep joins on an unusable clustering (measured: +2
            # exchanges on superstep 1).
            labels = stats_safe_local_checkpoint(base).withColumn("label", F.col("id"))

    history: list[dict[str, Any]] = []
    converged = False
    it = start_iter
    superstep_plan: str | None = None
    superstep_exchanges: int | None = None
    try:
        while it < max_iter:
            it += 1
            t0 = time.time()
            scores = (
                e.join(labels.select(F.col("id").alias("src"), "label"), "src")
                .groupBy(F.col("dst").alias("id"), "label")
                .agg(F.sum("w").alias("s"))
            )
            # argmax by (weight desc, label asc) without a window: struct
            # ordering is lexicographic, so min over (-s, label) picks the
            # heaviest label with the smallest-label tie-break.
            best = scores.groupBy("id").agg(
                F.min_by(
                    "label", F.struct((-F.col("s")).alias("ns"), F.col("label"))
                ).alias("_new")
            )
            new_labels = labels.join(best, "id", "left").select(
                "id",
                F.coalesce("_new", "label").alias("label"),
                (F.coalesce("_new", "label") != F.col("label")).alias("_changed"),
            )
            obs = Observation(f"lpa_iter_{it}")
            new_labels = new_labels.observe(
                obs,
                F.sum(F.col("_changed").cast("long")).alias("changes"),
                F.count(F.lit(1)).alias("rows"),
            )
            if superstep_plan is None:
                from bluegraph_spark.plans.planinfo import executed_exchange_count

                superstep_plan = (
                    new_labels._jdf.queryExecution().executedPlan().toString()
                )
                superstep_exchanges = executed_exchange_count(new_labels)
            if checkpointer is not None:
                new_labels = checkpointer.save(it, new_labels, {"pending": True})
            else:
                new_labels = stats_safe_local_checkpoint(new_labels)
            m = obs.get
            changes = int(m["changes"] or 0)
            rec = {
                "iteration": it,
                "superstep_sec": round(time.time() - t0, 3),
                "changes": changes,
                "rows": int(m["rows"]),
                "converged": changes == 0,
            }
            history.append(rec)
            if checkpointer is not None:
                from bluegraph_spark.operators.pagerank import _update_metrics

                _update_metrics(checkpointer, it, rec)
            # Successor materialized (obs.get returned): free the
            # superseded label state's blocks deterministically rather than
            # waiting for a periodic-GC ContextCleaner pass. The initial
            # labels (a projection over the vertex checkpoint) no-op.
            release_local_checkpoint(labels)
            labels = new_labels
            if changes == 0:
                converged = True
                break
    finally:
        e.unpersist()

    return LPAResult(
        rebind(labels.select("id", "label"), caller), it, converged, history,
        superstep_plan, superstep_exchanges,
    )
