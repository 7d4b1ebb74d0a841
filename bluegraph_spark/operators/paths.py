"""Path queries: top-n neighbors, single-source shortest paths.

Reference: ``PathFinder.top_neighbors``
(/root/reference/bluegraph/core/analyse/paths.py:150-159) — rank a vertex's
neighbors by edge weight, keep n. Spark generalization: computed for every
vertex at once with a window (partitionBy vertex, orderBy weight desc),
which is the form a 100 TB run needs anyway; the single-vertex lookup is a
filter on top.

``shortest_paths`` is the distributed core of the reference's PathFinder
surface (``shortest_path`` / ``n_shortest_paths``, /root/reference/
bluegraph/core/analyse/paths.py:181-196, 96-144; nx impl
backends/networkx/analyse/paths.py:21-98): single-source weighted
distances via iterated frontier relaxation (distributed Bellman-Ford, the
Pregel SSSP formulation). The reference computes one (source, target)
path at a time in-process; the Spark shape computes the whole single-source
distance field — the target lookup is a filter, and per-round frontier
relaxation is provably equal to a full Bellman-Ford round (a vertex not
improved in round k-1 relaxes nothing new in round k), which is what the
DuckDB differential oracle unrolls.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, Observation, Window
from pyspark.sql import functions as F

from bluegraph_spark.pgframe import symmetrize_edges
from bluegraph_spark.plans.checkpoint import SuperstepCheckpointer
from bluegraph_spark.plans.isolation import loop_partitions, loop_session, rebind
from bluegraph_spark.plans.stats_guard import (
    release_local_checkpoint,
    stats_safe_local_checkpoint,
)


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


@dataclass
class SSSPResult:
    distances: DataFrame  # (id, dist) — reached vertices only
    iterations: int
    converged: bool
    history: list[dict[str, Any]] = field(default_factory=list)


def shortest_paths(
    edges: DataFrame,
    source,
    weight_col: str | None = None,
    directed: bool = False,
    max_iter: int = 50,
    checkpointer: SuperstepCheckpointer | None = None,
    resume: bool = False,
    partitions: int | None = None,
) -> SSSPResult:
    """Single-source shortest-path distances over ``(src, dst[, w])``.

    Returns (id, dist) for every vertex reachable from ``source`` within
    ``max_iter`` relaxation rounds (dist = minimum path weight sum; weights
    must be non-negative for the result to be shortest-path distances —
    with hop semantics pass ``weight_col=None`` for w=1). Running with a
    fixed ``max_iter`` yields exactly the ``max_iter``-round Bellman-Ford
    state on both engines whether or not the field has converged — the
    frontier optimization (only edges out of vertices improved last round
    are relaxed) is result-identical per round, just cheaper.

    Scale design: same loop discipline as pagerank — CSR-blocked cached
    edge table (hash by src, sorted), distance state through the
    stats-guarded localCheckpoint / SuperstepCheckpointer, improved-count
    riding the materialization as an observed metric, AQE + shuffle width
    frozen on the loop's own session. The state holds REACHED vertices
    only, so early rounds shuffle a frontier, not the vertex set.
    """
    caller = edges.sparkSession
    spark = loop_session(caller)
    edges = rebind(edges, spark)
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    e = edges.select(F.col("src"), F.col("dst"), w.alias("w")).filter(
        F.col("src") != F.col("dst")
    )
    if not directed:
        e = symmetrize_edges(e)
    e = e.persist()
    n_edges = e.count()
    conf_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # Width budget 250k rows/partition, NOT the 32k superstep default: the
    # per-round shuffled state here is the frontier/distance field — a few
    # thousand rows on typical inputs, two orders below the edge table the
    # budget divides — so an edge-sized fan-out buys no parallelism for
    # the state exchanges and pays per-stage scheduling + straggler cost
    # every round (isolated interleaved A/B at sf0.1, 6 reps: sssp median
    # 6.8s at 32k vs 6.3s at 250k, k-shortest 15.1s vs 12.1s). Loops whose
    # round state IS the edge set (CC) keep the 32k budget — same A/B:
    # cc_orders 10.2s at 32k vs 14.9s at 250k.
    n_parts = (
        int(partitions)
        if partitions
        else loop_partitions(n_edges, conf_parts, rows_per_partition=250_000)
    )
    csr = e.repartition(n_parts, "src").sortWithinPartitions("src").persist()
    csr.count()
    e.unpersist()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))

    id_type = dict(csr.dtypes)["src"]
    history: list[dict[str, Any]] = []
    converged = False
    it = 0
    prev_cp = None
    if resume and checkpointer is not None and checkpointer.latest() is not None:
        # checkpoints store (id, dist, _improved): the distance field and
        # the frontier are both projections of the saved frame
        it = checkpointer.latest()
        relaxed0 = checkpointer.load(spark, it)
        last = checkpointer.load_metrics(it)
        dist = relaxed0.select("id", "dist")
        frontier = relaxed0.filter(F.col("_improved")).select("id", "dist")
        if last.get("converged"):
            csr.unpersist()
            return SSSPResult(
                rebind(dist, caller), it, True, checkpointer.metrics_log()
            )
    else:
        dist = spark.createDataFrame([(source,)], f"id {id_type}").select(
            "id", F.lit(0.0).alias("dist")
        )
        if checkpointer is not None:
            d0 = dist.withColumn("_improved", F.lit(True))
            d0 = checkpointer.save(
                0, d0, {"improved": 1, "reached": 1, "converged": False}
            )
            dist = d0.select("id", "dist")
            frontier = dist
        else:
            dist = dist.repartition(n_parts, "id").localCheckpoint()
            frontier = dist
            prev_cp = dist
    try:
        while it < max_iter:
            it += 1
            t0 = time.time()
            cand = (
                csr.join(frontier.select(F.col("id").alias("src"), "dist"), "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.min(F.col("dist") + F.col("w")).alias("_cand"))
            )
            relaxed = (
                dist.join(cand, "id", "full_outer")
                .select(
                    "id",
                    F.least(
                        F.coalesce("dist", F.lit(float("inf"))),
                        F.coalesce("_cand", F.lit(float("inf"))),
                    ).alias("dist"),
                    (
                        F.col("dist").isNull()
                        | (F.coalesce("_cand", F.lit(float("inf"))) < F.col("dist"))
                    ).alias("_improved"),
                )
            )
            obs = Observation(f"sssp_iter_{it}_{time.time_ns()}")
            relaxed = relaxed.observe(
                obs,
                F.sum(F.col("_improved").cast("long")).alias("improved"),
                F.count(F.lit(1)).alias("rows"),
            )
            if checkpointer is not None:
                relaxed = checkpointer.save(it, relaxed, {"pending": True})
            else:
                relaxed = stats_safe_local_checkpoint(relaxed)
            m = obs.get
            # relaxed is materialized; the previous distance checkpoint
            # (dist and frontier are projections over it) is dead — free its
            # blocks now instead of waiting for a periodic-GC cleaner pass.
            release_local_checkpoint(prev_cp)
            prev_cp = relaxed
            improved = int(m["improved"] or 0)
            rec = {
                "iteration": it,
                "superstep_sec": round(time.time() - t0, 3),
                "improved": improved,
                "reached": int(m["rows"]),
                "converged": improved == 0,
            }
            history.append(rec)
            if checkpointer is not None:
                from bluegraph_spark.operators.pagerank import _update_metrics

                _update_metrics(checkpointer, it, rec)
            frontier = relaxed.filter(F.col("_improved")).select("id", "dist")
            dist = relaxed.select("id", "dist")
            if improved == 0:
                converged = True
                break
    finally:
        csr.unpersist()

    return SSSPResult(rebind(dist, caller), it, converged, history)


@dataclass
class KShortestResult:
    """Result of :func:`k_shortest_distances`."""

    distances: DataFrame  # (id, rank int, dist double), rank 1..k per id
    iterations: int
    converged: bool
    history: list[dict[str, Any]] = field(default_factory=list)


def k_shortest_distances(
    edges: DataFrame,
    source,
    k: int = 3,
    weight_col: str | None = None,
    directed: bool = False,
    max_iter: int = 50,
    checkpointer: SuperstepCheckpointer | None = None,
    resume: bool = False,
    partitions: int | None = None,
) -> KShortestResult:
    """k smallest DISTINCT walk lengths from ``source`` to every vertex.

    The scalable analogue of the reference's ``n_shortest_paths``
    (/root/reference/bluegraph/core/analyse/paths.py:217-298): where the
    reference enumerates k shortest SIMPLE paths for one (source, target)
    pair in-process (Yen's algorithm / ranked all-shortest-paths), this
    operator computes, for EVERY vertex at once, the k smallest distinct
    total weights over all walks from the source — the multi-label
    generalization of Bellman-Ford (each vertex keeps its k best labels;
    k = 1 degenerates to :func:`shortest_paths`). Distinct-value semantics
    (duplicate walk lengths collapse) keep the label set canonical and the
    fixpoint independent of relaxation order, which is what makes the
    result deterministic, partitioning-invariant, and expressible as an
    unrolled SQL recurrence for the differential oracle. For exact
    simple-path enumeration semantics on small graphs, use
    ``path_bridge.n_shortest_paths`` (the size-gated driver bridge).

    Correctness of per-vertex top-k truncation: a successor's k best
    distinct distances through vertex u are a monotone image (+w) of u's
    OWN k best distinct distances, so labels trimmed beyond rank k at u
    can never contribute a top-k label downstream — truncation is
    lossless. Frontier optimization: only labels that ENTERED a vertex's
    top-k set this round are relaxed next round; every label already
    relaxed when it first entered keeps its extensions in the state.

    Weights must be strictly positive for walk semantics to terminate
    (with zero-weight cycles the distinct-length fixpoint still exists and
    the iteration still converges, since distinctness bounds labels at k).

    Scale shape: identical loop discipline to :func:`shortest_paths` —
    CSR-blocked cached edges that never move; per round the (≤ kV)-row
    label state shuffles twice (join on src, window on id); AQE and
    shuffle width frozen on a private loop session; stats-guarded
    localCheckpoints with deterministic block release.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    caller = edges.sparkSession
    spark = loop_session(caller)
    edges = rebind(edges, spark)
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    e = edges.select(F.col("src"), F.col("dst"), w.alias("w"))
    if not directed:
        e = symmetrize_edges(e)
    e = e.filter(F.col("src") != F.col("dst")).persist()
    n_edges = e.count()
    conf_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # 250k rows/partition like shortest_paths (see the comment there): the
    # per-round label state is ≤ k·V rows, far below the edge table.
    n_parts = (
        int(partitions)
        if partitions
        else loop_partitions(n_edges, conf_parts, rows_per_partition=250_000)
    )
    csr = e.repartition(n_parts, "src").sortWithinPartitions("src").persist()
    csr.count()
    e.unpersist()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))

    id_type = dict(csr.dtypes)["src"]
    rk = F.row_number().over(Window.partitionBy("id").orderBy("dist"))

    history: list[dict[str, Any]] = []
    converged = False
    it = 0
    prev_cp = None
    if resume and checkpointer is not None and checkpointer.latest() is not None:
        # checkpoints store the merged label table (id, dist, _old):
        # state and frontier are both projections of it, so one saved
        # frame resumes the whole loop (same contract as SSSP/pagerank)
        it = checkpointer.latest()
        merged = checkpointer.load(spark, it)
        last = checkpointer.load_metrics(it)
        state = merged.select("id", "dist")
        frontier = merged.filter(~F.col("_old")).select("id", "dist")
        if last.get("converged"):
            csr.unpersist()
            out = state.withColumn("rank", rk.cast("int")).select(
                "id", "rank", "dist"
            )
            return KShortestResult(
                rebind(out, caller), it, True, checkpointer.metrics_log()
            )
    else:
        state = spark.createDataFrame([(source,)], f"id {id_type}").select(
            "id", F.lit(0.0).alias("dist")
        )
        if checkpointer is not None:
            state0 = state.withColumn("_old", F.lit(False))
            state0 = checkpointer.save(
                0, state0, {"new_labels": 1, "labels": 1, "converged": False}
            )
            state = state0.select("id", "dist")
            frontier = state
        else:
            state = state.repartition(n_parts, "id").localCheckpoint()
            frontier = state
            prev_cp = state
    try:
        while it < max_iter:
            it += 1
            t0 = time.time()
            cand = csr.join(
                frontier.select(F.col("id").alias("src"), "dist"), "src"
            ).select(
                F.col("dst").alias("id"), (F.col("dist") + F.col("w")).alias("dist")
            )
            # old labels tagged so the frontier (labels NEW in the top-k
            # set) falls out of the same window pass
            merged = (
                state.withColumn("_old", F.lit(True))
                .unionByName(cand.withColumn("_old", F.lit(False)))
                .groupBy("id", "dist")
                .agg(F.max("_old").alias("_old"))
                .withColumn("_rk", rk)
                .filter(F.col("_rk") <= k)
            )
            obs = Observation(f"kssp_iter_{it}_{time.time_ns()}")
            merged = merged.observe(
                obs,
                F.sum((~F.col("_old")).cast("long")).alias("new_labels"),
                F.count(F.lit(1)).alias("labels"),
            )
            if checkpointer is not None:
                merged = checkpointer.save(it, merged, {"pending": True})
            else:
                merged = stats_safe_local_checkpoint(merged)
            m = obs.get
            release_local_checkpoint(prev_cp)
            prev_cp = merged if checkpointer is None else None
            new_labels = int(m["new_labels"] or 0)
            rec = {
                "iteration": it,
                "superstep_sec": round(time.time() - t0, 3),
                "new_labels": new_labels,
                "labels": int(m["labels"]),
                "converged": new_labels == 0,
            }
            history.append(rec)
            if checkpointer is not None:
                from bluegraph_spark.operators.pagerank import _update_metrics

                _update_metrics(checkpointer, it, rec)
            frontier = merged.filter(~F.col("_old")).select("id", "dist")
            state = merged.select("id", "dist")
            if new_labels == 0:
                converged = True
                break
    finally:
        csr.unpersist()

    out = state.withColumn("rank", rk.cast("int")).select("id", "rank", "dist")
    return KShortestResult(rebind(out, caller), it, converged, history)
