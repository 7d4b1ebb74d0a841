"""Connected components via alternating large-star / small-star joins.

North-rule addition (the reference has no CC operator; oracle =
``nx.connected_components`` with min-id canonical labels). Algorithm:
Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii — "Connected Components
in MapReduce and Beyond" (SOCC'14): repeat

  large-star(u): m = min(Γ(u) ∪ {u}); emit (v, m) for every neighbor v > u
  small-star(u): over the resulting downhill edges (v ≤ u), m = min(Γ(u) ∪
                 {u}); emit (x, m) for x ∈ Γ(u) ∪ {u}, x ≠ m

until the edge set is stable — O(log n) rounds, at which point the edges
form star forests: every node points at its component's minimum id. Each
round executes two clustered-cache builds (the symmetrized working set and
the large-star output, both repartitioned by their star key) plus at most
the final distinct's shuffle; the min-aggregations and redirect joins all
read the caches (see ``_cc_round`` and the plan-guard test — the unshared
formulation executed 10 shuffles per round). Ids keep their native type;
labels are the minimum id of each component under that type's ordering
(numeric for integer ids, lexicographic for strings).

Each round's edge set runs through ``SuperstepCheckpointer`` when supplied
(lineage cut + resume, north rule); otherwise ``localCheckpoint`` cuts
lineage. Convergence is detected with a (count, bit_xor(xxhash64)) signature
— order-insensitive, overflow-free under ANSI SQL (``sum(xxhash64)`` threw
ARITHMETIC_OVERFLOW on ≥2 rows with ``spark.sql.ansi.enabled=true``) — that
rides each round's materialization job as ``observe`` metrics, including the
initial one: no extra pass over the edges anywhere.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from bluegraph_spark.plans.checkpoint import SuperstepCheckpointer
from bluegraph_spark.plans.isolation import loop_partitions, loop_session, rebind
from bluegraph_spark.plans.stats_guard import (
    release_local_checkpoint,
    stats_safe_local_checkpoint,
)


@dataclass
class ComponentsResult:
    components: DataFrame  # (id, component)
    rounds: int
    converged: bool
    history: list[dict[str, Any]] = field(default_factory=list)
    # physical plan + executed shuffle count of the first round's output
    # (pre-materialization), for the exchange-budget plan-guard test
    round_plan: str | None = None
    round_exchanges: int | None = None


def _sig_cols() -> list:
    """(count, bit_xor of per-row xxhash64) — the convergence signature.

    ``bit_xor`` is order-insensitive and cannot overflow, so it is safe under
    ``spark.sql.ansi.enabled=true`` (a ``sum`` of 64-bit hashes overflows long
    on the second row). Edge sets are distinct within a round, so XOR-
    cancellation of duplicate rows cannot occur.
    """
    return [
        F.count(F.lit(1)).alias("cnt"),
        F.bit_xor(F.xxhash64("a", "b")).alias("h"),
    ]


def _materialize_with_sig(
    e: DataFrame,
    rnd: int,
    checkpointer: SuperstepCheckpointer | None,
) -> tuple[DataFrame, tuple[int, int]]:
    """Checkpoint/localCheckpoint ``e``; the signature rides the same job."""
    obs = Observation(f"cc_sig_r{rnd}_{time.time_ns()}")
    e = e.observe(obs, *_sig_cols())
    if checkpointer is not None:
        e = checkpointer.save(rnd, e)
    else:
        e = stats_safe_local_checkpoint(e)
    m = obs.get
    return e, (int(m["cnt"] or 0), int(m["h"] or 0))


def _large_star(e: DataFrame) -> DataFrame:
    # No distinct here: duplicate (a, m) rows across star centers are
    # harmless to small-star's min aggregate and are swept by its final
    # distinct — dropping the dedup saves one full shuffle per round.
    sym = e.select("a", "b").unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    mins = sym.groupBy("a").agg(F.min("b").alias("_mv"))
    mins = mins.select("a", F.least("_mv", F.col("a")).alias("_m"))
    return (
        sym.join(mins, "a")
        .filter(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), F.col("_m").alias("b"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    # input edges point downhill (b < a); group neighbors by a
    mins = e.groupBy("a").agg(F.min("b").alias("_m"))
    redirect = (
        e.join(mins, "a")
        .filter(F.col("b") != F.col("_m"))
        .select(F.col("b").alias("a"), F.col("_m").alias("b"))
    )
    self_edge = mins.select("a", F.col("_m").alias("b"))
    return redirect.unionByName(self_edge).distinct()


def _cc_round(e: DataFrame, n_parts: int) -> tuple[DataFrame, list[DataFrame]]:
    """One large-star + small-star round with an explicit exchange budget.

    Semantically identical to ``_small_star(_large_star(e))`` (the
    reference formulation, kept above for unit tests), but each star's
    working set is repartitioned by its grouping key, sorted, and persisted
    ONCE — the min-aggregation and the redirect join then both read the
    clustered cache, so the round executes 3 shuffles (sym layout, ls
    layout, final distinct) instead of the 10 the naive plan runs when the
    unpersisted union is recomputed on both consumer branches. Skew safety
    is unchanged: min is still a partial-aggregating groupBy, never a
    whole-group window buffer. Returns (round_output, caches) — the caller
    unpersists the caches after materializing the output.
    """
    sym = (
        e.select("a", "b")
        .unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .repartition(n_parts, "a")
        .sortWithinPartitions("a")
        .persist()
    )
    mins = sym.groupBy("a").agg(F.min("b").alias("_mv"))
    mins = mins.select("a", F.least("_mv", F.col("a")).alias("_m"))
    ls = (
        sym.join(mins, "a")
        .filter(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), F.col("_m").alias("b"))
        .repartition(n_parts, "a")
        .sortWithinPartitions("a")
        .persist()
    )
    mins2 = ls.groupBy("a").agg(F.min("b").alias("_m"))
    redirect = (
        ls.join(mins2, "a")
        .filter(F.col("b") != F.col("_m"))
        .select(F.col("b").alias("a"), F.col("_m").alias("b"))
    )
    out = redirect.unionByName(mins2.select("a", F.col("_m").alias("b"))).distinct()
    return out, [sym, ls]


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    max_rounds: int = 50,
    checkpointer: SuperstepCheckpointer | None = None,
    resume: bool = False,
    partitions: int | None = None,
) -> ComponentsResult:
    """Component labels for an undirected edge DataFrame ``(src, dst)``.

    Returns (id, component) where component = min id of the node's
    component. ``nodes`` optionally supplies isolated vertices.

    Loop discipline (same as :func:`pagerank`): the shuffle width is sized
    from the measured edge count (~250k rows/partition) and AQE is frozen
    for the fixed-shape round plans — both pinned on the loop's own
    ``newSession()`` of the caller's SparkContext, so the caller's conf is
    never mutated and concurrent planning on it is unaffected.
    """
    caller = edges.sparkSession
    spark = loop_session(caller)
    edges = rebind(edges, spark)
    if nodes is not None:
        nodes = rebind(nodes, spark)
    # Ids keep their native type (numeric min for longs, lexicographic min
    # for strings): long comparisons and shuffles are several times cheaper
    # than strings at 10^9-vertex scale, and every step below only needs an
    # orderable, hashable id type.
    e = (
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )

    start_round = 0
    if resume and checkpointer is not None and checkpointer.latest() is not None:
        start_round = checkpointer.latest()
        e = checkpointer.load(spark, start_round)
        prev_sig = (
            checkpointer.load_metrics(start_round).get("sig_cnt"),
            checkpointer.load_metrics(start_round).get("sig_hash"),
        )
    else:
        e, prev_sig = _materialize_with_sig(e, 0, checkpointer)
        if checkpointer is not None:
            from bluegraph_spark.operators.pagerank import _update_metrics

            _update_metrics(
                checkpointer, 0, {"sig_cnt": prev_sig[0], "sig_hash": prev_sig[1]}
            )

    conf_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if partitions:
        n_parts = int(partitions)
    else:
        # prev_sig[0] may be None on resume from a checkpoint whose metrics
        # predate the signature record; fall back to the session width then.
        cnt0 = prev_sig[0] if prev_sig[0] is not None else 0
        n_parts = (
            loop_partitions(int(cnt0), conf_parts)
            if cnt0
            else conf_parts
        )

    history: list[dict[str, Any]] = []
    converged = False
    rnd = start_round
    # Freeze the plan for the loop: the round plan is fixed-shape over a
    # small known-size state, so AQE's per-stage driver re-planning is
    # pure serial overhead, and the shuffle width should match the data,
    # not the session default. (At sandbox scale the win is modest —
    # ~16s -> ~11s for cc_orders at sf0.1, the floor being per-stage
    # fixed costs — but at cluster scale a mis-sized width is the
    # difference between 1 task wave and thousands of empty tasks.)
    # Both pins land on the loop's private session and die with it.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))
    round_plan: str | None = None
    round_exchanges: int | None = None
    while rnd < max_rounds:
        rnd += 1
        t0 = time.time()
        # Convergence signature rides the materialization job as observed
        # metrics — no second pass over the edges.
        e_round, caches = _cc_round(e, n_parts)
        # try/finally: a job failure or checkpointer.save error mid-round
        # must not leave the round's persisted working sets in the
        # SparkContext-shared cache manager forever (the caller's other work
        # would see the leaked executor memory).
        try:
            if round_plan is None:
                from bluegraph_spark.plans.planinfo import executed_exchange_count

                round_plan = e_round._jdf.queryExecution().executedPlan().toString()
                round_exchanges = executed_exchange_count(e_round)
            e_new, sig = _materialize_with_sig(e_round, rnd, checkpointer)
        finally:
            for c in caches:
                c.unpersist()
        history.append(
            {
                "round": rnd,
                "superstep_sec": round(time.time() - t0, 3),
                "edges": sig[0],
                "hash": sig[1],
            }
        )
        if checkpointer is not None:
            from bluegraph_spark.operators.pagerank import _update_metrics

            _update_metrics(
                checkpointer, rnd, {"sig_cnt": sig[0], "sig_hash": sig[1]}
            )
        # e_new is materialized (the signature job ran): free the superseded
        # round's checkpoint blocks now instead of waiting for periodic GC.
        release_local_checkpoint(e)
        e = e_new
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig

    # stars: (a=child, b=root). Roots + isolated nodes label themselves.
    members = e.select(F.col("a").alias("id"), F.col("b").alias("component"))
    roots = e.select(F.col("b").alias("id")).distinct().withColumn(
        "component", F.col("id")
    )
    comp = members.unionByName(roots)
    if nodes is not None:
        id_type = dict(edges.dtypes).get("src", "string")
        vs = nodes.select(
            F.col(nodes.columns[0]).cast(id_type).alias("id")
        ).distinct()
        isolated = vs.join(comp.select("id"), "id", "left_anti").withColumn(
            "component", F.col("id")
        )
        comp = comp.unionByName(isolated)
    # a node can appear in members only once at convergence; distinct guards
    # the non-converged (max_rounds hit) case
    comp = comp.groupBy("id").agg(F.min("component").alias("component"))
    return ComponentsResult(
        rebind(comp, caller), rnd, converged, history, round_plan, round_exchanges
    )
