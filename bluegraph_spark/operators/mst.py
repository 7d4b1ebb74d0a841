"""Minimum spanning forest via distributed Borůvka rounds.

Reference semantics: ``PathFinder.minimum_spanning_tree(distance)`` =
``nx.minimum_spanning_tree(graph, weight=distance)``
(/root/reference/bluegraph/backends/networkx/analyse/paths.py:100-131),
used by the reference production pipeline to reduce graphs for
visualization (/root/reference/cord19kg/utils.py:724-727). NetworkX's
Kruskal breaks weight ties by edge iteration order (non-deterministic for
a distributed engine); the engine spec totally orders edges by
``(weight, src, dst)``, under which the minimum spanning forest is UNIQUE
— so the output is deterministic, engine-independent, and differentially
testable against an independent Kruskal implementation.

Algorithm (Borůvka, the textbook distributed MST): every component picks
its minimum incident cross-component edge under the total order (a
``min`` over an edge struct — partial-aggregating groupBy, skew-safe);
the picked edges join components pairwise-or-more, so components at least
halve every round (≤ log2(V) rounds). Component contraction reuses the
engine's large-star/small-star ``connected_components`` operator on the
picked-edge graph — the same code path that carries the 30M-edge stress
evidence — and the surviving cross-component edge set (which shrinks
monotonically) is re-labeled through the new component map each round.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bluegraph_spark.plans.isolation import loop_session, rebind
from bluegraph_spark.plans.stats_guard import stats_safe_local_checkpoint


@dataclass
class MSTResult:
    tree_edges: DataFrame  # (src, dst, weight) — the forest's edges
    rounds: int
    converged: bool
    history: list[dict[str, Any]] = field(default_factory=list)


def minimum_spanning_forest(
    edges: DataFrame,
    weight_col: str = "weight",
    max_rounds: int = 40,
) -> MSTResult:
    """Minimum spanning forest of undirected ``(src, dst, weight)``.

    Ties broken by the ``(weight, src, dst)`` total order (canonical
    src < dst form), making the forest unique hence deterministic.
    Parallel edges keep their minimum weight; self-loops are dropped
    (never in an MST).
    """
    caller = edges.sparkSession
    spark = loop_session(caller)
    edges = rebind(edges, spark)
    w = F.col(weight_col).cast("double")
    # canonical undirected form, min weight per parallel pair
    canon = (
        edges.select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
            w.alias("w"),
        )
        .filter(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.min("w").alias("w"))
    )
    rem = stats_safe_local_checkpoint(canon)

    # comp: (id, comp) over vertices incident to remaining edges; vertices
    # with no surviving cross edge never change again, so tracking only the
    # active frontier keeps the per-round state shrinking with the forest.
    comp = stats_safe_local_checkpoint(
        rem.select(F.col("u").alias("id"))
        .unionByName(rem.select(F.col("v").alias("id")))
        .distinct()
        .select("id", F.col("id").alias("comp"))
    )

    forest_parts: list[DataFrame] = []
    history: list[dict[str, Any]] = []
    converged = False
    rnd = 0
    while rnd < max_rounds:
        rnd += 1
        t0 = time.time()
        ec = (
            rem.join(comp.select(F.col("id").alias("u"), F.col("comp").alias("cu")), "u")
            .join(comp.select(F.col("id").alias("v"), F.col("comp").alias("cv")), "v")
            .filter(F.col("cu") != F.col("cv"))
        )
        ec = stats_safe_local_checkpoint(ec)
        n_cross = ec.count()
        if n_cross == 0:
            converged = True
            history.append(
                {"round": rnd, "superstep_sec": round(time.time() - t0, 3),
                 "cross_edges": 0, "picked": 0}
            )
            break
        # every component's minimum incident edge under (w, u, v); struct
        # min gives the total-order tie-break in one partial aggregation
        edge_struct = F.struct(
            F.col("w"), F.col("u"), F.col("v"), F.col("cu"), F.col("cv")
        )
        offers = ec.select(F.col("cu").alias("c"), edge_struct.alias("e")).unionByName(
            ec.select(F.col("cv").alias("c"), edge_struct.alias("e"))
        )
        picked = (
            offers.groupBy("c")
            .agg(F.min("e").alias("e"))
            .select("e.u", "e.v", "e.w", "e.cu", "e.cv")
            .distinct()  # both endpoints' components may pick the same edge
        )
        picked = stats_safe_local_checkpoint(picked)
        n_picked = picked.count()
        forest_parts.append(picked.select("u", "v", "w"))
        # contract: CC over the picked component graph gives each merged
        # cluster its min component id; unmatched components keep theirs
        from bluegraph_spark.operators.components import connected_components

        cc = connected_components(
            picked.select(F.col("cu").alias("src"), F.col("cv").alias("dst"))
        )
        mapping = cc.components.select(
            F.col("id").alias("comp"), F.col("component").alias("_new")
        )
        comp = stats_safe_local_checkpoint(
            comp.join(mapping, "comp", "left").select(
                "id", F.coalesce("_new", "comp").alias("comp")
            )
        )
        rem = ec.select("u", "v", "w")
        history.append(
            {"round": rnd, "superstep_sec": round(time.time() - t0, 3),
             "cross_edges": n_cross, "picked": n_picked}
        )

    if forest_parts:
        out = forest_parts[0]
        for p in forest_parts[1:]:
            out = out.unionByName(p)
        out = out.distinct()
    else:
        out = rem.limit(0)
    out = out.select(
        F.col("u").alias("src"), F.col("v").alias("dst"), F.col("w").alias("weight")
    )
    return MSTResult(rebind(out, caller), rnd, converged, history)
