"""Co-occurrence edge-table builder — the engine's core ingest operator.

Reference semantics: ``CooccurrenceGenerator``
(/root/reference/bluegraph/preprocess/generators.py:155-431): two nodes
co-occur when their *factor sets* intersect (factors = values of a set-valued
node property, or shared edge targets of a given edge type). For every
unordered co-occurring pair the reference emits one edge with the common
factors and statistics frequency / PPMI / NPMI
(generators.py:76-138), where

- ``frequency(s,t)`` = |factors(s) ∩ factors(t)|
- ``s_freq`` = |factors(s)|
- ``total_factor_instances`` defaults to |∪ factors| (generators.py:363-376).

The reference scans all n(n-1)/2 pairs with a multiprocessing pool
(generators.py:272-328). Spark-first replacement: represent occurrences as a
long table ``(node, factor)`` and compute co-occurrence as a **self-equi-join
on factor** followed by a pair aggregation — the shuffle and AQE replace the
worker pool, and only genuinely co-occurring pairs are ever materialized.

Scale notes (100 TB design):
- A factor occurring in f files yields f(f-1)/2 join rows: the classic skew
  site. Mitigations, all explicit knobs: ``factor_freq_cap`` (drop factors
  above a document-frequency cap — semantically the reference's
  min-occurrence / top-n vocabulary pruning, cord19kg/utils.py:618-651),
  AQE skew-join (on by default in the session), and ``salt`` (split each
  heavy factor group across S salted sub-joins; result-identical, tested).
- ``common_factors`` materializes the intersection sets and is opt-in only:
  shuffling per-pair factor arrays at 10^12-file scale is prohibitive
  (SURVEY.md §7.5).
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bluegraph_spark.functions.mi import mutual_information_col
from bluegraph_spark.plans.planinfo import plan_has_python_stage

STATISTICS = ("frequency", "ppmi", "npmi", "expected", "pmi2", "pmi3")

# Above this per-factor occurrence count, the salted path (when salt is set)
# takes over; below it, the plain self-join is strictly cheaper.
DEFAULT_SALT_THRESHOLD = 10_000


def occurrences_from_node_property(
    nodes: DataFrame, id_col: str = "id", prop_col: str = "factors"
) -> DataFrame:
    """(node, factor) long table from a set-valued node property.

    Mirrors ``generate_from_nodes(node_property=...)``
    (generators.py:352-383); the array column is exploded and de-duplicated
    (reference cells are Python sets).
    """
    return (
        nodes.select(
            F.col(id_col).cast("string").alias("node"),
            F.explode(prop_col).alias("factor"),
        )
        .select("node", F.col("factor").cast("string").alias("factor"))
        .distinct()
    )


def occurrences_from_edges(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    type_col: str | None = None,
    edge_type: str | None = None,
    reverse: bool = False,
) -> DataFrame:
    """(node, factor) table from typed edges: factor = shared edge target.

    Mirrors ``generate_from_edges`` (generators.py:385-431); ``reverse``
    swaps the roles of source and target (generators.py:185-195).
    """
    if type_col is not None and edge_type is not None:
        edges = edges.filter(F.col(type_col) == edge_type)
    node, factor = (dst_col, src_col) if reverse else (src_col, dst_col)
    return edges.select(
        F.col(node).cast("string").alias("node"),
        F.col(factor).cast("string").alias("factor"),
    ).distinct()


def occurrences_from_aggregator(
    df: DataFrame,
    node_col: str,
    factor_aggregator,
) -> DataFrame:
    """(node, factor) table from a custom per-node factor aggregator.

    The reference's ``factor_aggregator`` / ``aggregation_function`` hook
    (generators.py:88-104, 176-195; exercised by cord19kg's
    ``aggregate_paragraphs``, tests/preprocess/test_co_occurrence_generators.py:88-97):
    an arbitrary Python function applied to all of a node's rows that returns
    the node's factor collection. Spark-side this is an ``applyInPandas``
    group map — the aggregator sees the node's full group as a pandas
    DataFrame and returns any iterable of factors; Arrow moves the batches,
    and the shuffle is one hash partitioning on the node key.

    Use the pure-Catalyst builders (:func:`occurrences_from_node_property`,
    :func:`occurrences_from_edges`) whenever the aggregation is expressible
    as explode/union — this hook is the escape hatch for genuinely custom
    Python aggregation logic, per the engine's UDF policy (SURVEY §2.12).
    """
    import pandas as pd

    def emit(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        factors = factor_aggregator(pdf)
        uniq = sorted({str(f) for f in factors})
        return pd.DataFrame({"node": [str(key[0])] * len(uniq), "factor": uniq})

    return df.groupBy(F.col(node_col)).applyInPandas(
        emit, schema="node string, factor string"
    )


def keep_top_n_nodes(
    occ: DataFrame,
    n: int,
    min_occurrences: int | None = None,
) -> DataFrame:
    """Top-n frequent-vocabulary pruning of a (node, factor) table.

    The reference's primary scale knob: keep only the ``n`` nodes with the
    largest factor-set size before edge generation
    (``nlargest(n_most_frequent, freq)``, cord19kg/utils.py:646-651 — "10,000
    most frequent entities", README.rst:177-179), optionally dropping nodes
    with fewer than ``min_occurrences`` factors first (utils.py:618-621).

    Ties at the cutoff break deterministically by node id ascending (pandas
    ``nlargest`` keeps first-encountered, which depends on frame order; a
    distributed engine must pick a stable total order instead).

    The surviving vocabulary is at most n rows — broadcast into the semi-join
    for any n a co-occurrence analysis would use, so pruning costs one
    aggregation and no extra shuffle of the occurrence table.
    """
    nf = occ.groupBy("node").agg(F.count("*").alias("_nf"))
    if min_occurrences is not None:
        nf = nf.filter(F.col("_nf") >= min_occurrences)
    top = nf.orderBy(F.desc("_nf"), F.asc("node")).limit(n).select("node")
    # Broadcast hint only while the vocabulary is safely executor-resident:
    # 1M string ids is tens of MB serialized; beyond that the hint would
    # bypass autoBroadcastJoinThreshold and risk driver/executor OOM, so let
    # AQE pick the strategy from the measured size instead (the semi-join is
    # correct either way).
    if n <= 1_000_000:
        top = F.broadcast(top)
    return occ.join(top, "node", "left_semi")


def _array_pairs(occ: DataFrame) -> DataFrame:
    """(s, t, factor) with s < t via per-factor adjacency arrays.

    One aggregation (``collect_set`` dedups duplicate occurrence rows, so
    no separate ``distinct`` shuffle is needed) and a codegen'd nested
    ``transform`` emit each factor's node pairs in place — one exchange of
    the occurrence table instead of the self-join's distinct + two join
    exchanges + sort-merge sorts. ``array_sort`` is the same lexicographic
    (string) order as the join's ``a.node < b.node`` predicate, so the pair
    multiset is identical. Skew caveat: a factor with f nodes emits its
    f(f-1)/2 pairs inside ONE task, so unbounded hot factors need
    ``factor_freq_cap`` (drop) or ``salt`` (which routes heavy factors
    through the AQE-splittable salted join below) — the same two knobs the
    self-join form documented, since 10^10-pair factors are infeasible on
    any path.
    """
    grouped = occ.groupBy("factor").agg(
        F.array_sort(F.collect_set("node")).alias("_ns")
    )
    return grouped.select(
        "factor",
        F.explode(
            F.flatten(
                F.transform(
                    "_ns",
                    lambda x, i: F.transform(
                        F.slice("_ns", i + 2, F.size("_ns")),
                        lambda y: F.struct(x.alias("s"), y.alias("t")),
                    ),
                )
            )
        ).alias("_p"),
    ).select(F.col("_p.s").alias("s"), F.col("_p.t").alias("t"), "factor")


def _join_pairs(occ: DataFrame) -> DataFrame:
    """(s, t, factor) with s < t via the factor self-equi-join."""
    a = occ.alias("a")
    b = occ.alias("b")
    return a.join(
        b,
        (F.col("a.factor") == F.col("b.factor"))
        & (F.col("a.node") < F.col("b.node")),
    ).select(
        F.col("a.node").alias("s"),
        F.col("b.node").alias("t"),
        F.col("a.factor").alias("factor"),
    )


def _pair_instances(
    occ: DataFrame,
    salt: int | None,
    salt_threshold: int,
    strategy: str = "join",
) -> DataFrame:
    """One row per (s, t, factor) with s < t.

    ``strategy`` picks the plain-path formulation (see
    ``cooccurrence_edges`` for the trade-off); with ``salt`` set, factors
    whose occurrence count exceeds ``salt_threshold`` are joined through S
    salted sub-joins: the left side gets a deterministic salt from the
    node id, the right side is replicated to every salt value, so every
    qualifying pair is still produced exactly once while the heaviest
    factor group is split across S tasks.
    """
    plain = _array_pairs if strategy == "array" else _join_pairs
    if not salt:
        return plain(occ)

    fcount = occ.groupBy("factor").agg(F.count("*").alias("_fc"))
    occ_f = occ.join(fcount, "factor")
    light = occ_f.filter(F.col("_fc") <= salt_threshold).drop("_fc")
    heavy = occ_f.filter(F.col("_fc") > salt_threshold).drop("_fc")

    light_pairs = plain(light.select("node", "factor"))

    ha = heavy.withColumn("_salt", F.pmod(F.xxhash64("node"), F.lit(salt))).alias("a")
    hb = (
        heavy.withColumn(
            "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<long>"))
        )
    ).alias("b")
    heavy_pairs = ha.join(
        hb,
        (F.col("a.factor") == F.col("b.factor"))
        & (F.col("a._salt") == F.col("b._salt"))
        & (F.col("a.node") < F.col("b.node")),
    ).select(
        F.col("a.node").alias("s"),
        F.col("b.node").alias("t"),
        F.col("a.factor").alias("factor"),
    )
    return light_pairs.unionByName(heavy_pairs)


def cooccurrence_edges(
    occ: DataFrame,
    statistics: Sequence[str] = ("frequency",),
    total_factor_instances: int | None = None,
    keep_common_factors: bool = False,
    factor_freq_cap: int | None = None,
    min_frequency: int | None = None,
    prune_zero_mi: str | None = None,
    salt: int | None = None,
    salt_threshold: int = DEFAULT_SALT_THRESHOLD,
    limit: int | None = None,
    eager: bool | None = None,
    pair_strategy: str = "join",
) -> DataFrame:
    """Build the co-occurrence edge table from a (node, factor) table.

    Returns ``(src, dst, <statistics...>[, common_factors])`` with
    ``src < dst`` (canonical undirected form; the reference's
    source-index < target-index ordering, generators.py:204, reduces to the
    same unordered pair set).

    ``prune_zero_mi``: name of a computed MI column; rows with value <= 0 are
    dropped (reference cord19kg/utils.py:661-662).
    ``limit``: keep at most n edges — like the reference's early-exit limit
    (generators.py:238-243) the *choice* of edges is not deterministic.

    ``eager=None`` (default) auto-detects: lazy unless the occurrence
    plan contains a Python/Arrow evaluation stage (``applyInPandas`` /
    ``mapInPandas`` / pandas UDF — the :func:`occurrences_from_aggregator`
    hook), in which case it goes eager. A Python stage is the one upstream
    cost the "re-scan beats persist" argument below never covers: the lazy
    NPMI/frequency plan re-executes the occurrence expression on up to 5
    branches, and re-running an Arrow-shuffled Python aggregator 5× is
    pure loss at every scale (measured on the driver bench: the round-4
    lazy flip regressed the aggregator query ~25% while speeding up every
    pure-Catalyst one). The detection reads the ANALYZED logical plan —
    no job runs.

    ``eager=False``: return the fully lazy plan — no persist, no
    action; the total-factor count is folded in as a broadcast scalar. The
    lazy NPMI plan re-executes the occurrence expression on up to 5 plan
    branches (both self-join sides, the two marginal joins, the total-
    factor count; no ``ReusedExchange`` appears under AQE). Measured: at
    sf0.1 suite scale lazy wins decisively (3.2s vs 6.8–11.3s eager —
    round 3's regression), while the 30 M-occurrence-row stress A/B has
    FLIPPED across runs on the shared VM (lazy 53.7 vs eager 122.0 one
    day, eager 117.9 vs lazy 186.7 the next) — at byte-sizes one box can
    hold, the persist-vs-rescan trade is inside co-tenant noise, which is
    exactly why the default discriminator is the Python-stage test above
    and not a size threshold.

    ``eager=True`` persists the deduplicated occurrence table, materializes
    the edge table (``localCheckpoint``), and releases the cache before
    returning. Pass it when the occurrence expression is SCAN-DOMINATED —
    the 10^12-file corpus case, where ``occurrences_from_*`` reads wide
    document text and emits a far smaller (node, factor) table: there the
    5 branch re-scans each re-read the full corpus and one shared pass is
    the only sane plan. The discriminator is source-scan cost vs derived-
    table size, which no local benchmark at parquet-page-cache scale can
    exhibit — hence a caller knob with both measurements documented, not a
    size-threshold heuristic (round 4 tried one; both of its regimes were
    measurably wrong).
    """
    for s in statistics:
        if s not in STATISTICS:
            raise ValueError(f"unknown statistic {s!r}; supported: {STATISTICS}")

    if eager is None:
        eager = plan_has_python_stage(occ)

    occ_raw = occ.select(
        F.col("node").cast("string").alias("node"),
        F.col("factor").cast("string").alias("factor"),
    )
    occ = occ_raw.distinct()

    if factor_freq_cap is not None:
        fc = occ.groupBy("factor").agg(F.count("*").alias("_fc"))
        occ = (
            occ.join(fc.filter(F.col("_fc") <= factor_freq_cap), "factor")
            .drop("_fc")
        )

    if eager:
        occ = occ.persist()

    needs_mi = any(s != "frequency" for s in statistics)
    # Pair-generation strategy (``pair_strategy``): "join" (default) runs
    # the classic factor self-equi-join over the deduplicated occurrence
    # table — codegen'd pair generation, AQE-splittable, the right shape
    # when factors hold MANY nodes (dense factors: a 30-node factor emits
    # 435 pairs, and the nested array transform below is interpreted).
    # "array" aggregates each factor's node set and emits pairs with a
    # nested transform — one exchange of the occurrence table instead of
    # three, measurably faster when factors hold FEW nodes (sparse
    # factors, e.g. ≤ ~8 nodes each; measured at sf0.1: parts graph
    # (≈4 nodes/factor) 1.8s → 1.35s, supplier graph (≈30 nodes/factor)
    # 3.6s → 5.5s the other way). The pair multiset is identical.
    if pair_strategy not in ("join", "array"):
        raise ValueError("pair_strategy must be 'join' or 'array'")
    # On the lazy, uncapped, unsalted ARRAY path the pair branch reads the
    # RAW projection: ``collect_set`` inside ``_array_pairs`` dedups
    # duplicate occurrence rows itself, so the pair branch skips the
    # distinct's exchange entirely. Join/capped/salted paths need the
    # deduplicated (and capped) table, and the eager path shares the
    # persisted one.
    pairs_occ = (
        occ_raw
        if (
            pair_strategy == "array"
            and not eager
            and factor_freq_cap is None
            and not salt
        )
        else occ
    )
    pairs = _pair_instances(pairs_occ, salt, salt_threshold, pair_strategy)

    aggs = [F.count("*").alias("frequency")]
    if keep_common_factors:
        aggs.append(F.sort_array(F.collect_set("factor")).alias("common_factors"))
    edges = pairs.groupBy(F.col("s").alias("src"), F.col("t").alias("dst")).agg(*aggs)

    if needs_mi:
        node_freq = occ.groupBy("node").agg(F.count("*").alias("_nf"))
        edges = (
            edges.join(node_freq.withColumnRenamed("node", "src"), "src")
            .withColumnRenamed("_nf", "_s_freq")
            .join(node_freq.withColumnRenamed("node", "dst"), "dst")
            .withColumnRenamed("_nf", "_t_freq")
        )
        if total_factor_instances is not None:
            total = F.lit(total_factor_instances)
        else:
            # Reference default: |union of all factor sets|
            # (generators.py:363-376) — folded into the plan as a broadcast
            # 1-row scalar instead of a plan-build-time count() action, so
            # building the edge table stays a single job.
            totals = occ.agg(
                F.countDistinct("factor").alias("_total_factors")
            )
            edges = edges.crossJoin(F.broadcast(totals))
            total = F.col("_total_factors")
        for stat in statistics:
            if stat == "frequency":
                continue
            mitype = None if stat == "ppmi" else ("normalized" if stat == "npmi" else stat)
            edges = edges.withColumn(
                stat,
                mutual_information_col(
                    F.col("frequency"), F.col("_s_freq"), F.col("_t_freq"), total, mitype
                ),
            )
        edges = edges.drop("_s_freq", "_t_freq", "_total_factors")

    out_cols = ["src", "dst"] + [s for s in statistics]
    if keep_common_factors:
        out_cols.append("common_factors")
    edges = edges.select(*out_cols)

    if min_frequency is not None:
        edges = edges.filter(F.col("frequency") >= min_frequency)
    if prune_zero_mi is not None:
        edges = edges.filter(F.col(prune_zero_mi) > 0)
    if limit is not None:
        edges = edges.limit(limit)
    if eager:
        edges = edges.localCheckpoint()
        occ.unpersist()
    return edges


def cooccurrence_edges_multiset(
    occ_counts: DataFrame,
    min_frequency: int | None = None,
) -> DataFrame:
    """Multiset co-occurrence: frequency = Σ_f min(count_s(f), count_t(f)).

    Reference ``safe_intersection`` list branch
    (/root/reference/bluegraph/core/utils.py:59-74): when factor collections
    are lists, the intersection is a multiset with per-key min counts.
    ``occ_counts`` has columns (node, factor, cnt).
    """
    a, b = occ_counts.alias("a"), occ_counts.alias("b")
    pairs = a.join(
        b,
        (F.col("a.factor") == F.col("b.factor")) & (F.col("a.node") < F.col("b.node")),
    ).select(
        F.col("a.node").alias("src"),
        F.col("b.node").alias("dst"),
        F.least(F.col("a.cnt"), F.col("b.cnt")).alias("_m"),
    )
    edges = pairs.groupBy("src", "dst").agg(F.sum("_m").alias("frequency"))
    if min_frequency is not None:
        edges = edges.filter(F.col("frequency") >= min_frequency)
    return edges
