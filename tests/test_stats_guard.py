"""Regression tests for the Catalyst-stats compounding cliff (round 4).

``localCheckpoint`` snapshots the optimized plan's estimated sizeInBytes
into the LogicalRDD's originStats; a superstep plan referencing the
previous checkpoint k times snapshots (prev)^k — the estimate's DIGIT
COUNT multiplies per iteration and the driver ends up doing BigInteger
arithmetic on million-digit numbers during planning (measured: louvain
level-2 rounds of 5.8s → 8.4s → 22.3s → 140s on a 7-node graph). The
stats guard resets the base via persist → count → checkpoint-of-a-fresh-
Dataset whenever the estimate crosses a digit threshold."""

import pytest
from pyspark.sql import functions as F

from bluegraph_spark.plans.stats_guard import (
    DEFAULT_DIGIT_LIMIT,
    estimate_digits,
    stats_safe_local_checkpoint,
)
from tests.graph_fixtures import karate, nx_to_edges_df


def test_guard_bounds_digits_under_compounding(spark):
    """Five rounds of a k=3 self-referencing join loop: unguarded digits
    would grow ~3x/round past the limit; the guard keeps every checkpoint's
    carried estimate bounded and the data identical."""
    lab = spark.range(50).select("id", (F.col("id") % 5).alias("c"))
    lab = stats_safe_local_checkpoint(lab)
    expected = {(i, i % 5) for i in range(50)}
    for _ in range(5):
        agg = lab.groupBy("c").agg(F.count("*").alias("n"))
        big = (
            lab.join(agg, "c")
            .join(agg.withColumnRenamed("n", "n2"), "c")
            .crossJoin(F.broadcast(lab.agg(F.count("*").alias("tot"))))
            .select("id", "c")
        )
        lab = stats_safe_local_checkpoint(big)
        assert estimate_digits(lab) <= max(DEFAULT_DIGIT_LIMIT, 60), (
            "guarded checkpoint carried a compounded estimate"
        )
    assert {(r["id"], r["c"]) for r in lab.collect()} == expected


def test_pagerank_long_run_stats_bounded(spark):
    """An 18-superstep PageRank (well past the 5-superstep bench runs that
    masked the cliff) must complete with a bounded final-state estimate —
    before the guard, digits doubled per superstep (~15·2^18 by the end)."""
    from bluegraph_spark.operators.pagerank import pagerank

    g = karate()
    e = nx_to_edges_df(spark, g, weight="strength")
    res = pagerank(e, weight_col="strength", tol=0.0, max_iter=18)
    assert res.iterations == 18
    assert estimate_digits(res.ranks) < 2_000
    total = res.ranks.agg(F.sum("rank")).collect()[0][0]
    assert total == pytest.approx(1.0, abs=1e-6)


def test_guard_noop_below_limit_pass_through(spark):
    df = spark.range(10).select("id")
    out = stats_safe_local_checkpoint(df)
    assert {r["id"] for r in out.collect()} == set(range(10))
    assert estimate_digits(out) < 10
