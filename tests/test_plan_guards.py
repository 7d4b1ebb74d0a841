"""Physical-plan regression guards for the iterative superstep loops.

The loop design's load-bearing property is its exchange budget: PageRank
runs ONE shuffle per superstep (the message groupBy — the CSR-blocked edge
cache and the co-partitioned state join are exchange-free), LPA runs two
(per-(vertex, label) score shuffle + per-vertex argmax shuffle). A refactor
that silently adds an exchange multiplies cluster network traffic per
superstep; these tests pin the budget via the plan snapshot the operators
record on their first superstep.
"""

import pytest
from pyspark.sql import functions as F

from bluegraph_spark.operators.lpa import label_propagation
from bluegraph_spark.operators.pagerank import pagerank


@pytest.fixture(scope="module")
def graph(spark):
    n = 300
    rows = [(i, (i * 7 + 1) % n, float(i % 5 + 1)) for i in range(n)] + [
        (i, (i * 3 + 2) % n, 1.0) for i in range(n)
    ]
    return spark.createDataFrame(rows, "src long, dst long, w double")


@pytest.fixture()
def no_broadcast(spark):
    """Pin the join strategy the operators see at scale: on the toy test
    graph the planner would broadcast the edge cache, which changes the
    exchange budget being guarded."""
    before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", before)


def test_pagerank_superstep_is_single_exchange(graph, no_broadcast):
    res = pagerank(graph, weight_col="w", tol=0.0, max_iter=2, partitions=4)
    assert res.superstep_exchanges == 1, res.superstep_plan
    # the CSR-blocked edge cache is read through InMemoryTableScan (its
    # partitioning/ordering is what makes the join exchange-free)
    assert "InMemoryTableScan" in res.superstep_plan
    # no Python evaluation anywhere in the loop
    plan = res.superstep_plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_cc_round_exchange_budget(spark, no_broadcast):
    """Inside the loop (AQE frozen on the private session), a CC round's
    output plan executes ZERO shuffles beyond the two cached working-set
    layouts: every min-aggregation, redirect join, and the final distinct
    reads the clustered caches, so the per-round shuffle total is the two
    cache builds. (The naive unshared formulation executed 10 shuffles per
    round — measured before the round was restructured.)"""
    from bluegraph_spark.operators.components import connected_components

    n = 500
    e = spark.range(n).select(
        F.col("id").alias("src"), ((F.col("id") * 13 + 7) % n).alias("dst")
    )
    res = connected_components(e, max_rounds=3)
    # at most the final distinct shuffles (it elides entirely when the
    # planner can prove the union's clustering)
    assert res.round_exchanges <= 1, res.round_plan
    # the round reads its working sets through the caches, not by recompute
    assert res.round_plan.count("InMemoryTableScan") >= 2


def test_lpa_superstep_exchange_budget(graph, no_broadcast):
    # superstep 1 runs on labels ≡ ids, which lets the planner elide the
    # scores exchange through the alias equivalence: budget is 1 there and
    # at most 2 on later supersteps — guard the snapshot at 1
    res = label_propagation(graph, weight_col="w", max_iter=2, partitions=4)
    assert res.superstep_exchanges == 1, res.superstep_plan
    assert "InMemoryTableScan" in res.superstep_plan
    plan = res.superstep_plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_plan_has_python_stage_detects_all_udf_shapes(spark):
    """The auto-eager discriminator must see every way Python enters a plan
    (group-map, map-partitions, vectorized scalar, row-at-a-time scalar)
    and stay False on pure-Catalyst plans — a false negative re-runs an
    Arrow aggregator on every edge-table branch (the round-4 driver-bench
    regression on cooc_agg_suppliers); a false positive forces a pointless
    persist on the hot pure-SQL path."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf, udf

    from bluegraph_spark.plans.planinfo import plan_has_python_stage

    df = spark.range(10).select(
        F.col("id").cast("string").alias("node"), F.lit("f").alias("factor")
    )
    assert not plan_has_python_stage(df)
    assert not plan_has_python_stage(
        df.groupBy("node").agg(F.count("*").alias("c"))
    )

    def emit(key, pdf):
        return pd.DataFrame({"node": [str(key[0])], "factor": ["x"]})

    assert plan_has_python_stage(
        df.groupBy("node").applyInPandas(emit, schema="node string, factor string")
    )
    assert plan_has_python_stage(
        df.mapInPandas(lambda it: it, schema="node string, factor string")
    )

    @pandas_udf("string")
    def up(s: pd.Series) -> pd.Series:
        return s.str.upper()

    assert plan_has_python_stage(df.select(up("node").alias("node"), "factor"))
    assert plan_has_python_stage(
        df.select(udf(lambda x: x, "string")("node").alias("node"), "factor")
    )


def test_cooccurrence_auto_eager_on_python_occurrence(spark):
    """eager=None goes eager (localCheckpointed result — LogicalRDD plan,
    single execution of the Python stage) for an applyInPandas occurrence
    table, and stays lazy for a pure-Catalyst one."""
    import pandas as pd

    from bluegraph_spark.operators.cooccurrence import (
        cooccurrence_edges,
        occurrences_from_aggregator,
    )

    # range-based source so the only possible LogicalRDD root is an eager
    # localCheckpoint (createDataFrame would itself be a LogicalRDD leaf)
    df = spark.range(20).select(
        F.concat(F.lit("s"), (F.col("id") % 4).cast("string")).alias("node"),
        F.concat(F.lit("f"), (F.col("id") % 5).cast("string")).alias("factor"),
    )

    lazy_edges = cooccurrence_edges(df, statistics=["frequency"])
    assert "LogicalRDD" not in lazy_edges._jdf.queryExecution().analyzed().toString()

    occ = occurrences_from_aggregator(df, "node", lambda pdf: set(pdf["factor"]))
    eager_edges = cooccurrence_edges(occ, statistics=["frequency"])
    assert (
        eager_edges._jdf.queryExecution()
        .analyzed()
        .toString()
        .strip()
        .startswith("LogicalRDD")
    )
    # same result either way
    a = sorted(map(tuple, lazy_edges.collect()))
    b = sorted(map(tuple, eager_edges.collect()))
    assert a == b
