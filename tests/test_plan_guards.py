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


def test_lpa_superstep_exchange_budget(graph, no_broadcast):
    # superstep 1 runs on labels ≡ ids, which lets the planner elide the
    # scores exchange through the alias equivalence: budget is 1 there and
    # at most 2 on later supersteps — guard the snapshot at 1
    res = label_propagation(graph, weight_col="w", max_iter=2, partitions=4)
    assert res.superstep_exchanges == 1, res.superstep_plan
    assert "InMemoryTableScan" in res.superstep_plan
    plan = res.superstep_plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
