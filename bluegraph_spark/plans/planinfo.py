"""Physical-plan introspection helpers (plan-guard evidence).

``executed_exchange_count`` walks the executed SparkPlan tree and counts
the shuffle exchanges the plan will actually run, excluding everything
behind an ``InMemoryTableScan``: the cached relation stores its build plan
(including the exchanges that built it) and prints it in ``toString``, but
a scan of the materialized cache re-executes none of it — substring-
counting "Exchange" over the plan string therefore overcounts, which is
exactly the mistake the iterative loops' plan-guard tests must not make.

Semantics: the count is the **steady-state** shuffle cost of the plan —
exchanges behind an ``InMemoryTableScan`` are excluded whether or not the
cache is materialized yet, so a snapshot taken before the first execution
does NOT include the one-time cache-build exchanges that first run also
executes (e.g. a CC round's two ``repartition`` cache builds, or
PageRank's CSR-layout shuffle). That is deliberate: the loops take the
snapshot on superstep/round 1 while the per-superstep guard pins the cost
every *subsequent* iteration pays, which is what scales with iteration
count. Bench output and BENCH/BASELINE.md label the recorded number
"steady-state executed shuffles per superstep" accordingly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def executed_exchange_count(df: DataFrame) -> int:
    def walk(node) -> int:
        cls = node.getClass().getSimpleName()
        if cls.startswith("InMemoryTableScan"):
            return 0
        if cls.startswith("AdaptiveSparkPlan"):
            # leafless wrapper: descend into the current physical plan
            # (the initial plan pre-execution, the final plan after)
            return walk(node.executedPlan())
        if cls.endswith("QueryStageExec"):
            return walk(node.plan())
        n = 1 if cls.startswith("ShuffleExchange") else 0
        it = node.children().iterator()
        while it.hasNext():
            n += walk(it.next())
        return n

    return walk(df._jdf.queryExecution().executedPlan())
