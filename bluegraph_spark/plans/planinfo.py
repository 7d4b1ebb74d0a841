"""Physical-plan introspection helpers (plan-guard evidence).

``executed_exchange_count`` walks the executed SparkPlan tree and counts
the shuffle exchanges the plan will actually run, excluding everything
behind an ``InMemoryTableScan``: the cached relation stores its build plan
(including the exchanges that built it) and prints it in ``toString``, but
a scan of the materialized cache re-executes none of it — substring-
counting "Exchange" over the plan string therefore overcounts, which is
exactly the mistake the iterative loops' plan-guard tests must not make.
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
