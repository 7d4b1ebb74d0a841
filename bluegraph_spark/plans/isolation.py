"""Conf-isolated planning scope for iterative superstep loops.

The superstep loops (pagerank / connected components / LPA) pin two
plan-time session properties for their fixed-shape round plans: AQE off
(per-stage driver re-planning is pure serial overhead on a frozen plan) and
``spark.sql.shuffle.partitions`` sized to the measured data. Both are
session-global: mutating them on the caller's session would leak into any
query another driver thread plans concurrently.

``loop_session`` gives each loop its own ``SparkSession.newSession()`` —
same SparkContext, same cache manager (persisted DataFrames and
localCheckpoint blocks are shared), but an isolated SQLConf — so the loop
can pin whatever it wants without the caller ever observing a changed conf.
``rebind`` moves a DataFrame's logical plan between two sessions of the
same context through a (transient) global temp view, the public
cross-session plan-sharing surface.
"""

from __future__ import annotations

import itertools
import time

from py4j.protocol import Py4JError, Py4JJavaError
from pyspark.sql import DataFrame, SparkSession

_counter = itertools.count()

#: Default rows-per-partition budget for the iterative loops' shuffle
#: width (``loop_partitions``). Round plans are join/aggregation-heavy —
#: several chained operators per row — so the budget is smaller than a
#: scan-style 100 MB+ partition: ~32k rows keeps round tasks in the
#: 100-500 ms band (measured at sf0.1: a 135k-edge CC round at 1
#: partition ran 2-3 s serial, at 5 partitions 0.7-1.6 s). The budget is
#: scale-neutral (not a function of local core count); production runs
#: raise parallelism by raising ``spark.sql.shuffle.partitions``, which
#: caps the width from above.
LOOP_ROWS_PER_PARTITION = 32_000


def loop_partitions(n_rows: int, conf_parts: int,
                    rows_per_partition: int | None = None) -> int:
    """Shuffle width for an iterative loop over ``n_rows`` state rows."""
    import os

    rpp = rows_per_partition or int(
        os.environ.get("BG_LOOP_ROWS_PER_PART", LOOP_ROWS_PER_PARTITION)
    )
    return max(1, min(conf_parts, int(n_rows) // rpp + 1))


def loop_session(caller: SparkSession) -> SparkSession:
    """A fresh conf-isolated session sharing ``caller``'s SparkContext.

    The caller's *explicitly set* runtime SQLConf delta is copied in
    (``SQLConf.getAllConfs`` returns exactly the settings map, not
    defaults), so a caller configuring at runtime via ``conf.set`` — time
    zone, ANSI mode, codegen/join tunables — sees identical behavior inside
    the loop as when the loops ran on the caller's session directly.
    ``newSession()`` alone only inherits builder-time SparkConf entries.
    Static/non-modifiable keys in the delta are skipped (they are
    context-global already).
    """
    s = caller.newSession()
    try:
        delta = caller._jsparkSession.sessionState().conf().getAllConfs()
        it = delta.iterator()
        while it.hasNext():
            kv = it.next()
            k, v = kv._1(), kv._2()
            try:
                if s.conf.isModifiable(k):
                    s.conf.set(k, v)
            except Exception:
                continue
    except Exception:
        # JVM API drift: fall back to the confs the loops themselves read.
        for k in (
            "spark.sql.shuffle.partitions",
            "spark.sql.adaptive.enabled",
            "spark.sql.autoBroadcastJoinThreshold",
        ):
            s.conf.set(k, caller.conf.get(k))
    return s


def _of_rows(df: DataFrame, target: SparkSession) -> DataFrame:
    """Primary rebind route: a Dataset over the SAME analyzed plan.

    ``Dataset.ofRows`` moved namespaces in Spark 4
    (``org.apache.spark.sql.classic.Dataset``); on 3.x it lives at
    ``org.apache.spark.sql.Dataset``. Version-gated instead of blind-try:
    on 3.5 the classic path would raise on EVERY rebind and silently drop
    to the view fallback, whose re-aliasing strands checkpoint-captured
    partitioning (+2 exchanges per superstep — the plan-guard tests would
    fail without explaining why).
    """
    major = int(target.version.split(".")[0])
    dataset_cls = (
        target._jvm.org.apache.spark.sql.classic.Dataset
        if major >= 4
        else target._jvm.org.apache.spark.sql.Dataset
    )
    jdf = dataset_cls.ofRows(
        target._jsparkSession, df._jdf.queryExecution().analyzed()
    )
    return DataFrame(jdf, target)


def rebind(df: DataFrame, target: SparkSession) -> DataFrame:
    """Re-plan ``df`` onto ``target`` (a session of the same SparkContext).

    Primary route: construct a Dataset over the SAME analyzed logical plan
    (``Dataset.ofRows``) — the attribute ids are preserved exactly, which
    matters downstream: a ``localCheckpoint`` captures its output
    partitioning in terms of the physical attributes, and any re-aliasing
    between plan and output (which a view introduces for every column)
    can strand the captured partitioning on an attribute the optimizer
    collapsed away — measured as two avoidable O(V) state shuffles per
    PageRank superstep.

    Fallback route (non-classic sessions / API drift): a transient GLOBAL
    temp view. Classic Spark analyzes a Dataset eagerly at construction, so
    the view only needs to exist for the ``target.table`` call; it is
    dropped again before returning and nothing lingers in the catalog.
    """
    if df.sparkSession._jsparkSession.equals(target._jsparkSession):
        return df
    try:
        return _of_rows(df, target)
    except (TypeError, AttributeError, Py4JError) as exc:
        # TypeError/AttributeError: the Dataset class is a JavaPackage stub
        # (the API moved again); Py4JError: no matching method signature. A
        # real JVM execution error (Py4JJavaError) propagates — masking it
        # behind the fallback would silently change plan quality.
        if isinstance(exc, Py4JJavaError):
            raise

    name = f"_bg_rebind_{next(_counter)}_{time.time_ns()}"
    df.createOrReplaceGlobalTempView(name)
    try:
        out = target.table(f"global_temp.{name}")
        out.schema  # defensive: guarantee the view is resolved into the plan
    finally:
        df.sparkSession.catalog.dropGlobalTempView(name)
    return out
