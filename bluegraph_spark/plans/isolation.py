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

from pyspark.sql import DataFrame, SparkSession

_counter = itertools.count()

# Runtime conf the loops read for sizing / pre-loop materialization; copied
# caller -> loop session so a caller's runtime override (conf.set) behaves
# exactly as it did when the loops ran on the caller's session directly.
# (newSession() only inherits conf present in the SparkContext's SparkConf.)
_INHERITED_CONFS = (
    "spark.sql.shuffle.partitions",
    "spark.sql.adaptive.enabled",
    "spark.sql.autoBroadcastJoinThreshold",
)


def loop_session(caller: SparkSession) -> SparkSession:
    """A fresh conf-isolated session sharing ``caller``'s SparkContext."""
    s = caller.newSession()
    for k in _INHERITED_CONFS:
        s.conf.set(k, caller.conf.get(k))
    return s


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
        jdf = target._jvm.org.apache.spark.sql.classic.Dataset.ofRows(
            target._jsparkSession, df._jdf.queryExecution().analyzed()
        )
        return DataFrame(jdf, target)
    except Exception:
        pass
    name = f"_bg_rebind_{next(_counter)}_{time.time_ns()}"
    df.createOrReplaceGlobalTempView(name)
    try:
        out = target.table(f"global_temp.{name}")
        out.schema  # defensive: guarantee the view is resolved into the plan
    finally:
        df.sparkSession.catalog.dropGlobalTempView(name)
    return out
