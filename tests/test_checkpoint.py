"""SuperstepCheckpointer unit behavior: completeness, resume safety, pruning."""

import os

from pyspark.sql import functions as F

from bluegraph_spark.plans.checkpoint import SuperstepCheckpointer


def test_partial_write_is_invisible(spark, tmp_path):
    """A checkpoint dir without _SUCCESS + metrics (a run killed mid-write)
    must not be offered for resume."""
    cp = SuperstepCheckpointer(str(tmp_path), "r")
    cp.save(1, spark.range(5).select(F.col("id")))
    os.makedirs(cp.data_path(2))  # partial: no _SUCCESS, no metrics
    assert cp.iterations() == [1]
    assert cp.latest() == 1
    # data dir present but metrics missing is also incomplete
    cp.save(3, spark.range(3).select(F.col("id")))
    os.remove(cp.metrics_path(3))
    assert cp.latest() == 1


def test_metrics_and_lineage_recorded(spark, tmp_path):
    cp = SuperstepCheckpointer(str(tmp_path), "r")
    cp.save(1, spark.range(10).select(F.col("id")), metrics={"err": 0.5})
    rec = cp.load_metrics(1)
    assert rec["iteration"] == 1 and rec["err"] == 0.5
    assert rec["total_rows"] == 10
    assert sum(p["rows"] for p in rec["lineage"]) == 10


def test_keep_last_prunes_old_state(spark, tmp_path):
    cp = SuperstepCheckpointer(str(tmp_path), "r", keep_last=2)
    for it in (1, 2, 3, 4):
        cp.save(it, spark.range(it).select(F.col("id")))
    assert cp.iterations() == [3, 4]
    # metrics survive pruning (the run log stays complete)
    assert os.path.exists(cp.metrics_path(1))


def test_roundtrip_preserves_rows(spark, tmp_path):
    cp = SuperstepCheckpointer(str(tmp_path), "r")
    df = spark.range(100).select(F.col("id"), (F.col("id") * 2.0).alias("rank"))
    back = cp.save(7, df)
    assert back.count() == 100
    reloaded = cp.load(spark, 7)
    assert {r["id"] for r in reloaded.collect()} == set(range(100))
