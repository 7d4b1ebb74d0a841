"""SuperstepCheckpointer unit behavior: completeness, resume safety, pruning."""

import os

import pytest
from pyspark.sql import functions as F

from bluegraph_spark.plans.checkpoint import SuperstepCheckpointer


def _iceberg_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.Table")
        return True
    except Exception:
        return False


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


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json"])
def test_format_matrix_roundtrip_and_completeness(spark, tmp_path, fmt):
    """Every Hadoop-committed path format goes through the same save/load/
    completeness/resume contract — data_format is not a parquet-only flag."""
    cp = SuperstepCheckpointer(str(tmp_path), "r", data_format=fmt)
    df = spark.range(20).select(F.col("id"), (F.col("id") * 1.5).alias("rank"))
    back = cp.save(1, df, metrics={"err": 0.1})
    assert back.count() == 20
    assert cp.latest() == 1
    got = {(r["id"], r["rank"]) for r in cp.load(spark, 1).collect()}
    assert got == {(i, i * 1.5) for i in range(20)}
    # partial write (no _SUCCESS) stays invisible in every format
    os.makedirs(cp.data_path(2))
    assert cp.latest() == 1
    assert cp.load_metrics(1)["err"] == 0.1


def test_iceberg_checkpoint_contract(spark, tmp_path):
    """What a cluster with an Iceberg runtime must verify (the sandbox has
    no iceberg-spark-runtime jar, so this skips here — the body is the
    real test, not a placeholder):

    1. ``data_format="iceberg"`` round-trips vertex state through
       ``format("iceberg").save/load`` on a path-based table;
    2. completeness = committed metadata tree + metrics JSON (Iceberg
       writes no Hadoop _SUCCESS marker; its commit is the metadata swap),
       so a run killed mid-write — data files present, no metadata commit —
       must stay invisible to ``latest()``;
    3. resume (``pagerank(..., resume=True)``) continues from the last
       committed snapshot.
    """
    if not _iceberg_available(spark):
        pytest.skip(
            "iceberg-spark-runtime not on the classpath in this sandbox; "
            "run this test on a cluster with an Iceberg catalog configured"
        )
    cp = SuperstepCheckpointer(str(tmp_path), "r", data_format="iceberg")
    df = spark.range(20).select(F.col("id"), (F.col("id") * 1.5).alias("rank"))
    back = cp.save(1, df, metrics={"err": 0.1})
    assert back.count() == 20
    assert cp.latest() == 1
    # a metadata-less table dir (killed before the metadata commit) is
    # incomplete even if data files exist
    os.makedirs(os.path.join(cp.data_path(2), "data"))
    assert cp.latest() == 1


def test_sssp_and_kshortest_resume(spark, tmp_path):
    """Both path loops continue from the latest complete superstep and
    reproduce the uninterrupted run exactly (pagerank's resume contract,
    extended to the label-table checkpoints round 5 added)."""
    from pyspark.sql import functions as F

    from bluegraph_spark.operators.paths import (
        k_shortest_distances,
        shortest_paths,
    )
    from bluegraph_spark.plans.checkpoint import SuperstepCheckpointer

    n = 40
    edges = spark.range(n).select(
        F.col("id").cast("string").alias("src"),
        ((F.col("id") * 7 + 3) % n).cast("string").alias("dst"),
        (F.col("id") % 5 + 1).cast("double").alias("w"),
    )

    # --- SSSP ---
    full = shortest_paths(edges, "0", weight_col="w", max_iter=6)
    ck = SuperstepCheckpointer(str(tmp_path / "ck_sssp"), run_id="r")
    part = shortest_paths(
        edges, "0", weight_col="w", max_iter=2, checkpointer=ck
    )
    assert part.iterations == 2
    resumed = shortest_paths(
        edges, "0", weight_col="w", max_iter=6, checkpointer=ck, resume=True
    )
    assert resumed.iterations >= part.iterations
    a = sorted(map(tuple, full.distances.collect()))
    b = sorted(map(tuple, resumed.distances.collect()))
    assert a == b
    # a converged run resumes as a no-op early exit
    again = shortest_paths(
        edges, "0", weight_col="w", max_iter=20, checkpointer=ck, resume=True
    )
    assert again.converged
    assert sorted(map(tuple, again.distances.collect())) == a

    # --- k-shortest ---
    fullk = k_shortest_distances(edges, "0", k=2, weight_col="w", max_iter=8)
    ck2 = SuperstepCheckpointer(str(tmp_path / "ck_kssp"), run_id="r")
    k_shortest_distances(
        edges, "0", k=2, weight_col="w", max_iter=3, checkpointer=ck2
    )
    resumedk = k_shortest_distances(
        edges, "0", k=2, weight_col="w", max_iter=8,
        checkpointer=ck2, resume=True,
    )
    ak = sorted(map(tuple, fullk.distances.collect()))
    bk = sorted(map(tuple, resumedk.distances.collect()))
    assert ak == bk
