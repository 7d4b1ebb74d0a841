"""Per-superstep vertex-state checkpointing with lineage + metrics + resume.

Every iterative operator in this engine (PageRank, connected components,
LPA) materializes its vertex state each superstep through this class:

1. it cuts lineage — without it the logical plan grows by two joins per
   iteration and the job eventually dies in the planner (SURVEY.md §4.1);
2. it makes runs resumable after executor/driver loss: the loop continues
   from the last complete iteration (north rule);
3. it records per-iteration metrics and per-partition lineage rows (row
   counts per written partition) so progress is observable.

The reference has no analogue (NetworkX/graph-tool iterate in-process); this
is engine-side driver code, not a Catalyst extension.

Plan note: a storage checkpoint is re-READ from an unbucketed table, so the
returned DataFrame carries no partitioning info and the next superstep's
joins re-cluster the (small, O(V)) vertex state — a durability tax the
``localCheckpoint`` path does not pay (its scans preserve the captured
hash partitioning; see the plan-guard tests). On a cluster, bucketed
checkpoint tables (Iceberg bucket partition transform + storage-partitioned
joins) remove the tax; the sandbox has no catalog to exercise that.

Storage layout (``format`` defaults to parquet; on a cluster with an Iceberg
catalog pass ``table_format="iceberg"`` and a catalog path — the sandbox has
no Iceberg runtime, so parquet directories stand in):

    {base}/{run_id}/iter=00003/            vertex-state parquet
    {base}/{run_id}/metrics/iter_00003.json  metrics + per-partition lineage

A checkpoint is complete iff the format's commit marker (Hadoop-committed
formats: the ``_SUCCESS`` file; Iceberg: the committed metadata tree) and
the metrics JSON both exist; ``latest()`` ignores partial writes, so a run
killed mid-write resumes from the previous superstep. The format matrix is
pytest-parameterized (tests/test_checkpoint.py); the Iceberg path skips in
this sandbox (no iceberg-spark-runtime jar) with the cluster-side contract
spelled out in the skipped test body.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SuperstepCheckpointer:
    def __init__(
        self,
        base_path: str,
        run_id: str = "run",
        data_format: str = "parquet",
        keep_last: int | None = None,
        collect_lineage: bool = True,
    ):
        self.base = os.path.join(base_path, run_id)
        self.data_format = data_format
        self.keep_last = keep_last
        self.collect_lineage = collect_lineage
        os.makedirs(os.path.join(self.base, "metrics"), exist_ok=True)

    # -- paths -----------------------------------------------------------

    def data_path(self, iteration: int) -> str:
        return os.path.join(self.base, f"iter={iteration:05d}")

    def metrics_path(self, iteration: int) -> str:
        return os.path.join(self.base, "metrics", f"iter_{iteration:05d}.json")

    # -- write -----------------------------------------------------------

    def save(
        self,
        iteration: int,
        state: DataFrame,
        metrics: dict[str, Any] | None = None,
    ) -> DataFrame:
        """Write vertex state + metrics; return the re-read (lineage-free) DF.

        The returned DataFrame reads from storage, so downstream supersteps
        build plans on a fresh scan instead of the whole iteration history.
        """
        path = self.data_path(iteration)
        t0 = time.time()
        state.write.mode("overwrite").format(self.data_format).save(path)
        write_sec = time.time() - t0
        spark = state.sparkSession
        reread = spark.read.format(self.data_format).load(path)

        record: dict[str, Any] = {
            "iteration": iteration,
            "wall_clock_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "write_sec": round(write_sec, 4),
            "path": path,
        }
        if metrics:
            record.update(metrics)
        if self.collect_lineage:
            lineage = (
                reread.groupBy(F.spark_partition_id().alias("partition"))
                .agg(F.count("*").alias("rows"))
                .orderBy("partition")
                .collect()
            )
            record["lineage"] = [
                {"partition": r["partition"], "rows": r["rows"]} for r in lineage
            ]
            record["total_rows"] = int(sum(r["rows"] for r in lineage))
        tmp = self.metrics_path(iteration) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(record, f)
        os.replace(tmp, self.metrics_path(iteration))

        if self.keep_last is not None:
            for it in self.iterations()[: -self.keep_last]:
                shutil.rmtree(self.data_path(it), ignore_errors=True)
        return reread

    # -- read / resume -----------------------------------------------------

    def _complete(self, iteration: int) -> bool:
        if not os.path.exists(self.metrics_path(iteration)):
            return False
        if self.data_format == "iceberg":
            # Iceberg commits atomically through its metadata tree (no
            # Hadoop _SUCCESS marker): a path-based table is complete iff
            # its metadata dir exists — a killed mid-write run leaves data
            # files but no committed metadata, and the metrics JSON (written
            # strictly after the commit) is the second gate.
            return os.path.isdir(os.path.join(self.data_path(iteration), "metadata"))
        # Hadoop-committed path formats (parquet/orc/json/csv) all write the
        # _SUCCESS marker on successful job commit.
        return os.path.exists(os.path.join(self.data_path(iteration), "_SUCCESS"))

    def iterations(self) -> list[int]:
        out = []
        if not os.path.isdir(self.base):
            return out
        for name in os.listdir(self.base):
            if name.startswith("iter="):
                it = int(name.split("=")[1])
                if self._complete(it):
                    out.append(it)
        return sorted(out)

    def latest(self) -> int | None:
        its = self.iterations()
        return its[-1] if its else None

    def load(self, spark: SparkSession, iteration: int) -> DataFrame:
        return spark.read.format(self.data_format).load(self.data_path(iteration))

    def load_metrics(self, iteration: int) -> dict[str, Any]:
        with open(self.metrics_path(iteration)) as f:
            return json.load(f)

    def metrics_log(self) -> list[dict[str, Any]]:
        return [self.load_metrics(i) for i in self.iterations()]
