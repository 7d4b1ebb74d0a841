"""SparkSession factory with the engine's standard configuration.

Design notes (scale-first):
- AQE is on, with skew-join splitting: the co-occurrence self-join on
  occurrence factors is the canonical skew site (a token/factor occurring in
  f files produces f(f-1)/2 join pairs).
- Arrow is on: every Python-side UDF in this engine is a pandas/Arrow UDF
  (input_hint: "no per-row Python").
- shuffle.partitions defaults small for local[] testing; production
  spark-submit overrides via --conf (AQE coalescing makes the initial number
  mostly a ceiling).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Deterministic double handling / no ANSI surprises between runs.
    "spark.sql.ansi.enabled": "false",
    # UI off: this engine is driven headless (tests/bench/spark-submit).
    "spark.ui.enabled": "false",
}


def get_session(
    app_name: str = "bluegraph-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession configured for this engine.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default all
    cores) so the same code path serves tests, bench, and spark-submit (where
    master is supplied externally and this argument is left None *and* a
    session already exists).
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    builder = builder.master(master)
    confs = dict(DEFAULT_CONFS)
    if shuffle_partitions is not None:
        confs["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_confs:
        confs.update(extra_confs)
    for k, v in confs.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
