"""SparkSession factory with scale-oriented defaults.

The reference is a single-process Python loop (no parallelism anywhere:
``ontology_load_controller.py:52-92`` executes list-at-a-time). Our
engine is designed for a multi-executor cluster reading ~100 TB; these
configs encode the execution-model decisions that matter at that scale:

- AQE on (runtime re-planning, skew-join splitting, partition
  coalescing) — the closure loop and the mention-link join both have
  skewed key distributions (root/hub terms).
- Arrow on — the only Python on the hot path is pandas-UDF batches
  (mention detection / link scoring), never row-at-a-time Python.
- Broadcast threshold sized so the term dictionary (small dim table)
  always broadcasts instead of shuffling the transcript fact table.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONFS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # At 100 TB these two are sized per-cluster; locally we keep
    # partitions small enough that every test query gets parallelism.
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.files.maxPartitionBytes": str(256 * 1024 * 1024),
    "spark.driver.memory": "8g",
}


def get_spark(
    app_name: str = "ontology-loader-spark",
    master: str | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a
    real cluster it is left unset so ``spark-submit`` controls it.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = builder.master(master)
    confs = dict(DEFAULT_CONFS)
    if extra_confs:
        confs.update(extra_confs)
    for k, v in confs.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
