"""SparkSession construction with the configs the pipeline relies on.

Scale posture (BASELINE.json:14 — 10^12-document clusters, N vs 4N
executors): every knob here is one that matters identically on a real
multi-executor cluster; local[K] is only the sandbox substitution for
executor count. AQE handles runtime coalescing and skew-join splitting;
app-level salting (canonicalize.py) covers skewed aggregations, which
AQE does not.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONF: dict[str, str] = {
    # AQE: runtime re-plan — coalesce small shuffle partitions, split
    # skewed join partitions. Free wins at every scale.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow path for every pandas UDF (BASELINE.json:15 mandates
    # vectorized UDFs; this is the JVM<->Python batch transport).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # Reuse Python workers so iterator-UDF state (gazetteers, models)
    # is loaded once per worker, not once per batch.
    "spark.python.worker.reuse": "true",
    # Nested-schema pruning: project only the span fields we touch so
    # the parquet scan of array<struct> reads fewer pages.
    "spark.sql.optimizer.nestedSchemaPruning.enabled": "true",
    # Broadcast threshold: alias dictionaries are explicitly
    # F.broadcast()-ed, so the default threshold only guards accidents.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Deterministic timezone for timestamp oracle comparisons.
    "spark.sql.session.timeZone": "UTC",
    # Split scans finer than the 128MB default: local corpora are a few
    # hundred MB at most, and UDF-heavy stages need >= cores input
    # splits to use the machine. On a real cluster with TB-scale inputs
    # this knob is left at the site default — file count dominates.
    "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
}


def build(
    app_name: str = "canonicity_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) the session.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    in the sandbox; under spark-submit it is supplied externally and we
    never override it.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_GRAFT_CPUS" in os.environ or master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    conf = dict(DEFAULT_CONF)
    if master and master.startswith("local"):
        # local mode = driver JVM does all executor work; the 1g default
        # heap GC-thrashes once tens of task threads run concurrently.
        # On a cluster spark-submit supplies executor/driver memory.
        conf.setdefault(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g")
        )
    if shuffle_partitions is None:
        # 2x cores locally; AQE coalesces down. On a cluster this is set
        # per-job relative to total executor cores.
        try:
            n = int(master.split("[")[1].rstrip("]")) if master and "[" in master else 32
        except ValueError:
            n = 32
        shuffle_partitions = max(8, 2 * n)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
