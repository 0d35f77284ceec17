"""SparkSession factory with scale-minded defaults.

Local testing runs ``local[N]`` single-JVM; the configs below are the
ones that transfer to a 1000-executor cluster unchanged:

* AQE on (runtime re-plan, skew-join splitting, partition coalescing)
* Arrow on (every pandas UDF path is Arrow-batched, never per-row pickle)
* shuffle partitions sized to the local core count — on a real cluster
  AQE's ``advisoryPartitionSizeInBytes`` takes over and coalesces.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "tubes_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("TUBES_SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # whole-stage codegen emits one large Java method per stage; a
        # long-lived session compiling many distinct plans (the bench, a
        # multi-tenant cluster) overflows the JVM's default 240m reserved
        # code cache, silently dropping hot stages back to the
        # interpreter (~2x on codegen-heavy plans like 64-hash MinHash).
        # 1g: the r3 bench compiles ~110 distinct plans best-of-3 and
        # still showed late-battery throughput decay at 512m
        .config("spark.driver.extraJavaOptions", "-XX:ReservedCodeCacheSize=1g")
    )
    return builder.getOrCreate()
