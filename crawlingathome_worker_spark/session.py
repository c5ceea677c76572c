"""SparkSession factory with scale-appropriate defaults.

Sandbox runs local[N] single-JVM; the config choices (AQE, skew-join handling,
Arrow execution, shuffle-partition sizing) are the ones that matter on a real
1000-executor cluster too — nothing here is local-mode-only.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "crawlingathome-worker-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_SHUFFLE_PARTITIONS", cpus)
    )
    # Shuffle/spill files on tmpfs when available: this node has far more RAM
    # than the working set, and the default /tmp sits on a virtual disk whose
    # bandwidth flatlines multi-core scaling the moment a wide shuffle (e.g.
    # the image-bytes fetch join) spills. On a real cluster this is "point
    # spark.local.dir at NVMe", the same knob.
    local_dir = os.environ.get("SPARK_LOCAL_DIRS")
    if local_dir is None and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/spark-local"
        os.makedirs(local_dir, exist_ok=True)
    return (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Adaptive execution: runtime coalescing + skew-join splitting; on a real
        # cluster this is what absorbs hot-host and hot-key skew after our salting.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # All Python boundaries are Arrow-batched (input_hint mandate).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # one Arrow batch per task where possible: measured ~1.9× decode-stage
        # throughput vs 10k-row batches (fewer IPC flushes; batches are bounded
        # by partition row counts anyway)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "100000")
        # Broadcast threshold: robots/seen-dim tables are small; let Spark
        # broadcast up to 64 MB before falling back to shuffle joins.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.local.dir", local_dir or "/tmp")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
