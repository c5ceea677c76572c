"""Contiguous sample-ID assignment (W1) without a single-partition window.

The reference assigns sample IDs by a driver-side counter seeded from the
tracker's start_id (crawlingathome.py:118, 144-146, 227). A naive Spark port is
`row_number().over(Window.orderBy(...))` — a ONE-PARTITION window that serializes
the whole wave through a single task and cannot scale (SURVEY.md §7.4).

Instead: range-repartition by the ordering key, count rows per partition, compute
per-partition offsets with a tiny P-row window, broadcast-join the offsets back,
and add a per-partition row_number. Global order is preserved because the range
partitioner assigns ascending key ranges to ascending partition ids; every step is
O(rows/P) per task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def assign_sample_ids(
    df: DataFrame,
    start_id: int,
    order_cols: tuple[str, ...] = ("priority_key", "url"),
    id_col: str = "sample_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add `id_col` = start_id + rank (1-based, matching the reference's
    pre-increment: the first assigned id is start_id + 1, crawlingathome.py:145).

    The returned DataFrame is persisted (the range shuffle samples its input; the
    persist pins one deterministic partitioning for all downstream actions).
    """
    sess = df.sparkSession
    p = num_partitions or int(sess.conf.get("spark.sql.shuffle.partitions"))
    cols = [F.col(c) for c in order_cols]
    rdf = (
        df.repartitionByRange(p, *cols)
        .sortWithinPartitions(*cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = rdf.groupBy("_pid").count()
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn("_off", F.coalesce(F.sum("count").over(w_off), F.lit(0))).drop(
        "count"
    )
    w_local = Window.partitionBy("_pid").orderBy(*cols)
    out = (
        rdf.join(F.broadcast(offsets), "_pid")
        .withColumn(id_col, F.lit(start_id) + F.col("_off") + F.row_number().over(w_local))
        .drop("_pid", "_off")
    )
    return out
