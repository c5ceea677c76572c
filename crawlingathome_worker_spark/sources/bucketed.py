"""Bucketed pairs table: shuffle-free fetch joins.

At design scale the `pairs` table (image bytes) is the overwhelming majority of
bytes — ~100 TB — while a wave's scheduled URLs are comparatively tiny. A plain
join shuffles BOTH sides on image_id every wave; bucketing the pairs table by
image_id at write time makes its hash-partitioning a persistent physical
property, so each wave's join shuffles only the scheduled side (the bucketed
scan reports its partitioning to Catalyst and the Exchange on the big side
disappears). This is the standard Spark answer to "the same huge table joins on
the same key every batch" — pay the shuffle once at ingest, never again.

Iceberg equivalent: a bucket(image_id, N) partition transform; this module uses
Spark's managed-table bucketing (the jar-free path available in-sandbox).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_pairs(
    pairs: DataFrame, table: str = "pairs_bucketed", buckets: int = 32
) -> None:
    """One-time ingest: bucket + sort by image_id (sorted buckets also let the
    join run as a merge within each bucket)."""
    import shutil

    spark = pairs.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    loc = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    shutil.rmtree(
        f"{loc.removeprefix('file:')}/{table}", ignore_errors=True
    )  # stale dir from a crashed run blocks re-create
    (
        pairs.write.mode("overwrite")
        .bucketBy(buckets, "image_id")
        .sortBy("image_id")
        .format("parquet")
        .saveAsTable(table)
    )


def read_bucketed_pairs(spark: SparkSession, table: str = "pairs_bucketed") -> DataFrame:
    return spark.table(table)
