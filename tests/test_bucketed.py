"""Bucketed fetch join: the pairs (image bytes) side must join WITHOUT an
Exchange — its bucket layout is the partitioning, so only the small scheduled
side shuffles (the 100-TB property, see sources/bucketed.py)."""

from pyspark.sql import functions as F

from crawlingathome_worker_spark.sources.bucketed import (
    read_bucketed_pairs,
    write_bucketed_pairs,
)


def test_bucketed_join_skips_big_side_shuffle(spark, fx_dir):
    pairs = spark.read.parquet(f"{fx_dir}/pairs.parquet")
    write_bucketed_pairs(pairs, table="pairs_bucketed_test", buckets=8)
    bucketed = read_bucketed_pairs(spark, "pairs_bucketed_test")

    scheduled = (
        spark.read.parquet(f"{fx_dir}/frontier_seed.parquet")
        .select("url", "image_id")
    )
    # disable auto-broadcast so the test observes the shuffle structure itself
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = scheduled.join(bucketed.select("image_id", "bytes"), "image_id")
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))

    # exactly ONE exchange: the scheduled side; the bucketed scan feeds the join
    # directly (its hashpartitioning comes from the bucket spec). AQE prints
    # both final and initial plans — assert on the FINAL one only.
    final = plan.split("== Initial Plan ==")[0]
    n_exchanges = final.count("Exchange hashpartitioning")
    assert n_exchanges == 1, f"expected 1 exchange, got {n_exchanges}:\n{final[:2000]}"
    assert "Bucketed: true" in final

    # correctness: identical result to the plain join
    plain = scheduled.join(pairs.select("image_id", "bytes"), "image_id")
    assert joined.count() == plain.count() > 0
