"""Adaptive host-salting: identical scheduled/deferred sets to fixed salting
(top-k is decomposable), with per-host salt counts derived from frequency."""

from pyspark.sql import functions as F

from crawlingathome_worker_spark.config import EngineConfig
from crawlingathome_worker_spark.operators.parse import parse_links
from crawlingathome_worker_spark.operators.politeness import politeness_split, robots_gate


def test_adaptive_salt_same_results(spark, fx_dir):
    links = spark.read.parquet(f"{fx_dir}/wat_links.parquet")
    robots = spark.read.parquet(f"{fx_dir}/robots.parquet")
    base = EngineConfig(default_host_budget=10, wave_seconds=30.0)
    adap = EngineConfig(
        default_host_budget=10,
        wave_seconds=30.0,
        adaptive_salt=True,
        salt_target_rows=50,  # tiny target → the hot host really gets many salts
    )
    gated = robots_gate(parse_links(links, base), robots, base).persist()

    s_fix, d_fix = politeness_split(gated, 1, base)
    s_ad, d_ad = politeness_split(gated, 1, adap)
    fix = {(r["host"], r["url"]) for r in s_fix.collect()}
    ad = {(r["host"], r["url"]) for r in s_ad.collect()}
    assert fix == ad  # scheduling decision independent of salt layout
    assert d_fix.count() == d_ad.count()
    gated.unpersist()


def test_adaptive_salt_respects_budget(spark, fx_dir):
    links = spark.read.parquet(f"{fx_dir}/wat_links.parquet")
    robots = spark.read.parquet(f"{fx_dir}/robots.parquet")
    cfg = EngineConfig(
        default_host_budget=5, wave_seconds=1e9, adaptive_salt=True, salt_target_rows=20
    )
    gated = robots_gate(parse_links(links, cfg), robots, cfg)
    scheduled, _ = politeness_split(gated, 1, cfg)
    per_host = scheduled.groupBy("host").count().agg(F.max("count")).collect()[0][0]
    assert per_host <= 5


def test_two_phase_topk_equals_naive_single_window(spark):
    """Decomposability pin: the two-phase salted top-k must select EXACTLY the
    set a naive single per-host window would — on a random skewed frame with
    duplicate urls and per-host budgets (the property that makes the hot-host
    optimization an optimization and not a semantics change)."""
    import numpy as np
    from pyspark.sql import Window

    rng = np.random.default_rng(123)
    # host_budget must be host-constant (politeness_split's contract — it is a
    # robots-derived property of the HOST; per-row budgets break top-k
    # decomposability because dropped rows would still consume naive ranks)
    budgets = {f"h{i}.com": int(rng.integers(1, 6)) for i in range(12)}
    rows = []
    for i in range(4000):
        host = f"h{int(rng.zipf(1.6)) % 12}.com"
        url = f"http://{host}/p{int(rng.integers(0, 3000))}"  # collisions on purpose
        rows.append((url, host, budgets[host]))
    df = spark.createDataFrame(rows, "url string, host string, host_budget long")

    cfg = EngineConfig(salt_buckets=8)
    scheduled, deferred = politeness_split(df, wave_no=3, cfg=cfg)
    got = sorted((r["host"], r["url"]) for r in scheduled.collect())

    from crawlingathome_worker_spark.operators.politeness import with_priority

    naive = with_priority(df, 3, cfg)
    w = Window.partitionBy("host").orderBy("priority_key", "url")
    want = sorted(
        (r["host"], r["url"])
        for r in naive.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= F.col("host_budget"))
        .collect()
    )
    assert got == want
    # and the split is a partition: scheduled + deferred = input (multiset)
    assert scheduled.count() + deferred.count() == df.count()
