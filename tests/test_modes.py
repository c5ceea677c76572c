"""Mode tests: bloom-state dedup wave ≡ exact wave; reference_strict reproduces
the lost-retry defect (B3); streaming runner ≡ batch job loop; pHash dedup."""

import os

import pytest
from pyspark.sql import functions as F

from crawlingathome_worker_spark.config import BloomParams, EngineConfig
from crawlingathome_worker_spark.operators.imagededup import phash_dedup, phash_near_pairs
from crawlingathome_worker_spark.plans.wave import run_wave
from crawlingathome_worker_spark.state.bloom import bloom_add, empty_bloom
from crawlingathome_worker_spark.state.snapshots import Warehouse


def _seed_wh(spark, wh, seen_df, retry_df, bloom_params=None, cuckoo_params=None):
    m = wh.new_manifest(None)
    m["tables"]["seen_keys"] = [wh.write_table(seen_df, "seen_keys", 0)]
    m["tables"]["retry_keys"] = [wh.write_table(retry_df, "retry_keys", 0)]
    if bloom_params is not None:
        from crawlingathome_worker_spark.state.cuckoo import cuckoo_update, empty_cuckoo

        for kind in ("clipped", "parsed"):
            b = bloom_add(
                empty_bloom(spark, bloom_params),
                seen_df.filter(F.col("kind") == kind).select("pair_md5"),
                bloom_params,
            )
            m["tables"][f"bloom_{kind}"] = [wh.write_table(b, f"bloom_{kind}", 0)]
        ck = cuckoo_update(empty_cuckoo(spark, cuckoo_params), retry_df, None, cuckoo_params)
        m["tables"]["cuckoo_state"] = [wh.write_table(ck, "cuckoo_state", 0)]
    wh.commit(m)


@pytest.fixture(scope="module")
def inputs(spark, fx_dir):
    links = spark.read.parquet(f"{fx_dir}/wat_links.parquet").filter(F.col("page_id") < 150)
    pairs = spark.read.parquet(f"{fx_dir}/pairs.parquet")
    robots = spark.read.parquet(f"{fx_dir}/robots.parquet")
    seen = spark.read.parquet(f"{fx_dir}/seen_seed.parquet")
    retry = seen.filter(F.col("retryable")).select("pair_md5")
    return links, pairs, robots, seen.select("pair_md5", "kind"), retry


def test_bloom_mode_equals_exact_mode(spark, inputs, tmp_path_factory):
    """Two waves: partitioned bloom×2 + cuckoo must reproduce the exact-key-table
    semantics (incl. cross-wave retry lifecycle) at negligible FP rates."""
    from crawlingathome_worker_spark.config import CuckooParams

    links, pairs, robots, seen, retry = inputs
    params = BloomParams(capacity=1_000_000, fpr=1e-5, partitions=4)
    ck = CuckooParams(buckets_per_partition=1 << 14, partitions=4)

    cfg_e = EngineConfig(default_host_budget=15, dedup_mode="exact")
    wh_e = Warehouse(str(tmp_path_factory.mktemp("wh_exact")))
    _seed_wh(spark, wh_e, seen, retry)
    m_e = run_wave(spark, wh_e, cfg_e, pairs, robots, links, collect_lineage=False)
    m_e2 = run_wave(spark, wh_e, cfg_e, pairs, robots, links, collect_lineage=False)

    cfg_b = EngineConfig(default_host_budget=15, dedup_mode="bloom", bloom=params, cuckoo=ck)
    wh_b = Warehouse(str(tmp_path_factory.mktemp("wh_bloom")))
    _seed_wh(spark, wh_b, seen, retry, bloom_params=params, cuckoo_params=ck)
    m_b = run_wave(spark, wh_b, cfg_b, pairs, robots, links, collect_lineage=False)
    m_b2 = run_wave(spark, wh_b, cfg_b, pairs, robots, links, collect_lineage=False)

    assert m_b["counters"] == m_e["counters"]
    assert m_b2["counters"] == m_e2["counters"]  # cuckoo retry lifecycle matches
    out_e = {
        (r["sample_id"], r["url"])
        for r in wh_e.read_table(spark, wh_e.latest(), "pairs_out").collect()
    }
    out_b = {
        (r["sample_id"], r["url"])
        for r in wh_b.read_table(spark, wh_b.latest(), "pairs_out").collect()
    }
    assert out_e == out_b


def test_reference_strict_loses_retries_b3(spark, inputs, tmp_path_factory):
    """Strict mode: failed fetches are seen forever (crawlingathome.py:149).
    Fixed mode: they re-enter via retry slots next wave."""
    links, pairs, robots, _, _ = inputs
    empty_seen = spark.createDataFrame([], "pair_md5 string, kind string")
    empty_retry = spark.createDataFrame([], "pair_md5 string")

    for strict, expect_retry in ((True, 0), (False, 1)):
        # wave_seconds huge ⇒ crawl_delay never caps a host below the default
        # budget, so wave 1 defers nothing and wave 2 isolates the retry path
        cfg = EngineConfig(
            default_host_budget=100_000, wave_seconds=1e9, reference_strict=strict
        )
        wh = Warehouse(str(tmp_path_factory.mktemp(f"wh_strict_{strict}")))
        _seed_wh(spark, wh, empty_seen, empty_retry)
        m1 = run_wave(spark, wh, cfg, pairs, robots, links, collect_lineage=False)
        assert m1["counters"]["errors"] > 0
        # wave 2, same shard: everything was seen in wave 1
        m2 = run_wave(spark, wh, cfg, pairs, robots, links, collect_lineage=False)
        if expect_retry:
            # cuckoo-fixed: exactly the error keys come back for retry
            assert m2["counters"]["scheduled"] == m1["counters"]["errors"]
        else:
            assert m2["counters"]["scheduled"] == 0  # B3: lost forever


def test_streaming_equals_batch(spark, fx_dir, tmp_path_factory):
    """foreachBatch streaming waves over the WAT file ≡ one batch wave on the
    same lines (availableNow drains the file source exactly once)."""
    from crawlingathome_worker_spark.sources.wat import read_wat_lines
    from crawlingathome_worker_spark.streaming.incremental import stream_waves

    pairs = spark.read.parquet(f"{fx_dir}/pairs.parquet")
    robots = spark.read.parquet(f"{fx_dir}/robots.parquet")
    cfg = EngineConfig(default_host_budget=25)
    empty_seen = spark.createDataFrame([], "pair_md5 string, kind string")
    empty_retry = spark.createDataFrame([], "pair_md5 string")

    wh_s = Warehouse(str(tmp_path_factory.mktemp("wh_stream")))
    _seed_wh(spark, wh_s, empty_seen, empty_retry)
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    watch = tmp_path_factory.mktemp("watch")  # file source watches a DIRECTORY
    import shutil

    shutil.copy(f"{fx_dir}/wat_lines.txt", watch / "shard-000.wat")
    stream_waves(spark, wh_s, cfg, str(watch), ckpt, pairs, robots)

    wh_b = Warehouse(str(tmp_path_factory.mktemp("wh_batch")))
    _seed_wh(spark, wh_b, empty_seen, empty_retry)
    links = read_wat_lines(spark, f"{fx_dir}/wat_lines.txt")
    run_wave(spark, wh_b, cfg, pairs, robots, links, collect_lineage=False)

    def seen_set(wh):
        return {
            r["pair_md5"] for r in wh.read_table(spark, wh.latest(), "seen_keys").collect()
        }

    assert wh_s.latest()["wave_no"] >= 1
    assert seen_set(wh_s) == seen_set(wh_b)
    n_s = wh_s.read_table(spark, wh_s.latest(), "pairs_out").count()
    n_b = wh_b.read_table(spark, wh_b.latest(), "pairs_out").count()
    assert n_s == n_b > 0


def test_phash_dedup_collapses_neardups(spark, fx_dir):
    """Fixture plants ~5% near-duplicate images (±1 px) — exact-pHash dedup must
    collapse them; banded near-pairs must find hamming ≤ 3 pairs."""
    pairs = spark.read.parquet(f"{fx_dir}/pairs.parquet").withColumn(
        "sample_id", F.col("image_id")
    )
    n = pairs.count()
    deduped = phash_dedup(pairs).count()
    assert deduped < n  # planted duplicates collapsed
    near = phash_near_pairs(pairs, max_hamming=3)
    assert near.count() >= (n - deduped)  # every collapsed dup is also a near-pair
    assert near.filter(F.col("hamming") > 3).count() == 0


def test_bloom_delta_compaction_cycle(spark, inputs, tmp_path_factory):
    """Delta-maintained bloom across a compaction boundary: with
    bloom_compact_every=2, wave 1 appends a key delta, wave 2 compacts
    (materializes base bits, clears deltas), wave 3 appends on the new base.
    Results must equal exact mode at every wave, and the manifests must show
    the delta/base lifecycle (the 24-GB-design-point rewrite happens once per
    compaction, not per wave)."""
    from crawlingathome_worker_spark.config import CuckooParams

    links, pairs, robots, seen, retry = inputs
    half = links.filter(F.col("page_id") < 75)
    params = BloomParams(capacity=1_000_000, fpr=1e-5, partitions=4)
    ck = CuckooParams(buckets_per_partition=1 << 14, partitions=4)
    shards = [half, links, half]

    cfg_e = EngineConfig(default_host_budget=15, dedup_mode="exact")
    wh_e = Warehouse(str(tmp_path_factory.mktemp("wh_exact_c")))
    _seed_wh(spark, wh_e, seen, retry)
    m_e = [run_wave(spark, wh_e, cfg_e, pairs, robots, s, collect_lineage=False) for s in shards]

    cfg_b = EngineConfig(
        default_host_budget=15, dedup_mode="bloom", bloom=params, cuckoo=ck,
        bloom_compact_every=2,
    )
    wh_b = Warehouse(str(tmp_path_factory.mktemp("wh_bloom_c")))
    _seed_wh(spark, wh_b, seen, retry, bloom_params=params, cuckoo_params=ck)
    m_b = [run_wave(spark, wh_b, cfg_b, pairs, robots, s, collect_lineage=False) for s in shards]

    for e, b in zip(m_e, m_b):
        assert b["counters"] == e["counters"]
    # lifecycle: wave1 = seeded base + 1 delta; wave2 = compacted new base,
    # deltas cleared; wave3 = carried base pointer + 1 fresh delta
    assert len(m_b[0]["tables"]["bloom_parsed_delta"]) == 1
    assert m_b[1]["tables"]["bloom_parsed_delta"] == []
    assert m_b[1]["tables"]["bloom_parsed"] != m_b[0]["tables"]["bloom_parsed"]
    assert len(m_b[2]["tables"]["bloom_parsed_delta"]) == 1
    assert m_b[2]["tables"]["bloom_parsed"] == m_b[1]["tables"]["bloom_parsed"]
    out_e = {
        (r["sample_id"], r["url"])
        for r in wh_e.read_table(spark, wh_e.latest(), "pairs_out").collect()
    }
    out_b = {
        (r["sample_id"], r["url"])
        for r in wh_b.read_table(spark, wh_b.latest(), "pairs_out").collect()
    }
    assert out_e == out_b


def test_streaming_restart_does_not_reprocess(spark, fx_dir, tmp_path_factory):
    """Restarting the stream with the SAME checkpoint must not re-run waves for
    already-committed input files (file-source dedup via checkpoint = the
    exactly-once half the manifest can't see)."""
    import shutil

    from crawlingathome_worker_spark.streaming.incremental import stream_waves

    pairs = spark.read.parquet(f"{fx_dir}/pairs.parquet")
    robots = spark.read.parquet(f"{fx_dir}/robots.parquet")
    cfg = EngineConfig(default_host_budget=25)
    wh = Warehouse(str(tmp_path_factory.mktemp("wh_restart")))
    _seed_wh(
        spark,
        wh,
        spark.createDataFrame([], "pair_md5 string, kind string"),
        spark.createDataFrame([], "pair_md5 string"),
    )
    ckpt = str(tmp_path_factory.mktemp("ckpt_restart"))
    watch = tmp_path_factory.mktemp("watch_restart")
    shutil.copy(f"{fx_dir}/wat_lines.txt", watch / "shard-000.wat")

    stream_waves(spark, wh, cfg, str(watch), ckpt, pairs, robots)
    wave_after_first = wh.latest()["wave_no"]
    stream_waves(spark, wh, cfg, str(watch), ckpt, pairs, robots)  # restart, same file
    assert wh.latest()["wave_no"] == wave_after_first  # nothing reprocessed

    shutil.copy(f"{fx_dir}/wat_lines.txt", watch / "shard-001.wat")  # NEW file
    stream_waves(spark, wh, cfg, str(watch), ckpt, pairs, robots)
    assert wh.latest()["wave_no"] == wave_after_first + 1  # exactly one more wave


def test_drain_wave_on_empty_warehouse(spark, inputs, fx_dir, tmp_path_factory):
    """Degenerate wave: no new input AND empty frontier — must commit a clean
    all-zero snapshot in both modes (the empty-observation fallback path) and
    stay runnable afterwards."""
    _, pairs, robots, _, _ = inputs
    for mode in ("exact", "bloom"):
        cfg = EngineConfig(default_host_budget=10, dedup_mode=mode)
        wh = Warehouse(str(tmp_path_factory.mktemp(f"wh_empty_{mode}")))
        m = run_wave(spark, wh, cfg, pairs, robots, None, collect_lineage=False)
        assert m["counters"]["candidates"] == 0
        assert m["counters"]["scheduled"] == 0
        assert m["next_sample_id"] == 0
        assert wh.read_table(spark, wh.latest(), "pairs_out").count() == 0
        # a real wave still works on top of the empty snapshot
        links = spark.read.parquet(f"{fx_dir}/wat_links.parquet").filter(
            F.col("page_id") < 40
        )
        m2 = run_wave(spark, wh, cfg, pairs, robots, links, collect_lineage=False)
        assert m2["counters"]["scheduled"] > 0
