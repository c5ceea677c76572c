"""End-to-end wave equivalence: run_wave (Spark) vs oracle_wave (pure Python).

This is the SURVEY.md §5.1 oracle contract: URL-seen-set equality, crawl-order
equality (sample_id assignment under fixed seed + politeness budget), caption
byte-equality, pixel/PSNR invariants, per-row scores — over two waves with the
fixture WAT split into two shards (mirroring the reference's 2-shard job loop,
crawlingathome.py:165-174, 220)."""

import math

import numpy as np
import pytest

from crawlingathome_worker_spark import fakeimg
from crawlingathome_worker_spark.config import EngineConfig
from crawlingathome_worker_spark.plans.wave import run_wave
from crawlingathome_worker_spark.state.snapshots import Warehouse

from .oracle import OracleState, load_fixture_inputs, oracle_wave, state_from_seen_seed

CFG = EngineConfig(default_host_budget=20, wave_seconds=30.0)


def _seed_warehouse(spark, wh, seen_rows):
    """Initialize state tables from the seen_seed fixture (snapshot 0)."""
    m = wh.new_manifest(None)
    seen = spark.createDataFrame(
        [(r["pair_md5"], r["kind"]) for r in seen_rows], "pair_md5 string, kind string"
    )
    retry = spark.createDataFrame(
        [(r["pair_md5"],) for r in seen_rows if r["retryable"]], "pair_md5 string"
    )
    m["tables"]["seen_keys"] = [wh.write_table(seen, "seen_keys", 0)]
    m["tables"]["retry_keys"] = [wh.write_table(retry, "retry_keys", 0)]
    wh.commit(m)


@pytest.fixture(scope="module")
def e2e(spark, fx_dir, tmp_path_factory):
    links, pairs_by_id, robots, seen_rows = load_fixture_inputs(fx_dir)
    max_page = max(r["page_id"] for r in links)
    shard0 = [r for r in links if r["page_id"] <= max_page // 2]
    shard1 = [r for r in links if r["page_id"] > max_page // 2]

    # oracle: two waves
    ost = state_from_seen_seed(seen_rows)
    o1 = oracle_wave(ost, shard0, pairs_by_id, robots, CFG)
    o2 = oracle_wave(ost, shard1, pairs_by_id, robots, CFG)

    # engine: same two waves
    wh = Warehouse(str(tmp_path_factory.mktemp("wh")))
    _seed_warehouse(spark, wh, seen_rows)
    pairs_df = spark.read.parquet(f"{fx_dir}/pairs.parquet")
    robots_df = spark.read.parquet(f"{fx_dir}/robots.parquet")
    links_df = spark.read.parquet(f"{fx_dir}/wat_links.parquet")
    s0 = links_df.filter(links_df.page_id <= max_page // 2)
    s1 = links_df.filter(links_df.page_id > max_page // 2)
    m1 = run_wave(spark, wh, CFG, pairs_df, robots_df, s0)
    m2 = run_wave(spark, wh, CFG, pairs_df, robots_df, s1)
    return dict(
        oracle=(o1, o2, ost), engine=(m1, m2, wh), spark=spark, pairs_by_id=pairs_by_id
    )


def test_counters_match(e2e):
    o1, o2, _ = e2e["oracle"]
    m1, m2, _ = e2e["engine"]
    assert m1["counters"] == o1["counters"]
    assert m2["counters"] == o2["counters"]
    assert m1["counters"]["scheduled"] > 100  # the wave actually did work
    assert m2["counters"]["errors"] > 0  # retry path exercised


def test_crawl_order_equality(e2e):
    """Exact (sample_id, url) scheduling sequence — the B2 ordering contract."""
    _, _, wh = e2e["engine"]
    o1, o2, _ = e2e["oracle"]
    spark = e2e["spark"]
    out = wh.read_table(spark, wh.latest(), "pairs_out")
    got = [(r["sample_id"], r["url"]) for r in out.orderBy("sample_id").collect()]
    want = [
        (c.sample_id, c.url)
        for o in (o1, o2)
        for c in o["scheduled"]
        if c.fetch_status == "ok"
    ]
    want.sort()
    assert got == want


def test_output_rows_match_oracle(e2e):
    """Byte-equal captions + bytes, equal phash/license/dims, close scores."""
    _, _, wh = e2e["engine"]
    o1, o2, _ = e2e["oracle"]
    spark = e2e["spark"]
    out = wh.read_table(spark, wh.latest(), "pairs_out").collect()
    want = {r["sample_id"]: r for o in (o1, o2) for r in o["outputs"]}
    assert len(out) == len(want)
    for r in out:
        w = want[r["sample_id"]]
        assert r["caption"] == w["caption"]  # byte-equal (input_hint)
        assert bytes(r["bytes"]) == w["bytes"]
        assert (r["w"], r["h"], r["fmt"]) == (w["w"], w["h"], w["fmt"])
        assert r["phash"] == w["phash"]
        assert r["license"] == w["license"]
        assert r["url"] == w["url"]
        assert math.isclose(r["score"], w["score"], abs_tol=1e-5)


def test_decoded_pixel_invariant(e2e):
    """PSNR ≥ 40 dB between output bytes and the original fixture image."""
    _, _, wh = e2e["engine"]
    spark = e2e["spark"]
    rows = wh.read_table(spark, wh.latest(), "pairs_out").limit(50).collect()
    assert rows
    for r in rows:
        dec = fakeimg.decode(bytes(r["bytes"]))
        assert dec is not None
        fmt, w, h, img = dec
        assert (w, h) == (r["w"], r["h"])
        rt = fakeimg.decode(fakeimg.encode(img, fmt))[3]
        assert fakeimg.psnr(img, rt) >= 40.0 or np.array_equal(img, rt)


def test_seen_set_equality(e2e):
    """URL-seen-set equality after two waves (north_rule contract)."""
    _, _, wh = e2e["engine"]
    _, _, ost = e2e["oracle"]
    spark = e2e["spark"]
    m = wh.latest()
    got_seen = {
        (r["pair_md5"], r["kind"])
        for r in wh.read_table(spark, m, "seen_keys").collect()
    }
    want_seen = {(k, kind) for kind, ks in ost.seen.items() for k in ks}
    assert got_seen == want_seen
    got_retry = {r["pair_md5"] for r in wh.read_table(spark, m, "retry_keys").collect()}
    assert got_retry == ost.retry


def test_frontier_state_matches(e2e):
    _, _, wh = e2e["engine"]
    _, _, ost = e2e["oracle"]
    spark = e2e["spark"]
    got = {
        (r["canonical_url"], r["wave_added"])
        for r in wh.read_table(spark, wh.latest(), "frontier").collect()
    }
    want = {(c.canonical_url, c.wave_added) for c in ost.frontier}
    assert got == want


def test_politeness_budget_respected(e2e):
    """No host exceeds its per-wave budget (property #5, SURVEY.md §5)."""
    o1, o2, _ = e2e["oracle"]
    for o in (o1, o2):
        per_host: dict[str, int] = {}
        for c in o["scheduled"]:
            per_host[c.host] = per_host.get(c.host, 0) + 1
        assert max(per_host.values()) <= CFG.default_host_budget


def test_sample_ids_contiguous(e2e):
    m1, m2, wh = e2e["engine"]
    spark = e2e["spark"]
    n1 = m1["counters"]["scheduled"]
    assert m1["next_sample_id"] == n1
    assert m2["next_sample_id"] == n1 + m2["counters"]["scheduled"]


def test_output_rows_match_committed_pixel_golden(e2e):
    """Byte-stable OUTPUT regression: engine wave-1 pairs_out ≡ the committed
    golden parquet (golden/pairs_out_wave1.parquet, written by gen_goldens from
    the oracle) — including the raw image BYTES, pHash, and captions. Catches
    payload corruption that seen-set/order/counters goldens can't see."""
    import os

    import pyarrow.parquet as pq

    from .gen_goldens import GOLDEN

    m1, _, wh = e2e["engine"]
    spark = e2e["spark"]
    golden = pq.read_table(os.path.join(GOLDEN, "pairs_out_wave1.parquet")).to_pylist()
    got = sorted(
        (
            r.asDict()
            for r in wh.read_table(spark, m1, "pairs_out").collect()
        ),
        key=lambda r: r["sample_id"],
    )
    assert len(got) == len(golden) > 50
    for g, w in zip(got, golden):
        for col in ("image_id", "w", "h", "fmt", "caption", "phash", "sample_id", "url", "license"):
            assert g[col] == w[col], (col, g["sample_id"])
        assert bytes(g["bytes"]) == w["bytes"]
        assert abs(float(g["score"]) - w["score"]) < 1e-6


def test_bloom_mode_output_matches_committed_pixel_golden(spark, fx_dir, tmp_path_factory):
    """Byte-stable OUTPUT golden for the BLOOM path (VERDICT r3 item 7): the
    exact-mode pixel golden above never executes the fused cogroup gate, so a
    payload regression there was previously invisible to the committed goldens.
    A bloom-mode wave 1 must reproduce golden/pairs_out_wave1.parquet
    byte-for-byte — valid because bloom ≡ exact at the pinned FPR on this
    fixture (test_modes.test_bloom_mode_equals_exact_mode pins the premise)."""
    import os

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from crawlingathome_worker_spark.config import BloomParams, CuckooParams

    from .gen_goldens import GOLDEN
    from .test_modes import _seed_wh

    links_df = spark.read.parquet(f"{fx_dir}/wat_links.parquet")
    max_page = links_df.agg(F.max("page_id")).collect()[0][0]
    s0 = links_df.filter(links_df.page_id <= max_page // 2)
    seen = spark.read.parquet(f"{fx_dir}/seen_seed.parquet")
    retry = seen.filter(F.col("retryable")).select("pair_md5")

    params = BloomParams(capacity=1_000_000, fpr=1e-5, partitions=4)
    ck = CuckooParams(buckets_per_partition=1 << 14, partitions=4)
    cfg = EngineConfig(
        default_host_budget=20, wave_seconds=30.0,
        dedup_mode="bloom", bloom=params, cuckoo=ck,
    )
    wh = Warehouse(str(tmp_path_factory.mktemp("wh_bloom_golden")))
    _seed_wh(spark, wh, seen.select("pair_md5", "kind"), retry,
             bloom_params=params, cuckoo_params=ck)
    m1 = run_wave(
        spark, wh, cfg,
        spark.read.parquet(f"{fx_dir}/pairs.parquet"),
        spark.read.parquet(f"{fx_dir}/robots.parquet"),
        s0, collect_lineage=False,
    )

    golden = pq.read_table(os.path.join(GOLDEN, "pairs_out_wave1.parquet")).to_pylist()
    got = sorted(
        (r.asDict() for r in wh.read_table(spark, m1, "pairs_out").collect()),
        key=lambda r: r["sample_id"],
    )
    assert len(got) == len(golden) > 50
    for g, w in zip(got, golden):
        for col in ("image_id", "w", "h", "fmt", "caption", "phash", "sample_id", "url", "license"):
            assert g[col] == w[col], (col, g["sample_id"])
        assert bytes(g["bytes"]) == w["bytes"]
        assert abs(float(g["score"]) - w["score"]) < 1e-6
