"""Generate committed golden outputs (FIXTURES.md §7) from the pure-Python oracle.

Run manually after intentional semantic changes:  python -m tests.gen_goldens
The e2e tests compare the Spark engine to the oracle LIVE; these goldens pin the
oracle itself against accidental drift (a change to shared semantics modules that
silently shifts both sides would otherwise go unnoticed).
"""

from __future__ import annotations

import csv
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawlingathome_worker_spark.config import EngineConfig
from crawlingathome_worker_spark.sources.fixtures import ensure_fixtures
from tests.oracle import load_fixture_inputs, oracle_wave, state_from_seen_seed

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN = os.path.join(REPO, "golden")
CFG = EngineConfig(default_host_budget=20, wave_seconds=30.0)


def run_two_waves():
    fx = ensure_fixtures(os.path.join(REPO, ".fixtures"))
    links, pairs_by_id, robots, seen_rows = load_fixture_inputs(fx)
    max_page = max(r["page_id"] for r in links)
    shard0 = [r for r in links if r["page_id"] <= max_page // 2]
    shard1 = [r for r in links if r["page_id"] > max_page // 2]
    st = state_from_seen_seed(seen_rows)
    o1 = oracle_wave(st, shard0, pairs_by_id, robots, CFG)
    o2 = oracle_wave(st, shard1, pairs_by_id, robots, CFG)
    return st, o1, o2


def main():
    os.makedirs(GOLDEN, exist_ok=True)
    st, o1, o2 = run_two_waves()
    with open(os.path.join(GOLDEN, "seen_set.txt"), "w") as f:
        for kind in sorted(st.seen):
            for k in sorted(st.seen[kind]):
                f.write(f"{kind}\t{k}\n")
    with open(os.path.join(GOLDEN, "crawl_order.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["sample_id", "url", "status"])
        for o in (o1, o2):
            for c in o["scheduled"]:
                w.writerow([c.sample_id, c.url, c.fetch_status])
    with open(os.path.join(GOLDEN, "counters.json"), "w") as f:
        json.dump({"wave1": o1["counters"], "wave2": o2["counters"]}, f, indent=1, sort_keys=True)
    write_pixel_golden(o1)
    print(f"goldens written to {GOLDEN}")


def write_pixel_golden(o1: dict) -> None:
    """Byte-stable OUTPUT golden (ROADMAP round-1 item 6): the full wave-1
    output rows, image bytes included, as committed parquet. The e2e test
    compares a Spark wave's pairs_out to this byte-for-byte — regression
    coverage for the codec, pHash, and caption pipeline at the OUTPUT level
    (seen-set/order/counters goldens don't see payload corruption)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = sorted(o1["outputs"], key=lambda r: r["sample_id"])
    table = pa.table(
        {
            "image_id": pa.array([r["image_id"] for r in rows], pa.string()),
            "bytes": pa.array([r["bytes"] for r in rows], pa.binary()),
            "w": pa.array([r["w"] for r in rows], pa.int32()),
            "h": pa.array([r["h"] for r in rows], pa.int32()),
            "fmt": pa.array([r["fmt"] for r in rows], pa.string()),
            "caption": pa.array([r["caption"] for r in rows], pa.string()),
            "phash": pa.array([r["phash"] for r in rows], pa.int64()),
            "sample_id": pa.array([r["sample_id"] for r in rows], pa.int64()),
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "license": pa.array([r["license"] for r in rows], pa.string()),
            "score": pa.array([r["score"] for r in rows], pa.float64()),
        }
    )
    pq.write_table(table, os.path.join(GOLDEN, "pairs_out_wave1.parquet"))


if __name__ == "__main__":
    main()
