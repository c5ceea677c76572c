"""Phase profile of the committed bloom wave (the bench's hot metric).

Replicates bench.py's committed-wave loop (disjoint page_id shards, wave 1
untimed) with SPARK_GRAFT_WAVE_TIMING=1 so run_wave prints per-stage AND
per-job wall times (stage A = frontier+pairs_out+status jobs; stage B = state
writes + metrics + session-cache fold + lineage, submitted once status
resolves; commit = manifest link). Use this to decide
whether the remaining committed-vs-uncommitted delta is worth engineering.

  python tools/profile_wave.py [fixture_scale]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ["SPARK_GRAFT_WAVE_TIMING"] = "1"


def main() -> None:
    scale = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
    from pyspark.sql import functions as F

    from bench import _fixture_dir, _warmup
    from crawlingathome_worker_spark.config import EngineConfig
    from crawlingathome_worker_spark.plans.wave import run_wave
    from crawlingathome_worker_spark.session import get_spark
    from crawlingathome_worker_spark.state.snapshots import Warehouse

    fx_dir = _fixture_dir(scale)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="profile-wave", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    _warmup(spark)

    wh_dir = tempfile.mkdtemp(
        prefix="profile_wh_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    try:
        wh = Warehouse(wh_dir)
        cfg = EngineConfig(
            default_host_budget=100_000, wave_seconds=0.0, dedup_mode="bloom"
        )
        links = spark.read.parquet(os.path.join(fx_dir, "wat_links.parquet")).repartition(
            int(cpus)
        )
        robots = spark.read.parquet(os.path.join(fx_dir, "robots.parquet"))
        pairs = spark.read.parquet(os.path.join(fx_dir, "pairs.parquet"))
        n_shards = 4
        shards = [links.filter(F.col("page_id") % n_shards == i) for i in range(n_shards)]
        run_wave(spark, wh, cfg, pairs, robots, shards[0], collect_lineage=False)
        for shard in shards[1:]:
            t0 = time.perf_counter()
            m = run_wave(spark, wh, cfg, pairs, robots, shard, collect_lineage=False)
            print(
                f"wave {m['wave_no']}: total={time.perf_counter() - t0:.3f}s"
                f" scheduled={m['counters']['scheduled']}"
                f" candidates={m['counters']['candidates']}"
            )
    finally:
        shutil.rmtree(wh_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
