"""Multimodal transforms: real image resize round-trip; stubbed video/audio
decode with REAL row-expanding Spark plumbing. IVF ANN recall."""

import numpy as np
from pyspark.sql import functions as F

from crawlingathome_worker_spark import fakeimg
from crawlingathome_worker_spark.operators.multimodal import (
    audio_features,
    resize_images,
    sample_video_frames,
)
from crawlingathome_worker_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    train_ivf_centroids,
    with_ivf_cell,
)


def test_resize_images_real_roundtrip(spark, fx_dir):
    pairs = spark.read.parquet(f"{fx_dir}/pairs.parquet").limit(50)
    out = resize_images(pairs.select("image_id", "bytes", "fmt"), 16, 16).collect()
    n_ok = 0
    for r in out:
        if not r["resized_ok"]:
            continue
        n_ok += 1
        dec = fakeimg.decode(bytes(r["resized_bytes"]))
        assert dec is not None
        fmt, w, h, img = dec
        assert (w, h) == (16, 16)
        assert fmt == r["fmt"]  # format preserved
    assert n_ok > 40


def test_video_frame_sampling_stub_plumbing(spark, fx_dir):
    pairs = spark.read.parquet(f"{fx_dir}/pairs.parquet").limit(10)
    out = sample_video_frames(pairs.select("image_id", "bytes"), n_frames=4)
    rows = out.collect()
    assert len(rows) == 40  # row-expanding: 10 blobs × 4 frames
    per_id = {}
    for r in rows:
        per_id.setdefault(r["image_id"], []).append(r["frame_idx"])
        assert len(r["frame_feat"]) == 64
    assert all(sorted(v) == [0, 1, 2, 3] for v in per_id.values())
    # deterministic: same blob → same features
    again = sample_video_frames(pairs.select("image_id", "bytes"), n_frames=4).collect()
    a0 = {(r["image_id"], r["frame_idx"]): tuple(r["frame_feat"]) for r in rows}
    a1 = {(r["image_id"], r["frame_idx"]): tuple(r["frame_feat"]) for r in again}
    assert a0 == a1


def test_audio_features_stub_plumbing(spark, fx_dir):
    pairs = spark.read.parquet(f"{fx_dir}/pairs.parquet").limit(5)
    rows = audio_features(pairs.select("image_id", "bytes"), n_windows=8).collect()
    assert len(rows) == 40
    assert all(r["energy"] is not None for r in rows)


def _embeddings(spark, n=400, dim=16, seed=5):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((4, dim)) * 3
    vecs = np.concatenate(
        [centers[i % 4] + rng.standard_normal(dim) * 0.3 for i in range(n)]
    ).reshape(n, dim)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), vecs


def test_ivf_cells_and_recall(spark):
    df, vecs = _embeddings(spark)
    cents = train_ivf_centroids(df, n_cells=4, iters=15)
    celled = with_ivf_cell(df, cents)
    # cells are balanced-ish (clustered data → 4 real clusters)
    sizes = [r["count"] for r in celled.groupBy("ivf_cell").count().collect()]
    assert len(sizes) == 4 and min(sizes) > 20
    # recall: IVF top-10 vs brute-force top-10 on a data vector as query
    q = vecs[7]
    want = {r["vec_id"] for r in brute_force_topk(df, q, k=10).collect()}
    got = {r["vec_id"] for r in ivf_topk(df, cents, q, k=10, n_probe=2).collect()}
    assert len(want & got) >= 9  # clustered data: near-perfect recall at n_probe=2


def test_ivf_partition_pruning(spark, tmp_path):
    """The at-rest IVF layout: cell filter must prune at the FILE level
    (PartitionFilters on ivf_cell in the scan) and return the same top-k."""
    from crawlingathome_worker_spark.operators.similarity import (
        ivf_topk_pruned,
        write_ivf_partitioned,
    )

    df, vecs = _embeddings(spark)
    cents = train_ivf_centroids(df, n_cells=4, iters=15)
    path = str(tmp_path / "emb_ivf")
    write_ivf_partitioned(df, cents, path)

    q = vecs[7]
    out = ivf_topk_pruned(spark, path, cents, q, k=10, n_probe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "ivf_cell" in plan.split("PartitionFilters")[1][:120]
    got = {r["vec_id"] for r in out.collect()}
    want = {r["vec_id"] for r in ivf_topk(df, cents, q, k=10, n_probe=2).collect()}
    assert got == want


def test_lsh_store_partition_pruning(spark, tmp_path):
    """At-rest LSH layout (mirror of the IVF store): the signature filter must
    prune at the FILE level and return the same top-k as the scan-time path."""
    from crawlingathome_worker_spark.operators.similarity import (
        lsh_bucketed_topk,
        lsh_topk_pruned,
        write_lsh_partitioned,
    )

    df, vecs = _embeddings(spark)
    path = str(tmp_path / "emb_lsh")
    write_lsh_partitioned(df, dim=vecs.shape[1], path=path, n_planes=8)

    q = vecs[7]
    out = lsh_topk_pruned(spark, path, q, k=5, n_planes=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "lsh_sig" in plan.split("PartitionFilters")[1][:120]
    got = [(r["vec_id"], round(r["cosine"], 6)) for r in out.collect()]
    want = [
        (r["vec_id"], round(r["cosine"], 6))
        for r in lsh_bucketed_topk(df, q, k=5, n_planes=8).collect()
    ]
    assert got == want and len(got) > 0


def test_ivf_store_refresh_on_drifted_data(spark, tmp_path):
    """ROADMAP gap 5: a store built when the corpus lived in 2 clusters is
    appended with vectors from 2 NEW (shifted) clusters; the stale codebook
    crowds them into few cells and recall at n_probe=2 degrades. refresh_ivf_store
    must (a) rebalance cell occupancy, (b) restore near-perfect recall for
    queries in the drifted region, (c) keep PartitionFilters pruning."""
    from crawlingathome_worker_spark.operators.similarity import (
        ivf_topk_pruned,
        refresh_ivf_store,
        write_ivf_partitioned,
    )

    rng = np.random.default_rng(17)
    dim = 16
    old_centers = rng.standard_normal((2, dim)) * 3
    new_centers = rng.standard_normal((2, dim)) * 3 + 8.0  # drifted region
    old_vecs = np.stack([old_centers[i % 2] + rng.standard_normal(dim) * 0.3 for i in range(200)])
    new_vecs = np.stack([new_centers[i % 2] + rng.standard_normal(dim) * 0.3 for i in range(200)])
    old_df = spark.createDataFrame(
        [(i, [float(x) for x in old_vecs[i]]) for i in range(200)],
        "vec_id long, embedding array<float>",
    )
    all_vecs = np.concatenate([old_vecs, new_vecs])
    all_df = spark.createDataFrame(
        [(i, [float(x) for x in all_vecs[i]]) for i in range(400)],
        "vec_id long, embedding array<float>",
    )

    # store built on the ORIGINAL distribution, then rewritten with ALL data
    # but the STALE codebook (what naive appends produce)
    stale_cents = train_ivf_centroids(old_df, n_cells=4, iters=15)
    path = str(tmp_path / "emb_ivf_drift")
    write_ivf_partitioned(all_df, stale_cents, path)

    q = all_vecs[307]  # a query in the DRIFTED region
    want = {r["vec_id"] for r in brute_force_topk(all_df, q, k=10).collect()}

    fresh_cents = refresh_ivf_store(spark, path, n_cells=4, iters=15)
    refreshed = spark.read.parquet(path)
    sizes = sorted(r["count"] for r in refreshed.groupBy("ivf_cell").count().collect())
    assert len(sizes) == 4 and sizes[0] >= 50  # occupancy rebalanced (~100 each)

    out = ivf_topk_pruned(spark, path, fresh_cents, q, k=10, n_probe=2)
    got = {r["vec_id"] for r in out.collect()}
    assert len(want & got) >= 9  # recall restored on the drifted region
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "ivf_cell" in plan.split("PartitionFilters", 1)[1][:200]


def test_ivf_refresh_recovers_from_crashed_swap(spark, tmp_path):
    """Crash between refresh_ivf_store's two renames leaves the store at
    .refresh-old and nothing at `path`; the next refresh must restore and
    proceed rather than fail path-not-found."""
    import os

    from crawlingathome_worker_spark.operators.similarity import (
        ivf_topk_pruned,
        refresh_ivf_store,
        write_ivf_partitioned,
    )

    rng = np.random.default_rng(23)
    dim = 8
    vecs = rng.standard_normal((100, dim))
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(100)],
        "vec_id long, embedding array<float>",
    )
    cents = train_ivf_centroids(df, n_cells=2, iters=10)
    path = str(tmp_path / "emb_ivf_crash")
    write_ivf_partitioned(df, cents, path)

    os.rename(path, path + ".refresh-old")  # simulate death between the renames
    fresh = refresh_ivf_store(spark, path, n_cells=2, iters=10)
    assert not os.path.exists(path + ".refresh-old")  # swap completed
    got = ivf_topk_pruned(spark, path, fresh, vecs[7], k=5, n_probe=2)
    assert got.count() == 5
