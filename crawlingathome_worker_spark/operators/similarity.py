"""Similarity search over embedding columns (array<float>).

Driver-mandated training-data-pipeline ops. Two tiers:

- `brute_force_topk`: exact cosine against one query vector. The per-row score is
  a numpy matrix-vector product per Arrow batch (the whole batch is ONE gemv);
  top-k goes through orderBy+limit which Spark compiles to TakeOrderedAndProject —
  a per-partition heap + driver merge, NO global sort shuffle. This is the
  correctness baseline and is already the right plan for "score 100 TB, keep 10".
- `lsh_bucketed_topk`: random-hyperplane LSH (signed projections → bit signature
  → bucket). Only the query's bucket (plus multi-probe neighbors at hamming 1)
  is scored — the scale path that turns a full scan into a partition-pruned scan
  when the signature is a partition/bucket column of the stored table.
- `knn_self_join`: all-pairs-within-bucket cosine for near-dup detection by
  embedding (embedding-cosine near-dup dedup).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, IntegerType, LongType

__all__ = [
    "with_cosine",
    "brute_force_topk",
    "with_lsh_signature",
    "lsh_bucketed_topk",
    "train_ivf_centroids",
    "with_ivf_cell",
    "ivf_topk",
    "banded_lsh_signatures",
    "knn_self_join",
]


def _stack(series: pd.Series, dim: int) -> np.ndarray:
    return np.array(
        [x if x is not None else np.zeros(dim, dtype=np.float64) for x in series],
        dtype=np.float64,
    )


def with_cosine(df: DataFrame, query: np.ndarray, vec_col: str = "embedding") -> DataFrame:
    """Add `cosine` = cos(embedding, query). One gemv per Arrow batch."""
    q = np.asarray(query, dtype=np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)
    dim = len(q)

    @F.pandas_udf(DoubleType())
    def cos_udf(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="float64")
        m = _stack(vecs, dim)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        return pd.Series((m @ qn) / norms)

    return df.withColumn("cosine", cos_udf(F.col(vec_col)))


def brute_force_topk(
    df: DataFrame, query: np.ndarray, k: int = 10, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Exact top-k by cosine — TakeOrderedAndProject plan, no global sort."""
    return (
        with_cosine(df, query, vec_col)
        .select(id_col, "cosine")
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def _planes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def with_lsh_signature(
    df: DataFrame, dim: int, n_planes: int = 12, seed: int = 42, vec_col: str = "embedding"
) -> DataFrame:
    """Add `lsh_sig` — random-hyperplane signature (long). At rest, store/bucket
    the table by this column so a query scans one bucket, not the world."""
    planes = _planes(dim, n_planes, seed)
    weights = (1 << np.arange(n_planes)).astype(np.int64)

    @F.pandas_udf(LongType())
    def sig_udf(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int64")
        m = _stack(vecs, dim)
        bits = (m @ planes.T) > 0
        return pd.Series((bits.astype(np.int64) @ weights))

    return df.withColumn("lsh_sig", sig_udf(F.col(vec_col)))


def lsh_bucketed_topk(
    df: DataFrame,
    query: np.ndarray,
    k: int = 10,
    n_planes: int = 12,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: score only vectors whose LSH signature matches the
    query's (or differs by one bit with multiprobe). Recall improves with
    multiprobe at the cost of (n_planes+1)× bucket reads — still ≪ full scan."""
    q = np.asarray(query, dtype=np.float64)
    planes = _planes(len(q), n_planes, seed)
    qsig = int(((q @ planes.T) > 0).astype(np.int64) @ (1 << np.arange(n_planes)))
    sigs = [qsig] + ([qsig ^ (1 << b) for b in range(n_planes)] if multiprobe else [])
    sigged = with_lsh_signature(df, len(q), n_planes, seed, vec_col)
    bucket = sigged.filter(F.col("lsh_sig").isin(sigs))
    return brute_force_topk(bucket, q, k, vec_col, id_col)


def write_lsh_partitioned(
    df: DataFrame,
    dim: int,
    path: str,
    n_planes: int = 12,
    seed: int = 42,
    vec_col: str = "embedding",
) -> None:
    """Persist the embedding table PARTITIONED BY its LSH signature: a stored
    ANN query then reads only the probed buckets' files via Catalyst partition
    pruning (same at-rest pattern as write_ivf_partitioned — on Iceberg this is
    a partition transform on the signature column)."""
    with_lsh_signature(df, dim, n_planes, seed, vec_col).write.mode("overwrite").partitionBy(
        "lsh_sig"
    ).parquet(path)


def lsh_topk_pruned(
    spark,
    path: str,
    query: np.ndarray,
    k: int = 10,
    n_planes: int = 12,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    multiprobe: bool = True,
) -> DataFrame:
    """ANN over the LSH-partitioned store: the signature filter prunes at the
    FILE level (assert `PartitionFilters` in the scan), so a query touches
    (n_planes+1)/2^n_planes of the data instead of scanning the world."""
    q = np.asarray(query, dtype=np.float64)
    planes = _planes(len(q), n_planes, seed)
    qsig = int(((q @ planes.T) > 0).astype(np.int64) @ (1 << np.arange(n_planes)))
    sigs = [qsig] + ([qsig ^ (1 << b) for b in range(n_planes)] if multiprobe else [])
    stored = spark.read.parquet(path).filter(F.col("lsh_sig").isin(sigs))
    return brute_force_topk(stored, q, k, vec_col, id_col)


def train_ivf_centroids(
    df: DataFrame,
    n_cells: int = 16,
    iters: int = 10,
    seed: int = 42,
    vec_col: str = "embedding",
    sample_fraction: float = 1.0,
    max_train_rows: int = 65536,
    order_col: str = "vec_id",
) -> np.ndarray:
    """Coarse k-means centroids for IVF. Only a BOUNDED training sample ever
    reaches the driver (IVF codebooks are tiny — n_cells × dim floats): the
    sort+limit compiles to TakeOrderedAndProject (per-partition heap of
    max_train_rows, driver merge), so driver memory is O(max_train_rows × dim)
    regardless of table size. At 100 TB, set `sample_fraction` to pre-thin the
    scan (e.g. 1e-5 of 10^10 vectors → 10^5 sample) — the fraction only changes
    how much data feeds the heap, never what can reach the driver. Ordering by
    `order_col` makes the sample — and therefore the centroids — independent of
    partition layout and scan order (deterministic across engines/runs).
    Lloyd iterations are deterministic (seeded init, stable argmin)."""
    sample = df.select(vec_col, order_col)
    if sample_fraction < 1.0:
        sample = sample.sample(fraction=sample_fraction, seed=seed)
    rows = sample.orderBy(order_col).limit(max_train_rows).collect()
    x = np.array([r[vec_col] for r in rows], dtype=np.float64)
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(len(x), size=min(n_cells, len(x)), replace=False)]
    for _ in range(iters):
        d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cents)):
            members = x[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def with_ivf_cell(
    df: DataFrame, centroids: np.ndarray, vec_col: str = "embedding"
) -> DataFrame:
    """Assign each vector to its nearest centroid (one gemm per Arrow batch).
    At rest, partition/bucket the stored table by `ivf_cell` so a query scans
    only its probed cells — partition pruning does the rest."""
    cents = np.asarray(centroids, dtype=np.float64)
    dim = cents.shape[1]

    @F.pandas_udf(IntegerType())
    def cell_udf(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int32")
        m = _stack(vecs, dim)
        # argmin ||x-c||² = argmax (x·c - ||c||²/2): one gemm, no n×k×d temp
        scores = m @ cents.T - 0.5 * (cents * cents).sum(axis=1)[None, :]
        return pd.Series(scores.argmax(axis=1).astype(np.int32))

    return df.withColumn("ivf_cell", cell_udf(F.col(vec_col)))


def ivf_topk(
    df: DataFrame,
    centroids: np.ndarray,
    query: np.ndarray,
    k: int = 10,
    n_probe: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF ANN: score only the n_probe cells nearest to the query."""
    cents = np.asarray(centroids, dtype=np.float64)
    q = np.asarray(query, dtype=np.float64)
    d = ((cents - q[None, :]) ** 2).sum(axis=1)
    probe = [int(i) for i in np.argsort(d, kind="stable")[:n_probe]]
    celled = with_ivf_cell(df, cents, vec_col)
    return brute_force_topk(celled.filter(F.col("ivf_cell").isin(probe)), q, k, vec_col, id_col)


def write_ivf_partitioned(
    df: DataFrame, centroids: np.ndarray, path: str, vec_col: str = "embedding"
) -> None:
    """Persist the embedding table PARTITIONED BY its IVF cell: a query that
    filters on ivf_cell then scans only the probed cells' files — Catalyst
    partition pruning turns an ANN query into an O(probed/total) scan. This is
    the at-rest layout for the 100 TB path (Iceberg: partition transform on the
    cell column)."""
    with_ivf_cell(df, centroids, vec_col).write.mode("overwrite").partitionBy(
        "ivf_cell"
    ).parquet(path)


def ivf_topk_pruned(
    spark,
    path: str,
    centroids: np.ndarray,
    query: np.ndarray,
    k: int = 10,
    n_probe: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN over the partitioned store: the cell filter prunes at the FILE level
    (assert `PartitionFilters` in the scan — tests/test_multimodal.py)."""
    cents = np.asarray(centroids, dtype=np.float64)
    q = np.asarray(query, dtype=np.float64)
    d = ((cents - q[None, :]) ** 2).sum(axis=1)
    probe = [int(i) for i in np.argsort(d, kind="stable")[:n_probe]]
    stored = spark.read.parquet(path).filter(F.col("ivf_cell").isin(probe))
    return brute_force_topk(stored, q, k, vec_col, id_col)


def refresh_ivf_store(
    spark,
    path: str,
    n_cells: int = 16,
    iters: int = 10,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_fraction: float = 1.0,
    max_train_rows: int = 65536,
) -> np.ndarray:
    """Maintenance: RE-TRAIN the IVF codebook on the store's CURRENT contents
    and rewrite the store partitioned by the new cells (ROADMAP gap 5).

    Embedding distributions drift as a corpus grows — centroids trained on the
    first 1% of data leave later vectors crowded into a few cells, which
    defeats partition pruning (a probe reads most of the store) and recall
    (the true neighbors straddle cell boundaries the stale codebook drew).
    Periodic refresh is the standard IVF answer (FAISS retrain / Milvus
    reindex); composed here like compact_appends: read → retrain → rewrite →
    swap. The swap is write-to-sibling + two renames — on Iceberg this whole
    op is `rewrite_data_files` with a new partition spec, atomic at the
    snapshot commit. Returns the new centroids (the store's query codebook).

    Crash safety: the two renames are not atomic together — a crash between
    them leaves the store at `.refresh-old` and nothing at `path`. The next
    refresh (or any caller running this first) self-heals by renaming the
    old store back before proceeding; stale `.refresh-tmp` is always
    discarded (it may be a partial write)."""
    import os
    import shutil

    tmp = path.rstrip("/") + ".refresh-tmp"
    old = path.rstrip("/") + ".refresh-old"
    if not os.path.exists(path) and os.path.exists(old):
        os.rename(old, path)  # recover from a crash between the two renames

    stored = spark.read.parquet(path)
    if "ivf_cell" in stored.columns:
        stored = stored.drop("ivf_cell")
    cents = train_ivf_centroids(
        stored,
        n_cells=n_cells,
        iters=iters,
        seed=seed,
        vec_col=vec_col,
        sample_fraction=sample_fraction,
        max_train_rows=max_train_rows,
        order_col=id_col,
    )
    shutil.rmtree(tmp, ignore_errors=True)
    write_ivf_partitioned(stored, cents, tmp, vec_col)
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return cents


def banded_lsh_signatures(
    df: DataFrame,
    dim: int,
    n_tables: int = 4,
    bits_per_table: int = 12,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Add `sigs: array<long>` — one independent random-hyperplane signature per
    band table (planes seeded per-table). Multi-table banding is the scale-safe
    near-dup shape: each table's bucket population shrinks exponentially in
    bits_per_table (2^12 buckets/table vs 2^6 for the old single flat signature),
    while recall is recovered by OR-ing candidates across the n_tables tables —
    exactly the MinHash-LSH band construction transplanted to hyperplane LSH."""
    all_planes = np.stack([_planes(dim, bits_per_table, seed + 1000 * t) for t in range(n_tables)])
    weights = (1 << np.arange(bits_per_table)).astype(np.int64)

    @F.pandas_udf(ArrayType(LongType()))
    def sigs_udf(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="object")
        m = _stack(vecs, dim)
        sigs = np.stack(
            [((m @ all_planes[t].T) > 0).astype(np.int64) @ weights for t in range(n_tables)],
            axis=1,
        )
        return pd.Series(list(sigs))

    return df.withColumn("sigs", sigs_udf(F.col(vec_col)))


def knn_self_join(
    df: DataFrame,
    threshold: float = 0.95,
    n_tables: int = 4,
    bits_per_table: int = 12,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_bucket_rows: int | None = None,
    dim: int | None = None,
    score_before_collapse: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: banded multi-table LSH candidates,
    exact cosine only within (table, signature) buckets. → (id_a, id_b, cosine
    ≥ threshold), id_a < id_b.

    Scale shape (round-6 bucket-local executor): rows shuffle ONCE on the
    (band, sig) bucket key into a grouped Arrow stage; all pairing and scoring
    happens inside the bucket task with numpy (chunked gemm prefilter at
    threshold−1e-6, then an exact einsum re-score that reproduces the legacy
    per-pair formula bit-for-bit). Only threshold-SURVIVING pairs ever leave
    the task, so the cross-band duplicate collapse shuffles three scalars per
    survivor instead of two vectors per raw banded candidate — the previous
    self-join shape materialized the full quadratic candidate set (~n²/2^bits
    rows carrying both embeddings) through the join and the dedup exchange,
    which at 20k vectors × 6 bits was an ~85 s stage; this shape is ~2 s.
    `max_bucket_rows` hard-caps pathological buckets (near-constant embedding
    regions) by dropping buckets denser than the cap inside the bucket task —
    same drop semantics as the previous aggregate+anti-join, zero extra passes.
    Pass `dim` (the embedding width) to avoid a probe job on `df`.
    `score_before_collapse` is retained for API compatibility: the bucket-local
    executor already scores before the collapse and shuffles survivors only,
    subsuming both historical placements (identical result set either way)."""
    from pyspark.sql.types import StructField, StructType

    if dim is None:
        dim = len(df.select(vec_col).first()[vec_col])
    sigged = banded_lsh_signatures(df, dim, n_tables, bits_per_table, seed, vec_col)
    banded = sigged.select(id_col, vec_col, F.posexplode("sigs").alias("band", "sig"))
    id_type = df.schema[id_col].dataType
    out_schema = StructType(
        [
            StructField("id_a", id_type),
            StructField("id_b", id_type),
            StructField("cosine", DoubleType()),
        ]
    )
    thr = float(threshold)
    cap = max_bucket_rows
    d = int(dim)
    id_name, vec_name = id_col, vec_col

    def _bucket_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        empty = pd.DataFrame(
            {
                "id_a": pdf[id_name].iloc[:0],
                "id_b": pdf[id_name].iloc[:0],
                "cosine": pd.Series([], dtype="float64"),
            }
        )
        if n < 2 or (cap is not None and n > cap):
            return empty
        m = _stack(pdf[vec_name], d)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        nm = m / norms[:, None]
        # chunked upper-triangle gemm PREFILTER with a safety margin (gemm and
        # einsum round differently in the last ulps; 1e-6 ≫ the fp64 drift)
        margin = thr - 1e-6
        step = max(64, min(n, 4_000_000 // n))  # ≤ ~32 MB per score block
        ii_parts: list[np.ndarray] = []
        jj_parts: list[np.ndarray] = []
        for s0 in range(0, n - 1, step):
            sc = nm[s0 : min(n, s0 + step)] @ nm.T
            li, lj = np.nonzero(sc >= margin)
            keep = (li + s0) < lj  # strict upper triangle, global indices
            ii_parts.append(li[keep] + s0)
            jj_parts.append(lj[keep])
        ii = np.concatenate(ii_parts) if ii_parts else np.array([], dtype=np.int64)
        if len(ii) == 0:
            return empty
        jj = np.concatenate(jj_parts)
        # EXACT re-score: identical arithmetic to the legacy pair_cos UDF
        # (per-row einsum over float64 gathers, norms recomputed the same way)
        a, b = m[ii], m[jj]
        na, nb = norms[ii], norms[jj]
        cos = np.einsum("ij,ij->i", a, b) / (na * nb)
        exact = cos >= thr
        if not exact.any():
            return empty
        ids = pdf[id_name].to_numpy()
        ia, ib = ids[ii[exact]], ids[jj[exact]]
        swap = ib < ia  # emit id_a < id_b like the legacy l.id < r.id join
        id_a = np.where(swap, ib, ia)
        id_b = np.where(swap, ia, ib)
        distinct = id_a != id_b  # duplicate-id rows never paired (legacy strict <)
        return pd.DataFrame(
            {
                "id_a": id_a[distinct],
                "id_b": id_b[distinct],
                "cosine": cos[exact][distinct],
            }
        )

    out = (
        banded.groupBy("band", "sig")
        .applyInPandas(_bucket_pairs, schema=out_schema)
        .dropDuplicates(["id_a", "id_b"])
    )
    return out


# Module-level registry of persisted banded frames. The round-6 bucket-local
# knn_self_join consumes its banded frame exactly once (one grouped Arrow
# stage), so it no longer persists anything and registers nothing here; the
# registry and the release functions stay as API-compatible no-ops for callers
# written against the join-based implementation (q26 calls release_knn_caches
# defensively at the top of each invocation).
_BANDED_CACHES: list[DataFrame] = []


def unpersist_knn_cache(df: DataFrame | None = None) -> None:
    """Release the banded-signature cache pinned by knn_self_join. With a
    frame: releases that frame's cache if the handle survived (no-op
    otherwise). With no argument: releases every registered cache."""
    if df is None:
        release_knn_caches()
        return
    cached = getattr(df, "_banded_cache", None)
    if cached is not None:
        cached.unpersist()
        try:
            _BANDED_CACHES.remove(cached)
        except ValueError:
            pass


def release_knn_caches() -> None:
    """Unpersist ALL banded caches created by knn_self_join in this session."""
    while _BANDED_CACHES:
        _BANDED_CACHES.pop().unpersist()
