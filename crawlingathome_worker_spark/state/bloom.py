"""Partitioned Bloom filter as a TABLE: the reference's remote bloom servers
(crawlingathome.py:82-95, 148-154) re-expressed as co-partitioned state.

Layout (SURVEY.md §4): the bit array is split into P partitions; a key belongs to
partition pmod(murmur3(key), P) and its k probe positions live entirely inside
that partition's bit slice. Design point: 10^10 keys at FPR 1e-4 ⇒ ~24 GB of bits
over P=64 ⇒ ~374 MB/partition — each executor holds 1/P, nothing is broadcast.
Sandbox: 1e7 keys, P=8, identical code path (scale is config, not code).

Query = cogroup(candidates by bloom-part, state by part) → numpy membership test
(k probes, Kirsch-Mitzenmacher double hashing h1 + j·h2 with h1/h2 computed
JVM-side via xxhash64) → emit only unseen rows. Add = same cogroup, OR the probe
bits into the slice, emit the new slice. Both are one shuffle keyed on the bloom
partition — the Spark analog of the reference's batched HTTP round-trip barrier,
but partitioned instead of single-server.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import BloomParams

STATE_SCHEMA = "part int, bits binary"


def _with_probe_cols(df: DataFrame, key: str, params: BloomParams) -> DataFrame:
    """JVM-side hashing: partition id + two 64-bit probe seeds per key."""
    return (
        df.withColumn("_bpart", F.pmod(F.hash(F.col(key)), F.lit(params.partitions)))
        .withColumn("_h1", F.xxhash64(F.col(key)))
        .withColumn("_h2", F.xxhash64(F.concat(F.col(key), F.lit("#bloom2"))))
    )


def _probe_idx(h1: np.ndarray, h2: np.ndarray, j: int, m: int) -> np.ndarray:
    return (h1 + np.uint64(j) * h2) % np.uint64(m)


def empty_bloom(spark: SparkSession, params: BloomParams) -> DataFrame:
    zeros = bytearray(params.bits_per_partition // 8)
    rows = [(p, bytes(zeros)) for p in range(params.partitions)]
    return spark.createDataFrame(rows, STATE_SCHEMA)


def bloom_filter_unseen(
    candidates: DataFrame, state: DataFrame, params: BloomParams, key: str = "pair_md5"
) -> DataFrame:
    """Rows of `candidates` whose key is NOT in the bloom (J2/J3 bloom mode)."""
    m = params.bits_per_partition
    k = params.num_hashes
    probed = _with_probe_cols(candidates, key, params)
    out_schema = candidates.schema
    out_cols = candidates.columns

    def check(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0:
            return left[out_cols] if set(out_cols) <= set(left.columns) else pd.DataFrame(columns=out_cols)
        if len(right) == 0:
            return left[out_cols]  # no state for this partition → all unseen
        bits = np.frombuffer(right["bits"].iat[0], dtype=np.uint8)
        h1 = left["_h1"].to_numpy(np.int64).view(np.uint64)
        h2 = left["_h2"].to_numpy(np.int64).view(np.uint64)
        seen = np.ones(len(left), dtype=bool)
        for j in range(k):
            idx = _probe_idx(h1, h2, j, m)
            seen &= (bits[(idx >> np.uint64(3)).astype(np.int64)] >> (idx & np.uint64(7)).astype(np.uint8)) & 1 != 0
        return left.loc[~seen, out_cols]

    return (
        probed.groupBy("_bpart")
        .cogroup(state.groupBy("part"))
        .applyInPandas(check, out_schema)
    )


def bloom_add(
    state: DataFrame, keys: DataFrame, params: BloomParams, key: str = "pair_md5"
) -> DataFrame:
    """New state with all `keys` added (J4 — the reference adds every ATTEMPTED
    key, crawlingathome.py:149; the cuckoo retry slots compensate, see cuckoo.py)."""
    m = params.bits_per_partition
    k = params.num_hashes
    probed = _with_probe_cols(keys.select(key).distinct(), key, params)

    def fold(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(right) == 0:
            part = int(left["_bpart"].iat[0])
            bits = np.zeros(m // 8, dtype=np.uint8)
        else:
            part = int(right["part"].iat[0])
            bits = np.frombuffer(right["bits"].iat[0], dtype=np.uint8).copy()
        if len(left):
            h1 = left["_h1"].to_numpy(np.int64).view(np.uint64)
            h2 = left["_h2"].to_numpy(np.int64).view(np.uint64)
            for j in range(k):
                idx = _probe_idx(h1, h2, j, m)
                np.bitwise_or.at(
                    bits,
                    (idx >> np.uint64(3)).astype(np.int64),
                    (np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8)),
                )
        return pd.DataFrame({"part": [part], "bits": [bits.tobytes()]})

    return (
        probed.groupBy("_bpart")
        .cogroup(state.groupBy("part"))
        .applyInPandas(fold, STATE_SCHEMA)
    )


def seen_gate_bloom(
    candidates: DataFrame,
    bloom_clipped: DataFrame,
    bloom_parsed: DataFrame,
    cuckoo: DataFrame,
    bloom_params: "BloomParams",
    cuckoo_params,
    key: str = "pair_md5",
) -> DataFrame:
    """FUSED seen gate: clipped-bloom + parsed-bloom + cuckoo-retry membership
    in ONE cogroup shuffle.

    The unfused pipeline (bloom_filter_unseen ×2 + cuckoo_members + union +
    dropDuplicates) shuffles the candidate wave on the same pmod(hash(key), P)
    key THREE times. All three state tables are co-partitioned by that key, so
    one cogroup against the kind-tagged union of their partition rows computes
    the full reference predicate per row —
        pass ⇔ ¬clipped ∧ (¬parsed ∨ retryable)
    (crawlingathome.py:82-95 two bloom families; north_rule J5 retry override)
    — with one candidate shuffle and no union/dedup stage."""
    if bloom_params.partitions != cuckoo_params.partitions:
        raise ValueError(
            "fused gate needs bloom and cuckoo co-partitioned: "
            f"{bloom_params.partitions} != {cuckoo_params.partitions}"
        )
    from .cuckoo import _fp_and_buckets

    m = bloom_params.bits_per_partition
    k = bloom_params.num_hashes
    nbuckets = cuckoo_params.buckets_per_partition
    nslots = cuckoo_params.slots_per_bucket
    probed = _with_probe_cols(candidates, key, bloom_params).withColumn(
        "_ch", F.xxhash64(F.concat(F.col(key), F.lit("#cuckoo")))
    )
    state = (
        bloom_clipped.select("part", F.lit("c").alias("kind"), F.col("bits").alias("blob"))
        .unionByName(
            bloom_parsed.select("part", F.lit("p").alias("kind"), F.col("bits").alias("blob"))
        )
        .unionByName(cuckoo.select("part", F.lit("k").alias("kind"), F.col("tbl").alias("blob")))
    )
    out_cols = candidates.columns

    def gate(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0:
            return pd.DataFrame(columns=out_cols)
        blobs = dict(zip(right["kind"], right["blob"]))
        h1 = left["_h1"].to_numpy(np.int64).view(np.uint64)
        h2 = left["_h2"].to_numpy(np.int64).view(np.uint64)

        def bloom_seen(blob) -> np.ndarray:
            if blob is None:
                return np.zeros(len(left), dtype=bool)
            bits = np.frombuffer(blob, dtype=np.uint8)
            seen = np.ones(len(left), dtype=bool)
            for j in range(k):
                idx = _probe_idx(h1, h2, j, m)
                seen &= (
                    bits[(idx >> np.uint64(3)).astype(np.int64)]
                    >> (idx & np.uint64(7)).astype(np.uint8)
                ) & 1 != 0
            return seen

        seen_c = bloom_seen(blobs.get("c"))
        seen_p = bloom_seen(blobs.get("p"))
        if "k" in blobs:
            tbl = np.frombuffer(blobs["k"], dtype=np.uint16).reshape(nbuckets, nslots)
            ch = left["_ch"].to_numpy(np.int64).view(np.uint64)
            fp, b1, b2 = _fp_and_buckets(ch, nbuckets)
            retry = (tbl[b1] == fp[:, None]).any(axis=1) | (tbl[b2] == fp[:, None]).any(axis=1)
        else:
            retry = np.zeros(len(left), dtype=bool)
        keep = ~seen_c & (~seen_p | retry)
        return left.loc[keep, out_cols]

    return (
        probed.groupBy("_bpart")
        .cogroup(state.groupBy("part"))
        .applyInPandas(gate, candidates.schema)
    )


def bloom_fill_ratio(state: DataFrame, params: BloomParams | None = None) -> float:
    """Fraction of set bits (spark-side popcount via mapInPandas).

    With `params`, the denominator is the DESIGN total (params.total_bits), so
    unmaterialized partitions of a sparse state count as genuinely all-zero;
    without it, the ratio is over materialized partitions only (uniform
    hashing materializes every partition within the first non-trivial wave,
    so the two converge immediately in practice).

    This is the saturation health metric the wave loop emits per commit
    (plans/wave.py): a bloom filled past its design point silently raises FPR,
    and a false "seen" silently drops a crawl candidate forever — the failure
    is invisible in outputs, so it must be visible in metrics."""

    def count_bits(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ones = [int(np.unpackbits(np.frombuffer(b, dtype=np.uint8)).sum()) for b in pdf["bits"]]
            total = [len(b) * 8 for b in pdf["bits"]]
            yield pd.DataFrame({"ones": ones, "total": total})

    agg = state.mapInPandas(count_bits, "ones long, total long").agg(
        F.sum("ones").alias("o"), F.sum("total").alias("t")
    ).collect()[0]
    denom = params.total_bits if params is not None else (agg["t"] or 1)
    return (agg["o"] or 0) / max(denom, 1)
