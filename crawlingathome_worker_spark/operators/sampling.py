"""Exact stratified sampling — the data-mixing step of a training-data build.

Spark's own `sampleBy` is Bernoulli (approximate counts, run-dependent under
retries); a training mix wants EXACT per-stratum quotas and bit-reproducible
membership. This operator keeps, per stratum, the `quota` rows that rank
lowest under a seeded uniform hash of the row id — deterministic across runs,
cluster sizes, and partitionings.

Scale shape: the same decomposable two-phase top-k as the politeness
scheduler (operators/politeness.py): phase 1 ranks within (stratum, salt)
buckets and keeps at most `quota` per bucket, phase 2 ranks the ≤
salt_buckets × quota survivors per stratum — a hot stratum (en is ~half of
any web corpus) never materializes in a single window task. Decomposability
requires the quota to be constant per stratum (it is — a property of the
stratum), the same contract politeness_split pins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    quotas: DataFrame,
    id_col: str,
    seed: int = 42,
    salt_buckets: int = 16,
) -> DataFrame:
    """Keep per stratum the `quota` rows ranking lowest by
    md5(id ‖ seed) (ties broken by id — total order, so membership is
    unique). `quotas`: (stratum_col, quota long) — small dim, broadcast.
    Strata absent from `quotas` are dropped entirely; a stratum with fewer
    rows than its quota keeps them all. Output columns = input columns."""
    key = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f"|s{seed}")))
    d = df.join(F.broadcast(quotas), stratum_col).withColumn("_k", key)
    salt = F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(salt_buckets))
    w1 = Window.partitionBy(stratum_col, "_salt").orderBy("_k", id_col)
    local = (
        d.withColumn("_salt", salt)
        .withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= F.col("quota"))
        .drop("_r1", "_salt")
    )
    w2 = Window.partitionBy(stratum_col).orderBy("_k", id_col)
    return (
        local.withColumn("_r2", F.row_number().over(w2))
        .filter(F.col("_r2") <= F.col("quota"))
        .drop("_r2", "_k", "quota")
    )
