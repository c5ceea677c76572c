"""Politeness: robots gate + per-host budgeted top-k scheduling (north_rule J6/O1).

The reference has NO robots handling and its only anti-hot-host measure is an
unseeded random.shuffle (crawlingathome.py:238) plus the implicit 192-connection
cap. The engine replaces that with explicit, deterministic scheduling:

- robots rules are a small dim table → **broadcast join** on host (never a shuffle
  of the big side's dimension);
- per-host budget from crawl_delay (budget = wave_seconds / delay, min 1);
- priority key = md5(url ‖ wave ‖ seed): the *seeded* equivalent of the reference's
  shuffle, deterministic and uniformly host-spreading (B2 contract);
- per-host top-k via **two-phase window** (local top-k within (host, salt) buckets,
  then final top-k per host): the hot host that owns 30% of all URLs never lands in
  a single window task — the first phase cuts its row count to salt_buckets × k
  before the per-host window runs. At 1000-executor scale this is the difference
  between a straggler task with 30% of the wave and a balanced plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import EngineConfig


def robots_gate(candidates: DataFrame, robots: DataFrame, cfg: EngineConfig) -> DataFrame:
    """Left-broadcast-join robots rules; drop disallowed URLs; attach budget.

    robots: (host, disallow_prefixes: array<string>, crawl_delay: double).
    Missing host ⇒ default-allow with default budget.
    """
    path = F.coalesce(F.parse_url(F.col("url"), F.lit("PATH")), F.lit("/"))
    joined = candidates.join(F.broadcast(robots), "host", "left").withColumn("_path", path)
    disallowed = F.exists(
        F.coalesce(F.col("disallow_prefixes"), F.array().cast("array<string>")),
        lambda p: F.col("_path").startswith(p),
    )
    budget = F.when(
        F.col("crawl_delay").isNull() | (F.col("crawl_delay") <= 0.0),
        F.lit(cfg.default_host_budget),
    ).otherwise(
        F.greatest(
            F.lit(1).cast("long"),
            F.least(
                F.lit(cfg.default_host_budget).cast("long"),
                F.floor(F.lit(cfg.wave_seconds) / F.col("crawl_delay")),
            ),
        )
    )
    return (
        joined.filter(~disallowed)
        .withColumn("host_budget", budget.cast("long"))
        .drop("disallow_prefixes", "crawl_delay", "_path")
    )


def with_priority(df: DataFrame, wave_no: int, cfg: EngineConfig) -> DataFrame:
    """Deterministic seeded scheduling key — replaces random.shuffle
    (crawlingathome.py:238) with a reproducible uniform spread (B2)."""
    return df.withColumn(
        "priority_key",
        F.md5(F.concat(F.col("url"), F.lit(f"|w{wave_no}|s{cfg.seed}"))),
    )


def politeness_split(
    candidates: DataFrame, wave_no: int, cfg: EngineConfig
) -> tuple[DataFrame, DataFrame]:
    """→ (scheduled, deferred). Scheduled = per-host top-budget by priority_key;
    deferred rows stay in the frontier for later waves.

    Two-phase top-k: phase 1 ranks within (host, salt) buckets and keeps at most
    `host_budget` per bucket; phase 2 ranks the survivors per host. Identical
    result to a single per-host window (top-k is decomposable), but the hot-host
    partition is never materialized in one task.
    """
    df = with_priority(candidates, wave_no, cfg)
    if cfg.adaptive_salt:
        # Derive per-host salt counts from the actual host frequencies (SURVEY.md
        # §4: "salt count tuned by host-frequency sketch"): big hosts get enough
        # buckets that no phase-1 window task exceeds ~salt_target_rows rows;
        # singleton hosts get salt=1 (no pointless spread). The host-count agg is
        # map-side combinable and the result is broadcast. Top-k is decomposable,
        # so the scheduled SET is identical for any salt counts — only the task
        # size distribution changes.
        counts = candidates.groupBy("host").agg(F.count(F.lit(1)).alias("_hn"))
        nsalt = F.least(
            F.lit(cfg.salt_buckets).cast("long"),
            F.greatest(F.lit(1).cast("long"), F.ceil(F.col("_hn") / cfg.salt_target_rows)),
        )
        df = df.join(
            F.broadcast(counts.select("host", nsalt.alias("_nsalt"))), "host", "left"
        )
        salt = F.pmod(F.xxhash64(F.col("url")), F.coalesce(F.col("_nsalt"), F.lit(1)))
    else:
        salt = F.pmod(F.xxhash64(F.col("url")), F.lit(cfg.salt_buckets))
    # ONE ranked frame decides the whole split — no anti-join back on url (the
    # round-1 plan re-shuffled the entire wave on url and recomputed the
    # frontier subtree to derive `deferred`). Phase 1: row_number within
    # (host, salt). Phase 2: the per-host rank AMONG PHASE-1 SURVIVORS is the
    # running count of survivors in priority order (a cumulative-sum window on
    # the same host partitioning), which equals row_number over the survivors
    # without materializing them as a separate frame. scheduled and deferred
    # are then complementary filters of the same plan.
    w1 = Window.partitionBy("host", "_salt").orderBy("priority_key", "url")
    w2 = (
        Window.partitionBy("host")
        .orderBy("priority_key", "url")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    surv1 = F.col("_r1") <= F.col("host_budget")
    ranked = (
        df.withColumn("_salt", salt)
        .withColumn("_r1", F.row_number().over(w1))
        .withColumn("_r2", F.sum(F.when(surv1, 1).otherwise(0)).over(w2))
    )
    keep = surv1 & (F.col("_r2") <= F.col("host_budget"))
    rank_cols = ["_r1", "_r2", "_salt"] + (["_nsalt"] if cfg.adaptive_salt else [])
    scheduled = ranked.filter(keep).drop(*rank_cols)
    deferred = ranked.filter(~keep).drop(*rank_cols, "priority_key")
    return scheduled, deferred
