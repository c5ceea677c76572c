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


def parse_robots_txt(
    bodies: DataFrame, agent: str = "cah-worker", body_col: str = "body"
) -> DataFrame:
    """Raw fetched robots.txt bodies → the gate-ready rules dim table.

    bodies: (host, body string, …) — one row per host. Output replaces
    `body_col` with (disallow_prefixes array<string>, crawl_delay double),
    i.e. exactly the `robots` input of `robots_gate`, completing the chain
    from bytes on the wire to the broadcast gate. Semantics are the pinned
    RFC 9309 subset of functions/robots.py (see its docstring); a body with
    no matching group yields ([], null) — identical gate behavior to the
    host being absent (default-allow, default budget), pinned by test.

    Scale shape: this is the DIM side — one row per host, parsed ONCE per
    wave/ingest and then broadcast by robots_gate; the per-URL hot path
    never runs Python. The parse itself is an Arrow-batched pandas UDF
    (never per-row pickling), so even a 10M-host robots corpus is a single
    narrow vectorized stage with no shuffle.
    """
    import pandas as pd

    from ..functions.robots import parse_robots_body

    def _parse_fn(b):
        parsed = [parse_robots_body(x, agent) for x in b]
        return pd.DataFrame(
            {
                "disallow_prefixes": [p for p, _ in parsed],
                "crawl_delay": [d for _, d in parsed],
            }
        )

    # real class objects, not strings: this module's `from __future__ import
    # annotations` would otherwise hand pandas_udf unresolvable 'pd.*' hints
    _parse_fn.__annotations__ = {"b": pd.Series, "return": pd.DataFrame}
    _parse = F.pandas_udf("disallow_prefixes array<string>, crawl_delay double")(_parse_fn)

    keep = [c for c in bodies.columns if c != body_col]
    return bodies.withColumn("_rules", _parse(F.col(body_col))).select(
        *keep, "_rules.disallow_prefixes", "_rules.crawl_delay"
    )


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

    Contract: `host_budget` must be constant per host (robots_gate guarantees
    this — it is a property of the host). Per-row budgets would break
    decomposability: a phase-1-dropped row no longer consumes a phase-2 rank,
    while in a single window it would (pinned by
    tests/test_adaptive_salt.py::test_two_phase_topk_equals_naive_single_window).
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
    # The rank columns fully determine the split, so `deferred` is the union of
    # the two rank complements — no anti-join back on url (the round-1 plan
    # re-shuffled the entire wave on url and recomputed the frontier subtree).
    # Phase 2 must rank ONLY phase-1 survivors (at most salt_buckets × budget
    # rows per host): ranking the full wave per host would put the hot host's
    # entire row set back into one window task — the straggler the two-phase
    # design exists to kill. The union re-reads the upstream twice, which is
    # cheap where it matters (run_wave persists the candidate frame) and
    # strictly less work than the anti-join's url shuffle + subtree recompute.
    w1 = Window.partitionBy("host", "_salt").orderBy("priority_key", "url")
    ranked1 = df.withColumn("_salt", salt).withColumn("_r1", F.row_number().over(w1))
    local = ranked1.filter(F.col("_r1") <= F.col("host_budget")).drop("_r1", "_salt")
    w2 = Window.partitionBy("host").orderBy("priority_key", "url")
    ranked2 = local.withColumn("_r2", F.row_number().over(w2))
    scheduled = ranked2.filter(F.col("_r2") <= F.col("host_budget")).drop("_r2")
    drop_cols = ["priority_key"] + (["_nsalt"] if cfg.adaptive_salt else [])
    deferred = (
        ranked1.filter(F.col("_r1") > F.col("host_budget"))
        .drop("_r1", "_salt")
        .unionByName(ranked2.filter(F.col("_r2") > F.col("host_budget")).drop("_r2"))
        .drop(*drop_cols)
    )
    if cfg.adaptive_salt:
        scheduled = scheduled.drop("_nsalt")
    return scheduled, deferred
