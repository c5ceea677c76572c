"""The wave plan: one micro-batch of the frontier loop, end to end.

Spark-first re-expression of the reference's job loop (crawlingathome.py:210-265,
SURVEY.md §3 E1): each wave is ONE DataFrame DAG —

  frontier ∪ parse(new WAT) → cross-wave canonical dedup → seen-set anti-join
  → robots gate (broadcast) → politeness top-k per host → sample-id assignment
  → simulated fetch (join pairs) → batch decode + filters + CLIP-proxy score
  → append output snapshot + overwrite state tables + lineage metrics → commit.

State lives in warehouse tables, never in executor memory, so a wave is resumable
from any committed snapshot (north_rule). Expected shuffles per wave (SURVEY.md §4):
(1) parse dedup window, (2) seen anti-join, (3) politeness windows, (4) range
partition for sample ids, (5) fetch join — each keyed on the column it must be
keyed on; robots and id-offsets are broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..config import EngineConfig
from ..operators.dedup import seen_filter_exact
from ..operators.fetch import classify_and_score, output_rows, simulated_fetch
from ..operators.parse import parse_links
from ..operators.politeness import politeness_split, robots_gate
from ..operators.schedule import assign_sample_ids, unpersist_sample_ids
from ..state.bloom import STATE_SCHEMA as BLOOM_STATE_SCHEMA
from ..state.bloom import bloom_add, bloom_fill_ratio, seen_gate_bloom
from ..state.cuckoo import STATE_SCHEMA as CUCKOO_STATE_SCHEMA
from ..state.cuckoo import cuckoo_update
from ..state.snapshots import Warehouse

FRONTIER_SCHEMA = (
    "url string, canonical_url string, host string, caption string, license string,"
    " pair_md5 string, image_id string, page_id bigint, pos int, wave_added int"
)
SEEN_SCHEMA = "pair_md5 string, kind string"
RETRY_SCHEMA = "pair_md5 string"


def _obs_count(obs: Observation, df: DataFrame) -> int:
    """Observation value with a count() fallback: when a wave's sub-plan is
    empty, AQE may replace the observed subtree with an empty LocalTableScan
    and the observation row never materializes cleanly."""
    try:
        return int(obs.get["n"])
    except Exception:
        return df.count()


_release_warned = False

# serializes the log4j level raise/restore inside _release_checkpoint —
# concurrent pool-thread releases must not capture another release's ERROR
# as their "previous" level (ADVICE r5)
import threading as _threading

_LOG4J_LOCK = _threading.Lock()


def _fold_ckpt(df: DataFrame) -> DataFrame:
    """localCheckpoint that cannot strand blocks. eager=True registers the
    persist and materializes in one opaque call — if the failure path's
    cancelJobGroup kills that job mid-flight, the half-built checkpoint RDD
    stays registered with NO DataFrame handle left to release it through
    (before round 5 the fill-ratio gather serialized after the fold and hid
    this window; test_failed_wave_releases_all_state caught the strand the
    moment the barrier moved). Split the steps: take the handle first
    (eager=False), materialize under try, release the registration before
    re-raising on any failure — cancellation included."""
    ck = df.localCheckpoint(eager=False)
    try:
        ck.count()
        return ck
    except BaseException:
        _release_checkpoint(ck)
        raise


def _release_checkpoint(df: DataFrame) -> None:
    """Free a localCheckpoint'ed frame's blocks. DataFrame.unpersist() only
    clears the CacheManager entry; the checkpoint RDD is persisted at the RDD
    level (outside the CacheManager) and stays resident until released through
    the LogicalRDD plan node — without this, the session bloom cache leaked
    one checkpointed RDD's blocks per committed wave (tests/test_soak.py).

    The release path leans on private JVM internals (queryExecution → analyzed
    → rdd), so a Spark upgrade that changes the plan shape would silently turn
    every release back into that leak — when it throws, WARN loudly (once per
    process) so the regression is visible the day it happens, but never fail
    the wave on cleanup."""
    global _release_warned
    try:
        jrdd = df._jdf.queryExecution().analyzed().rdd()
        # Unpersisting a locally-checkpointed RDD makes Spark WARN that the
        # lineage is gone — here that is the POINT (the fold is released only
        # after its successor is committed and durable), and one expected line
        # per committed wave buries real warnings in a thousand-wave log
        # (VERDICT r4 item 3). Scope an ERROR-level rule on exactly the
        # emitting logger around the unpersist; restore afterwards. If the
        # log4j API shape changes, degrade to the noisy-but-correct release.
        # The raise→unpersist→restore window is serialized by _LOG4J_LOCK
        # (ADVICE r5): releases run concurrently from pool threads, and an
        # unlocked interleave could read ERROR as a thread's "prev" level and
        # restore it last — permanently suppressing genuine warnings from
        # that logger, not just leaking one line.
        with _LOG4J_LOCK:
            prev = None
            try:
                log4j = df.sparkSession._jvm.org.apache.logging.log4j
                lname = "org.apache.spark.rdd.MapPartitionsRDD"
                prev = log4j.LogManager.getLogger(lname).getLevel()
                log4j.core.config.Configurator.setLevel(lname, log4j.Level.ERROR)
            except Exception:
                prev = None
            try:
                jrdd.unpersist(False)
            finally:
                if prev is not None:
                    try:
                        log4j.core.config.Configurator.setLevel(lname, prev)
                    except Exception:
                        pass
    except Exception as e:
        if not _release_warned:
            _release_warned = True
            import logging

            logging.getLogger(__name__).warning(
                "localCheckpoint release failed (%s: %s) — the session bloom "
                "cache will LEAK one checkpointed RDD's blocks per committed "
                "wave until plans/wave.py:_release_checkpoint is adapted to "
                "this Spark version",
                type(e).__name__,
                e,
            )


def _lineage(df: DataFrame) -> list[dict]:
    rows = (
        df.groupBy(F.spark_partition_id().alias("partition_id"))
        .count()
        .orderBy("partition_id")
        .collect()
    )
    return [{"partition_id": int(r["partition_id"]), "n": int(r["count"])} for r in rows]


def run_wave(
    spark: SparkSession,
    wh: Warehouse,
    cfg: EngineConfig,
    pairs: DataFrame,
    robots: DataFrame,
    wat_links: DataFrame | None = None,
    collect_lineage: bool = True,
    shard_key: str | None = None,
) -> dict:
    """Execute one wave; commit a snapshot; return the manifest.

    `shard_key` identifies the input shard in the manifest so resume logic can
    skip exactly the committed shards (wave_no alone is ambiguous once drain
    waves — which also advance it — enter the history)."""
    import time as _wtime

    _t_entry = _wtime.perf_counter()  # profile anchor (SPARK_GRAFT_WAVE_TIMING)
    parent = wh.latest()
    manifest = wh.new_manifest(parent)
    manifest["shard_key"] = shard_key
    if shard_key is not None:
        manifest.setdefault("completed_shards", []).append(shard_key)
    wave_no = manifest["wave_no"] = (parent["wave_no"] + 1) if parent else 1
    snap_id = manifest["snapshot_id"]
    start_id = manifest["next_sample_id"]

    frontier = wh.read_table(spark, parent, "frontier", FRONTIER_SCHEMA)
    seen_keys = wh.read_table(spark, parent, "seen_keys", SEEN_SCHEMA)
    retry_keys = wh.read_table(spark, parent, "retry_keys", RETRY_SCHEMA)

    # 1. parse new WAT records into candidates (SURVEY.md §2.2)
    if wat_links is not None:
        new_cands = parse_links(wat_links, cfg).withColumn("wave_added", F.lit(wave_no))
    else:
        new_cands = spark.createDataFrame([], FRONTIER_SCHEMA)

    # 2. merge with deferred frontier; cross-wave first-occurrence dedup on the
    #    CANONICAL url (north_rule T6) — older wave wins, then document order.
    cands = frontier.unionByName(new_cands)
    w_can = Window.partitionBy("canonical_url").orderBy("wave_added", "page_id", "pos")
    obs_cands = Observation("cands")
    cands = (
        cands.withColumn("_rn", F.row_number().over(w_can))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .observe(obs_cands, F.count(F.lit(1)).alias("n"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    # 3. global seen-set gate (J2/J3) with retry override (J5).
    # Bloom mode mirrors the reference's TWO bloom families exactly: first the
    # "clipped" bloom (crawlingathome.py:82-87), then the "parsed" bloom (:88-95),
    # with the cuckoo retry slots overriding only the parsed stage. Exact mode is
    # the same logic as anti-joins against key tables (the oracle path).
    if cfg.dedup_mode == "bloom":
        # Absent state tables become EMPTY frames, not driver-materialized
        # zero-bit blooms: every state consumer (fused gate, bloom_add fold,
        # cuckoo ops) treats a missing partition as all-zeros executor-side,
        # and at the 24-GB design point building empty bits on the driver
        # would be an OOM before the first wave ran. State stays sparse:
        # partitions materialize on first write.
        no_state = spark.createDataFrame([], BLOOM_STATE_SCHEMA)
        bloom_c = wh.read_table(spark, parent, "bloom_clipped", BLOOM_STATE_SCHEMA) or no_state
        bloom_p_base = wh.read_table(spark, parent, "bloom_parsed", BLOOM_STATE_SCHEMA) or no_state
        # delta-maintained bloom: base bits ∪ per-wave key deltas, OR-merged at
        # read (lazy — one extra cogroup in the same job), compacted below
        parsed_deltas = (parent or {}).get("tables", {}).get("bloom_parsed_delta", [])
        # SESSION CACHE of the OR-merged parsed bloom (ROADMAP gap 4 / VERDICT
        # r2 item 2): within one driver session the merged bits stay persisted
        # executor-side between waves, so the read path pays neither the base-
        # bits parquet re-read (24 GB at design scale) nor the re-fold of ALL
        # accumulated deltas — each wave folds only ITS OWN keys once, at
        # commit. Keyed by parent snapshot id: a fresh Warehouse object (crash
        # resume) or a foreign commit misses and falls back to the table read.
        cache = getattr(wh, "_bloom_session_cache", None)
        if cache is not None and parent and cache["snap"] == parent["snapshot_id"]:
            bloom_p = cache["df"]
        elif parsed_deltas:
            delta_keys = wh.read_table(spark, parent, "bloom_parsed_delta", RETRY_SCHEMA)
            bloom_p = bloom_add(bloom_p_base, delta_keys, cfg.bloom, key="pair_md5")
        else:
            bloom_p = bloom_p_base
        cuckoo = wh.read_table(
            spark, parent, "cuckoo_state", CUCKOO_STATE_SCHEMA
        ) or spark.createDataFrame([], CUCKOO_STATE_SCHEMA)
        # FUSED gate: clipped ∧ parsed ∧ retry membership in ONE cogroup
        # shuffle of the wave (the states are co-partitioned by the same key);
        # replaces two bloom shuffles + a cuckoo shuffle + union + dedup.
        unseen = seen_gate_bloom(
            cands, bloom_c, bloom_p, cuckoo, cfg.bloom, cfg.cuckoo, key="pair_md5"
        )
    else:
        unseen = seen_filter_exact(cands, seen_keys, retry_keys)
    obs_unseen = Observation("unseen")
    unseen = unseen.observe(obs_unseen, F.count(F.lit(1)).alias("n"))

    # 4. robots gate (broadcast join, J6) + politeness top-k per host (O1)
    # persist the gated frame: the scheduled pipeline AND the deferred/frontier
    # write both consume it — without the persist the seen-gate cogroup (the
    # wave's biggest state stage) executes once per action
    gated = robots_gate(unseen, robots, cfg).persist(StorageLevel.MEMORY_AND_DISK)
    scheduled, deferred = politeness_split(gated, wave_no, cfg)

    # 5. contiguous sample ids in priority order (W1) — scale-safe assignment
    scheduled = assign_sample_ids(scheduled, start_id)

    # 6. simulated fetch + decode + filters + score (F9/F10 + CLIP proxy)
    fetched = simulated_fetch(scheduled, pairs)
    classified = classify_and_score(fetched, cfg).persist(StorageLevel.MEMORY_AND_DISK)
    # NOTE: the status counts deliberately do NOT ride an observe() under the
    # pairs_out sort — a global orderBy runs its child twice in one query
    # (range-boundary sampling pass + real pass) and CollectMetrics would
    # double-count every row. They run as a concurrent groupBy job instead.
    out = output_rows(classified).orderBy("sample_id")

    # 7. state updates — the stage-B plans are CONSTRUCTED here, before any job
    # is submitted: plan construction is driver-side Catalyst analysis (~0.4 s
    # per wave at bench scale, measured with SPARK_GRAFT_WAVE_TIMING) and would
    # otherwise sit on the critical path between the status gather and the
    # stage-B submit. Which plans are actually WRITTEN is decided after the
    # status counts arrive; unwritten plans are lazy and cost nothing.
    attempted = classified.select("pair_md5", "fetch_status")
    if cfg.dedup_mode == "bloom":
        will_compact = len(parsed_deltas) + 1 >= cfg.bloom_compact_every
        # merged bits ∪ this wave's keys: the session-cache fold, and (at a
        # compaction boundary) also the new base-bits table
        plan_added = bloom_add(bloom_p, attempted.select("pair_md5"), cfg.bloom, key="pair_md5")
        if will_compact:
            plan_added = plan_added.persist(StorageLevel.MEMORY_AND_DISK)
        plan_delta = attempted.select("pair_md5").distinct()
        if not cfg.reference_strict:
            plan_cuckoo = cuckoo_update(
                cuckoo,
                inserts=attempted.filter(F.col("fetch_status") == "error").select("pair_md5"),
                deletes=attempted.filter(F.col("fetch_status") != "error").select("pair_md5"),
                params=cfg.cuckoo,
            )
    else:
        plan_seen = seen_keys.unionByName(
            attempted.select("pair_md5").distinct().withColumn("kind", F.lit("parsed"))
        ).dropDuplicates(["pair_md5", "kind"])
        if cfg.reference_strict:
            plan_retry = retry_keys  # reference loses retries (B3) — keep state as-is
        else:
            plan_retry = (
                retry_keys.unionByName(
                    attempted.filter(F.col("fetch_status") == "error").select("pair_md5")
                )
                .distinct()
                .join(
                    attempted.filter(F.col("fetch_status") != "error").select("pair_md5"),
                    "pair_md5",
                    "left_anti",
                )
            )

    tables = manifest["tables"]

    obs_deferred = Observation("deferred")
    frontier_out = deferred.select(*frontier.columns).observe(
        obs_deferred, F.count(F.lit(1)).alias("n")
    )

    def _set(key):
        def setter(rel):
            tables[key] = [rel]

        return setter

    # ONE pool, STAGED submission (concurrent Spark jobs from driver threads):
    # at bench scale a committed wave is otherwise dominated by 5-7 small
    # sequential jobs each paying a constant per-job latency. Stage A =
    # frontier write + pairs_out write + status groupBy (the heavy
    # materializations, overlapped; all three share the persisted
    # `classified`/`gated` frames — racing first-materialization at worst
    # computes a partition twice into the same cache, values deterministic).
    #
    # Observation exactness under the race: obs_cands/obs_unseen sit BELOW
    # cache boundaries, so in principle racing queries could split partition
    # attribution across their CollectMetrics accumulators. Measured on this
    # Spark version (3 heterogeneous concurrent actions over a cold persisted
    # observed frame, 6/6 trials exact) the cache's per-partition compute
    # locking keeps the latched observation exact; _obs_count's count()
    # fallback and the e2e counters-equality tests (engine ≡ oracle, every
    # run) guard the assumption against a future Spark changing attribution.
    # Stage B (state writes + session-cache fold) is submitted OPTIMISTICALLY
    # with stage A for input waves: every state plan's CONTENT is fixed at
    # plan-construction time — only whether the manifest REGISTERS the write
    # depends on the status counts, and registration happens after status as
    # before. An input wave that schedules zero rows (rare) just leaves an
    # unregistered orphan dir — the same invisible-until-committed lifecycle
    # as a failed wave's files. Drain waves (wat_links is None) keep the
    # post-status submission so provably-empty waves still skip state writes
    # entirely. Lineage submits when status resolves; stage C (metrics)
    # further needs the observe() values carried by the frontier write.
    from concurrent.futures import ThreadPoolExecutor as _TPE

    # optional phase profile (SPARK_GRAFT_WAVE_TIMING=1): stage wall seconds
    # to stderr — the feedback loop for fixed-cost work (tools/profile_wave.py)
    import os as _os
    import sys as _sys
    import time as _time

    _timing = _os.environ.get("SPARK_GRAFT_WAVE_TIMING") == "1"
    _t0 = _time.perf_counter()

    # Every pool job runs under this wave's job group so a failed/interrupted
    # wave can cancel its in-flight sibling jobs instead of blocking until
    # they drain (Spark job groups are thread-local — each pool thread must
    # set it before running its action).
    _job_group = f"wave-{snap_id}"

    def _timed(label, fn):
        """Pool-job wrapper: tags the thread with the wave's job group; with
        SPARK_GRAFT_WAVE_TIMING=1 also prints per-job start offset + duration."""

        def wrapped(*a, **k):
            spark.sparkContext.setJobGroup(_job_group, f"wave {wave_no}: {label}")
            s = _time.perf_counter()
            r = fn(*a, **k)
            if _timing:
                e = _time.perf_counter()
                print(
                    f"[wave-timing]   job {label}: start+{s - _t0:.3f}s dur={e - s:.3f}s",
                    file=_sys.stderr,
                )
            return r

        return wrapped

    ex = _TPE(max_workers=8)
    # Every pool job below except the metrics write has the cached session
    # bloom frame somewhere in its lineage (the seen gate feeds everything).
    # Track those futures so the failure path can tell a GENUINE cache-reader
    # failure (possible lost checkpoint blocks) from a driver-side failure
    # that cannot have touched them (ADVICE r4 — scope the cache eviction).
    cache_readers: list = []

    def _submit(fn, *a, _reads_cache: bool = True, **k):
        fut = ex.submit(fn, *a, **k)
        if _reads_cache:
            cache_readers.append(fut)
        return fut

    try:
        f_frontier = _submit(
            _timed("frontier", wh.write_table), frontier_out, "frontier", snap_id
        )
        f_out = _submit(_timed("pairs_out", wh.write_table), out, "pairs_out", snap_id)

        # OPTIMISTIC stage B (input waves only — see the pool comment above):
        # state-write content never depends on the status counts, so the jobs
        # start alongside stage A and fully overlap the pairs_out sort instead
        # of queueing behind the status gather (measured ~1.4 s of stage-B
        # tail serialized behind a ~1.4 s status job at bench scale). Whether
        # the manifest REGISTERS each write is still decided post-status.
        parent_tables = (parent or {}).get("tables", {})
        # cuckoo: parent emptiness rides the manifest so waves that cannot
        # change the table (no failures to insert, nothing to delete from an
        # empty table, or nothing attempted at all) skip the rewrite entirely
        # (VERDICT r2 item 2). Pre-field manifests with a cuckoo table are
        # conservatively treated as non-empty.
        parent_cuckoo_nonempty = bool(
            (parent or {}).get("cuckoo_nonempty", bool(parent_tables.get("cuckoo_state")))
        )
        opt: dict = {}  # table name -> already-submitted write future
        f_fold = None
        if wat_links is not None:
            if cfg.dedup_mode == "bloom":
                if will_compact:
                    opt["bloom_parsed"] = _submit(
                        _timed("bloom_parsed", wh.write_table),
                        plan_added, "bloom_parsed", snap_id,
                    )
                else:
                    opt["bloom_parsed_delta"] = _submit(
                        _timed("bloom_parsed_delta", wh.write_table),
                        plan_delta, "bloom_parsed_delta", snap_id,
                    )
                if cfg.reference_strict:
                    if not parent_tables.get("cuckoo_state"):
                        opt["cuckoo_state"] = _submit(
                            _timed("cuckoo_state", wh.write_table),
                            cuckoo, "cuckoo_state", snap_id,
                        )
                elif parent_cuckoo_nonempty:
                    # needed whenever anything was attempted; a rare empty
                    # input wave leaves it an unregistered orphan
                    opt["cuckoo_state"] = _submit(
                        _timed("cuckoo_state", wh.write_table),
                        plan_cuckoo, "cuckoo_state", snap_id,
                    )
                # input waves always fold: plan_added is a fresh merge, never
                # the cached frame (see the fold comment below for semantics)
                f_fold = _submit(
                    _timed("bloom_fold", lambda: _fold_ckpt(plan_added))
                )
            else:
                opt["seen_keys"] = _submit(
                    _timed("seen_keys", wh.write_table), plan_seen, "seen_keys", snap_id
                )
                opt["retry_keys"] = _submit(
                    _timed("retry_keys", wh.write_table), plan_retry, "retry_keys", snap_id
                )

        status_counts = _submit(
            _timed(
                "status",
                lambda: {
                    r["fetch_status"]: r["count"]
                    for r in classified.groupBy("fetch_status").count().collect()
                },
            )
        ).result()
        _t1 = _time.perf_counter()
        n_scheduled = sum(status_counts.values())
        n_errors = status_counts.get("error", 0)
        n_ok = status_counts.get("ok", 0)

        state_futs: list[tuple] = []  # (write future, manifest setter)

        def _reg(name, df, setter):
            """Register a state write in the manifest: reuse the optimistic
            future when one was submitted, else submit now (drain waves, and
            cuckoo when the parent table was empty)."""
            fut = opt.pop(name, None)
            if fut is None:
                fut = _submit(_timed(name, wh.write_table), df, name, snap_id)
            state_futs.append((fut, setter))

        if cfg.dedup_mode == "bloom":
            # J4: bloom-add ALL attempted keys to "parsed" (crawlingathome.py:148-154).
            # Delta maintenance: this wave writes only its KEYS; the 24-GB-design-
            # point bit table is only rewritten at compaction. The clipped bloom is
            # owned by the downstream CLIP stage: its parent pointer is carried
            # forward untouched (never copied). seen/retry key TABLES are exact-mode
            # state and are not written at all in bloom mode.
            if parent and parent["tables"].get("bloom_clipped"):
                tables["bloom_clipped"] = list(parent["tables"]["bloom_clipped"])
            next_merged = bloom_p  # what the session cache holds after this commit
            if n_scheduled == 0:
                # empty wave (e.g. drain with nothing scheduled): no keys to
                # add — carry every parsed pointer forward untouched, register
                # nothing (an optimistic write, if one ran, stays an invisible
                # orphan dir)
                if parent and parent["tables"].get("bloom_parsed"):
                    tables["bloom_parsed"] = list(parent["tables"]["bloom_parsed"])
                tables["bloom_parsed_delta"] = list(parsed_deltas)
                if f_fold is not None:
                    # the optimistic fold merged ZERO keys, so it is content-
                    # identical to the merged parsed bloom — keep it as the
                    # session cache rather than discarding the checkpoint
                    next_merged = plan_added
                elif will_compact:
                    plan_added.unpersist()  # speculative persist, never written
            elif will_compact:
                tables["bloom_parsed_delta"] = []
                _reg("bloom_parsed", plan_added, _set("bloom_parsed"))
                next_merged = plan_added  # the write materializes it
            else:
                if parent and parent["tables"].get("bloom_parsed"):
                    tables["bloom_parsed"] = list(parent["tables"]["bloom_parsed"])

                def _append_delta(rel, base=list(parsed_deltas)):
                    tables["bloom_parsed_delta"] = base + [rel]

                _reg("bloom_parsed_delta", plan_delta, _append_delta)
                next_merged = plan_added
            if cfg.reference_strict:
                if parent and parent_tables.get("cuckoo_state"):
                    tables["cuckoo_state"] = list(parent_tables["cuckoo_state"])
                else:
                    _reg("cuckoo_state", cuckoo, _set("cuckoo_state"))
                manifest["cuckoo_nonempty"] = parent_cuckoo_nonempty
            elif n_scheduled == 0 or (n_errors == 0 and not parent_cuckoo_nonempty):
                if parent and parent_tables.get("cuckoo_state"):
                    tables["cuckoo_state"] = list(parent_tables["cuckoo_state"])
                manifest["cuckoo_nonempty"] = parent_cuckoo_nonempty
            else:
                _reg("cuckoo_state", plan_cuckoo, _set("cuckoo_state"))
                # deletions may have emptied it, but claiming non-empty is safe
                # (costs at most one later rewrite, never a wrong gate)
                manifest["cuckoo_nonempty"] = parent_cuckoo_nonempty or n_errors > 0
        else:
            _reg("seen_keys", plan_seen, _set("seen_keys"))
            _reg("retry_keys", plan_retry, _set("retry_keys"))

        # stage B remainder: a state write not submitted optimistically (drain
        # waves; cuckoo on an empty parent) entered the pool via _reg above;
        # lineage submits here.
        #
        # The session-cache fold: localCheckpoint materializes the merged
        # bloom (its lineage runs through `classified`, which the finally
        # block unpersists) and TRUNCATES the lineage — without truncation the
        # cached plan would chain every prior wave's full pipeline
        # (observe-name collisions immediately, analysis-time blowup at wave
        # counts that matter). The fold work equals what the next wave's read
        # path would otherwise pay, minus the base-bits parquet re-read;
        # computing it is side-effect-free, so it runs BEFORE commit and is
        # only REGISTERED (or discarded) depending on the commit outcome.
        # Blocks are session-local: a lost executor fails the wave's gate job,
        # and the rerun rebuilds the cache from the durable base+delta tables
        # (resume semantics).
        old_cache = getattr(wh, "_bloom_session_cache", None)
        fold_needed = cfg.dedup_mode == "bloom" and not (
            old_cache is not None and next_merged is old_cache["df"]
        )
        if fold_needed and f_fold is None:  # drain wave that changed state
            f_fold = _submit(
                _timed("bloom_fold", lambda: _fold_ckpt(next_merged))
            )
        # optimistic ⇒ input wave ⇒ next_merged is a fresh merge, so a
        # submitted fold is always needed; a future re-keying path that breaks
        # this invariant must also release the checkpoint it no longer wants
        assert f_fold is None or fold_needed
        # bloom saturation health (VERDICT r4 item 3): an over-filled bloom
        # silently raises FPR and a false "seen" silently drops candidates
        # forever, so saturation must surface in metrics. The popcount is a
        # full scan of the bloom bits, and per-wave it sits on the serialized
        # fold→fill→metrics tail (profiled: ~0.4 s at bench scale, a full
        # multi-GB state scan at design point) — so recompute EXACTLY only at
        # compaction boundaries (and on the first state-writing wave, when no
        # parent value exists); every other wave carries the parent's value
        # forward. Staleness is bounded by bloom_compact_every waves, and the
        # ratio moves monotonically and slowly between compactions — the 0.5
        # warn threshold is capacity planning, not a per-wave alarm.
        fill_known = bool(parent and parent.get("bloom_fill_ratio") is not None)
        f_fill = (
            _submit(
                _timed("bloom_fill", lambda: bloom_fill_ratio(f_fold.result(), cfg.bloom))
            )
            if f_fold is not None and (will_compact or not fill_known)
            else None
        )
        f_lin = (
            (
                _submit(_timed("lineage_sched", _lineage), scheduled),
                _submit(_timed("lineage_out", _lineage), out),
            )
            if collect_lineage
            else None
        )

        # 9. counters (A1, north_rule per-partition granularity): statuses came
        # from the stage-A groupBy; deferred rides the frontier write's
        # observe(), so gather that first. candidates/unseen observe() nodes
        # materialized under whichever stage-A job won the cache race.
        tables["frontier"] = [f_frontier.result()]
        counters = {
            "candidates": _obs_count(obs_cands, cands),
            "unseen": _obs_count(obs_unseen, unseen),
            "scheduled": n_scheduled,
            "deferred": _obs_count(obs_deferred, deferred),
            "fetched_ok": n_ok,
            "rejected": n_scheduled - n_ok - n_errors,
            "errors": n_errors,
        }
        # Invariant guard on the observe() values (ADVICE r3): counter
        # exactness under the staged pool rests on the cache's per-partition
        # compute locking keeping CollectMetrics attribution whole across the
        # concurrent stage-A actions — measured exact on this Spark version,
        # but a future version splitting attribution would return silently
        # wrong counters. The pipeline only narrows, so
        # candidates >= unseen >= scheduled + deferred must hold; a violation
        # triggers the count() fallback over the persisted frames.
        # Scope (review r4): the guard is ONE-SIDED — it catches lost/split
        # attribution (under-count), not a proportional over-attribution that
        # inflates candidates and unseen together; exactness itself is pinned
        # by the e2e counters≡oracle tests. It also leans on the fetch data
        # contract that `pairs` is unique per image_id (simulated_fetch is a
        # left join, so duplicate pairs keys would inflate n_scheduled and
        # falsely trip the fallback — and would already duplicate output
        # sample_ids, a corruption upstream of any counter).
        if not (
            counters["candidates"]
            >= counters["unseen"]
            >= n_scheduled + counters["deferred"]
        ):
            counters["candidates"] = cands.count()
            counters["unseen"] = unseen.count()
            counters["deferred"] = deferred.count()
        manifest["counters"] = counters
        if f_lin is not None:
            manifest["lineage"] = {
                "scheduled": f_lin[0].result(),
                "output": f_lin[1].result(),
            }

        # bloom saturation: gather the fill ratio so it rides BOTH the
        # manifest and the metrics table; waves that leave the bloom state
        # untouched carry the parent's value forward (still current).
        fill = f_fill.result() if f_fill is not None else None
        if fill is None and cfg.dedup_mode == "bloom" and parent:
            fill = parent.get("bloom_fill_ratio")
        if fill is not None:
            fill = round(float(fill), 6)  # one rounding, shared by manifest + ppm row
            manifest["bloom_fill_ratio"] = fill
            if fill > cfg.bloom_warn_fill:
                import logging

                logging.getLogger(__name__).warning(
                    "parsed bloom fill ratio %.3f exceeds %.2f — the filter is "
                    "at/beyond design capacity, its FPR is degrading and false "
                    "\"seen\" verdicts will silently drop candidates; recompact "
                    "into a larger BloomParams.capacity",
                    fill,
                    cfg.bloom_warn_fill,
                )

        # stage C — metrics table: totals (partition_id = -1) + per-partition
        # lineage rows (north_rule: per-partition fetched/filtered/rejected
        # counters); needs the gathered counters, overlaps the remaining tail
        metric_rows = [(wave_no, k, -1, int(v)) for k, v in counters.items()]
        if fill is not None:
            metric_rows.append((wave_no, "bloom_fill_ppm", -1, int(round(fill * 1_000_000))))
        for stage, parts in manifest.get("lineage", {}).items():
            metric_rows += [(wave_no, stage, p["partition_id"], p["n"]) for p in parts]
        metrics = spark.createDataFrame(
            metric_rows, "wave_no int, counter string, partition_id int, value long"
        )
        f_metrics = _submit(
            _timed("metrics", wh.write_table), metrics, "metrics", snap_id,
            _reads_cache=False,  # driver-built rows — never touches the cache
        )

        # gather everything
        tables.setdefault("pairs_out", []).append(f_out.result())
        for fut, setter in state_futs:
            setter(fut.result())
        for fut in opt.values():
            # unregistered optimistic writes (rare empty input wave): await so
            # genuine errors (disk full) surface; the dirs stay invisible
            # orphans — no manifest ever points at them
            fut.result()
        tables.setdefault("metrics", []).append(f_metrics.result())
        new_cache_df = f_fold.result() if f_fold is not None else None
    except BaseException:
        # FAILED (or interrupted) wave: cancel this wave's in-flight sibling
        # jobs — without the cancel, shutdown(wait=True) blocks until every
        # running write drains (minutes at scale) before the error/Ctrl-C
        # propagates. Then release everything the commit-path finally below
        # would have — the wave's persisted frames, the speculative compaction
        # persist, and a fold checkpoint if that job got far enough.
        # Snapshot BEFORE cancelling: did a job that actually reads the cached
        # bloom frame fail on its own? Only such a failure can mean lost or
        # broken checkpoint blocks (executor death mid-gate). Futures the
        # cancel below kills fail because of US, not because of block loss.
        genuine_reader_failure = any(
            f.done() and not f.cancelled() and f.exception() is not None
            for f in cache_readers
        )
        try:
            spark.sparkContext.cancelJobGroup(_job_group)
        except Exception:
            pass
        ex.shutdown(wait=True, cancel_futures=True)
        _f = locals().get("f_fold")
        if _f is not None:
            try:
                _release_checkpoint(_f.result())
            except Exception:
                pass
        if cfg.dedup_mode == "bloom" and will_compact:
            # plan_added is persisted at plan-construction time, BEFORE the
            # pool — next_merged may not be bound yet, so release it directly
            if plan_added.storageLevel != StorageLevel.NONE:
                plan_added.unpersist()
        # A failed gate job can leave the session cache's (non-replicated,
        # lineage-truncated) checkpoint blocks broken — an in-process retry on
        # this same Warehouse object would hit the same snapshot key and reuse
        # the broken checkpoint on every retry until the process restarted.
        # Drop the cache so the retry rebuilds from the durable base+delta
        # tables (ADVICE r3). SCOPED (ADVICE r4): only when a cache-READING
        # job genuinely failed — a driver-side failure (metrics write error,
        # Ctrl-C before a gate job died) cannot corrupt immutable cached
        # blocks, and evicting there forces the retry to re-pay the full
        # base+delta refold for nothing. A genuine reader failure racing the
        # cancel above can be missed at most once, and self-heals: the
        # retry's own gate job then fails and evicts on ITS failure path.
        if genuine_reader_failure:
            _stale = getattr(wh, "_bloom_session_cache", None)
            if _stale is not None:
                wh._bloom_session_cache = None
                _release_checkpoint(_stale["df"])
        for _df in (cands, gated, classified):
            _df.unpersist()
        unpersist_sample_ids(scheduled)
        raise
    finally:
        ex.shutdown(wait=True)
    _t2 = _time.perf_counter()

    manifest["next_sample_id"] = start_id + n_scheduled
    committed = False
    try:
        wh.commit(manifest)  # may raise ConcurrentCommitError (loser of a race)
        committed = True
        if cfg.dedup_mode == "bloom":
            if not fold_needed:
                # state unchanged this wave — re-key the existing cache
                wh._bloom_session_cache = {"snap": manifest["snapshot_id"], "df": next_merged}
            else:
                wh._bloom_session_cache = {"snap": manifest["snapshot_id"], "df": new_cache_df}
                if old_cache is not None:
                    _release_checkpoint(old_cache["df"])
    finally:
        if new_cache_df is not None and not committed:
            _release_checkpoint(new_cache_df)  # commit lost the race — discard the fold
        if not committed:
            # lost the commit race: the next wave reads the winner's snapshot,
            # so this cache's key can never hit again — release it now instead
            # of leaking its checkpoint blocks for the rest of the session
            _stale = getattr(wh, "_bloom_session_cache", None)
            if _stale is not None:
                wh._bloom_session_cache = None
                _release_checkpoint(_stale["df"])
        if fold_needed and next_merged.storageLevel != StorageLevel.NONE:
            next_merged.unpersist()  # the pre-checkpoint persist (compaction path)
        cands.unpersist()
        gated.unpersist()
        classified.unpersist()
        unpersist_sample_ids(scheduled)
    if _timing:
        _t3 = _time.perf_counter()
        print(
            f"[wave-timing] wave={wave_no} prep={_t0 - _t_entry:.3f}s"
            f" stageA_status={_t1 - _t0:.3f}s"
            f" writes={_t2 - _t1:.3f}s commit={_t3 - _t2:.3f}s",
            file=_sys.stderr,
        )
    return manifest
