"""The crawl loop — §3.1 lifecycle: one round = one DataFrame job chain.

Per round, over icelite snapshot tables (frontier / seen / corpus /
trace / lineage):

  1. read frontier snapshot (pending URLs)
  2. J2/P5 robots gate (broadcast join + codegen'd longest-prefix)
  3. J3/W1/P6 per-host budget top-k (salted two-stage window)
  4. U3 fetch (Arrow-batch synthetic web)
  5. O1 global fetch order -> trace append
  6. U4 decode/verify -> corpus append
  7. links: explode + canon (U1) + score (U2) + scheme/depth filter
     + T1 deterministic batch dedup + (optional bloom prefilter) +
     J1 exact anti-join vs seen
  8. commit: seen += new links, frontier = residual ∪ new links,
     lineage += per-partition metrics

Determinism contract (SURVEY.md §7 hard part 1): ordering key =
(relevance_q desc, depth, discovery_time, discovery_seq) — all
integral; discovery_seq is a dense ADMISSION counter: admitted seeds
are numbered 1..n in seed-file order, and each round's admitted new
links get n_seen_before_round + rank over (parent_seq, link_index) —
the Mercator-style "URL id = discovery order" design.  Unique by
construction (base = the seen row count, ranks dense), and BOUNDED by
the total URLs ever discovered at any scale.  The previous tree-path
encoding (parent_seq*(MAX_LINKS*2) + idx + 1) grew log2(stride) bits
per depth level and overflowed int64 at depth ~6 in the round-5
60M-key design-point run (the pure-Python oracle's bignums masked it
at small SF); within one round the two encodings order candidates
identically — both are monotone in (parent_seq, idx) — and across
rounds discovery_time breaks first, so the schedule semantics are
unchanged.  discovery_time = T0 + round seconds (deterministic, not
wall-clock).
"""

from __future__ import annotations

import os
import secrets
import shutil
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from datetime import timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import icelite
from ..core.relevance import REL_Q_PER_UNIT, SEED_RELEVANCE_Q
from ..functions import (
    canon_udf,
    host_expr,
    relevance_expr,
    url_hash_expr,
    with_canon_and_relevance,
)
from ..operators.dedup import (
    anti_join_seen,
    anti_join_seen_files,
    bloom_prefilter,
    bloom_prefilter_files,
    build_bloom_shards,
    dedup_batch,
    update_bloom_shard_files,
    update_bloom_shards,
    write_bloom_shard_files,
)
from ..operators.fetch import fetch_selected
from ..operators.gates import scheme_depth_gate
from ..operators.politeness import (
    global_fetch_order,
    global_rank,
    select_per_host_topk,
    with_budget,
    with_crawl_delay_cap,
)
from ..operators.robots import latest_robots, with_robots_decision
from ..schemas import FRONTIER, HOST_BUDGET, ROBOTS
from ..sources import fixtures as fx

# compaction cadence applied automatically once the file-probed seen
# join engages and the caller left compact_seen_every at 0 (auto)
AUTO_COMPACT_SEEN_EVERY = 8


@dataclass
class CrawlConfig:
    root: str
    max_depth: int = 3
    default_budget: int = fx.DEFAULT_BUDGET
    n_shards: int = 16
    salt: int = 8
    use_bloom: bool = False
    bloom_fpp: float = 0.01
    # bloom crossover: below this seen-set size the prefilter's two
    # extra python jobs cost more than the exact anti-join they would
    # save — skip them (the anti-join is always the authority, so this
    # never changes results; trace tests pin that by forcing
    # bloom_min_keys=0).  At the 10^10 design point the filter always
    # engages.
    bloom_min_keys: int = 50_000
    # second crossover (SURVEY §4.2): past this seen-set size the
    # merged shard bitmaps are multi-GB in aggregate — they are written
    # as partition-local parquet files (write_bloom_shard_files) and
    # probed in place (bloom_prefilter_files, 1-2 shard reads per
    # task), instead of collect+broadcast through the driver.  50M keys
    # at fpp=0.01 is ~60 MB of bitmap — the last size where a driver
    # round-trip is still harmless; at the 10^10 design point the file
    # path always engages.  Results identical either way (trace test
    # pins it by forcing bloom_file_min_keys=0).
    bloom_file_min_keys: int = 50_000_000
    # third crossover: past this seen-set size the EXACT anti-join's
    # sort-merge shuffle of the full seen table (the single largest
    # per-round data movement at 10^10 keys — left-anti cannot
    # broadcast its right side) is replaced by the file-probed join
    # (operators.dedup.anti_join_seen_files): links are range-
    # partitioned by url_hash and each task reads ONLY the seen files
    # overlapping its range, via the manifest's commit-time per-file
    # url_hash stats.  Results identical (trace test pins it by forcing
    # seen_join_file_min_keys=0).
    seen_join_file_min_keys: int = 50_000_000
    # bloom rebuild TRIGGER headroom: a full rebuild fires when n_seen
    # outgrows capacity = n_seen_at_build * bloom_capacity_factor.
    # Bitmap SIZING is not scaled by this knob — a (re)build always
    # sizes bitmaps for fixed 1.5x the build-time n_seen
    # (operators.dedup._merged_shard_bitmaps), which is why the rebuild
    # COST at a given n_seen is factor-independent (the property the
    # design-point maintenance run relies on: lowering the factor to
    # ~1.0 fires rebuilds mid-run at full, representative cost without
    # simulating 50% table growth).  Consequences: factor < 1.5 only
    # rebuilds earlier than the sized headroom strictly needs; factor
    # > 1.5 defers rebuilds past it, letting fpp degrade gradually
    # between 1.5x and factor-x growth — a perf matter only (more
    # definitely-fresh links reach the exact anti-join, which stays
    # the authority).
    bloom_capacity_factor: float = 1.5
    # compact+expire the seen table every K rounds (0 = auto).  Physical
    # maintenance only — never changes results (trace-test-pinned).
    # Auto: off while the seen table is small, but once the file-probed
    # exact anti-join engages (seen_join_file_min_keys) compaction
    # becomes MANDATORY every ``AUTO_COMPACT_SEEN_EVERY`` rounds: the
    # probe's per-task memory is bounded by compaction's target file
    # size, and an append-only table accumulating O(rounds) files per
    # hash range would erode that bound (round-3 ADVICE).
    compact_seen_every: int = 0
    # frontier maintenance mode.  "replace" (default): each round
    # commits the full residual ∪ new-links frontier — simple, but an
    # O(frontier) rewrite per round, which at the 10^10-row design
    # point dwarfs the actual per-round delta (new links + budget).
    # "append" (LSM-style): the frontier table is append-only (new
    # links per round) plus a fetched/blocked tombstone-keys table;
    # the pending set is resolved at read time by the same zero-shuffle
    # file-probed anti-join the seen set uses, and every
    # ``compact_frontier_every`` rounds the materialized pending set
    # replace-commits both tables — so per-round write cost is
    # O(delta), amortized O(frontier / K) for maintenance.  Results
    # identical (trace test pins it, including through a compaction).
    frontier_mode: str = "replace"
    compact_frontier_every: int = 8
    # robots crawl-delay enforcement: when > 0, each host's effective
    # per-round budget is additionally capped at
    # floor(round_window_s / crawl_delay) (floored at 1) — a host whose
    # robots asks for d seconds between fetches cannot sustain more
    # fetches inside one round window.  0 (default) = budget-only
    # politeness, the reference-trace semantics.  Enforced identically
    # in the oracle (tests/oracle_crawler.py round_window_s) so trace
    # parity is exact either way.
    round_window_s: float = 0.0
    robots_rows: list = field(default_factory=fx.make_robots)
    budget_rows: list = field(default_factory=fx.make_budgets)
    # per-crawl memo of the static dim DataFrames (robots/budgets do
    # not change between rounds; rebuilding + re-broadcasting them
    # every round is pure serial driver overhead)
    _dims: dict = field(default_factory=dict, repr=False, compare=False)

    def table(self, name: str) -> str:
        return os.path.join(self.root, name)


def _robots_df(spark: SparkSession, cfg: CrawlConfig) -> DataFrame:
    if "robots" not in cfg._dims:
        rows = [
            (r["host"], r["fetched_at"],
             [(x["prefix"], x["allow"]) for x in r["rules"]], r["crawl_delay"])
            for r in cfg.robots_rows
        ]
        cfg._dims["robots"] = latest_robots(
            spark.createDataFrame(rows, schema=ROBOTS)
        ).cache()
    return cfg._dims["robots"]


def _budgets_df(spark: SparkSession, cfg: CrawlConfig) -> DataFrame:
    if "budgets" not in cfg._dims:
        rows = [(r["host"], r["budget_per_round"]) for r in cfg.budget_rows]
        cfg._dims["budgets"] = spark.createDataFrame(
            rows, schema=HOST_BUDGET
        ).cache()
    return cfg._dims["budgets"]


def init_crawl(spark: SparkSession, cfg: CrawlConfig, seeds_path: str) -> None:
    """Round 0: seeds → canon → dedup (first line wins) → frontier+seen."""
    from ..sources import load_seeds

    seeds = (
        load_seeds(spark, seeds_path)
        .withColumn("url_canon", canon_udf("url"))
        .withColumn("url_hash", url_hash_expr("url_canon"))
        .withColumn("host", host_expr("url_canon"))
        .withColumn("depth", F.lit(0))
        .withColumn("discovery_time", F.lit(fx.T0))
        .withColumn("relevance_q", F.lit(SEED_RELEVANCE_Q).cast("long"))
        .withColumn("relevance", relevance_expr("relevance_q"))
        .withColumn("parent_url", F.lit(None).cast("string"))
        .withColumn("round", F.lit(0))
        .withColumn("status", F.lit("pending"))
        .select(*[f.name for f in FRONTIER.fields])
    )
    # P4 admits SEEDS too, not just out-links: a seeds file line that
    # is not http(s) — or does not parse as a URL at all, which
    # canon_url returns unchanged, urlcanon.py's contract being "the
    # engine's scheme filter (P4) drops them later" — must never reach
    # the frontier, the seen set, or a fetch.  The oracle crawler
    # applies the identical gate to its seed loop.
    seeds = scheme_depth_gate(seeds, cfg.max_depth)
    # dense ADMISSION renumber (the module-docstring seq contract):
    # gated/duplicate lines must not leave gaps, so that n_seen always
    # equals the max assigned seq — round 1's new links start at
    # n_seen + 1 and can never collide with a seed's seq.  The rank is
    # over the pre-gate line number (load_seeds), preserving seed-file
    # order among admitted seeds exactly as the oracle's admission loop
    # does.
    init_caches: list = []
    frontier0 = (
        global_rank(
            dedup_batch(seeds).withColumnRenamed("discovery_seq", "_line"),
            [F.col("_line").asc()],
            "discovery_seq",
            init_caches,
        )
        .select(*[f.name for f in FRONTIER.fields])
        .repartitionByRange(cfg.n_shards, "url_hash")
    )
    frontier0 = frontier0.cache()
    try:
        # idempotent, same discipline as crawl_round's commits: init is
        # TWO commits, and a crash between them must be repairable —
        # by re-running init_crawl OR by resume() (both funnel the
        # second commit through _ensure_seen_initialized)
        if not _round_committed(cfg.table("frontier"), 0):
            icelite.commit(frontier0, cfg.table("frontier"), 0,
                           mode="replace")
        _ensure_seen_initialized(spark, cfg)
    finally:
        frontier0.unpersist()
        for c in init_caches:
            c.unpersist()


def _ensure_seen_initialized(spark: SparkSession, cfg: CrawlConfig) -> None:
    """Finish a half-done init.  The seen table's round-0 commit is
    DERIVED from the frontier's (seen0 = frontier0's url keys), so a
    crash between init_crawl's two commits is repaired by recomputing
    it from the committed frontier snapshot — without this, the first
    _snap_as_of read of a pointerless seen table made resume() raise
    instead of recover (round-4 review finding)."""
    if _round_committed(cfg.table("seen"), 0):
        return
    f0 = icelite.read_snapshot(
        spark, cfg.table("frontier"), _snap_as_of(cfg.table("frontier"), 0)
    )
    icelite.commit(
        f0.select("url_canon", "url_hash"), cfg.table("seen"), 0,
        mode="replace",
    )


def _latest_round(table_dir: str) -> tuple[int | None, int | None, dict]:
    """(snapshot_id, round, meta) of the head — O(1) via the LATEST
    pointer, falling back to one manifest parse for pre-round-pointer
    tables."""
    ptr = icelite.latest_pointer(table_dir)
    if ptr is None:
        return None, None, {}
    if "round" in ptr:
        return ptr["snapshot_id"], ptr["round"], ptr.get("meta", {})
    m = icelite.read_manifest(table_dir, ptr["snapshot_id"])
    return m["snapshot_id"], m["round"], m.get("meta", {})


def _compaction_done(table_dir: str, round_n: int) -> bool:
    """True when round_n's compaction replace-commit already landed —
    re-running it would add a redundant same-round snapshot, and with
    expire(keep_last=3) a second redundant snapshot would push the
    round r-1 manifest (which crash re-runs pin their reads to) out of
    the kept window."""
    _, rnd, meta = _latest_round(table_dir)
    return rnd is not None and rnd >= round_n and bool(meta.get("compacted"))


def _round_committed(table_dir: str, round_n: int) -> bool:
    """True when ``table_dir`` already holds round_n's commit — the
    idempotency guard that makes a crash-interrupted round safely
    re-runnable (a round is several table commits, not one atomic op;
    re-running must skip the commits that landed before the crash,
    or append tables double-append: duplicate trace rows, double
    tombstones corrupting the n_pending arithmetic, lost new links)."""
    _, rnd, _ = _latest_round(table_dir)
    return rnd is not None and rnd >= round_n


def _snap_as_of(table_dir: str, round_max: int) -> int | None:
    """Latest snapshot with round <= round_max — O(1) on a clean run
    (LATEST pointer fast path), walking the parent chain only on a
    crash re-run.  Pinning reads to the PREVIOUS round's snapshot makes
    a re-run see exactly what the crashed run saw (snapshot isolation),
    so its recomputation is bit-identical."""
    snap, rnd, _ = _latest_round(table_dir)
    if snap is None or (rnd is not None and rnd <= round_max):
        return snap
    while snap is not None:
        m = icelite.read_manifest(table_dir, snap)
        if m["round"] <= round_max:
            return snap
        snap = m["parent_id"]
    return None


def crawl_round(spark: SparkSession, cfg: CrawlConfig, round_n: int) -> dict:
    """Execute one crawl round; returns the round's metric counters.

    Action discipline: every Spark job costs fixed scheduling latency,
    so counters come from manifest row_counts (free) or single merged
    aggregations — never one .count() per metric.  Returned stats
    include per-phase wall times (``phases``) for scaling diagnosis.

    Every DataFrame the round persists is registered and released in
    a ``finally`` — a round that dies mid-flight (crash-injection
    re-runs, a CommitConflict from a racing driver) must not leak
    CacheManager entries into the next round of a long crawl.
    """
    caches: list[DataFrame] = []
    try:
        return _crawl_round_impl(spark, cfg, round_n, caches)
    finally:
        for c in caches:
            c.unpersist()


def _crawl_round_impl(
    spark: SparkSession,
    cfg: CrawlConfig,
    round_n: int,
    caches: list[DataFrame],
) -> dict:
    t_start = time.monotonic()
    phases: dict[str, float] = {}
    _t = [t_start]

    def mark(name: str) -> None:
        now = time.monotonic()
        phases[name] = round(now - _t[0], 2)
        _t[0] = now
    # reads are pinned to the snapshots AS OF round_n-1 (0 chain steps
    # on a clean run): a crash-interrupted round may have committed
    # SOME of its tables before dying, and a re-run must see exactly
    # what the crashed run saw so its recomputation is bit-identical
    # (snapshot isolation — the same property resume() builds on)
    frontier_snap_id = _snap_as_of(cfg.table("frontier"), round_n - 1)
    frontier_manifest = icelite.read_manifest(
        cfg.table("frontier"), frontier_snap_id
    )
    n_frontier_rows = frontier_manifest["row_count"]
    fetched_tbl = cfg.table("fetched")
    tomb_snap_id = (
        _snap_as_of(fetched_tbl, round_n - 1)
        if cfg.frontier_mode == "append"
        else None
    )
    tomb_manifest = (
        icelite.read_manifest(fetched_tbl, tomb_snap_id) if tomb_snap_id else None
    )
    n_tomb = tomb_manifest["row_count"] if tomb_manifest else 0
    # Detect a crash BETWEEN a frontier compaction's replace-commit and
    # the tombstone reset that follows it — STRUCTURALLY, not by count
    # (round-3 shipped only `n_tomb > n_frontier_rows`, which misses the
    # common large-frontier case where the stale tombstones are fewer
    # than the compacted frontier: n_pending is then silently
    # understated, and can reach 0 while real pending URLs remain —
    # halting the crawl early with no further commits to ever trigger
    # the reset).  The signature: the pinned frontier head IS a
    # compaction commit (meta.compacted) at round rc, yet the pinned
    # tombstone head is a NON-EMPTY commit at round <= rc — a completed
    # maintenance always leaves the reset (an empty replace at rc) as
    # the tombstone head.  The pending SET is still correct either way
    # (stale tombstones match nothing in the compacted frontier); only
    # the arithmetic is skewed.  Finish the interrupted maintenance and
    # carry on.
    reset_missing = (
        n_tomb > 0
        and frontier_manifest.get("meta", {}).get("compacted")
        and tomb_manifest["round"] <= frontier_manifest["round"]
    )
    if reset_missing or n_tomb > n_frontier_rows:
        icelite.commit(
            spark.createDataFrame(
                [], "url_canon string, url_hash long"
            ).repartition(1),
            fetched_tbl,
            round_n - 1,
            mode="replace",
        )
        tomb_snap_id, n_tomb = None, 0
    # exact: every tombstone key is a distinct frontier-append row
    # (frontier entries are globally unique — they were anti-joined
    # against the seen set before appending)
    n_pending = n_frontier_rows - n_tomb
    if n_pending <= 0:
        return {"round": round_n, "n_pending": 0, "n_fetched": 0}
    frontier = icelite.read_snapshot(spark, cfg.table("frontier"), frontier_snap_id)
    if tomb_snap_id and n_tomb > 0:
        # LSM read path: pending = append-files MINUS tombstones, via
        # the zero-shuffle file-probed anti-join (both tables are
        # url_hash-range-clustered; manifest stats prune file reads)
        tomb_index = icelite.file_hash_index(fetched_tbl, tomb_snap_id)
        if tomb_index is not None:
            frontier = anti_join_seen_files(frontier, tomb_index)
        else:  # stats missing (foreign table) — broadcast-anti fallback
            frontier = frontier.join(
                icelite.read_snapshot(spark, fetched_tbl, tomb_snap_id),
                ["url_hash", "url_canon"],
                "left_anti",
            )

    # 2. robots gate (J2/J7/P5 — all JVM-side); the robots dim
    # (as-of-resolved) is memoized across rounds.  The gate METRICS are
    # not computed here — they ride along in the fetch-metrics action
    # below, so the gate phase launches zero jobs of its own.
    robots_cur = _robots_df(spark, cfg)
    gated = with_robots_decision(frontier, robots_cur).cache()
    caches.append(gated)
    allowed = gated.filter(F.col("robots_allowed")).drop("robots_allowed")
    mark("gate")

    # 3. per-host budget top-k (J3/W1/P6), optionally crawl-delay
    # capped (P5 — robots_cur carries the as-of crawl_delay column)
    budgeted = with_budget(allowed, _budgets_df(spark, cfg), cfg.default_budget)
    if cfg.round_window_s > 0:
        budgeted = with_crawl_delay_cap(
            budgeted, robots_cur, cfg.round_window_s
        )
    selected = select_per_host_topk(budgeted, salt=cfg.salt)
    # AQE coalesces the politeness window's shuffle down to ~1
    # partition (its INPUT bytes are tiny) — but the next stage runs
    # the CPU-heavy fetch UDF, which would then execute on one core.
    # Re-spread explicitly by url_hash so fetch parallelism follows
    # cores, not input bytes (the cheap-input/expensive-UDF AQE trap).
    # Task count adapts to the round size (n_pending is free from the
    # manifest): ~64 URLs/task, floored at 8 tasks, capped at 4x cores
    # — fine-grained at volume so the final scheduling wave stays
    # short, but never hundreds of near-empty python-worker tasks when
    # a round is small (that fixed overhead dominated round-1's bench).
    cores = spark.sparkContext.defaultParallelism
    par = int(min(4 * cores, max(8, -(-n_pending // 64))))
    selected = selected.repartition(par, "url_hash").cache()
    caches.append(selected)

    # 4. fetch ONCE, directly into the corpus table's next snapshot
    # directory — not a JVM cache (a round's images must never need to
    # fit in executor memory), and not a scratch that gets re-copied.
    # Every later consumer reads a PRUNED projection of these columnar
    # files: trace/links never deserialize the image bytes, and the
    # corpus "write" below is a zero-copy metadata commit.  On a crash
    # re-run whose corpus commit already landed, fetch to a scratch dir
    # instead — the re-run's corpus commit is skipped, so writing into
    # next_data_dir (unique per attempt) would only plant a debris data
    # dir for recover() to sweep; the scratch dir is deleted right here.
    corpus_done = _round_committed(cfg.table("corpus"), round_n)
    # per-attempt suffix, same isolation contract as next_data_dir: two
    # racing re-runs of the same round must not overwrite/rmtree a
    # scratch dir the other is still lazily reading `fetched` from
    # (resume()'s _refetch-* sweep still matches)
    fetch_dir = (
        os.path.join(
            cfg.root, f"_refetch-{round_n:06d}-{secrets.token_hex(4)}"
        )
        if corpus_done
        else icelite.next_data_dir(cfg.table("corpus"))
    )
    fetch_selected(selected).write.mode("overwrite").option(
        "parquet.enable.dictionary", "false"  # fat binary col, see icelite
    ).parquet(fetch_dir)
    fetched = spark.read.parquet(fetch_dir)
    mark("fetch_write")

    # 5. fetch metrics + U4 decode/phash verification (north_star:
    # "images decoded/phash-verified in Arrow-batch UDFs") + the robots
    # gate metrics, all in ONE action: the three aggregate subtrees are
    # cross-joined so a single job computes them in parallel (the gate
    # side reads the cached ``gated``) instead of paying serial job
    # round-trips per metric.  The action is submitted from a second
    # driver thread so its Python-CPU decode pass overlaps the
    # shuffle-bound trace phase below — the two jobs touch disjoint
    # resources (Arrow workers vs exchange+write) and neither depends
    # on the other; the counters are joined exactly where first needed
    # (the corpus commit).  Concurrent job submission from driver
    # threads is a supported Spark pattern; all inputs (``fetched`` on
    # disk, ``gated`` cached) are immutable by then, so the overlap
    # cannot change any result.
    from ..operators.images import decode_verify

    verify_agg = decode_verify(
        fetched.filter(F.col("image_id").isNotNull()).select(
            "image_id", F.col("image_bytes").alias("bytes"),
            F.col("img_w").alias("w"), F.col("img_h").alias("h"),
            F.col("img_fmt").alias("fmt"), "phash",
        )
    ).agg(
        F.count("*").alias("n_img"),
        F.sum(
            (
                ~F.col("decode_ok")
                | (F.col("dec_phash") != F.col("phash"))
                | (F.col("dec_w") != F.col("w"))
                | (F.col("dec_h") != F.col("h"))
            ).cast("long")
        ).alias("n_bad"),
    )
    gate_agg = gated.agg(
        F.count("*").alias("n_gated"),
        F.sum(F.col("robots_allowed").cast("long")).alias("n_allowed"),
    )
    metrics_df = (
        fetched.agg(
            F.count("*").alias("n"),
            F.sum((F.col("http_status") != 200).cast("long")).alias("n_err"),
        )
        .crossJoin(verify_agg)
        .crossJoin(gate_agg)
    )
    # TC_OVERLAP_VERIFY=0 forces the serial order (A/B + diagnosis
    # escape hatch); default: overlap.
    overlap = os.environ.get("TC_OVERLAP_VERIFY", "1") != "0"
    with ThreadPoolExecutor(max_workers=1) as pool:
        if overlap:
            metrics_fut = pool.submit(metrics_df.first)
        else:
            fr = metrics_df.first()
            mark("fetch_verify")

        trace_caches: list = []
        try:
            trace = global_fetch_order(
                partitions=par,
                cache_registry=trace_caches,
                selected=fetched.select(
                    "url_canon",
                    "host",
                    "depth",
                    "relevance_q",
                    "discovery_time",
                    "discovery_seq",
                    "http_status",
                    "image_id",
                )
            ).select(
                "trace_seq",
                F.lit(round_n).alias("round"),
                "url_canon",
                "host",
                "depth",
                "relevance_q",
                "discovery_seq",
                F.col("http_status").alias("status"),
                "image_id",
            )
            if not _round_committed(cfg.table("trace"), round_n):
                icelite.commit(
                    trace, cfg.table("trace"), round_n, mode="append"
                )
        finally:
            # the commit materialized the ranged layout — release it
            # even when the commit fails (a crash re-run's
            # CommitConflict here would otherwise leak the very
            # CacheManager entry this registry exists to free — ADVICE)
            for c in trace_caches:
                c.unpersist()
        mark("trace")

        if overlap:
            fr = metrics_fut.result()
            mark("fetch_verify")
    n_fetched, n_errors = int(fr["n"]), int(fr["n_err"] or 0)
    n_images = int(fr["n_img"] or 0)
    n_verify_failed = int(fr["n_bad"] or 0)
    n_blocked = int(fr["n_gated"] - (fr["n_allowed"] or 0))

    # 6. corpus append (authoritative schema, BASELINE.json:15) —
    # zero-copy: the fetch output files ARE the corpus data; the
    # manifest records the projection onto the corpus schema.
    if not corpus_done:
        icelite.commit_files(
            cfg.table("corpus"),
            fetch_dir,
            round_n,
            row_count=n_images,
            meta={
                "where": "image_id IS NOT NULL",
                "select": [
                    "image_id",
                    "image_bytes AS bytes",
                    "img_w AS w",
                    "img_h AS h",
                    "img_fmt AS fmt",
                    "caption",
                    "phash",
                ],
            },
            mode="append",
        )
    mark("corpus")

    # 7. new links
    discovery_time = fx.T0 + timedelta(seconds=round_n)
    links = (
        fetched.filter(F.col("http_status") == 200)
        .select(
            F.col("url_canon").alias("parent_url"),
            F.col("depth").alias("parent_depth"),
            F.col("discovery_seq").alias("parent_seq"),
            F.posexplode(F.arrays_zip("out_links", "link_context")).alias(
                "idx", "z"
            ),
        )
        .select(
            F.col("z.out_links").alias("url"),
            F.col("z.link_context").alias("context"),
            "parent_url",
            "parent_depth",
            "parent_seq",
            "idx",
        )
    )
    # canon (U1) + relevance (U2) fused into one Arrow pass — one
    # python worker per task instead of one per UDF per task
    # discovery_seq is NOT computed here: it is a post-dedup ADMISSION
    # rank (module docstring) — the (parent_seq, idx) pair rides along
    # as the within-batch tie-break and the rank key until assignment.
    links = (
        with_canon_and_relevance(links)
        .withColumn("url_hash", url_hash_expr("url_canon"))
        .withColumn("host", host_expr("url_canon"))
        .withColumn("depth", (F.col("parent_depth") + 1).cast("int"))
        .withColumn("discovery_time", F.lit(discovery_time))
        .withColumn("relevance", relevance_expr("relevance_q"))
        .withColumn("round", F.lit(round_n))
        .withColumn("status", F.lit("pending"))
        .select(
            *[f.name for f in FRONTIER.fields if f.name != "discovery_seq"],
            "parent_seq",
            "idx",
        )
    )
    # P4: scheme + depth gate (operators.gates — oracle-checked by the
    # frontier_scheme_depth_filter registry entry)
    links = scheme_depth_gate(links, cfg.max_depth)
    # T1 tie-break: (relevance desc, depth, time, parent_seq, idx) —
    # identical relative order to the assigned seq (monotone in
    # (parent_seq, idx); time is constant within a batch)
    links = dedup_batch(
        links,
        order=[
            F.col("relevance_q").desc(),
            F.col("depth").asc(),
            F.col("discovery_time").asc(),
            F.col("parent_seq").asc(),
            F.col("idx").asc(),
        ],
    )

    seen_snap_id = _snap_as_of(cfg.table("seen"), round_n - 1)
    seen_manifest = icelite.read_manifest(cfg.table("seen"), seen_snap_id)
    n_seen = seen_manifest["row_count"]
    seen = icelite.read_snapshot(spark, cfg.table("seen"), seen_snap_id)
    # exact-join crossover (CrawlConfig.seen_join_file_min_keys): probe
    # the seen table's own range-clustered files in place instead of
    # shuffling them through a sort-merge join
    seen_index = (
        icelite.file_hash_index(cfg.table("seen"), seen_snap_id)
        if n_seen >= cfg.seen_join_file_min_keys
        else None
    )

    def exact_unseen(cand: DataFrame) -> DataFrame:
        if seen_index is not None:
            return anti_join_seen_files(
                cand.repartitionByRange(cfg.n_shards, "url_hash"), seen_index
            )
        return anti_join_seen(cand, seen)

    mark("links")
    # bloom crossover (see CrawlConfig.bloom_min_keys): the prefilter
    # pays only when the seen table is big enough that skipping the
    # exact join for definitely-fresh rows beats the two bloom jobs
    if cfg.use_bloom and n_seen >= cfg.bloom_min_keys:
        # Incremental maintenance: bloom bitmaps are OR-monotone and
        # the seen table is append-only, so the manifest file-diff
        # since the last build is an EXACT delta — OR only the new
        # files' keys into the existing bitmaps instead of rescanning
        # all of seen (the last remaining O(seen) scan per round).
        # Full rebuild when the key count outgrows the 1.5× sizing
        # headroom (fpp would degrade past design — a perf matter
        # only, the exact join stays the authority), when the file
        # set is not a superset of the build's (compaction), or when
        # the distribution mode crosses over.
        bst = cfg._dims.get("bloom")
        cur_files = frozenset(seen_manifest["files"])
        want_mode = "file" if n_seen >= cfg.bloom_file_min_keys else "bcast"
        fresh_ok = (
            bst is not None
            and bst["mode"] == want_mode
            and n_seen <= bst["capacity"]
            and bst["files"] <= cur_files
        )
        delta_files = sorted(cur_files - bst["files"]) if fresh_ok else []
        if want_mode == "file":
            if fresh_ok:
                k = bst["k"]
                if delta_files:
                    # unique per attempt (same contract as
                    # icelite.next_data_dir): an in-process retry of a
                    # crashed round re-ORs its delta into a FRESH dir —
                    # OR-idempotent, and never out_dir == prev_dir
                    # (which update_bloom_shard_files rejects)
                    shard_dir = os.path.join(
                        cfg.table("bloom"),
                        f"round-{round_n:06d}-{secrets.token_hex(4)}",
                    )
                    update_bloom_shard_files(
                        spark.read.parquet(*delta_files).select("url_hash"),
                        bst["dir"], shard_dir, cfg.n_shards,
                        bst["n_bits"], k,
                    )
                    shutil.rmtree(bst["dir"], ignore_errors=True)
                    bst["dir"] = shard_dir
                else:
                    shard_dir = bst["dir"]
            else:
                shard_dir = os.path.join(
                    cfg.table("bloom"),
                    f"round-{round_n:06d}-{secrets.token_hex(4)}",
                )
                k, n_bits = write_bloom_shard_files(
                    seen, shard_dir, cfg.n_shards, cfg.bloom_fpp,
                    total=n_seen,
                )
                # sweep EVERY other generation, not just the in-memory
                # bst pointer: crash debris and pre-restart dirs have
                # no bst record but are equally superseded by this
                # full rebuild (multi-GB each at the design point)
                import glob as _glob

                for d in _glob.glob(
                    os.path.join(cfg.table("bloom"), "round-*")
                ):
                    if os.path.normpath(d) != os.path.normpath(shard_dir):
                        shutil.rmtree(d, ignore_errors=True)
                bst = {
                    "mode": "file", "dir": shard_dir, "k": k,
                    "n_bits": n_bits,
                    "capacity": int(n_seen * cfg.bloom_capacity_factor),
                }
            probe = bloom_prefilter_files(links, shard_dir, cfg.n_shards, k)
        else:
            if fresh_ok:
                k = bst["k"]
                if delta_files:
                    bst["bits"] = update_bloom_shards(
                        spark.read.parquet(*delta_files).select("url_hash"),
                        bst["bits"], cfg.n_shards, bst["n_bits"], k,
                    )
                shard_bits = bst["bits"]
            else:
                shard_bits, k = build_bloom_shards(
                    seen, cfg.n_shards, cfg.bloom_fpp, total=n_seen
                )
                bst = {
                    "mode": "bcast", "bits": shard_bits, "k": k,
                    "n_bits": len(shard_bits[0]) * 8,
                    "capacity": int(n_seen * cfg.bloom_capacity_factor),
                }
            probe = bloom_prefilter(links, shard_bits, cfg.n_shards, k)
        bst["files"] = cur_files
        cfg._dims["bloom"] = bst
        # cache the probe output: both branches below read it, so the
        # Arrow probe pass runs once, not once per branch
        probed = probe.cache()
        caches.append(probed)
        # definitely-unseen rows skip the exact join; possible hits go
        # through the exact anti-join (the authority)
        fresh = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
        maybe = probed.filter(F.col("maybe_seen")).drop("maybe_seen")
        new_links = fresh.unionByName(exact_unseen(maybe))
        cand_df = probed
    else:
        links = links.cache()
        caches.append(links)
        new_links = exact_unseen(links)
        cand_df = links
    # discovery_seq = ADMISSION rank (module docstring): base = n_seen
    # (the as-of manifest row count already read for the crossovers —
    # O(1), and pinned to round_n-1 so a crash re-run reproduces the
    # identical seqs), rank over (parent_seq, idx) among the admitted
    # links.  O(Δ log Δ) — one range exchange of the new links, the
    # same class as the trace rank; bounded forever: max seq == total
    # URLs ever discovered.
    new_links = global_rank(
        new_links,
        [F.col("parent_seq").asc(), F.col("idx").asc()],
        "discovery_seq",
        caches,
        base=n_seen,
    ).select(*[f.name for f in FRONTIER.fields])
    new_links = new_links.repartitionByRange(cfg.n_shards, "url_hash").cache()
    caches.append(new_links)

    # 8. commits: seen += new, frontier = residual ∪ new
    # (n_new comes free from the append-commit's manifest delta; each
    # append is guarded by _round_committed so a crash re-run never
    # double-appends)
    if not _round_committed(cfg.table("seen"), round_n):
        seen_snap = icelite.commit(
            new_links.select("url_canon", "url_hash"),
            cfg.table("seen"),
            round_n,
            mode="append",
        )
    else:
        seen_snap = icelite.latest_snapshot_id(cfg.table("seen"))
    n_new = icelite.read_manifest(cfg.table("seen"), seen_snap)["row_count"] - n_seen
    # the commit just materialized cand_df's cache as a side effect, so
    # this count is a cache-local read, not a recompute job
    n_candidates = cand_df.count()
    # maintenance plane: the seen table is re-read EVERY round for the
    # anti-join but grows by O(n_shards) files per append — periodic
    # compaction (url_hash-range, preserving shard alignment) + expiry
    # keeps its file count O(n_shards) forever.  Pure physical rewrite:
    # the trace test with compact_seen_every=2 pins result equality.
    compact_every = cfg.compact_seen_every or (
        AUTO_COMPACT_SEEN_EVERY
        if n_seen >= cfg.seen_join_file_min_keys
        else 0
    )
    if (
        compact_every
        and round_n % compact_every == 0
        and not _compaction_done(cfg.table("seen"), round_n)
    ):
        icelite.compact(
            spark,
            cfg.table("seen"),
            round_n,
            range_cols=["url_hash"],
            target_files=cfg.n_shards,
        )
        # keep_last=3 (not 2): round r's maintenance must leave the
        # r-1 snapshot readable — a crash re-run of round r pins its
        # reads there (_snap_as_of)
        icelite.expire_snapshots(cfg.table("seen"), keep_last=3)
    mark("seen")
    if cfg.frontier_mode == "append":
        # LSM write path: O(delta) commits — tombstones for the rows
        # this round consumed (fetched + robots-blocked, matching the
        # replace-mode residual which keeps only allowed-minus-selected)
        # and an append of the new links.  No O(frontier) rewrite.
        tombs = (
            gated.filter(~F.col("robots_allowed"))
            .select("url_canon", "url_hash")
            .unionByName(selected.select("url_canon", "url_hash"))
            .repartitionByRange(cfg.n_shards, "url_hash")
        )
        if not _round_committed(fetched_tbl, round_n):
            icelite.commit(tombs, fetched_tbl, round_n, mode="append")
        if not _round_committed(cfg.table("frontier"), round_n):
            frontier_snap = icelite.commit(
                new_links.select(*[f.name for f in FRONTIER.fields]),
                cfg.table("frontier"),
                round_n,
                mode="append",
            )
        else:
            frontier_snap = icelite.latest_snapshot_id(cfg.table("frontier"))
        if (
            cfg.compact_frontier_every
            and round_n % cfg.compact_frontier_every == 0
            and not _compaction_done(cfg.table("frontier"), round_n)
        ):
            # materialize the pending view and restart both chains —
            # amortized O(frontier / K); result-invariant (trace test)
            pend = icelite.read_snapshot(spark, cfg.table("frontier"))
            t_idx = icelite.file_hash_index(fetched_tbl)
            if t_idx is not None:
                pend = anti_join_seen_files(pend, t_idx)
            else:  # stats unavailable — broadcast-anti fallback, never
                # skip tombstone removal (a skipped removal resurrects
                # already-fetched rows into the compacted frontier)
                pend = pend.join(
                    icelite.read_snapshot(spark, fetched_tbl),
                    ["url_hash", "url_canon"],
                    "left_anti",
                )
            frontier_snap = icelite.commit(
                pend.repartitionByRange(cfg.n_shards, "url_hash"),
                cfg.table("frontier"),
                round_n,
                meta={"compacted": True},
                mode="replace",
            )
            icelite.commit(
                spark.createDataFrame(
                    [], "url_canon string, url_hash long"
                ).repartition(1),
                fetched_tbl,
                round_n,
                mode="replace",
            )
            # keep_last=3: see the seen-table expiry note (crash
            # re-runs pin reads to the r-1 snapshots)
            icelite.expire_snapshots(cfg.table("frontier"), keep_last=3)
            icelite.expire_snapshots(fetched_tbl, keep_last=3)
    else:
        residual = allowed.join(
            selected.select("url_canon"), "url_canon", "left_anti"
        ).select(*[f.name for f in FRONTIER.fields])
        new_frontier = residual.unionByName(new_links).repartitionByRange(
            cfg.n_shards, "url_hash"
        )
        # same crash-re-run guard as every other per-round commit: the
        # content would be identical (pinned reads), but an unguarded
        # re-run wastes an O(frontier) rewrite and stacks a redundant
        # same-round snapshot whose superseded files replace mode never
        # expires
        if not _round_committed(cfg.table("frontier"), round_n):
            frontier_snap = icelite.commit(
                new_frontier, cfg.table("frontier"), round_n, mode="replace"
            )
            # replace mode rewrites the whole frontier each round, so
            # without expiry storage grows O(rounds x frontier);
            # keep_last=3 preserves the r-1 snapshot crash re-runs pin
            # (same policy as the seen table and the LSM branch)
            icelite.expire_snapshots(cfg.table("frontier"), keep_last=3)
        else:
            frontier_snap = icelite.latest_snapshot_id(cfg.table("frontier"))
    mark("frontier")

    # lineage: per-partition fetch metrics + a round-total row (S7)
    per_part = (
        fetched.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(
            F.count("*").alias("n_fetched"),
            F.sum((F.col("http_status") != 200).cast("long")).alias("n_errors"),
        )
        .select(
            F.lit(round_n).alias("round"),
            "partition_id",
            F.lit(n_candidates).alias("n_candidates"),
            F.lit(n_candidates - n_new).alias("n_dedup"),
            F.lit(n_blocked).alias("n_robots_blocked"),
            "n_fetched",
            "n_errors",
            F.lit(int((time.monotonic() - t_start) * 1000)).alias("wall_ms"),
            F.lit(frontier_snap).cast("long").alias("snapshot_id"),
        )
    )
    if not _round_committed(cfg.table("lineage"), round_n):
        icelite.commit(per_part, cfg.table("lineage"), round_n, mode="append")
    if corpus_done:
        # the re-fetch scratch dir is derived data, not a table
        shutil.rmtree(fetch_dir, ignore_errors=True)
    mark("lineage")

    stats = {
        "phases": phases,
        "round": round_n,
        "n_pending": n_pending,
        "n_robots_blocked": int(n_blocked),
        "n_fetched": int(n_fetched),
        "n_errors": int(n_errors),
        "n_verify_failed": n_verify_failed,
        "n_candidates": int(n_candidates),
        "n_new": int(n_new),
        "wall_s": time.monotonic() - t_start,
    }
    return stats


def run_crawl(
    spark: SparkSession, cfg: CrawlConfig, seeds_path: str, rounds: int
) -> list[dict]:
    """init + N rounds (the spark-submit entry; resume() continues one)."""
    init_crawl(spark, cfg, seeds_path)
    return [crawl_round(spark, cfg, r) for r in range(1, rounds + 1)]


def resume(spark: SparkSession, cfg: CrawlConfig, rounds: int) -> list[dict]:
    """§3.3 — continue from the last committed snapshots.  All state
    lives in icelite tables, so resumption is just 'run more rounds';
    the equivalence crawl(k) ≡ crawl(j);resume(k−j) is property-tested.

    Completion marker = the frontier commit.  The STATE plane (trace /
    seen / corpus / frontier / tombstones) is exactly-once under any
    crash point (_round_committed + pinned reads); the lineage table —
    observability, not state — commits after the frontier, so a crash
    in that narrow window loses that round's lineage rows (best-effort
    by design: recomputing them would need the round's fetch output,
    which only the corpus keeps)."""
    # sweep orphaned re-fetch scratch dirs: a crash on a corpus-done
    # re-run after its frontier commit means the round is never
    # revisited, so its scratch would otherwise leak a full round of
    # image bytes
    import glob as _glob

    for d in _glob.glob(os.path.join(cfg.root, "_refetch-*")):
        shutil.rmtree(d, ignore_errors=True)
    # reclaim orphan manifests from commits that crashed between the
    # manifest claim and the pointer advance — they are invisible to
    # readers but would block the next commit's id claim
    # (icelite.CommitConflict); resume re-establishes single-writer
    # ownership, which is recover()'s precondition
    for t in ("frontier", "seen", "corpus", "trace", "lineage", "fetched"):
        if os.path.isdir(cfg.table(t)):
            icelite.recover(cfg.table(t))
    # bloom bitmaps are DERIVED state keyed to an in-memory build record
    # (cfg._dims) that did not survive the restart — the next bloom
    # round full-rebuilds regardless, so stale round-* dirs (multi-GB at
    # the design point) would otherwise leak one generation per restart
    shutil.rmtree(cfg.table("bloom"), ignore_errors=True)
    head = icelite.latest_snapshot_id(cfg.table("frontier"))
    if head is None:
        raise RuntimeError(
            "resume: no committed frontier snapshot — the crawl crashed "
            "before init_crawl's first commit; re-run init_crawl"
        )
    # repair the one init crash window (frontier committed, seen not)
    _ensure_seen_initialized(spark, cfg)
    last = icelite.read_manifest(cfg.table("frontier"), head)["round"]
    return [crawl_round(spark, cfg, r) for r in range(last + 1, last + 1 + rounds)]


def read_trace(spark: SparkSession, cfg: CrawlConfig) -> DataFrame:
    """Full fetch trace across all rounds, in fetch order."""
    return icelite.read_snapshot(spark, cfg.table("trace")).orderBy(
        "round", "trace_seq"
    )


def read_seen(spark: SparkSession, cfg: CrawlConfig) -> DataFrame:
    return icelite.read_snapshot(spark, cfg.table("seen"))
