"""Single-process executable-spec oracle (SURVEY.md §5.1).

A deterministic topical crawler implementing the ``BASELINE.json:6``
semantics with plain Python data structures: priority ordering
(relevance_q desc, depth, discovery_time, discovery_seq), per-host
politeness budgets, longest-prefix robots rules, URL-seen set keyed at
*admission* time (the Mercator-style seen-at-insert design both sides
share).  Environment-model functions (canonicalization, the synthetic
web, the relevance model) are imported from topicalcrawler_spark.core —
identical on both sides by construction — while the *scheduler* logic
here is written independently of the Spark engine; trace equality
between the two is the correctness gate (``BASELINE.json:14``).
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timedelta

from topicalcrawler_spark.core.relevance import SEED_RELEVANCE_Q, score_q
from topicalcrawler_spark.core.synthweb import fetch_page
from topicalcrawler_spark.core.urlcanon import canon_url, host_of, path_of
from topicalcrawler_spark.sources import fixtures as fx


@dataclass
class Candidate:
    url_canon: str
    host: str
    depth: int
    discovery_time: datetime
    discovery_seq: int
    relevance_q: int

    def order_key(self):
        return (
            -self.relevance_q,
            self.depth,
            self.discovery_time,
            self.discovery_seq,
        )


def robots_allows(rules: list[dict], path: str) -> bool:
    """Longest-prefix decision; no rules / no match → allow.  A rule
    with no decision (allow None) or no prefix is skipped entirely —
    it neither decides nor shadows a shorter real rule (the engine's
    robots_allowed_expr filters identically; round-5 parity fix)."""
    best_len, best_allow = -1, True
    for r in rules or []:
        if r is None or r.get("allow") is None or r.get("prefix") is None:
            continue
        if path.startswith(r["prefix"]) and len(r["prefix"]) > best_len:
            best_len, best_allow = len(r["prefix"]), r["allow"]
    return best_allow


def crawl(
    seed_urls: list[str],
    rounds: int,
    max_depth: int = 3,
    default_budget: int = fx.DEFAULT_BUDGET,
    budget_rows: list[dict] | None = None,
    round_window_s: float = 0.0,
) -> tuple[list[dict], set[str]]:
    """Returns (trace rows in fetch order, final seen set).
    ``budget_rows`` overrides the fixture per-host budgets (same shape
    as fx.make_budgets(); [] = every host gets default_budget).
    ``round_window_s`` > 0 additionally caps each host's budget at
    floor(round_window_s / crawl_delay), floored at 1 — the robots
    crawl-delay politeness semantics (CrawlConfig.round_window_s)."""
    import math

    robots = fx.current_robots()
    rows = fx.make_budgets() if budget_rows is None else budget_rows
    budgets = {b["host"]: b["budget_per_round"] for b in rows}
    if round_window_s > 0:
        for host, d in fx.current_crawl_delays().items():
            if d and d > 0:
                budgets[host] = min(
                    budgets.get(host, default_budget),
                    max(1, math.floor(round_window_s / d)),
                )

    seen: set[str] = set()
    pending: list[Candidate] = []
    for raw in seed_urls:
        uc = canon_url(raw)
        # P4 gates seeds exactly like out-links (engine: init_crawl) —
        # a non-http(s) or unparseable seeds line is never admitted to
        # the frontier or the seen set
        if not (uc.startswith("http://") or uc.startswith("https://")):
            continue
        if uc in seen:
            continue
        # discovery_seq is a dense ADMISSION counter (the engine's
        # round.py module-docstring contract): seeds are numbered
        # 1..n in file order among ADMITTED lines — gated/duplicate
        # lines consume no slot, so |seen| always equals the max
        # assigned seq and seqs stay bounded by total URLs discovered
        # (the tree-path encoding this replaces grew bits per depth
        # level and overflowed int64 — Python bignums here masked what
        # the engine's longs could not hold)
        seen.add(uc)
        pending.append(
            Candidate(uc, host_of(uc), 0, fx.T0, len(seen), SEED_RELEVANCE_Q)
        )

    trace: list[dict] = []
    for round_n in range(1, rounds + 1):
        if not pending:
            break
        # robots gate: blocked rows leave the frontier permanently
        allowed = [
            c
            for c in pending
            if robots_allows(robots.get(c.host), path_of(c.url_canon))
        ]
        # per-host budget top-k by the shared order key
        by_host: dict[str, list[Candidate]] = {}
        for c in allowed:
            by_host.setdefault(c.host, []).append(c)
        selected: list[Candidate] = []
        for host, cands in by_host.items():
            cands.sort(key=Candidate.order_key)
            selected.extend(cands[: budgets.get(host, default_budget)])
        selected.sort(key=Candidate.order_key)

        selected_set = {c.url_canon for c in selected}
        residual = [c for c in allowed if c.url_canon not in selected_set]

        discovery_time = fx.T0 + timedelta(seconds=round_n)
        # batch maps url -> ((parent_seq, idx), candidate): the lex
        # pair is both the T1 dedup tail and the admission-rank key
        batch: dict[str, tuple[tuple[int, int], Candidate]] = {}
        for trace_seq, c in enumerate(selected, start=1):
            page = fetch_page(c.url_canon)
            trace.append(
                {
                    "trace_seq": trace_seq,
                    "round": round_n,
                    "url_canon": c.url_canon,
                    "host": c.host,
                    "depth": c.depth,
                    "relevance_q": c.relevance_q,
                    "discovery_seq": c.discovery_seq,
                    "status": page["status"],
                    "image_id": page["image_id"],
                }
            )
            if page["status"] != 200:
                continue
            for idx, (link, ctx) in enumerate(
                zip(page["out_links"], page["link_context"])
            ):
                uc = canon_url(link)
                depth = c.depth + 1
                if depth > max_depth or not (
                    uc.startswith("http://") or uc.startswith("https://")
                ):
                    continue
                cand = Candidate(
                    uc, host_of(uc), depth, discovery_time, 0, score_q(ctx)
                )
                key = (c.discovery_seq, idx)
                # T1 batch dedup: keep the minimum of (-relevance,
                # depth, parent_seq, idx) — discovery_time is constant
                # within a batch, and (parent_seq, idx) orders exactly
                # as the admission seq will, so this is the old
                # order-key minimum expressed pre-assignment
                cur = batch.get(uc)
                if cur is None or (
                    (-cand.relevance_q, cand.depth, key)
                    < (-cur[1].relevance_q, cur[1].depth, cur[0])
                ):
                    batch[uc] = (key, cand)

        # dense admission numbering (engine mirror — round.py's
        # global_rank over (parent_seq, idx) with base = n_seen):
        # bounded forever by the total URLs discovered
        new_links = [
            (key, c) for key, c in batch.values() if c.url_canon not in seen
        ]
        new_links.sort(key=lambda t: t[0])
        base = len(seen)
        pending = residual
        for i, (_, c) in enumerate(new_links, start=1):
            c.discovery_seq = base + i
            seen.add(c.url_canon)
            pending.append(c)

    return trace, seen
