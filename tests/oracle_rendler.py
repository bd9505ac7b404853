"""Single-process reference-loop simulator — "the reference RENDLER run".

BASELINE.json:L6 judges correctness "against the reference RENDLER run
under the same seed list and politeness budget".  The reference checkout is
empty and there is no Mesos in this sandbox (SURVEY.md §0.1), so this module
plays that role: a plain-Python reimplementation of the scheduler loop in
the reference's own style — queues, a ``set()`` seen-set, sequential folds
[upstream: python/rendler.py ~L40-170] — extended with the north rule's
politeness budgets and robots gating, following the canonical semantics in
rendler_spark/crawl_semantics.py.

It shares ONLY the pure world/content functions with the engine (synthweb,
urlnorm, codecs — both sides must observe the same synthetic web); the
crawl *logic* here (budgeting, dedup, ordering, admission) is independent
sequential code, which is exactly what the equivalence tests compare.
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass, field

import pandas as pd

from rendler_spark import synthweb, urlnorm
from rendler_spark.crawl_semantics import child_seq, seed_seq
from rendler_spark.functions import links as linkfns


@dataclass
class OracleResult:
    # (wave, host, depth, seq, url) in canonical fetch order
    fetch_order: list[tuple[int, str, int, int, str]] = field(default_factory=list)
    seen: set[str] = field(default_factory=set)
    blocked: set[str] = field(default_factory=set)
    edges: list[tuple[str, str, int]] = field(default_factory=list)  # (src,dst,wave)
    # url -> (bytes, w, h, fmt, caption, phash)
    images: dict[str, tuple] = field(default_factory=dict)
    metrics: list[dict] = field(default_factory=list)
    # (url, host, depth, seq) rows left unfetched when the run ended
    frontier: list[tuple[str, str, int, str]] = field(default_factory=list)


def run_oracle(
    cfg: synthweb.WebConfig, max_waves: int, max_render_tasks: int | None = None
) -> OracleResult:
    res = OracleResult()
    robots = {h: (dis, delay) for h, dis, delay in synthweb.robots(cfg)}
    frontier: list[tuple[str, str, int, str]] = []  # (url, host, depth, seq)
    total_fetched = 0

    def admit(url: str, depth: int, seq: str, host: str = None, path: str = None) -> str:
        """crawl_semantics rule 5: dedup-by-seen, robots gate, enqueue."""
        if url in res.seen:
            return "dup"
        res.seen.add(url)
        if host is None:
            host = str(urlnorm.host_of(pd.Series([url])).iloc[0])
            path = str(urlnorm.path_of(pd.Series([url])).iloc[0])
        dis, _ = robots.get(host, ([], None))
        if any(path.startswith(p) for p in dis):
            res.blocked.add(url)
            return "blocked"
        frontier.append((url, host, depth, seq))
        return "new"

    for k, u in enumerate(synthweb.seeds(cfg)):
        admit(urlnorm.canonicalize_one(u, u), 0, seed_seq(k))

    for wave in range(max_waves):
        if not frontier:
            break
        # per-host budget selection (crawl_semantics rule 2)
        byhost: dict[str, list] = defaultdict(list)
        for row in frontier:
            byhost[row[1]].append(row)
        fetch, defer = [], []
        for host, rows in byhost.items():
            rows.sort(key=lambda r: (r[2], r[3]))  # (depth, seq)
            k = synthweb.effective_budget(cfg.budget, robots.get(host, ([], None))[1])
            fetch += rows[:k]
            defer += rows[k:]
        if max_render_tasks is not None:  # rule 7: global cumulative cap
            remaining = max_render_tasks - total_fetched
            if remaining <= 0:
                frontier = fetch + defer
                res.frontier = list(frontier)
                break
            if len(fetch) > remaining:
                fetch.sort(key=lambda r: (r[2], r[1], r[3]))  # (depth, host, seq)
                defer += fetch[remaining:]
                fetch = fetch[:remaining]
        total_fetched += len(fetch)
        frontier = defer
        fetch.sort(key=lambda r: (r[1], r[2], r[3]))  # (host, depth, seq): rule 3

        discoveries: list[tuple[int, int, str]] = []
        n_links = 0
        for url, host, depth, seq in fetch:
            res.fetch_order.append((wave, host, depth, seq, url))
            hi, pj, ok = synthweb.parse_url(pd.Series([url]))
            assert ok.all(), url
            html = synthweb.page_html(cfg, hi, pj)
            res.images[url] = synthweb.render_encoded(cfg, int(hi[0]), int(pj[0])) + (
                str(synthweb.page_caption(cfg, hi, pj).iloc[0]),
            )
            hrefs = linkfns.extract_links_list(html).iloc[0]
            if hrefs:
                # batch the pure functions per page (same code path as the
                # engine's vectorized UDFs; the sequential crawl LOGIC below
                # is untouched)
                dsts = urlnorm.canonicalize(
                    pd.Series([url] * len(hrefs)), pd.Series(hrefs)
                )
                oks = urlnorm.is_http(dsts)
                for pos, (dst, ok) in enumerate(zip(dsts, oks)):
                    if not bool(ok):
                        continue
                    n_links += 1
                    res.edges.append((url, str(dst), wave))
                    discoveries.append((depth + 1, child_seq(seq, pos), str(dst)))

        # admission in (depth, seq) order (crawl_semantics rule 4)
        discoveries.sort()
        counts = defaultdict(int)
        if discoveries:
            d_urls = pd.Series([u for _, _, u in discoveries])
            d_hosts = urlnorm.host_of(d_urls)
            d_paths = urlnorm.path_of(d_urls)
            for (d, s, u), h_, p_ in zip(discoveries, d_hosts, d_paths):
                counts[admit(u, d, s, str(h_), str(p_))] += 1
        res.frontier = list(frontier)
        res.metrics.append(
            {
                "wave": wave,
                "n_fetched": len(fetch),
                "n_deferred": len(frontier) - counts["new"],
                "n_links": n_links,
                "n_new": counts["new"] + counts["blocked"],
                "n_robots_blocked": counts["blocked"],
            }
        )
    return res
