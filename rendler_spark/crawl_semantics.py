"""Canonical crawl semantics shared by the Spark engine and the oracle.

The reference's ordering was *positional*: a single global FIFO deque
[upstream: python/rendler.py ~L40 ``crawlQueue = deque([seed])``, ~L130
``popleft()``] — meaningless under distribution.  The north rule replaces it
with "BFS frontier expansion order per host" + per-host politeness budgets
(BASELINE.json:L6,L14).  This module pins the exact, partition-independent
definition both implementations follow:

1. Every frontier row carries ``(depth, seq)``.  ``seq`` is pure lineage:
     seed k            -> seq = k
     link at position p of parent with seq s -> seq = s * SEQ_BASE + p
   SEQ_BASE > max links per page, so (parent_seq, p) orders exactly like
   the child seq — deterministic under ANY partitioning (SURVEY.md §4.2).

2. Within a wave, each host fetches its frontier rows in (depth, seq)
   order, up to its effective politeness budget; the rest are deferred to
   the next wave unchanged.

3. The global fetch order within a wave is (host, depth, seq) — the golden
   fetch-order fixture sorts this way.

4. Discoveries of a wave are admitted in (depth, seq) order: first-wins
   dedup = min(depth, seq) per canonical URL.  (NOT parent fetch order —
   that would leak host-sort order into lineage.)

5. ``seen`` = every canonical URL ever admitted, including robots-blocked
   ones (blocked URLs are marked seen so they are never re-considered, but
   never fetched).  Bloom/cuckoo shards are a prefilter over ``seen``;
   the exact anti-join is authoritative (BASELINE.json:L6).

6. Discoveries of fetch-wave w become fetchable at wave w+1; seeds are
   admitted at wave 0.
"""

SEQ_BASE = 16  # > max out-links per page (12 at the largest fixture tier)

#: images/frontier/seen shard count — pmod(xxhash64(url), N_SHARDS)
N_SHARDS = 16


def child_seq(parent_seq: int, pos: int) -> int:
    """Deterministic lineage-based sequence number (scalar form)."""
    assert 0 <= pos < SEQ_BASE
    return parent_seq * SEQ_BASE + pos
