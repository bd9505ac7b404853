"""Canonical crawl semantics shared by the Spark engine and the oracle.

The reference's ordering was *positional*: a single global FIFO deque
[upstream: python/rendler.py ~L40 ``crawlQueue = deque([seed])``, ~L130
``popleft()``] — meaningless under distribution.  The north rule replaces it
with "BFS frontier expansion order per host" + per-host politeness budgets
(BASELINE.json:L6,L14).  This module pins the exact, partition-independent
definition both implementations follow:

1. Every frontier row carries ``(depth, seq)``.  ``seq`` is pure lineage,
   encoded as a lowercase-hex STRING so it never overflows at depth
   (an int64 encoding ``seq*16+pos`` silently wraps at depth ~14 with 512
   seeds — ordering corruption, not an error):
     seed k                                   -> seq = f"{k:016x}"
     link at position p of parent with seq s  -> seq = s + f"{p:x}"
   One hex digit per position requires SEQ_BASE=16 > max links per page.
   Rows of equal depth have equal-length seqs (16 + depth chars), so
   LEXICOGRAPHIC order on seq == numeric order of the unbounded lineage
   integer — and (depth, seq) never compares seqs of unequal depth.
   Spark's UTF-8 binary string sort and Python's code-point sort agree on
   ASCII hex, so the order is deterministic under ANY partitioning and
   identical across engine and oracle (SURVEY.md §4.2).

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

7. ``max_render_tasks`` (reference: the scheduler stopped after N render
   tasks [upstream: python/rendler.py ~L120-135]): a GLOBAL cumulative cap
   on fetches.  Within a wave, after politeness selection, if the
   remaining allowance is smaller than the fetch set, the allowance goes
   to the globally smallest rows by (depth, host, seq) — shallowest BFS
   layer first, deterministic tie-break — and the rest are deferred
   unchanged.  A wave that opens with no allowance left ends the crawl
   (frontier intact, resumable with a raised cap).
"""

SEQ_BASE = 16  # lineage digits per link position: > max out-links per page
#: hex digits in the seed prefix (supports up to 2^64 seeds)
SEED_WIDTH = 16

#: images/frontier/seen shard count — pmod(xxhash64(url), N_SHARDS)
N_SHARDS = 16


def seed_seq(k: int) -> str:
    """Lineage seq of seed number k (fixed-width hex prefix)."""
    assert 0 <= k < 16**SEED_WIDTH
    return f"{k:0{SEED_WIDTH}x}"


def child_seq(parent_seq: str, pos: int) -> str:
    """Deterministic lineage-based sequence (scalar form): one lowercase
    hex digit appended per link position."""
    assert 0 <= pos < SEQ_BASE
    return parent_seq + f"{pos:x}"
