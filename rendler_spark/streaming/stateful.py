"""Custom stateful streaming operator: the crawl's seen-set dedup (C1) as
an ``applyInPandasWithState`` stream transform.

A continuously-fed crawler ingests discovered URLs as a stream; first
occurrences must pass, repeats must be dropped, and the "have I seen this"
state must survive across micro-batches.  That is exactly the batch
engine's anti-join + Bloom-shard role (rendler_spark/engine.py), re-expressed
in Structured Streaming's stateful-operator contract: state is keyed by
``shard`` (same pmod(xxhash64(url), n_shards) sharding as the batch
engine), each shard's task holds that shard's hash set, and the runtime
checkpoints state between triggers.

Scale notes: per-shard state is the hash SET — at 10^10 URLs a raw set is
too big for GroupState, so production would hold the Bloom/cuckoo blob
(operators/seenfilter.py) as state and pair it with a compacted exact
store for the authoritative check; the operator contract (keyed state +
append-mode emission) is identical.  The in-batch dedup is vectorized
(pandas duplicated + isin), no per-row Python.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_OUT_SCHEMA = "url string, url_hash bigint, shard int"
DEDUP_STATE_SCHEMA = "hashes array<bigint>"


def _dedup_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    seen = set(state.get[0]) if state.exists else set()
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        h = pdf["url_hash"]
        fresh = (~h.duplicated(keep="first")) & (~h.isin(seen))
        seen.update(h[fresh].tolist())
        out = pdf.loc[fresh, ["url", "url_hash", "shard"]]
        if len(out):
            yield out
    state.update((sorted(seen),))


def streaming_seen_dedup(discovered: DataFrame) -> DataFrame:
    """First-occurrence filter over a stream of (url, url_hash, shard)
    rows; state keyed by shard, emission in append mode."""
    return discovered.groupBy("shard").applyInPandasWithState(
        _dedup_fn,
        DEDUP_OUT_SCHEMA,
        DEDUP_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
