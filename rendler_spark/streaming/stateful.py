"""Custom stateful streaming operator: the crawl's seen-set dedup (C1) as
an ``applyInPandasWithState`` stream transform.

A continuously-fed crawler ingests discovered URLs as a stream; first
occurrences must pass, repeats must be dropped, and the "have I seen this"
state must survive across micro-batches.  That is exactly the batch
engine's anti-join + Bloom-shard role (rendler_spark/engine.py), re-expressed
in Structured Streaming's stateful-operator contract: state is keyed by
``shard`` (same pmod(xxhash64(url), n_shards) sharding as the batch
engine) and the runtime checkpoints state between triggers.

Two state representations, same operator contract:

* ``mode="exact"`` — per-shard state is the set of URL STRINGS.  Exact by
  construction: no hash-collision loss (a 64-bit url_hash collision would
  silently drop a distinct URL — at 10^10 URLs the birthday bound makes
  collisions expected), matching the batch engine's exact anti-join on
  (url_hash, url).  State grows with distinct URLs per shard; right for
  tests and moderate scale.
* ``mode="blob"`` — per-shard state is the Bloom/cuckoo filter blob
  (operators/seenfilter.py), the production shape: state size is bounded
  by the blob bytes regardless of URL count, membership checks and
  inserts are vectorized numpy over the whole Arrow batch.  TOLERANCE,
  stated explicitly: a filter false positive drops a distinct URL (FP
  rate set by the blob sizing, e.g. ~0.1-1% at the engine defaults); no
  duplicate ever passes (zero false negatives).  A production pipeline
  pairs this with an append-only exact side table (the emitted rows ARE
  that table) and reconciles offline, exactly like the batch engine
  routes Bloom-positive rows through the exact anti-join.

The in-batch dedup is vectorized (pandas duplicated + isin / numpy
membership), no per-row Python.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from rendler_spark.operators import seenfilter

DEDUP_OUT_SCHEMA = "url string, url_hash bigint, shard int"
EXACT_STATE_SCHEMA = "urls array<string>"
BLOB_STATE_SCHEMA = "blob binary, n bigint"

#: blob-mode defaults (same family as CrawlEngine's): 2^20-bit Bloom per
#: shard ≈ 128 KiB state, FP ≈ 0.1% at ~100k URLs/shard with k=6
DEFAULT_BLOB_PARAMS = {
    "bloom_bits": 1 << 20,
    "bloom_k": 6,
    "cuckoo_buckets": 1 << 16,
    "cuckoo_bucket_size": 4,
}


def _dedup_exact_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    seen = set(state.get[0]) if state.exists else set()
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        u = pdf["url"]
        fresh = (~u.duplicated(keep="first")) & (~u.isin(seen))
        seen.update(u[fresh].tolist())
        out = pdf.loc[fresh, ["url", "url_hash", "shard"]]
        if len(out):
            yield out
    state.update((list(seen),))


def _make_blob_fn(kind: str, params: dict):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        blob: bytes | None = bytes(state.get[0]) if state.exists else None
        n = int(state.get[1]) if state.exists else 0
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            h = pdf["url_hash"].to_numpy(np.int64)
            maybe = (
                np.zeros(len(h), dtype=bool)
                if blob is None
                else seenfilter.contains_blob(kind, blob, h, params)
            )
            fresh = (~pd.Series(h).duplicated(keep="first").to_numpy()) & ~maybe
            new_h = h[fresh]
            if len(new_h):
                nb = seenfilter.build_blob(kind, new_h, params)
                blob = nb if blob is None else seenfilter.merge_blobs(kind, blob, nb)
                n += int(len(new_h))
            out = pdf.loc[fresh, ["url", "url_hash", "shard"]]
            if len(out):
                yield out
        if blob is not None:
            state.update((bytearray(blob), n))

    return fn


def streaming_seen_dedup(
    discovered: DataFrame,
    mode: str = "exact",
    kind: str = "bloom",
    params: dict | None = None,
) -> DataFrame:
    """First-occurrence filter over a stream of (url, url_hash, shard)
    rows; state keyed by shard, emission in append mode.  ``mode="exact"``
    keeps URL strings as state (collision-proof); ``mode="blob"`` keeps a
    bounded Bloom/cuckoo blob (production scale; documented FP-drop
    tolerance in the module docstring)."""
    if mode == "exact":
        fn, state_schema = _dedup_exact_fn, EXACT_STATE_SCHEMA
    elif mode == "blob":
        fn = _make_blob_fn(kind, {**DEFAULT_BLOB_PARAMS, **(params or {})})
        state_schema = BLOB_STATE_SCHEMA
    else:
        raise ValueError(f"unknown dedup mode {mode!r}")
    return discovered.groupBy("shard").applyInPandasWithState(
        fn,
        DEDUP_OUT_SCHEMA,
        state_schema,
        "append",
        GroupStateTimeout.NoTimeout,
    )
