"""Sharded cuckoo filter — the named alternative URL-seen prefilter.

The north rule says "a partitioned Bloom/cuckoo-filter URL-seen set"
(BASELINE.json:L6/L14); ``bloom.py`` covers the Bloom half, this module the
cuckoo half.  Same prefilter-only contract: **zero false negatives**, false
positives cost an anti-join probe but never correctness.  What cuckoo adds
over Bloom is DELETION — when seen entries are compacted or expired (e.g. a
recrawl window), their fingerprints can be removed without rebuilding.

Partial-key cuckoo filter (Fan et al., CoNEXT'14, public algorithm):

* table of ``n_buckets`` (power of two) x ``bucket_size`` 16-bit
  fingerprint slots; fingerprint 0 means empty (real fps are forced >= 1);
* item with hash h: fp = fp16(h), bucket i1 = h1(h) & mask,
  i2 = i1 XOR (fph(fp) & mask) — the alt bucket is computable from
  (bucket, fp) alone, which is what makes eviction and merge possible;
* insert tries i1/i2, then evicts (bounded kicks); a displaced fp that
  cannot land goes to a small stash of (bucket, fp) pairs; if the stash
  overflows the filter sets a ``saturated`` flag and ``contains`` returns
  True for everything — graceful degradation to a no-op prefilter, never
  a false negative;
* the table layout depends on insertion order (we sort hashes for
  stability), but MEMBERSHIP does not: every inserted key is found in
  i1, i2, or the stash regardless of layout.

Blob layout (what travels through Spark broadcast / the warehouse table):
  uint32 n_buckets | uint8 bucket_size | uint8 saturated | uint32 stash_len
  | uint16 table[n_buckets * bucket_size] | (uint32 bucket, uint16 fp) stash
"""

from __future__ import annotations

import numpy as np

from rendler_spark.hashing import splitmix64

_C_FP = np.uint64(0x9E3779B97F4A7C15)
_C_B1 = np.uint64(0xC2B2AE3D27D4EB4F)
_C_FPH = np.uint64(0x165667B19E3779F9)

MAX_KICKS = 500
STASH_MAX = 64

_HDR = np.dtype(
    [
        ("n_buckets", "<u4"),
        ("bucket_size", "u1"),
        ("saturated", "u1"),
        ("stash_len", "<u4"),
    ]
)
_STASH_DT = np.dtype([("bucket", "<u4"), ("fp", "<u2")])


def _fp16(hashes: np.ndarray) -> np.ndarray:
    """Nonzero 16-bit fingerprints from int64 hashes."""
    h = np.asarray(hashes, dtype=np.int64).view(np.uint64)
    fp = (splitmix64(h ^ _C_FP) & np.uint64(0xFFFF)).astype(np.uint16)
    return np.where(fp == 0, np.uint16(1), fp)


def _bucket1(hashes: np.ndarray, n_buckets: int) -> np.ndarray:
    h = np.asarray(hashes, dtype=np.int64).view(np.uint64)
    return (splitmix64(h ^ _C_B1) & np.uint64(n_buckets - 1)).astype(np.uint32)


def _alt(bucket: np.ndarray, fp: np.ndarray, n_buckets: int) -> np.ndarray:
    """Alt bucket = bucket XOR (hash(fp) & mask): involutive, fp-only."""
    fph = splitmix64(fp.astype(np.uint64) ^ _C_FPH) & np.uint64(n_buckets - 1)
    return (bucket.astype(np.uint32) ^ fph.astype(np.uint32)).astype(np.uint32)


class CuckooFilter:
    def __init__(self, n_buckets: int = 1 << 13, bucket_size: int = 4):
        assert n_buckets & (n_buckets - 1) == 0, "n_buckets must be a power of 2"
        self.n_buckets = n_buckets
        self.bucket_size = bucket_size
        self.table = np.zeros((n_buckets, bucket_size), dtype=np.uint16)
        self.stash: list[tuple[int, int]] = []  # (bucket, fp)
        self.saturated = False

    # ------------------------------------------------------------ insert

    def _try_place(self, bucket: int, fp: int) -> bool:
        row = self.table[bucket]
        free = np.flatnonzero(row == 0)
        if len(free):
            row[free[0]] = fp
            return True
        return False

    def insert_one(self, bucket: int, fp: int) -> None:
        """Insert a (bucket, fp) pair with bounded eviction."""
        if self.saturated:
            return
        i1 = int(bucket)
        i2 = int(_alt(np.asarray([i1], np.uint32), np.asarray([fp], np.uint16),
                      self.n_buckets)[0])
        if self._try_place(i1, fp) or self._try_place(i2, fp):
            return
        cur_b, cur_fp = i1, fp
        for kick in range(MAX_KICKS):
            slot = kick % self.bucket_size
            cur_fp, self.table[cur_b, slot] = (
                int(self.table[cur_b, slot]),
                cur_fp,
            )
            cur_b = int(
                _alt(np.asarray([cur_b], np.uint32),
                     np.asarray([cur_fp], np.uint16), self.n_buckets)[0]
            )
            if self._try_place(cur_b, cur_fp):
                return
        self.stash.append((cur_b, cur_fp))
        if len(self.stash) > STASH_MAX:
            self.saturated = True

    def insert_hashes(self, hashes: np.ndarray) -> None:
        h = np.sort(np.unique(np.asarray(hashes, dtype=np.int64)))
        fps = _fp16(h)
        b1s = _bucket1(h, self.n_buckets)
        for b, fp in zip(b1s, fps):
            self.insert_one(int(b), int(fp))

    # ------------------------------------------------------------ probe

    def contains_hashes(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized membership: True = maybe seen, False = definitely new."""
        h = np.asarray(hashes, dtype=np.int64)
        if self.saturated:
            return np.ones(len(h), dtype=bool)
        if len(h) == 0:
            return np.zeros(0, dtype=bool)
        fp = _fp16(h)
        i1 = _bucket1(h, self.n_buckets)
        i2 = _alt(i1, fp, self.n_buckets)
        hit = (self.table[i1] == fp[:, None]).any(axis=1) | (
            self.table[i2] == fp[:, None]
        ).any(axis=1)
        for sb, sfp in self.stash:
            hit |= ((i1 == sb) | (i2 == sb)) & (fp == sfp)
        return hit

    # ------------------------------------------------------------ delete

    def delete_hashes(self, hashes: np.ndarray) -> int:
        """Remove one matching fingerprint per key (the cuckoo deletion
        property Bloom lacks).  Only delete keys that were inserted —
        deleting a never-inserted key can evict a colliding member's
        fingerprint (standard cuckoo-filter caveat).  Returns #removed."""
        h = np.asarray(hashes, dtype=np.int64)
        fps = _fp16(h)
        i1s = _bucket1(h, self.n_buckets)
        i2s = _alt(i1s, fps, self.n_buckets)
        removed = 0
        for i1, i2, fp in zip(i1s, i2s, fps):
            done = False
            for b in (int(i1), int(i2)):
                slots = np.flatnonzero(self.table[b] == fp)
                if len(slots):
                    self.table[b, slots[0]] = 0
                    removed += 1
                    done = True
                    break
            if done:
                continue
            for j, (sb, sfp) in enumerate(self.stash):
                if sfp == fp and sb in (int(i1), int(i2)):
                    self.stash.pop(j)
                    removed += 1
                    break
        return removed

    # ------------------------------------------------------------ merge

    def merge(self, other: "CuckooFilter") -> None:
        """Fold another filter's entries in (same geometry required) —
        the cuckoo analogue of Bloom's bitwise OR, used for incremental
        per-wave updates."""
        assert (self.n_buckets, self.bucket_size) == (
            other.n_buckets,
            other.bucket_size,
        )
        if other.saturated:
            self.saturated = True
            return
        bs, fps = np.nonzero(other.table)
        order = np.lexsort((other.table[bs, fps], bs))
        for idx in order:
            self.insert_one(int(bs[idx]), int(other.table[bs[idx], fps[idx]]))
        for sb, sfp in other.stash:
            self.insert_one(int(sb), int(sfp))

    # ------------------------------------------------------------ (de)serialize

    def to_bytes(self) -> bytes:
        hdr = np.zeros(1, dtype=_HDR)
        hdr["n_buckets"] = self.n_buckets
        hdr["bucket_size"] = self.bucket_size
        hdr["saturated"] = 1 if self.saturated else 0
        hdr["stash_len"] = len(self.stash)
        stash = np.zeros(len(self.stash), dtype=_STASH_DT)
        for j, (sb, sfp) in enumerate(self.stash):
            stash[j] = (sb, sfp)
        return hdr.tobytes() + self.table.tobytes() + stash.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "CuckooFilter":
        blob = bytes(blob)
        hdr = np.frombuffer(blob[: _HDR.itemsize], dtype=_HDR)[0]
        nb, bs = int(hdr["n_buckets"]), int(hdr["bucket_size"])
        f = cls(nb, bs)
        f.saturated = bool(hdr["saturated"])
        tbl_bytes = nb * bs * 2
        f.table = (
            np.frombuffer(blob[_HDR.itemsize : _HDR.itemsize + tbl_bytes], np.uint16)
            .reshape(nb, bs)
            .copy()
        )
        stash = np.frombuffer(blob[_HDR.itemsize + tbl_bytes :], dtype=_STASH_DT)
        f.stash = [(int(s["bucket"]), int(s["fp"])) for s in stash]
        return f


# ---------------------------------------------------- blob-level functions
# (uniform signatures for the engine's filter dispatch; see seenfilter.py)


def build_blob(hashes: np.ndarray, n_buckets: int, bucket_size: int = 4) -> bytes:
    f = CuckooFilter(n_buckets, bucket_size)
    f.insert_hashes(hashes)
    return f.to_bytes()


def merge_blobs(a: bytes, b: bytes) -> bytes:
    fa, fb = CuckooFilter.from_bytes(a), CuckooFilter.from_bytes(b)
    fa.merge(fb)
    return fa.to_bytes()


def contains_blob(blob: bytes, hashes: np.ndarray) -> np.ndarray:
    return CuckooFilter.from_bytes(blob).contains_hashes(hashes)


def delete_blob(blob: bytes, hashes: np.ndarray) -> tuple[bytes, int]:
    f = CuckooFilter.from_bytes(blob)
    n = f.delete_hashes(hashes)
    return f.to_bytes(), n
