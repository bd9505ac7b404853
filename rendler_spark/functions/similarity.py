"""Similarity / near-dup operators for training-data pipelines.

These extend the engine beyond the reference's operator set (a crawl feeding
an image+caption corpus needs dedup before training); they follow the same
vectorization discipline as the crawl UDFs: per-document Python loops carry
only O(1) interpreted work, all token/shingle math is numpy.

Operators:
* ``minhash_signatures``  — word-shingle MinHash signatures (mapInPandas)
* ``lsh_candidate_pairs`` — banded LSH bucketing -> candidate pairs ->
                            exact Jaccard verification (the scale path: the
                            O(n^2) comparison only happens inside buckets)
* ``simhash``             — 64-bit SimHash over tokens
* ``cosine_topk``         — brute-force cosine top-k against a query vector
                            (JVM higher-order functions, no Python)
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from rendler_spark.hashing import mix, splitmix64, to_i64

#: UDF-stage task cap: >16 concurrent Python workers oversubscribes this
#: sandbox (JVM threads + workers > vCPUs, documented in BENCH/BASELINE.md)
_UDF_TASKS = 16


def _spread(df: DataFrame, *cols: str) -> DataFrame:
    """Project + ensure the Arrow-UDF stage has enough partitions.

    Single-file parquet inputs arrive as ONE partition, serializing the
    whole signature build through one Python worker.  When the scan is
    narrower than the available parallelism we pay one shuffle of the
    projected columns to unlock it; at corpus scale inputs already carry
    many partitions and this is a no-op (no shuffle added)."""
    sel = df.select(*cols)
    target = min(df.sparkSession.sparkContext.defaultParallelism, _UDF_TASKS)
    if sel.rdd.getNumPartitions() < target:
        sel = sel.repartition(target)
    return sel


# ------------------------------------------------------------ shingles


def _token_hashes(toks: list[str]) -> np.ndarray:
    """Deterministic uint64 token hashes (pandas hash_array, fixed key —
    NOT Python hash(), which is process-salted)."""
    return pd.util.hash_array(np.asarray(toks or [""], dtype=object)).astype(np.uint64)


def _shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    """Hashes of word n-grams (shingles) of one document — numpy inner."""
    th = _token_hashes(text.split())
    if len(th) < n:
        th = np.concatenate([th, np.zeros(n - len(th), dtype=np.uint64)])
    win = np.lib.stride_tricks.sliding_window_view(th, n)
    h = np.zeros(len(win), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for col in range(n):
            h = splitmix64(h ^ (win[:, col] + np.uint64(col + 1)))
    return np.unique(h)


def minhash_signature(shingles: np.ndarray, k: int = 64, seed: int = 42) -> np.ndarray:
    """K-permutation MinHash via seeded splitmix rehash, vectorized (K x n)."""
    if len(shingles) == 0:
        return np.zeros(k, dtype=np.int64)
    seeds = mix(seed, np.arange(k))  # (k,)
    with np.errstate(over="ignore"):
        m = splitmix64(shingles[None, :] ^ seeds[:, None])  # (k, n)
    return to_i64(m.min(axis=1))


def _batch_minhash_sigs(
    texts, k: int = 64, seed: int = 42, n: int = 3
) -> list[list[int]]:
    """MinHash signatures for a whole batch of texts in a handful of
    vectorized passes — value-identical to per-doc
    ``minhash_signature(_shingle_hashes(t))`` (pinned by
    tests/test_similarity.py::test_batch_minhash_matches_per_doc), but
    token hashing, window mixing and the K-permutation min run over the
    batch's CONCATENATED token stream instead of per document
    (guide §4.2: hand whole batches to vectorized kernels)."""
    tok_lists = [t.split() or [""] for t in texts]
    ndocs = len(tok_lists)
    if ndocs == 0:
        return []
    # bound worker memory: the (k x total-shingles) matrix below scales
    # with the whole batch, so split long-document batches into chunks of
    # <= ~250k tokens (~128 MB matrix at k=64) — per-doc independence
    # makes chunking value-neutral
    max_tokens = 250_000
    total_tokens = sum(len(x) for x in tok_lists)
    if ndocs > 1 and total_tokens > max_tokens:
        out: list[list[int]] = []
        start, budget = 0, 0
        for i, lst in enumerate(tok_lists):
            if budget + max(len(lst), n) > max_tokens and i > start:
                out.extend(_batch_minhash_sigs(texts[start:i], k, seed, n))
                start, budget = i, 0
            budget += max(len(lst), n)
        out.extend(_batch_minhash_sigs(texts[start:], k, seed, n))
        return out
    raw_lens = np.fromiter((len(x) for x in tok_lists), dtype=np.int64, count=ndocs)
    lens = np.maximum(raw_lens, n)  # zero-pad short docs to window width
    offs = np.concatenate(([0], np.cumsum(lens)))
    th_all = pd.util.hash_array(
        np.asarray([tok for lst in tok_lists for tok in lst], dtype=object)
    ).astype(np.uint64)
    big = np.zeros(int(offs[-1]), dtype=np.uint64)
    pos = 0
    for d in range(ndocs):
        m = int(raw_lens[d])
        big[int(offs[d]): int(offs[d]) + m] = th_all[pos: pos + m]
        pos += m
    # window hashes over the concatenated stream (cross-doc windows are
    # simply never selected below)
    win = np.lib.stride_tricks.sliding_window_view(big, n)
    h = np.zeros(len(win), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for col in range(n):
            h = splitmix64(h ^ (win[:, col] + np.uint64(col + 1)))
    segs = [
        np.unique(h[int(offs[d]): int(offs[d]) + int(lens[d]) - (n - 1)])
        for d in range(ndocs)
    ]
    seg_lens = np.fromiter((len(s) for s in segs), dtype=np.int64, count=ndocs)
    allsh = np.concatenate(segs)
    seeds = mix(seed, np.arange(k))  # (k,)
    with np.errstate(over="ignore"):
        m64 = splitmix64(allsh[None, :] ^ seeds[:, None])  # (k, total)
    starts = np.concatenate(([0], np.cumsum(seg_lens)[:-1]))
    mins = np.minimum.reduceat(m64, starts, axis=1)  # segments never empty
    out = to_i64(mins.T)
    return [row.tolist() for row in out]


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, k: int = 64, seed: int = 42
) -> DataFrame:
    """(id, sig array<long>) per document."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {"id": pdf[id_col], "sig": _batch_minhash_sigs(pdf[text_col], k, seed)}
            )

    return _spread(df, id_col, text_col).mapInPandas(gen, "id long, sig array<long>")


def lsh_candidate_pairs(
    sigs: DataFrame, bands: int = 16, rows_per_band: int = 4
) -> DataFrame:
    """Banded LSH: docs sharing any band-hash bucket become candidate pairs.

    Scale shape: explode to (band, band_hash) keys -> self-join per bucket
    (shuffle on the bucket key, never all-pairs), distinct pairs out.
    """
    assert bands * rows_per_band <= 64  # default signature length
    b = sigs.select(
        "id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.lit(i), F.slice("sig", i * rows_per_band + 1, rows_per_band)
                    )
                    for i in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    left = b.alias("l")
    right = b.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )


def minhash_jaccard_estimate(sigs: DataFrame, pairs: DataFrame) -> DataFrame:
    """Estimated Jaccard = fraction of agreeing signature positions."""
    sa = sigs.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    eq = F.zip_with("sig_a", "sig_b", lambda a, b: (a == b).cast("int"))
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard_est",
            F.aggregate(eq, F.lit(0), lambda acc, x: acc + x) / F.size("sig_a"),
        )
        .select("id_a", "id_b", "jaccard_est")
    )


def near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    k: int = 64,
    bands: int = 16,
) -> DataFrame:
    """End-to-end MinHash+LSH near-dup: (id_a, id_b, jaccard_est >= thr).

    The signature frame is consumed three times (band explode + both
    sides of the estimate lookup); without a cache Spark re-runs the
    shingle+MinHash mapInPandas per consumer — the dominant CPU of this
    operator.  We persist it (deserialized, spill-safe); a production
    pipeline at corpus scale would materialize signatures to a table once
    and reuse them across runs (the signature build is one scan either
    way)."""
    from pyspark.storagelevel import StorageLevel

    sigs = minhash_signatures(df, id_col, text_col, k=k).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    pairs = lsh_candidate_pairs(sigs, bands=bands, rows_per_band=k // bands)
    est = minhash_jaccard_estimate(sigs, pairs)
    return est.filter(F.col("jaccard_est") >= threshold)


def shingle_rows(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Exploded distinct shingle hashes: (id, shingle) — one row per
    unique word-n-gram per document (same hashing as the MinHash path)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, shs = [], []
            for i, txt in zip(pdf[id_col], pdf[text_col]):
                h = _shingle_hashes(txt, n)
                ids.extend([i] * len(h))
                shs.extend(to_i64(h).tolist())
            yield pd.DataFrame({"id": ids, "shingle": shs})

    return _spread(df, id_col, text_col).mapInPandas(gen, "id long, shingle long")


def exact_jaccard(
    df: DataFrame, id_col: str, text_col: str, pairs: DataFrame, n: int = 3
) -> DataFrame:
    """EXACT n-gram Jaccard for given candidate pairs (id_a, id_b) —
    the verification step behind the MinHash ESTIMATE: intersection size
    via a shingle equi-join restricted to the pairs, union by
    inclusion-exclusion.  Cost is proportional to the candidate pairs'
    shingles, never all-pairs; the LSH bucketing supplies the pairs."""
    S = shingle_rows(df, id_col, text_col, n).persist()
    sizes = S.groupBy("id").agg(F.count("*").alias("sz"))
    inter = (
        pairs.join(S.select(F.col("id").alias("id_a"), "shingle"), "id_a")
        .join(S.select(F.col("id").alias("id_b"), "shingle"), ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    out = (
        pairs.join(inter, ["id_a", "id_b"], "left")
        .na.fill({"n_inter": 0})
        .join(sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter"))
            ).alias("jaccard"),
        )
    )
    return out


# ------------------------------------------------------------ simhash


def simhash_batch(texts: pd.Series, seed: int = 42) -> np.ndarray:
    """64-bit SimHash per document (sign of per-bit weighted token sums)."""
    out = np.empty(len(texts), dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    for i, t in enumerate(texts):
        h = splitmix64(_token_hashes(t.split() if t else [""]) ^ np.uint64(seed))
        bits = ((h[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
        acc = (2 * bits - 1).sum(axis=0)
        # old loop emitted acc[63] as the MSB: packbits over reversed acc
        # is the same 64-bit value (r6: vectorized bit pack)
        out[i] = int.from_bytes(
            np.packbits(acc[::-1] > 0).tobytes(), "big", signed=True
        )
    return out


def simhash_df(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {"id": pdf[id_col], "simhash": simhash_batch(pdf[text_col])}
            )

    return _spread(df, id_col, text_col).mapInPandas(gen, "id long, simhash long")


# ------------------------------------------------------------ cosine


def cosine_to_query(df: DataFrame, vec_col: str, qvec: list[float]) -> F.Column:
    """Cosine similarity column vs a constant query vector — pure JVM
    higher-order functions (zip_with + aggregate), no Python in the path."""
    q = F.array(*[F.lit(float(x)) for x in qvec])
    prod = F.zip_with(F.col(vec_col), q, lambda a, b: a.cast("double") * b)
    dot = F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)
    sq = lambda c: F.aggregate(  # noqa: E731
        F.transform(c, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    qn = float(np.sqrt(np.sum(np.asarray(qvec, dtype=np.float64) ** 2)))
    return dot / (F.sqrt(sq(F.col(vec_col))) * F.lit(qn))


def cosine_topk(
    df: DataFrame, id_col: str, vec_col: str, qvec: list[float], k: int = 10
) -> DataFrame:
    """Brute-force ANN baseline: exact top-k by cosine (TakeOrderedAndProject
    — no full sort).  ``srp_topk`` below is the LSH-bucketed scale path;
    brute force is its exactness/recall baseline."""
    return (
        df.withColumn("cos", cosine_to_query(df, vec_col, qvec))
        .select(F.col(id_col), F.round("cos", 4).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col(id_col))
        .limit(k)
    )


# ------------------------------------------------- SRP-LSH (ANN scale path)


def _srp_planes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    """Deterministic random hyperplanes: unit-free gaussians via Box-Muller
    over splitmix streams (no np.random state; reproducible everywhere)."""
    n = dim * n_planes
    u1 = (splitmix64(mix(seed, 101, np.arange(n))).astype(np.float64) + 1) / (2.0**64 + 2)
    u2 = (splitmix64(mix(seed, 202, np.arange(n))).astype(np.float64) + 1) / (2.0**64 + 2)
    g = np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)
    return g.reshape(n_planes, dim)


def srp_signature_vec(vecs: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """(n, dim) float matrix -> int64 sign signatures (one matmul)."""
    bits = (vecs @ planes.T) > 0  # (n, n_planes)
    out = np.zeros(len(vecs), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(planes.shape[0]):
            out = (out << np.uint64(1)) | bits[:, j].astype(np.uint64)
    return to_i64(out)


def srp_signatures(
    df: DataFrame, id_col: str, vec_col: str, n_planes: int = 16, seed: int = 42
) -> DataFrame:
    """Sign-random-projection signature per row: (id, vec, sig).

    One Arrow-batched matmul per batch — the signature build is a single
    pass over the corpus and the signature column is 8 bytes/row, so the
    index 'build' costs one scan at any corpus size."""
    schema = f"id long, {vec_col} array<float>, sig long"
    dim_row = df.select(F.size(vec_col).alias("d")).first()
    if dim_row is None:  # empty input: no dimension to infer, no rows out
        return df.sparkSession.createDataFrame([], schema)
    planes = _srp_planes(int(dim_row["d"]), n_planes, seed)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf[vec_col].map(np.asarray)).astype(np.float64)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    vec_col: pdf[vec_col],
                    "sig": srp_signature_vec(mat, planes),
                }
            )

    return _spread(df, id_col, vec_col).mapInPandas(gen, schema)


def srp_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    qvec: list[float],
    k: int = 10,
    n_planes: int = 16,
    max_hamming: int = 3,
    seed: int = 42,
) -> DataFrame:
    """LSH-bucketed ANN: candidates = rows whose SRP signature is within
    ``max_hamming`` bits of the query's (JVM popcount filter — prunes the
    corpus without touching vectors), then exact cosine on the survivors.

    At 10^10 rows the signature filter reads one long column; only the
    pruned candidate set pays the vector math."""
    planes = _srp_planes(len(qvec), n_planes, seed)
    qsig = int(srp_signature_vec(np.asarray([qvec], dtype=np.float64), planes)[0])
    sigs = srp_signatures(df, id_col, vec_col, n_planes, seed)
    cand = sigs.filter(
        F.bit_count(F.col("sig").bitwiseXOR(F.lit(qsig))) <= max_hamming
    )
    out = cand.withColumn("cos", cosine_to_query(cand, vec_col, qvec))
    return (
        out.select(F.col("id").alias(id_col), F.round("cos", 4).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col(id_col))
        .limit(k)
    )


def srp_signature_words(vecs: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """(n, dim) float matrix -> (n, n_words) int64 sign signatures.
    Word j holds planes [64j, 64j+64) in MSB-first order (multi-word form
    of ``srp_signature_vec`` for signatures wider than 64 planes)."""
    bits = (vecs @ planes.T) > 0  # (n, n_planes)
    n_planes = planes.shape[0]
    n_words = (n_planes + 63) // 64
    out = np.zeros((len(vecs), n_words), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(n_planes):
            w = j // 64
            out[:, w] = (out[:, w] << np.uint64(1)) | bits[:, j].astype(np.uint64)
    return out.view(np.int64)


def srp_signatures_multi(
    df: DataFrame, id_col: str, vec_col: str, n_planes: int = 128, seed: int = 42
) -> DataFrame:
    """Multi-word SRP signatures: (id, vec, sig array<bigint>).  Same
    one-matmul-per-Arrow-batch build as ``srp_signatures``; the signature
    column is ``n_planes/8`` bytes/row regardless of vector dim."""
    assert n_planes % 64 == 0
    schema = f"id long, {vec_col} array<float>, sig array<bigint>"
    dim_row = df.select(F.size(vec_col).alias("d")).first()
    if dim_row is None:  # empty input: no dimension to infer, no rows out
        return df.sparkSession.createDataFrame([], schema)
    planes = _srp_planes(int(dim_row["d"]), n_planes, seed)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf[vec_col].map(np.asarray)).astype(np.float64)
            words = srp_signature_words(mat, planes)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    vec_col: pdf[vec_col],
                    "sig": [w.tolist() for w in words],
                }
            )

    return _spread(df, id_col, vec_col).mapInPandas(gen, schema)


def embedding_near_duplicates(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    n_planes: int = 128,
    band_bits: int = 16,
    max_hamming: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-dup pairs: banded SRP-LSH candidates + exact
    cosine verify >= threshold (no false positives; recall is the banding
    collision probability, pinned by tests/test_similarity.py).

    Scale shape (mirrors ``lsh_candidate_pairs``/``phash_near_duplicates``):
    the 128-plane signature is exploded into ``n_planes/band_bits`` bands of
    ``band_bits``-bit keys, and the self-join runs on the (band, key)
    composite — 2^band_bits distinct keys per band (>= 2^16 by default), so
    no bucket degenerates into an all-pairs join at any corpus size.  By
    pigeonhole, every pair within Hamming distance < n_bands shares at
    least one band.  A JVM popcount filter (``max_hamming``, auto-derived
    from the threshold's expected SRP Hamming distance + 3 sigma when not
    given) prunes candidates before the vector math touches floats.

    Shuffle discipline: ONLY (id, band, key) — 20 bytes/row — rides the
    band explode and self-join; signatures and full vectors are joined
    back AFTER ``dropDuplicates`` on the surviving unique pairs (exactly
    how ``lsh_candidate_pairs``/``minhash_jaccard_estimate`` split
    candidate generation from verification).  Carrying the vectors
    through the explode would multiply vector bytes x n_bands in the
    shuffle — the r2 plan paid ~8x vector volume for nothing.  The
    signature frame feeds 3 consumers (explode + both verify sides), so
    it is persisted for the operator's lifetime."""
    from pyspark.storagelevel import StorageLevel

    assert n_planes % band_bits == 0 and band_bits <= 32
    n_bands = n_planes // band_bits
    if max_hamming is None:
        # E[hamming] for angle theta is n_planes * theta/pi (SRP collision
        # bound); allow +3 sigma of the binomial so true pairs survive
        p = float(np.arccos(min(max(threshold, -1.0), 0.999999)) / np.pi)
        max_hamming = int(np.ceil(n_planes * p + 3 * np.sqrt(n_planes * p * (1 - p))))
    sigs = srp_signatures_multi(df, id_col, vec_col, n_planes, seed).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    mask = (1 << band_bits) - 1
    per_word = 64 // band_bits
    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftrightunsigned(
                    F.element_at("sig", i // per_word + 1),
                    64 - band_bits * (i % per_word + 1),
                )
                .bitwiseAND(F.lit(mask))
                .alias("key"),
            )
            for i in range(n_bands)
        ]
    )
    keys = sigs.select("id", F.explode(bands).alias("bk")).select(
        "id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    cand = (
        keys.select(F.col("id").alias("id_a"), "band", "key")
        .join(keys.select(F.col("id").alias("id_b"), "band", "key"), ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    sa = sigs.select(
        F.col("id").alias("id_a"),
        F.col(vec_col).alias("va"),
        F.col("sig").alias("sig_a"),
    )
    sb = sigs.select(
        F.col("id").alias("id_b"),
        F.col(vec_col).alias("vb"),
        F.col("sig").alias("sig_b"),
    )
    ham = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    verified = cand.join(sa, "id_a").join(sb, "id_b").filter(ham <= max_hamming)
    prod = F.zip_with("va", "vb", lambda x, y: x.cast("double") * y.cast("double"))
    dot = F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)
    sq = lambda c: F.aggregate(  # noqa: E731
        F.transform(c, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = dot / (F.sqrt(sq(F.col("va"))) * F.sqrt(sq(F.col("vb"))))
    return (
        verified.withColumn("cos", F.round(cos, 4))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


# ------------------------------------------------- IVF (coarse-quantizer ANN)


def _unit(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def ivf_assign(
    df: DataFrame, id_col: str, vec_col: str, centroids: np.ndarray
) -> DataFrame:
    """(id, vec, cluster) — nearest-centroid (max cosine) assignment; one
    Arrow-batched matmul per batch against the (k, d) centroid matrix,
    which rides into every worker inside the UDF closure (k*d doubles —
    kilobytes)."""
    cu = _unit(centroids.astype(np.float64))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = _unit(np.stack(pdf[vec_col].map(np.asarray)).astype(np.float64))
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    vec_col: pdf[vec_col],
                    "cluster": (mat @ cu.T).argmax(axis=1).astype(np.int32),
                }
            )

    return _spread(df, id_col, vec_col).mapInPandas(
        gen, f"id long, {vec_col} array<float>, cluster int"
    )


def ivf_build(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int = 16,
    n_iter: int = 5,
    seed: int = 42,
) -> np.ndarray:
    """Deterministic spherical k-means coarse quantizer: returns the
    (n_centroids, dim) centroid matrix.

    Init: the ``n_centroids`` rows with the smallest det_mix(id XOR seed)
    (a deterministic data-dependent sample — no RNG state; the seed folds
    into the ordering so different seeds pick different inits).  Each Lloyd
    iteration is one assignment pass (Arrow matmul) plus ONE JVM-only
    shuffle: posexplode the assigned vectors and groupBy(cluster, pos)
    .avg — the element-wise mean without any Python aggregation.  The
    driver only ever holds k*d floats.  At corpus scale you train the
    quantizer on a det_sample slice and ``ivf_assign`` the full corpus
    once — the same build-on-sample/assign-everything split FAISS uses."""
    from rendler_spark.functions.sampling import det_mix

    seeds = (
        df.select(id_col, vec_col)
        .orderBy(
            det_mix(F.col(id_col).bitwiseXOR(F.lit(int(seed)))).asc(),
            F.col(id_col).asc(),
        )
        .limit(n_centroids)
        .collect()
    )
    cents = _unit(
        np.asarray([list(r[vec_col]) for r in seeds], dtype=np.float64)
    )
    for _ in range(n_iter):
        assigned = ivf_assign(df, id_col, vec_col, cents)
        means = (
            assigned.select("cluster", F.posexplode(vec_col).alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .collect()
        )
        new = cents.copy()  # empty clusters keep their previous centroid
        by_cluster: dict[int, dict[int, float]] = {}
        for r in means:
            by_cluster.setdefault(r["cluster"], {})[r["pos"]] = r["m"]
        for c, d in by_cluster.items():
            new[c] = [d[p] for p in range(len(d))]
        cents = _unit(new)
    return cents


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    qvec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    n_iter: int = 5,
    seed: int = 42,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF ANN: restrict the exact cosine top-k to the ``nprobe``
    clusters whose centroids are nearest the query (the classic inverted-
    file search; SRP-LSH's ``srp_topk`` is the signature-based
    alternative).  Search cost ~ nprobe/n_centroids of the corpus; with
    a materialized assignment column (partitioned/bucketed by cluster)
    the non-probed clusters are never scanned at all."""
    if centroids is None:
        centroids = ivf_build(df, id_col, vec_col, n_centroids, n_iter, seed)
    q = _unit(np.asarray([qvec], dtype=np.float64))[0]
    probe = np.argsort(-(_unit(centroids.astype(np.float64)) @ q))[:nprobe]
    cand = ivf_assign(df, id_col, vec_col, centroids).filter(
        F.col("cluster").isin([int(c) for c in probe])
    )
    out = cand.withColumn("cos", cosine_to_query(cand, vec_col, qvec))
    return (
        out.select(F.col("id").alias(id_col), F.round("cos", 4).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col(id_col))
        .limit(k)
    )


def ivf_index(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    wh,
    centroids: np.ndarray | None = None,
    n_centroids: int = 16,
    n_iter: int = 5,
    seed: int = 42,
    table: str = "ivf_index",
) -> np.ndarray:
    """Materialize the IVF serving index: assign the full corpus ONCE and
    write it as a Warehouse table Hive-sub-partitioned by ``cluster``
    (the inverted lists), committing the centroid matrix + metadata in
    the manifest so the index is self-describing.  This is the
    build-once/probe-many split that makes IVF an index instead of a
    per-query scan: ``ivf_topk_indexed`` reads ONLY the ``nprobe`` probed
    cluster partitions (PartitionFilters, pinned by
    tests/test_similarity.py), so each query touches ~nprobe/n_centroids
    of the corpus bytes and the other inverted lists are never opened.
    Returns the centroid matrix."""
    if centroids is None:
        centroids = ivf_build(df, id_col, vec_col, n_centroids, n_iter, seed)
    assigned = ivf_assign(df, id_col, vec_col, centroids)
    wh.overwrite_partition(table, 0, assigned, partition_by=["cluster"])
    wh.commit(
        (wh.last_version() or 0) + 1,
        {
            "kind": "ivf_index",
            "table": table,
            "id_col": id_col,
            "vec_col": vec_col,
            "centroids": [[float(x) for x in row] for row in centroids],
        },
    )
    return centroids


def _ivf_load_meta(wh, table: str) -> dict:
    """Newest ivf_index manifest for ``table``, plus the delta waves of
    every ivf_append committed AFTER it (appends from before a rebuild
    are superseded by the rebuild and must not be read)."""
    last = wh.last_version()
    base = None
    deltas: list[int] = []
    if last is not None:
        for v in range(last, wh.first_version() - 1, -1):
            m = wh.manifest(v)
            if m.get("table") != table:
                continue
            if m.get("kind") == "ivf_index":
                base = dict(m)
                break
            if m.get("kind") == "ivf_append":
                deltas.append(int(m["wave"]))
    if base is None:
        raise ValueError(f"no ivf_index manifest for table {table!r}")
    base["delta_waves"] = sorted(deltas)
    return base


def ivf_append(
    df_new: DataFrame,
    wh,
    table: str = "ivf_index",
) -> dict:
    """Incremental index maintenance (growing corpus): assign ONLY the
    new vectors to the EXISTING centroids and write them as a delta wave
    of the index table (same cluster sub-partitioning) — no re-shuffle,
    no re-assignment of the resident corpus.  ``ivf_probe`` reads
    base + deltas, so served results equal a full rebuild at unchanged
    centroids (pinned by tests/test_similarity.py).  Returns the commit
    metadata.  When :func:`ivf_staleness` shows the mean
    assigned-to-centroid cosine drifting down, rebuild with
    :func:`ivf_index` — a rebuild supersedes all prior deltas."""
    meta = _ivf_load_meta(wh, table)
    centroids = np.asarray(meta["centroids"], dtype=np.float64)
    wave = (meta["delta_waves"][-1] if meta["delta_waves"] else 0) + 1
    assigned = ivf_assign(df_new, meta["id_col"], meta["vec_col"], centroids)
    wh.overwrite_partition(table, wave, assigned, partition_by=["cluster"])
    commit = {
        "kind": "ivf_append",
        "table": table,
        "wave": wave,
    }
    wh.commit((wh.last_version() or 0) + 1, commit)
    return commit


def ivf_staleness(spark, wh, table: str = "ivf_index") -> float:
    """Index-quality metric for the append path: mean cosine between
    each indexed vector and its assigned centroid.  Fresh k-means
    assignments score high; as appended batches drift off the trained
    manifold the mean drops — the signal to rebuild.  One broadcast join
    (k rows) + JVM higher-order-function dot products; no Python."""
    meta = _ivf_load_meta(wh, table)
    centroids = _unit(np.asarray(meta["centroids"], dtype=np.float64))
    vec_col = meta["vec_col"]
    cent_rows = [
        (int(c), [float(x) for x in row]) for c, row in enumerate(centroids)
    ]
    cents = spark.createDataFrame(cent_rows, "cluster int, cvec array<double>")
    rows = wh.read(spark, table, wave=0).drop("wave")
    for w in meta["delta_waves"]:
        rows = rows.unionByName(wh.read(spark, table, wave=w).drop("wave"))
    joined = rows.join(F.broadcast(cents), "cluster")
    prod = F.zip_with(
        F.col(vec_col), F.col("cvec"), lambda a, b: a.cast("double") * b
    )
    dot = F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)
    norm = F.sqrt(
        F.aggregate(
            F.transform(F.col(vec_col), lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    # centroids are unit vectors; guard zero-norm rows
    cos = dot / F.when(norm > 0, norm).otherwise(F.lit(1.0))
    return float(joined.agg(F.avg(cos).alias("m")).collect()[0]["m"])


def ivf_probe(spark, wh, qvec: list[float], nprobe: int = 4, table: str = "ivf_index"):
    """The probed candidate read: nearest-``nprobe`` centroids by cosine,
    then a cluster-pruned scan of only those inverted-list partitions.
    Split out so tests can pin the PartitionFilters; returns
    (candidates, meta)."""
    meta = _ivf_load_meta(wh, table)
    centroids = np.asarray(meta["centroids"], dtype=np.float64)
    q = _unit(np.asarray([qvec], dtype=np.float64))[0]
    probe = np.argsort(-(_unit(centroids) @ q))[:nprobe]
    cand = wh.read(spark, table, wave=0).drop("wave")
    for w in meta["delta_waves"]:  # ivf_append deltas since last rebuild
        cand = cand.unionByName(wh.read(spark, table, wave=w).drop("wave"))
    cand = cand.filter(F.col("cluster").isin([int(c) for c in probe]))
    return cand, meta


def ivf_topk_indexed(
    spark,
    wh,
    qvec: list[float],
    k: int = 10,
    nprobe: int = 4,
    table: str = "ivf_index",
) -> DataFrame:
    """IVF ANN served from a materialized :func:`ivf_index`: identical
    results to :func:`ivf_topk` with the same centroids, but the per-query
    cost is a partition-pruned read of the probed inverted lists + exact
    cosine on that slice — no full-corpus assignment pass per query."""
    cand, meta = ivf_probe(spark, wh, qvec, nprobe, table)
    id_col, vec_col = meta["id_col"], meta["vec_col"]
    out = cand.withColumn("cos", cosine_to_query(cand, vec_col, qvec))
    return (
        out.select(F.col("id").alias(id_col), F.round("cos", 4).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col(id_col))
        .limit(k)
    )
