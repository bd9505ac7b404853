import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pytest

from rendler_spark.functions import similarity as S

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
    (2, "completely different content about spark shuffle partitions and joins"),
    (3, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (4, "spark shuffle partitions and joins require careful key distribution"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_shingles_deterministic():
    a = S._shingle_hashes(DOCS[0][1])
    b = S._shingle_hashes(DOCS[0][1])
    assert (a == b).all()
    assert len(a) > 0
    assert not np.array_equal(a, S._shingle_hashes(DOCS[2][1]))


def test_minhash_identical_docs_identical_sigs():
    s0 = S.minhash_signature(S._shingle_hashes(DOCS[0][1]))
    s3 = S.minhash_signature(S._shingle_hashes(DOCS[3][1]))
    assert (s0 == s3).all() and len(s0) == 64


def test_minhash_estimates_jaccard():
    a = S._shingle_hashes(DOCS[0][1])
    b = S._shingle_hashes(DOCS[1][1])
    true_j = len(np.intersect1d(a, b)) / len(np.union1d(a, b))
    sa, sb = S.minhash_signature(a, k=256), S.minhash_signature(b, k=256)
    est = (sa == sb).mean()
    assert abs(est - true_j) < 0.15


def test_near_duplicates_end_to_end(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard_est"]
        for r in S.near_duplicates(docs, "doc_id", "text", threshold=0.5).collect()
    }
    assert (0, 3) in pairs and pairs[(0, 3)] == 1.0  # exact dup
    assert (0, 1) in pairs  # near dup (one word differs)
    assert not any({a, b} == {0, 2} for a, b in pairs)  # unrelated docs


def test_simhash_properties(spark, docs):
    rows = {r["id"]: r["simhash"] for r in S.simhash_df(docs, "doc_id", "text").collect()}
    assert rows[0] == rows[3]  # identical docs
    ham_near = bin((rows[0] ^ rows[1]) & (2**64 - 1)).count("1")
    ham_far = bin((rows[0] ^ rows[2]) & (2**64 - 1)).count("1")
    assert ham_near < ham_far


def test_srp_lsh_ann_recall(spark):
    """LSH ANN must recover most of the true top-k (recall vs brute force)
    and every returned cosine must be exact (it re-scores candidates)."""
    import pandas as pd

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(400, 32)).astype(np.float32)
    q = vecs[0].tolist()
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(400), "embedding": [v.tolist() for v in vecs]})
    ).filter("vec_id != 0")
    exact = [r["vec_id"] for r in S.cosine_topk(df, "vec_id", "embedding", q, k=10).collect()]
    approx = S.srp_topk(df, "vec_id", "embedding", q, k=10, max_hamming=6).collect()
    got = [r["vec_id"] for r in approx]
    recall = len(set(exact) & set(got)) / 10
    assert recall >= 0.5, (recall, exact, got)
    # scores are exact cosines (match the brute-force scoring)
    exact_scores = {r["vec_id"]: r["cos"] for r in S.cosine_topk(df, "vec_id", "embedding", q, k=400).collect()}
    for r in approx:
        assert r["cos"] == exact_scores[r["vec_id"]]


def test_embedding_near_duplicates(spark):
    """A planted near-identical vector must be found; random pairs not."""
    import pandas as pd

    rng = np.random.default_rng(12)
    vecs = rng.normal(size=(100, 32)).astype(np.float32)
    vecs[50] = vecs[7] + rng.normal(scale=0.01, size=32).astype(np.float32)
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(100), "embedding": [v.tolist() for v in vecs]})
    )
    pairs = {(r["id_a"], r["id_b"]): r["cos"]
             for r in S.embedding_near_duplicates(df, "vec_id", "embedding",
                                                  threshold=0.95).collect()}
    assert (7, 50) in pairs and pairs[(7, 50)] > 0.99
    assert all({a, b} == {7, 50} for a, b in pairs)  # no false pairs at 0.95


def test_embedding_near_duplicates_recall_vs_bruteforce(spark):
    """Banded LSH recall against the exact all-pairs answer: plant a
    cluster of perturbed copies so true near-dup pairs exist at several
    cosine levels; LSH must recover most of them (recall) and must emit
    NOTHING the brute force doesn't (precision 1.0 — exact verify)."""
    import pandas as pd

    rng = np.random.default_rng(7)
    base = rng.normal(size=(40, 32))
    rows = [v for v in base]
    for i in range(40):  # 2 perturbed copies per base vector
        for scale in (0.05, 0.15):
            rows.append(base[i] + rng.normal(scale=scale, size=32))
    vecs = np.asarray(rows, dtype=np.float32)
    thr = 0.9
    # exact all-pairs ground truth (numpy)
    vn = vecs / np.linalg.norm(vecs.astype(np.float64), axis=1, keepdims=True)
    cosm = vn @ vn.T
    truth = {
        (i, j)
        for i in range(len(vecs))
        for j in range(i + 1, len(vecs))
        if round(cosm[i, j], 4) >= thr
    }
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(len(vecs)), "embedding": [v.tolist() for v in vecs]})
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in S.embedding_near_duplicates(
            df, "vec_id", "embedding", threshold=thr
        ).collect()
    }
    assert len(truth) >= 60  # the fixture actually exercises the operator
    assert got <= truth  # precision 1.0: every emitted pair is a true pair
    recall = len(got & truth) / len(truth)
    assert recall >= 0.8, (recall, len(truth), len(got))


def test_cosine_topk(spark):
    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(50, 8)).astype(np.float32)
    vecs[7] = vecs[0] * 2.0  # same direction as the query -> cos 1.0
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(50), "embedding": [v.tolist() for v in vecs]})
    )
    top = S.cosine_topk(
        df.filter(F.col("vec_id") != 0), "vec_id", "embedding", vecs[0].tolist(), k=3
    ).collect()
    assert top[0]["vec_id"] == 7 and top[0]["cos"] == pytest.approx(1.0, abs=1e-3)


def test_exact_jaccard_matches_numpy_and_bounds_estimate(spark, docs):
    """exact_jaccard == set-based numpy Jaccard; the MinHash estimate on
    the same pairs stays within its statistical tolerance of the truth."""
    pairs = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "id_a long, id_b long"
    )
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in S.exact_jaccard(docs, "doc_id", "text", pairs).collect()
    }
    for a, b in ((0, 1), (0, 2), (0, 3)):
        sa, sb = S._shingle_hashes(DOCS[a][1]), S._shingle_hashes(DOCS[b][1])
        true_j = len(np.intersect1d(sa, sb)) / len(np.union1d(sa, sb))
        assert got[(a, b)] == pytest.approx(true_j, abs=1e-12)
    assert got[(0, 3)] == 1.0  # identical docs
    # estimate-vs-exact: near_duplicates' jaccard_est within tolerance
    est = {
        (r["id_a"], r["id_b"]): r["jaccard_est"]
        for r in S.near_duplicates(docs, "doc_id", "text", threshold=0.0).collect()
    }
    for pair, e in est.items():
        a, b = pair
        sa, sb = S._shingle_hashes(DOCS[a][1]), S._shingle_hashes(DOCS[b][1])
        true_j = len(np.intersect1d(sa, sb)) / len(np.union1d(sa, sb))
        assert abs(e - true_j) < 0.2, (pair, e, true_j)


def test_srp_signatures_empty_input(spark):
    """Empty input short-circuits to an empty frame with the output schema
    (dimension inference via first() has no row to read)."""
    import pyspark.sql.types as T

    empty = spark.createDataFrame(
        [], T.StructType([
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ])
    )
    s1 = S.srp_signatures(empty, "vec_id", "embedding")
    s2 = S.srp_signatures_multi(empty, "vec_id", "embedding")
    assert s1.count() == 0 and s2.count() == 0
    assert [f.name for f in s1.schema.fields] == ["id", "embedding", "sig"]
    assert [f.name for f in s2.schema.fields] == ["id", "embedding", "sig"]


def test_ivf_topk_recall_and_determinism(spark):
    """IVF ANN on clustered data: two identical builds give identical
    centroids (fully deterministic — no RNG), the probed search recovers
    most of the true top-k, and every returned score is the exact cosine."""
    import pandas as pd

    rng = np.random.default_rng(21)
    centers = rng.normal(size=(8, 16)) * 4
    vecs = np.concatenate(
        [c + rng.normal(size=(50, 16)) for c in centers]
    ).astype(np.float32)
    q = (centers[3] + rng.normal(size=16) * 0.1).tolist()
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(len(vecs)), "embedding": [v.tolist() for v in vecs]})
    )
    c1 = S.ivf_build(df, "vec_id", "embedding", n_centroids=8, n_iter=3)
    c2 = S.ivf_build(df, "vec_id", "embedding", n_centroids=8, n_iter=3)
    assert np.array_equal(c1, c2)

    exact = [r["vec_id"] for r in S.cosine_topk(df, "vec_id", "embedding", q, k=10).collect()]
    approx = S.ivf_topk(
        df, "vec_id", "embedding", q, k=10, n_centroids=8, nprobe=3, n_iter=3
    ).collect()
    got = [r["vec_id"] for r in approx]
    recall = len(set(exact) & set(got)) / 10
    assert recall >= 0.7, (recall, exact, got)
    exact_scores = {
        r["vec_id"]: r["cos"]
        for r in S.cosine_topk(df, "vec_id", "embedding", q, k=len(vecs)).collect()
    }
    for r in approx:
        assert r["cos"] == exact_scores[r["vec_id"]]


def test_ivf_index_partition_pruned_and_topk_parity(spark, tmp_path):
    """The materialized IVF serving path: (a) the index table is written
    Hive-sub-partitioned by cluster, (b) the probed read's cluster filter
    reaches the parquet scan as a PartitionFilter (only nprobe inverted
    lists are opened — the property that makes IVF an index at corpus
    scale), and (c) the indexed top-k returns exactly the same rows as
    the per-query-assignment ivf_topk with the same centroids."""
    from rendler_spark.sources.tables import Warehouse

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(8, 16)) * 4
    vecs = np.concatenate(
        [c + rng.normal(size=(40, 16)) for c in centers]
    ).astype(np.float32)
    q = (centers[5] + rng.normal(size=16) * 0.1).tolist()
    df = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": range(len(vecs)), "embedding": [v.tolist() for v in vecs]}
        )
    )
    wh = Warehouse(str(tmp_path / "ivf_wh"))
    cents = S.ivf_index(df, "vec_id", "embedding", wh, n_centroids=8, n_iter=3)
    # (a) cluster sub-dirs exist inside the wave partition
    assert list(wh.part_dir("ivf_index", 0).glob("cluster=*"))
    # (b) the probed read is partition-pruned on cluster
    cand, _meta = S.ivf_probe(spark, wh, q, nprobe=3)
    plan = cand._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    part_section = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "cluster" in part_section, plan
    # (c) identical results to the index-free path with the same centroids
    served = S.ivf_topk_indexed(spark, wh, q, k=10, nprobe=3).collect()
    direct = S.ivf_topk(
        df, "vec_id", "embedding", q, k=10, nprobe=3, centroids=cents
    ).collect()
    assert [(r["vec_id"], r["cos"]) for r in served] == [
        (r["vec_id"], r["cos"]) for r in direct
    ]


def test_ivf_append_parity_and_staleness(spark, tmp_path):
    """Incremental index maintenance (VERDICT r4 #8): appending a batch
    to an existing index must equal a full rebuild at unchanged centroids
    — same served top-k — and ivf_staleness must drop when the appended
    batch drifts off the trained manifold."""
    from rendler_spark.sources.tables import Warehouse

    rng = np.random.default_rng(11)
    centers = rng.normal(size=(8, 16)) * 4
    base = np.concatenate(
        [c + rng.normal(size=(40, 16)) for c in centers]
    ).astype(np.float32)
    extra = np.concatenate(
        [centers[i % 8] + rng.normal(size=(1, 16)) for i in range(40)]
    ).astype(np.float32)
    q = (centers[2] + rng.normal(size=16) * 0.1).tolist()

    def mk(vs, start=0):
        return spark.createDataFrame(
            pd.DataFrame(
                {
                    "vec_id": range(start, start + len(vs)),
                    "embedding": [v.tolist() for v in vs],
                }
            )
        )

    wh = Warehouse(str(tmp_path / "ivf_app"))
    cents = S.ivf_index(mk(base), "vec_id", "embedding", wh, n_centroids=8, n_iter=3)
    fresh = S.ivf_staleness(spark, wh)
    assert 0.0 < fresh <= 1.0

    S.ivf_append(mk(extra, start=len(base)), wh)
    served = S.ivf_topk_indexed(spark, wh, q, k=10, nprobe=3).collect()

    # full rebuild twin at the SAME centroids over base+extra
    wh2 = Warehouse(str(tmp_path / "ivf_full"))
    all_df = mk(np.concatenate([base, extra]))
    S.ivf_index(all_df, "vec_id", "embedding", wh2, centroids=cents)
    rebuilt = S.ivf_topk_indexed(spark, wh2, q, k=10, nprobe=3).collect()
    assert [(r["vec_id"], r["cos"]) for r in served] == [
        (r["vec_id"], r["cos"]) for r in rebuilt
    ]

    # staleness: on-manifold append keeps the metric close to fresh;
    # an off-manifold batch (orthogonal random noise, different scale)
    # drags the mean assigned-to-centroid cosine DOWN
    near = S.ivf_staleness(spark, wh)
    off = rng.normal(size=(400, 16)).astype(np.float32) * 9
    S.ivf_append(mk(off, start=10_000), wh)
    drifted = S.ivf_staleness(spark, wh)
    assert drifted < near, (fresh, near, drifted)

    # a rebuild supersedes all deltas: probe reads base wave only again
    S.ivf_index(all_df, "vec_id", "embedding", wh, centroids=cents)
    meta = S._ivf_load_meta(wh, "ivf_index")
    assert meta["delta_waves"] == []


def test_batch_minhash_matches_per_doc():
    """The vectorized batch MinHash kernel is value-identical to the
    per-document path (r6 optimization: concatenated-stream hashing +
    segment-min; this pin keeps the two paths interchangeable)."""
    import numpy as np
    import pandas as pd

    from rendler_spark.functions import similarity as S

    rng = np.random.default_rng(11)
    words = [f"w{i}" for i in range(200)]
    texts = [
        " ".join(rng.choice(words, size=int(rng.integers(0, 40))))
        for _ in range(64)
    ] + ["", "one", "one two", "one two three"]
    got = S._batch_minhash_sigs(pd.Series(texts))
    for i, t in enumerate(texts):
        want = S.minhash_signature(S._shingle_hashes(t), 64, 42).tolist()
        assert got[i] == want, f"doc {i} diverged"
