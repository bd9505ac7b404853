import numpy as np
import pandas as pd
import pytest

from rendler_spark import codecs
from rendler_spark.functions import multimodal as M


def _img_row(seed, fmt, h=40, w=30):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    return px, codecs.encode(px, fmt)


@pytest.fixture(scope="module")
def images(spark):
    rows = []
    pixels = {}
    for i, fmt in enumerate(["raw", "png", "qlossy", "raw"]):
        px, b = _img_row(i, fmt)
        rows.append((f"img{i}", b, 30, 40, fmt, f"caption {i}", codecs.phash(px)))
        pixels[f"img{i}"] = px
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string, caption string, phash bigint"
    )
    return df, pixels


def test_image_stats_match_numpy(spark, images):
    df, pixels = images
    got = {r["image_id"]: r for r in M.image_stats(df).collect()}
    for iid, px in pixels.items():
        fmt = {0: "raw", 1: "png", 2: "qlossy", 3: "raw"}[int(iid[3])]
        ref = codecs.decode(codecs.encode(px, fmt), fmt).astype(np.float64)
        assert got[iid]["mean_r"] == pytest.approx(ref[:, :, 0].mean(), abs=1e-3)
        assert got[iid]["std_b"] == pytest.approx(ref[:, :, 2].std(), abs=1e-3)


def test_resize_images(spark, images):
    df, _ = images
    out = M.resize_images(df, 16, 16).collect()
    assert len(out) == df.count()
    for r in out:
        px = codecs.decode(bytes(r["bytes"]), r["fmt"])
        assert px.shape == (16, 16, 3)
        assert r["w"] == 16 and r["h"] == 16 and r["caption"].startswith("caption")


def test_external_format_stub(spark):
    df = spark.createDataFrame(
        [("x", b"\xff\xd8junk", 1, 1, "jpeg", "c", 0)],
        "image_id string, bytes binary, w int, h int, fmt string, caption string, phash bigint",
    )
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    with pytest.raises((PythonException, Py4JJavaError)) as e:
        M.image_stats(df).collect()
    assert "NotImplementedError" in str(e.value) or "imaging library" in str(e.value)


def test_phash_near_duplicates(spark):
    """A qlossy re-encode of the same image must be found as a near-dup;
    an unrelated image must not."""
    rng = np.random.default_rng(42)
    base = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    other = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    qlossy_px = codecs.decode(codecs.encode(base, "qlossy"), "qlossy")
    rows = [
        ("a", codecs.phash(base)),
        ("a_q", codecs.phash(qlossy_px)),
        ("z", codecs.phash(other)),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["image_id", "phash"])
    )
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in M.phash_near_duplicates(df, max_hamming=3).collect()}
    assert ("a", "a_q") in pairs
    assert not any("z" in p for p in pairs)
