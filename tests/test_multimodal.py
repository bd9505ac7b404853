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


def _sine_pcm16(freq, sr, secs, amp=0.5):
    import numpy as np

    t = np.arange(int(sr * secs)) / sr
    x = amp * np.sin(2 * np.pi * freq * t)
    return np.clip(x * 32768.0, -32768, 32767).astype("<i2").tobytes()


def _wav_bytes(pcm16: bytes, sr: int, channels: int = 1) -> bytes:
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        wf.writeframes(pcm16)
    return buf.getvalue()


def test_audio_features_sine_properties(spark):
    """RMS of a sine = amp/sqrt(2); ZCR = 2*freq per second; duration =
    n/sr — closed-form checks on synthesized PCM (real decode, no stub)."""
    import math

    import pandas as pd

    from rendler_spark.functions.multimodal import audio_features

    sr = 16000
    clips = pd.DataFrame(
        {
            "clip_id": [0, 1],
            "bytes": [_sine_pcm16(440, sr, 1.0), _wav_bytes(_sine_pcm16(100, sr, 2.0), sr)],
            "fmt": ["pcm16", "wav"],
            "sample_rate": [sr, sr],
        }
    )
    rows = {r["clip_id"]: r for r in audio_features(spark.createDataFrame(clips)).collect()}
    assert rows[0]["duration_s"] == pytest.approx(1.0)
    assert rows[0]["rms"] == pytest.approx(0.5 / math.sqrt(2), rel=1e-3)
    assert rows[0]["zcr_per_s"] == pytest.approx(2 * 440, rel=0.01)
    assert rows[1]["duration_s"] == pytest.approx(2.0)
    assert rows[1]["zcr_per_s"] == pytest.approx(2 * 100, rel=0.01)


def test_audio_resample_preserves_duration_and_shape(spark):
    import numpy as np
    import pandas as pd

    from rendler_spark.functions.multimodal import decode_audio, resample_audio

    sr = 16000
    clips = pd.DataFrame(
        {
            "clip_id": [0],
            "bytes": [_sine_pcm16(440, sr, 1.0)],
            "fmt": ["pcm16"],
            "sample_rate": [sr],
        }
    )
    out = resample_audio(spark.createDataFrame(clips), target_rate=8000).collect()[0]
    assert out["fmt"] == "pcm16" and out["sample_rate"] == 8000
    y = decode_audio(bytes(out["bytes"]), "pcm16")
    assert len(y) == 8000  # 1 second at the new rate
    # still a 440 Hz sine: ~880 zero crossings
    zc = int(np.count_nonzero(np.signbit(y[1:]) != np.signbit(y[:-1])))
    assert abs(zc - 880) <= 10


def test_audio_external_format_is_honest_stub(spark):
    from rendler_spark.functions.multimodal import decode_audio

    with pytest.raises(NotImplementedError):
        decode_audio(b"\x00\x01", "mp3")


def test_phash_neardup_query_exact_vs_bruteforce(spark):
    """q_phash_neardup's banded LSH must equal brute-force ground truth:
    pigeonhole (hamming <= n_bands-1 implies one identical 16-bit band)
    gives recall 1.0 inside the threshold, and the popcount verify gives
    precision 1.0 — so the result is EXACT, not approximate.  The fixture
    plants +1-brightness companions (byte-different, phash-identical: md5
    dedup cannot catch them) and 4x4-patch companions."""
    from itertools import combinations

    from rendler_spark import codecs
    from rendler_spark.functions.multimodal import phash_near_duplicates
    from rendler_spark.queries import _phash_fixture_pixels

    import pandas as pd

    users = list(range(0, 40))
    pix = _phash_fixture_pixels(users)
    hashes = {image_id: codecs.phash(px) for image_id, px in pix}
    truth = {
        (a, b) if a < b else (b, a)
        for (a, b) in combinations(hashes, 2)
        if bin((hashes[a] ^ hashes[b]) & ((1 << 64) - 1)).count("1") <= 3
    }
    # every bright companion must be planted at hamming 0 (md5-proof pair)
    bright = {i for i, _ in pix if i.endswith("_bright")}
    assert len(bright) == 10
    assert all((i[: -len("_bright")], i) in truth for i in bright)
    df = spark.createDataFrame(
        pd.DataFrame(
            [(i, int(h)) for i, h in hashes.items()],
            columns=["image_id", "phash"],
        )
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in phash_near_duplicates(df, max_hamming=3).collect()
    }
    assert got == truth and len(got) >= len(bright)


def _rawvideo_clip(n_frames: int, h: int = 12, w: int = 16, seed: int = 0):
    import numpy as np

    from rendler_spark import codecs

    idx = np.arange(n_frames, dtype=np.uint8)[:, None, None, None]
    base = np.zeros((n_frames, h, w, 3), dtype=np.uint8)
    base[..., 0] = (idx[..., 0] * 7 + seed) % 256
    base[..., 1] = np.arange(w, dtype=np.uint8)[None, None, :] * 3
    base[..., 2] = np.arange(h, dtype=np.uint8)[None, :, None] * 5
    return base, codecs.encode_rawvideo(base)


def test_sample_video_frames_real_for_raw(spark):
    """rawvideo decodes for REAL (no external lib): every_n-th frame of
    each clip comes back as an encoded image row whose pixels equal the
    source frame exactly; frames land ready for image_stats/phash."""
    import numpy as np
    import pandas as pd

    from rendler_spark import codecs
    from rendler_spark.functions.multimodal import (
        image_stats, sample_video_frames,
    )

    f0, clip0 = _rawvideo_clip(61, seed=1)
    f1, clip1 = _rawvideo_clip(31, seed=9)
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "image_id": ["clipA", "clipB"],
                "bytes": [clip0, clip1],
                "fmt": ["rawvideo", "rawvideo"],
            }
        )
    )
    out = sample_video_frames(df, every_n=10).collect()
    got = {(r["image_id"], r["frame_idx"]): r for r in out}
    assert set(got) == {("clipA", i) for i in range(0, 61, 10)} | {
        ("clipB", i) for i in range(0, 31, 10)
    }
    r = got[("clipA", 30)]
    assert r["fmt"] == "raw" and (r["w"], r["h"]) == (16, 12)
    assert np.array_equal(codecs.decode(bytes(r["bytes"]), "raw"), f0[30])
    # sampled frames feed the image pipeline directly
    stats = image_stats(
        spark.createDataFrame(
            pd.DataFrame(
                [
                    {
                        "image_id": f'{rr["image_id"]}#{rr["frame_idx"]}',
                        "bytes": bytes(rr["bytes"]),
                        "fmt": rr["fmt"],
                    }
                    for rr in out
                ]
            )
        )
    ).collect()
    assert len(stats) == len(out)


def test_sample_video_frames_external_format_is_honest_stub(spark):
    import pandas as pd

    from rendler_spark.functions.multimodal import sample_video_frames

    df = spark.createDataFrame(
        pd.DataFrame(
            {"image_id": ["x"], "bytes": [b"\x00\x01"], "fmt": ["mp4"]}
        )
    )
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        sample_video_frames(df).collect()
