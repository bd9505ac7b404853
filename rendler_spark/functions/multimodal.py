"""Multimodal column operators: images as opaque binary + typed metadata.

The images table (input_hint schema: image_id, bytes, w, h, fmt, caption,
phash) treats media as a ``binary`` column.  Operators here follow the
large-scale pipeline pattern: decode / feature-extract / resize run as
Arrow-batched ``mapInPandas`` stages; pixel math is numpy per image
(per-row interpreted cost O(1)); metadata predicates (w/h/fmt filters)
stay JVM-side so partition/predicate pushdown still applies.

Codec support: the three self-contained formats (raw/png/qlossy — see
rendler_spark.codecs) decode for real.  External formats (jpeg, webp,
mp4 frame-sampling) need imaging libraries this container does not have;
those paths raise NotImplementedError behind the same UDF signature so the
Spark-side plumbing (schema, batching, partitioning) is real and tested.

phash near-dup uses banded bucketing: 64-bit phash split into 4x16-bit
bands; images sharing any band collide into a bucket (a Hamming-<=3 pair
must agree on >=1 band by pigeonhole); exact popcount verification runs
JVM-side (F.bit_count on xor) — the classic LSH-for-Hamming shape that
keeps the self-join off the full corpus.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from rendler_spark import codecs

EXTERNAL_FORMATS = {"jpeg", "jpg", "webp", "gif", "mp4", "avif"}


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    """Decode one image to HxWx3 uint8.  Stub boundary for external codecs."""
    if fmt in codecs.FORMATS:
        return codecs.decode(data, fmt)
    if fmt in EXTERNAL_FORMATS:
        raise NotImplementedError(
            f"decoding '{fmt}' requires an imaging library not present in "
            "this container; plug a decoder into rendler_spark.functions."
            "multimodal.decode_image"
        )
    raise ValueError(f"unknown image format {fmt!r}")


def image_stats(df: DataFrame, bytes_col: str = "bytes", fmt_col: str = "fmt") -> DataFrame:
    """Per-image channel means/stds (feature-extraction shape).

    Output: image_id, mean_r/g/b, std_r/g/b (rounded to 4)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            means = np.empty((len(pdf), 3))
            stds = np.empty((len(pdf), 3))
            for i, (b, f_) in enumerate(zip(pdf[bytes_col], pdf[fmt_col])):
                px = decode_image(bytes(b), f_).astype(np.float64)
                means[i] = px.mean(axis=(0, 1))
                stds[i] = px.std(axis=(0, 1))
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"],
                    "mean_r": means[:, 0].round(4),
                    "mean_g": means[:, 1].round(4),
                    "mean_b": means[:, 2].round(4),
                    "std_r": stds[:, 0].round(4),
                    "std_g": stds[:, 1].round(4),
                    "std_b": stds[:, 2].round(4),
                }
            )

    return df.select("image_id", bytes_col, fmt_col).mapInPandas(
        gen,
        "image_id string, mean_r double, mean_g double, mean_b double, "
        "std_r double, std_g double, std_b double",
    )


def resize_images(
    df: DataFrame, out_w: int, out_h: int, out_fmt: str = "png"
) -> DataFrame:
    """Nearest-neighbor resize + re-encode (thumbnailing shape).

    Output keeps the input_hint schema with updated bytes/w/h/fmt/phash."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yi = None
        for pdf in batches:
            out_bytes, phashes = [], []
            for b, f_ in zip(pdf["bytes"], pdf["fmt"]):
                px = decode_image(bytes(b), f_)
                h, w, _ = px.shape
                yi = (np.arange(out_h) * h) // out_h
                xi = (np.arange(out_w) * w) // out_w
                small = px[np.ix_(yi, xi)]
                out_bytes.append(codecs.encode(small, out_fmt))
                phashes.append(codecs.phash(small))
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"],
                    "bytes": out_bytes,
                    "w": np.full(len(pdf), out_w, dtype=np.int32),
                    "h": np.full(len(pdf), out_h, dtype=np.int32),
                    "fmt": [out_fmt] * len(pdf),
                    "caption": pdf["caption"],
                    "phash": np.array(phashes, dtype=np.int64),
                }
            )

    return df.select("image_id", "bytes", "fmt", "caption").mapInPandas(
        gen,
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash bigint",
    )


#: compressed video containers need external decoders (stub boundary —
#: the same split as EXTERNAL_AUDIO_FORMATS: raw decodes for REAL)
EXTERNAL_VIDEO_FORMATS = {"mp4", "webm", "avi", "mkv", "mov"}


def sample_video_frames(
    df: DataFrame, every_n: int = 30, out_fmt: str = "raw"
) -> DataFrame:
    """Video frame sampling: every ``every_n``-th frame of each clip,
    emitted as a standalone encoded image row (image_id, frame_idx,
    bytes, w, h, fmt) ready for the image operators (image_stats, phash,
    resize) downstream.

    'rawvideo' (VID0 header + packed uint8 frames — codecs.py) decodes
    for REAL, Arrow-batched; compressed containers
    (EXTERNAL_VIDEO_FORMATS) raise NotImplementedError honestly — no
    video codec library exists in this container, and faking one would
    hide the boundary.  The Spark-side plumbing (schema, batching,
    per-clip fan-out) is identical either way, so plugging a decoder
    activates mp4 without touching any plan."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from rendler_spark import codecs

        for pdf in batches:
            ids, idxs, blobs, ws, hs = [], [], [], [], []
            for _, row in pdf.iterrows():
                fmt = row["fmt"]
                if fmt in EXTERNAL_VIDEO_FORMATS:
                    raise NotImplementedError(
                        f"video format {fmt!r} requires a codec library "
                        "not present in this container"
                    )
                if fmt != "rawvideo":  # unknown formats must not fall
                    raise NotImplementedError(  # through to the raw decoder
                        f"unknown video format {fmt!r}"
                    )
                frames = codecs.decode_rawvideo(bytes(row["bytes"]))
                for i in range(0, frames.shape[0], every_n):
                    ids.append(row["image_id"])
                    idxs.append(i)
                    blobs.append(codecs.encode(frames[i], out_fmt))
                    hs.append(frames.shape[1])
                    ws.append(frames.shape[2])
            yield pd.DataFrame(
                {
                    "image_id": ids,
                    "frame_idx": np.array(idxs, dtype=np.int32),
                    "bytes": blobs,
                    "w": np.array(ws, dtype=np.int32),
                    "h": np.array(hs, dtype=np.int32),
                    "fmt": [out_fmt] * len(ids),
                }
            )

    return df.select("image_id", "bytes", "fmt").mapInPandas(
        gen,
        "image_id string, frame_idx int, bytes binary, w int, h int, fmt string",
    )


# ------------------------------------------------------- phash near-dup

def phash_near_duplicates(
    images: DataFrame, max_hamming: int = 3, n_bands: int = 4
) -> DataFrame:
    """Near-duplicate images by perceptual-hash Hamming distance.

    Banded exact-match bucketing (pigeonhole: distance <= n_bands-1 implies
    at least one identical 16-bit band) -> bucket-local self-join -> exact
    JVM popcount verify.  All JVM-side; no Python in the path.
    """
    assert 64 % n_bands == 0
    width = 64 // n_bands
    mask = (1 << width) - 1
    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftright(F.col("phash"), i * width).bitwiseAND(
                    F.lit(mask)
                ).alias("key"),
            )
            for i in range(n_bands)
        ]
    )
    b = images.select(
        F.col("image_id").alias("id"), "phash", F.explode(bands).alias("bk")
    ).select("id", "phash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    left, right = b.alias("l"), b.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.phash").alias("ph_a"),
            F.col("r.phash").alias("ph_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b")))
    return cand.withColumn("hamming", ham).filter(
        F.col("hamming") <= max_hamming
    ).select("id_a", "id_b", "hamming")


# ------------------------------------------------------------- audio

#: audio formats needing external decoders (stub boundary, like images)
EXTERNAL_AUDIO_FORMATS = {"mp3", "flac", "ogg", "aac", "opus"}


def decode_audio(data: bytes, fmt: str) -> np.ndarray:
    """Decode one clip to a float64 mono sample array in [-1, 1).

    'pcm16' (raw little-endian int16) and 'wav' (RIFF PCM via the stdlib
    ``wave`` module) decode for REAL — unlike images/video, lossless audio
    needs no external library, so the audio pipeline is fully exercisable
    in this container.  Compressed formats raise behind the same
    signature (same honest stub boundary as ``decode_image``)."""
    if fmt == "pcm16":
        return np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    if fmt == "wav":
        import io
        import wave

        with wave.open(io.BytesIO(data)) as wf:
            assert wf.getsampwidth() == 2, "only 16-bit PCM wav supported"
            raw = wf.readframes(wf.getnframes())
            x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
            return x.reshape(-1, wf.getnchannels()).mean(axis=1)
    if fmt in EXTERNAL_AUDIO_FORMATS:
        raise NotImplementedError(
            f"decoding '{fmt}' requires an audio library not present in "
            "this container; plug a decoder into rendler_spark.functions."
            "multimodal.decode_audio"
        )
    raise ValueError(f"unknown audio format {fmt!r}")


def audio_features(
    df: DataFrame,
    id_col: str = "clip_id",
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
    rate_col: str = "sample_rate",
) -> DataFrame:
    """Per-clip features a corpus filter runs before training: duration,
    RMS energy, peak amplitude, zero-crossing rate (per second).  Same
    pipeline shape as ``image_stats``: Arrow-batched mapInPandas, numpy
    per clip, metadata (fmt/rate predicates) stays JVM-side."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dur = np.empty(len(pdf))
            rms = np.empty(len(pdf))
            peak = np.empty(len(pdf))
            zcr = np.empty(len(pdf))
            for i, (b, f_, sr) in enumerate(
                zip(pdf[bytes_col], pdf[fmt_col], pdf[rate_col])
            ):
                x = decode_audio(bytes(b), f_)
                dur[i] = len(x) / sr
                rms[i] = float(np.sqrt(np.mean(x**2))) if len(x) else 0.0
                peak[i] = float(np.abs(x).max()) if len(x) else 0.0
                crossings = int(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])))
                zcr[i] = crossings / dur[i] if dur[i] else 0.0
            yield pd.DataFrame(
                {
                    "clip_id": pdf[id_col],
                    "duration_s": dur.round(6),
                    "rms": rms.round(6),
                    "peak": peak.round(6),
                    "zcr_per_s": zcr.round(3),
                }
            )

    return df.select(id_col, bytes_col, fmt_col, rate_col).mapInPandas(
        gen,
        "clip_id long, duration_s double, rms double, peak double, "
        "zcr_per_s double",
    )


def resample_audio(
    df: DataFrame,
    target_rate: int,
    id_col: str = "clip_id",
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
    rate_col: str = "sample_rate",
) -> DataFrame:
    """Linear-interpolation resample to ``target_rate``, re-encoded as
    pcm16 — the normalize-before-training step (thumbnailing's audio
    twin).  Pure numpy (np.interp) per clip."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for b, f_, sr in zip(pdf[bytes_col], pdf[fmt_col], pdf[rate_col]):
                x = decode_audio(bytes(b), f_)
                n_out = int(round(len(x) * target_rate / sr))
                t_out = np.arange(n_out) * (sr / target_rate)
                y = np.interp(t_out, np.arange(len(x)), x) if len(x) else x
                out.append(
                    np.clip(y * 32768.0, -32768, 32767).astype("<i2").tobytes()
                )
            yield pd.DataFrame(
                {
                    "clip_id": pdf[id_col],
                    "bytes": out,
                    "fmt": ["pcm16"] * len(pdf),
                    "sample_rate": np.full(len(pdf), target_rate, dtype=np.int32),
                }
            )

    return df.select(id_col, bytes_col, fmt_col, rate_col).mapInPandas(
        gen, "clip_id long, bytes binary, fmt string, sample_rate int"
    )
