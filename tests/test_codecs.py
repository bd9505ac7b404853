import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rendler_spark import codecs


def _img(seed, h=40, w=55):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("fmt", ["raw", "png"])
def test_lossless_roundtrip(fmt):
    px = _img(1)
    assert (codecs.decode(codecs.encode(px, fmt), fmt) == px).all()


def test_qlossy_psnr_gate():
    """BASELINE.json:L15 — PSNR >= 40 dB for lossy formats."""
    for seed in range(5):
        px = _img(seed)
        dec = codecs.decode(codecs.encode(px, "qlossy"), "qlossy")
        assert codecs.psnr(px, dec) >= 40.0
        assert np.abs(dec.astype(int) - px.astype(int)).max() <= 2


def test_qlossy_deterministic():
    px = _img(2)
    assert codecs.encode(px, "qlossy") == codecs.encode(px, "qlossy")


def test_png_is_real_png():
    enc = codecs.encode(_img(3), "png")
    assert enc[:8] == b"\x89PNG\r\n\x1a\n"
    assert b"IHDR" in enc[:40] and enc.endswith(
        b"IEND" + enc[-4:]
    ) is not None


def test_psnr_identity_inf():
    px = _img(4)
    assert codecs.psnr(px, px) == float("inf")


def test_phash_properties():
    px = _img(5, 64, 64)
    h1 = codecs.phash(px)
    assert isinstance(h1, int) and -(2**63) <= h1 < 2**63
    # stable
    assert codecs.phash(px) == h1
    # robust to the qlossy quantization (a perceptual hash must be)
    dec = codecs.decode(codecs.encode(px, "qlossy"), "qlossy")
    diff = bin(codecs.phash(dec) ^ h1 if h1 >= 0 else (codecs.phash(dec) ^ h1) & (2**64 - 1)).count("1")
    assert diff <= 8
    # different image -> different hash (overwhelmingly)
    assert codecs.phash(_img(6, 64, 64)) != h1


@given(st.integers(0, 10_000), st.integers(8, 80), st.integers(8, 80))
@settings(max_examples=25, deadline=None)
def test_roundtrip_property(seed, h, w):
    px = _img(seed, h, w)
    for fmt in ("raw", "png"):
        assert (codecs.decode(codecs.encode(px, fmt), fmt) == px).all()
    dec = codecs.decode(codecs.encode(px, "qlossy"), "qlossy")
    assert codecs.psnr(px, dec) >= 40.0
