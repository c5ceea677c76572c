"""Codec + pHash unit tests: the per-row invariants from BASELINE.json input_hint
(decoded-pixel allclose / PSNR≥40dB lossy) hold for every format."""

import numpy as np
import pytest

from crawlingathome_worker_spark import fakeimg, phash


@pytest.mark.parametrize("fmt", ["JPEG", "PNG", "WEBP", "GIF"])
def test_roundtrip_psnr(fmt):
    rng = np.random.default_rng(7)
    img = fakeimg.random_image(rng, 64, 48)
    b = fakeimg.encode(img, fmt)
    f, w, h, dec = fakeimg.decode(b)
    assert (f, w, h) == (fmt, 64, 48)
    if fmt in fakeimg.LOSSY:
        assert fakeimg.psnr(img, dec) >= 40.0  # input_hint invariant
        assert np.allclose(img.astype(int), dec.astype(int), atol=1)
    else:
        assert np.array_equal(img, dec)


def test_decode_rejects_garbage():
    assert fakeimg.decode(b"not an image at all" * 10) is None
    assert fakeimg.decode(b"") is None
    rng = np.random.default_rng(1)
    img = fakeimg.random_image(rng, 32, 32)
    b = fakeimg.encode(img, "PNG")
    assert fakeimg.decode(b[:50]) is None  # truncated stream
    assert fakeimg.decode(fakeimg.MAGIC["PNG"] + b"\x00" * 100) is None  # bad payload


def test_encoded_size_tracks_pixels():
    rng = np.random.default_rng(2)
    tiny = fakeimg.encode(fakeimg.random_image(rng, 32, 32), "JPEG")
    big = fakeimg.encode(fakeimg.random_image(rng, 96, 96), "JPEG")
    assert len(tiny) < 5000 <= len(big)  # exercises the F9 gate (crawlingathome.py:103)


def test_phash_deterministic_and_discriminative():
    rng = np.random.default_rng(3)
    a = fakeimg.random_image(rng, 64, 64)
    b = fakeimg.random_image(rng, 64, 64)
    pa, pb = phash.phash64(a), phash.phash64(b)
    assert pa == phash.phash64(a.copy())
    assert phash.hamming64(pa, pb) > 10  # unrelated noise far apart
    near = a.copy()
    near[:2, :2, 0] ^= 1
    assert phash.hamming64(pa, phash.phash64(near)) <= 4  # near-dup close


def test_image_feature_unit_norm():
    rng = np.random.default_rng(4)
    f = phash.image_feature(fakeimg.random_image(rng, 48, 48))
    assert f.shape == (64,)
    assert abs(float(np.linalg.norm(f)) - 1.0) < 1e-5
