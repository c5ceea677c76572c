"""Independent re-derivations of the SHARED semantic kernels (ADVICE r2).

The driver's 42/42 value gate proves the Spark orchestration matches the
oracle orchestration, but four kernels (phash, langid, text_feature,
image_feature) are imported by BOTH sides, so a bug inside one would be
invisible to it. Each test here recomputes the kernel from its documented
algorithm with a deliberately different code structure (textbook double-sum
DCT instead of the cached matrix product, per-pixel loops instead of
np.ix_ fancy indexing, dict accumulation instead of vectorized packing) and
requires exact agreement. Pure Python/numpy, no Spark session.
"""

from __future__ import annotations

import hashlib
import math
import re

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from crawlingathome_worker_spark.functions.langid import STOPWORDS, detect_lang
from crawlingathome_worker_spark.functions.textfix import remove_bad_chars
from crawlingathome_worker_spark.functions.udfs import text_feature
from crawlingathome_worker_spark.phash import hamming64, image_feature, phash64

# ---------------------------------------------------------------------------
# naive pHash: nearest-index resize -> orthonormal DCT-II (textbook double
# sum, only the 8x8 low block) -> median threshold -> MSB-first bit pack
# ---------------------------------------------------------------------------


def _naive_gray32(img: np.ndarray) -> np.ndarray:
    h, w, _ = img.shape
    out = np.empty((32, 32), dtype=np.float64)
    for i in range(32):
        for j in range(32):
            y = min(i * h // 32, h - 1)
            x = min(j * w // 32, w - 1)
            r, g, b = (float(img[y, x, c]) for c in range(3))
            out[i, j] = 0.299 * r + 0.587 * g + 0.114 * b
    return out


def _naive_dct_low(g: np.ndarray, n_out: int = 8) -> np.ndarray:
    """C(u,v) = a(u) a(v) sum_xy g[x,y] cos(pi(2x+1)u/2N) cos(pi(2y+1)v/2N)."""
    n = g.shape[0]
    x = np.arange(n)
    out = np.empty((n_out, n_out), dtype=np.float64)
    for u in range(n_out):
        for v in range(n_out):
            cu = np.cos(np.pi * (2 * x + 1) * u / (2 * n))
            cv = np.cos(np.pi * (2 * x + 1) * v / (2 * n))
            au = math.sqrt(1.0 / n) if u == 0 else math.sqrt(2.0 / n)
            av = math.sqrt(1.0 / n) if v == 0 else math.sqrt(2.0 / n)
            out[u, v] = au * av * float(cu @ g @ cv)
    return out


def _naive_phash(img: np.ndarray) -> int:
    low = _naive_dct_low(_naive_gray32(img))
    vals = sorted(low.ravel().tolist())
    med = (vals[31] + vals[32]) / 2.0  # median of 64 values
    v = 0
    for idx, c in enumerate(low.ravel().tolist()):
        if c > med:
            v |= 1 << (63 - idx)
    return v - (1 << 64) if v >= (1 << 63) else v


def _naive_image_feature(img: np.ndarray) -> np.ndarray:
    g = _naive_gray32(img)
    feat = np.empty(64, dtype=np.float64)
    for bi in range(8):
        for bj in range(8):
            feat[bi * 8 + bj] = g[bi * 4 : bi * 4 + 4, bj * 4 : bj * 4 + 4].mean()
    feat -= sum(feat) / 64.0  # mean-centered (documented kernel spec)
    n = math.sqrt(float((feat * feat).sum()))
    return (feat / n if n > 0 else feat).astype(np.float32)


_IMG_SIZES = [(32, 32), (100, 77), (7, 5), (64, 48), (33, 31)]


@pytest.mark.parametrize("h,w", _IMG_SIZES)
def test_phash_matches_naive_rederivation(h, w):
    rng = np.random.default_rng(h * 1000 + w)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert phash64(img) == _naive_phash(img)


def test_phash_low_contrast_image_matches_naive():
    # near-flat image: AC coefficients are tiny but REAL (random 1-LSB
    # texture, coefficient scale ~0.1), well above the ~1e-13 float noise —
    # the median threshold must agree exactly
    rng = np.random.default_rng(11)
    img = np.full((40, 40, 3), 127, dtype=np.uint8)
    img += rng.integers(0, 2, size=img.shape, dtype=np.uint8)
    assert phash64(img) == _naive_phash(img)


def test_phash_constant_image_deterministic():
    # a truly constant image has every AC coefficient at float-noise scale
    # (~1e-13 of DC); the resulting bit PATTERN is numerically arbitrary, so
    # only determinism and the 32-bit median balance are pinned here
    img = np.full((40, 40, 3), 127, dtype=np.uint8)
    h = phash64(img)
    assert h == phash64(img.copy())
    assert bin(h & (2**64 - 1)).count("1") == 32


def test_phash_locality_vs_discrimination():
    # one flipped pixel moves few bits; an independent image moves ~32
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(48, 48, 3), dtype=np.uint8)
    tweaked = img.copy()
    tweaked[10, 10] = 255 - tweaked[10, 10]
    other = rng.integers(0, 256, size=(48, 48, 3), dtype=np.uint8)
    assert hamming64(phash64(img), phash64(tweaked)) <= 8
    assert hamming64(phash64(img), phash64(other)) >= 16


@pytest.mark.parametrize("h,w", _IMG_SIZES)
def test_image_feature_matches_naive_rederivation(h, w):
    rng = np.random.default_rng(h + w)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    np.testing.assert_allclose(
        image_feature(img), _naive_image_feature(img), rtol=0, atol=1e-6
    )


# ---------------------------------------------------------------------------
# naive langid: printable projection -> token scan -> stopword vote with
# pinned tie-break -> ASCII-ratio fallback
# ---------------------------------------------------------------------------

_NAIVE_TOKEN = re.compile(r"[a-zA-ZÀ-ɏ']+")


def _naive_detect_lang(text: str) -> str:
    if not text.isprintable():
        text = remove_bad_chars(text)
    if not text:
        return "un"
    tokens = [t.lower() for t in _NAIVE_TOKEN.findall(text)]
    if not tokens:
        return "un"
    best_lang, best_score = None, -1
    for lang in ("en", "de", "fr", "es"):  # first-wins tie-break, pinned order
        score = 0
        for t in tokens:
            if t in STOPWORDS[lang]:
                score += 1
        if score > best_score:
            best_lang, best_score = lang, score
    if best_score == 0:
        n_ascii = sum(1 for c in text if ord(c) < 128)
        return "en" if n_ascii / len(text) >= 0.9 else "un"
    return best_lang


_WORD_POOL = sorted(set().union(*STOPWORDS.values())) + [
    "zebra", "qux", "Straße", "café", "niño", "xyzzy", "photo123", "",
]


@given(
    st.lists(st.sampled_from(_WORD_POOL), min_size=0, max_size=12),
    st.text(max_size=30),
)
@settings(max_examples=300, deadline=None)
def test_langid_matches_naive_rederivation(words, junk):
    text = " ".join(words + [junk])
    assert detect_lang(text) == _naive_detect_lang(text)


# ---------------------------------------------------------------------------
# naive text_feature: md5-hashed-token signed bucket counts, L2-normalized
# ---------------------------------------------------------------------------


def _naive_text_feature(text: str) -> np.ndarray:
    buckets: dict[int, float] = {}
    for tok in text.lower().split():
        d = hashlib.md5(tok.encode("utf-8")).digest()
        buckets[d[0] % 64] = buckets.get(d[0] % 64, 0.0) + (1.0 if d[1] & 1 else -1.0)
    vec = np.array([buckets.get(i, 0.0) for i in range(64)], dtype=np.float64)
    n = math.sqrt(float((vec * vec).sum()))
    return (vec / n if n > 0 else vec).astype(np.float32)


@given(st.text(max_size=120))
@settings(max_examples=300, deadline=None)
def test_text_feature_matches_naive_rederivation(text):
    np.testing.assert_allclose(
        text_feature(text), _naive_text_feature(text), rtol=0, atol=1e-6
    )
