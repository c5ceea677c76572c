"""Perceptual hash (pHash): 32×32 grayscale → DCT-II → 8×8 low-frequency → median bits.

Pure numpy (no scipy/imagehash in container). Follows the classic imagehash
algorithm shape: resize to hash_size*highfreq_factor (32), 2-D DCT, keep the
top-left 8×8 block, threshold at its median → 64 bits packed into int64.
North-rule extension op (SURVEY.md §2.7); not present in the reference worker
(pHash dedup ran in downstream LAION tooling).
"""

from __future__ import annotations

import numpy as np

_N = 32
_HASH = 8

# Orthonormal DCT-II matrix, computed once.
_k = np.arange(_N)
_DCT = np.cos(np.pi * (2.0 * _k[None, :] + 1.0) * _k[:, None] / (2.0 * _N))
_DCT[0, :] *= 1.0 / np.sqrt(2.0)
_DCT *= np.sqrt(2.0 / _N)

_BITW = (np.uint64(1) << np.arange(63, -1, -1, dtype=np.uint64))


def _resize_gray(img: np.ndarray) -> np.ndarray:
    """RGB uint8 (h,w,3) → 32×32 float grayscale via nearest-index sampling."""
    gray = img.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = gray.shape
    yi = (np.arange(_N) * h // _N).clip(0, h - 1)
    xi = (np.arange(_N) * w // _N).clip(0, w - 1)
    return gray[np.ix_(yi, xi)]


def phash64(img: np.ndarray) -> int:
    """pHash of an (h,w,3) uint8 image → signed int64."""
    g = _resize_gray(img)
    d = _DCT @ g @ _DCT.T
    low = d[:_HASH, :_HASH]
    med = np.median(low)
    bits = (low > med).astype(np.uint64).ravel()
    # distinct powers of two, so the sum IS the bitwise-or (vectorized pack —
    # this runs once per image inside the decode hot path)
    val = (bits * _BITW).sum(dtype=np.uint64)
    return int(val.astype(np.int64))


def hamming64(a: int, b: int) -> int:
    """Hamming distance between two int64 pHashes."""
    x = (int(a) & 0xFFFFFFFFFFFFFFFF) ^ (int(b) & 0xFFFFFFFFFFFFFFFF)
    return bin(x).count("1")


def image_feature(img: np.ndarray) -> np.ndarray:
    """Deterministic 64-d image feature: 8×8 grid of grayscale block means,
    mean-centered, L2-normalized. Used by the CLIP-proxy scorer (real CLIP is a GPU model the
    reference project ran in a separate worker — README.md:8; here the *dataflow*
    is real and the embedding is a stub)."""
    g = _resize_gray(img)  # 32×32
    blocks = g.reshape(8, 4, 8, 4).mean(axis=(1, 3)).ravel()
    blocks = blocks - blocks.mean()
    n = np.linalg.norm(blocks)
    return (blocks / n if n > 0 else blocks).astype(np.float32)
