"""Multimodal column transforms: decode / resize / feature-extract / frame-sample.

Driver-mandated training-data ops over opaque `binary` columns with typed
metadata. The image path is REAL end-to-end against the deterministic codec
(fakeimg.py): decode → numpy resize → re-encode, batched through mapInPandas.
Audio/video decoding has no library in this container, so those transforms are
STUBS in the decode step only — clearly marked, gated behind a deterministic
fake frame extractor — while everything Spark-side (schema, Arrow batch shape,
UDF signatures, partitioning) is the real production plumbing: swapping in
ffmpeg/librosa touches `_decode_video_stub` / `_decode_audio_stub` and nothing
else.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    FloatType,
    IntegerType,
    StructField,
    StructType,
)

from .. import fakeimg

# ---------------------------------------------------------------------------
# image resize (real)
# ---------------------------------------------------------------------------


def _resize_nn(img: np.ndarray, w: int, h: int) -> np.ndarray:
    """Nearest-index resize, deterministic, pure numpy."""
    sh, sw = img.shape[0], img.shape[1]
    yi = (np.arange(h) * sh // h).clip(0, sh - 1)
    xi = (np.arange(w) * sw // w).clip(0, sw - 1)
    return img[np.ix_(yi, xi)]


def resize_images(
    df: DataFrame, target_w: int, target_h: int, bytes_col: str = "bytes"
) -> DataFrame:
    """Batch decode → resize → re-encode (same format). Undecodable rows pass
    through with resized_ok = false. Adds: resized_bytes, resized_ok."""
    out_schema = StructType(
        list(df.schema.fields)
        + [
            StructField("resized_bytes", BinaryType()),
            StructField("resized_ok", BooleanType()),
        ]
    )
    in_cols = [f.name for f in df.schema.fields]

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_b: list[bytes | None] = []
            ok: list[bool] = []
            for b in pdf[bytes_col]:
                dec = fakeimg.decode(bytes(b)) if b is not None else None
                if dec is None:
                    out_b.append(None)
                    ok.append(False)
                    continue
                fmt, _, _, img = dec
                out_b.append(fakeimg.encode(_resize_nn(img, target_w, target_h), fmt))
                ok.append(True)
            pdf = pdf.copy()
            pdf["resized_bytes"] = out_b
            pdf["resized_ok"] = ok
            yield pdf[in_cols + ["resized_bytes", "resized_ok"]]

    return df.mapInPandas(work, out_schema)


# ---------------------------------------------------------------------------
# video frame sampling (decode step STUBBED — no ffmpeg in container)
# ---------------------------------------------------------------------------

FRAME_SAMPLE_FIELDS = [
    StructField("frame_idx", IntegerType()),
    StructField("frame_feat", ArrayType(FloatType())),
]


def _decode_video_stub(blob: bytes, n_frames: int) -> list[np.ndarray]:
    """STUB: a real implementation calls ffmpeg/pyav here. The deterministic
    fake derives `n_frames` pseudo-frames from the blob bytes so the downstream
    dataflow (one row per sampled frame, per-frame features) is fully exercised.
    Raise NotImplementedError to fail loudly if someone flips REAL_DECODERS on
    without providing a backend."""
    if _REAL_DECODERS:
        raise NotImplementedError("no video decoder available in this container")
    seed = int.from_bytes(blob[:8].ljust(8, b"\0"), "little") & 0x7FFFFFFF
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8) for _ in range(n_frames)]


def _decode_audio_stub(blob: bytes, n_windows: int) -> np.ndarray:
    """STUB for librosa/soundfile: deterministic fake spectrogram (n_windows×16)."""
    if _REAL_DECODERS:
        raise NotImplementedError("no audio decoder available in this container")
    seed = int.from_bytes(blob[:8].ljust(8, b"\0"), "little") & 0x7FFFFFFF
    rng = np.random.default_rng(seed ^ 0xA5A5)
    return rng.standard_normal((n_windows, 16)).astype(np.float32)


_REAL_DECODERS = False  # flip when a real ffmpeg/librosa backend exists


def sample_video_frames(
    df: DataFrame, n_frames: int = 4, bytes_col: str = "bytes", id_col: str = "image_id"
) -> DataFrame:
    """One output row per sampled frame: (id, frame_idx, frame_feat[64]).

    Row-expanding mapInPandas (the UDTF shape): schema and batch mechanics are
    production-real; only the frame decode is the stub above."""
    from ..phash import image_feature

    out_schema = StructType(
        [df.schema[id_col]] + FRAME_SAMPLE_FIELDS
    )

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, feats = [], [], []
            for key, b in zip(pdf[id_col], pdf[bytes_col]):
                if b is None:
                    continue
                for i, frame in enumerate(_decode_video_stub(bytes(b), n_frames)):
                    ids.append(key)
                    idxs.append(i)
                    feats.append(image_feature(frame).tolist())
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame_feat": feats})

    return df.mapInPandas(work, out_schema)


def audio_features(
    df: DataFrame, n_windows: int = 8, bytes_col: str = "bytes", id_col: str = "image_id"
) -> DataFrame:
    """Windowed audio features: (id, window_idx, energy) — stubbed decode."""
    out_schema = StructType(
        [df.schema[id_col], StructField("window_idx", IntegerType()), StructField("energy", FloatType())]
    )

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, energy = [], [], []
            for key, b in zip(pdf[id_col], pdf[bytes_col]):
                if b is None:
                    continue
                spec = _decode_audio_stub(bytes(b), n_windows)
                e = (spec * spec).mean(axis=1)
                for i in range(n_windows):
                    ids.append(key)
                    idxs.append(i)
                    energy.append(float(e[i]))
            yield pd.DataFrame({id_col: ids, "window_idx": idxs, "energy": energy})

    return df.mapInPandas(work, out_schema)
