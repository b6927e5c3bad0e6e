"""Multimodal column processing: opaque binary payloads + typed
metadata, decoded/feature-extracted via Arrow-batched ``mapInPandas``.

The image/audio libraries are not in this container, so the actual
decode is STUBBED: ``backend="fake"`` produces deterministic features
from the raw bytes (so the Spark-side plumbing — schema, batching,
partitioning — is fully real and tested), and any other backend raises
NotImplementedError at the exact point a PIL/ffmpeg call would go.

Scale notes: payload bytes never shuffle — mapInPandas is a narrow
transformation; metadata-only predicates prune files before any
payload is read (see q_multimodal_meta); Arrow moves each batch to
Python once, zero-copy.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

FEATURE_DIM = 8


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for decode + feature extraction: bucket
    byte histogram into FEATURE_DIM bins, L1-normalized."""
    if not payload:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr // (256 // FEATURE_DIM), minlength=FEATURE_DIM).astype(
        np.float64
    )
    return (hist / hist.sum()).astype(np.float32)


def extract_features(df: DataFrame, backend: str = "fake") -> DataFrame:
    """payload binary -> fixed-dim feature vector, Arrow-batched.

    Input columns: doc_id, media_type, payload (binary).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if backend != "fake":
                # Real decode would go here (PIL.Image.open / soundfile /
                # av frame sampling); libs absent in this environment.
                raise NotImplementedError(
                    f"decode backend {backend!r} not available; use 'fake'"
                )
            feats = [_fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "feature": feats,
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)

RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def resize_images(
    df: DataFrame, out_w: int = 64, out_h: int = 64, backend: str = "fake"
) -> DataFrame:
    """Image resize over opaque binary payloads, Arrow-batched.

    Input columns: doc_id, media_type, width, height, payload.
    ``backend="fake"`` performs a deterministic byte-domain
    "resample" — nearest-neighbor index selection over the raw bytes
    to out_w*out_h length — so the plumbing (schema, batch shape, the
    per-row transform boundary) is real; a real backend (PIL/cv2)
    would decode, resample pixels, and re-encode at the marked point.
    Narrow transformation: payloads never shuffle.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n_out = out_w * out_h
        for pdf in batches:
            if backend != "fake":
                raise NotImplementedError(
                    f"resize backend {backend!r} not available; use 'fake'"
                )
            out = []
            for p in pdf["payload"]:
                arr = np.frombuffer(p, dtype=np.uint8)
                if len(arr) == 0:
                    out.append(b"\x00" * n_out)
                    continue
                idx = (np.arange(n_out) * len(arr) // n_out).clip(0, len(arr) - 1)
                out.append(arr[idx].tobytes())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "out_w": np.int32(out_w),
                    "out_h": np.int32(out_h),
                    "payload": out,
                }
            )

    return df.mapInPandas(run, RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame, frame_bytes: int = 256, every_nth: int = 2, backend: str = "fake"
) -> DataFrame:
    """Video frame sampling: one payload row -> every Nth frame,
    UDTF-shaped (rows expand).  ``backend="fake"`` treats the payload
    as fixed-size frame chunks; a real backend would demux/seek
    keyframes (av/ffmpeg) at the marked point.

    Scale: expansion happens map-side inside mapInPandas — frames of
    one video stay on the partition that read it, and downstream
    per-frame operators (resize, feature-extract) compose without a
    shuffle.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if backend != "fake":
                raise NotImplementedError(
                    f"frame-sampling backend {backend!r} not available; use 'fake'"
                )
            ids, nos, frames = [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = max(len(p) // frame_bytes, 1)
                for f in range(0, n_frames, every_nth):
                    ids.append(doc_id)
                    nos.append(f)
                    frames.append(bytes(p[f * frame_bytes : (f + 1) * frame_bytes]))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_no": pd.array(nos, dtype="int32"), "frame": frames}
            )

    return df.mapInPandas(run, FRAME_SCHEMA)
