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
