"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are treated as opaque ``binary`` columns with a
typed metadata struct. The Spark-side plumbing — schema, Arrow batch shape,
partition-friendly mapInPandas feature extraction — is real and tested; the
actual codec step is STUBBED (decode libraries are not in this container)
behind ``decode_stub`` which raises NotImplementedError unless
``fake=True``, in which case it produces a deterministic fake decode so the
downstream feature pipeline stays testable.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

BINARY_META_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("sha1_prefix", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def decode_stub(payload: bytes, modality: str = "image", fake: bool = False) -> np.ndarray:
    """Decode an opaque payload. STUB — no codec libs in this container.

    With ``fake=True`` returns a deterministic pseudo-decode (bytes folded
    into a fixed-shape float array) so batch shape / partitioning / UDF
    signature are exercised end-to-end.
    """
    if not fake:
        raise NotImplementedError(
            f"{modality} decoding requires codec libraries not present in this "
            "environment; pass fake=True for the deterministic test decode."
        )
    h = hashlib.sha256(payload or b"").digest()
    return np.frombuffer(h, dtype=np.uint8).astype(np.float32) / 255.0


def binary_metadata(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """Typed metadata for an opaque binary column via mapInPandas
    (Arrow-batched; the pattern a real decode stage would use)."""

    def extract(batches):
        for pdf in batches:
            payloads = pdf[bin_col]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0).astype(
                        "int64"
                    ),
                    "sha1_prefix": payloads.map(
                        lambda b: hashlib.sha1(bytes(b or b"")).hexdigest()[:8]
                    ),
                }
            )

    return df.select(id_col, bin_col).mapInPandas(extract, BINARY_META_SCHEMA)


def extract_features(df: DataFrame, id_col: str, bin_col: str, modality: str = "image") -> DataFrame:
    """Feature extraction over opaque payloads (deterministic fake decode)."""

    def extract(batches):
        for pdf in batches:
            feats = [
                decode_stub(bytes(b) if b is not None else b"", modality, fake=True).tolist()
                for b in pdf[bin_col]
            ]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "n_bytes": pdf[bin_col].map(lambda b: len(b) if b is not None else 0).astype("int64"),
                    "features": feats,
                }
            )

    return df.select(id_col, bin_col).mapInPandas(extract, FEATURE_SCHEMA)
