"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns with a
metadata struct; decode/feature-extract run as Arrow-batched ``mapInPandas``
stages. The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container,
so ``decode_image``/``decode_audio`` raise NotImplementedError by contract;
``fake_decode=True`` swaps in a deterministic byte-histogram "decoder" so the
Spark-side plumbing — schema, batch shape, partitioning — is fully real and
testable (driver brief: stub the decode, make the plumbing real).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, feature array<double>"
)


def synth_media(docs: DataFrame, content_col: str = "text") -> DataFrame:
    """Deterministic fake media: payload = utf-8 bytes of the text, metadata
    derived from lengths — enough to exercise every pipeline seam."""
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.encode(F.col(content_col), "utf-8").alias("payload"),
        F.struct(
            (F.length(content_col) % 640).cast("int").alias("width"),
            (F.length(content_col) % 480).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.length(content_col) % 30).cast("int").alias("n_frames"),
            F.lit("synthetic").alias("codec"),
        ).alias("meta"),
    )


def decode_image(payload: bytes):  # pragma: no cover - contract stub
    raise NotImplementedError(
        "image decoding requires PIL/opencv (not installed in this container); "
        "wire the real decoder here — the surrounding Spark plumbing is complete"
    )


def decode_audio(payload: bytes):  # pragma: no cover - contract stub
    raise NotImplementedError(
        "audio decoding requires soundfile/torchaudio (not installed); "
        "wire the real decoder here"
    )


def _fake_feature(payload: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic byte-histogram 'embedding' standing in for a real
    decode→feature-extract step (same shape, same batch flow)."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist, _ = np.histogram(arr, bins=dim, range=(0, 256))
    total = hist.sum()
    return (hist / total) if total else np.zeros(dim)


def extract_features(
    media: DataFrame, dim: int = 16, fake_decode: bool = True
) -> DataFrame:
    """mapInPandas feature extraction: one Arrow batch in, one out.

    With ``fake_decode=False`` this dispatches to the real decoders and —
    in this container — raises NotImplementedError per contract.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, nbytes = [], []
            for payload, mtype in zip(pdf["payload"], pdf["media_type"]):
                raw = bytes(payload)
                nbytes.append(len(raw))
                if fake_decode:
                    feats.append(_fake_feature(raw, dim).tolist())
                elif mtype == "image":
                    feats.append(decode_image(raw))
                else:
                    feats.append(decode_audio(raw))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": nbytes,
                    "feature": feats,
                }
            )

    return media.mapInPandas(extract, FEATURE_SCHEMA)
