"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata struct;
decode / feature-extraction runs as Arrow-batched ``mapInPandas``. The actual
media decode is STUBBED (no image/audio libraries in this environment) behind
``decode_stub`` — a deterministic fake so the Spark-side plumbing (schema,
batching, partitioning, UDF signature) is real and testable. Swap
``decode_stub`` for a real decoder (PIL/librosa/ffmpeg) in production.

Scale: mapInPandas streams Arrow batches per partition — memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` regardless of corpus size,
and binary payloads never pass through the driver.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_DIM = 8

MM_META_SCHEMA = T.StructType(
    [
        T.StructField("byte_len", T.LongType(), False),
        T.StructField("mime", T.StringType(), False),
        T.StructField("sha", T.StringType(), False),
    ]
)


def binary_with_meta(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Carry a payload as an opaque binary column + typed metadata struct
    (here fabricated from text; in production the bytes come from the source).
    All JVM-side expressions."""
    content = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        F.col(id_col),
        content.alias("content"),
        F.struct(
            F.octet_length(content).cast("long").alias("byte_len"),
            F.lit("text/plain").alias("mime"),
            F.md5(content).alias("sha"),
        ).alias("meta"),
    )


def decode_stub(payload: bytes) -> np.ndarray:
    """Deterministic fake 'decode + feature extraction' for one payload.

    Real implementation would decode the media and produce an embedding;
    raises ``NotImplementedError`` for mime types a real decoder would need.
    """
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float64)
    # bucket byte values into FEATURE_DIM bins, normalized — deterministic
    bins = np.bincount(arr % FEATURE_DIM, minlength=FEATURE_DIM).astype(np.float64)
    return np.round(bins / arr.size, 6)


def pil_decode(payload: bytes) -> np.ndarray:
    """Real image decode via Pillow (optional dependency): grayscale
    intensity histogram folded to FEATURE_DIM bins, normalized — the same
    output contract as ``decode_stub`` so the two backends are swappable
    per executor. Raises ImportError when Pillow is absent (callers pick
    the backend via ``get_decoder``)."""
    import io

    from PIL import Image  # optional; gated by get_decoder("auto")

    img = Image.open(io.BytesIO(payload)).convert("L")
    hist = np.asarray(img.histogram(), dtype=np.float64)  # 256 bins
    folded = hist.reshape(FEATURE_DIM, -1).sum(axis=1)
    total = folded.sum()
    if total == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float64)
    return np.round(folded / total, 6)


def get_decoder(backend: str = "auto"):
    """Select the media decode backend: 'stub' (deterministic fake — the
    oracle-stable default), 'pil' (real Pillow decode; ImportError if
    missing), or 'auto' (Pillow when importable, else the stub). Resolution
    happens on the DRIVER so every executor batch uses one backend."""
    if backend == "stub":
        return decode_stub
    if backend == "pil":
        return pil_decode
    if backend == "auto":
        try:
            import PIL  # noqa: F401

            return pil_decode
        except ImportError:
            return decode_stub
    raise ValueError(f"unknown decode backend {backend!r} (stub|pil|auto)")


def extract_features(binaries: DataFrame, id_col: str = "doc_id", backend: str = "stub") -> DataFrame:
    """Arrow-batched feature extraction over the binary column."""
    decode = get_decoder(backend)
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("byte_len", T.LongType(), False),
            T.StructField("features", T.ArrayType(T.DoubleType()), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode(b).tolist() for b in pdf["content"]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "byte_len": [len(b) for b in pdf["content"]],
                    "features": feats,
                }
            )

    return binaries.select(id_col, "content").mapInPandas(run, schema=out_schema)
