"""Multimodal column plumbing: binary media + typed metadata.

Media (image/audio/video) ride as opaque ``binary`` columns with a typed
metadata struct. Decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` operators — the Spark-side contract (schema,
batch shape, partition behavior) is real and tested; the actual codec call
is isolated in ``_decode_bytes`` and STUBBED here (no PIL/ffmpeg in this
container): with ``fake=True`` it derives deterministic metadata from the
bytes, with ``fake=False`` it raises NotImplementedError at the exact seam
where a codec library would plug in.
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
        T.StructField("media_id", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("checksum", T.StringType(), True),
    ]
)


def _decode_bytes(payload: bytes, media_type: str, fake: bool) -> dict:
    """THE codec seam. Real implementation would call PIL / soundfile /
    pyav here; this container has none, so fake=True derives deterministic
    pseudo-metadata from the payload bytes."""
    if not fake:
        raise NotImplementedError(
            "media codecs (PIL/soundfile/pyav) are not available in this "
            "environment; pass fake=True for the deterministic stub"
        )
    import hashlib

    h = hashlib.md5(payload).hexdigest()
    hv = int(h[:8], 16)
    return {
        "width": 16 + hv % 4080 if media_type in ("image", "video") else None,
        "height": 16 + (hv >> 12) % 4080 if media_type in ("image", "video") else None,
        "n_frames": 1 + (hv >> 4) % 240 if media_type == "video" else None,
        "checksum": h,
    }


def decode_media(df: DataFrame, fake: bool = True) -> DataFrame:
    """binary payload -> typed metadata, one Arrow batch at a time."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [
                _decode_bytes(p, t, fake)
                for p, t in zip(pdf["payload"], pdf["media_type"])
            ]
            m = pd.DataFrame(metas)
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "width": m["width"].astype("Int64"),
                    "height": m["height"].astype("Int64"),
                    "n_frames": m["n_frames"].astype("Int64"),
                    "checksum": m["checksum"],
                }
            )
            yield out

    return df.mapInPandas(op, DECODED_SCHEMA)


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def extract_features(df: DataFrame, dim: int = 16) -> DataFrame:
    """Deterministic byte-histogram 'embedding' per media row (the fake
    feature extractor; a CLIP/VGGish model call would replace the numpy
    block). Batch-shaped exactly like a real vectorized extractor."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                arr = np.frombuffer(payload, dtype=np.uint8)
                hist, _ = np.histogram(arr, bins=dim, range=(0, 256))
                denom = max(len(arr), 1)
                feats.append((hist / denom).astype(np.float32))
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})

    return df.mapInPandas(op, FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling PLAN: one output row per sampled frame index,
    computed from decoded n_frames — native explode, no Python. The actual
    pixel fetch would be a later mapInPandas against the codec seam."""
    return (
        df.filter(F.col("media_type") == "video")
        .withColumn(
            "frame_idx",
            F.explode(F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))),
        )
        .select("media_id", "frame_idx")
    )


def synth_payload_text(i: int, seed: int = 42) -> str:
    """Deterministic ASCII payload: an md5 hex chain truncated to
    64 + (i*37) % 512 chars. ASCII-only on purpose — DuckDB's md5() takes
    VARCHAR, not BLOB, so an ASCII payload lets the driver's oracle rebuild
    payload, checksum, and metadata in plain SQL (see
    driver_queries._MEDIA_CTE)."""
    import hashlib

    size = 64 + (i * 37) % 512
    chunks = []
    for j in range((size + 31) // 32):
        chunks.append(hashlib.md5(f"media:{seed}:{i}:{j}".encode()).hexdigest())
    return "".join(chunks)[:size]


def synth_media_df(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests and the driver oracle."""
    types = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        payload = synth_payload_text(i, seed).encode("ascii")
        rows.append(
            {
                "media_id": f"m{i:05d}",
                "media_type": types[i % 3],
                "payload": bytearray(payload),
                "n_bytes": len(payload),
            }
        )
    return spark.createDataFrame(pd.DataFrame(rows), schema=MEDIA_SCHEMA)
