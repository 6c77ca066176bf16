"""Multimodal columns: images/audio/video as opaque ``binary`` columns
with typed metadata, processed through Arrow-batched ``mapInPandas``.

The Spark-side plumbing — schema, partition sizing, UDF signatures,
batch shapes — is real and tested; the actual codec work (JPEG decode,
resampling, frame extraction) is stubbed behind ``_decode_image`` /
``_decode_audio`` because the media libraries are not in this
environment. Swap the stub body for PIL/torchaudio/pyav on a real
cluster; nothing else changes.

Design for 100 TB of media:
  * blobs travel as parquet binary — never hex/base64 strings;
  * ``spark.sql.files.maxPartitionBytes`` bounds task memory since each
    Arrow batch holds decoded frames; callers set
    ``maxRecordsPerBatch`` small for large media;
  * feature extraction yields fixed-size vectors so downstream joins
    and ANN reuse the embedding operators unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["MEDIA_SCHEMA", "attach_media", "extract_image_features", "sample_video_frames"]

#: typed metadata carried with every blob
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("blob", T.BinaryType(), True),
    ]
)


def attach_media(df: DataFrame, payload_col: str, kind: str, mime: str) -> DataFrame:
    """Wrap an arbitrary payload column as a media row set (used by
    tests to fabricate deterministic blobs from text)."""
    return df.select(
        F.monotonically_increasing_id().alias("media_id"),
        F.lit(kind).alias("kind"),
        F.lit(mime).alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.encode(F.col(payload_col), "utf-8").alias("blob"),
    )


def _decode_image(blob: bytes) -> np.ndarray:
    """STUB: real impl would be PIL.Image.open(BytesIO(blob)).
    Deterministic fake: derive an 8x8 grayscale "image" from the blob
    bytes so the pipeline shape (blob → HxW array) is exercised."""
    arr = np.frombuffer(blob[:64].ljust(64, b"\0"), dtype=np.uint8)
    return arr.reshape(8, 8)


def extract_image_features(media: DataFrame, feature_dim: int = 16) -> DataFrame:
    """blob → fixed-size feature vector via mapInPandas (Arrow batches).

    Real systems put the vision model here; the stub computes row/column
    means of the fake decode — the schema contract (media_id,
    features array<float>, width, height) is the real one."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, ids, ws, hs = [], [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["blob"]):
                img = _decode_image(bytes(blob) if blob is not None else b"")
                v = np.concatenate([img.mean(0), img.mean(1)]).astype(np.float32)
                feats.append(v[:feature_dim].tolist())
                ids.append(mid)
                hs.append(img.shape[0])
                ws.append(img.shape[1])
            yield pd.DataFrame(
                {"media_id": ids, "features": feats, "width": ws, "height": hs}
            )

    return media.select("media_id", "blob").mapInPandas(
        extract,
        schema="media_id long, features array<float>, width int, height int",
    )


def sample_video_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """STUB frame sampler: emits (media_id, frame_idx, frame_blob) rows.
    Real impl seeks the container; the stub slices the blob so the
    explode shape (1 row in → N frame rows out) is exercised."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_blob = [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["blob"]):
                data = bytes(blob) if blob is not None else b""
                n = max(1, min(5, len(data) // 8))
                for i in range(n):
                    out_ids.append(mid)
                    out_idx.append(i)
                    out_blob.append(data[i * 8 : (i + 1) * 8])
            yield pd.DataFrame(
                {"media_id": out_ids, "frame_idx": out_idx, "frame_blob": out_blob}
            )

    return media.select("media_id", "blob").mapInPandas(
        sample, schema="media_id long, frame_idx int, frame_blob binary"
    )
