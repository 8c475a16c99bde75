"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, processed with Arrow-batched pandas UDFs over mapInPandas.

The decode step is STUBBED (image/audio libraries are not in this
container — see decode_image_batch): the Spark-side plumbing — schema,
partitioning, UDF signature, Arrow batch shape — is real and tested.
On a cluster with PIL/ffmpeg available, swap the stub body only.

Reference lineage: the per-language frontend boundary
(cpg-language-python PythonLanguageFrontend.kt:89-91 crosses into an
embedded interpreter per file) — here the boundary is executor-side
Arrow batches, the only sanctioned Python hot path.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("magic", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("error", StringType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)

# magic-byte sniffing is real (pure bytes, no decoder needed)
_MAGICS = [
    (b"\x89PNG", "png"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"RIFF", "riff"),
    (b"OggS", "ogg"),
    (b"\x1a\x45\xdf\xa3", "mkv"),
]


def sniff_magic(payload: bytes | None) -> str:
    if not payload:
        return "empty"
    for magic, name in _MAGICS:
        if payload.startswith(magic):
            return name
    return "unknown"


def decode_image_batch(payloads: pd.Series) -> pd.DataFrame:
    """STUB decode: a real deployment replaces this body with
    PIL.Image.open over each payload. Here it returns deterministic fake
    dimensions derived from the byte length so the downstream plumbing
    (schema, joins, partitioning) is exercised end to end."""
    n = payloads.str.len().fillna(0).astype("int64")
    return pd.DataFrame(
        {
            "width": (n % 640 + 1).astype("int32"),
            "height": (n % 480 + 1).astype("int32"),
            "error": pd.Series([None] * len(payloads), dtype="object"),
        }
    )


def media_metadata(media: DataFrame) -> DataFrame:
    """(media_id, payload:binary, media_type) -> MEDIA_META rows via
    mapInPandas: one Arrow batch in, one metadata frame out."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = decode_image_batch(pdf["payload"])
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].str.len().fillna(0).astype("int32"),
                    "magic": pdf["payload"].map(sniff_magic),
                    "width": dims["width"],
                    "height": dims["height"],
                    "error": dims["error"],
                }
            )
            yield out

    return media.mapInPandas(extract, MEDIA_META)


def sample_frames(media: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """Frame-sampling plumbing: emit one fake 'frame' per every_n_bytes
    chunk of the payload (a real deployment decodes actual frames). Shows
    the 1-to-many mapInPandas shape with stable frame indices."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, blobs = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = payload or b""
                for i in range(max(1, len(payload) // every_n_bytes)):
                    ids.append(mid)
                    idxs.append(i)
                    blobs.append(payload[i * every_n_bytes : (i + 1) * every_n_bytes])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": pd.array(idxs, dtype="int32"),
                 "frame": blobs}
            )

    return media.mapInPandas(frames, FRAME_SCHEMA)


def docs_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as an opaque payload so the
    multimodal path is testable without binary fixtures."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("text").alias("media_type"),
    )
