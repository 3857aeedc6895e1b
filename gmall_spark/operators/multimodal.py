"""Multimodal column plumbing (image/audio/video as opaque binary).

The container has no image/audio codecs, so the *decode* step is a
clearly-marked stub (deterministic fake features / NotImplementedError
for real codecs) — but everything Spark-side is real and tested: the
binary column handling, typed metadata schema, Arrow batch shape
through ``mapInPandas``, and the partitioning contract.

At 100 TB: blobs stay in the executor (never collected); decode is a
per-partition Arrow-batched pass, so adding a real codec (PIL/ffmpeg)
changes only ``_decode_batch``. Batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` to cap peak memory
with large blobs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "doc_id bigint, byte_len bigint, header_byte bigint, "
    "fake_width bigint, fake_height bigint, modality string"
)


def _decode_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """STUB decoder: deterministic fake features from the raw bytes.

    A real deployment replaces this body with PIL/libav decode; the
    signature (pandas batch in/out, one row per blob) is the real
    contract.
    """
    blobs = batch["blob"]
    byte_len = blobs.map(len)
    header = blobs.map(lambda b: b[0] if len(b) else 0)
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "byte_len": byte_len,
            "header_byte": header,
            "fake_width": (byte_len % 640).astype("int64"),
            "fake_height": (byte_len % 480).astype("int64"),
            "modality": batch["modality"],
        }
    )


def decode_features(blobs: DataFrame) -> DataFrame:
    """blob table (doc_id, blob binary, modality) -> typed features.

    Arrow-batched ``mapInPandas``: no per-row Python overhead, no
    driver collection.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield _decode_batch(b)

    return blobs.mapInPandas(gen, schema=DECODE_SCHEMA)


def documents_as_blobs(docs: DataFrame) -> DataFrame:
    """Fixture: treat utf-8 document bytes as opaque blobs."""
    return docs.select(
        F.col("doc_id"),
        F.encode(F.col("text"), "utf-8").alias("blob"),
        F.lit("text").alias("modality"),
    )
