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


RESIZE_SCHEMA = (
    "doc_id bigint, src_width bigint, src_height bigint, "
    "out_width bigint, out_height bigint, resized_hash string"
)
RESIZE_TARGET_W = 224


def _resize_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """STUB resizer: aspect-preserving integer letterbox to width 224.

    A real deployment replaces the body with PIL.Image.resize; the
    contract (pandas batch in/out, source dims -> target dims + a
    digest standing in for the resized pixel buffer) is the real
    part. All-integer math so the DuckDB oracle replays it exactly.
    """
    import hashlib

    byte_len = batch["blob"].map(len)
    src_w = (byte_len % 640).clip(lower=1)
    src_h = (byte_len % 480).clip(lower=1)
    out_w = src_w * 0 + RESIZE_TARGET_W
    out_h = (src_h * RESIZE_TARGET_W // src_w).clip(lower=1)
    digest = [
        hashlib.md5(f"{n}:{w}x{h}".encode()).hexdigest()
        for n, w, h in zip(byte_len, out_w, out_h)
    ]
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "src_width": src_w.astype("int64"),
            "src_height": src_h.astype("int64"),
            "out_width": out_w.astype("int64"),
            "out_height": out_h.astype("int64"),
            "resized_hash": digest,
        }
    )


def resize_images(blobs: DataFrame) -> DataFrame:
    """blob table -> resized-image metadata (image resize plumbing).

    Arrow-batched ``mapInPandas``; blobs never leave the executor.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield _resize_batch(b)

    return blobs.mapInPandas(gen, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, frame_idx bigint, n_frames bigint, frame_hash string"
FRAME_CHARS = 16


def _frame_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """STUB frame sampler: deterministic evenly-strided "frames".

    A real deployment replaces the body with ffmpeg keyframe
    extraction; the contract is the real part — one input blob row
    fans out to n_frames output rows inside the Arrow batch (no
    driver round-trip, no exploding a giant array column through the
    shuffle). Frame identity is char-based so the DuckDB oracle can
    replay it (substr/length are char semantics in both engines).
    """
    import hashlib

    out: dict[str, list] = {"doc_id": [], "frame_idx": [], "n_frames": [], "frame_hash": []}
    for doc_id, blob in zip(batch["doc_id"], batch["blob"]):
        text = bytes(blob).decode("utf-8")
        n = len(text) % 4 + 1
        stride = len(text) // n
        for i in range(n):
            sample = text[i * stride : i * stride + FRAME_CHARS]
            out["doc_id"].append(doc_id)
            out["frame_idx"].append(i)
            out["n_frames"].append(n)
            out["frame_hash"].append(hashlib.md5(sample.encode("utf-8")).hexdigest())
    return pd.DataFrame(out)


def frame_sample(blobs: DataFrame) -> DataFrame:
    """blob table -> sampled frame rows (video/audio frame plumbing).

    Arrow-batched ``mapInPandas`` with a 1->N row fan-out — the batch
    shape a real decoder needs (bounded by arrow.maxRecordsPerBatch).
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield _frame_batch(b)

    return blobs.mapInPandas(gen, schema=FRAME_SCHEMA)
