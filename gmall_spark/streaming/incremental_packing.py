"""Incremental (streaming) FFD sequence packing — X175 as a
continuous pipeline, the X156 re-derive class: pack assignment is
NOT mergeable (a bucket's rule choice and cumsum chop depend on the
bucket's GLOBAL census, so a late doc can re-pack its whole bucket),
but the per-doc token length IS frozen at ingest. Each micro-batch
writes its (doc_id, n_tok) rows to its own store subdir
(idempotent overwrite); :func:`current_packs` re-derives the packed
table from the merged length store through the exact batch operator
(queries_llm.pack_rows), so after ANY batch split the result is
row-identical to packing everything seen so far in one batch —
including retroactive re-packing when new lengths shift a bucket's
slot-vs-chop decision.

State is one integer per document — the minimum ANY packer needs;
re-derivation is one window pass over the store (the batch
operator's own cost), which is exactly how a production loader
regenerates its epoch manifest when the corpus grows.
"""

from __future__ import annotations

import os
import re as _re

from pyspark.sql import DataFrame, SparkSession

_LEN_SCHEMA = "doc_id long, n_tok long"
_BATCH_DIR_RE = _re.compile(r"^b\d+$")


def _len_dirs(root: str) -> list[str]:
    base = os.path.join(root, "lens")
    try:
        return sorted(
            os.path.join(base, d)
            for d in os.listdir(base)
            if _BATCH_DIR_RE.match(d)
        )
    except FileNotFoundError:
        return []


def process_batch(
    spark: SparkSession,
    batch_lens: DataFrame,
    store_root: str,
    batch_id: int,
) -> None:
    """Persist one micro-batch's (doc_id, n_tok) rows — n_tok already
    clamped to [1, cap] by the caller's tokenizer stage — to the
    batch's own subdir (replay-safe overwrite)."""
    batch_lens.select("doc_id", "n_tok").write.mode("overwrite").parquet(
        os.path.join(store_root, "lens", f"b{batch_id}")
    )


def stored_lengths(spark: SparkSession, store_root: str) -> DataFrame:
    dirs = _len_dirs(store_root)
    if not dirs:
        return spark.createDataFrame([], _LEN_SCHEMA)
    return spark.read.schema(_LEN_SCHEMA).parquet(*dirs)


def current_packs(spark: SparkSession, store_root: str, cap: int | None = None) -> DataFrame:
    """The packed table over every document seen so far — identical
    to the batch packer on the same lengths (streaming == batch after
    any split; re-packing is retroactive by construction).

    The default cap is SEQ_PACK_CAP itself (not a hardcoded copy):
    a literal 2048 here would silently diverge from the batch packer
    if the constant ever changed (ADVICE r8 item 4)."""
    from gmall_spark.queries_llm import SEQ_PACK_CAP, pack_rows

    return pack_rows(
        stored_lengths(spark, store_root),
        SEQ_PACK_CAP if cap is None else cap,
    )
