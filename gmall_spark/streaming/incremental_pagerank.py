"""Incremental link-graph centrality with a rank-change log.

The streaming twin of X237 (queries_llm.web_host_pagerank) — the
X185/X198/X210 RE-DERIVE class: the maintained state (the set of
pages seen, hence the edge list) is append-mergeable, but the derived
artifact (the rank vector) is NOT — a single new page adds edges
whose mass flows through the whole graph, so ranks re-derive over the
merged edge set and the twin ships the CHANGE LOG (every node whose
fixed-point rank moved) instead of pretending the old ranks still
hold. Operationally this is the crawl-frontier update: a newly
discovered page re-prioritizes pages that were already ranked.

Batch-equals-streaming: pages-seen after any ingest split equals the
batch DISTINCT, edges are a pure function of pages, and the rank
computation is the IDENTICAL integer fixed-point operator
(operators/graph.pagerank — BIGINT div, no float accumulation), so
the re-derived view is bit-equal to the batch query.

Scale shape: state appends at page grain (bounded by distinct
pages); each re-derivation shuffles only (node, rank) pairs; the
before/after diff joins two node-sized tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gmall_spark.operators import graph
from gmall_spark.streaming.incremental_dedup import _read_or_empty

_PAGES_SCHEMA = T.StructType([T.StructField("u", T.LongType())])


def _edges(pages: DataFrame) -> DataFrame:
    """The X237 synthetic link closed form over a page set."""
    return pages.select(
        F.col("u").alias("src"), ((F.col("u") * 7 + 3) % 40).alias("dst")
    ).unionAll(
        pages.select(
            F.col("u").alias("src"),
            ((F.col("u") * 11 + 5) % 40).alias("dst"),
        )
    )


def current_ranks(spark: SparkSession, store_dir: str) -> DataFrame:
    """Re-derive ranks over every page seen so far — bit-equal to the
    batch X237 rank columns on the union of everything ingested."""
    pages = _read_or_empty(
        spark, f"{store_dir}/pages_seen", _PAGES_SCHEMA
    ).distinct()
    return graph.pagerank(_edges(pages))


def process_batch(
    spark: SparkSession, batch_docs: DataFrame, store_dir: str
) -> DataFrame:
    """Ingest one micro-batch of documents; returns the rank-change
    log: every node whose rank_micro differs from the previous
    derivation (new nodes report old_rank_micro NULL)."""
    path = f"{store_dir}/pages_seen"
    seen = _read_or_empty(spark, path, _PAGES_SCHEMA).distinct()
    # eager snapshot: the post-append re-list must not leak into the
    # BEFORE side of the diff (the incremental_sft_keeper lesson)
    before = (
        graph.pagerank(_edges(seen))
        .select(
            "node_id", F.col("rank_micro").alias("old_rank_micro")
        )
        .localCheckpoint(eager=True)
    )
    batch_docs.select(
        (F.col("doc_id") % 40).cast("long").alias("u")
    ).distinct().write.mode("append").parquet(path)
    after = current_ranks(spark, store_dir).select(
        "node_id", F.col("rank_micro").alias("new_rank_micro")
    )
    return (
        after.join(before, "node_id", "left")
        .filter(
            F.col("old_rank_micro").isNull()
            | (F.col("old_rank_micro") != F.col("new_rank_micro"))
        )
        .select("node_id", "old_rank_micro", "new_rank_micro")
    )
