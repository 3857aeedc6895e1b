"""One full BPE training iteration: select the winning merge AND
apply it (Sennrich et al. 2016, arXiv:1508.07909 §3.2).

``llm_bpe_merge_candidates`` (X100) counts the first iteration's
candidate pairs; this module completes the loop — apply the winning
merge to the symbol sequences with BPE's greedy LEFT-TO-RIGHT
non-overlapping rule, then re-count adjacencies to produce the next
iteration's ranked candidates. Two iterations of tokenizer training
observable in one deterministic, oracle-checkable query.

The greedy non-overlap rule is the subtle part: in a run of
consecutive matches (``a a a a`` merging ``(a,a)``), BPE merges
positions 0-1 and 2-3, not 1-2. Rather than a sequential fold, runs
of consecutive matching positions are grouped with the classic
``pos - row_number()`` trick and every EVEN offset within a run is a
merge start — identical semantics, pure window algebra, so Spark and
the DuckDB oracle execute the same definition (no UDF, no lambda
dialect drift).

Scale shape (100 TB): the corpus collapses to the DISTINCT-word
frequency table first (map-side combining hash agg — the only
corpus-sized pass, shared with X100); everything after runs on the
vocabulary-sized symbol table: char explode is |vocab|·avg_len rows,
the windows partition by word, the single-row winning pair
broadcasts. Iterating to a full merge table repeats the cheap half
only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gmall_spark.operators.ranking import _toks


def _word_freq(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Vocabulary-sized (w, wfreq); single-char words never form
    pairs in any iteration, so they are dropped up front."""
    return (
        docs.select(F.explode(_toks(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("wfreq"))
        .filter(F.length("w") >= 2)
    )


def merge_step(docs: DataFrame, top_n: int = 10, text_col: str = "text") -> DataFrame:
    """Apply the best merge, return the NEXT iteration's top
    ``top_n`` candidates: (rnk, pair_left, pair_right, pair_count,
    applied_pair)."""
    wc = _word_freq(docs, text_col)
    sym = wc.select(
        "w",
        "wfreq",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w")),
                lambda i: F.struct(
                    i.alias("pos"), F.col("w").substr(i, F.lit(1)).alias("s")
                ),
            )
        ).alias("cs"),
    ).select("w", "wfreq", F.col("cs.pos").alias("pos"), F.col("cs.s").alias("s"))

    w_word = Window.partitionBy("w").orderBy("pos")
    adj = sym.withColumn("s2", F.lead("s").over(w_word))

    pc = (
        adj.filter(F.col("s2").isNotNull())
        .groupBy(F.col("s").alias("c1"), F.col("s2").alias("c2"))
        .agg(F.sum("wfreq").cast("bigint").alias("cnt"))
    )
    best = pc.orderBy(
        F.desc("cnt"), F.asc(F.concat("c1", "c2"))
    ).limit(1)

    m = adj.crossJoin(F.broadcast(best)).withColumn(
        "mt", (F.col("s") == F.col("c1")) & (F.col("s2") == F.col("c2"))
    )
    # greedy left-to-right: group consecutive matching positions into
    # runs, merge at even offsets within each run
    matches = m.filter("mt").select("w", "pos")
    runs = matches.withColumn(
        "grp", F.col("pos") - F.row_number().over(w_word)
    )
    starts = runs.withColumn(
        "is_start",
        ((F.col("pos") - F.min("pos").over(Window.partitionBy("w", "grp"))) % 2)
        == 0,
    ).select("w", "pos", "is_start")

    star = m.join(starts, ["w", "pos"], "left").withColumn(
        "st", F.coalesce("is_start", F.lit(False))
    )
    fl = star.withColumn(
        "consumed", F.coalesce(F.lag("st").over(w_word), F.lit(False))
    )
    ns = fl.filter(~F.col("consumed")).select(
        "w",
        "wfreq",
        "pos",
        F.when(F.col("st"), F.concat("c1", "c2")).otherwise(F.col("s")).alias(
            "tok"
        ),
        F.concat("c1", "c2").alias("applied_pair"),
    )
    adj2 = ns.withColumn("tok2", F.lead("tok").over(w_word)).filter(
        F.col("tok2").isNotNull()
    )
    pc2 = adj2.groupBy(
        F.col("tok").alias("pair_left"),
        F.col("tok2").alias("pair_right"),
        "applied_pair",
    ).agg(F.sum("wfreq").cast("bigint").alias("pair_count"))
    w_rank = Window.orderBy(
        F.desc("pair_count"), F.asc("pair_left"), F.asc("pair_right")
    )
    return (
        pc2.withColumn("rnk", F.row_number().over(w_rank).cast("bigint"))
        .filter(F.col("rnk") <= top_n)
        .select("rnk", "pair_left", "pair_right", "pair_count", "applied_pair")
    )


def merge_step_oracle_sql(top_n: int = 10) -> str:
    """DuckDB twin — the same run/offset window algebra."""
    return rf"""
WITH toks AS (
  SELECT unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                            x -> x <> '')) AS w
  FROM documents
), wc AS (
  SELECT w, CAST(count(*) AS BIGINT) AS wfreq FROM toks
  GROUP BY w HAVING length(w) >= 2
), sym AS (
  SELECT w, wfreq, CAST(i AS BIGINT) AS pos, w[CAST(i AS INTEGER):CAST(i AS INTEGER)] AS s
  FROM wc, LATERAL unnest(range(1, length(w) + 1)) AS t(i)
), adj AS (
  SELECT w, wfreq, pos, s, lead(s) OVER (PARTITION BY w ORDER BY pos) AS s2
  FROM sym
), pc AS (
  SELECT s AS c1, s2 AS c2, CAST(sum(wfreq) AS BIGINT) AS cnt
  FROM adj WHERE s2 IS NOT NULL GROUP BY s, s2
), best AS (
  SELECT c1, c2 FROM pc ORDER BY cnt DESC, c1 || c2 ASC LIMIT 1
), m AS (
  SELECT a.w, a.wfreq, a.pos, a.s, a.s2, b.c1, b.c2,
         (a.s = b.c1 AND a.s2 = b.c2) AS mt
  FROM adj a CROSS JOIN best b
), matches AS (
  SELECT w, pos FROM m WHERE mt
), runs AS (
  SELECT w, pos, pos - row_number() OVER (PARTITION BY w ORDER BY pos) AS grp
  FROM matches
), starts AS (
  SELECT w, pos,
         ((pos - min(pos) OVER (PARTITION BY w, grp)) % 2 = 0) AS is_start
  FROM runs
), star AS (
  SELECT m.w, m.wfreq, m.pos, m.s, m.c1, m.c2,
         COALESCE(s.is_start, FALSE) AS st
  FROM m LEFT JOIN starts s ON s.w = m.w AND s.pos = m.pos
), fl AS (
  SELECT *, COALESCE(lag(st) OVER (PARTITION BY w ORDER BY pos), FALSE) AS consumed
  FROM star
), ns AS (
  SELECT w, wfreq, pos,
         CASE WHEN st THEN c1 || c2 ELSE s END AS tok,
         c1 || c2 AS applied_pair
  FROM fl WHERE NOT consumed
), adj2 AS (
  SELECT w, wfreq, applied_pair, tok,
         lead(tok) OVER (PARTITION BY w ORDER BY pos) AS tok2
  FROM ns
), pc2 AS (
  SELECT tok AS pair_left, tok2 AS pair_right, applied_pair,
         CAST(sum(wfreq) AS BIGINT) AS pair_count
  FROM adj2 WHERE tok2 IS NOT NULL GROUP BY tok, tok2, applied_pair
)
SELECT CAST(row_number() OVER (ORDER BY pair_count DESC, pair_left ASC, pair_right ASC) AS BIGINT) AS rnk,
       pair_left, pair_right, pair_count, applied_pair
FROM pc2
QUALIFY rnk <= {top_n}
"""
