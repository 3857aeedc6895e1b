"""Corpus curation capstones: the composed keep/drop funnel (v1/v2) over dedup + quality + PII + decontamination.

Split from queries_llm.py (r11) verbatim; registry semantics
unchanged — every @query body and oracle string is byte-identical
to the monolith it moved from.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from gmall_spark.operators import (
    components,
    llm_dedup,
    multimodal,
)
from gmall_spark import fixtures_audit
from gmall_spark.functions import text as TX
from gmall_spark.queries import _t, query
from gmall_spark.queries_llm.prelude import (
    SQL_MINHASH,
    _CURATION_V2,
    _SQL_GROUP_CTES,
    _boiler_clean,
    _contain_pairs,
    _docs,
    _lm_scores,
    _session_token,
    _transitive_groups,
    _xmatch,
)
from gmall_spark.queries_llm.corpus_lm import DECONTAM_THRESHOLD

# --- corpus curation (composition capstone) -------------------------------


_SQL_CURATION = (
    SQL_MINHASH.replace("WITH ws", "WITH RECURSIVE ws", 1)
    + _SQL_GROUP_CTES
    + """
, drops AS (
  SELECT doc_id FROM grp WHERE doc_id <> group_id
), canon AS (
  SELECT doc_id, md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS h
  FROM documents
), keepers AS (
  SELECT MIN(doc_id) AS doc_id FROM canon GROUP BY h
), feat AS (
  SELECT doc_id,
         CASE WHEN regexp_matches(lower(text), '{cjk}') THEN 'zh'
              WHEN regexp_matches(lower(text), '{en}') THEN 'en'
              WHEN regexp_matches(lower(text), '{es}') THEN 'es'
              WHEN regexp_matches(lower(text), '{fr}') THEN 'fr'
              WHEN regexp_matches(lower(text), '{de}') THEN 'de'
              ELSE 'unknown' END AS lang_pred,
         CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_words,
         CAST(length(text) AS BIGINT) AS n_chars
  FROM documents
)
SELECT f.doc_id, f.lang_pred, f.n_words
FROM feat f
JOIN keepers k ON f.doc_id = k.doc_id
LEFT JOIN drops dr ON f.doc_id = dr.doc_id
WHERE dr.doc_id IS NULL
  AND f.n_words >= 5 AND f.n_chars >= 20 AND f.lang_pred <> 'unknown'
""".format(
        cjk=TX.CJK_RANGE,
        en=TX.EN_MARKERS,
        es=TX.ES_MARKERS,
        fr=TX.FR_MARKERS,
        de=TX.DE_MARKERS,
    )
)


@query("llm_corpus_curation", _SQL_CURATION)
def q_llm_corpus_curation(spark, sf_dir):
    """End-to-end training-corpus curation: quality filter (length)
    -> language filter (keep identified) -> exact dedup (canonical-
    hash keeper) -> near-dup removal: connected components over the
    MinHash+LSH verified pairs, dropping every non-representative
    member of each duplicate GROUP (keep-one-per-component — the
    standard policy; the r3 pairwise doc_b drop over/under-dropped on
    chains). One composed DataFrame plan — every stage is an existing
    oracle-gated operator, demonstrating that the pieces pipeline the
    way a real curation job runs them."""
    d = _docs(spark, sf_dir)
    t = F.col("text")
    feat = d.select(
        "doc_id",
        TX.lang_id(t).alias("lang_pred"),
        TX.word_count(t).alias("n_words"),
        F.length(t).cast("bigint").alias("n_chars"),
    )
    qual = feat.filter(
        (F.col("n_words") >= 5)
        & (F.col("n_chars") >= 20)
        & (F.col("lang_pred") != "unknown")
    )
    keepers = llm_dedup.exact_dedup_groups(d).select(
        F.col("keeper_id").alias("doc_id")
    )
    drops = components.dedup_drops(_transitive_groups(spark, sf_dir))
    return (
        qual.join(keepers, "doc_id", "semi")
        .join(drops, "doc_id", "anti")
        .select("doc_id", "lang_pred", "n_words")
    )


# v2 adds the round's new stages on top: drop docs near-duplicating
# the held-out reference set (X47 decontamination; the ref subset
# itself is excluded from a training corpus by definition), and carry
# the char-bigram LM quality signal (X38) as an output column — a
# score, not a filter: a data-dependent score CUT would hang corpus
# membership on a float-percentile boundary (the ADVICE-r2 flake
# class), so the cut stays a downstream policy choice.
def _replace_must_hit(src: str, old: str, new: str) -> str:
    """str.replace that REFUSES to silently no-op: the v2 oracle is
    assembled by splicing CTEs into v1's SQL, and a v1 edit that
    breaks a splice point must fail loudly at import, not ship a
    wrong oracle."""
    assert old in src, f"curation v2 splice point vanished: {old[:60]!r}"
    return src.replace(old, new)


_SQL_CURATION_V2 = _replace_must_hit(
    _SQL_CURATION,
        "SELECT f.doc_id, f.lang_pred, f.n_words",
        """SELECT f.doc_id, f.lang_pred, f.n_words, lm.bigram_logprob""",
    )
_SQL_CURATION_V2 = _replace_must_hit(
    _SQL_CURATION_V2,
        "LEFT JOIN drops dr ON f.doc_id = dr.doc_id",
        """JOIN lmscore lm ON lm.doc_id = f.doc_id
LEFT JOIN drops dr ON f.doc_id = dr.doc_id
LEFT JOIN xmatch xm ON f.doc_id = xm.doc_id""",
    )
_SQL_CURATION_V2 = _replace_must_hit(
    _SQL_CURATION_V2,
        "WHERE dr.doc_id IS NULL",
        "WHERE dr.doc_id IS NULL AND xm.doc_id IS NULL AND f.doc_id % 20 <> 0",
    )
# The X47 decontamination CTE chain (corpus docs near-duplicating the
# frozen %20 holdout) as a shared constant: spliced into the v2 oracle
# below AND composed by the r12 drop ledger — one source, no drift.
_SQL_XMATCH_CTES = f"""
, xcand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
  WHERE a.doc_id % 20 <> 0 AND b.doc_id % 20 = 0
), xinter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS inter
  FROM xcand c
  JOIN sh sa ON sa.doc_id = c.doc_a
  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
  GROUP BY c.doc_a, c.doc_b
), xmatch AS (
  SELECT DISTINCT i.doc_a AS doc_id
  FROM xinter i
  JOIN szs sa ON sa.doc_id = i.doc_a
  JOIN szs sb ON sb.doc_id = i.doc_b
  WHERE round(CAST(i.inter AS DOUBLE) / CAST(sa.sz + sb.sz - i.inter AS DOUBLE), 6)
        >= {DECONTAM_THRESHOLD}
)"""

_SQL_CURATION_V2 = _replace_must_hit(
    _SQL_CURATION_V2,
        ", drops AS (",
        _SQL_XMATCH_CTES
        + """
, lmd AS (
  SELECT doc_id, lang, lower(text) AS t FROM documents
), lmpos AS (
  SELECT doc_id, lang, t, unnest(range(1, length(t))) AS i
  FROM lmd WHERE length(t) >= 2
), lmbg AS (
  SELECT doc_id, lang, substr(t, CAST(i AS INTEGER), 2) AS b FROM lmpos
), lmmodel AS (
  SELECT lang, b, count(*) AS c FROM lmbg GROUP BY lang, b
), lmtot AS (
  SELECT lang, sum(c) AS total, count(*) AS v FROM lmmodel GROUP BY lang
), lmscored AS (
  SELECT g.doc_id, ln((m.c + 1.0) / (t.total + t.v)) AS lp
  FROM lmbg g
  JOIN lmmodel m ON m.lang = g.lang AND m.b = g.b
  JOIN lmtot t ON t.lang = g.lang
), lmscore AS (
  SELECT doc_id, round(SUM(lp) / COUNT(*), 6) AS bigram_logprob
  FROM lmscored GROUP BY doc_id
), drops AS (""",
    )



@query("llm_corpus_curation_v2", _SQL_CURATION_V2)
def q_llm_corpus_curation_v2(spark, sf_dir):
    """Curation v1 + this round's stages composed in: the held-out
    reference subset and every corpus doc near-duplicating it (X47)
    are dropped, and the char-bigram LM score (X38) rides along as a
    quality signal column. Same one-DataFrame-plan composition
    discipline as v1. The OUTPUT is a per-(session, sf_dir) shared
    stage fixture: v3 composes the whole of v2, and without the
    materialization every v3 evaluation re-derived v1 + the decontam
    cross-join + the LM join (VERDICT r6 'composition queries
    recompute every stage they compose')."""
    key = (_session_token(spark), sf_dir)
    if key not in _CURATION_V2:
        with fixtures_audit.timed("curation_v2"):
            v1 = q_llm_corpus_curation(spark, sf_dir)
            xmatch = _xmatch(spark, sf_dir)
            scores = _lm_scores(spark, sf_dir).select("doc_id", "bigram_logprob")
            _CURATION_V2[key] = (
                v1.filter(F.col("doc_id") % 20 != 0)
                .join(xmatch, "doc_id", "anti")
                .join(scores, "doc_id")
                .select("doc_id", "lang_pred", "n_words", "bigram_logprob")
                .localCheckpoint(eager=True)
            )
    return _CURATION_V2[key]


@query("llm_corpus_curation_v3", None)  # oracle attached post-registration
def q_llm_corpus_curation_v3(spark, sf_dir):
    """Curation v2 + this round's policy stages composed in (X106/
    X107/X108): documents on the LOSING side of a containment pair
    are dropped (the contained/quoted copy — fewer shingles loses,
    ties break to the higher doc_id), CCNet 'tail' documents are cut,
    and the boilerplate-cleaned rollup (n_spans, removed_spans,
    clean_md5) rides along as the output text columns. Same
    one-DataFrame-plan composition discipline as v1/v2; the drop and
    tier sets join on doc_id only."""
    from gmall_spark.operators import lm

    d = _docs(spark, sf_dir)
    pairs = _contain_pairs(spark, sf_dir)
    drops = pairs.select(
        F.when(F.col("sz_a") < F.col("sz_b"), F.col("doc_a"))
        .when(F.col("sz_b") < F.col("sz_a"), F.col("doc_b"))
        .otherwise(F.greatest("doc_a", "doc_b"))
        .alias("doc_id")
    ).distinct()
    v2 = q_llm_corpus_curation_v2(spark, sf_dir)
    b = (
        lm.perplexity_buckets(d, scored=_lm_scores(spark, sf_dir))
        .filter(F.col("bucket") != "tail")
        .select("doc_id", "bucket")
    )
    s = _boiler_clean(spark, sf_dir)
    return (
        v2.join(drops, "doc_id", "anti")
        .join(b, "doc_id")
        .join(s, "doc_id")
        .select(
            "doc_id",
            "lang_pred",
            "n_words",
            "bigram_logprob",
            "bucket",
            "n_spans",
            "removed_spans",
            "clean_md5",
        )
    )


@query(
    "multimodal_wav_frames",
    """
SELECT d.doc_id,
       CAST(f.frame_idx AS BIGINT) AS frame_idx,
       f.start_ms,
       CAST(d.doc_id % 1000 AS DOUBLE) AS rms,
       CASE WHEN d.doc_id % 1000 = 0 THEN 0.0 ELSE 1.0 END AS zcr,
       (d.doc_id % 1000) < 1 AS silent,
       FALSE AS clipped
FROM documents d
CROSS JOIN (VALUES (0, 0.0), (1, 250.0)) AS f(frame_idx, start_ms)
""",
)
def q_multimodal_wav_frames(spark, sf_dir):
    """End-to-end audio frame analysis (X122): a deterministic
    synthetic PCM corpus (±(doc_id%1000) square wave, REAL RIFF
    encoding) rides the genuine codec path — encode → decode_wav's
    parser → per-frame RMS/ZCR/silence/clipping — and the oracle
    states the CLOSED FORM the round trip must reproduce (rms = amp
    exactly, zcr 1 for any nonzero square, the zero-amp docs
    silent). A container/codec/framing bug anywhere in the path
    breaks the hash (operators/multimodal.wav_frame_features)."""
    blobs = multimodal.synth_wav_blobs(_docs(spark, sf_dir))
    return multimodal.wav_frame_features(blobs)


@query(
    "multimodal_wav_segments",
    """
SELECT doc_id,
       CAST(0 AS BIGINT) AS first_frame,
       CAST(2 AS BIGINT) AS n_frames,
       0.0 AS seg_start_ms,
       CAST(doc_id % 1000 AS DOUBLE) AS mean_rms
FROM documents
WHERE doc_id % 1000 <> 0
""",
)
def q_multimodal_wav_segments(spark, sf_dir):
    """VAD segmentation end to end (X132): the synthetic PCM corpus
    rides encode → decode → frame features → consecutive-run merge
    (operators/multimodal.vad_segments); the oracle states the closed
    form — every nonzero-amplitude doc yields ONE voiced segment
    spanning both frames at its amplitude's RMS, zero-amplitude docs
    yield none. Composes X122's real codec path with the X105 run-
    grouping idiom at frame grain."""
    blobs = multimodal.synth_wav_blobs(_docs(spark, sf_dir))
    return multimodal.vad_segments(multimodal.wav_frame_features(blobs))


@query(
    "multimodal_video_frames",
    """
SELECT d.doc_id,
       CAST(i.frame_idx AS BIGINT) AS frame_idx,
       CAST(4 + d.doc_id % 3 AS BIGINT) AS n_frames,
       CAST(32 AS BIGINT) AS width,
       CAST(8 AS BIGINT) AS height,
       CAST((d.doc_id + i.frame_idx) % 256 AS DOUBLE) AS mean_r,
       CAST((2 * i.frame_idx) % 256 AS DOUBLE) AS mean_g,
       17.0 AS mean_b
FROM documents d
JOIN (VALUES (0), (2), (4)) AS i(frame_idx)
  ON i.frame_idx < 4 + d.doc_id % 3
""",
)
def q_multimodal_video_frames(spark, sf_dir):
    """End-to-end video frame sampling (X123): a deterministic
    synthetic corpus of REAL RIFF/AVI containers (solid-color DIB
    frames, 4 + doc_id%3 per doc) rides the genuine container path —
    encode → recursive chunk walk → every-2nd-frame DIB decode →
    per-channel means — and the oracle states the CLOSED FORM the
    round trip must reproduce (mean_r = (doc_id+i)%256 exactly, …).
    Non-sampled frame bodies are never decoded; a container/stride/
    row-order bug anywhere breaks the hash
    (operators/multimodal.avi_frame_sample)."""
    blobs = multimodal.synth_avi_blobs(_docs(spark, sf_dir))
    return multimodal.avi_frame_sample(blobs, every=2)


