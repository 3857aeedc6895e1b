"""Frozen unigram-LM (SentencePiece-class) subword segmentation.

Kudo 2018 (arXiv:1804.10959, "Subword Regularization") trains a
unigram language model over piece candidates and segments each word
with Viterbi: the piece sequence minimizing total cost (negative
log-probability). This module is the DEPLOYMENT half next to the BPE
tier (operators/bpe.py, X139/X176): a FROZEN vocab artifact applied
to every batch — the comparison pipeline real tokenizer evaluations
run (BPE greedy merges vs unigram-LM Viterbi over the same corpus,
reference parity: the gap between corpus curation and token-budget
planning, same slot as `gmall-realtime` keyword splitting in
app/dws/DwsTrafficSourceKeywordPageViewWindow.java — analysis-side
text segmentation under a frozen dictionary).

Determinism contract (all three implementations — the Spark SQL
expression, the DuckDB oracle expression, and the Python reference
used by the hypothesis suite — pin the IDENTICAL rule):

- Costs are INTEGERS (centinats). No logarithm is ever evaluated at
  query time — libm log() is exactly the cross-engine float trap the
  oracle discipline bans; the frozen artifact already stores the
  quantized costs, the way production tokenizers ship quantized
  scores.
- DP state per prefix j is a single KEY STRING
  ``zfill(cost, 12) + '|' + ' '.join(pieces)``; the best state is the
  LEXICOGRAPHIC MINIMUM over candidate keys. Zero-padded cost makes
  string order equal numeric order on the cost, and the piece-string
  suffix makes the order TOTAL — equal-cost ties resolve identically
  everywhere (pure ASCII compare; no collation, no sort-stability
  assumption).
- Out-of-vocab pieces cost SENTINEL_COST. Every [a-z0-9] single char
  is in the vocab with cost <= 900, so a sentinel piece can never win
  (replacing it with its chars is always cheaper) — the winning
  segmentation is provably all-vocab, which the decode round-trip
  query audits.

Scale shape (100 TB): Viterbi runs on the DISTINCT-WORD table only
(Heaps-law bounded, the operators/bpe.py discipline) — one
corpus-sized explode/count, vocabulary-sized DP, broadcast join back.
The DP itself is ONE aggregate() fold per word: per-row JVM codegen,
zero shuffle, no UDF.
"""

from __future__ import annotations

# Frozen unigram vocab: piece -> integer cost (centinats, lower =
# more probable). All 36 single [a-z0-9] chars are present (coverage
# guarantee); multi-char pieces cost less than their char sum, so the
# DP genuinely prefers them. In production this literal is the
# artifact the EM training loop emits (Kudo 2018 §3.2).
_CHAR_TIERS = (
    ("etaoinsr", 420),
    ("hldcum", 500),
    ("fpgwyb", 560),
    ("vkxjqz", 650),
    ("0123456789", 600),
)

FROZEN_UNIGRAM_VOCAB: dict[str, int] = {
    **{c: cost for chars, cost in _CHAR_TIERS for c in chars},
    # 2-char pieces
    "th": 520, "he": 540, "in": 520, "er": 540, "an": 530, "re": 545,
    "on": 540, "at": 545, "en": 540, "nd": 560, "ti": 550, "es": 545,
    "or": 555, "te": 550, "of": 580, "ed": 555, "is": 550, "it": 550,
    "al": 555, "ar": 555, "st": 550, "to": 555, "nt": 555, "ng": 560,
    # 3-char pieces
    "the": 560, "ing": 580, "and": 575, "ion": 590, "ent": 595,
    "for": 620, "ere": 610, "her": 610, "ate": 605, "ver": 630,
    "ter": 615, "con": 650, "res": 640, "pro": 660,
    # 4-char pieces
    "tion": 640, "ment": 690, "ther": 680, "with": 720, "atio": 700,
}

UNIGRAM_MAX_PIECE_LEN = max(len(p) for p in FROZEN_UNIGRAM_VOCAB)
SENTINEL_COST = 10_000_000  # OOV piece: provably never on a winning path
_INIT_KEY = "0" * 12 + "|"


def _pieces_by_len() -> dict[int, list[tuple[str, int]]]:
    out: dict[int, list[tuple[str, int]]] = {}
    for p, c in sorted(FROZEN_UNIGRAM_VOCAB.items()):
        out.setdefault(len(p), []).append((p, c))
    return out


def _cost_case(piece_expr: str, excl: str | None = None) -> dict[int, str]:
    """Per piece length k, a CASE chain mapping ``piece_expr`` (a SQL
    fragment yielding the k-char substring) to its frozen cost, OOV ->
    SENTINEL_COST. Identical text works in Spark SQL and DuckDB.
    With ``excl`` (a column reference), the matching piece is priced
    at the sentinel instead — the leave-one-out vocab of the X202
    prune scorer."""
    by_len = _pieces_by_len()
    base = {
        k: "CASE " + piece_expr + " "
        + " ".join(f"WHEN '{p}' THEN {c}" for p, c in by_len[k])
        + f" ELSE {SENTINEL_COST} END"
        for k in by_len
    }
    if excl is None:
        return base
    return {
        k: f"CASE WHEN {piece_expr} = {excl} THEN {SENTINEL_COST} "
        f"ELSE {chain} END"
        for k, chain in base.items()
    }


def in_vocab_case(piece_expr: str) -> str:
    """SQL fragment (valid in both engines): 1 when ``piece_expr`` is
    a frozen-vocab piece, else 0 — the decode audit's OOV detector."""
    return (
        "CASE " + piece_expr + " "
        + " ".join(
            f"WHEN '{p}' THEN 1" for p in sorted(FROZEN_UNIGRAM_VOCAB)
        )
        + " ELSE 0 END"
    )


def viterbi_key_expr_spark(word: str, excl: str | None = None) -> str:
    """Spark SQL expression: ``word`` (column/lambda-var reference) ->
    the final DP key string ``zfill(cost,12)|piece piece ...``.
    ``excl`` prices one piece (a column reference) at the sentinel —
    the leave-one-out segmentation of the prune scorer."""
    cands = []
    for k in range(1, UNIGRAM_MAX_PIECE_LEN + 1):
        piece = f"substring({word}, i - {k} + 1, {k})"
        cost = _cost_case(piece, excl)[k]
        prev = f"element_at(acc, i - {k} + 1)"
        cands.append(
            f"CASE WHEN i >= {k} THEN concat("
            f"lpad(cast(cast(substring({prev}, 1, 12) as bigint)"
            f" + {cost} as string), 12, '0'), '|', "
            f"substring({prev}, 14), "
            f"CASE WHEN i = {k} THEN '' ELSE ' ' END, {piece}"
            f") ELSE NULL END"
        )
    best = (
        "array_min(filter(array(" + ", ".join(cands) + "), c -> c IS NOT NULL))"
    )
    return (
        f"element_at(aggregate(sequence(1, length({word})), "
        f"array('{_INIT_KEY}'), "
        f"(acc, i) -> concat(acc, array({best}))), length({word}) + 1)"
    )


def viterbi_key_expr_duckdb(word: str, excl: str | None = None) -> str:
    """DuckDB twin of :func:`viterbi_key_expr_spark`. list_reduce has
    no initial-value overload, so the initial accumulator rides as the
    first element and positions ride as singleton VARCHAR lists (the
    operators/bpe.py idiom); ``i`` is recovered with one cast."""
    cands = []
    for k in range(1, UNIGRAM_MAX_PIECE_LEN + 1):
        # {I} is substituted with the position recovered from the
        # singleton element below — DuckDB lambdas allow no scalar
        # subquery, so there is no way to alias it once.
        piece = f"substring({word}, CAST({{I}} - {k} + 1 AS INTEGER), {k})"
        cost = _cost_case(piece, excl)[k]
        prev = f"acc[CAST({{I}} - {k} + 1 AS INTEGER)]"
        cands.append(
            f"CASE WHEN {{I}} >= {k} THEN "
            f"lpad(CAST(CAST({prev}[1:12] AS BIGINT)"
            f" + {cost} AS VARCHAR), 12, '0') || '|' || "
            f"{prev}[14:] || "
            f"(CASE WHEN {{I}} = {k} THEN '' ELSE ' ' END) || {piece}"
            f" ELSE NULL END"
        )
    best = (
        "list_aggregate(list_filter(["
        + ", ".join(cands)
        + "], c -> c IS NOT NULL), 'min')"
    ).replace("{I}", "CAST(x[1] AS BIGINT)")
    return (
        f"list_reduce(list_concat([['{_INIT_KEY}']], "
        f"list_transform(range(1, length({word}) + 1), "
        f"p -> [CAST(p AS VARCHAR)])), "
        f"(acc, x) -> acc || [{best}]"
        f")[CAST(length({word}) + 1 AS INTEGER)]"
    )


# Shared oracle scaffolding: corpus -> (doc_id, w, cnt) word counts
# -> distinct words -> Viterbi once per distinct word (MATERIALIZED:
# DuckDB re-inlines CTEs at every reference and the seg CTE feeds
# several chains).
_TOK_CTE = r"""
tokx AS (
  SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text),
                                                          '[^a-z0-9]+'),
                                    x -> x <> '')) AS w
  FROM documents
), tok AS (
  SELECT doc_id, w, count(*) AS cnt FROM tokx GROUP BY doc_id, w
), wd AS (SELECT DISTINCT w FROM tok)
"""


def encode_oracle_sql() -> str:
    """DuckDB twin of the registered frozen unigram-encode query."""
    key = viterbi_key_expr_duckdb("w")
    return rf"""
WITH {_TOK_CTE},
seg AS MATERIALIZED (SELECT w, {key} AS key FROM wd),
segc AS (
  SELECT w, CAST(key[1:12] AS BIGINT) AS wcost,
         len(string_split(key[14:], ' ')) AS n_pieces
  FROM seg
)
SELECT t.doc_id,
       CAST(sum(t.cnt) AS BIGINT) AS n_words,
       CAST(sum(t.cnt * length(t.w)) AS BIGINT) AS n_chars,
       CAST(sum(t.cnt * s.n_pieces) AS BIGINT) AS n_pieces,
       CAST(sum(t.cnt * s.wcost) AS BIGINT) AS unigram_cost,
       round(CAST(sum(t.cnt * length(t.w)) AS DOUBLE)
             / sum(t.cnt * s.n_pieces), 6) AS compression
FROM tok t JOIN segc s USING (w)
GROUP BY t.doc_id
UNION ALL
SELECT doc_id, CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
       CAST(0 AS BIGINT), CAST(NULL AS DOUBLE)
FROM documents WHERE NOT regexp_matches(lower(text), '[a-z0-9]')
"""


def decode_oracle_sql() -> str:
    """DuckDB twin of the registered unigram decode/round-trip audit."""
    key = viterbi_key_expr_duckdb("w")
    member = in_vocab_case("p")
    return rf"""
WITH {_TOK_CTE},
seg AS MATERIALIZED (SELECT w, {key} AS key FROM wd),
segc AS (
  SELECT w,
         CASE WHEN replace(key[14:], ' ', '') = w THEN 1 ELSE 0 END AS rt,
         len(list_filter(string_split(key[14:], ' '),
                         p -> ({member}) = 0)) AS n_oov
  FROM seg
)
SELECT t.doc_id,
       CAST(sum(t.cnt) AS BIGINT) AS n_words,
       CAST(sum(t.cnt * s.rt) AS BIGINT) AS n_roundtrip,
       CAST(sum(t.cnt * s.n_oov) AS BIGINT) AS n_oov_pieces,
       sum(t.cnt * s.rt) = sum(t.cnt) AS roundtrip_exact
FROM tok t JOIN segc s USING (w)
GROUP BY t.doc_id
UNION ALL
SELECT doc_id, CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), true
FROM documents WHERE NOT regexp_matches(lower(text), '[a-z0-9]')
"""


def fertility_oracle_sql() -> str:
    """DuckDB twin of the per-language BPE-vs-unigram fertility
    comparison (the X115 harness over the two frozen tokenizers)."""
    from gmall_spark.operators.bpe import encode_expr_duckdb

    key = viterbi_key_expr_duckdb("w")
    bpe = encode_expr_duckdb("w")
    return rf"""
WITH ltokx AS (
  SELECT lang, unnest(list_filter(regexp_split_to_array(lower(text),
                                                        '[^a-z0-9]+'),
                                  x -> x <> '')) AS w
  FROM documents
), ltok AS (
  SELECT lang, w, count(*) AS cnt FROM ltokx GROUP BY lang, w
), wd AS (SELECT DISTINCT w FROM ltok),
seg AS MATERIALIZED (
  SELECT w, len(string_split(({key})[14:], ' ')) AS n_pieces,
         len({bpe}) AS n_bpe
  FROM wd
)
SELECT t.lang,
       CAST(sum(t.cnt) AS BIGINT) AS n_words,
       CAST(sum(t.cnt * s.n_bpe) AS BIGINT) AS n_subwords_bpe,
       CAST(sum(t.cnt * s.n_pieces) AS BIGINT) AS n_subwords_unigram,
       round(CAST(sum(t.cnt * s.n_bpe) AS DOUBLE) / sum(t.cnt), 6)
         AS fertility_bpe,
       round(CAST(sum(t.cnt * s.n_pieces) AS DOUBLE) / sum(t.cnt), 6)
         AS fertility_unigram,
       round(CAST(sum(t.cnt * s.n_pieces) AS DOUBLE)
             / sum(t.cnt * s.n_bpe), 6) AS unigram_vs_bpe
FROM ltok t JOIN seg s USING (w)
GROUP BY t.lang
"""


def prune_oracle_sql() -> str:
    """DuckDB twin of the registered X202 vocab-prune scorer: corpus
    word counts, the full Viterbi per distinct word, per-(word, used
    multi-char piece) leave-one-out re-segmentation, corpus-weighted
    aggregates onto the full prunable-vocab grid."""
    key = viterbi_key_expr_duckdb("w")
    key_x = viterbi_key_expr_duckdb("e.w", excl="e.piece")
    vocab_vals = ", ".join(
        f"('{p}')" for p in sorted(FROZEN_UNIGRAM_VOCAB) if len(p) >= 2
    )
    return rf"""
WITH tokx AS (
  SELECT unnest(list_filter(regexp_split_to_array(lower(text),
                                                  '[^a-z0-9]+'),
                            x -> x <> '')) AS w
  FROM documents
), tok AS (
  SELECT w, count(*) AS cnt FROM tokx GROUP BY w
), seg AS MATERIALIZED (
  SELECT w, cnt, {key} AS key FROM tok
), pw AS (
  SELECT w, piece, count(*) AS uses
  FROM (SELECT w, unnest(string_split(key[14:], ' ')) AS piece FROM seg)
  GROUP BY w, piece
), ex AS MATERIALIZED (
  SELECT e.piece, s.cnt, e.uses,
         CAST(({key_x})[1:12] AS BIGINT)
           - CAST(s.key[1:12] AS BIGINT) AS delta
  FROM (SELECT w, piece, uses FROM pw WHERE length(piece) >= 2) e
  JOIN seg s USING (w)
), agg AS (
  SELECT piece,
         count(*) AS usage_words,
         sum(cnt * uses) AS usage_occs,
         sum(cnt * delta) AS cost_delta
  FROM ex GROUP BY piece
), vocab(piece) AS (VALUES {vocab_vals})
SELECT v.piece,
       CAST(COALESCE(a.usage_words, 0) AS BIGINT) AS usage_words,
       CAST(COALESCE(a.usage_occs, 0) AS BIGINT) AS usage_occs,
       CAST(COALESCE(a.cost_delta, 0) AS BIGINT) AS cost_delta,
       CAST(row_number() OVER (ORDER BY COALESCE(a.cost_delta, 0), v.piece)
            AS BIGINT) AS prune_rank
FROM vocab v LEFT JOIN agg a ON a.piece = v.piece
"""


def viterbi_py(word: str, excl: str | None = None) -> tuple[int, list[str]]:
    """Python reference of the identical rule — the hypothesis-suite
    ground truth. Returns (total_cost, pieces). ``excl`` prices that
    piece at the sentinel (leave-one-out)."""
    keys = [_INIT_KEY]
    for i in range(1, len(word) + 1):
        best = None
        for k in range(1, min(UNIGRAM_MAX_PIECE_LEN, i) + 1):
            piece = word[i - k : i]
            c = (
                SENTINEL_COST
                if piece == excl
                else FROZEN_UNIGRAM_VOCAB.get(piece, SENTINEL_COST)
            )
            prev = keys[i - k]
            cost = int(prev[:12]) + c
            toks = prev[13:] + ("" if i == k else " ") + piece
            cand = str(cost).zfill(12) + "|" + toks
            if best is None or cand < best:
                best = cand
        keys.append(best)
    final = keys[len(word)]
    return int(final[:12]), final[13:].split(" ")
