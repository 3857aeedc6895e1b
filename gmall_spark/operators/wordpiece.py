"""Frozen WordPiece (BERT-class) subword segmentation.

WordPiece (Schuster & Nakajima 2012; Wu et al. 2016, GNMT §4.1; the
BERT tokenizer, Devlin 2018) segments each word GREEDILY: at every
position take the LONGEST vocab piece that matches, where pieces at
position > 1 are drawn from a separate continuation vocabulary
(written with a ``##`` prefix); if no piece matches, the ENTIRE word
becomes ``[UNK]``. This module is the third frozen-tokenizer tier
next to BPE greedy merges (operators/bpe.py, X139/X176) and
unigram-LM Viterbi (operators/unigram.py, X194) — the three
segmentation families real tokenizer evaluations compare (reference
parity: the same analysis-side keyword-splitting slot as
app/dws/DwsTrafficSourceKeywordPageViewWindow.java in
`gmall-realtime`, under a frozen dictionary).

Determinism contract (the Spark SQL expression, the DuckDB oracle
expression, and the Python reference pin the IDENTICAL rule):

- Greedy longest-match-first is already a total order — at each
  position exactly one piece (or UNK) can win, so unlike the unigram
  DP there is no tie to break: membership is pure string equality
  against the frozen piece lists, no costs, no floats, no libm.
- The fold state is ONE string ``zfill(next_pos, 6) + '|' + pieces``;
  a position step either skips (i != next_pos — the position was
  consumed by an earlier, longer piece) or advances by the matched
  piece length. ``[UNK]`` sets next_pos past the end, discarding the
  partial segmentation (the word-level UNK semantics BERT ships).
- Digits are INITIAL-ONLY in the frozen vocab (no ``##<digit>``
  continuation), so any word with a digit past position 1 — and any
  multi-digit number — hits the UNK path. The synthetic corpus draws
  from a fixed 31-word letters-only vocabulary, so on it
  n_unk_words is legitimately 0; the UNK branch is carried by the
  hypothesis suite (random [a-z0-9] words exercise it across all
  three implementations) and a planted unit test — the X187-class
  "flag provable by fixture" discipline.

Scale shape (100 TB): the greedy fold runs on the DISTINCT-WORD
table only (Heaps-law bounded, the operators/bpe.py discipline) —
one corpus-sized explode/count, vocabulary-sized matching, broadcast
join back. The fold is ONE aggregate() per word: per-row JVM
codegen, zero shuffle, no UDF.
"""

from __future__ import annotations

# Frozen vocab: word-initial pieces and continuation pieces (stored
# WITHOUT the ## prefix; the prefix is presentation). All 36 [a-z0-9]
# chars are initial pieces; all 26 LETTERS are continuations — digits
# are deliberately initial-only (see module docstring). In production
# these literals are the artifact the WordPiece trainer emits.
_ALPHA = "abcdefghijklmnopqrstuvwxyz"
_DIGIT = "0123456789"

INIT_PIECES: frozenset[str] = frozenset(
    set(_ALPHA) | set(_DIGIT) | {
        "an", "be", "co", "de", "in", "ma", "or", "re", "se", "st",
        "th", "to", "un", "wh",
        "con", "dis", "for", "pre", "pro", "the",
        "over", "with",
    }
)

CONT_PIECES: frozenset[str] = frozenset(
    set(_ALPHA) | {
        "al", "an", "ar", "at", "ed", "en", "er", "es", "in", "is",
        "it", "le", "ll", "nd", "ng", "nt", "on", "or", "re", "st",
        "te", "th", "ti", "ve",
        "ate", "ent", "ing", "ion", "ter",
        "able", "ment", "ness", "tion",
    }
)

WP_MAX_PIECE_LEN = max(
    max(len(p) for p in INIT_PIECES), max(len(p) for p in CONT_PIECES)
)
UNK = "[UNK]"
_INIT_ACC = "000001|"


def _by_len(pieces: frozenset[str]) -> dict[int, list[str]]:
    out: dict[int, list[str]] = {}
    for p in sorted(pieces):
        out.setdefault(len(p), []).append(p)
    return out


def _member(piece_expr: str, pieces: list[str]) -> str:
    """``1`` iff ``piece_expr`` (a SQL fragment) is one of ``pieces``
    — identical text is valid in Spark SQL and DuckDB."""
    return (
        "CASE " + piece_expr + " "
        + " ".join(f"WHEN '{p}' THEN 1" for p in pieces)
        + " END = 1"
    )


def wordpiece_key_expr_spark(word: str) -> str:
    """Spark SQL expression: ``word`` (column/lambda-var reference)
    -> the final fold state ``zfill(next_pos,6)|piece piece ...``
    (pieces space-separated, continuations carrying ``##``), or
    ``......|[UNK]``."""
    init_by, cont_by = _by_len(INIT_PIECES), _by_len(CONT_PIECES)
    unk = (
        f"concat(lpad(cast(length({word}) + 1 as string), 6, '0'), "
        f"'|{UNK}')"
    )

    def chain(by_len: dict[int, list[str]], cont: bool) -> str:
        arms = []
        for k in sorted(by_len, reverse=True):  # longest-first = greedy
            piece = f"substring({word}, i, {k})"
            emit = f"concat('##', {piece})" if cont else piece
            step = (
                f"concat(lpad(cast(i + {k} as string), 6, '0'), '|', "
                f"substring(acc, 8), "
                f"CASE WHEN i = 1 THEN '' ELSE ' ' END, {emit})"
            )
            arms.append(f"WHEN {_member(piece, by_len[k])} THEN {step}")
        return "CASE " + " ".join(arms) + f" ELSE {unk} END"

    body = (
        f"CASE WHEN cast(substring(acc, 1, 6) as int) <> i THEN acc "
        f"WHEN i = 1 THEN {chain(init_by, False)} "
        f"ELSE {chain(cont_by, True)} END"
    )
    return (
        f"aggregate(sequence(1, length({word})), '{_INIT_ACC}', "
        f"(acc, i) -> {body})"
    )


def wordpiece_key_expr_duckdb(word: str) -> str:
    """DuckDB twin of :func:`wordpiece_key_expr_spark`. list_reduce
    has no initial-value overload, so the initial accumulator rides
    as the first element and positions ride as SINGLETON VARCHAR
    LISTS (the operators/unigram.py idiom — a plain-VARCHAR
    accumulator cross-contaminates rows under DuckDB 1.0.0's
    vectorized lambda evaluation at batch sizes past a few rows;
    list-typed state does not); ``i`` is recovered with one cast.
    DuckDB lambdas allow no scalar subquery, so ``{I}`` and ``{A}``
    (the accumulated key string) are substituted textually."""
    init_by, cont_by = _by_len(INIT_PIECES), _by_len(CONT_PIECES)
    unk = f"lpad(CAST(length({word}) + 1 AS VARCHAR), 6, '0') || '|{UNK}'"

    def chain(by_len: dict[int, list[str]], cont: bool) -> str:
        arms = []
        for k in sorted(by_len, reverse=True):
            piece = f"substring({word}, CAST({{I}} AS INTEGER), {k})"
            emit = f"'##' || {piece}" if cont else piece
            step = (
                f"lpad(CAST({{I}} + {k} AS VARCHAR), 6, '0') || '|' || "
                f"{{A}}[8:] || "
                f"(CASE WHEN {{I}} = 1 THEN '' ELSE ' ' END) || {emit}"
            )
            arms.append(f"WHEN {_member(piece, by_len[k])} THEN {step}")
        return "CASE " + " ".join(arms) + f" ELSE {unk} END"

    body = (
        f"[CASE WHEN CAST({{A}}[1:6] AS BIGINT) <> {{I}} THEN {{A}} "
        f"WHEN {{I}} = 1 THEN {chain(init_by, False)} "
        f"ELSE {chain(cont_by, True)} END]"
    ).replace("{I}", "CAST(x[1] AS BIGINT)").replace("{A}", "acc[1]")
    return (
        f"list_reduce(list_concat([['{_INIT_ACC}']], "
        f"list_transform(range(1, length({word}) + 1), "
        f"p -> [CAST(p AS VARCHAR)])), (acc, x) -> {body})[1]"
    )


def wordpiece_py(word: str) -> list[str]:
    """Python reference of the identical rule — the hypothesis-suite
    ground truth. Returns the piece list (continuations carrying
    ``##``), or ``['[UNK]']``."""
    pieces: list[str] = []
    i = 0
    while i < len(word):
        vocab = INIT_PIECES if i == 0 else CONT_PIECES
        for k in range(min(WP_MAX_PIECE_LEN, len(word) - i), 0, -1):
            cand = word[i : i + k]
            if cand in vocab:
                pieces.append(cand if i == 0 else "##" + cand)
                i += k
                break
        else:
            return [UNK]
    return pieces


def encode_oracle_sql() -> str:
    """DuckDB twin of the registered frozen WordPiece encode query."""
    from gmall_spark.operators.unigram import _TOK_CTE

    key = wordpiece_key_expr_duckdb("w")
    return rf"""
WITH {_TOK_CTE},
seg AS MATERIALIZED (SELECT w, {key} AS key FROM wd),
segc AS (
  SELECT w,
         CASE WHEN key[8:] = '{UNK}' THEN 1 ELSE 0 END AS unk,
         len(string_split(key[8:], ' ')) AS n_pieces
  FROM seg
)
SELECT t.doc_id,
       CAST(sum(t.cnt) AS BIGINT) AS n_words,
       CAST(sum(t.cnt * s.unk) AS BIGINT) AS n_unk_words,
       CAST(sum(t.cnt * s.n_pieces) AS BIGINT) AS n_pieces,
       round(CAST(sum(t.cnt * s.n_pieces) AS DOUBLE) / sum(t.cnt), 6)
         AS fertility
FROM tok t JOIN segc s USING (w)
GROUP BY t.doc_id
UNION ALL
SELECT doc_id, CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
       CAST(NULL AS DOUBLE)
FROM documents WHERE NOT regexp_matches(lower(text), '[a-z0-9]')
"""


def fertility_triple_oracle_sql() -> str:
    """DuckDB twin of the per-language three-tokenizer fertility
    comparison (BPE greedy merges vs unigram-LM Viterbi vs WordPiece
    greedy longest-match, the X115 harness completed)."""
    from gmall_spark.operators.bpe import encode_expr_duckdb
    from gmall_spark.operators.unigram import viterbi_key_expr_duckdb

    uni = viterbi_key_expr_duckdb("w")
    bpe = encode_expr_duckdb("w")
    wp = wordpiece_key_expr_duckdb("w")
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
  SELECT w, len({bpe}) AS n_bpe,
         len(string_split(({uni})[14:], ' ')) AS n_uni,
         ({wp})[8:] AS wp
  FROM wd
), segc AS (
  SELECT w, n_bpe, n_uni,
         len(string_split(wp, ' ')) AS n_wp,
         CASE WHEN wp = '{UNK}' THEN 1 ELSE 0 END AS unk
  FROM seg
)
SELECT t.lang,
       CAST(sum(t.cnt) AS BIGINT) AS n_words,
       CAST(sum(t.cnt * s.n_bpe) AS BIGINT) AS n_subwords_bpe,
       CAST(sum(t.cnt * s.n_uni) AS BIGINT) AS n_subwords_unigram,
       CAST(sum(t.cnt * s.n_wp) AS BIGINT) AS n_subwords_wordpiece,
       CAST(sum(t.cnt * s.unk) AS BIGINT) AS n_unk_words,
       round(CAST(sum(t.cnt * s.n_bpe) AS DOUBLE) / sum(t.cnt), 6)
         AS fertility_bpe,
       round(CAST(sum(t.cnt * s.n_uni) AS DOUBLE) / sum(t.cnt), 6)
         AS fertility_unigram,
       round(CAST(sum(t.cnt * s.n_wp) AS DOUBLE) / sum(t.cnt), 6)
         AS fertility_wordpiece
FROM ltok t JOIN segc s USING (w)
GROUP BY t.lang
"""


def fertility_quad_oracle_sql() -> str:
    """DuckDB twin of the per-language FOUR-tokenizer fertility table
    (X224): the X206 triple plus the byte-fallback BPE tier — the
    column whose UNK count is zero BY CONSTRUCTION (byte fallback
    covers every string), the coverage contrast the triple couldn't
    show."""
    from gmall_spark.operators.bpe import (
        byte_encode_expr_duckdb,
        encode_expr_duckdb,
    )
    from gmall_spark.operators.unigram import viterbi_key_expr_duckdb

    uni = viterbi_key_expr_duckdb("w")
    bpe = encode_expr_duckdb("w")
    bbpe = byte_encode_expr_duckdb("w")
    wp = wordpiece_key_expr_duckdb("w")
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
  SELECT w, len({bpe}) AS n_bpe,
         len({bbpe}) AS n_bbpe,
         len(string_split(({uni})[14:], ' ')) AS n_uni,
         ({wp})[8:] AS wp
  FROM wd
), segc AS (
  SELECT w, n_bpe, n_bbpe, n_uni,
         len(string_split(wp, ' ')) AS n_wp,
         CASE WHEN wp = '{UNK}' THEN 1 ELSE 0 END AS unk
  FROM seg
)
SELECT t.lang,
       CAST(sum(t.cnt) AS BIGINT) AS n_words,
       CAST(sum(t.cnt * s.n_bpe) AS BIGINT) AS n_subwords_bpe,
       CAST(sum(t.cnt * s.n_bbpe) AS BIGINT) AS n_subwords_bytebpe,
       CAST(sum(t.cnt * s.n_uni) AS BIGINT) AS n_subwords_unigram,
       CAST(sum(t.cnt * s.n_wp) AS BIGINT) AS n_subwords_wordpiece,
       CAST(sum(t.cnt * s.unk) AS BIGINT) AS n_unk_words,
       CAST(0 AS BIGINT) AS n_unk_words_bytebpe,
       round(CAST(sum(t.cnt * s.n_bpe) AS DOUBLE) / sum(t.cnt), 6)
         AS fertility_bpe,
       round(CAST(sum(t.cnt * s.n_bbpe) AS DOUBLE) / sum(t.cnt), 6)
         AS fertility_bytebpe,
       round(CAST(sum(t.cnt * s.n_uni) AS DOUBLE) / sum(t.cnt), 6)
         AS fertility_unigram,
       round(CAST(sum(t.cnt * s.n_wp) AS DOUBLE) / sum(t.cnt), 6)
         AS fertility_wordpiece
FROM ltok t JOIN segc s USING (w)
GROUP BY t.lang
"""
