"""Unicode NFKC-lite normalization tier (X258, r12).

The SentencePiece-default normalizer step the tokenizer tiers sit
behind (Kudo & Richardson 2018 run NFKC before any segmentation):
compatibility forms — ligatures, fullwidth letters/digits, width
spaces, curly quotes, unicode dashes, the ellipsis — are folded to
their ASCII equivalents BEFORE tokenization, because every unfolded
form fragments the token stream (a fullwidth 'Ａ' is a lone
[^A-Za-z0-9\\s] token to the BPE pre-tokenizer) and splits dedup
hashes across visually identical texts. Reference tie: the dirty-data
side output at BaseLogApp.java:35-41 is the structural sibling
(malformed payloads normalized/routed before the clean path).

Design per the repo's mojibake discipline (operators/mojibake.py,
X229): the rule table is FROZEN (this module's literal tuples — a
deliberate NFKC-lite subset, not a library call: the environment's
unicodedata NFKC is a black box the oracle could not state), the
fullwidth letter fold CASEFOLDS (Ａ -> a, the lowercase-normalizing
tokenizer convention, documented here because NFKC proper maps
Ａ -> A), and the synthetic corruption appends deterministic segments
chosen by doc_id mods — every rule class fires on a known subset,
some docs stay clean, and one census class (line/paragraph
separators) is never planted so the zero row is genuine (X173). The
original corpus is honestly ASCII (pinned in-suite by the mojibake
guard), so a pattern can never pre-exist its planting and the
normalized text has a CLOSED FORM the DuckDB oracle states without
running the normalizer.

Order-free invariant (the X229 chain property): every replacement
output is pure ASCII and every pattern is non-ASCII, so no replace
can create a later rule's match — the chain commutes.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gmall_spark.functions.text import BPE_PATTERN

# --- the frozen rule table ----------------------------------------------------

# multi-char expansions (replace rules)
REPLACES = (
    ("ﬁ", "fi"),
    ("ﬂ", "fl"),
    ("ﬀ", "ff"),
    ("…", "..."),
    ("“", '"'),
    ("”", '"'),
)

# 1:1 folds (one translate call): fullwidth A-Z casefolded to a-z,
# fullwidth a-z and 0-9, ideographic space + NBSP to space, curly
# apostrophes, en/em dash
_FW_UPPER = "".join(chr(0xFF21 + i) for i in range(26))
_FW_LOWER = "".join(chr(0xFF41 + i) for i in range(26))
_FW_DIGIT = "".join(chr(0xFF10 + i) for i in range(10))
_ASCII_LOWER = "abcdefghijklmnopqrstuvwxyz"
TRANSLATE_SRC = _FW_UPPER + _FW_LOWER + _FW_DIGIT + "　 ’‘–—"
TRANSLATE_DST = _ASCII_LOWER + _ASCII_LOWER + "0123456789" + "  ''--"
assert len(TRANSLATE_SRC) == len(TRANSLATE_DST)

# census classes: (name, regex char-class over the ARTIFACTS — literal
# chars, valid in both Java regex and RE2). 'separator' is the planted
# never-fires entry (the X173 genuine-zero row).
CLASSES = (
    ("ligature", "[ﬁﬂﬀ]"),
    ("fullwidth_alpha", f"[{_FW_UPPER[0]}-{_FW_UPPER[-1]}{_FW_LOWER[0]}-{_FW_LOWER[-1]}]"),
    ("fullwidth_digit", f"[{_FW_DIGIT[0]}-{_FW_DIGIT[-1]}]"),
    ("wide_space", "[　 ]"),
    ("quote", "[’‘“”]"),
    ("dash", "[–—]"),
    ("ellipsis", "…"),
    ("separator", "[  ]"),
)

# deterministic corruption segments: (doc_id modulus, residue,
# corrupted segment, normalized segment). Every segment BEGINS with a
# space-class char so no BPE pre-token can span the append junction —
# that is what lets the fertility oracle state token counts as
# text-tokens + a per-segment constant.
SEGMENTS = (
    (3, 1, " ﬁrst ﬂoor oﬀer", " first floor offer"),
    (4, 2, " ＮＡＳＡ ２０２４", " nasa 2024"),
    (5, 3, " don’t ‘x’ “y”", " don't 'x' \"y\""),
    (7, 2, " range –１０—２０…", " range -10-20..."),
    (2, 1, " pad　wide", " pad wide"),
)

for _m, _r, _bad, _good in SEGMENTS:
    assert _bad[0] in "  　" and _good[0] == " ", (_m, _r)
    assert _good.isascii(), (_m, _r)


def synth_unicode(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, text, ...) -> same with the deterministic compatibility
    artifacts appended; pure per-row concat (the mojibake synth
    shape)."""
    tail = F.concat(
        *[
            F.when(F.col("doc_id") % m == r, F.lit(bad)).otherwise(F.lit(""))
            for m, r, bad, _good in SEGMENTS
        ]
    )
    return docs.withColumn(text_col, F.concat(F.col(text_col), tail))


def normalize(col: Column) -> Column:
    """The genuine NFKC-lite chain: one translate for every 1:1 fold,
    then one replace per multi-char expansion (order-free by the
    module invariant)."""
    out = F.translate(col, TRANSLATE_SRC, TRANSLATE_DST)
    for bad, good in REPLACES:
        out = F.replace(out, F.lit(bad), F.lit(good))
    return out


def _sq(s: str) -> str:
    return s.replace("'", "''")


def synth_oracle_expr(text_col: str = "text", id_col: str = "doc_id") -> str:
    """DuckDB mirror of synth_unicode's corrupted text."""
    parts = " || ".join(
        f"CASE WHEN {id_col} % {m} = {r} THEN '{_sq(bad)}' ELSE '' END"
        for m, r, bad, _good in SEGMENTS
    )
    return f"{text_col} || {parts}"


def normalized_oracle_expr(
    text_col: str = "text", id_col: str = "doc_id"
) -> str:
    """The closed form the normalizer must produce (the normalized
    segments appended — the oracle never runs a translate/replace
    over the corpus)."""
    parts = " || ".join(
        f"CASE WHEN {id_col} % {m} = {r} THEN '{_sq(good)}' ELSE '' END"
        for m, r, _bad, good in SEGMENTS
    )
    return f"{text_col} || {parts}"


def _const_case_sum(per_segment: list[int], id_col: str = "doc_id") -> str:
    """SQL summing per-segment integer constants over the mod wheel."""
    terms = [
        f"CASE WHEN {id_col} % {m} = {r} THEN {c} ELSE 0 END"
        for (m, r, _b, _g), c in zip(SEGMENTS, per_segment)
        if c
    ]
    return " + ".join(terms) if terms else "0"


def nonascii_const_sql(id_col: str = "doc_id") -> str:
    """Closed-form count of non-ASCII chars each doc's synth tail
    carries (the corpus itself is ASCII, guard-pinned)."""
    return _const_case_sum(
        [sum(1 for ch in bad if not ch.isascii()) for _m, _r, bad, _g in SEGMENTS],
        id_col,
    )


def class_hits_const(pattern: str) -> list[int]:
    """Per-segment artifact-char hits of one census class — Python re
    over the frozen literals, a plan-time constant."""
    return [len(re.findall(pattern, bad)) for _m, _r, bad, _good in SEGMENTS]


# re.ASCII so \s matches ASCII whitespace only — Java regex (Spark)
# and RE2 (DuckDB) semantics; Python's default unicode \s would class
# U+3000 as whitespace and undercount the corrupted-segment tokens
_BPE_RE = re.compile(BPE_PATTERN, re.ASCII)

# per-segment BPE pre-token counts, corrupted vs normalized — plan
# constants; valid because no token spans the append junction (every
# segment starts space-class) and the regex is the shared frozen one
SEG_TOK_BAD = [len(_BPE_RE.findall(bad)) for _m, _r, bad, _g in SEGMENTS]
SEG_TOK_GOOD = [len(_BPE_RE.findall(good)) for _m, _r, _b, good in SEGMENTS]
