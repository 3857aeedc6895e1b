"""Mojibake detection and repair (X229-X230).

The ftfy step of a web-corpus pipeline: text that was UTF-8 on the
wire but decoded as Latin-1/CP-1252 somewhere upstream carries
characteristic two- and three-character artifacts ('Ã©' where 'é'
was meant, 'â€™' where a right single quote was) that poison
tokenization, language ID, and dedup hashes alike — so the repair
runs BEFORE any of them. Reference tie: the dirty-data side output
at BaseLogApp.java:35-41 is the structural sibling (malformed
payloads detected and routed before the clean path).

Design per the repo's codec discipline: the repair table is FROZEN
(the six highest-frequency UTF-8-as-Latin-1/CP-1252 artifacts, each
printable so both engines handle the literals identically), and the
synthetic corruption appends deterministic mojibake segments chosen
by doc_id mods to each document — every pattern fires on a known
subset, some docs stay clean (the zero row is genuine, X173) — so
the repaired text has a CLOSED FORM the DuckDB oracle states without
running the repair. The original corpus is honestly ASCII, pinned by
an in-suite guard, so a pattern can never pre-exist its planting.

Repair is sequential single-pass replace per pattern. Order can't
matter: no replacement character ('é' 'ü' 'ñ' 'ï' '’' '“') occurs
inside any pattern, so a replace never creates a new match for a
later rule — documented here because that invariant IS what makes
the chain order-free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# frozen repair table: (artifact, intended character)
PATTERNS = (
    ("Ã©", "é"),
    ("Ã¼", "ü"),
    ("Ã±", "ñ"),
    ("Ã¯", "ï"),
    ("â€™", "’"),
    ("â€œ", "“"),
)

# deterministic corruption segments: (doc_id modulus, residue,
# corrupted segment, repaired segment)
SEGMENTS = (
    (3, 0, " cafÃ© rÃ©sumÃ©", " café résumé"),
    (4, 1, " Ã¼ber naÃ¯ve", " über naïve"),
    (5, 2, " el niÃ±o", " el niño"),
    (2, 0, " donâ€™t", " don’t"),
    (7, 3, " â€œquote start", " “quote start"),
)


def synth_mojibake(docs: DataFrame) -> DataFrame:
    """(doc_id, text, ...) → same with text carrying the
    deterministic corruption tail; pure per-row concat."""
    tail = F.concat(
        *[
            F.when(F.col("doc_id") % m == r, F.lit(bad)).otherwise(F.lit(""))
            for m, r, bad, _good in SEGMENTS
        ]
    )
    return docs.withColumn("text", F.concat(F.col("text"), tail))


def _sq(s: str) -> str:
    """Escape for a single-quoted SQL literal (defensive — the frozen
    table repairs to the TRUE characters, e.g. U+2019, never an ASCII
    apostrophe, so today nothing needs escaping)."""
    return s.replace("'", "''")


def synth_oracle_expr(text_col: str = "text", id_col: str = "doc_id") -> str:
    """DuckDB mirror of synth_mojibake's corrupted text."""
    parts = " || ".join(
        f"CASE WHEN {id_col} % {m} = {r} THEN '{_sq(bad)}' ELSE '' END"
        for m, r, bad, _good in SEGMENTS
    )
    return f"{text_col} || {parts}"


def repaired_oracle_expr(text_col: str = "text", id_col: str = "doc_id") -> str:
    """What the repair chain must produce, closed-form (the repaired
    segments appended — the oracle never runs a replace over the
    corpus)."""
    parts = " || ".join(
        f"CASE WHEN {id_col} % {m} = {r} THEN '{_sq(good)}' ELSE '' END"
        for m, r, _bad, good in SEGMENTS
    )
    return f"{text_col} || {parts}"


def repair(col: Column) -> Column:
    """The genuine repair chain: one replace per frozen pattern (the
    order-free invariant in the module docstring)."""
    out = col
    for bad, good in PATTERNS:
        out = F.replace(out, F.lit(bad), F.lit(good))
    return out


def pattern_count(col: Column, pattern: str) -> Column:
    """Occurrences of one artifact, measured from the text (the
    canary-scan length-diff idiom — no regex engine in the hot
    path)."""
    n = len(pattern)
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(pattern), F.lit(""))))
        / F.lit(n)
    ).cast("bigint")


def scan_and_repair(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document mojibake record: artifact count (measured), the
    repaired text's length and md5, and the changed flag. Per-row
    expressions end to end."""
    t = F.col(text_col)
    fixed = repair(t)
    n_bad = sum(
        (pattern_count(t, bad) for bad, _ in PATTERNS[1:]),
        pattern_count(t, PATTERNS[0][0]),
    )
    return docs.select(
        "doc_id",
        n_bad.alias("n_mojibake"),
        F.when(n_bad > 0, 1).otherwise(0).cast("bigint").alias("is_mojibake"),
        F.length(t).cast("bigint").alias("n_chars_before"),
        F.length(fixed).cast("bigint").alias("n_chars_after"),
        F.md5(fixed).alias("repaired_md5"),
    )
