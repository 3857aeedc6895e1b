"""X229-X230 mojibake repair: planted fixtures + invariants.

The registered queries pin repair(synth(text)) against the closed
form; these pin the repair chain on strings the synth corpus does
NOT produce, the order-free invariant the module docstring claims,
and the ASCII-corpus precondition the closed form rests on.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gmall_spark.operators import mojibake as M

CASES = [
    # (corrupted, repaired)
    ("cafÃ©", "café"),
    ("rÃ©sumÃ©", "résumé"),  # two artifacts in one word
    ("Ã¼ber", "über"),
    ("naÃ¯ve", "naïve"),
    ("el niÃ±o", "el niño"),
    ("donâ€™t", "don’t"),
    ("â€œquote", "“quote"),
    # shared 'â€' prefix: each 3-char artifact binds to ITS pattern
    ("â€œaâ€™b", "“a’b"),
    # adjacent artifacts, no gap
    ("Ã©Ã©Ã©", "ééé"),
    # a bare 'Ã' or 'â€' with no completing byte is NOT an artifact
    ("Ã x", "Ã x"),
    ("â€x", "â€x"),
    # clean text untouched
    ("plain ascii text", "plain ascii text"),
    ("", ""),
]


def test_repair_planted(spark):
    df = spark.createDataFrame(
        [(i, c) for i, (c, _) in enumerate(CASES)], "i long, t string"
    )
    got = {
        r.i: r.fixed
        for r in df.select("i", M.repair(F.col("t")).alias("fixed")).collect()
    }
    for i, (corrupted, want) in enumerate(CASES):
        assert got[i] == want, (corrupted, got[i], want)


def test_patterns_are_genuine_cp1252_artifacts():
    """The frozen table is the REAL decode error, not an invented
    lookalike: every artifact is exactly its intended character's
    UTF-8 bytes re-decoded as CP-1252 (Latin-1's superset — the
    Windows default the classic mojibake pipeline went through)."""
    for bad, good in M.PATTERNS:
        assert bad == good.encode("utf-8").decode("cp1252"), (bad, good)


def test_order_free_invariant():
    """The docstring's claim, checked statically: no replacement
    character occurs inside any artifact pattern, so the replace
    chain can never create a new match for a later (or earlier)
    rule."""
    for _, good in M.PATTERNS:
        for bad, _ in M.PATTERNS:
            assert good not in bad, (good, bad)


def test_corpus_is_honestly_ascii(spark, sf_dir):
    """The closed-form oracle rests on artifacts never pre-existing
    the planting: the real corpus must carry none of the frozen
    patterns (and none of their 'Ã'/'â' lead bytes at all)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.filter(
        F.col("text").rlike("[^\\x00-\\x7f]")
    ).count()
    assert n == 0


def test_repair_idempotent_on_synth(spark, sf_dir):
    """repair(repair(x)) == repair(x) over the synth corruption —
    a second pass finds nothing (the artifacts are gone and the
    replacements can't recombine into one)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    c = M.synth_mojibake(docs).select(M.repair(F.col("text")).alias("once"))
    n = c.filter(M.repair(F.col("once")) != F.col("once")).count()
    assert n == 0


def test_pattern_count_measures(spark):
    df = spark.createDataFrame(
        [(0, "Ã©Ã© and Ã© donâ€™t")], "i long, t string"
    )
    row = df.select(
        M.pattern_count(F.col("t"), "Ã©").alias("e"),
        M.pattern_count(F.col("t"), "â€™").alias("q"),
        M.pattern_count(F.col("t"), "Ã±").alias("z"),
    ).collect()[0]
    assert (row.e, row.q, row.z) == (3, 1, 0)


# --- X258 unicode NFKC-lite tier (the mojibake sibling) -----------------------


def test_unicode_normalize_planted(spark):
    """The genuine chain on crafted inputs: every rule class folds to
    its documented ASCII form, idempotently (normalizing normalized
    text is the identity — the order-free invariant's corollary)."""
    from gmall_spark.operators import unicode_norm as UN

    cases = [
        ("ﬁn ﬂat oﬀ", "fin flat off"),
        ("ＮＡＳＡ ｘ３２", "nasa x32"),
        ("don’t ‘a’ “b” c…", "don't 'a' \"b\" c..."),
        ("a–b—c", "a-b-c"),
        ("x　y z", "x y z"),
        ("already ascii 123", "already ascii 123"),
    ]
    df = spark.createDataFrame(cases, "raw string, want string")
    out = df.select(
        "raw",
        "want",
        UN.normalize(F.col("raw")).alias("got"),
        UN.normalize(UN.normalize(F.col("raw"))).alias("got2"),
    ).collect()
    for r in out:
        assert r.got == r.want, (r.raw, r.got)
        assert r.got2 == r.want, ("idempotence", r.raw)


def test_unicode_order_free_invariant():
    """No replacement output contains any pattern char (all outputs
    ASCII, all patterns non-ASCII) — the chain-commutes invariant."""
    from gmall_spark.operators import unicode_norm as UN

    for bad, good in UN.REPLACES:
        assert not bad.isascii() and good.isascii(), (bad, good)
    for src, dst in zip(UN.TRANSLATE_SRC, UN.TRANSLATE_DST):
        assert not src.isascii() and dst.isascii(), (src, dst)
    # census classes cover every rule char; 'separator' matches none
    import re

    classes = [(n, re.compile(p)) for n, p in UN.CLASSES]
    for src in UN.TRANSLATE_SRC + "".join(b for b, _ in UN.REPLACES):
        hits = [n for n, p in classes if p.search(src)]
        assert hits and "separator" not in hits, (src, hits)


def test_unicode_rollup_zero_class_is_genuine(spark, sf_dir):
    """The 'separator' census row must be present with ZERO hits (the
    planted never-fires entry — X173), and every other class must fire
    somewhere on the synth corpus."""
    from gmall_spark.queries import QUERIES

    rows = {r.rule_class: r for r in
            QUERIES["text_unicode_rollup"](spark, sf_dir).collect()}
    assert rows["separator"].n_hits == 0 and rows["separator"].n_docs == 0
    for name in ("ligature", "fullwidth_alpha", "fullwidth_digit",
                 "wide_space", "quote", "dash", "ellipsis"):
        assert rows[name].n_hits > 0, name


def test_unicode_fertility_delta_direction(spark, sf_dir):
    """Normalization can only SHRINK the pre-token stream on this
    corpus (every fold merges fragments); the ratio is >= 1 for every
    lang and > 1 overall."""
    from gmall_spark.queries import QUERIES

    rows = QUERIES["text_unicode_fertility_delta"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.tokens_saved >= 0 and r.fertility_ratio >= 1.0, r
    assert sum(r.tokens_saved for r in rows) > 0
