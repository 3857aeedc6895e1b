"""X222-X224 byte-fallback BPE: Python-reference identity under
hypothesis (arbitrary unicode words), the total-decode round-trip
theorem, and the zero-OOV contrast to WordPiece."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F  # noqa: F401

from gmall_spark.operators import bpe
import pytest


def py_byte_units(word: str) -> list[str]:
    units = []
    for c in word:
        b = c.encode("utf-8")
        if len(b) == 1:
            units.append(c)
        else:
            units.extend(f"<0x{x:02X}>" for x in b)
    return units


def py_byte_encode(word: str, merges=bpe.BYTE_MERGES) -> list[str]:
    toks = py_byte_units(word)
    for l, r in merges:
        out: list[str] = []
        for t in toks:
            if out and out[-1] == l and t == r:
                out[-1] = l + r
            else:
                out.append(t)
        toks = out
    return toks


def py_byte_decode(tokens: list[str]) -> str:
    import re

    hx = ""
    for t in tokens:
        if re.fullmatch(r"(<0x[0-9A-F]{2}>)+", t):
            hx += t.replace("<0x", "").replace(">", "")
        else:
            hx += t.encode("utf-8").hex().upper()
    return bytes.fromhex(hx).decode("utf-8")


words = st.text(
    alphabet=st.characters(blacklist_categories=["Cs"]), min_size=1, max_size=12
)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture])
@given(ws=st.lists(words, min_size=1, max_size=8))
@pytest.mark.slow
def test_bytebpe_matches_python_and_roundtrips(spark, ws):
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(ws)], "i long, w string"
    )
    enc = bpe.byte_encode_expr_spark("w")
    dec = bpe.byte_decode_expr_spark(f"({enc})")
    rows = df.selectExpr("i", "w", f"{enc} AS e", f"({dec}) AS d").collect()
    for r in rows:
        want = py_byte_encode(ws[r.i])
        assert r.e == want, (ws[r.i], r.e, want)
        assert r.d == ws[r.i], (ws[r.i], r.d)       # total decode: round-trip
        assert py_byte_decode(want) == ws[r.i]


def test_bytebpe_zero_oov_vs_wordpiece(spark):
    """The planted coverage contrast (the X206 gap): a word outside
    WordPiece's alphabet UNKs; byte-BPE encodes and round-trips it."""
    from gmall_spark.operators import wordpiece as wp

    word = "café"  # é is outside the [a-z0-9] WordPiece alphabet
    df = spark.createDataFrame([(word,)], "w string")
    enc = bpe.byte_encode_expr_spark("w")
    dec = bpe.byte_decode_expr_spark(f"({enc})")
    wpk = wp.wordpiece_key_expr_spark("w")
    r = df.selectExpr(
        f"{enc} AS e", f"({dec}) AS d", f"substring({wpk}, 8) AS wp"
    ).collect()[0]
    assert r.wp == wp.UNK            # WordPiece refuses the word
    assert r.d == word               # byte-BPE round-trips it
    assert "<0xC3><0xA9>" in r.e     # ...and the learned byte merge fired


def test_byte_merge_greedy_non_overlap(spark):
    """'éé' exercises the (0xC3,0xA9)(0xC3,0xA9) adjacency: the
    greedy fold must merge each pair within its own character, never
    across the character boundary (0xA9,0xC3)."""
    df = spark.createDataFrame([("éé",)], "w string")
    r = df.selectExpr(
        f"{bpe.byte_encode_expr_spark('w')} AS e"
    ).collect()[0]
    assert r.e == ["<0xC3><0xA9>", "<0xC3><0xA9>"], r.e
