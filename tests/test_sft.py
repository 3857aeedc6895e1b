"""X231-X233 SFT conversation tier: the span theorem + planted
keeper/tie/filter fixtures.

The registered queries pin render/stats/dedup against the ≤4-turn
closed-form oracle; these pin (a) the span THEOREM — every loss span
cut from the rendered string is exactly its assistant turn's text —
on the real corpus (the X208 reassembly discipline), and (b) the
keeper tie rule and MIN_WORDS filter on planted conversations.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from gmall_spark.operators import sft
from gmall_spark.queries import QUERIES

_HYP = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

# arbitrary unicode turn texts (no surrogates), INCLUDING strings that
# look like template markers — offsets are by construction, so a turn
# containing '<|assistant|>' or a copy of another turn must not
# confuse them (the failure mode substring search would have)
_turn_text = st.text(
    alphabet=st.one_of(
        st.characters(blacklist_categories=("Cs",)),
        st.sampled_from(list("<|>iuser assistant end")),
    ),
    max_size=20,
)
_turns_strategy = st.lists(_turn_text, min_size=1, max_size=8)


@given(texts=_turns_strategy)
@settings(**_HYP)
def test_fold_matches_python_reference_general_n(spark, texts):
    """The general-n fold vs a plain Python renderer: rendered string
    and every assistant [start, end) span agree for ANY turn count
    (the oracle only exercises n <= 4), any unicode, and marker-like
    turn contents."""
    turns = [
        ("user" if i % 2 == 0 else "assistant", t)
        for i, t in enumerate(texts)
    ]
    # Python reference: render + offsets by construction
    rendered = sft.SYSTEM_PREFIX
    spans = []
    for role, txt in turns:
        hdr = sft.HDR_USER if role == "user" else sft.HDR_ASSISTANT
        start = len(rendered) + len(hdr)
        rendered += hdr + txt + sft.END
        if role == "assistant":
            spans.append(f"{start}:{start + len(txt)}")
    want_spans = ";".join(spans)

    df = spark.createDataFrame(
        [(turns,)],
        "turns array<struct<role:string,txt:string>>",
    )
    row = df.select(
        sft.rendered(F.col("turns")).alias("r"),
        sft.loss_spans(F.col("turns")).alias("s"),
    ).collect()[0]
    assert row.r == rendered
    assert row.s == want_spans
    asst_txts = [t for role, t in turns if role == "assistant"]
    for sp, txt in zip(spans, asst_txts):
        a, b = map(int, sp.split(":"))
        assert rendered[a:b] == txt


def test_span_theorem_on_corpus(spark, sf_dir):
    """substring(rendered, start+1, end-start) == the assistant
    turn's text, for EVERY span of EVERY conversation — offsets are
    correct by construction or not at all."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t = sft.turns(docs)
    rows = t.select(
        "doc_id",
        "n_turns",
        sft.rendered(F.col("turns")).alias("rendered"),
        sft.loss_spans(F.col("turns")).alias("spans"),
        F.col("turns").alias("turns"),
    ).collect()
    assert rows
    checked = 0
    for r in rows:
        asst_txts = [x["txt"] for x in r.turns if x["role"] == "assistant"]
        spans = [s.split(":") for s in r.spans.split(";")]
        assert len(spans) == len(asst_txts) == r.n_turns // 2
        for (s, e), want in zip(spans, asst_txts):
            s, e = int(s), int(e)
            assert r.rendered[s:e] == want, (r.doc_id, s, e)
            checked += 1
    assert checked > len(rows)  # 4-turn docs contribute two spans


def test_rendered_shape(spark):
    df = spark.createDataFrame(
        [(0, "q1 q2 a1 a2"), (1, "u1 u2 a1 a2 u3 u4 a2 a3")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r
        for r in sft.turns(df)
        .select(
            "doc_id",
            sft.rendered(F.col("turns")).alias("rendered"),
            sft.loss_spans(F.col("turns")).alias("spans"),
        )
        .collect()
    }
    assert got[0].rendered == (
        "<|system|>assistant ready<|end|>"
        "<|user|>q1 q2<|end|><|assistant|>a1 a2<|end|>"
    )
    # doc 1 is odd -> 4 turns of 2 words each
    assert got[1].rendered == (
        "<|system|>assistant ready<|end|>"
        "<|user|>u1 u2<|end|><|assistant|>a1 a2<|end|>"
        "<|user|>u3 u4<|end|><|assistant|>a2 a3<|end|>"
    )
    assert ";" in got[1].spans and ";" not in got[0].spans


def test_min_words_filter(spark):
    """A doc under MIN_WORDS words yields no conversation (a 4-turn
    derivation would emit empty turns)."""
    df = spark.createDataFrame(
        [(1, "a b c"), (3, "a b c d")], "doc_id long, text string"
    )
    got = sft.turns(df).select("doc_id").collect()
    assert [r.doc_id for r in got] == [3]


def test_keeper_prefers_longest_then_min_doc_id(spark, monkeypatch, sf_dir):
    """Planted prompt collision: three conversations share a prompt;
    the keeper is the longest assistant reply, and on an exact length
    tie the smaller doc_id."""
    from gmall_spark.queries_llm import sft_classifier as qllm

    planted = spark.createDataFrame(
        [
            # even doc_ids -> 2 turns; 8 words each so every prompt is
            # the same first-4-word slice "ask me this and"
            (100, "ask me this and tersely done x y"),
            (102, "ask me this and verbose answer here zz"),
            (104, "ask me this and verbose answer here yy"),  # tie w/ 102
        ],
        "doc_id long, text string",
    )
    monkeypatch.setattr(qllm, "_docs", lambda s, d: planted)
    rows = QUERIES["sft_prompt_dedup"](spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_convs == 3 and r.keeper_doc_id == 102
