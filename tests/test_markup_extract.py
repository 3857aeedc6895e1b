"""X215-X217 HTML/markup extraction: planted rule-by-rule fixtures.

The registered queries pin extraction(synth(text)) against the
closed-form oracle; these fixtures pin the extractor's behavior on
markup the synth corpus does NOT produce (unterminated blocks,
scripts containing closing tags of OTHER elements, empty input),
one planted case per documented rule in operators/markup.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gmall_spark.operators import markup as M

CASES = [
    # (html, expected extracted text)
    # rule 1: script dropped; a '</div>' inside a JS string goes with
    # it, and the '<' in the comparison never reaches the tag pass
    ('a<script>var s = "</div>"; if (1 < 2) x();</script>b', "a b"),
    # rule 1 terminator: '</p>' inside the script does NOT end it
    ("<p>x</p><script>s = '</p>';</script>y", "x y"),
    # rule 2: style dropped wholly, braces and all
    ("a<style type=\"text/css\">p { color: #fff; }</style>b", "a b"),
    # rule 3: unterminated script dropped to end-of-input
    ("keep<script>var x = 1;", "keep"),
    ("keep<style>p {", "keep"),
    # rule 4: comments dropped, fake tags inside go with them;
    # unterminated comment dropped to end-of-input
    ("a<!-- <div>fake</div> -->b", "a b"),
    ("a<!-- never closed <p>", "a"),
    # rule 5: quote-aware tag strip — a quoted '>' does not terminate
    ('<div data-x="1>0">in</div>', "in"),
    ("<div data-x='1>0'>in</div>", "in"),
    # rule 5: unterminated trailing tag dropped
    ("text<div class=", "text"),
    # rule 6: entities decode AFTER tag strip — '&lt;ok&gt;' is
    # literal text, never a strippable tag; '&amp;lt;' single-decodes
    ("&lt;ok&gt;", "<ok>"),
    ("&amp;lt;", "&lt;"),
    ("tom &amp; jerry", "tom & jerry"),
    ("it&#39;s", "it's"),
    ("a&nbsp;b", "a b"),
    ('&quot;q&quot;', '"q"'),
    # rule 7: whitespace collapse + trim; dropped blocks leave spaces
    # so words never fuse across tag boundaries
    ("<p>a</p><p>b</p>", "a b"),
    ("  a \t\n b  ", "a b"),
    # degenerate inputs
    ("", ""),
    ("plain text, no markup", "plain text, no markup"),
]


def test_extraction_rules_planted(spark):
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(CASES)], "doc_id long, html string"
    )
    got = {
        r.doc_id: r.t
        for r in df.select(
            "doc_id", M.html_to_text(F.col("html")).alias("t")
        ).collect()
    }
    for i, (html, want) in enumerate(CASES):
        assert got[i] == want, (html, got[i], want)


def test_synth_extract_closed_form(spark):
    """extraction(synth(text)) == 'doc I doc I' + normalized text +
    decoded entity sentence + footer — the oracle's closed form, on
    ids exercising both the odd-script and %3-comment branches."""
    rows = [(i, f"w{i} alpha beta") for i in range(7)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in M.html_extract(M.synth_html(docs)).collect()}
    for i, text in rows:
        want = (
            f"doc {i} doc {i} {text} "
            + M.ENTITY_SENTENCE_TEXT
            + " footer boilerplate"
        )
        r = out[i]
        assert r.text == want, (i, r.text, want)
        assert r.n_scripts == 1 + i % 2
        assert r.n_comments == 1 + (1 if i % 3 == 0 else 0)
        assert r.n_text_chars == len(want)
        assert r.n_raw_chars > r.n_text_chars


def test_synth_escape_round_trip(spark):
    """Text containing markup-significant chars survives synth →
    extract unchanged (escaping and post-strip decoding are exact
    inverses), including text that LOOKS like an entity."""
    rows = [
        (0, 'a < b > c & d "q"'),
        (1, "already &lt; escaped &amp; text"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.text for r in M.html_extract(M.synth_html(docs)).collect()}
    for i, text in rows:
        assert out[i].startswith(f"doc {i} doc {i} {text} "), (i, out[i])
