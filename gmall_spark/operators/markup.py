"""HTML/markup main-text extraction (X215-X217).

The WARC→WET step every web-scale corpus runs before any text
operator sees a byte: strip script/style/comment blocks, strip tags,
decode entities, collapse whitespace — leaving the visible text plus
per-document extraction stats. Reference tie: the schema-on-read JSON
envelope parse at gmall-realtime/app/BaseLogApp.java:43-53 is this
step's structured sibling (both turn a transport envelope into the
typed payload downstream operators consume).

Design per the repo's codec discipline (operators/multimodal.py WAV/
BMP/PNG/AVI): a deterministic synthetic HTML corpus wraps each
document's text in real markup (nested tags, quoted-'>' attributes,
script/style blocks with pathological contents, comments with fake
tags, single- and double-escaped entities), so the extraction output
has a CLOSED FORM the DuckDB oracle states without parsing HTML —
extraction(synth(text)) == known boilerplate + whitespace-normalized
text. Robustness beyond the synth corpus (unterminated tags/comments,
scripts containing '</div>' strings, empty input) is pinned by planted
fixtures in tests/test_markup_extract.py.

Everything is per-row JVM regex/replace expressions: zero shuffle,
zero UDF, scan → project. At 100 TB this is the map-only stage in
front of the quality/dedup chain, and it composes there unchanged
(text_html_quality_recheck runs the X-family quality scorer over the
extracted relation).

Rule order (each applied once, documented because order is the
semantics):
  1. <script ...> ... </script> blocks dropped (case-insensitive,
     dot-all, non-greedy — a '</div>' inside a JS string goes with
     the script; the '<' in ``if (n < 99)`` never reaches the tag
     pass)
  2. <style ...> ... </style> blocks dropped (same)
  3. any unterminated <script/<style opened but never closed is
     dropped to end-of-input (corrupt-tail grace, the X173/X212
     corrupt-blob discipline)
  4. <!-- ... --> comments dropped (fake tags inside go with them),
     then any unterminated <!-- to end-of-input
  5. remaining tags stripped, quote-aware: <(?:"..."|'...'|[^'">])*>
     — a quoted '>' inside an attribute does NOT terminate the tag;
     then one unterminated trailing '<...' to end-of-input
  6. entities decoded AFTER tag stripping (so '&lt;ok&gt;' yields
     literal '<ok>' text instead of a strippable fake tag): &lt; &gt;
     &quot; &#39; &nbsp; first, &amp; LAST — decoding is single-pass,
     so the double-escaped '&amp;lt;' correctly yields literal '&lt;'
  7. whitespace runs collapse to one space (every dropped block left
     a space, so words never fuse across tag boundaries), then trim
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --- synthesis --------------------------------------------------------------

# Per-document markup layout (all closed-form in doc_id so the oracle
# can restate it in SQL):
#   head: title 'doc {id}', one style block, one script block, plus a
#         SECOND script when doc_id is odd (both branches fire, X173)
#   body: one comment (plus a second when doc_id % 3 == 0), an
#         attribute carrying a quoted '>', h1 'doc {id}', the
#         html-escaped document text, an entity exercise sentence
#         (incl. the double-escape '&amp;lt;'), a footer
_ENTITY_SENTENCE = "tom &amp; jerry &lt;3 &quot;quotes&quot;&nbsp;&amp;lt;ok&gt;"
# what rule 6 leaves of the sentence above
ENTITY_SENTENCE_TEXT = 'tom & jerry <3 "quotes" &lt;ok>'


def synth_html(docs: DataFrame) -> DataFrame:
    """(doc_id, text) → (doc_id, html): deterministic real-markup
    wrapper; pure per-row concat expressions."""
    i = F.col("doc_id").cast("string")
    esc = F.replace(
        F.replace(
            F.replace(F.col("text"), F.lit("&"), F.lit("&amp;")),
            F.lit("<"),
            F.lit("&lt;"),
        ),
        F.lit(">"),
        F.lit("&gt;"),
    )
    html = F.concat(
        F.lit("<!DOCTYPE html><html><head><title>doc "),
        i,
        F.lit("</title><style media=\"all\">body { margin: 0; }</style>"),
        F.lit("<script type=\"text/javascript\">var n = "),
        i,
        F.lit("; if (n < 99) { n = n + 1; }</script>"),
        F.when(
            F.col("doc_id") % 2 == 1,
            F.lit("<script>var t = \"a>b</p>\";</script>"),
        ).otherwise(F.lit("")),
        F.lit("</head><body><!-- build "),
        i,
        F.lit(" <nav> skipped -->"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("<!-- promo -->")).otherwise(
            F.lit("")
        ),
        F.lit("<div class=\"main\" data-x=\"1>0\"><h1>doc "),
        i,
        F.lit("</h1><p>"),
        esc,
        F.lit("</p><p>" + _ENTITY_SENTENCE + "</p></div>"),
        F.lit("<footer>footer boilerplate</footer></body></html>"),
    )
    return docs.select("doc_id", html.alias("html"))


def synth_html_oracle_expr(text_col: str = "text", id_col: str = "doc_id") -> str:
    """The DuckDB expression mirroring synth_html (string concat +
    replaces — the synthesis closed form, restated so the oracle can
    measure raw length / count blocks without parsing)."""
    esc = (
        f"replace(replace(replace({text_col}, '&', '&amp;'),"
        " '<', '&lt;'), '>', '&gt;')"
    )
    return (
        "'<!DOCTYPE html><html><head><title>doc ' || {i} || "
        "'</title><style media=\"all\">body {{ margin: 0; }}</style>"
        "<script type=\"text/javascript\">var n = ' || {i} || "
        "'; if (n < 99) {{ n = n + 1; }}</script>' || "
        "CASE WHEN {id} % 2 = 1 THEN "
        "'<script>var t = \"a>b</p>\";</script>' ELSE '' END || "
        "'</head><body><!-- build ' || {i} || ' <nav> skipped -->' || "
        "CASE WHEN {id} % 3 = 0 THEN '<!-- promo -->' ELSE '' END || "
        "'<div class=\"main\" data-x=\"1>0\"><h1>doc ' || {i} || "
        "'</h1><p>' || {esc} || "
        "'</p><p>{sentence}</p></div>"
        "<footer>footer boilerplate</footer></body></html>'"
    ).format(
        i=f"CAST({id_col} AS VARCHAR)",
        id=id_col,
        esc=esc,
        sentence=_ENTITY_SENTENCE,
    )


def extracted_text_oracle_expr(
    text_col: str = "text", id_col: str = "doc_id"
) -> str:
    """The DuckDB expression for what extraction must recover from
    the synth corpus: title + h1 ('doc {id}' twice), the
    whitespace-normalized document text, the decoded entity
    sentence, the footer."""
    sent = ENTITY_SENTENCE_TEXT.replace("'", "''").replace('"', '"')
    return (
        f"'doc ' || CAST({id_col} AS VARCHAR) || ' doc ' || "
        f"CAST({id_col} AS VARCHAR) || ' ' || "
        f"trim(regexp_replace({text_col}, '\\s+', ' ', 'g')) || "
        f"' {sent} footer boilerplate'"
    )


# --- extraction -------------------------------------------------------------

# quote-aware tag interior: attribute values may carry '>'
_TAG_BODY = "(?:\"[^\"]*\"|'[^']*'|[^'\">])*"

# (pattern, replacement) in application order; every drop leaves a
# space so words never fuse across removed blocks
_STRIP_RULES = (
    (r"(?is)<script\b" + _TAG_BODY + r">.*?</script\s*>", " "),
    (r"(?is)<style\b" + _TAG_BODY + r">.*?</style\s*>", " "),
    (r"(?is)<(?:script|style)\b.*$", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"(?s)<!--.*$", " "),
    ("<" + _TAG_BODY + ">", " "),
    ("<" + _TAG_BODY + "$", " "),
)

# decoded AFTER tag stripping; &amp; LAST so '&amp;lt;' single-decodes
# to literal '&lt;'
_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def html_to_text(col: Column) -> Column:
    """Visible-text extraction: the rule chain in the module
    docstring, as one per-row JVM expression tree."""
    out = col
    for pat, rep in _STRIP_RULES:
        out = F.regexp_replace(out, pat, rep)
    for ent, ch in _ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def html_extract(blobs: DataFrame) -> DataFrame:
    """(doc_id, html) → per-document extraction record: the extracted
    text plus the stats a WET job audits (raw vs text size, share,
    stripped-block counts). Counts are measured from the markup
    itself (regexp_count), not assumed from synthesis."""
    return blobs.select(
        "doc_id",
        html_to_text(F.col("html")).alias("text"),
        F.length("html").cast("bigint").alias("n_raw_chars"),
        F.regexp_count(F.col("html"), F.lit(r"(?is)<script\b")).cast(
            "bigint"
        ).alias("n_scripts"),
        F.regexp_count(F.col("html"), F.lit("<!--")).cast("bigint").alias(
            "n_comments"
        ),
    ).select(
        "doc_id",
        "text",
        "n_raw_chars",
        F.length("text").cast("bigint").alias("n_text_chars"),
        F.round(F.length("text") / F.col("n_raw_chars"), 6).alias(
            "text_share"
        ),
        "n_scripts",
        "n_comments",
        F.md5("text").alias("text_md5"),
    )
