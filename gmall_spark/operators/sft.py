"""SFT conversation-data tier (X231-X233).

The supervised-fine-tuning data prep a training pipeline runs after
pretraining curation: render multi-turn conversations through a
FROZEN chat template, compute the loss-mask spans (the character
ranges of assistant turns inside the rendered string — the loader
masks everything else out of the loss), roll up turn statistics, and
dedup conversations by prompt keeping the best response. Reference
tie: the 5-way log split at BaseLogApp.java:60-71 is the structural
sibling of the role split (one payload fanned into typed channels).

Conversations derive deterministically from documents (the repo's
synth-fixture discipline): a doc becomes a 2-turn (doc_id even) or
4-turn (doc_id odd) user/assistant alternation, each turn an equal
word-slice of the text (the last turn takes the remainder), so every
turn boundary — and therefore every rendered offset — has a CLOSED
FORM the DuckDB oracle states with ≤4-turn arithmetic while the
Spark side runs the GENERAL algorithm: one aggregate() fold over the
turn array maintaining (cursor, spans), exactly how a real template
renderer emits offsets (by construction during rendering, never by
searching the rendered string — substring search would bind to the
wrong occurrence when a turn repeats).

Frozen template:
  <|system|>assistant ready<|end|>
  then per turn: <|user|>TEXT<|end|> or <|assistant|>TEXT<|end|>
Span invariant (tested in-suite as a theorem, the X208 reassembly
discipline): substring(rendered, start+1, end-start) == the turn's
text for every span.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SYSTEM_PREFIX = "<|system|>assistant ready<|end|>"
END = "<|end|>"
HDR_USER = "<|user|>"
HDR_ASSISTANT = "<|assistant|>"
# the arithmetic constants the fold (and the oracle) use
C0 = len(SYSTEM_PREFIX)  # 32
H_USER = len(HDR_USER)  # 8
H_ASST = len(HDR_ASSISTANT)  # 13
H_END = len(END)  # 7

MIN_WORDS = 4  # a 4-turn conversation needs at least one word per turn


def turns(docs: DataFrame) -> DataFrame:
    """(doc_id, text, ...) → (doc_id, n_turns, turn array of
    (role, txt)): the deterministic doc→conversation derivation.
    Docs under MIN_WORDS words are dropped (both engines apply the
    same filter)."""
    words = F.split(F.col("text"), r"\s+")
    nw = F.size(words)
    n = (F.lit(2) + (F.col("doc_id") % 2) * 2).cast("int")
    k = (nw / n).cast("int")  # words per turn, remainder to the last
    turn_arr = F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda t: F.struct(
            F.when(t % 2 == 0, F.lit("user"))
            .otherwise(F.lit("assistant"))
            .alias("role"),
            F.array_join(
                F.slice(
                    words,
                    t * k + 1,
                    F.when(t < n - 1, k).otherwise(nw - (n - 1) * k),
                ),
                " ",
            ).alias("txt"),
        ),
    )
    return docs.filter(nw >= MIN_WORDS).select(
        "doc_id",
        *[c for c in docs.columns if c not in ("doc_id", "text")],
        n.cast("bigint").alias("n_turns"),
        turn_arr.alias("turns"),
    )


def rendered(turn_col: Column) -> Column:
    """The frozen template applied to a turn array — one fold."""
    return F.concat(
        F.lit(SYSTEM_PREFIX),
        F.aggregate(
            turn_col,
            F.lit(""),
            lambda acc, t: F.concat(
                acc,
                F.lit("<|"),
                t["role"],
                F.lit("|>"),
                t["txt"],
                F.lit(END),
            ),
        ),
    )


def loss_spans(turn_col: Column) -> Column:
    """Assistant-turn [start, end) character offsets in the rendered
    string, emitted 'start:end;start:end'. ONE aggregate() fold
    maintaining (cursor, spans) — offsets by construction, the
    general-n_turns algorithm."""
    acc0 = F.struct(
        F.lit(C0).cast("long").alias("pos"), F.lit("").alias("spans")
    )
    hdr = lambda t: F.when(  # noqa: E731
        t["role"] == "user", F.lit(H_USER)
    ).otherwise(F.lit(H_ASST))
    folded = F.aggregate(
        turn_col,
        acc0,
        lambda acc, t: F.struct(
            (acc["pos"] + hdr(t) + F.length(t["txt"]) + H_END).alias("pos"),
            F.when(
                t["role"] == "assistant",
                F.concat(
                    acc["spans"],
                    F.when(acc["spans"] == "", F.lit("")).otherwise(
                        F.lit(";")
                    ),
                    (acc["pos"] + hdr(t)).cast("string"),
                    F.lit(":"),
                    (acc["pos"] + hdr(t) + F.length(t["txt"])).cast(
                        "string"
                    ),
                ),
            )
            .otherwise(acc["spans"])
            .alias("spans"),
        ),
    )
    return folded["spans"]


def render_records(docs: DataFrame) -> DataFrame:
    """Per-conversation training record: the rendered string's size
    and md5, the loss-mask spans, and the assistant-char volume the
    loss actually sees."""
    t = turns(docs)
    r = rendered(F.col("turns"))
    asst = F.aggregate(
        F.col("turns"),
        F.lit(0).cast("long"),
        lambda acc, x: acc
        + F.when(x["role"] == "assistant", F.length(x["txt"])).otherwise(
            F.lit(0)
        ),
    )
    return t.select(
        "doc_id",
        "n_turns",
        F.length(r).cast("bigint").alias("n_rendered_chars"),
        F.md5(r).alias("rendered_md5"),
        loss_spans(F.col("turns")).alias("loss_spans"),
        asst.cast("bigint").alias("n_assistant_chars"),
    )


# --- oracle closed forms ------------------------------------------------------


def turns_oracle_cte(id_col: str = "doc_id", text_col: str = "text") -> str:
    """DuckDB CTE 'conv': per doc the ≤4 turn texts (t0..t3, NULL
    where absent) via list slicing — the synthesis closed form."""
    return f"""
WITH w AS (
  SELECT {id_col} AS doc_id, lang,
         string_split_regex({text_col}, '\\s+') AS ws
  FROM documents
), conv AS (
  SELECT doc_id, lang,
         len(ws) AS nw,
         CAST(2 + (doc_id % 2) * 2 AS BIGINT) AS n_turns,
         len(ws) // (2 + (doc_id % 2) * 2) AS k,
         ws
  FROM w WHERE len(ws) >= {MIN_WORDS}
), tt AS (
  SELECT doc_id, lang, n_turns,
         array_to_string(ws[1 : k], ' ') AS t0,
         CASE WHEN n_turns = 2
              THEN array_to_string(ws[k + 1 : nw], ' ')
              ELSE array_to_string(ws[k + 1 : 2 * k], ' ') END AS t1,
         CASE WHEN n_turns = 4
              THEN array_to_string(ws[2 * k + 1 : 3 * k], ' ') END AS t2,
         CASE WHEN n_turns = 4
              THEN array_to_string(ws[3 * k + 1 : nw], ' ') END AS t3
  FROM conv
)
"""
