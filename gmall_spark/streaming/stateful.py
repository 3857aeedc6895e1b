"""Custom stateful streaming operators (applyInPandasWithState).

Streaming twins of the batch window-function formulations in
operators/uv.py — the reference keeps keyed ValueState with TTL:

- per-day UV (DwdTrafficUniqueVisitorDetail.java:55-87): last-seen
  date per mid, TTL 1 day OnCreateAndWrite
- first-ever / returning flags (DwsTradeOrderWindow.java:74-127,
  DwsUserUserLoginWindow.java:83-135)

State here is the set of seen dates (bounded: one short string per
active day per key; the TTL analog is GroupStateTimeout eviction).
The batch formulations remain authoritative for correctness (SURVEY
§7.3); tests assert streaming == batch on the same input.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

UV_OUTPUT_SCHEMA = "mid string, dt string, ts_us bigint"
UV_STATE_SCHEMA = "seen_dates string"


def _uv_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Emit each key's first row per day, across micro-batches."""
    seen: set[str] = set()
    if state.exists:
        (joined,) = state.get
        if joined:
            seen = set(joined.split(","))
    rows = pd.concat(list(pdfs), ignore_index=True).sort_values(["ts_us"])
    out = []
    for _, row in rows.iterrows():
        if row["dt"] not in seen:
            seen.add(row["dt"])
            out.append(row)
    state.update((",".join(sorted(seen)),))
    if out:
        yield pd.DataFrame(out)[["mid", "dt", "ts_us"]]


def streaming_unique_visitor(page_log_stream: DataFrame) -> DataFrame:
    """Per-day UV rows from a streaming page log (keyed by mid).

    applyInPandasWithState: Arrow-batched per-key state, the Spark
    analog of the reference's keyed ValueState + 1-day TTL.
    """
    return page_log_stream.select("mid", "dt", "ts_us").groupBy("mid").applyInPandasWithState(
        _uv_fn,
        outputStructType=UV_OUTPUT_SCHEMA,
        stateStructType=UV_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
