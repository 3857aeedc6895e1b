"""Sessionization + user-jump (bounce) detection.

Replaces the reference's Flink CEP pattern
(DwdTrafficUserJumpDetail.java:62-101, SURVEY T5): two consecutive
session-start events (``last_page_id IS NULL``) within 10 s per mid ⇒
the first is a "jump"; the timeout side-output also emits a lone
session start. Spark has no CEP, but the pattern is order-2 with a
time bound, so ``lead()`` over (mid, ts) expresses it exactly:

    jump(e) := session_start(e) AND
               (no successor | successor gap > 10 s | successor is
                itself a session start)

Gap comparison is on microseconds; a successor at exactly +10 s counts
as "within" (CEP ``within`` is inclusive of the window interior; exact
boundary equality is measure-zero at micro precision).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def detect_jumps(
    page_log: DataFrame,
    key: str = "mid",
    ts_us_col: str = "ts_us",
    session_start_col: str = "is_session_start",
    within_us: int = 10_000_000,
    tiebreak: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Rows of ``page_log`` that are jumps (bounces).

    One shuffle on ``key``; lead() runs in-partition. The streaming
    twin (event-time timeout) lives in streaming/stateful.
    ``tiebreak`` makes ordering deterministic for equal timestamps.
    """
    w = Window.partitionBy(key).orderBy(
        F.col(ts_us_col).asc(), *[F.col(c).asc() for c in tiebreak]
    )
    nxt_ts = F.lead(ts_us_col).over(w)
    nxt_start = F.lead(session_start_col).over(w)
    return (
        page_log.withColumn("__nxt_ts", nxt_ts)
        .withColumn("__nxt_start", nxt_start)
        .filter(
            (F.col(session_start_col) == 1)
            & (
                F.col("__nxt_ts").isNull()
                | (F.col("__nxt_ts") - F.col(ts_us_col) > within_us)
                | (F.col("__nxt_start") == 1)
            )
        )
        .drop("__nxt_ts", "__nxt_start")
    )
