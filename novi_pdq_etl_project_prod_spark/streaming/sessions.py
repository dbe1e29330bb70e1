"""Custom stateful streaming operator: user sessionization via
``applyInPandasWithState`` (SURVEY.md §7.2 M6 stretch — the operator
class Spark's built-ins can't express: state is an open-ended gap-based
session, not a fixed window).

A session = consecutive events of one user with gaps < ``gap``.
State per user: (session_start, last_seen, n_events). When the event-time
watermark passes last_seen + gap, the session is emitted and state
cleared (timeout-driven emission — works even if the user never returns).

Scale notes: state lives in the state store keyed by user; shuffle
partitions bound store parallelism. Arrow batches carry each user's
events; peak memory is one group per batch, not one partition.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)

_GAP_US = 30 * 60 * 1_000_000  # 30-minute session gap


def _sessionize(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        start_us, last_us, n = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start_us, unit="us")],
                "session_end": [pd.Timestamp(last_us, unit="us")],
                "n_events": [n],
            }
        )
        return

    ts_us: list[int] = []
    for pdf in pdfs:
        ts_us.extend(int(t.value // 1000) for t in pdf["ts"])
    ts_us.sort()
    if state.exists:
        start_us, last_us, n = state.get
    else:
        start_us, last_us, n = ts_us[0], ts_us[0] - _GAP_US, 0

    closed = []
    for t in ts_us:
        if t - last_us >= _GAP_US and n > 0:
            closed.append((start_us, last_us, n))
            start_us, n = t, 0
        elif n == 0:
            start_us = t
        last_us = t
        n += 1
    state.update((start_us, last_us, n))
    state.setTimeoutTimestamp(last_us // 1000 + _GAP_US // 1000)
    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                "n_events": [c for _, _, c in closed],
            }
        )


def sessionize_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Gap-based sessions over a streaming events DataFrame."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch twin of ``sessionize_stream`` — pure DataFrame ops (lag +
    cumulative session ids), used as the oracle for the streaming path
    and as the 100 TB backfill path (no state store, one shuffle per
    window stage)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("user_id").orderBy("ts")
    gap_us = gap_minutes * 60 * 1_000_000
    marked = (
        events.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "new_session",
            (
                F.col("prev_ts").isNull()
                | (
                    (F.unix_micros("ts") - F.unix_micros("prev_ts"))
                    >= F.lit(gap_us)
                )
            ).cast("int"),
        )
        .withColumn("session_seq", F.sum("new_session").over(w))
    )
    return marked.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ).drop("session_seq")
