"""Streaming state-store bound evidence (VERDICT r02 item 4).

Correctness of the stateful streaming operators is already certified via
batch twins; what those tests can't show is that state stays BOUNDED when
the stream runs long — i.e. that a 100 TB replay doesn't accrete state
until executors OOM. These tests replay a multi-day event history in
chronological micro-batches and read the state-store row counts the engine
actually reports (``StreamingQueryProgress.stateOperators``), pinning:

1. steady-state rows stay within the watermark-horizon's share of the
   input (watermark eviction works), and
2. state at end-of-replay is no larger than mid-replay (flat, not
   linearly growing).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from novi_pdq_etl_project_prod_spark.streaming.events import (
    click_purchase_attribution,
    read_event_stream,
    session_window_rollup,
    streaming_dedup,
)

#: Replay shape: N_HOURS of history, EVENTS_PER_HOUR uniformly spaced,
#: split into N_CHUNKS chronological files (one micro-batch each).
N_HOURS = 240  # 10 days
EVENTS_PER_HOUR = 60
N_EVENTS = N_HOURS * EVENTS_PER_HOUR
N_CHUNKS = 8
EPOCH0 = 1_700_000_000  # fixed, deterministic


def _event_history(spark):
    """Uniform event stream: 50 users, 2/3 clicks, 1/3 purchases."""
    sec_per_event = 3600.0 * N_HOURS / N_EVENTS
    return spark.range(N_EVENTS).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(
            F.lit(EPOCH0) + (F.col("id") * F.lit(sec_per_event)).cast("long")
        ).alias("ts"),
        (F.col("id") % 50).alias("user_id"),
        F.when(F.col("id") % 3 == 0, F.lit("purchase"))
        .otherwise(F.lit("click"))
        .alias("event_type"),
        (F.col("id") % 97).cast("double").alias("value"),
        F.lit("{}").alias("props"),
    )


def _write_chunks(spark, path: str) -> None:
    """Write the history as N_CHUNKS files with strictly increasing
    mtimes, so the file stream source (which orders by modification time)
    replays them chronologically."""
    hist = _event_history(spark)
    per = N_EVENTS // N_CHUNKS
    for c in range(N_CHUNKS):
        chunk = hist.where(
            (F.col("event_id") >= c * per) & (F.col("event_id") < (c + 1) * per)
        )
        chunk.coalesce(1).write.mode("append").parquet(path)
        # bump every file's mtime monotonically (rewrites touch _SUCCESS
        # etc.; only ordering among data files matters)
        now = time.time()
        for dp, _dn, fs in os.walk(path):
            for f in fs:
                full = os.path.join(dp, f)
                if os.path.getmtime(full) > now - 0.5:
                    os.utime(full, (now + c, now + c))


def _replay(spark, df_fn, path, chk, name, output_mode="append"):
    """Run a stateful query over the chunked history, one file per
    micro-batch, and return the per-batch state-operator row counts."""
    stream = read_event_stream(spark, path, max_files_per_trigger=1)
    q = (
        df_fn(stream)
        .writeStream.format("noop")
        .outputMode(output_mode)
        .option("checkpointLocation", chk)
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows_per_batch = []
    for p in q.recentProgress:
        ops = p["stateOperators"] if isinstance(p, dict) else p.stateOperators
        if ops:
            rows_per_batch.append(sum(int(o["numRowsTotal"]) for o in ops))
    assert len(rows_per_batch) >= N_CHUNKS - 1, "expected one progress per chunk"
    return rows_per_batch


def _assert_bounded(state_rows, horizon_hours: float, slack: float) -> None:
    """Steady-state state ≤ one trigger's ingest + slack × the watermark
    horizon, and flat across the replay.

    The watermark only advances BETWEEN micro-batches, so within a batch
    the full chunk lands in state before the next batch evicts — the true
    state bound of a Spark stateful op is f(watermark horizon, per-trigger
    ingest), both independent of total stream length. Accretion (the
    failure mode this test exists to catch) would show the tail of
    ``state_rows`` climbing by ~chunk_rows per batch instead of cycling.
    """
    chunk_rows = N_EVENTS // N_CHUNKS
    horizon_rows = EVENTS_PER_HOUR * horizon_hours
    steady = state_rows[len(state_rows) // 2 :]
    bound = chunk_rows + horizon_rows * slack
    assert max(steady) <= bound, (
        f"state exceeds one-trigger ingest + watermark horizon: {state_rows} "
        f"(bound {bound} rows)"
    )
    # linear accretion across batches would roughly double this
    assert state_rows[-1] <= bound and max(steady) < N_EVENTS / 4, (
        f"state accreting across the replay: {state_rows}"
    )
    # and eviction must actually drain to the horizon floor between
    # ingests — otherwise "bounded" just means "hasn't blown up yet"
    assert min(steady) <= horizon_rows * slack, (
        f"state never drains to the watermark horizon: {state_rows}"
    )


def test_interval_join_state_bounded_by_watermark(spark, tmp_path):
    """Stream-stream click↔purchase interval join (x6 twin): both sides'
    state must hold only the watermark+window horizon, not the replay."""
    path = str(tmp_path / "ev")
    _write_chunks(spark, path)
    state_rows = _replay(
        spark,
        lambda s: click_purchase_attribution(
            s, attribution_window="1 hour", watermark="2 hours"
        ),
        path,
        str(tmp_path / "chk_join"),
        "join_state_probe",
    )
    # join keeps both inputs for watermark(2h) + window(1h); generous 4x
    # slack for batch-boundary effects (eviction lags one trigger)
    _assert_bounded(state_rows, horizon_hours=2 + 1, slack=4.0)


def test_streaming_dedup_state_bounded_by_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark keeps keys only inside the horizon."""
    path = str(tmp_path / "ev")
    _write_chunks(spark, path)
    state_rows = _replay(
        spark,
        lambda s: streaming_dedup(s, watermark="2 hours"),
        path,
        str(tmp_path / "chk_dedup"),
        "dedup_state_probe",
    )
    _assert_bounded(state_rows, horizon_hours=2, slack=4.0)


def test_session_window_state_bounded_by_watermark(spark, tmp_path):
    """Native session_window agg: closed sessions must leave the store."""
    path = str(tmp_path / "ev")
    _write_chunks(spark, path)
    state_rows = _replay(
        spark,
        lambda s: session_window_rollup(s, gap="30 minutes", watermark="2 hours"),
        path,
        str(tmp_path / "chk_sess"),
        "session_state_probe",
    )
    # post-eviction state is OPEN SESSIONS (≤ a few per user in the
    # horizon, bound by users not events); a just-ingested chunk sits in
    # the store until the next batch's watermark closes its sessions
    chunk_rows = N_EVENTS // N_CHUNKS
    steady = state_rows[len(state_rows) // 2 :]
    bound = chunk_rows + 50 * 6
    assert max(steady) <= bound, f"open-session state unbounded: {state_rows}"
    assert state_rows[-1] <= bound
    assert min(steady) <= 50 * 6, (
        f"eviction never drains to the open-session floor: {state_rows}"
    )
