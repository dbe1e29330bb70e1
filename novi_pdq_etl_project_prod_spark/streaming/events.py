"""Streaming event analytics: file-source ingestion, watermarked windowed
aggregation, and a stateful sessionization operator.

Mirrors the batch month-slice semantics incrementally: the tumbling
window + watermark pair is the streaming equivalent of the reference's
idempotent month reload (late rows within the watermark update their
window; rows later than that are dropped rather than corrupting closed
months).

Scale notes: windowed aggregation state is per (window × keys) — bounded
by the watermark horizon; shuffle partitions set state-store parallelism
(one RocksDB/memory store per partition). ``availableNow`` triggers give
batch-sized catch-up runs with streaming semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: The events fixture shape with a proper timestamp (TESTDATA.md; the
#: parquet stores nanos — see session.read_events for the batch path).
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def batch_marker_key(checkpoint_dir: str) -> str:
    """The manifest-meta key under which a streaming sink records its
    last-applied foreachBatch id (ADVICE r07): namespaced by the
    CHECKPOINT LOCATION, which is the query's durable identity — batch
    ids are monotonic per checkpoint, so two streams sharing a layer
    must gate on separate markers or the second stream's early batches
    would compare against an unrelated sequence and be dropped as
    "replayed". Hash-keyed so arbitrary paths stay JSON-key-safe."""
    import hashlib

    digest = hashlib.md5(checkpoint_dir.encode("utf-8")).hexdigest()[:16]
    return f"last_batch_id:{digest}"


#: Pre-round-8 un-namespaced marker key (one global gate per layer).
_LEGACY_MARKER_KEY = "last_batch_id"


def _last_applied_batch(root: str, layer: str, marker: str) -> int | None:
    """The exactly-once gate's last-applied batch id — a pure read of
    this sink's NAMESPACED marker. Legacy-key handling moved out of the
    per-batch gate (ADVICE r09): inferring history from the
    un-namespaced pre-round-8 key made a genuinely NEW sink (fresh
    checkpoint) on a layer that happened to carry the legacy key skip
    its batches 0..legacy as "replays" — and since nothing committed,
    the legacy key was never retired, dropping the data on EVERY rerun.
    Migration now happens once at sink startup
    (:func:`_maybe_migrate_legacy` / :func:`migrate_legacy_batch_marker`),
    as its own commit, never inside the gate."""
    from novi_pdq_etl_project_prod_spark.sources.layers import (
        read_manifest_meta,
    )

    last = read_manifest_meta(root, layer).get(marker)
    return last if isinstance(last, int) else None


def _checkpoint_has_progress(checkpoint_dir: str) -> bool:
    """True when the Structured Streaming checkpoint has at least one
    COMPLETED batch — the evidence that a query identity already ran
    successfully with this checkpoint (vs. a brand-new sink whose dir
    is empty). Reads the ``commits`` dir, NOT ``offsets``: Spark writes
    offsets/N BEFORE foreachBatch runs, so a new sink whose very first
    batch fails mid-apply already has an offsets entry — gating on it
    would misidentify that sink as upgraded-in-place on restart and
    auto-adopt a sibling's legacy marker (the exact data-loss this
    evidence gate exists to prevent); commits/N lands only after the
    batch fully succeeds."""
    import os

    try:
        return any(
            not e.startswith(".")
            for e in os.listdir(os.path.join(checkpoint_dir, "commits"))
        )
    except OSError:
        return False


def migrate_legacy_batch_marker(
    root: str, layer: str, checkpoint_dir: str
) -> int | None:
    """EXPLICIT one-time migration of a pre-round-8 sink's applied
    history: copy the un-namespaced ``last_batch_id`` meta value to this
    checkpoint's namespaced marker and retire the legacy key, in one
    atomic meta-only commit. Run it when upgrading a pre-round-8 sink
    that restarts with a FRESH checkpoint (same source directory, batch
    ids re-derive from 0) — the one case that is mechanically
    indistinguishable from a brand-new sink, so the operator must state
    the intent. Upgrades that keep their checkpoint dir need nothing:
    :func:`_maybe_migrate_legacy` detects the prior progress and
    migrates automatically at sink startup. No-op (returns None) when
    there is no legacy key or the namespaced marker already exists;
    otherwise returns the migrated batch id."""
    from novi_pdq_etl_project_prod_spark.sources.layers import (
        commit_tables,
        read_manifest_meta,
    )

    meta = read_manifest_meta(root, layer)
    legacy = meta.get(_LEGACY_MARKER_KEY)
    marker = batch_marker_key(checkpoint_dir)
    if not isinstance(legacy, int) or isinstance(meta.get(marker), int):
        return None
    commit_tables(
        {}, root, layer, meta={marker: legacy, _LEGACY_MARKER_KEY: None}
    )
    return legacy


def _maybe_migrate_legacy(root: str, layer: str, checkpoint_dir: str) -> None:
    """Evidence-gated AUTO-migration, called by every sink at startup:
    only a checkpoint with prior committed offsets proves this sink is
    the pre-round-8 sink upgraded in place, so only then is the legacy
    ``last_batch_id`` adopted (and retired) as this sink's namespaced
    marker. A fresh-checkpoint sink leaves the legacy key untouched —
    it may belong to a not-yet-upgraded sibling sink; adopting it would
    silently drop the new sink's first batches (ADVICE r09). Fresh-
    checkpoint UPGRADES must call :func:`migrate_legacy_batch_marker`
    explicitly."""
    if _checkpoint_has_progress(checkpoint_dir):
        migrate_legacy_batch_marker(root, layer, checkpoint_dir)


def read_event_stream(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source event stream with explicit schema (streaming reads
    never infer). New files landing in ``path`` become micro-batches."""
    reader = spark.readStream.schema(EVENTS_SCHEMA).format(fmt)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window counts/sums per event type.

    Works identically on a batch DataFrame (window() is just an
    expression there) — the same logical query serves both engines, which
    is also how the tests oracle it: run streaming with availableNow,
    compare against the batch run of this very function.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def monthly_event_rollup(events: DataFrame, watermark: str = "35 days") -> DataFrame:
    """The reference's monthly grain (E4), streaming: calendar yyyymm
    derived directly from event time — the same group key
    ``stream_to_medallion`` uses. (A fixed ``window("30 days")`` is NOT
    a calendar month: windows drift off month boundaries and events near
    them land in the wrong bucket.)

    The group key is not an event-time window, so run this in update or
    complete output mode (the medallion bridge pairs complete mode with
    idempotent month-partition overwrite); the watermark still bounds
    late arrivals."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            (F.year("ts") * 100 + F.month("ts")).alias("yyyymm"),
            F.col("user_id"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def streaming_dedup(
    events: DataFrame,
    key_cols: tuple[str, ...] = ("event_id",),
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup — the training-pipeline ingestion guard:
    drop re-delivered events by key, keeping state only within the
    watermark horizon (``dropDuplicatesWithinWatermark``), so state
    stays bounded no matter how long the stream runs. The batch twin is
    ``dropDuplicates(key_cols)``."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def unattributed_clicks(
    events: DataFrame,
    attribution_window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Clicks that led to NO purchase within the attribution window —
    the left-OUTER stream-stream join (anti joins are not stream-legal;
    outer + null-filter is). In streaming, the null-padded row can only
    emit once the watermark proves no matching purchase can still
    arrive; on batch input the same graph evaluates eagerly, which is
    how the x9 oracle certifies it."""
    joined = click_purchase_attribution_joinable(
        events, attribution_window, watermark, how="left_outer"
    )
    return joined.where(F.col("purchase_id").isNull()).select(
        "user_id", "click_id", "click_ts"
    )


def click_purchase_attribution_joinable(
    events: DataFrame,
    attribution_window: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Shared click↔purchase interval-join graph with a pluggable join
    type (inner → attribution, left_outer → unattributed detection)."""
    clicks = (
        events.where(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {attribution_window}")
        ),
        how,
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        "click_ts",
        "purchase_ts",
        "purchase_value",
    )


def session_window_rollup(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-user sessions via Spark's NATIVE session_window aggregation —
    the merging-sessions stateful operator, no Python state function.

    Same logical query serves batch (watermark is a no-op, every session
    returned) and streaming (append mode: a session emits once the
    watermark passes its end, i.e. it can no longer grow). The batch
    form is oracled as catalog query ``x8_native_session_window``; the
    stream==batch test closes the loop, so the streaming operator's
    semantics are transitively DuckDB-certified.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("session_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def click_purchase_attribution(
    events: DataFrame,
    attribution_window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream join: attribute each purchase to the same user's
    clicks within the preceding ``attribution_window``.

    Both sides are the one event stream filtered by type; watermarks on
    both bound the join state (clicks older than purchase-watermark +
    window are dropped from the state store — without the time-range
    condition the state would grow forever). Works identically on a
    batch DataFrame, which the tests use as the oracle.
    """
    return click_purchase_attribution_joinable(
        events, attribution_window, watermark, how="inner"
    )


def stream_to_medallion(
    events: DataFrame,
    root: str,
    table: str,
    checkpoint_dir: str,
    watermark: str = "35 days",
) -> None:
    """Streaming → medallion bridge: continuously maintain the monthly
    staging table from an event stream.

    ``foreachBatch`` turns each micro-batch into the SAME idempotent
    month-partition overwrite the batch pipeline uses
    (``sources.layers.write_month_idempotent``) — late events within the
    watermark simply rewrite their month partition, which is exactly the
    reference's delete-month-and-reload semantics made incremental.
    Restart safety comes from the checkpoint: a replayed batch rewrites
    identical partitions (idempotent), so the sink needs no transaction
    log. Blocks until available input is processed (availableNow).
    """
    from novi_pdq_etl_project_prod_spark.sources.layers import (
        write_month_idempotent,
    )

    monthly = (
        events.withWatermark("ts", watermark)
        .groupBy(
            (F.year("ts") * 100 + F.month("ts")).alias("yyyymm"),
            F.col("user_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
    )

    def _write_batch(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        write_month_idempotent(batch_df, root, "staging", table)

    q = (
        monthly.writeStream.foreachBatch(_write_batch)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_to_jdbc_monthly(
    events: DataFrame,
    url: str,
    table: str,
    checkpoint_dir: str,
    user: str,
    password: str,
    driver: str,
    watermark: str = "35 days",
) -> None:
    """Streaming → warehouse bridge: maintain the monthly rollup in a
    JDBC table (the reference's Postgres surface) from an event stream.

    Same shape as :func:`stream_to_medallion`, but each micro-batch runs
    the JDBC **delete-month-then-append** idempotent load
    (``sources.jdbc.write_jdbc_month_idempotent``) instead of a partition
    overwrite — so a checkpoint replay rewrites identical rows and the
    warehouse never double-counts. Blocks until available input is
    processed (availableNow)."""
    from novi_pdq_etl_project_prod_spark.sources.jdbc import (
        write_jdbc_month_idempotent,
    )

    monthly = (
        events.withWatermark("ts", watermark)
        .groupBy(
            (F.year("ts") * 100 + F.month("ts")).alias("yyyymm"),
            F.col("user_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
    )

    def _write_batch(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        write_jdbc_month_idempotent(
            batch_df, url, table, user=user, password=password, driver=driver
        )

    q = (
        monthly.writeStream.foreachBatch(_write_batch)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_to_memory_sink(
    df: DataFrame,
    query_name: str,
    output_mode: str = "complete",
) -> None:
    """Execute a streaming query over all currently-available input
    (availableNow trigger) into an in-memory table named ``query_name``,
    blocking until done. Test/demo harness — production sinks are
    partitioned parquet via writeStream.format('parquet')."""
    q = (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_upsert_dim(
    updates: DataFrame,
    root: str,
    dim_table: str,
    pk: tuple[str, ...],
    order_col: str,
    checkpoint_dir: str,
) -> None:
    """Streaming dimension maintenance: continuously fold a stream of
    attribute updates into the curated dim snapshot — the streaming twin
    of the batch ``upsert_dim`` (reference S9, ``model_curated.py:72-101``
    made incremental; the same shape as a Delta ``MERGE`` in foreachBatch).

    Each micro-batch is first collapsed to one row per key
    (latest-by-``order_col``, tie-broken deterministically), then merged
    latest-wins into the existing snapshot and the snapshot is atomically
    replaced. foreachBatch batches are totally ordered per query, so
    cross-batch precedence needs no timestamp logic — batch N+1 simply
    wins over batch N. A replayed batch after restart re-merges the same
    rows into a snapshot that already contains them (idempotent).

    Scale: the micro-batch is dim-sized (updates), the snapshot rewrite
    is one shuffle-free file job per trigger; at 100 TB fact scale dims
    remain small by definition — for genuinely huge dims swap the parquet
    snapshot for a Delta/Iceberg MERGE sink, keeping this function shape.
    """
    from novi_pdq_etl_project_prod_spark.operators.modeling import (
        dedup_dim,
        upsert_dim,
    )
    from novi_pdq_etl_project_prod_spark.sources.layers import (
        overwrite_snapshot,
        resolve_table_path,
        table_path,
    )

    def _merge_batch(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        latest = dedup_dim(batch_df, pk=pk, order_by=(F.col(order_col).desc(),))
        path = resolve_table_path(table_path(root, "curated", dim_table))
        try:
            existing = spark.read.parquet(path)
        except Exception:
            existing = None
        merged = upsert_dim(existing, latest, pk=pk)
        # snapshot-pointer commit reads the old snapshot's files during
        # the new snapshot's write job — no materialization needed
        overwrite_snapshot(merged, root, "curated", dim_table)

    q = (
        updates.writeStream.foreachBatch(_merge_batch)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def enrich_stream_with_dim(
    stream: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join: decorate each event with dimension
    attributes (the streaming twin of the batch star join J1).

    Structured Streaming re-plans the static side every micro-batch, so
    a dim snapshot maintained by ``stream_upsert_dim`` is picked up
    without restarting the query — the lakehouse pattern for slowly
    changing enrichment. The static side is dim-sized ⇒ Spark plans a
    broadcast hash join per batch; no state store involved (unlike
    stream-stream joins, nothing needs watermark bookkeeping).
    """
    return stream.join(F.broadcast(dim), on, how)


def stream_apply_changes(
    changelog: DataFrame,
    root: str,
    table: str,
    pk: tuple[str, ...],
    seq_cols: tuple[str, ...],
    op_col: str,
    checkpoint_dir: str,
    delete_ops: tuple[str, ...] = ("delete",),
) -> None:
    """Streaming CDC apply: continuously fold a Debezium-style changelog
    stream into the current-state snapshot, DELETES HONORED — the
    streaming twin of ``operators.cdc.apply_changes`` and the tombstone-
    aware generalization of ``stream_upsert_dim`` (which can only ever
    add or update keys).

    Per micro-batch: collapse to the latest change per key (keeping
    tombstones — a delete must be able to beat an earlier upsert in the
    same batch), then merge latest-wins against the snapshot (batches
    are totally ordered per query, so batch N+1 simply wins) and drop
    keys whose surviving row is a tombstone. Replayed batches after a
    restart re-apply the same changes onto a snapshot that already
    reflects them — idempotent, giving exactly-once table state over
    at-least-once delivery.

    Scale: the merge input is |snapshot| + |micro-batch|; the snapshot
    rewrite is the same atomic `_CURRENT`-pointer swap as the batch
    layers. For snapshots too large to rewrite per trigger, raise the
    trigger interval or swap the sink for a Delta/Iceberg MERGE — the
    function shape (collapse → latest-wins merge → tombstone filter)
    is the part that carries.
    """
    from pyspark.sql import Window

    from novi_pdq_etl_project_prod_spark.sources.layers import (
        overwrite_snapshot,
        resolve_table_path,
        table_path,
    )

    def _apply_batch(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        w = Window.partitionBy(*pk).orderBy(
            *[F.col(c).desc() for c in seq_cols]
        )
        latest = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
        path = resolve_table_path(table_path(root, "curated", table))
        try:
            existing = spark.read.parquet(path)
        except Exception:
            existing = None
        if existing is not None:
            # batch rows win over snapshot rows at the same key: tag the
            # sides and keep the batch's row_number()==1 survivor
            merged = (
                existing.withColumn("_side", F.lit(0))
                .unionByName(latest.withColumn("_side", F.lit(1)))
                .withColumn(
                    "_rn",
                    F.row_number().over(
                        Window.partitionBy(*pk).orderBy(F.col("_side").desc())
                    ),
                )
                .where(F.col("_rn") == 1)
                .drop("_rn", "_side")
            )
        else:
            merged = latest
        state = merged.where(~F.col(op_col).isin(list(delete_ops)))
        overwrite_snapshot(state, root, "curated", table)

    q = (
        changelog.writeStream.foreachBatch(_apply_batch)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_to_star_schema(
    updates: DataFrame,
    root: str,
    fact_table: str,
    dim_table: str,
    dim_pk: tuple[str, ...],
    dim_cols: tuple[str, ...],
    order_col: str,
    measure_cols: tuple[str, ...],
    checkpoint_dir: str,
) -> None:
    """Streaming star-schema maintenance with CROSS-TABLE atomicity: each
    micro-batch derives the dimension update (latest-wins by
    ``order_col``) and the fact aggregate delta from the SAME rows, then
    publishes BOTH through one ``commit_tables`` manifest — so a reader
    that resolves through the manifest can never see a fact row whose
    dimension state hasn't landed yet (the torn-star window every
    two-statement streaming sink has; the reference's per-run Postgres
    transaction had the same guarantee batch-wise).

    Fact semantics: a keyed running aggregate (sum of ``measure_cols``
    per ``dim_pk``) maintained by read-merge-overwrite against the
    manifest's own fact version — the set-consistent read feeding the
    next set-consistent write. A running sum is NOT idempotent under
    replay, and foreachBatch is only at-least-once: a batch replayed
    after a crash between the manifest commit and the checkpoint offset
    write would re-add its delta (ADVICE r06). So the sink records the
    batch id IN the manifest it commits (``commit_tables(meta=...)``) —
    commit and applied-marker flip atomically — and ``_publish`` no-ops
    when ``_batch_id <= last_applied``. foreachBatch batch ids are
    monotonically increasing per checkpoint, which makes the ``<=``
    comparison the exactly-once gate. The marker key is NAMESPACED by
    the checkpoint location (:func:`batch_marker_key` — the query's
    durable identity) and ``commit_tables`` merges meta instead of
    replacing it (ADVICE r07): a second stream sharing the layer gates
    on its own batch-id sequence, and unrelated commits to the layer
    can't erase the marker.

    Scale: dim and the keyed aggregate are entity-sized, not
    event-sized; the per-trigger cost is two small snapshot writes + one
    manifest flip. Event-grain fact history at 100 TB keeps using the
    month-partitioned idempotent append path — this sink is for the
    co-published aggregate/dimension pair.
    """
    from novi_pdq_etl_project_prod_spark.operators.modeling import (
        dedup_dim,
        upsert_dim,
    )
    from novi_pdq_etl_project_prod_spark.sources.layers import (
        commit_tables,
        read_manifest_tables,
    )

    marker = batch_marker_key(checkpoint_dir)
    _maybe_migrate_legacy(root, "curated", checkpoint_dir)

    def _publish(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        last = _last_applied_batch(root, "curated", marker)
        if last is not None and _batch_id <= last:
            return  # replayed batch: its delta is already in the fact
        spark = batch_df.sparkSession
        current = read_manifest_tables(spark, root, "curated")
        latest = dedup_dim(
            batch_df.select(*dict.fromkeys(dim_pk + dim_cols + (order_col,))),
            pk=dim_pk,
            order_by=(F.col(order_col).desc(),),
        )
        merged_dim = upsert_dim(current.get(dim_table), latest, pk=dim_pk)
        delta = batch_df.groupBy(*dim_pk).agg(
            *[F.sum(F.col(m)).alias(m) for m in measure_cols]
        )
        existing_fact = current.get(fact_table)
        merged_fact = (
            delta
            if existing_fact is None
            else existing_fact.unionByName(delta)
            .groupBy(*dim_pk)
            .agg(*[F.sum(F.col(m)).alias(m) for m in measure_cols])
        )
        meta: dict = {marker: _batch_id}
        commit_tables(
            {fact_table: merged_fact, dim_table: merged_dim},
            root,
            "curated",
            meta=meta,
        )

    q = (
        updates.writeStream.foreachBatch(_publish)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_kmv_sketch(
    stream: DataFrame,
    root: str,
    table: str,
    value_col: str,
    group_cols: tuple[str, ...],
    checkpoint_dir: str,
    k: int = 64,
    salt: str = "kmv",
) -> None:
    """Continuously maintain a KMV distinct-count sketch over a stream:
    each micro-batch is sketched (bounded: k registers per group) and
    merged into the snapshot-committed sketch table.

    Because the KMV merge law is exact (min-k(min-k(A) ∪ min-k(B)) =
    min-k(A ∪ B), ``operators.sketches.kmv_merge``), the maintained
    sketch is *identical* to the batch sketch over every row ever seen —
    streaming introduces zero approximation beyond the sketch itself,
    and a replayed micro-batch after restart re-merges registers the
    sketch already contains (idempotent by set semantics). This is the
    streaming answer to "distinct users so far today" that neither
    re-scans history per trigger nor keeps per-value state: state is k
    rows per group, forever.

    Scale: the per-batch sketch is a hash-agg over the micro-batch only;
    the merge joins two k-rows-per-group frames; the snapshot rewrite is
    sketch-sized. Nothing in the trigger path touches historical raw
    data.
    """
    from novi_pdq_etl_project_prod_spark.operators.sketches import (
        kmv_merge,
        kmv_sketch,
    )
    from novi_pdq_etl_project_prod_spark.sources.layers import (
        overwrite_snapshot,
        resolve_table_path,
        table_path,
    )

    def _merge_batch(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        batch_sk = kmv_sketch(batch_df, value_col, list(group_cols), k=k, salt=salt)
        try:
            existing = spark.read.parquet(
                resolve_table_path(table_path(root, "curated", table))
            )
        except Exception:
            existing = None
        union = batch_sk if existing is None else existing.unionByName(batch_sk)
        merged = kmv_merge(union, list(group_cols), k=k)
        overwrite_snapshot(merged, root, "curated", table)

    q = (
        stream.writeStream.foreachBatch(_merge_batch)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_sample_quantile_sketch(
    stream: DataFrame,
    root: str,
    table: str,
    id_col: str,
    value_col: str,
    group_cols: tuple[str, ...],
    checkpoint_dir: str,
    k: int = 512,
    salt: str = "sqs",
) -> None:
    """Continuously maintain the deterministic bottom-k row sample
    (``operators.sketches.sample_quantile_sketch``) over a stream: each
    micro-batch is sketched and merged — hash AND payload — into the
    snapshot-committed sample table, from which exact ``percentile``
    aggregates answer quantile queries at any moment.

    Same exactness contract as :func:`stream_kmv_sketch`: the bottom-k
    merge law makes the maintained sample IDENTICAL to the sample a
    batch pass over all rows ever seen would draw, and replays are
    idempotent (registers are a set). The payload columns (id, value)
    ride through the merge via ``carry_cols``; ties on equal hashes
    break on the value, so dirty duplicate ids cannot flicker the
    boundary (the d23 lesson).

    State: k rows per group, forever — streaming quantiles without
    state-store percentile buffers or history re-scans.
    """
    from novi_pdq_etl_project_prod_spark.operators.sketches import (
        kmv_merge,
        sample_quantile_sketch,
    )
    from novi_pdq_etl_project_prod_spark.sources.layers import (
        overwrite_snapshot,
        resolve_table_path,
        table_path,
    )

    def _merge_batch(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        batch_sk = sample_quantile_sketch(
            batch_df, id_col, value_col, list(group_cols), k=k, salt=salt
        )
        try:
            existing = spark.read.parquet(
                resolve_table_path(table_path(root, "curated", table))
            )
        except Exception:
            existing = None
        union = batch_sk if existing is None else existing.unionByName(batch_sk)
        merged = kmv_merge(
            union, list(group_cols), k=k, carry_cols=[id_col, value_col]
        )
        overwrite_snapshot(merged, root, "curated", table)

    q = (
        stream.writeStream.foreachBatch(_merge_batch)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_bin_counts(
    stream: DataFrame,
    root: str,
    table: str,
    value_col: str,
    cut_vals: tuple[float, ...],
    checkpoint_dir: str,
    layer: str = "quality",
) -> None:
    """Streaming distribution-drift monitor (VERDICT r06 item 7):
    maintain dq8-style quantile-bin counts of ``value_col`` against
    FIXED reference cut points, one merge per micro-batch — so "has the
    live distribution drifted from the reference?" is answerable at any
    moment from an n_bins-row table, with no history rescan. Feed the
    maintained table and the reference's counts to
    ``operators.stats.drift_from_bin_counts`` for the exact report
    ``quantile_bin_drift`` would produce over all rows ever seen.

    Counts against fixed cuts merge by ADDITION, which is not
    idempotent under replay — so, like :func:`stream_to_star_schema`,
    the sink records its last-applied batch id in the atomic
    ``commit_tables`` manifest and skips replayed batches: counts stay
    exactly-once across crash/restart. Sharing a layer with other sinks
    is safe since round 8 (manifest tables and meta both merge across
    commits, and the batch marker is checkpoint-namespaced); the
    separate default layer (``quality``) is just the tidy-cataloging
    choice.

    State: n_bins rows, forever. Per-trigger cost: one map-side-combined
    hash-agg over the micro-batch + an n_bins-row snapshot write.
    """
    from novi_pdq_etl_project_prod_spark.operators.stats import bin_counts
    from novi_pdq_etl_project_prod_spark.sources.layers import (
        commit_tables,
        read_manifest_table,
    )

    marker = batch_marker_key(checkpoint_dir)
    _maybe_migrate_legacy(root, layer, checkpoint_dir)

    def _merge_batch(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        last = _last_applied_batch(root, layer, marker)
        if last is not None and _batch_id <= last:
            return  # replayed batch: its counts are already in
        spark = batch_df.sparkSession
        fresh = bin_counts(batch_df, value_col, list(cut_vals), "n")
        existing = read_manifest_table(spark, root, layer, table)
        merged = (
            fresh
            if existing is None
            else existing.unionByName(fresh)
            .groupBy("bin")
            .agg(F.sum("n").alias("n"))
        )
        meta: dict = {marker: _batch_id}
        commit_tables({table: merged}, root, layer, meta=meta)

    q = (
        stream.writeStream.foreachBatch(_merge_batch)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_write_with_expectations(
    stream: DataFrame,
    root: str,
    layer: str,
    table: str,
    rules: dict,
    checkpoint_dir: str,
    quarantine_table: str | None = None,
    schema_allow: tuple[str, ...] | None = None,
) -> None:
    """Streaming twin of ``operators.expectations.write_with_expectations``
    (VERDICT r08 item 5): per micro-batch, split rows on the declared
    rules and APPEND good rows to ``table`` and violating rows (with
    their ``__failed_rules`` audit column) to the quarantine table —
    both through ONE atomic ``commit_tables`` manifest, with cumulative
    per-rule violation counts riding the same flip as commit meta
    (``expectations:{table}``).

    Appends are not idempotent under foreachBatch's at-least-once
    replay, so the sink gates on the checkpoint-namespaced batch marker
    (the ``stream_to_star_schema`` discipline): a replayed batch whose
    id the committed manifest already covers is a no-op, making table
    contents AND counts exactly-once.

    ``schema_allow``: the schema gate ALWAYS runs on this sink (None ==
    block all drift) because its commits are APPEND segments — a
    drifted segment would wedge later merged-schema reads instead of
    failing the offending batch; pass statuses ("added", ...) to permit
    reviewed evolution, recorded in commit meta. (The batch twin's
    None means ungated: a validated PUBLISH replaces the table, so any
    schema is physically fine there.)

    Scale: the expectation tagging is one row-local projection compiled
    into the micro-batch scan (zero shuffles); commits append only the
    batch's rows as manifest segments (empty sides skipped) — neither
    corpus-sized state nor corpus-sized writes ride the stream. The
    batch twin is certified by the dq11 oracle; this sink is certified
    stream==batch metamorphically.
    """
    from novi_pdq_etl_project_prod_spark.operators.expectations import (
        FAILED_RULES_COL,
        apply_expectations,
        expectation_report,
    )
    from novi_pdq_etl_project_prod_spark.sources.layers import (
        commit_tables,
        read_manifest_meta,
    )

    marker = batch_marker_key(checkpoint_dir)
    _maybe_migrate_legacy(root, layer, checkpoint_dir)
    qt = quarantine_table or f"{table}_quarantine"
    counts_key = f"expectations:{table}"

    def _publish(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        last = _last_applied_batch(root, layer, marker)
        if last is not None and _batch_id <= last:
            return  # replayed batch: its rows and counts already landed
        spark = batch_df.sparkSession
        extra_meta: dict = {}
        # METADATA expectation (VERDICT r09 item 7), the streaming twin
        # of write_with_expectations' schema gate. The gate ALWAYS runs
        # here (schema_allow=None behaves as "block all drift"), unlike
        # the batch twin where None means ungated: a batch PUBLISH
        # replaces the table so any schema is physically fine, but this
        # sink APPENDS segments — before round 10 a drifted batch failed
        # the unionByName loudly; committing it silently would instead
        # wedge every later merged-schema read (a retyped column fails
        # parquet schema merging long after the bad batch landed).
        from novi_pdq_etl_project_prod_spark.operators.expectations import (
            ExpectationError,
        )
        from novi_pdq_etl_project_prod_spark.operators.quality import (
            schema_drift,
        )
        from novi_pdq_etl_project_prod_spark.sources.layers import (
            read_manifest_table,
        )

        allow = set(schema_allow) if schema_allow is not None else set()
        # one single-table read and ONE diff (not a whole-layer reader
        # sweep per trigger), split into blocked vs permitted
        existing = read_manifest_table(spark, root, layer, table)
        drift = (
            [] if existing is None else schema_drift(existing, batch_df)
        )
        blocked = [d for d in drift if d["status"] not in allow]
        if blocked:
            raise ExpectationError(
                f"{table}: unreviewed schema drift {blocked}; allowed "
                f"statuses {sorted(allow)} — batch {_batch_id} "
                "not committed"
            )
        if drift:
            extra_meta[f"schema_drift:{table}"] = drift
        tagged = apply_expectations(batch_df, rules).persist()
        try:
            fresh = {
                r.rule: r.n_violations
                for r in expectation_report(
                    tagged.drop(FAILED_RULES_COL), rules
                ).collect()
            }
            fresh["n_rows"] = tagged.count()
            prior = read_manifest_meta(root, layer).get(counts_key) or {}
            total = {
                k: int(prior.get(k, 0)) + int(v) for k, v in fresh.items()
            }
            good = tagged.where(
                F.size(F.col(FAILED_RULES_COL)) == 0
            ).drop(FAILED_RULES_COL)
            bad = tagged.where(F.size(F.col(FAILED_RULES_COL)) > 0)
            meta: dict = {marker: _batch_id, counts_key: total, **extra_meta}
            # append-SHAPED commit (round 10): this sink is pure append
            # — only the batch's rows are written as new manifest
            # segments; the standing good/quarantine tables are
            # referenced, never re-staged (previously each batch
            # committed `current ∪ batch`, O(corpus) write volume — the
            # same scale-killer fixed in stream_incremental_near_dups).
            # EMPTY sides are dropped from the commit (their counts are
            # already known from the report) so a healthy stream doesn't
            # grow the quarantine's segment list with zero-row segments
            # — the table materializes on its first violating batch.
            n_failing = int(fresh.get("_total_rows_failing", 0))
            tables = {}
            if int(fresh["n_rows"]) > n_failing:
                tables[table] = good
            if n_failing > 0:
                tables[qt] = bad
            commit_tables(
                tables,
                root,
                layer,
                meta=meta,
                append_tables=tuple(tables),
            )
        finally:
            tagged.unpersist()

    q = (
        stream.writeStream.foreachBatch(_publish)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_merge_into(
    stream: DataFrame,
    root: str,
    layer: str,
    table: str,
    on: tuple[str, ...],
    checkpoint_dir: str,
    when_matched_update: dict | None = None,
    when_matched_delete: str | None = None,
    when_not_matched_insert=True,
    source_dedup_order: tuple[str, ...] | None = None,
) -> None:
    """Declarative MERGE as the micro-batch sink — the Delta
    streaming-MERGE idiom (VERDICT r08 item 5): each micro-batch is the
    MERGE source against the table's current committed snapshot, with
    the full ``merge_frames`` clause grammar (matched update / matched
    delete / not-matched insert, ANSI NULL-key semantics).

    ``source_dedup_order``: columns whose descending order picks the
    surviving source row per key within a batch (the
    ``stream_apply_changes`` collapse) — without it a batch carrying
    two rows for one key is REFUSED by merge_frames' dup guard, which
    is the right default for genuinely-unordered sources.

    MERGE with expression updates (``t.v + s.delta``) is not idempotent
    under replay, so the sink gates on the checkpoint-namespaced batch
    marker and commits state + marker in one atomic manifest flip —
    exactly-once table state over at-least-once delivery.

    Scale: per trigger, one full-outer join of |snapshot| + |batch| and
    one snapshot write — the same rewrite unit as ``stream_apply_
    changes``; for snapshots too large to rewrite per trigger, raise
    the trigger interval (the merge itself stays shuffle-bound on the
    key).
    """
    from novi_pdq_etl_project_prod_spark.operators.modeling import (
        merge_frames,
    )
    from novi_pdq_etl_project_prod_spark.sources.layers import (
        commit_tables,
        read_manifest_table,
    )

    marker = batch_marker_key(checkpoint_dir)
    _maybe_migrate_legacy(root, layer, checkpoint_dir)

    def _publish(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        last = _last_applied_batch(root, layer, marker)
        if last is not None and _batch_id <= last:
            return  # replayed batch: its merge is already in the state
        spark = batch_df.sparkSession
        source = batch_df
        if source_dedup_order:
            from pyspark.sql import Window

            # NULL-key rows are exempt from the collapse (ADVICE r09,
            # mirroring merge_frames' dup-guard): under the ANSI
            # never-match rule each NULL-key source row INSERTS, so
            # collapsing them to one window survivor would silently
            # drop legitimate inserts
            non_null = None
            for k in on:
                nn = F.col(k).isNotNull()
                non_null = nn if non_null is None else (non_null & nn)
            w = Window.partitionBy(*on).orderBy(
                *[F.col(c).desc() for c in source_dedup_order]
            )
            keyed = (
                source.where(non_null)
                .withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1)
                .drop("_rn")
            )
            source = keyed.unionByName(source.where(~non_null))
        target = read_manifest_table(spark, root, layer, table)
        merged = merge_frames(
            target,
            source,
            on=on,
            when_matched_update=when_matched_update,
            when_matched_delete=when_matched_delete,
            when_not_matched_insert=when_not_matched_insert,
        )
        meta: dict = {marker: _batch_id}
        commit_tables({table: merged}, root, layer, meta=meta)

    q = (
        stream.writeStream.foreachBatch(_publish)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_incremental_near_dups(
    stream: DataFrame,
    root: str,
    layer: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    signatures_table: str = "minhash_signatures",
    pairs_table: str = "near_dup_pairs",
) -> None:
    """Streaming incremental near-dup detection — the production form of
    ``operators.dedup.incremental_minhash_pairs``: each micro-batch of
    documents is banded against the PERSISTED signature table of
    everything ingested before it; the batch's signatures are appended
    and its pairs (batch×batch ∪ batch×standing) recorded, both through
    ONE atomic ``commit_tables`` manifest, marker-gated for exactly-once
    under replay.

    The correctness property this buys (pinned metamorphically): after
    ingesting a corpus in ANY number of increments, the accumulated
    pairs table equals the full-corpus ``minhash_near_duplicates_md5``
    pair set with each pair reported EXACTLY ONCE — at the batch where
    its later member arrived — while no batch ever paid the standing
    corpus's old×old pair mass (the 100 TB viability condition).

    Scale: per trigger, |batch|·bands explode + one band-key join
    against the signature table scan; signatures are content-addressed
    and immutable, so the standing table only ever appends — and since
    round 10 that append is PHYSICAL, not just logical: the commit goes
    through ``commit_tables(..., append_tables=...)``, which writes only
    the batch's rows as a new manifest segment and references the
    standing segments by name (VERDICT r09 #1 closed: previously each
    batch re-staged the full ``existing ∪ new`` union, O(corpus) write
    volume per increment). Per-batch read cost is the signature-table
    scan (one side of the band join); per-batch WRITE cost is O(batch).

    Identity contract: ``id_col`` is an immutable content identity —
    the exactly-once marker prevents replays, so a given id is hashed
    and appended once. Re-ingesting an id with DIFFERENT text violates
    the contract; the pair set stays exactly-once (pair-sized dedup
    after verification) but which copy's signature scores a pair is
    then unspecified. Route revisions through new ids (the m69
    exact-dedup stage reports re-fetches of unchanged content).

    Retraction-aware (round 12, same contract as the composed funnel):
    the standing signature read is filtered against the layer's
    tombstones, so a retracted doc's signature stops pairing against
    (and suppressing) future arrivals the moment the retraction
    commits.
    """
    from novi_pdq_etl_project_prod_spark.operators.dedup import (
        minhash_signatures_md5,
    )
    from novi_pdq_etl_project_prod_spark.plans.retract import (
        read_live_table,
    )
    from novi_pdq_etl_project_prod_spark.sources.layers import (
        commit_tables,
    )

    marker = batch_marker_key(checkpoint_dir)
    _maybe_migrate_legacy(root, layer, checkpoint_dir)

    def _ingest(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        last = _last_applied_batch(root, layer, marker)
        if last is not None and _batch_id <= last:
            return  # replayed batch: its signatures and pairs are in
        spark = batch_df.sparkSession
        batch_df = batch_df.persist()
        sigs_new = None
        pairs = None
        try:
            existing_sigs = read_live_table(
                spark, root, layer, signatures_table, id_col="id"
            )
            sigs_new = minhash_signatures_md5(
                batch_df, id_col, text_col, n, num_hashes
            ).persist()
            pairs = _incremental_pairs_from_signatures(
                sigs_new,
                existing_sigs if existing_sigs is not None
                else sigs_new.limit(0),
                num_hashes,
                bands,
                threshold,
            ).persist()  # emptiness check + write: ONE band-join pass
            meta: dict = {marker: _batch_id}
            # APPEND-shaped commit (round 10, VERDICT r09 #1): only the
            # batch's signatures and pairs are written; the standing
            # corpus is referenced by the manifest as prior segments,
            # never re-copied. Per-increment committed bytes ∝ batch —
            # k increments over an N-doc corpus write O(N) signature
            # rows total, not O(k·N). EMPTY sides are dropped from the
            # commit (ADVICE r10): a quiet trigger (no pairs, or a
            # batch of unhashable docs) must not grow the segment list
            # with zero-row segments — the marker meta still advances
            # through the same atomic manifest flip.
            tables = {
                t: df
                for t, df in (
                    (signatures_table, sigs_new),
                    (pairs_table, pairs),
                )
                if not df.isEmpty()
            }
            commit_tables(
                tables,
                root,
                layer,
                meta=meta,
                append_tables=tuple(tables),
            )
        finally:
            # unpersist on failure too (round-11 review)
            if pairs is not None:
                pairs.unpersist()
            if sigs_new is not None:
                sigs_new.unpersist()
            batch_df.unpersist()

    q = (
        stream.writeStream.foreachBatch(_ingest)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


# moved to operators.dedup (round 11): the signature-table pair join
# is shared by the streaming sink and the composed batch ingest plan
from novi_pdq_etl_project_prod_spark.operators.dedup import (  # noqa: E402
    incremental_pairs_from_signatures as _incremental_pairs_from_signatures,
)


def stream_incremental_exact_dups(
    stream: DataFrame,
    root: str,
    layer: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    hashes_table: str = "content_hashes",
    dups_table: str = "exact_dups",
) -> None:
    """Streaming incremental EXACT dedup — the production form of
    ``operators.dedup.incremental_exact_dups`` and the cheap stage an
    ingest pipeline runs BEFORE the near-dup sink: per micro-batch,
    every doc whose md5(text) already exists in the standing content-
    hash table is reported as ``exact_old`` (with the standing canonical
    id), within-batch repeats as ``exact_new``; genuinely new hashes
    append to the standing table. One atomic marker-gated commit per
    batch (``commit_tables`` append segments), exactly-once under
    replay.

    Scale shape — per trigger, with H = standing hash table:
    the batch's hashes (trigger-bounded, ids+hashes only) are BROADCAST
    against ONE map-side scan of H (matched hashes + their standing
    min ids come back candidate-sized); the new-hash set is a broadcast
    anti-join against the candidate-sized matched set — H is never
    shuffled, never rewritten, and the committed bytes are O(batch)
    (one (hash, canonical id) segment + the batch's report rows).
    """
    from novi_pdq_etl_project_prod_spark.operators.dedup import (
        broadcast_if_bounded,
    )
    from novi_pdq_etl_project_prod_spark.plans.retract import (
        read_live_table,
    )
    from novi_pdq_etl_project_prod_spark.sources.layers import (
        commit_tables,
    )

    marker = batch_marker_key(checkpoint_dir)
    _maybe_migrate_legacy(root, layer, checkpoint_dir)

    def _ingest(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        last = _last_applied_batch(root, layer, marker)
        if last is not None and _batch_id <= last:
            return  # replayed batch: its hashes and report are in
        spark = batch_df.sparkSession
        h_new = (
            batch_df.select(
                F.col(id_col).alias("id"),
                F.md5(F.col(text_col)).alias("h"),
            )
            .where(F.col("h").isNotNull())
            .persist()
        )
        enriched = None
        try:
            # retraction-aware standing read (round 12): a retracted
            # doc's content hash must not exact-drop a re-arrival
            standing = read_live_table(
                spark, root, layer, hashes_table, id_col="canonical_id"
            )
            new_min = h_new.groupBy("h").agg(F.min("id").alias("new_min"))
            # mega-batch guard (VERDICT r10 #6): an availableNow
            # catch-up can deliver one huge trigger; past the cap the
            # forced broadcasts are dropped and AQE falls back to a
            # shuffle join — graceful degradation, not an OOM hint
            n_hashes = new_min.count()
            bc = lambda d: broadcast_if_bounded(d, n_hashes)  # noqa: E731
            if standing is None:
                # first batch: no standing table; derive an EMPTY matched
                # frame from the batch itself so old_min's type always
                # equals the caller's id type (int/long/string alike)
                matched = new_min.select(
                    "h", F.col("new_min").alias("old_min")
                ).limit(0)
            else:
                # ONE map-side pass over the standing table: broadcast
                # the trigger-bounded batch hashes, return matched
                # hashes with their standing canonical ids
                # (candidate-sized)
                matched = (
                    standing.join(bc(h_new.select("h").distinct()), "h")
                    .groupBy("h")
                    .agg(F.min("canonical_id").alias("old_min"))
                )
            # candidate-sized; persisted so the standing-table scan
            # behind `matched` runs ONCE per trigger (the report and
            # new-hash writes, plus the emptiness checks below, all
            # reuse it instead of re-scanning H)
            enriched = new_min.join(bc(matched), "h", "left").persist()
            report = (
                h_new.join(bc(enriched), "h")
                .where(
                    F.col("old_min").isNotNull()
                    | (F.col("id") > F.col("new_min"))
                )
                .select(
                    F.col("id").alias("doc_id"),
                    F.coalesce(F.col("old_min"), F.col("new_min")).alias(
                        "dup_of"
                    ),
                    F.when(
                        F.col("old_min").isNotNull(), F.lit("exact_old")
                    )
                    .otherwise(F.lit("exact_new"))
                    .alias("dup_type"),
                )
            )
            # standing table grows by the batch's genuinely-new hashes
            # only (hash, canonical id) — hashes already standing keep
            # their canonical row untouched
            new_hashes = enriched.where(F.col("old_min").isNull()).select(
                "h", F.col("new_min").alias("canonical_id")
            )
            meta: dict = {marker: _batch_id}
            # EMPTY sides are dropped from the commit (ADVICE r10): an
            # all-duplicate batch appends no hashes, a clean batch no
            # report rows — committing zero-row segments every quiet
            # trigger grows the segment list (directory listings +
            # footers per scan, GC pins) without bound. The marker meta
            # still advances through the same atomic manifest flip.
            tables = {
                t: df
                for t, df in (
                    (hashes_table, new_hashes),
                    (dups_table, report),
                )
                if not df.isEmpty()
            }
            commit_tables(
                tables,
                root,
                layer,
                meta=meta,
                append_tables=tuple(tables),
            )
        finally:
            # unpersist on failure too (round-11 review): a batch that
            # dies mid-commit must not strand its candidate frames
            if enriched is not None:
                enriched.unpersist()
            h_new.unpersist()

    q = (
        stream.writeStream.foreachBatch(_ingest)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_incremental_repeated_spans(
    stream: DataFrame,
    root: str,
    layer: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 50,
    grams_table: str = "standing_grams",
    spans_table: str = "repeated_spans",
    retractable_grams: bool | None = None,
) -> None:
    """Streaming long-substring dedup — the production form of
    ``operators.dedup.incremental_repeated_spans`` and the third
    incremental-dedup sink (exact → near-dup → span grain): per
    micro-batch, maximal token spans of the batch's docs whose k-grams
    repeat against everything ingested so far (or within the batch) are
    reported, and the batch's genuinely-new gram hashes append to the
    standing gram SET. One atomic marker-gated commit per batch
    (append segments), exactly-once under replay.

    Arrival-time contract (stated, not hidden): a doc's spans are
    judged against the corpus AS OF its arrival — a repeat created by
    a LATER doc is reported on that later doc only (same asymmetry as
    the pair sinks, where a pair lands at its later member's batch).
    That is the ingest-filter semantics: trim redundant text when it
    arrives.

    Scale shape per trigger: the batch pays its own gram explode; its
    distinct hashes probe the standing set via ONE map-side scan
    (broadcast-guarded); committed bytes are O(batch's new grams +
    spans). The standing gram set is never shuffled or rewritten.

    ``retractable_grams`` (ADVICE r12 #2): the gram-table SHAPE to
    bootstrap when the standing table does not exist yet — True commits
    doc-attributed (doc_id, gh) rows (``doc_gram_set`` shape,
    retraction-capable) from the FIRST trigger; False/None the set
    shape. Once the table exists its schema is inferred and wins;
    passing an explicit flag that CONTRADICTS the standing shape raises
    before anything commits (the mixed-segment hazard ADVICE r12 #1
    names).
    """
    from novi_pdq_etl_project_prod_spark import cache
    from novi_pdq_etl_project_prod_spark.operators.dedup import (
        incremental_repeated_spans_state,
    )
    from novi_pdq_etl_project_prod_spark.sources.layers import (
        commit_tables,
        read_manifest_table,
    )

    marker = batch_marker_key(checkpoint_dir)
    _maybe_migrate_legacy(root, layer, checkpoint_dir)

    def _ingest(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        last = _last_applied_batch(root, layer, marker)
        if last is not None and _batch_id <= last:
            return  # replayed batch: its spans and grams are in
        spark = batch_df.sparkSession
        batch_df = batch_df.persist()
        try:
            # cache.scope: the span core tracks its gram-count frame —
            # drained at trigger end, success or failure, instead of
            # accumulating one persisted frame per micro-batch for the
            # session lifetime (round-11 review)
            with cache.scope():
                standing = read_manifest_table(
                    spark, root, layer, grams_table
                )
                if standing is None:
                    # bootstrap (ADVICE r12 #2): the first trigger fixes
                    # the table's shape — without the parameter a
                    # retractable table could never be born here
                    attributed = bool(retractable_grams)
                else:
                    attributed = "doc_id" in standing.columns
                    if (
                        retractable_grams is not None
                        and retractable_grams != attributed
                    ):
                        raise ValueError(
                            f"{grams_table} is "
                            f"{'doc-attributed' if attributed else 'set-shaped'}"
                            f" but retractable_grams={retractable_grams}: "
                            "the standing table's shape wins — drop the "
                            "flag or migrate the table explicitly"
                        )
                if standing is not None and attributed:
                    # doc-attributed (retractable) gram table: filter
                    # retracted contributors so their grams stop
                    # flagging future spans (round 12; the set-shaped
                    # default has no contributor to subtract — its
                    # non-retractability is documented in plans.retract)
                    from novi_pdq_etl_project_prod_spark.plans.retract import (  # noqa: E501
                        read_tombstones,
                        retract_ids,
                    )

                    standing = retract_ids(
                        standing,
                        read_tombstones(spark, root, layer),
                        "doc_id",
                    )
                # spans AND the gram delta from ONE gram explode and
                # ONE standing-set probe (round-11 review: the sink
                # previously rebuilt both independently, doubling the
                # standing-side scan cost per trigger)
                state = incremental_repeated_spans_state(
                    batch_df, standing, id_col, text_col, k,
                    attributed=attributed,
                )
                spans = cache.track(state["spans"])
                # the gram delta also runs twice (isEmpty + write):
                # uncached it re-probes the standing gram set per extra
                # action. A doc-attributed standing table stays
                # doc-attributed (set-shaped (gh) rows in it would be
                # NULL-contributor rows no retraction could remove);
                # doc_grams comes from the SAME cached explode as the
                # spans, not a second tokenize (round-12 second review)
                new_grams = cache.track(
                    state["doc_grams"] if attributed else state["new_grams"]
                )
                tables = {
                    t: df
                    for t, df in (
                        (grams_table, new_grams),
                        (spans_table, spans),
                    )
                    if not df.isEmpty()
                }
                commit_tables(
                    tables,
                    root,
                    layer,
                    meta={marker: _batch_id},
                    append_tables=tuple(tables),
                )
        finally:
            batch_df.unpersist()

    q = (
        stream.writeStream.foreachBatch(_ingest)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_dsir_weights(
    stream: DataFrame,
    root: str,
    layer: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
    target_counts_table: str = "dsir_target_buckets",
    raw_counts_table: str = "dsir_raw_buckets",
    weights_table: str = "dsir_weights",
    maintenance_every: int | None = None,
    maintenance_kwargs: dict | None = None,
) -> None:
    """Streaming DSIR scoring — the production form of
    ``operators.text.incremental_dsir_logweights`` and the fourth
    incremental-state sink, introducing DISTRIBUTION-valued state to
    the family (exact = hash set, near-dup = signature table, spans =
    gram set, this = bucket COUNTS): per micro-batch, every arriving
    raw doc gets its importance weight against the target distribution
    and the raw distribution AS OF arrival, then the batch's own
    bucket-count DELTAS append to the standing raw counts. One atomic
    marker-gated commit per batch; exactly-once under replay.

    Additive-state contract: ``raw_counts_table`` holds (b, n) DELTA
    rows — an append commit is O(batch) like every sink here, readers
    reconstruct true counts with one B-bounded ``groupBy(b).sum(n)``
    (done inside the scoring op), and segment compaction (a row union)
    preserves the sum, so the maintenance loop needs no special case.

    Arrival-time contract (stated, not hidden): q̂ moves as the corpus
    grows — a doc scored in batch 1 is NOT re-scored when batch 2
    shifts the raw distribution; the weights table records the
    selection signal each doc was admitted under, which is the
    online-selection semantics (re-scoring the full corpus is the
    batch op m75).

    The caller seeds ``target_counts_table`` once
    (``commit_tables({target_counts_table:
    dsir_bucket_counts(target)})``); the sink raises if it is absent —
    scoring against an implicit empty target would silently invert the
    signal.

    n_buckets provenance (ADVICE r11): the scoring op's max(b) probe is
    one-sided — a count table built with a SMALLER n_buckets (128 read
    at 256) passes it and silently skews every weight. This sink closes
    the hole at the durability layer: it records
    ``dsir_n_buckets:<table>`` in the commit meta for both count tables
    and refuses to run when a recorded value disagrees with its own.

    ``maintenance_every``/``maintenance_kwargs``: the same every-Nth-
    batch :func:`plans.maintenance.run_maintenance_tick` cadence as
    ``run_incremental_ingest`` — bounds the delta-segment accumulation
    this sink's O(batch) appends otherwise leave to an external
    scheduler.
    """
    from novi_pdq_etl_project_prod_spark import cache
    from novi_pdq_etl_project_prod_spark.operators.text import (
        incremental_dsir_logweights,
    )
    from novi_pdq_etl_project_prod_spark.sources.layers import (
        commit_tables,
        read_manifest_meta,
        read_manifest_table,
    )

    marker = batch_marker_key(checkpoint_dir)
    _maybe_migrate_legacy(root, layer, checkpoint_dir)
    bucket_keys = {
        f"dsir_n_buckets:{t}": n_buckets
        for t in (target_counts_table, raw_counts_table)
    }

    def _ingest(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        last = _last_applied_batch(root, layer, marker)
        if last is not None and _batch_id <= last:
            return  # replayed batch: its weights and deltas are in
        spark = batch_df.sparkSession
        batch_df = batch_df.persist()
        try:
            with cache.scope():
                recorded_meta = read_manifest_meta(root, layer)
                for key, want in bucket_keys.items():
                    got = recorded_meta.get(key)
                    if got is not None and int(got) != int(want):
                        raise ValueError(
                            f"{key} recorded as {got} but this sink runs "
                            f"n_buckets={want}: md5%{got} and md5%{want} "
                            "bucket the same token differently — every "
                            "weight would silently skew (ADVICE r11)"
                        )
                target = read_manifest_table(
                    spark, root, layer, target_counts_table
                )
                if target is None:
                    raise ValueError(
                        f"{target_counts_table} not found in {layer}: "
                        "seed the target distribution before streaming "
                        "(commit_tables({'"
                        f"{target_counts_table}': dsir_bucket_counts(...)"
                        "}))"
                    )
                standing = read_manifest_table(
                    spark, root, layer, raw_counts_table
                )
                res = incremental_dsir_logweights(
                    batch_df,
                    target,
                    standing,
                    id_col,
                    text_col,
                    n_buckets,
                )
                # both frames run twice (isEmpty probe + commit write);
                # uncached, each extra action re-scans the growing
                # target/raw delta-count tables (round-11 review)
                weights = cache.track(
                    res["weights"].select(
                        F.col("id").alias(id_col), "n_feats", "logweight"
                    )
                )
                new_counts = cache.track(res["new_counts"])
                tables = {
                    t: df
                    for t, df in (
                        (weights_table, weights),
                        (raw_counts_table, new_counts),
                    )
                    if not df.isEmpty()
                }
                commit_tables(
                    tables,
                    root,
                    layer,
                    meta={marker: _batch_id, **bucket_keys},
                    append_tables=tuple(tables),
                )
            _maybe_maintenance(
                spark, root, layer, _batch_id,
                maintenance_every, maintenance_kwargs,
            )
        finally:
            batch_df.unpersist()

    q = (
        stream.writeStream.foreachBatch(_ingest)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _maybe_maintenance(
    spark,
    root: str,
    layer: str,
    batch_id: int,
    every: int | None,
    kwargs: dict | None,
) -> None:
    """Every-Nth-batch maintenance cadence shared by the incremental-
    state sinks (VERDICT r11 #7): runs
    :func:`plans.maintenance.run_maintenance_tick` AFTER the batch's
    commit. Idempotent and CAS-protected, so safe under replay (a
    replayed batch skips its commit and never reaches this hook)."""
    if every and batch_id % every == 0:
        from novi_pdq_etl_project_prod_spark.plans.maintenance import (
            run_maintenance_tick,
        )

        run_maintenance_tick(spark, root, layer, **(kwargs or {}))


def stream_bm25_index(
    stream: DataFrame,
    root: str,
    layer: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    postings_table: str = "bm25_postings",
    doclens_table: str = "bm25_doclens",
    maintenance_every: int | None = None,
    maintenance_kwargs: dict | None = None,
) -> None:
    """Streaming maintenance of the persisted BM25 inverted index
    (``operators.text.build_bm25_index``): each micro-batch appends its
    own (term, id, tf) postings and (id, dl) doclens rows as delta
    segments — O(batch) commits, one atomic marker-gated manifest per
    trigger, exactly-once under replay. Searches read the accumulated
    tables through ``bm25_scores_from_index``, which sums per key, so
    no merge-on-write and no special compaction handling (the additive
    contract shared with the DSIR bucket counts).

    Immutable-id contract (stated, not hidden): a doc id must enter the
    index at most once — re-ingesting an id would double its tf/dl.
    Upstream, that is exactly what the exact-dedup pre-filter
    guarantees (``stream_incremental_exact_dups`` /
    ``run_incremental_ingest``): this sink indexes an ALREADY-DEDUPED
    stream, the reference's staging→curated layering applied to search.
    Retraction composes downstream: readers filter the accumulated
    tables against the layer's tombstones (``plans.retract``). The id
    contract tightens accordingly: a RETRACTED id stays dead until
    :func:`plans.retract.compact_retractions` physically removes its
    rows — re-ingesting it earlier would be silently suppressed by the
    tombstone anti-join. Re-arrivals of the same CONTENT under a new id
    (a fresh fetch identity) are unaffected.

    ``maintenance_every``/``maintenance_kwargs``: optional every-Nth-
    batch :func:`plans.maintenance.run_maintenance_tick` cadence
    (VERDICT r11 #7) — same contract as ``run_incremental_ingest``.
    """
    from novi_pdq_etl_project_prod_spark import cache
    from novi_pdq_etl_project_prod_spark.operators.text import (
        build_bm25_index,
    )
    from novi_pdq_etl_project_prod_spark.sources.layers import commit_tables

    marker = batch_marker_key(checkpoint_dir)
    _maybe_migrate_legacy(root, layer, checkpoint_dir)

    def _ingest(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        last = _last_applied_batch(root, layer, marker)
        if last is not None and _batch_id <= last:
            return  # replayed batch: its postings are in
        batch_df = batch_df.persist()
        try:
            with cache.scope():
                idx = build_bm25_index(batch_df, id_col, text_col)
                postings = cache.track(idx["postings"])
                doclens = cache.track(idx["doclens"])
                tables = {
                    t: df
                    for t, df in (
                        (postings_table, postings),
                        (doclens_table, doclens),
                    )
                    if not df.isEmpty()
                }
                commit_tables(
                    tables,
                    root,
                    layer,
                    meta={marker: _batch_id},
                    append_tables=tuple(tables),
                )
            _maybe_maintenance(
                batch_df.sparkSession, root, layer, _batch_id,
                maintenance_every, maintenance_kwargs,
            )
        finally:
            batch_df.unpersist()

    q = (
        stream.writeStream.foreachBatch(_ingest)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_retractions(
    stream: DataFrame,
    root: str,
    layer: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    dsir_counts: dict | None = None,
    tombstones_table: str | None = None,
    maintenance_every: int | None = None,
    maintenance_kwargs: dict | None = None,
) -> None:
    """Streaming retraction — the sink form of
    :func:`plans.retract.retract_docs`, completing the curation↔ingest
    composition (VERDICT r11 #1) for pipelines whose drop lists ARRIVE
    as a stream (a curation job emitting canonicalization drops or span
    rewrites batch by batch): each micro-batch's drop docs append ONE
    atomic manifest commit carrying their ids as a tombstone segment
    plus a negative bucket-delta segment per registered DSIR count
    table (``dsir_counts``: table → n_buckets). O(batch) per trigger —
    nothing standing is scanned.

    Exactly-once under replay: marker-gated on the checkpoint identity
    like every sink here, which matters MORE for retraction than for
    ingest — a replayed negative delta would double-subtract (the
    additive tables are not idempotent), so the gate is the correctness
    line, not just a hygiene line. DOC-level idempotence on top:
    duplicate drop rows within a batch and docs already tombstoned (an
    at-least-once upstream re-emitting a drop, or one drop event per
    near-dup partner) are filtered out before the deltas are computed —
    the batch gate alone cannot see a re-emission under a NEW batch id.
    Cumulative accounting rides ONE rolling
    ``retraction_counts:<marker>`` meta key (the ingest-counts
    convention) — per-batch ledger keys would grow the manifest doc
    unboundedly, and every later commit on the layer rewrites it.

    The reference analogue is the delete half of its idempotent
    delete-month-then-append (``dags/pdq_etl_dag.py:183-187``) — there
    the retraction unit is a month slice, here it is a drop list.
    """
    from novi_pdq_etl_project_prod_spark import cache
    from novi_pdq_etl_project_prod_spark.plans.retract import (
        TOMBSTONES_TABLE,
        _dsir_guard,
        dsir_negative_deltas,
        retract_ids,
    )
    from novi_pdq_etl_project_prod_spark.sources.layers import (
        commit_tables,
        current_manifest_version,
        read_manifest,
        read_manifest_meta,
        read_manifest_table,
    )

    tomb_table = tombstones_table or TOMBSTONES_TABLE
    marker = batch_marker_key(checkpoint_dir)
    _maybe_migrate_legacy(root, layer, checkpoint_dir)
    counts_key = f"retraction_counts:{marker}"

    def _ingest(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        last = _last_applied_batch(root, layer, marker)
        if last is not None and _batch_id <= last:
            return  # replayed batch: its tombstones/deltas are in
        spark = batch_df.sparkSession
        # CAS pin (round-12 second review): the doc-level anti-join
        # below is only race-proof if the commit conflicts when ANY
        # writer lands between the tombstone read and the flip — a
        # conflict fails the batch and the stream's retry re-reads
        base = current_manifest_version(root, layer)
        drop = batch_df.dropDuplicates([id_col])
        existing = read_manifest_table(spark, root, layer, tomb_table)
        if existing is not None:
            drop = retract_ids(drop, existing, id_col)
        drop = drop.persist()
        try:
            with cache.scope():
                meta = read_manifest_meta(root, layer)
                manifest = read_manifest(root, layer)
                n_drop = drop.count()
                dfs = {}
                if n_drop:
                    dfs[tomb_table] = drop.select(
                        F.col(id_col).alias("id")
                    )
                bucket_keys = _dsir_guard(
                    meta, manifest, dsir_counts, layer
                )
                if n_drop:
                    for tbl, n_buckets in sorted(
                        (dsir_counts or {}).items()
                    ):
                        dfs[tbl] = dsir_negative_deltas(
                            drop, id_col, text_col, int(n_buckets)
                        )
                prior = meta.get(counts_key) or {}
                total = {
                    "batches": int(prior.get("batches", 0)) + 1,
                    "n_docs": int(prior.get("n_docs", 0)) + n_drop,
                }
                commit_tables(
                    dfs,
                    root,
                    layer,
                    expected_base=base,
                    meta={
                        marker: _batch_id,
                        counts_key: total,
                        **bucket_keys,
                    },
                    append_tables=tuple(dfs),
                )
            _maybe_maintenance(
                spark, root, layer, _batch_id,
                maintenance_every, maintenance_kwargs,
            )
        finally:
            drop.unpersist()

    q = (
        stream.writeStream.foreachBatch(_ingest)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
