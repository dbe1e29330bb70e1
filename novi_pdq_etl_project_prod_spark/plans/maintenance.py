"""The layer maintenance tick — one call that runs every table-layout
policy the engine has, the way the reference's schema bakes its layout
upkeep into the table contract (the b-tree on the month key,
``sql/schema.sql:17,25``): layout maintenance is part of owning a
table, not an operator someone remembers to run.

Composes, per layer:

1. :func:`~novi_pdq_etl_project_prod_spark.sources.layers.maybe_compact`
   for EVERY table in the live manifest — the segment-count /
   small-segment-bytes policy (VERDICT r10 #1) that bounds append-table
   read amplification (measured: 1,000 accumulated segments cost 6.4×
   the 10-segment scan; one compaction restores base — SCALE.md r11);
2. the clustering-health policy from r06/r07 for every table the
   caller names in ``zorder_cols`` — routed by COMMIT LAYER (round 12):
   pointer-layout tables go through
   :func:`~novi_pdq_etl_project_prod_spark.sources.skipping.maybe_optimize`
   (per-table ``_CURRENT`` CAS), manifest-committed tables through
   :func:`~novi_pdq_etl_project_prod_spark.sources.skipping.maybe_optimize_manifest`
   — a ``commit_tables`` whole-snapshot rewrite that audits the UNION
   of the table's segments, resets its segment list (doubling as a
   compaction) and CAS-pins against concurrent sinks. A pointer-only
   rewrite of a manifest table would diverge the two commit layers,
   which is why the pre-round-12 tick skipped these loudly instead.
3. optional :func:`~novi_pdq_etl_project_prod_spark.sources.layers.vacuum`
   when ``vacuum_retain`` is given — GC runs AFTER compaction so the
   just-unreferenced segment dirs age out on the same tick cadence.

Everything is a metadata-cost audit unless a threshold trips; the tick
is safe at any cadence and against concurrent sinks (each policy's
rewrite is CAS-protected; a lost CAS is reported, never retried into a
running ingest). Scheduling the tick is the caller's concern (cron, an
Airflow task, a foreachBatch hook on a quiet stream) — the engine
deliberately never surprise-rewrites a table mid-trigger.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import SparkSession

from novi_pdq_etl_project_prod_spark.sources.layers import (
    MedallionLayer,
    SnapshotConflictError,
    maybe_compact,
    read_manifest,
    vacuum,
)
from novi_pdq_etl_project_prod_spark.sources.skipping import (
    maybe_optimize,
    maybe_optimize_manifest,
)


def run_maintenance_tick(
    spark: SparkSession,
    root: str,
    layer: MedallionLayer | str,
    zorder_cols: Mapping[str, list[str]] | None = None,
    max_segments: int = 8,
    small_segment_bytes: int | None = None,
    max_small_segments: int | None = None,
    vacuum_retain: int | None = None,
    vacuum_grace_seconds: float | None = None,
    retraction_id_cols: Mapping[str, str] | bool = False,
    retraction_min_tombstones: int = 1,
    fold_markers_min: int | None = None,
    ivf_rebuild: Mapping | None = None,
) -> dict:
    """One maintenance pass over ``layer``; returns the full decision
    report ``{"compact": {table: decision}, "optimize": {table:
    decision-or-skip}, "retractions": decision-or-None,
    "marker_fold": decision-or-None, "ann_rebuild": decision-or-None,
    "vacuum": removed-or-None}`` — every policy's no-op is recorded,
    so an operator can diff ticks.

    ``fold_markers_min`` (round 13, VERDICT r12 #3): when the layer's
    ``retraction:<id>`` meta-marker count reaches the threshold, fold
    the markers into the ``applied_retractions`` table
    (:func:`plans.retract.fold_retraction_markers` — exactly-once
    membership preserved, manifest doc bounded; measured ~76 B/marker,
    ``tools/retraction_marker_probe_r13.json``). Audit cost below the
    threshold is one meta read. Runs AFTER the retraction rewrite (both
    are CAS commits; ordering only affects which conflicts first) and
    before vacuum.

    ``ivf_rebuild`` (round 13): kwargs for
    :func:`operators.similarity.maybe_rebuild_ivf` (at minimum
    ``source_table``; plus index/training params) — the ANN index
    refresh joins the tick, so ingest appends and curation retractions
    physically reach the persisted index on the same cadence as every
    other layout policy. Ordered AFTER the retraction rewrite (the
    rebuild then reads the already-compacted corpus) and before vacuum
    (superseded index snapshots age out on this same tick).

    ``retraction_id_cols`` (round 12) schedules the retraction
    physical-delete on the same cadence: ``True`` uses
    :data:`plans.retract.RETRACT_ID_COLS`, a mapping overrides it; the
    rewrite fires only when the layer's tombstone count reaches
    ``retraction_min_tombstones`` (the amortization dial — the
    tombstone anti-join is cheap, so batching many retractions into one
    rewrite is usually right). Runs BEFORE segment compaction (the
    whole-table rewrite resets segment lists anyway, so compacting
    first would be wasted work on the same tick) and before vacuum (the
    newly-unreferenced snapshot dirs age out on this same cadence). A
    lost CAS against a concurrent ingest is reported, never retried
    into the running stream — the next tick retries naturally.
    """
    report: dict = {
        "compact": {},
        "optimize": {},
        "retractions": None,
        "marker_fold": None,
        "ann_rebuild": None,
        "vacuum": None,
    }
    if retraction_id_cols is not False:
        from novi_pdq_etl_project_prod_spark.plans.retract import (
            compact_retractions,
            read_tombstones,
        )

        if not retraction_id_cols and retraction_id_cols is not True:
            # an explicitly-passed EMPTY mapping is a configuration
            # error, not "feature off": running compact_retractions
            # with it would drop the tombstones while rewriting nothing
            # — retracted rows would silently resurface
            raise ValueError(
                "retraction_id_cols={} would clear tombstones without "
                "rewriting any table; pass False to disable the lane "
                "or True for RETRACT_ID_COLS"
            )
        tomb = read_tombstones(spark, root, layer)
        n_tomb = 0 if tomb is None else tomb.count()
        if n_tomb >= retraction_min_tombstones and n_tomb > 0:
            try:
                report["retractions"] = compact_retractions(
                    spark,
                    root,
                    layer,
                    None if retraction_id_cols is True
                    else retraction_id_cols,
                )
            except SnapshotConflictError as exc:
                report["retractions"] = {
                    "applied": False,
                    "conflict": str(exc),
                }
        else:
            report["retractions"] = {
                "applied": False,
                "tombstones": n_tomb,
                "threshold": retraction_min_tombstones,
            }
    if fold_markers_min is not None:
        from novi_pdq_etl_project_prod_spark.plans.retract import (
            fold_retraction_markers,
        )
        from novi_pdq_etl_project_prod_spark.sources.layers import (
            read_manifest_meta,
        )

        n_markers = sum(
            1
            for k in read_manifest_meta(root, layer)
            if isinstance(k, str) and k.startswith("retraction:")
        )
        if n_markers >= fold_markers_min and n_markers > 0:
            try:
                report["marker_fold"] = fold_retraction_markers(
                    spark, root, layer
                )
            except SnapshotConflictError as exc:
                report["marker_fold"] = {
                    "applied": False,
                    "conflict": str(exc),
                }
        else:
            report["marker_fold"] = {
                "applied": False,
                "markers": n_markers,
                "threshold": fold_markers_min,
            }
    if ivf_rebuild is not None:
        from novi_pdq_etl_project_prod_spark.operators.similarity import (
            maybe_rebuild_ivf,
        )

        cfg = dict(ivf_rebuild)
        for k in ("spark", "root", "force"):
            if k in cfg:
                # spark/root are the tick's own; force is the tick's
                # compaction-coupling decision — a user value here
                # would silently re-open the reader-guard hole
                raise ValueError(
                    f"ivf_rebuild may not override {k!r} — it is set "
                    "by the maintenance tick"
                )
        # COMPACTION COUPLING (second round-13 review): the reader-side
        # tombstone filter (ivf_index_topk(tombstones=...)) is only
        # correct while tombstones exist, and the retraction lane above
        # just physically cleared them when it fired — so that same
        # tick FORCES the index rebuild regardless of the staleness
        # threshold. Below-threshold retractions stay covered by the
        # reader filter until their compaction day.
        force = bool(
            isinstance(report["retractions"], dict)
            and report["retractions"].get("applied")
        )
        try:
            report["ann_rebuild"] = maybe_rebuild_ivf(
                spark, root, cfg.pop("layer", layer), force=force, **cfg
            )
        except SnapshotConflictError as exc:
            report["ann_rebuild"] = {"fired": False, "conflict": str(exc)}
        except Exception as exc:  # noqa: BLE001 — lane isolation: one
            # failing policy must not abort the tick or lose the report
            # (the compact lane's convention)
            report["ann_rebuild"] = {
                "fired": False,
                "error": f"{type(exc).__name__}: {exc}",
            }
    manifest_tables = set(read_manifest(root, layer))
    for tbl in sorted(manifest_tables):
        try:
            report["compact"][tbl] = maybe_compact(
                spark,
                root,
                layer,
                tbl,
                max_segments=max_segments,
                small_segment_bytes=small_segment_bytes,
                max_small_segments=max_small_segments,
            )
        except SnapshotConflictError as exc:
            # a busy ingest out-raced the compactor's CAS retries:
            # record the conflict and keep auditing the other tables —
            # one contended table must not abort the tick or lose the
            # report (round-11 review); next tick retries naturally
            report["compact"][tbl] = {
                "table": tbl,
                "fired": False,
                "conflict": str(exc),
            }
    for tbl, cols in sorted((zorder_cols or {}).items()):
        if tbl in manifest_tables:
            # manifest-committed table: the z-order rewrite goes through
            # commit_tables (round 12 — previously a loud skip): a
            # pointer-level rewrite would diverge the two commit layers
            report["optimize"][tbl] = maybe_optimize_manifest(
                spark, root, layer, tbl, cols
            )
            continue
        report["optimize"][tbl] = maybe_optimize(
            spark, root, layer, tbl, cols
        )
    if vacuum_retain is not None:
        kwargs = {}
        if vacuum_grace_seconds is not None:
            kwargs["grace_seconds"] = vacuum_grace_seconds
        report["vacuum"] = vacuum(
            root, layer, retain=vacuum_retain, **kwargs
        )
    return report
