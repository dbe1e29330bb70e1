"""Data-skipping layout: z-order clustering + file-level min/max pruning.

At 100 TB the fastest scan is the one that never happens. Engines like
Delta/Iceberg skip whole files using per-file column min/max statistics;
the layout that makes those statistics selective for MULTI-column
predicates is a space-filling curve (z-order). Parquet already stores
the min/max footers — this module provides:

- ``zorder_col``: a pure-expression Morton code (bit-interleave) of two
  integer dimensions — JVM-side, codegen-friendly, no UDF;
- ``write_zordered``: range-partition + sort the data by its z-value so
  each output file covers a small rectangle of (x, y) space;
- ``file_minmax_stats`` / ``pruned_read``: read parquet footer
  statistics and plan a scan over only the files whose [min, max]
  intervals intersect the predicate — the same skip a table format's
  manifest would give, built from plain parquet.

The z-value expression is reproducible in ANSI SQL (shift/and/or), so
the layout decision itself is oracle-checkable (catalog query z1).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def zorder_col_multi(cols: list, bits: int = 12) -> Column:
    """N-dimensional Morton code: round-robin-interleave the low
    ``bits`` bits of each non-negative integer column (column ``j`` owns
    bit positions ``i*n + j``). Built as a literal-shift expression tree
    — whole-stage-codegen'd, no UDF, and expressible verbatim in any SQL
    dialect with >>, &, <<, |. ``bits * len(cols)`` must stay < 63."""
    n = len(cols)
    if bits * n >= 63:
        raise ValueError(f"{bits} bits x {n} cols overflows a long")
    cast = [
        (F.col(c) if isinstance(c, str) else c).cast("long") for c in cols
    ]
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cast):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j)
            )
    return z


def zorder_col(x: Column | str, y: Column | str, bits: int = 12) -> Column:
    """2-D Morton code (x in even bit positions, y in odd)."""
    return zorder_col_multi([x, y], bits)


def zorder_sql_multi(cols: list[str], bits: int = 12) -> str:
    """The ANSI-SQL twin of :func:`zorder_col_multi` (oracle queries)."""
    n = len(cols)
    terms = []
    for i in range(bits):
        for j, c in enumerate(cols):
            terms.append(f"((({c} >> {i}) & 1) << {i * n + j})")
    return " | ".join(terms)


def zorder_sql(x: str, y: str, bits: int = 12) -> str:
    """The ANSI-SQL twin of :func:`zorder_col` (used by the z1 oracle)."""
    return zorder_sql_multi([x, y], bits)


def zorder_frame(
    df: DataFrame,
    cols: list[str],
    n_files: int,
    bits: int = 12,
) -> DataFrame:
    """The z-ordered SHAPE of ``df`` as a frame: range-partitioned on
    the Morton code (contiguous curve segments per output file → tight
    per-file min/max hyper-rectangles on EVERY dimension), sorted within
    partitions so page-level stats are tight too, helper column
    dropped. For commit paths that own the write themselves —
    :func:`write_zordered` for pointer-snapshot tables, and the
    manifest-level rewrite (:func:`maybe_optimize_manifest`), whose
    atomic write happens inside ``commit_tables``."""
    zdf = df.withColumn("__z", zorder_col_multi(cols, bits))
    return (
        zdf.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    bits: int = 12,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered on the z-order
    of ``cols`` (:func:`zorder_frame`); the layout survives in the file
    boundaries."""
    zorder_frame(df, cols, n_files, bits).write.mode("overwrite").parquet(
        path
    )


def file_minmax_stats(path: str, cols: list[str]) -> list[dict]:
    """Per-file min/max for ``cols`` from parquet footers (no data read).
    This is the manifest a table format would maintain; here it is
    derived on demand. Footer reads are O(files), not O(bytes) — at
    cluster scale the listing itself would live in a manifest table.

    Recurses into partition directories (``yyyymm=…``) with the same
    underscore/dot pruning as Spark's file discovery, so partitioned
    month tables are auditable too; columns stored only in directory
    names (not in the footers) report no stats and are conservatively
    kept by :func:`pruned_read`."""
    import pyarrow.parquet as pq

    files = []
    for dirpath, dirs, names in os.walk(path):
        dirs[:] = sorted(d for d in dirs if not d.startswith(("_", ".")))
        files.extend(
            os.path.join(dirpath, n) for n in sorted(names)
            if n.endswith(".parquet")
        )
    out = []
    for fpath in files:
        meta = pq.read_metadata(fpath)
        stat: dict = {"file": fpath}
        for col in cols:
            lo, hi = None, None
            if col not in meta.schema.names:
                stat[col] = (None, None)  # partition-dir column: no footer
                continue
            idx = meta.schema.names.index(col)
            for rg in range(meta.num_row_groups):
                s = meta.row_group(rg).column(idx).statistics
                if s is None or not s.has_min_max:
                    lo, hi = None, None
                    break
                lo = s.min if lo is None else min(lo, s.min)
                hi = s.max if hi is None else max(hi, s.max)
            stat[col] = (lo, hi)
        out.append(stat)
    return out


def pruned_read(
    spark: SparkSession,
    path: str,
    predicates: dict[str, tuple],
) -> tuple[DataFrame, int, int]:
    """Scan only the files whose footer [min, max] interval intersects
    every ``col: (lo, hi)`` predicate; the predicate is still applied to
    the surviving rows (stats prune files, they don't filter rows).
    Returns (dataframe, files_read, files_total). Files with missing
    stats are conservatively kept."""
    stats = file_minmax_stats(path, list(predicates))
    keep = []
    for st in stats:
        ok = True
        for col, (lo, hi) in predicates.items():
            fmin, fmax = st[col]
            if fmin is None:
                continue  # unknown → must read
            if fmax < lo or fmin > hi:
                ok = False
                break
        if ok:
            keep.append(st["file"])
    df = spark.read.parquet(*keep) if keep else spark.read.parquet(path).limit(0)
    for col, (lo, hi) in predicates.items():
        df = df.where(F.col(col).between(lo, hi))
    return df, len(keep), len(stats)


def maybe_optimize(
    spark: SparkSession,
    root: str,
    layer,
    table: str,
    cols: list[str],
    overlap_threshold: float = 0.5,
    n_files: int | None = None,
    bits: int = 12,
) -> dict:
    """OPTIMIZE scheduler (VERDICT r06 item 5): the policy that closes
    the loop :func:`clustering_report` opens. Reads the layout audit for
    the table's LIVE snapshot; when any audited column's NORMALIZED
    clustering factor — ``avg_overlap / (n_files − 1)``, the fraction of
    other files a file's [min, max] interval intersects (shuffled ≈ 1.0,
    well-clustered → 0; scale-free, so one threshold serves a 10-file
    and a 100k-file table, and a d-dim z-order's per-dim floor of
    ~(1/n_files)^(1/d) sits safely under the default 0.5) — exceeds
    ``overlap_threshold``, rewrites the table z-ordered on ``cols``
    through the snapshot protocol; otherwise no-ops (in particular,
    immediately re-calling after a rewrite must not churn). Returns the
    decision record either way.

    Concurrency/atomicity: the rewrite commits compare-and-swap against
    the snapshot token read WITH the audit, so a concurrent writer's
    commit aborts the optimize cleanly (their data wins; the layout is
    re-auditable next tick) — a re-cluster must never clobber data it
    didn't read. Readers resolve through the ``_CURRENT`` pointer and
    see the old complete layout until the atomic flip, never a blend —
    the same crash-at-any-step guarantee the whole protocol carries.

    Cost model: the audit is O(files) footer metadata; the rewrite is
    one full scan + range shuffle, paid only past the threshold. This
    is the Delta/Iceberg OPTIMIZE loop (audit → threshold → rewrite)
    over plain parquet. ``n_files`` defaults to the current file count
    (re-cluster, don't resize); compose with ``compact_table`` when the
    file-count itself is the problem.
    """
    from novi_pdq_etl_project_prod_spark.sources.layers import (
        SnapshotConflictError,
        _commit_snapshot_write,
        current_snapshot,
        resolve_table_path,
        table_path,
    )

    def _factors(report: dict) -> dict[str, float]:
        denom = max(report["n_files"] - 1, 1)
        return {
            c: r["avg_overlap"] / denom
            for c, r in report["columns"].items()
            if r
        }

    path = table_path(root, layer, table)
    base = current_snapshot(path)
    live = resolve_table_path(path)
    report = clustering_report(live, cols)
    factors = _factors(report)
    decision: dict = {
        "table": table,
        "n_files": report["n_files"],
        "clustering": factors,
        "threshold": overlap_threshold,
        "fired": False,
    }
    if report["n_files"] <= 1 or not factors:
        return decision
    if max(factors.values()) <= overlap_threshold:
        return decision
    df = spark.read.parquet(live)
    nf = n_files or report["n_files"]
    try:
        new_live = _commit_snapshot_write(
            lambda snap_dir: write_zordered(df, snap_dir, cols, nf, bits=bits),
            path,
            expected_base=base,
        )
    except SnapshotConflictError:
        decision["conflict"] = True
        return decision
    decision["fired"] = True
    decision["after"] = _factors(clustering_report(new_live, cols))
    return decision


def clustering_report(path: str, cols: list[str]) -> dict:
    """Layout-health audit from footer statistics alone: how selective
    would min/max file skipping actually be on this table?

    For each column: ``avg_span_frac`` (mean file [min,max] span as a
    fraction of the column's global span — small means each file covers
    a narrow slice) and ``avg_overlap`` (mean number of OTHER files
    whose interval intersects a file's — the clustering factor; a
    perfectly clustered layout approaches 0, a shuffled layout
    approaches n_files−1). The signal a table-maintenance job watches:
    when appends/updates push overlap up, it is time to re-run
    ``write_zordered`` (compaction), exactly like a Delta/Iceberg
    OPTIMIZE scheduler.

    Footer-only: O(files) metadata reads, no data scan. Numeric columns
    only (span arithmetic).
    """
    return _report_from_stats(file_minmax_stats(path, cols), cols)


def clustering_report_paths(paths: list[str], cols: list[str]) -> dict:
    """:func:`clustering_report` over the UNION of several parquet dirs
    — the audit shape for a manifest table's segment list, where layout
    health is a property of what a reader actually scans (all segments
    together), not of any one segment."""
    stats = [st for p in paths for st in file_minmax_stats(p, cols)]
    return _report_from_stats(stats, cols)


def _report_from_stats(stats: list[dict], cols: list[str]) -> dict:
    report: dict = {"n_files": len(stats), "columns": {}}
    for col in cols:
        iv = [st[col] for st in stats if st[col][0] is not None]
        if not iv:
            report["columns"][col] = None
            continue
        glo = min(lo for lo, _ in iv)
        ghi = max(hi for _, hi in iv)
        span = float(ghi - glo) or 1.0
        spans = [float(hi - lo) / span for lo, hi in iv]
        overlaps = [
            sum(
                1
                for j, (lo2, hi2) in enumerate(iv)
                if j != i and not (hi2 < lo or lo2 > hi)
            )
            for i, (lo, hi) in enumerate(iv)
        ]
        report["columns"][col] = {
            "avg_span_frac": sum(spans) / len(spans),
            "avg_overlap": sum(overlaps) / len(overlaps),
            "max_overlap": max(overlaps),
        }
    return report


def maybe_optimize_manifest(
    spark: SparkSession,
    root: str,
    layer,
    table: str,
    cols: list[str],
    overlap_threshold: float = 0.5,
    n_files: int | None = None,
    bits: int = 12,
) -> dict:
    """:func:`maybe_optimize` for MANIFEST-committed tables — closing
    the gap the maintenance tick previously skipped loudly: a
    pointer-level z-order rewrite of a manifest table would diverge the
    two commit layers (manifest readers keep the old layout; the
    z-ordered snapshot is orphaned at the next roll-forward), so the
    rewrite here goes through ``commit_tables`` itself.

    Audits the UNION of the table's live segments (what a manifest
    reader actually scans); past the threshold, commits ONE z-ordered
    whole-snapshot entry — which also resets the segment list, so the
    rewrite doubles as a segment compaction. CAS-pinned to the manifest
    version read with the audit: a concurrent committer (an ingest
    sink's append, a retraction) wins and the optimize reports
    ``conflict`` instead of clobbering their segments — re-audited next
    tick. Rows are preserved verbatim (layout-only): tombstone-filtered
    readers and a later ``compact_retractions`` behave identically
    before and after.

    Same cost model and normalized clustering factor as
    :func:`maybe_optimize`; the decision record adds ``"segments"``.
    """
    from novi_pdq_etl_project_prod_spark.sources.layers import (
        SnapshotConflictError,
        _read_manifest_entry,
        _segments,
        commit_tables,
        current_manifest_version,
        read_manifest,
        table_path,
    )

    def _factors(report: dict) -> dict[str, float]:
        denom = max(report["n_files"] - 1, 1)
        return {
            c: r["avg_overlap"] / denom
            for c, r in report["columns"].items()
            if r
        }

    base = current_manifest_version(root, layer)
    entry = read_manifest(root, layer).get(table)
    if entry is None:
        return {"table": table, "fired": False, "reason": "not in manifest"}
    dirs = [
        os.path.join(table_path(root, layer, table), seg)
        for seg in _segments(entry)
    ]
    report = clustering_report_paths(dirs, cols)
    factors = _factors(report)
    decision: dict = {
        "table": table,
        "n_files": report["n_files"],
        "segments": len(dirs),
        "clustering": factors,
        "threshold": overlap_threshold,
        "fired": False,
    }
    if report["n_files"] <= 1 or not factors:
        return decision
    if max(factors.values()) <= overlap_threshold:
        return decision
    df = _read_manifest_entry(spark, root, layer, table, entry)
    nf = n_files or report["n_files"]
    try:
        commit_tables(
            {table: zorder_frame(df, cols, nf, bits)},
            root,
            layer,
            expected_base=base,
        )
    except SnapshotConflictError:
        decision["conflict"] = True
        return decision
    decision["fired"] = True
    new_entry = read_manifest(root, layer)[table]
    decision["after"] = _factors(
        clustering_report_paths(
            [
                os.path.join(table_path(root, layer, table), seg)
                for seg in _segments(new_entry)
            ],
            cols,
        )
    )
    return decision
