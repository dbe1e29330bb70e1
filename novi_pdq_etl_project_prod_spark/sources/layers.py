"""Partitioned-Parquet medallion layers with idempotent month loads
(SURVEY.md §2.1 S3, S5-S8; §1.4 mapping table).

The reference's three Postgres schemas (raw/staging/curated) become three
Parquet directory trees partitioned by the ``yyyymm`` month key. That single
layout decision replaces three reference mechanisms at once:

- the b-tree month index (reference ``sql/schema.sql:17,25``) → partition
  directories (partition pruning is automatic);
- the hand-written JDBC pushdown subquery ``(SELECT ... WHERE yyyymm = {y}) x``
  (reference ``spark_jobs/transform_operator.py:41-52``) → a plain
  ``.where(col("yyyymm") == y)`` that Catalyst prunes to one partition;
- the psycopg2 ``DELETE FROM t WHERE yyyymm = %s`` + append idempotency dance
  (reference ``spark_jobs/transform_operator.py:16-31``, done outside Spark
  because "Spark JDBC doesn't support deletes") → dynamic partition overwrite.

At 100 TB: one partition per month keeps rewrite units bounded; within a
partition, files split across executors. For very large months add a
secondary bucket column (e.g. hash of the entity key) — ``write_month_
idempotent`` accepts extra partition columns for that.
"""

from __future__ import annotations

import enum
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class MedallionLayer(str, enum.Enum):
    RAW = "raw"
    STAGING = "staging"
    CURATED = "curated"


def table_path(root: str, layer: MedallionLayer | str, table: str) -> str:
    layer_name = layer.value if isinstance(layer, MedallionLayer) else layer
    return os.path.join(root, layer_name, table)


def write_month_idempotent(
    df: DataFrame,
    root: str,
    layer: MedallionLayer | str,
    table: str,
    partition_cols: tuple[str, ...] = ("yyyymm",),
) -> str:
    """Overwrite exactly the month partitions present in ``df`` (S5/S6/S7).

    Requires ``spark.sql.sources.partitionOverwriteMode=dynamic`` (set by
    ``session.get_spark``): partitions not present in ``df`` are untouched,
    so re-running a month is idempotent — the declarative replacement for
    the reference's delete-then-append.
    """
    path = table_path(root, layer, table)
    (
        df.write.mode("overwrite")
        .partitionBy(*partition_cols)
        .parquet(path)
    )
    return path


def read_month(
    spark: SparkSession,
    root: str,
    layer: MedallionLayer | str,
    table: str,
    yyyymm: int | None = None,
) -> DataFrame:
    """Partition-pruned month-slice read (S3).

    The ``where`` on the partition column compiles to partition pruning —
    verify with ``.explain()``: the scan's ``PartitionFilters`` carries the
    predicate and only one directory is listed.
    """
    df = spark.read.parquet(table_path(root, layer, table))
    if yyyymm is not None:
        df = df.where(F.col("yyyymm") == F.lit(int(yyyymm)))
    return df


def read_table_evolved(
    spark: SparkSession,
    root: str,
    layer: MedallionLayer | str,
    table: str,
    yyyymm: int | None = None,
) -> DataFrame:
    """Schema-evolution-safe table read: months written before a column
    existed surface it as NULL instead of failing or silently dropping it.

    ``mergeSchema`` makes the scan reconcile every partition's parquet
    footer into the union schema — the month-at-a-time load pattern
    (reference: one spark-submit per month, schema drifts across years)
    makes this the correct default for historical reads. Costs one
    footer read per file at planning time (no data pass); partition
    pruning still applies on top."""
    df = spark.read.option("mergeSchema", "true").parquet(
        table_path(root, layer, table)
    )
    if yyyymm is not None:
        df = df.where(F.col("yyyymm") == F.lit(int(yyyymm)))
    return df


def compact_table(
    spark: SparkSession,
    root: str,
    layer: MedallionLayer | str,
    table: str,
    target_file_mb: int = 128,
    partition_cols: tuple[str, ...] = ("yyyymm",),
) -> int:
    """Small-file compaction — the lakehouse maintenance operator.

    Month-at-a-time incremental loads accrete one-file-per-write; at
    100 TB the scan-planning and open() overhead of millions of tiny
    files dominates query time. Rewrites EACH partition into its own
    ceil(partition_bytes / target_file_mb) files — sizing is
    per-partition, so a fat month gets many files while a thin month
    gets one (a single global repartition on the partition columns
    would collapse every month into exactly one task and one file,
    ignoring the target entirely). Returns the file count after.

    Uses on-disk byte size as the sizing signal (cheap, no data scan):
    the per-partition file counts join in as a broadcast plan and a
    salt column spreads each partition's rows across that many tasks.

    The final swap is two renames on the same filesystem; a crash
    between them leaves the table momentarily absent (the backup dir
    ``<path>__old`` still holds the data and the swap restores it on
    failure). True atomic commits need a table format with a
    transaction log (Delta/Iceberg) — this operator is the plain-
    parquet approximation.
    """
    import math
    import shutil

    path = table_path(root, layer, table)
    # leaf partition dirs -> parsed partition values + byte sizes
    plan_rows: list[dict] = []
    for dirpath, _dirs, files in os.walk(path):
        pbytes = sum(
            os.path.getsize(os.path.join(dirpath, f))
            for f in files
            if f.endswith(".parquet")
        )
        if not pbytes:
            continue
        values: dict[str, str] = {}
        for seg in os.path.relpath(dirpath, path).split(os.sep):
            if "=" in seg:
                k, _, v = seg.partition("=")
                values[k] = v
        row = {f"__pv_{c}": values.get(c) for c in partition_cols}
        row["__n_files"] = max(
            1, math.ceil(pbytes / (target_file_mb * 1024 * 1024))
        )
        plan_rows.append(row)
    df = spark.read.parquet(path)
    if not plan_rows:
        return 0
    plan_schema = (
        ", ".join(f"`__pv_{c}` string" for c in partition_cols)
        + ", `__n_files` int"
    )
    plan = spark.createDataFrame(plan_rows, plan_schema)
    cond = [
        df[c].cast("string").eqNullSafe(plan[f"__pv_{c}"]) for c in partition_cols
    ]
    # salt ∈ [0, n_files) per partition → that many shuffle groups, hence
    # that many output files, per partition directory
    out = (
        df.join(F.broadcast(plan), cond, "left")
        .withColumn(
            "__salt",
            F.floor(
                F.rand(42) * F.coalesce(F.col("__n_files"), F.lit(1))
            ).cast("int"),
        )
        .repartition(*[F.col(c) for c in partition_cols], F.col("__salt"))
        .drop("__salt", "__n_files", *[f"__pv_{c}" for c in partition_cols])
    )
    out.write.mode("overwrite").partitionBy(*partition_cols).parquet(path + "__compact")
    bak = path + "__old"
    os.rename(path, bak)
    try:
        os.rename(path + "__compact", path)
    except OSError:
        os.rename(bak, path)  # restore the original table
        raise
    shutil.rmtree(bak)
    return sum(
        1
        for _dp, _dn, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )


def overwrite_snapshot(df: DataFrame, root: str, layer: MedallionLayer | str, table: str) -> str:
    """Full-snapshot overwrite — used for dimension tables (S8 truncate+load
    analogue; the upsert itself is operators.modeling.upsert_dim)."""
    path = table_path(root, layer, table)
    df.write.mode("overwrite").parquet(path)
    return path


def cluster_write(
    df: DataFrame,
    root: str,
    layer: MedallionLayer | str,
    table: str,
    cluster_cols: tuple[str, ...],
    partition_cols: tuple[str, ...] = (),
    files_per_partition: int = 8,
) -> str:
    """Clustered (sorted) write — the data-skipping layout operator.

    ``repartitionByRange`` + ``sortWithinPartitions`` on the cluster
    keys gives each output file a narrow, non-overlapping min/max range
    per key, so Parquet row-group statistics answer selective predicates
    without reading data pages (Spark's analogue of Delta OPTIMIZE
    ZORDER for the single-key-prefix case). At 100 TB this is the
    difference between a key-range lookup scanning one file and
    scanning the whole table: partition pruning handles the coarse
    (e.g. month) dimension, clustering handles the fine one (e.g.
    entity id) inside each partition.

    Range partitioning samples the key distribution, so skewed keys get
    proportionate file counts (no manual salting for layout).
    """
    path = table_path(root, layer, table)
    cluster = [F.col(c) for c in cluster_cols]
    out = df.repartitionByRange(files_per_partition, *cluster).sortWithinPartitions(
        *cluster
    )
    writer = out.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)
    return path


def write_month_with_audit(
    df: DataFrame,
    root: str,
    layer: MedallionLayer | str,
    table: str,
    audit_measures: dict[str, "F.Column"] | None = None,
) -> dict:
    """Idempotent month write + single-pass audit metrics.

    ``df.observe`` attaches aggregate metrics to the SAME job that
    performs the write, so the audit (row count + any caller measures,
    e.g. exact decimal sums for downstream reconciliation) costs zero
    extra scans — at 100 TB a separate post-write COUNT/SUM pass is a
    second full read of the table; this is the pattern that removes it.
    Returns the observed metrics dict."""
    from pyspark.sql import Observation

    obs = Observation(f"audit_{table}")
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for name, expr in (audit_measures or {}).items():
        metrics.append(expr.alias(name))
    observed = df.observe(obs, *metrics)
    write_month_idempotent(observed, root, layer, table)
    return dict(obs.get)
