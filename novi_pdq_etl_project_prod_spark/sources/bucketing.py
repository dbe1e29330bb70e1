"""Bucketed tables — shuffle-free co-located joins (SURVEY.md §7.1's
"repartition()/bucketing for co-located joins" leg of the 100 TB story).

A table written with ``bucketBy(n, key)`` is hash-partitioned into a
fixed bucket count ON DISK; two tables bucketed the same way join with
NO exchange on either side — the single biggest shuffle eliminator for
a fact⋈dim or fact⋈fact join that repeats every run (the reference's
star-schema reporting pattern, reference ``dags/pdq_etl_dag.py``'s
repeated fact/dim reconciliations). Catalyst proves co-partitioning
from the catalog metadata, so the win is declarative: no hints, no
manual partitioning discipline at read time.

Mechanics & caveats (why this is a separate module, not the default
write path):

- Bucketed writes go through ``saveAsTable`` (a metastore entry is what
  carries the bucket spec; plain ``parquet(path)`` cannot). The session
  warehouse dir is the storage root.
- The bucket count is FIXED at write time — pick it for the target
  cluster (e.g. 4× executor cores) and keep both join sides identical;
  a mismatched count re-shuffles one side (Spark 3.1+ can compensate
  only when one count divides the other with
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``).
- Each writing task emits one file per bucket it touches, so
  ``repartition(bucket_cols)`` first keeps output to one file per
  bucket.
- At 100 TB this is the layout for the dimensions and any fact table
  that joins on a stable key every run; one-off joins don't amortize
  the write.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Write ``df`` as a bucketed (and optionally bucket-sorted) managed
    table. Sorting within buckets additionally removes the join's Sort
    operators (SortMergeJoin reads both sides pre-sorted) and gives
    row-group min/max skipping on the sort key."""
    cols = list(bucket_cols)
    writer = (
        df.repartition(*[df[c] for c in cols])  # one file per bucket
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, cols[0], *cols[1:])
    )
    if sort_cols:
        writer = writer.sortBy(list(sort_cols)[0], *list(sort_cols)[1:])
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: Sequence[str]
) -> DataFrame:
    """Join two co-bucketed tables. With matching bucket specs the
    physical plan has NO Exchange on either side (asserted by
    ``tests/test_physical_plans.py::test_bucketed_join_has_no_exchange``)
    — the join runs entirely map-side against the on-disk layout."""
    return spark.table(left_table).join(spark.table(right_table), list(on))
