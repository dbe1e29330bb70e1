"""Range-partitioned exact cumulatives (VERDICT r06 item 2).

The rank-statistic battery (KS / Mann–Whitney / Spearman, weighted
median, Gini, Zipf ranking) needs prefix sums over a value-ordered
relation. A ``Window.orderBy`` with no partition key runs the whole
relation through ONE task; partitioning by the (few) group keys only
moves the problem — a near-unique measure with few groups still
serializes each group's entire distinct set through one sort. The
value-grain pre-aggregation (the d24 rewrite) bounds the input by
*distinct values*; this module bounds the *sort task* too, so "exact"
and "distributed" hold at the same time.

Classic two-pass shape (Blelloch scan, distributed):

1. **bucket**: ``repartitionByRange(B, order)`` — Spark's native range
   partitioner samples its own bounds (no driver-side quantile pass, no
   per-dataset literals that would recompile codegen) and assigns equal
   keys to one partition; ``spark_partition_id()`` then names each
   row's bucket. The bucketed frame is persisted through the
   :mod:`cache` seam — the bucket id must be read by both passes below,
   never recomputed (two independent range exchanges could sample
   different bounds);
2. **local pass**: a window partitioned by ``(keys, bucket)`` computes
   the within-bucket running sum / row number — each sort task sees
   ~1/B of the relation, whatever the group count;
3. **offset pass**: per-(keys, bucket) totals (a ``keys × B``-row
   frame) get a prefix sum over bucket index — trivially small — and
   join back broadcast; ``global = local + offset``.

Exactness: integer/decimal sums and row counts commute across the
split, so the result is bit-identical to the single-window plan — same
oracles, no new approximation. Bucket-boundary placement only balances
work, never values.

At 1000 executors, raise ``n_buckets`` toward the cluster's task
budget; the offset frame is keys × B rows — broadcast is forced only
in the keyless case (≤B rows); with group keys the strategy is left
to Catalyst/AQE so high-cardinality key sets shuffle instead of
flooding the driver.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_BKT = "__cum_bkt"


def partitioned_cumulative(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    *,
    sums: Mapping[str, str] | None = None,
    row_number_col: str | None = None,
    descending: bool = False,
    tiebreak: Sequence[str] = (),
    n_buckets: int | None = None,
) -> DataFrame:
    """Append exact running totals (and/or a row number) ordered by
    ``order_col`` within each ``keys`` group, computed with the two-pass
    bucketed shape above — no single task ever sorts the whole relation.

    ``sums`` maps output column name → source column to prefix-sum
    (ROWS semantics: every row's output includes its own contribution;
    at (key, value) grain — each value once per group — this equals the
    SQL RANGE frame). ``row_number_col`` names a 1-based rank output
    (long). ``tiebreak`` columns refine the order; they join
    ``order_col`` in the range-partitioning key, so tied order values
    may span buckets ordered by tiebreak — still a correct total order.
    Without tiebreaks, tied values receive an arbitrary permutation of
    the tied rank range (sums of the form Σ rank·x stay invariant —
    Gini's contract) while their final cumulative-through-ties value is
    exact at the last tied row.
    """
    from novi_pdq_etl_project_prod_spark import cache

    sums = dict(sums or {})
    out_cols = list(df.columns)
    if n_buckets is None:
        # scale the bucket count with the session's core budget (2 sort
        # tasks per core, floor 32) so the same code saturates a
        # 1000-executor cluster without a knob; values never depend on B
        n_buckets = max(32, df.sparkSession.sparkContext.defaultParallelism * 2)
    order_exprs = [
        F.col(order_col).desc() if descending else F.col(order_col).asc()
    ] + [F.col(t) for t in tiebreak]

    # The range exchange is the bucket assignment; persist so the local
    # and offset passes read ONE materialized mapping (see module note).
    bucketed = cache.track(
        df.repartitionByRange(n_buckets, *order_exprs).withColumn(
            _BKT, F.spark_partition_id()
        )
    )

    w_local = (
        Window.partitionBy(*keys, _BKT)
        .orderBy(*order_exprs)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = bucketed
    local_cols: dict[str, str] = {}
    for out, src in sums.items():
        lc = f"__loc_{out}"
        local = local.withColumn(lc, F.sum(F.col(src)).over(w_local))
        local_cols[out] = lc
    if row_number_col:
        local = local.withColumn(
            "__loc_rn",
            F.row_number().over(
                Window.partitionBy(*keys, _BKT).orderBy(*order_exprs)
            ),
        )

    # per-(keys, bucket) totals → exclusive prefix over bucket index.
    # Bucket index ascends with the chosen order direction by
    # construction, so orderBy(bucket) is always correct here.
    aggs = [F.sum(F.col(src)).alias(f"__tot_{out}") for out, src in sums.items()]
    if row_number_col:
        aggs.append(F.count(F.lit(1)).alias("__tot_rn"))
    per_bucket = bucketed.groupBy(*keys, _BKT).agg(*aggs)
    w_off = (
        Window.partitionBy(*keys)
        .orderBy(_BKT)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off_sel = [*keys, _BKT]
    for out in sums:
        off_sel.append(F.sum(F.col(f"__tot_{out}")).over(w_off).alias(f"__off_{out}"))
    if row_number_col:
        off_sel.append(F.sum(F.col("__tot_rn")).over(w_off).alias("__off_rn"))
    offsets = per_bucket.select(*off_sel)

    # Offsets are |groups|×B rows: broadcast only the keyless (≤B rows)
    # case unconditionally; with group keys the frame scales with key
    # cardinality and a forced broadcast is a driver/executor-memory
    # hazard at exactly the scale this module targets (ADVICE r07) —
    # leave the join strategy to Catalyst/AQE, which still broadcasts
    # small offset frames via its size estimate.
    off_side = F.broadcast(offsets) if not keys else offsets
    joined = local.join(off_side, [*keys, _BKT])
    final = [*out_cols]
    for out in sums:
        zero = F.lit(0).cast(
            joined.schema[f"__loc_{out}"].dataType.simpleString()
        )
        final.append(
            (F.col(local_cols[out]) + F.coalesce(F.col(f"__off_{out}"), zero)).alias(
                out
            )
        )
    if row_number_col:
        final.append(
            (
                F.col("__loc_rn").cast("long")
                + F.coalesce(F.col("__off_rn"), F.lit(0).cast("long"))
            ).alias(row_number_col)
        )
    return joined.select(*final)
