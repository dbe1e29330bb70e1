"""Window-function analytics (SURVEY.md §2.8, §7.2 M6).

The reference uses no window functions (SURVEY.md §2.8) but its star
schema implies them downstream (rankings, month-over-month deltas,
moving averages over the ``yyyymm`` grain). This module supplies the
general operators; the deterministic-upsert path in ``modeling`` already
introduced ``row_number``.

Determinism: every ordering a caller relies on for value-level
reproducibility must include a unique tie-break key — ranking functions
are deterministic *as (key, rank) sets* under ties, but ``lag``/``lead``
and frame aggregates are not.

Scale notes: a window shuffles on its partition keys once; multiple
windows sharing the same partitioning reuse the exchange. Avoid
``Window.partitionBy()`` with no keys (single-partition global sort) on
big data — for global ranking use top-k (orderBy+limit) instead.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ranked(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    method: str = "rank",
    alias: str = "rnk",
) -> DataFrame:
    """rank / dense_rank / row_number within groups."""
    fn = {"rank": F.rank, "dense_rank": F.dense_rank, "row_number": F.row_number}[method]
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(alias, fn().over(w))


def top_n_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    n: int,
) -> DataFrame:
    """Per-group top-k via row_number — the distributed idiom (each group's
    k survivors are found map-side-ish within one shuffle; no global sort)."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n)
        .drop("__rn")
    )


def with_lag_delta(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str],
    value_col: str,
    alias_prev: str = "prev_value",
    alias_delta: str = "delta",
) -> DataFrame:
    """Month-over-month style lag + delta."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    prev = F.lag(F.col(value_col)).over(w)
    return df.withColumn(alias_prev, prev).withColumn(
        alias_delta, F.col(value_col) - prev
    )


def densify_months(
    df: DataFrame,
    entity_col: str,
    month_col: str = "yyyymm",
    value_cols: Sequence[str] = (),
    fill: str = "forward",
) -> DataFrame:
    """Gap-fill a monthly-grain table: every entity gets a row for every
    month between its first and last observation; missing months carry
    the last observed value forward (``fill='forward'``) or stay null
    (``fill='none'``).

    Thin single-entity wrapper over the canonical spine/fill
    implementation, ``operators.timeseries.gap_fill_monthly`` (multi-key,
    ffill/zero/none, is_filled flag). Two shuffles total (spine join +
    window), both on the entity key. The reference's yyyymm integer
    encoding makes month stepping non-trivial (201712 + 1 ≠ 201801) —
    the spine converts through a month ordinal: ord = y*12 + (m-1).
    """
    from novi_pdq_etl_project_prod_spark.operators.timeseries import (
        gap_fill_monthly,
    )

    if not value_cols:
        # spine only: synthesize a probe measure so the join shape holds,
        # then drop it
        probed = df.withColumn("__probe", F.lit(1))
        out = gap_fill_monthly(
            probed, [entity_col], month_col, ["__probe"], fill="none"
        )
        return out.drop("__probe", "is_filled")
    mode = {"forward": "ffill", "none": "none"}[fill]
    out = gap_fill_monthly(
        df, [entity_col], month_col, list(value_cols), fill=mode
    )
    return out.drop("is_filled")


def with_moving_agg(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str],
    value_col: str,
    preceding: int,
    agg: str = "sum",
    alias: str = "moving",
) -> DataFrame:
    """Trailing-window aggregate over the last ``preceding``+current rows
    (rows-frame; use exact decimal values for reproducibility)."""
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(-preceding, 0)
    )
    fn = {"sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max}[agg]
    return df.withColumn(alias, fn(F.col(value_col)).over(w))


def cumulative_distinct(
    df: DataFrame,
    entity_col: str,
    seq_cols: Sequence[str],
    grain_col: Column | str,
    grain_name: str = "grain",
) -> DataFrame:
    """Running count of distinct entities ever seen, per ``grain_col``
    period (e.g. cumulative distinct users by day).

    ``COUNT(DISTINCT …) OVER (ORDER BY …)`` is unsupported in Spark (and
    most engines) and would hold an unbounded distinct set per frame if
    it weren't. The scalable identity instead: an entity contributes to
    the running count exactly once, at its FIRST appearance — so mark
    first appearances with one per-entity window (``row_number() == 1``
    over the total event order), aggregate the marks to the grain, and
    take a running sum over the tiny per-grain series.

    Cost: one shuffle keyed by entity + one grain-cardinality hash-agg +
    one window over grain-count rows (days/months — thousands, not
    billions). State is O(grains), never O(entities) — the property that
    makes this the 100 TB shape (and the batch twin of a streaming
    watermark rollup).
    """
    g = F.col(grain_col) if isinstance(grain_col, str) else grain_col
    w = Window.partitionBy(entity_col).orderBy(*seq_cols)
    marked = df.select(
        g.alias(grain_name),
        (F.row_number().over(w) == 1).alias("_first"),
    )
    per_grain = marked.groupBy(grain_name).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("_first"), 1).otherwise(0)).alias("n_new"),
    )
    wg = (
        Window.orderBy(grain_name)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return per_grain.select(
        grain_name,
        "n_events",
        "n_new",
        F.sum("n_new").over(wg).alias("cum_distinct"),
    )
