"""Distributional statistics operators: fixed-width histograms and
robust per-group anomaly flags.

The reference's analytics surface stops at plain aggregates
(`/root/reference/spark_jobs/model_curated.py` aggregates to a monthly
grain and reconciles sums); a 100 TB training-data pipeline additionally
needs distribution summaries (histograms over measure columns) and
outlier detection over time series of those aggregates. Both are
expressed here as single-shuffle DataFrame compositions.

Determinism contract: all moments are accumulated in DECIMAL (exact,
partition-order independent) and converted to double only in the final
projection, so results hash-match a DuckDB oracle bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fixed_width_histogram(
    df: DataFrame,
    value: Column | str,
    width: float,
    extra_aggs: dict[str, Column] | None = None,
) -> DataFrame:
    """Histogram of ``value`` with fixed-width buckets.

    One shuffle: rows map to ``bucket = floor(value / width)`` (map-side,
    no data movement), then a single hash aggregation produces per-bucket
    counts; the share-of-total column is a window over the already-tiny
    bucket list, not the raw data. At 100 TB the aggregation input is the
    full scan but the shuffle payload is one row per bucket per task.
    """
    c = F.col(value) if isinstance(value, str) else value
    bucket = F.floor(c / F.lit(float(width))).cast("long")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for name, expr in (extra_aggs or {}).items():
        aggs.append(expr.alias(name))
    hist = df.groupBy(bucket.alias("bucket")).agg(*aggs)
    from pyspark.sql import Window

    w = Window.partitionBy()  # bucket list is post-agg tiny; safe global window
    return hist.select(
        "bucket",
        (F.col("bucket") * F.lit(float(width))).alias("bucket_lo"),
        "n_rows",
        *[F.col(name) for name in (extra_aggs or {})],
        (F.col("n_rows") / F.sum("n_rows").over(w)).alias("pct_rows"),
    )


def zscore_outliers(
    df: DataFrame,
    keys: Sequence[str],
    series_col: str,
    measure: Column | str,
    z_threshold: float = 2.0,
) -> DataFrame:
    """Per-``keys`` time series of ``measure`` aggregated at ``series_col``
    grain, z-scored against the key's own mean/stddev.

    Two-level shape: one shuffle aggregates raw rows to the
    (keys, series) grain with exact DECIMAL sums; mean and the sample
    standard deviation then come from a window over the per-key series —
    computed from exact decimal moments (Σx, Σx²) rather than
    ``F.stddev`` so the result is independent of partition order (see
    tests/oracle_harness determinism rules). Output carries the z-score
    and an ``is_outlier`` flag at |z| ≥ ``z_threshold``.
    """
    from pyspark.sql import Window

    m = (F.col(measure) if isinstance(measure, str) else measure).cast(
        "decimal(18,2)"
    )
    grain = df.groupBy(*keys, series_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(m).alias("_sum_dec"),
        F.sum((m * m).cast("decimal(38,4)")).alias("_sumsq_dec"),
    )
    w = Window.partitionBy(*keys)
    cnt = F.count(F.lit(1)).over(w)
    s1 = F.sum(F.col("_sum_dec").cast("decimal(38,4)")).over(w)
    s2 = F.sum(F.col("_sumsq_dec")).over(w)
    # sample variance of the per-series sums: (Σx² - (Σx)²/n) / (n-1).
    # Division happens in DOUBLE on exact decimal aggregates — decimal
    # division has engine-specific precision/scale rules and would not
    # oracle-match.
    s1d, s2d = s1.cast("double"), s2.cast("double")
    mean = s1d / cnt
    # Guard cnt==1: ANSI mode (driver default) raises DIVIDE_BY_ZERO on
    # (cnt - 1); a single-point series has no sample variance → NULL z.
    var = F.when(
        cnt > F.lit(1), (s2d - s1d * s1d / cnt) / (cnt - F.lit(1))
    )
    x = F.col("_sum_dec").cast("double")
    z = F.when(var > 0, (x - mean) / F.sqrt(var))
    return grain.select(
        *keys,
        series_col,
        "n_rows",
        x.alias("series_sum"),
        mean.alias("key_mean"),
        z.alias("zscore"),
        (F.abs(F.coalesce(z, F.lit(0.0))) >= F.lit(float(z_threshold))).alias(
            "is_outlier"
        ),
    )
