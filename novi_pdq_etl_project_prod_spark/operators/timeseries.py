"""Time-series regularization: monthly spine generation and gap filling.

The reference's curated model keeps only months that actually have rows
(`/root/reference/spark_jobs/model_curated.py` groups by the derived
yyyymm); downstream consumers of a monthly series — trend models, MoM
deltas, training-data mixture curves — need a DENSE series where silent
months are explicit (zero or carried-forward) rows. This module builds
the per-key month spine and fills the gaps.

Scale shape: the spine is `explode(sequence(lo, hi))` per key — output
rows bounded by keys × global month span, never by input rows — then one
equi-join back to the actuals and one window per key for the forward
fill. Two shuffles total regardless of input size; the spine side is
orders of magnitude smaller than a 100 TB fact scan.

Determinism: month arithmetic is integer (yyyymm ↔ month-index), the
fill is `last(measure) IGNORE NULLS` over a uniquely-ordered window, and
measures stay DECIMAL until the final projection — bit-reproducible
against the DuckDB oracle (catalog query x7).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def month_index(yyyymm: Column | str) -> Column:
    """Monotone integer month index: 199501 -> 23940+... (yyyymm div 100)
    * 12 + month - 1. Integer-exact in every engine."""
    c = F.col(yyyymm) if isinstance(yyyymm, str) else yyyymm
    return (c.cast("long") / 100).cast("long") * 12 + (c.cast("long") % 100) - 1


def index_to_yyyymm(idx: Column) -> Column:
    """Inverse of :func:`month_index`."""
    return ((idx / 12).cast("long") * 100 + (idx % 12) + 1).cast("int")


def weighted_moving_avg(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    measure: str,
    k: int = 3,
    out_col: str = "wma",
) -> DataFrame:
    """Linear-weighted trailing moving average over the last ``k`` rows
    per key: weights ``k, k-1, …, 1`` (newest heaviest), null until a
    full window of ``k`` rows exists.

    Built from ``k-1`` ``lag`` expressions over ONE window spec — a
    single shuffle+sort per key, and Spark collapses same-spec window
    functions into one Window physical node, so cost is independent of
    ``k`` modulo the O(k) projection. The measure must be an exact type
    (BIGINT/DECIMAL, e.g. price cents); the weighted numerator then
    stays exact and the only float op is the final one-divide — the
    property the DuckDB oracle (d13) certifies bit-for-bit.

    Smoothing alternative note: exponential (EWMA) weights are
    order-recursive and float-fragile; linear WMA gives the same
    trend-dampening with exact arithmetic, which wins at audit time.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    w = Window.partitionBy(*keys).orderBy(order_col)
    m = F.col(measure)
    lags = [m if j == 0 else F.lag(m, j).over(w) for j in range(k)]
    num = None
    for j, lagged in enumerate(lags):
        term = lagged * F.lit(k - j)
        num = term if num is None else num + term
    denom = k * (k + 1) // 2
    return df.withColumn(
        out_col,
        F.when(
            F.row_number().over(w) >= k, num.cast("double") / F.lit(float(denom))
        ),
    )


def gap_fill_monthly(
    grain: DataFrame,
    keys: Sequence[str],
    yyyymm_col: str,
    measures: Sequence[str],
    fill: str = "ffill",
) -> DataFrame:
    """Densify a per-(keys, month) aggregate to every month between each
    key's first and last active month.

    ``grain`` must already be aggregated to the (keys, yyyymm) grain.
    Missing months appear with ``is_filled = true`` and each measure
    either carried forward (``fill="ffill"``), zeroed (``fill="zero"``),
    or left null (``fill="none"``). Measures should still be exact
    (DECIMAL/int) types; callers cast to double after filling.

    This is the single spine/fill implementation — the legacy
    single-entity ``operators.windows.densify_months`` delegates here.
    """
    if fill not in ("ffill", "zero", "none"):
        raise ValueError(f"unknown fill mode {fill!r}")
    base = grain.withColumn("_mi", month_index(yyyymm_col)).drop(yyyymm_col)
    bounds = base.groupBy(*keys).agg(
        F.min("_mi").alias("_lo"), F.max("_mi").alias("_hi")
    )
    spine = bounds.select(
        *keys, F.explode(F.sequence("_lo", "_hi")).alias("_mi")
    )
    joined = spine.join(base, [*keys, "_mi"], "left")
    is_filled = F.col(measures[0]).isNull()
    if fill == "ffill":
        w = (
            Window.partitionBy(*keys)
            .orderBy("_mi")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = [F.last(m, ignorenulls=True).over(w).alias(m) for m in measures]
    elif fill == "zero":
        filled = [F.coalesce(F.col(m), F.lit(0)).alias(m) for m in measures]
    else:  # "none": densify only, gaps stay null
        filled = [F.col(m).alias(m) for m in measures]
    return joined.select(
        *keys,
        index_to_yyyymm(F.col("_mi")).alias(yyyymm_col),
        *filled,
        is_filled.alias("is_filled"),
    )


def grouped_ema(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    value_col: str,
    alpha: float = 0.25,
) -> DataFrame:
    """Exponential moving average per key over an ordered series:
    ``ema_1 = x_1``, ``ema_t = alpha*x_t + (1-alpha)*ema_{t-1}``.

    The recurrence is inherently sequential, which SQL window frames
    can't express directly (every frame aggregate is associative; EMA
    isn't) and the closed-form ``sum(x_i * a^(t-i))`` overflows for
    long series. Instead each key's series is gathered once
    (``sort_array(collect_list)``) and folded left-to-right with the
    ``aggregate`` higher-order function — pure JVM expressions, no
    Python, one shuffle (the groupBy). The DuckDB oracle walks the
    identical recurrence as a recursive CTE; both engines evaluate
    ``alpha*x + (1-alpha)*prev`` in correctly-rounded IEEE doubles in
    the same order, so results match bit-for-bit (catalog query d18).

    Scale shape: per-key state is the series length — bounded by the
    time span (e.g. months), not by input rows; the heavy reduction
    from raw rows to (key, period) happens upstream. Keys distribute
    across the cluster; a fold over a few hundred periods is
    row-local work. Use ``alpha`` with an exact binary representation
    (0.25, 0.5, 0.125) when cross-engine bit-equality matters.
    """
    seq = df.groupBy(*keys).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col(order_col).alias("o"),
                    F.col(value_col).cast("double").alias("v"),
                )
            )
        ).alias("__seq")
    )
    fold = F.aggregate(
        F.col("__seq"),
        F.array().cast("array<double>"),
        lambda acc, x: F.concat(
            acc,
            F.array(
                F.when(F.size(acc) == 0, x["v"]).otherwise(
                    F.lit(alpha) * x["v"] + F.lit(1.0 - alpha) * F.element_at(acc, -1)
                )
            ),
        ),
    )
    return (
        seq.withColumn("__ema", fold)
        .select(*keys, F.posexplode(F.arrays_zip("__seq", "__ema")).alias("__i", "__z"))
        .select(
            *keys,
            (F.col("__i") + 1).alias("rn"),
            F.col("__z.__seq.o").alias(order_col),
            F.col("__z.__seq.v").alias(value_col),
            F.col("__z.__ema").alias("ema"),
        )
    )


def seasonal_decompose_monthly(
    df: DataFrame,
    keys: Sequence[str],
    yyyymm_col: str,
    cents_col: str,
    window: int = 13,
    scale: int = 1000,
) -> DataFrame:
    """Classical additive seasonal decomposition of a monthly series
    (the moving-average X-11 ancestor): per key,

        trend    = centered ``window``-month moving average
        seasonal = per-month-of-year mean of (value − trend)
        residual = value − trend − seasonal

    in EXACT fixed-point integers (milli-cents at the default scale) so
    a SQL oracle reproduces it bit-for-bit — the decomposition
    complement to the trend (d34/d41), autocorrelation (d39) and
    changepoint (d40) monitors. Rows without a complete centered window
    (the first/last ``window//2`` months) are dropped, as the classical
    method prescribes.

    Floor-division convention: Spark's ``div`` truncates toward zero
    and DuckDB's ``//`` floors, which diverge on NEGATIVE numerators
    (detrended values are signed) — so every division adds a large
    positive offset first (``(x + OFF·n) div n − OFF``), making
    truncation == floor on both engines. Bounds: exact while monthly
    cents stay ≤ ~10¹² (|detrended·scale| < the 10¹⁵ offset) — past
    that BOTH engines fail loudly (ANSI overflow / BIGINT error), never
    silently.

    Shape: one hash-agg grain reduction upstream (caller), two windows
    over month-grain rows (bounded ~hundreds per key — the d40 shape,
    scale-correct because the GRAIN is months), one month-of-year
    hash-agg. Output: keys + (yyyymm, value_cents, trend_milli,
    seasonal_milli, residual_milli).
    """
    half = window // 2
    off = 10**15
    ks = list(keys)
    w = Window.partitionBy(*ks).orderBy(yyyymm_col)
    frame = w.rowsBetween(-half, half)
    with_trend = (
        df.select(
            *ks,
            F.col(yyyymm_col).alias("yyyymm"),
            F.col(cents_col).cast("long").alias("value_cents"),
        )
        .withColumn("__s", F.sum("value_cents").over(frame))
        .withColumn("__n", F.count(F.lit(1)).over(frame))
        .where(F.col("__n") == window)
        .withColumn(
            # offset floor-div here too (ADVICE r09): the WINDOW SUM is
            # signed whenever the series is (refund/chargeback months),
            # and a bare `div` would truncate where DuckDB `//` floors
            "trend_milli",
            F.expr(
                f"((__s * {scale}L + {off}L * {window}L) div {window}L)"
                f" - {off}L"
            ),
        )
        .withColumn(
            "detr_milli",
            F.col("value_cents") * F.lit(scale) - F.col("trend_milli"),
        )
    )
    seasonal = (
        with_trend.groupBy(*ks, (F.col("yyyymm") % 100).alias("__moy"))
        .agg(
            F.sum("detr_milli").alias("__sd"),
            F.count(F.lit(1)).alias("__cnt"),
        )
        .withColumn(
            "seasonal_milli",
            F.expr(f"((__sd + {off}L * __cnt) div __cnt) - {off}L"),
        )
        .select(*ks, "__moy", "seasonal_milli")
    )
    return (
        with_trend.withColumn("__moy", F.col("yyyymm") % 100)
        .join(seasonal, [*ks, "__moy"])
        .select(
            *ks,
            "yyyymm",
            "value_cents",
            "trend_milli",
            "seasonal_milli",
            (F.col("detr_milli") - F.col("seasonal_milli")).alias(
                "residual_milli"
            ),
        )
    )
