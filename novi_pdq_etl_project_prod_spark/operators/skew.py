"""Skew-mitigation operators (SURVEY.md §4 shuffle/spill row, §7.3).

The reference *manufactures* skew: null operator numbers collapse to a
``0`` sentinel (reference ``spark_jobs/transform_operator.py:89``), so
one group key can hold a large share of all rows. AQE's skew-join
splitting handles the join case automatically (enabled in
``session.get_spark``); these operators cover the aggregation case,
where AQE cannot help — a hot groupBy key lands on one reducer.

``salted_agg`` is semantics-preserving for any algebraic aggregate
(sum/count/min/max + avg via sum/count): stage 1 aggregates on
(key, salt) spreading the hot key over N reducers; stage 2 merges the
N partials per key. Two small shuffles instead of one skewed one.

Honesty note: for purely algebraic aggregates Spark's map-side partial
HashAggregate already blunts most groupBy skew; salting earns its keep
when partial aggregation degrades — very wide value payloads, hash-agg
fallback to sort, or as the building block for holistic aggregates
(collect/distinct-style) where no map-side combine exists.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (merge_fn, partial_alias) per supported algebraic aggregate
_MERGES = {
    "sum": F.sum,
    "count": F.sum,  # counts merge by summing partial counts
    "min": F.min,
    "max": F.max,
}


def _content_salt(
    df: DataFrame,
    n_salts: int,
    seed: int = 0x5A17,
    salt_cols: Sequence[str] | None = None,
) -> Column:
    """Row-content-derived salt in [0, n_salts).

    Derived from row CONTENT (plus a seed), never from
    ``monotonically_increasing_id``/``spark_partition_id``/``rand``:
    position-derived salts are recomputed differently when a task is
    retried after a lost shuffle map output (SPARK-23207 class), so a
    partially recomputed map stage can re-salt rows into different
    reduce partitions — double-counting or dropping rows. A content
    hash is a pure row function: identical under any retry, any input
    split layout, and any upstream repartition.

    ``salt_cols`` narrows the hash to specific columns — ANY subset is
    still a pure row function (retry-deterministic); pass a
    high-cardinality column (a row id) to both guarantee full salt-
    domain coverage within hot keys AND skip hashing wide payloads
    (hashing one BIGINT measured ~25% faster end-to-end than every-
    column hashing on a 7-column fact at sf0.1). Default: every column
    — coverage whenever anything varies within the hot key; rows
    bit-identical in every column share a salt, and no deterministic
    row function can do better.
    """
    cols = list(salt_cols) if salt_cols is not None else df.columns
    return F.pmod(
        F.hash(*[F.col(c) for c in cols], F.lit(seed)), F.lit(n_salts)
    )


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, Column]],
    n_salts: int = 16,
    salt_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Two-stage salted aggregation.

    ``aggs`` maps output alias -> (kind, input column) with kind in
    {sum, count, min, max}. Example::

        salted_agg(li, ["l_suppkey"],
                   {"sum_qty": ("sum", F.col("l_quantity").cast("decimal(18,2)")),
                    "n": ("count", F.lit(1))})

    WHEN TO SALT (measured, SCALE.md round-8 skew probes at 10×, hot key
    carrying 50% of 6M rows): for ALGEBRAIC aggs like these, Spark's
    map-side partial aggregation already collapses the hot key to one
    row per map task before the shuffle — plain groupBy beat this
    operator 0.82× and AQE-coalesced plain groupBy beat it 1.9×. Use
    salting when partial aggregation CANNOT absorb the key: holistic
    aggs (collect_list/percentile — per-row state crosses the shuffle),
    or as the decomposition template for exact count-distinct (first
    groupBy (key, value), then count — the same two-stage idea with the
    value as the salt). For skewed JOINS, salting is the real win — see
    :func:`salted_join` (2.0× vs plain at the same probe).
    """
    # content-derived (see _content_salt): retry-deterministic, and input
    # layouts with < n_salts partitions don't collapse the salt domain
    salt = _content_salt(df, n_salts, salt_cols=salt_cols).alias("__salt")
    stage1_aggs = []
    for alias, (kind, col) in aggs.items():
        fn = F.sum if kind == "count" else _MERGES[kind]
        first = F.count(col) if kind == "count" else fn(col)
        stage1_aggs.append(first.alias(f"__p_{alias}"))
    partial = df.select("*", salt).groupBy(*keys, "__salt").agg(*stage1_aggs)
    stage2_aggs = [
        _MERGES[kind](F.col(f"__p_{alias}")).alias(alias)
        for alias, (kind, _) in aggs.items()
    ]
    return partial.groupBy(*keys).agg(*stage2_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
    salt_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Skewed equi-join without AQE: the big side gets a random-ish salt
    (derived from partition id — deterministic per task layout), the
    small side is replicated ``n_salts`` times so every salted big key
    finds its match. Use when the small side is too large to broadcast
    but the big side's keys are skewed. Prefer AQE skew-join when
    available; this is the explicit fallback.

    Measured (SCALE.md round-8 skew probes, 10× lineitem, 0-sentinel hot
    key carrying 50% of 6M rows, dim non-broadcastable): plain SMJ
    3.99 s → AQE skew-split 2.46 s (1.6×) → salted_join 2.02 s (2.0×).
    Salting beats even AQE here because AQE splits the hot PARTITION
    but every split still probes the same dim rows; salting spreads the
    hot KEY itself."""
    # content-derived salt, NOT spark_partition_id() % n_salts (a big
    # side read from few input splits would yield only as many distinct
    # salts as partitions, silently un-spreading the hot key) and NOT
    # monotonically_increasing_id (position-derived: task retries re-salt
    # rows — see _content_salt)
    bs = big.withColumn("__salt", _content_salt(big, n_salts, salt_cols=salt_cols))
    ss = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return bs.join(ss, [key, "__salt"], how).drop("__salt")
