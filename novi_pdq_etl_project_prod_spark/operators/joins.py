"""Temporal join operators beyond plain equi-joins: as-of join and
range-bucket join. The reference has only equi-joins (SURVEY.md §2.5);
these are the standard temporal extensions its event/time-series data
model implies — and operators Spark lacks natively, composed here from
shuffle-once window primitives (SURVEY.md custom-operator rule (a):
composition of existing DataFrame ops).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    tie_break: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` within the same ``on`` keys (``direction=
    "backward"``, the default), or the EARLIEST right row with
    ``right_ts >= left_ts`` (``direction="forward"`` — the same
    single-shuffle carry scanned in reverse time order).

    Implementation: union both sides with a side tag, one shuffle on the
    keys, then ``last(value, ignorenulls=True)`` over the event-time
    order carries the most recent right values forward onto left rows.
    Cost: a single shuffle + sort per key group — no range cross-product,
    no per-row probe; this is the 100 TB-safe shape (the naive
    ``left.ts >= right.ts`` theta-join explodes quadratically).

    Ordering within equal timestamps is made deterministic by
    ``tie_break`` (a column present on both sides, e.g. an event id);
    right rows at the same (ts, tie) sort before the left row only if
    their tie value is smaller.

    ``direction="nearest"`` attaches whichever side is closer in time
    (|Δt|; exact microsecond compare, backward wins ties) and adds an
    ``asof_ts`` column with the matched right timestamp. Still ONE
    shuffle: both carries are two frames (preceding-carry ``last`` /
    following-carry ``first``) over the same partitioned sort.
    """
    lt = left.withColumn("__side", F.lit(1)).withColumn("__ts", F.col(left_ts))
    rt_cols = list(on) + [right_ts] + list(value_cols) + ([tie_break] if tie_break else [])
    rt = (
        right.select(*[F.col(c) for c in dict.fromkeys(rt_cols)])
        .withColumn("__side", F.lit(0))
        .withColumn("__ts", F.col(right_ts))
    )
    rt = rt.select(
        *[F.col(c) for c in on],
        "__side",
        "__ts",
        *([F.col(tie_break)] if tie_break else []),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )
    lt = lt.select(
        "*",
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__v_{c}") for c in value_cols],
    )
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    if direction == "nearest":
        rt = rt.withColumn("__vts", F.col("__ts"))
        lt = lt.withColumn("__vts", F.lit(None).cast(dict(right.dtypes)[right_ts]))
        stacked = lt.unionByName(rt, allowMissingColumns=True)
        order = [F.col("__ts").asc()]
        if tie_break:
            order.append(F.col(tie_break).asc_nulls_first())
        order.append(F.col("__side").asc())
        part = Window.partitionBy(*[F.col(k) for k in on]).orderBy(*order)
        wb = part.rowsBetween(Window.unboundedPreceding, 0)
        wf = part.rowsBetween(0, Window.unboundedFollowing)
        carried = stacked.select(
            "*",
            F.last("__vts", ignorenulls=True).over(wb).alias("__bts"),
            F.first("__vts", ignorenulls=True).over(wf).alias("__fts"),
            *[
                F.last(F.col(f"__v_{c}"), ignorenulls=True).over(wb).alias(f"__b_{c}")
                for c in value_cols
            ],
            *[
                F.first(F.col(f"__v_{c}"), ignorenulls=True).over(wf).alias(f"__f_{c}")
                for c in value_cols
            ],
        )
        # |Δt| needs a numeric axis: timestamps go through unix_micros,
        # while numeric ts columns (epoch ints, version numbers) compare
        # on their own scale — backward/forward accept any orderable
        # type, so nearest must too (ADVICE r05).
        ts_type = dict(left.dtypes)[left_ts]
        if ts_type.startswith("timestamp"):
            def _axis(c):
                return F.unix_micros(c)
        else:
            def _axis(c):
                return c.cast("double")
        lus = _axis(F.col("__ts"))
        pick_back = F.when(F.col("__fts").isNull(), F.lit(True)).otherwise(
            F.when(F.col("__bts").isNull(), F.lit(False)).otherwise(
                (lus - _axis(F.col("__bts")))
                <= (_axis(F.col("__fts")) - lus)
            )
        )
        out = carried.where(F.col("__side") == 1).select(
            "*",
            F.when(pick_back, F.col("__bts")).otherwise(F.col("__fts")).alias(
                "asof_ts"
            ),
            *[
                F.when(pick_back, F.col(f"__b_{c}"))
                .otherwise(F.col(f"__f_{c}"))
                .alias(f"asof_{c}")
                for c in value_cols
            ],
        )
        drop = (
            ["__side", "__ts", "__vts", "__bts", "__fts"]
            + [f"__v_{c}" for c in value_cols]
            + [f"__b_{c}" for c in value_cols]
            + [f"__f_{c}" for c in value_cols]
        )
        return out.drop(*drop)
    fwd = direction == "forward"
    stacked = lt.unionByName(rt, allowMissingColumns=True)
    # forward = the same carry over reverse time order: scanning from the
    # latest row down, the most recent right row seen is the earliest one
    # at/after the current left position
    order = [F.col("__ts").desc() if fwd else F.col("__ts").asc()]
    if tie_break:
        order.append(
            F.col(tie_break).desc_nulls_first()
            if fwd
            else F.col(tie_break).asc_nulls_first()
        )
    order.append(F.col("__side").asc())  # right row wins at exact tie position
    w = (
        Window.partitionBy(*[F.col(k) for k in on])
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = stacked.select(
        "*",
        *[
            F.last(F.col(f"__v_{c}"), ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ],
    )
    drop = ["__side", "__ts"] + [f"__v_{c}" for c in value_cols]
    return carried.where(F.col("__side") == 1).drop(*drop)


def range_bucket_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
) -> DataFrame:
    """Point-in-interval join without a cross product: both sides are
    bucketed by ``bucket_width`` (intervals explode into the buckets they
    overlap), the join runs on bucket equality, and the exact range
    predicate filters the handful of in-bucket candidates. Choose
    ``bucket_width`` ≈ typical interval length so each interval lands in
    O(1) buckets."""
    lb = left.withColumn(
        "__bucket", F.floor(F.col(left_point) / F.lit(bucket_width)).cast("long")
    )
    rb = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(right_lo) / F.lit(bucket_width)).cast("long"),
                F.floor(F.col(right_hi) / F.lit(bucket_width)).cast("long"),
            )
        ),
    )
    return (
        lb.join(rb, "__bucket")
        .where(
            (F.col(left_point) >= F.col(right_lo))
            & (F.col(left_point) <= F.col(right_hi))
        )
        .drop("__bucket")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    bucket_width: int,
    closed: bool = True,
    max_span_buckets: int | None = None,
) -> DataFrame:
    """Interval × interval overlap join without a nested-loop cross
    product: the interval-interval sibling of :func:`range_bucket_join`.

    Both sides explode into the fixed-width buckets their interval
    touches and the join runs on bucket equality; the exact overlap
    predicate (``l_lo <= r_hi AND r_lo <= l_hi``, strict if
    ``closed=False``) filters in-bucket candidates. An overlapping pair
    shares every bucket between ``max(lo buckets)`` and ``min(hi
    buckets)`` — emitting it only from the FIRST shared bucket
    (``bucket == greatest(floor(l_lo/w), floor(r_lo/w))``) dedupes
    without a distinct shuffle.

    Pick ``bucket_width`` ≈ the typical interval span so each interval
    explodes into O(1) buckets; cost is then one equi-join shuffle on a
    well-spread key. Degenerate long intervals fan out linearly —
    ``max_span_buckets`` is the quarantine guard: intervals touching
    more buckets than the cap are DROPPED from the join (raise an audit
    elsewhere), the same skew policy as the similarity ops' hot-bucket
    caps. Default None keeps every interval.
    """
    if max_span_buckets is not None:

        def _span_ok(lo: str, hi: str):
            return (
                F.floor(F.col(hi) / F.lit(bucket_width)).cast("long")
                - F.floor(F.col(lo) / F.lit(bucket_width)).cast("long")
                < F.lit(int(max_span_buckets))
            )

        left = left.where(_span_ok(left_lo, left_hi))
        right = right.where(_span_ok(right_lo, right_hi))
    lb = left.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(left_lo) / F.lit(bucket_width)).cast("long"),
                F.floor(F.col(left_hi) / F.lit(bucket_width)).cast("long"),
            )
        ),
    )
    rb = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(right_lo) / F.lit(bucket_width)).cast("long"),
                F.floor(F.col(right_hi) / F.lit(bucket_width)).cast("long"),
            )
        ),
    )
    if closed:
        overlap = (F.col(left_lo) <= F.col(right_hi)) & (
            F.col(right_lo) <= F.col(left_hi)
        )
    else:
        overlap = (F.col(left_lo) < F.col(right_hi)) & (
            F.col(right_lo) < F.col(left_hi)
        )
    first_shared = F.greatest(
        F.floor(F.col(left_lo) / F.lit(bucket_width)).cast("long"),
        F.floor(F.col(right_lo) / F.lit(bucket_width)).cast("long"),
    )
    return (
        lb.join(rb, "__bucket")
        .where(overlap & (F.col("__bucket") == first_shared))
        .drop("__bucket")
    )


# ---------------------------------------------------------------------------
# Bloom-filter semi-join pruning (runtime-filter pattern)
# ---------------------------------------------------------------------------

#: Bloom geometry: m bits in 32-bit blocks (block math is pure integer
#: bit ops — shiftright/AND — because a double-division block id would
#: truncate in Spark but round-to-nearest in a DuckDB BIGINT cast),
#: h hash functions. 4096 bits /
#: 3 hashes holds ~400 keys at <2% false-positive rate; callers size m
#: for their build side (m ≈ 10 bits/key for ~1% fp at h=3).
BLOOM_BITS = 4096
BLOOM_HASHES = 3
_BLOCK_BITS = 32


def _bloom_positions(key, salt: str, m_bits: int = BLOOM_BITS, n_hashes: int = BLOOM_HASHES):
    """The h deterministic bit positions of ``key``: independent 32-bit
    md5 slices reduced mod m. Pure integer column expressions —
    reproducible in any engine with md5 (the oracle contract)."""
    cols = []
    for j in range(n_hashes):
        hx = F.substring(
            F.md5(F.concat_ws(":", F.lit(f"{salt}{j}"), key.cast("string"))), 1, 8
        )
        cols.append(F.pmod(F.conv(hx, 16, 10).cast("long"), F.lit(m_bits)))
    return cols


def bloom_build(
    build: DataFrame,
    key_col: str,
    salt: str = "bf",
    m_bits: int = BLOOM_BITS,
    n_hashes: int = BLOOM_HASHES,
) -> DataFrame:
    """Aggregate the build side into a Bloom bitmap: one row per 32-bit
    block — ``block_id``, ``mask`` (bit_or of 1 << pos%32). At most
    m/32 rows regardless of build cardinality, so the bitmap always
    broadcasts. Absent blocks are all-zero by omission."""
    pos = F.explode(
        F.array(*_bloom_positions(F.col(key_col), salt, m_bits, n_hashes))
    ).alias("pos")
    return (
        build.select(pos)
        .distinct()
        .groupBy(F.shiftright(F.col("pos"), 5).alias("block_id"))
        .agg(
            F.bit_or(
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos & 31 AS INT))")
            ).alias("mask")
        )
    )


def bloom_prune(
    probe: DataFrame,
    bloom: DataFrame,
    key_col: str,
    salt: str = "bf",
    m_bits: int = BLOOM_BITS,
    n_hashes: int = BLOOM_HASHES,
) -> DataFrame:
    """Keep probe rows whose key passes the Bloom filter (all h bits
    set) — the explicit form of the runtime filter engines push below
    big-join scans [Spark's own InSubqueryExec/bloom runtime filters do
    this transparently; materializing it makes the pruning rate
    auditable and lets a filter built on cluster A prune a scan on
    cluster B].

    No false negatives ever (a present key's bits are all set by
    construction); false positives pass here and are eliminated by the
    real join afterwards — pruning is correctness-neutral. Each of the
    h probes is a broadcast equi-join against the ≤ m/32-row block
    table plus one integer AND; no shuffle of the probe side.
    """
    out = probe
    for j, pos in enumerate(_bloom_positions(F.col(key_col), salt, m_bits, n_hashes)):
        blocks = bloom.select(
            F.col("block_id").alias(f"__b{j}"), F.col("mask").alias(f"__m{j}")
        )
        out = (
            out.withColumn(f"__p{j}", pos)
            .join(
                F.broadcast(blocks),
                F.shiftright(F.col(f"__p{j}"), 5) == F.col(f"__b{j}"),
                "left",
            )
            .where(
                F.coalesce(F.col(f"__m{j}"), F.lit(0)).bitwiseAND(
                    F.expr(
                        f"shiftleft(CAST(1 AS BIGINT), CAST(__p{j} & 31 AS INT))"
                    )
                )
                != 0
            )
            .drop(f"__p{j}", f"__b{j}", f"__m{j}")
        )
    return out
