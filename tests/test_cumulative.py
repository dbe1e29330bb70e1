"""Range-partitioned two-pass cumulative (VERDICT r06 item 2).

The contract: bit-identical to the single-window plan (integer sums and
row counts commute across the bucket split), while no sort task ever
sees more than ~1/B of a group — checked both by value equivalence
against a reference ``Window`` plan and by measuring the actual bucket
populations on a near-unique measure (the adversarial regime that
serialized the old shape)."""

from __future__ import annotations

import random

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from novi_pdq_etl_project_prod_spark.operators.cumulative import (
    _BKT,
    partitioned_cumulative,
)


def _bucketed(df, n_buckets, *order_exprs):
    # the helper's stage-1 mapping, reproduced for property checks
    return df.repartitionByRange(n_buckets, *order_exprs).withColumn(
        _BKT, F.spark_partition_id()
    )


@pytest.fixture(scope="module")
def per_value(spark):
    random.seed(7)
    rows = [
        (
            random.choice("ABC"),
            random.choice([1.0, 2.0, 2.0, 3.5, random.random() * 100]),
            random.randint(1, 9),
        )
        for _ in range(5000)
    ]
    df = spark.createDataFrame(rows, "k string, v double, wt long").repartition(13)
    return df.groupBy("k", "v").agg(F.sum("wt").alias("w"))


def test_keyed_cumsum_matches_single_window(per_value):
    ref = per_value.select(
        "k",
        "v",
        F.sum("w")
        .over(
            Window.partitionBy("k")
            .orderBy("v")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .alias("cum"),
    )
    got = partitioned_cumulative(per_value, ["k"], "v", sums={"cum": "w"},
                                 n_buckets=8)
    a = {(r.k, r.v): r.cum for r in ref.collect()}
    b = {(r.k, r.v): r.cum for r in got.select("k", "v", "cum").collect()}
    assert a == b


def test_descending_rank_and_cumsum_with_tiebreak(per_value):
    freq = per_value.groupBy("v").agg(F.count(F.lit(1)).alias("cnt"))
    order = Window.orderBy(F.col("cnt").desc(), F.col("v"))
    ref = freq.select(
        "v",
        F.row_number().over(order).alias("rank"),
        F.sum("cnt")
        .over(order.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum"),
    )
    got = partitioned_cumulative(
        freq, [], "cnt", sums={"cum": "cnt"}, row_number_col="rank",
        descending=True, tiebreak=["v"], n_buckets=8,
    )
    a = {r.v: (r.rank, r.cum) for r in ref.collect()}
    b = {r.v: (r.rank, r.cum) for r in got.select("v", "rank", "cum").collect()}
    assert a == b


def test_empty_input(per_value):
    empty = per_value.where(F.lit(False))
    assert partitioned_cumulative(empty, ["k"], "v", sums={"cum": "w"}).count() == 0


def test_single_value_group(spark):
    # constant order column → every cut equal → one bucket; must not crash
    df = spark.createDataFrame([("A", 5.0, 1)] * 10, "k string, v double, wt long")
    got = partitioned_cumulative(df, ["k"], "v", sums={"cum": "wt"})
    # rows are all identical, so the cum ranks 1..10 can land on them in
    # any physical order — assert the SET of running sums, not collect()
    # order (which varies with parallelism; flaked in the sharded run)
    assert sorted(r.cum for r in got.collect()) == list(range(1, 11))


def test_buckets_actually_partition_the_sort(spark):
    """The scale property itself: on a near-unique measure, no bucket —
    hence no sort-task input — holds more than a small multiple of N/B.
    This is what the old Window.orderBy shape failed (one task, N rows)."""
    n, b = 20_000, 16
    df = spark.range(n).select(
        (F.col("id").cast("double") * 1.000001 + (F.col("id") % 7) * 0.123)
        .alias("v")
    )
    pops = _bucketed(df, b, F.col("v").asc()).groupBy(_BKT).count().collect()
    assert len(pops) == b
    assert max(r["count"] for r in pops) < 2.0 * n / b


def test_ties_never_straddle_buckets(spark):
    """Equal order values must map to ONE bucket (the mapping is a
    monotone function of the value, not of row position) — that is what
    lets value-grain callers keep SQL RANGE-frame semantics. Data
    engineered so a massive tie sits exactly on the quantile cuts."""
    rows = [(1.0, 1)] * 50 + [(2.0, 1)] * 900 + [(3.0, 1)] * 50
    df = spark.createDataFrame(rows, "v double, wt long").repartition(7)
    per_v = (
        _bucketed(df, 8, F.col("v").asc())
        .groupBy("v")
        .agg(F.count_distinct(F.col(_BKT)).alias("nb"))
        .collect()
    )
    assert all(r.nb == 1 for r in per_v)
    got = partitioned_cumulative(df, [], "v", sums={"cum": "wt"}, n_buckets=8)
    cums = {r.v: r.cum for r in got.groupBy("v").agg(F.max("cum").alias("cum")).collect()}
    assert cums == {1.0: 50, 2.0: 950, 3.0: 1000}
