"""Unit + property tests for operators/timeseries.py and the round-2
stats operators' non-oracled branches (zero-fill mode, HLL profiler
switch, month-index round trip). Hypothesis drives the integer month
arithmetic and the pack/fill invariants over generated series.
"""

from __future__ import annotations

import os

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from novi_pdq_etl_project_prod_spark.operators.stats import (
    heavy_hitters,
    profile_columns,
)
from novi_pdq_etl_project_prod_spark.operators.timeseries import (
    gap_fill_monthly,
    index_to_yyyymm,
    month_index,
)

SF_SMOKE = "/root/testdata/sf0.001"


@given(
    st.integers(min_value=1970, max_value=2100),
    st.integers(min_value=1, max_value=12),
)
@settings(max_examples=200, deadline=None)
def test_month_index_roundtrip_model(year, month):
    # Pure-python model of the column expressions: the index is monotone
    # in (year, month) and inverts exactly.
    yyyymm = year * 100 + month
    idx = (yyyymm // 100) * 12 + (yyyymm % 100) - 1
    back = (idx // 12) * 100 + (idx % 12) + 1
    assert back == yyyymm
    nxt = year * 100 + month + 1 if month < 12 else (year + 1) * 100 + 1
    nxt_idx = (nxt // 100) * 12 + (nxt % 100) - 1
    assert nxt_idx == idx + 1


def test_month_index_columns_match_model(spark):
    months = [(y * 100 + m,) for y in (1999, 2000, 2023) for m in range(1, 13)]
    df = spark.createDataFrame(months, ["yyyymm"])
    out = df.select(
        "yyyymm",
        month_index("yyyymm").alias("mi"),
        index_to_yyyymm(month_index("yyyymm")).alias("back"),
    ).collect()
    for r in out:
        assert r.back == r.yyyymm
        assert r.mi == (r.yyyymm // 100) * 12 + (r.yyyymm % 100) - 1


@pytest.fixture(scope="module")
def sparse_series(spark):
    rows = [
        ("a", 199901, 10, 1),
        ("a", 199904, 40, 2),
        ("a", 200002, 7, 1),
        ("b", 200012, 5, 3),
        ("b", 200101, 6, 1),
    ]
    return spark.createDataFrame(rows, ["k", "yyyymm", "amt", "n"])


def test_gap_fill_ffill_semantics(sparse_series):
    out = gap_fill_monthly(
        sparse_series, ["k"], "yyyymm", ["amt", "n"], fill="ffill"
    )
    rows = {(r.k, r.yyyymm): r for r in out.collect()}
    # a spans 199901..200002 inclusive = 14 months; b spans 2.
    assert len([k for k in rows if k[0] == "a"]) == 14
    assert len([k for k in rows if k[0] == "b"]) == 2
    # gap months carry the last observed value and are flagged
    assert rows[("a", 199902)].amt == 10 and rows[("a", 199902)].is_filled
    assert rows[("a", 199912)].amt == 40 and rows[("a", 199912)].is_filled
    assert rows[("a", 200002)].amt == 7 and not rows[("a", 200002)].is_filled
    # december -> january rollover exists and is dense
    assert ("a", 199913) not in rows and ("a", 200001) in rows


def test_gap_fill_zero_mode(sparse_series):
    out = gap_fill_monthly(
        sparse_series, ["k"], "yyyymm", ["amt"], fill="zero"
    )
    rows = {(r.k, r.yyyymm): r for r in out.collect()}
    assert rows[("a", 199902)].amt == 0 and rows[("a", 199902)].is_filled
    assert rows[("a", 199904)].amt == 40 and not rows[("a", 199904)].is_filled


def test_gap_fill_rejects_unknown_mode(sparse_series):
    with pytest.raises(ValueError):
        gap_fill_monthly(sparse_series, ["k"], "yyyymm", ["amt"], fill="bfill")


def test_heavy_hitters_deterministic_under_ties(spark):
    # every key appears exactly twice -> total tie; ranking must fall
    # back to key order and be stable across partition layouts
    df = spark.createDataFrame(
        [(k,) for k in range(20) for _ in range(2)], ["k"]
    )
    a = heavy_hitters(df, ["k"], k=5).collect()
    b = heavy_hitters(df.repartition(13), ["k"], k=5).collect()
    assert [r.k for r in a] == [0, 1, 2, 3, 4]
    assert [(r.k, r.rank) for r in a] == [(r.k, r.rank) for r in b]
    assert all(abs(r.share - 2 / 40) < 1e-12 for r in a)


def test_profile_columns_exact_vs_hll(spark):
    o = spark.read.parquet(os.path.join(SF_SMOKE, "orders.parquet"))
    cols = ["o_orderkey", "o_orderstatus"]
    exact = {r.column: r for r in profile_columns(o, cols).collect()}
    approx = {
        r.column: r
        for r in profile_columns(o, cols, approx_distinct=True).collect()
    }
    n = o.count()
    assert exact["o_orderkey"].n_distinct == n  # primary key
    assert exact["o_orderkey"].n_null == 0
    for c in cols:
        e, a = exact[c].n_distinct, approx[c].n_distinct
        # default approx_count_distinct rsd is 5% (one sigma) — allow 2x
        assert abs(a - e) <= max(0.10 * e, 2), f"{c}: HLL {a} vs exact {e}"
        assert exact[c].n_rows == n and approx[c].n_rows == n


def test_profile_columns_counts_nulls(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, None), (None, "y"), (None, None)], ["a", "b"]
    )
    prof = {r.column: r for r in profile_columns(df, ["a", "b"]).collect()}
    assert prof["a"].n_null == 2 and prof["b"].n_null == 2
    assert prof["a"].n_distinct == 2 and prof["b"].n_distinct == 2
    assert prof["a"].min_s == "1" and prof["a"].max_s == "2"
