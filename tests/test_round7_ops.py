"""Round-7 operator ground truths: exact AUC, Kendall τ-b, RRF fusion.

Oracle parity (tests/test_oracle_parity.py) certifies cross-engine
equality; these pin the STATISTICS against closed-form cases and plain
Python references, so a consistent-but-wrong formula can't slip through
both engines at once.
"""

from __future__ import annotations

import random

import pyspark.sql.functions as F
import pytest

from novi_pdq_etl_project_prod_spark.operators.stats import exact_auc, kendall_tau


def _py_auc(pairs) -> float:
    """Plain-Python AUC via pairwise comparisons (ties count half)."""
    pos = [s for s, p in pairs if p]
    neg = [s for s, p in pairs if not p]
    wins = sum(1.0 if sp > sn else 0.5 if sp == sn else 0.0
               for sp in pos for sn in neg)
    return wins / (len(pos) * len(neg))


def test_exact_auc_matches_pairwise_definition(spark):
    random.seed(11)
    pairs = [
        (round(random.gauss(1.0 if random.random() < 0.6 else 0.0, 1.0), 2),
         random.random() < 0.5)
        for _ in range(400)
    ]
    # inject heavy ties
    pairs += [(0.5, True)] * 20 + [(0.5, False)] * 30
    df = spark.createDataFrame(pairs, "score double, pos boolean")
    got = exact_auc(df, "score", "pos").collect()[0]
    assert got.n_pos == sum(1 for _, p in pairs if p)
    assert got.auc == pytest.approx(_py_auc(pairs), abs=1e-12)


def test_exact_auc_extremes(spark):
    perfect = spark.createDataFrame(
        [(float(i), i >= 5) for i in range(10)], "score double, pos boolean"
    )
    assert exact_auc(perfect, "score", "pos").collect()[0].auc == 1.0
    inverted = spark.createDataFrame(
        [(float(-i), i >= 5) for i in range(10)], "score double, pos boolean"
    )
    assert exact_auc(inverted, "score", "pos").collect()[0].auc == 0.0
    onesided = spark.createDataFrame(
        [(1.0, True), (2.0, True)], "score double, pos boolean"
    )
    assert exact_auc(onesided, "score", "pos").collect()[0].auc is None


def _py_kendall_tau_b(xy) -> float:
    import math

    c = d = 0
    for i in range(len(xy)):
        for j in range(i + 1, len(xy)):
            dx = xy[i][0] - xy[j][0]
            dy = xy[i][1] - xy[j][1]
            if dx * dy > 0:
                c += 1
            elif dx * dy < 0:
                d += 1
    n = len(xy)
    n0 = n * (n - 1) / 2
    from collections import Counter

    n1 = sum(t * (t - 1) / 2 for t in Counter(x for x, _ in xy).values())
    n2 = sum(t * (t - 1) / 2 for t in Counter(y for _, y in xy).values())
    return (c - d) / math.sqrt((n0 - n1) * (n0 - n2))


def test_kendall_tau_matches_pairwise_definition(spark):
    random.seed(5)
    xy = [(random.randint(1, 8), random.randint(1, 5)) for _ in range(300)]
    df = spark.createDataFrame(xy, "x int, y int")
    got = kendall_tau(df, "x", "y").collect()[0]
    assert got.kendall_tau_b == pytest.approx(_py_kendall_tau_b(xy), abs=1e-12)


def test_kendall_tau_perfect_orders(spark):
    mono = spark.createDataFrame(
        [(i, i * 2) for i in range(20)], "x int, y int"
    )
    assert kendall_tau(mono, "x", "y").collect()[0].kendall_tau_b == 1.0
    anti = spark.createDataFrame(
        [(i, -i) for i in range(20)], "x int, y int"
    )
    assert kendall_tau(anti, "x", "y").collect()[0].kendall_tau_b == -1.0


def test_kendall_tau_enforces_cell_cardinality_contract(spark):
    """VERDICT r07 item 2: a near-unique continuous measure pair must
    fail FAST with the Spearman routing, not OOM a |cells|² broadcast
    join — the contract is a runtime guard, not a docstring."""
    near_unique = spark.createDataFrame(
        [(i * 1.0001, i * 2.0003) for i in range(500)], "x double, y double"
    )
    with pytest.raises(ValueError, match="spearman_correlation"):
        kendall_tau(near_unique, "x", "y", max_cells=100)
    # bounded grids still pass through the same entry point
    ok = kendall_tau(near_unique.limit(50), "x", "y", max_cells=100)
    assert ok.collect()[0].kendall_tau_b == pytest.approx(1.0)


def test_rrf_fuse_orders_by_reciprocal_rank_sum(spark):
    from novi_pdq_etl_project_prod_spark.operators.similarity import rrf_fuse

    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)], "query_id int, neighbor_id int, rank int"
    )
    b = spark.createDataFrame(
        [(1, 12, 1), (1, 10, 2), (1, 99, 3)], "query_id int, neighbor_id int, rank int"
    )
    out = {r.neighbor_id: (r.rrf_score, r.rank)
           for r in rrf_fuse([a, b], k=10, c=60).collect()}
    # 10: 1/61 + 1/62 ; 12: 1/63 + 1/61 ; 11: 1/62 ; 99: 1/63
    assert out[10][0] == pytest.approx(1 / 61 + 1 / 62, abs=1e-15)
    assert out[12][0] == pytest.approx(1 / 63 + 1 / 61, abs=1e-15)
    assert out[11][0] == pytest.approx(1 / 62, abs=1e-15)
    # rank order: 10 (present high in both) first, then 12, then 11, 99
    assert [nid for nid, v in sorted(out.items(), key=lambda kv: kv[1][1])] == [
        10, 12, 11, 99,
    ]


def _py_pr_auc(pairs) -> float:
    """Reference trapezoidal PR-AUC over score tie groups (desc), anchor
    P0=1 — the exact convention pr_auc_trapezoid implements."""
    from collections import defaultdict

    groups = defaultdict(lambda: [0, 0])
    for s, p in pairs:
        groups[s][0 if p else 1] += 1
    n_pos = sum(1 for _, p in pairs if p)
    cp = cn = 0
    prev_r, prev_p = 0.0, 1.0
    auc = 0.0
    for s in sorted(groups, reverse=True):
        g = groups[s]
        cp += g[0]
        cn += g[1]
        r, pr = cp / n_pos, cp / (cp + cn)
        auc += (r - prev_r) * (pr + prev_p) / 2
        prev_r, prev_p = r, pr
    return auc


def test_pr_auc_matches_python_reference(spark):
    from novi_pdq_etl_project_prod_spark.operators.stats import pr_auc_trapezoid

    random.seed(23)
    pairs = [
        (round(random.gauss(1.0 if random.random() < 0.2 else 0.0, 1.0), 1),
         random.random() < 0.15)
        for _ in range(500)
    ]
    pairs += [(0.7, True)] * 12 + [(0.7, False)] * 25  # tie block
    df = spark.createDataFrame(pairs, "score double, pos boolean")
    got = pr_auc_trapezoid(df, "score", "pos").collect()[0]
    assert got.pr_auc == pytest.approx(_py_pr_auc(pairs), abs=1e-9)


def test_pr_auc_extremes(spark):
    from novi_pdq_etl_project_prod_spark.operators.stats import pr_auc_trapezoid

    perfect = spark.createDataFrame(
        [(float(i), i >= 7) for i in range(10)], "score double, pos boolean"
    )
    assert pr_auc_trapezoid(perfect, "score", "pos").collect()[0].pr_auc == (
        pytest.approx(1.0, abs=1e-9)
    )
    onesided = spark.createDataFrame(
        [(1.0, False), (2.0, False)], "score double, pos boolean"
    )
    assert pr_auc_trapezoid(onesided, "score", "pos").collect()[0].pr_auc is None


def test_winsorized_mean_matches_python_reference(spark):
    from novi_pdq_etl_project_prod_spark.operators.stats import winsorized_mean

    random.seed(31)
    rows = [("A", random.randint(1, 1000)) for _ in range(500)]
    rows += [("A", 10_000_000)] * 3  # extreme outliers the mean must cap
    rows += [("B", v) for v in (5, 5, 5, 5)]  # tiny constant group
    df = spark.createDataFrame(rows, "g string, cents long")
    got = {r.g: r for r in winsorized_mean(df, ["g"], "cents").collect()}

    import math
    from collections import defaultdict

    by_g = defaultdict(list)
    for g, v in rows:
        by_g[g].append(v)
    for g, vals in by_g.items():
        vals.sort()
        n = len(vals)
        lo = vals[math.ceil(0.05 * n) - 1]
        hi = vals[math.ceil(0.95 * n) - 1]
        ws = sum(min(max(v, lo), hi) for v in vals) / n
        assert got[g].lo_cents == lo and got[g].hi_cents == hi, g
        assert got[g].winsorized_mean_cents == pytest.approx(ws, abs=1e-9), g
    # the outliers moved the raw mean far above the winsorized one
    assert got["A"].raw_mean_cents > got["A"].winsorized_mean_cents * 10
    assert got["B"].winsorized_mean_cents == 5.0


def test_d39_autocorrelation_matches_python_reference(spark):
    """Lag-1 ACF per flag == numpy-free Pearson over the lagged pairing,
    recomputed independently from the same parquet with pandas."""
    import pandas as pd

    from novi_pdq_etl_project_prod_spark.catalog import QUERIES
    from tests.conftest import SF_SMOKE

    got = {r.flag: r for r in QUERIES["d39_autocorrelation"](spark, SF_SMOKE).collect()}

    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet",
                         columns=["l_returnflag", "l_shipdate", "l_extendedprice"])
    li["mx"] = li.l_shipdate.dt.year * 12 + li.l_shipdate.dt.month - 1
    li["cents"] = (li.l_extendedprice * 100).round(0).astype("int64")
    monthly = li.groupby(["l_returnflag", "mx"], as_index=False).cents.sum()
    for flag, g in monthly.groupby("l_returnflag"):
        g = g.sort_values("mx")
        pairs = [(a, b) for (ma, a), (mb, b) in zip(g[["mx", "cents"]].values[:-1],
                                                    g[["mx", "cents"]].values[1:])
                 if mb == ma + 1]
        assert got[flag].n_pairs == len(pairs)
        xs = [float(a) for a, _ in pairs]
        ys = [float(b) for _, b in pairs]
        n = len(pairs)
        sx, sy = sum(xs), sum(ys)
        cov = n * sum(x * y for x, y in zip(xs, ys)) - sx * sy
        vx = n * sum(x * x for x in xs) - sx * sx
        vy = n * sum(y * y for y in ys) - sy * sy
        expect = cov / (vx * vy) ** 0.5
        assert got[flag].acf_lag1 == pytest.approx(expect, rel=1e-9), flag
        # a real series, not degenerate: the statistic is a genuine correlation
        assert -1.0 <= got[flag].acf_lag1 <= 1.0
