"""Round-9 hardening tests (ADVICE r08 + VERDICT r08 punch list):
int64-overflow safety in the exact rational-cosine verifier, the
exact_auc subtrahend widening, and the basket-local m63 edge build.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def _clustered_corpus(spark, dim=8, n_noise=6, seed=7):
    """3 tight near-dup pairs (cos ≈ 0.999) + unrelated noise vectors,
    unit-normalized, deterministic."""
    rng = np.random.RandomState(seed)
    rows = []
    vid = 0
    for _ in range(3):
        base = rng.randn(dim)
        base /= np.linalg.norm(base)
        for _ in range(2):
            v = base + rng.randn(dim) * 0.01
            v /= np.linalg.norm(v)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    for _ in range(n_noise):
        v = rng.randn(dim)
        v /= np.linalg.norm(v)
        rows.append((vid, [float(x) for x in v]))
        vid += 1
    return spark.createDataFrame(rows, "vec_id int, embedding array<double>")


def test_lsh_pairs_exact_bigint_fallback_matches_int64_path(spark):
    """ADVICE r08: at scale=10⁶ the rational-cosine products exceed
    int64 (num2·n2² ≈ 10²⁵), where the old code wrapped silently. The
    guarded path must detect the regime and produce the SAME pair set
    as the safe milli-unit quantization of the same vectors."""
    from novi_pdq_etl_project_prod_spark.operators.similarity import (
        embedding_lsh_pairs_exact,
    )

    corpus = _clustered_corpus(spark)
    kw = dict(dim=8, nbits=4, n_tables=4, threshold_num=7, threshold_den=20)
    safe = {
        (r.id_a, r.id_b)
        for r in embedding_lsh_pairs_exact(corpus, scale=1000, **kw).collect()
    }
    oversized = {
        (r.id_a, r.id_b)
        for r in embedding_lsh_pairs_exact(corpus, scale=10**6, **kw).collect()
    }
    assert safe, "LSH found no near-dup pairs — fixture broken"
    assert oversized == safe


def test_lsh_pairs_exact_raises_on_norm_accumulator_overflow(spark):
    """Past dim·max|coord|² > int64 even the squared-norm accumulation
    overflows — everything downstream would be garbage, so the failure
    must be LOUD, never wrong pairs: under ANSI (Spark 4 default) the
    F.aggregate itself raises ARITHMETIC_OVERFLOW; with ANSI off the
    cell verifier's coordinate guard catches the wrapped norms."""
    from novi_pdq_etl_project_prod_spark.operators.similarity import (
        embedding_lsh_pairs_exact,
    )

    corpus = _clustered_corpus(spark)
    with pytest.raises(
        Exception,
        match="ARITHMETIC_OVERFLOW|quantized coordinates too large",
    ):
        embedding_lsh_pairs_exact(
            corpus, scale=4 * 10**9, dim=8, nbits=4, n_tables=4
        ).collect()


def test_exact_auc_subtrahend_widens_before_multiply(spark):
    """ADVICE r08: npos·(npos+1) must be a DECIMAL product (each factor
    cast first), not a BIGINT multiply cast afterwards — the BIGINT
    product wraps silently past n_pos ≈ 3·10⁹, inside the regime the
    DECIMAL(38,0) widening exists for."""
    import re

    from novi_pdq_etl_project_prod_spark.operators.stats import exact_auc

    df = spark.createDataFrame(
        [(0.1, True), (0.2, False), (0.3, True)], "score double, pos boolean"
    )
    out = exact_auc(df, "score", "pos")
    assert out.collect()[0].auc == 0.5
    plan = out._jdf.queryExecution().analyzed().toString()
    # no surviving bigint (n_pos * (n_pos + 1)) shape: every multiply
    # touching n_pos must see decimal-cast factors
    assert not re.search(
        r"cast\(\(n_pos#\d+L \* \(n_pos#\d+L \+ [^)]*\)\) as decimal", plan
    ), plan
    assert re.search(
        r"cast\(n_pos#\d+L as decimal\(19,0\)\) \* "
        r"cast\(\(n_pos#\d+L \+ cast\(1 as bigint\)\) as decimal\(19,0\)\)",
        plan,
    ), plan


def test_cohens_kappa_hand_computed(spark):
    """3-label confusion with known marginals: n=10, diag=6,
    rc = 4*5 + 3*3 + 3*2 = 35, kappa = (60-35)/(100-35) = 5/13."""
    from novi_pdq_etl_project_prod_spark.operators.stats import cohens_kappa

    rows = (
        [("a", "a")] * 3 + [("a", "b")] * 1
        + [("b", "b")] * 2 + [("b", "c")] * 1
        + [("c", "c")] * 1 + [("c", "a")] * 2
    )
    df = spark.createDataFrame(rows, "ra string, rb string")
    got = cohens_kappa(df, "ra", "rb").collect()[0]
    assert got.n_rows == 10 and got.n_agree == 6
    assert got.po == 0.6
    assert got.pe == 0.35
    assert abs(got.kappa - (25 / 65)) < 1e-15


def test_cohens_kappa_extremes(spark):
    from novi_pdq_etl_project_prod_spark.operators.stats import cohens_kappa

    perfect = spark.createDataFrame(
        [("x", "x"), ("y", "y"), ("z", "z")], "ra string, rb string"
    )
    assert cohens_kappa(perfect, "ra", "rb").collect()[0].kappa == 1.0
    # independence: labels unrelated => kappa == 0 when po == pe
    indep = spark.createDataFrame(
        [("x", "u"), ("x", "v"), ("y", "u"), ("y", "v")], "ra string, rb string"
    )
    assert cohens_kappa(indep, "ra", "rb").collect()[0].kappa == 0.0


def test_cohens_kappa_null_is_a_label(spark):
    """NULL ('abstained') is a real label everywhere, consistently
    (ADVICE r09): the confusion matrix includes NULL cells via groupBy,
    so the diagonal must count (NULL, NULL) as agreement and the
    marginal product must include the r_NULL·c_NULL term in Σ rᵢ·cᵢ —
    a null-unsafe join/when silently understates both po and pe.

    Fixture: (NULL,NULL)×2, (NULL,'a')×1, ('a',NULL)×1, ('a','a')×2.
    n=6, diag=4 (2 null-null + 2 a-a), marginals r_NULL=3 r_a=3,
    c_NULL=3 c_a=3 → rc=18. po=4/6; pe=18/36=0.5;
    kappa=(6·4−18)/(36−18)=6/18=1/3."""
    from novi_pdq_etl_project_prod_spark.operators.stats import cohens_kappa

    rows = [
        (None, None), (None, None), (None, "a"),
        ("a", None), ("a", "a"), ("a", "a"),
    ]
    df = spark.createDataFrame(rows, "ra string, rb string")
    got = cohens_kappa(df, "ra", "rb").collect()[0]
    assert got.n_rows == 6 and got.n_agree == 4
    assert got.po == 4 / 6 and got.pe == 0.5
    assert abs(got.kappa - 1 / 3) < 1e-15


def test_minhash_calibration_exact_duplicates(spark):
    """Planted exact duplicates: the signature estimate and the true
    Jaccard must both be 1.0 with zero calibration error; a near-dup
    pair's err_micro must equal the hand-computed fixed-point gap."""
    from novi_pdq_etl_project_prod_spark.operators.dedup import (
        minhash_calibration_report,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near = base + " lambda"  # one extra token -> 9 of 11 shingles shared
    rows = [(1, base), (2, base), (3, near), (4, "totally different words here now")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    rep = {
        (r.id_a, r.id_b): r
        for r in minhash_calibration_report(df, threshold=0.5).collect()
    }
    dup = rep[(1, 2)]
    assert dup.m_agree == 64 and dup.est_jaccard == 1.0
    assert dup.true_jaccard == 1.0 and dup.err_micro == 0
    for key in ((1, 3), (2, 3)):
        if key in rep:
            r = rep[key]
            # base has 8 shingles, near has 9, sharing 8 => J = 8/9
            assert (r.n_common, r.n_union) == (8, 9)
            expect = (10**6 * abs(r.m_agree * 9 - 64 * 8)) // (64 * 9)
            assert r.err_micro == expect


def test_seasonal_decompose_matches_python_model(spark):
    """Synthetic 3-year monthly series with a strong month-of-year
    pattern and a ramp: the operator must equal a pure-Python model of
    the same fixed-point arithmetic — including FLOOR semantics on the
    NEGATIVE detrended values (the Spark-div/DuckDB-// bridge)."""
    from novi_pdq_etl_project_prod_spark.operators.timeseries import (
        seasonal_decompose_monthly,
    )

    months = [y * 100 + m for y in (2021, 2022, 2023) for m in range(1, 13)]

    def series_val(key, i, ym):
        if key == "k":
            # ramp + seasonal spike in December, dip in February
            return (
                1000 + 7 * i
                + (500 if ym % 100 == 12 else 0)
                - (300 if ym % 100 == 2 else 0)
            )
        # "neg": a refunds ledger — NEGATIVE overall level, so the
        # centered WINDOW SUM itself is negative and the trend division
        # exercises its signed branch (ADVICE r09: the trend div lacked
        # the floor offset and the all-positive fixture hid it)
        return (
            -1000 - 11 * i
            + (400 if ym % 100 == 7 else 0)
            - (250 if ym % 100 == 3 else 0)
        )

    rows = [
        (key, ym, series_val(key, i, ym))
        for key in ("k", "neg")
        for i, ym in enumerate(months)
    ]
    df = spark.createDataFrame(rows, "g string, yyyymm int, cents long")
    got = {
        (r.g, r.yyyymm): (r.trend_milli, r.seasonal_milli, r.residual_milli)
        for r in seasonal_decompose_monthly(df, ["g"], "yyyymm", "cents").collect()
    }

    # python model (// IS floor — the semantics both engines must match)
    want = {}
    neg_trend_sum_seen = False
    for key in ("k", "neg"):
        series = {ym: series_val(key, i, ym) for i, ym in enumerate(months)}
        detr = {}
        trend = {}
        for i, ym in enumerate(months):
            if i < 6 or i > len(months) - 7:
                continue
            s = sum(series[months[j]] for j in range(i - 6, i + 7))
            neg_trend_sum_seen = neg_trend_sum_seen or s < 0
            t = (s * 1000) // 13
            trend[ym] = t
            detr[ym] = series[ym] * 1000 - t
        seas = {}
        for moy in range(1, 13):
            ds = [d for ym, d in detr.items() if ym % 100 == moy]
            if ds:
                seas[moy] = sum(ds) // len(ds)
        for ym in detr:
            want[(key, ym)] = (
                trend[ym], seas[ym % 100], detr[ym] - seas[ym % 100]
            )
        if key == "k":
            assert any(d < 0 for d in detr.values()), (
                "fixture lost its negative detrended branch"
            )
    assert neg_trend_sum_seen, "fixture lost its negative window-sum branch"
    assert got == want


def test_incremental_minhash_pairs_skips_old_old(spark):
    """Planted near-dups in every membership combination: the increment
    path must report the new×new and new×old pairs exactly as the full
    run does, tag them correctly, and NEVER form the old×old pair even
    though it is a true near-duplicate (it was the previous ingest's
    report — re-reporting it is the quadratic cost the pattern avoids)."""
    from novi_pdq_etl_project_prod_spark.operators.dedup import (
        incremental_minhash_pairs,
        minhash_near_duplicates_md5,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (2, base), (4, base),               # old×old near-dup pair
        (1, base + " lam"), (3, base + " lam"),  # new×new pair
        (6, base + " mu"), (7, base + " mu"),    # old×new pair
        (8, "completely different words entirely here now"),
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    new = docs.where(F.col("doc_id") % 2 == 1)
    old = docs.where(F.col("doc_id") % 2 == 0)

    inc = {
        (r.id_a, r.id_b): r.pair_type
        for r in incremental_minhash_pairs(new, old, threshold=0.5).collect()
    }
    full = {
        (r.id_a, r.id_b)
        for r in minhash_near_duplicates_md5(docs, threshold=0.5).collect()
    }
    want = {p for p in full if p[0] % 2 == 1 or p[1] % 2 == 1}
    assert set(inc) == want
    assert (2, 4) in full and (2, 4) not in inc
    assert inc.get((1, 3)) == "new_new"
    assert inc.get((6, 7)) == "new_old"
