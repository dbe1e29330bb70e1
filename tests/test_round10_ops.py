"""Round-10 operators: Fleiss' kappa and near-dup cluster
canonicalization (drop-list emission)."""

from __future__ import annotations


def test_fleiss_kappa_hand_computed(spark):
    """4 qualifying subjects × 3 raters (one under-rated subject is
    excluded): S2=26, Nn=12, C=(6,5,1) → po=7/12, pe=31/72,
    kappa=11/41 — checked against the Nn-cancelled integer form
    (168−124)/164."""
    from novi_pdq_etl_project_prod_spark.operators.stats import fleiss_kappa

    rows = (
        [("s1", c) for c in "aaa"]
        + [("s2", c) for c in "aab"]
        + [("s3", c) for c in "bbb"]
        + [("s4", c) for c in "abc"]
        + [("s5", c) for c in "ab"]  # 2 ratings: excluded
    )
    df = spark.createDataFrame(rows, "subj string, cat string")
    got = fleiss_kappa(df, "subj", "cat", 3).collect()[0]
    assert got.n_subjects == 4 and got.n_raters == 3
    assert got.po == 14 / 24
    assert got.pe == 62 / 144
    assert got.kappa == 44 / 164


def test_fleiss_kappa_perfect_agreement(spark):
    from novi_pdq_etl_project_prod_spark.operators.stats import fleiss_kappa

    rows = [(s, c) for s, c in (("x", "u"), ("y", "v"), ("z", "u"))
            for _ in range(3)]
    df = spark.createDataFrame(rows, "subj string, cat string")
    assert fleiss_kappa(df, "subj", "cat", 3).collect()[0].kappa == 1.0


def test_canonicalize_clusters_drop_list(spark):
    """Per cluster the highest-score member survives (ties → smallest
    id); everyone else lands on the drop list pointing at the survivor.
    Drop count == Σ (|cluster| − 1); singletons emit nothing."""
    from novi_pdq_etl_project_prod_spark.operators.dedup import (
        canonicalize_clusters,
    )

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (99, 99)],
        "id long, cluster_id long",
    )
    scores = spark.createDataFrame(
        # cluster 1: doc 2 longest; cluster 10: tie -> keep 10; singleton 99
        [(1, 5), (2, 9), (3, 7), (10, 4), (11, 4), (99, 1)],
        "id long, score long",
    )
    got = sorted(
        map(tuple, canonicalize_clusters(clusters, scores).collect())
    )
    assert got == [
        (1, 1, 2, 5),
        (3, 1, 2, 7),
        (11, 10, 10, 4),
    ]


def test_m67_drop_count_matches_cluster_sizes(spark):
    """Catalog-level metamorphic check at sf0.001: the drop list has
    exactly Σ (|cluster| − 1) rows, every keep_id is a cluster member
    that never appears as a dropped doc, and each kept doc has the
    cluster-max text length."""
    from novi_pdq_etl_project_prod_spark.catalog import QUERIES
    from novi_pdq_etl_project_prod_spark.catalog.llm_queries import (
        minhash_near_duplicates_md5,
    )
    from novi_pdq_etl_project_prod_spark.operators.dedup import (
        near_dup_clusters,
    )
    from novi_pdq_etl_project_prod_spark.session import read_table

    sf = "/root/testdata/sf0.001"
    drops = QUERIES["m67_dedup_canonicalize"](None or spark, sf).collect()
    docs = read_table(spark, sf, "documents")
    pairs = minhash_near_duplicates_md5(docs, threshold=0.5)
    members = near_dup_clusters(pairs).collect()
    from collections import Counter

    sizes = Counter(r.cluster_id for r in members)
    assert len(drops) == sum(v - 1 for v in sizes.values())
    dropped = {r.doc_id for r in drops}
    keeps = {r.keep_id for r in drops}
    assert keeps.isdisjoint(dropped)
    lengths = {
        r.doc_id: len(r.text)
        for r in docs.select("doc_id", "text").collect()
    }
    by_cluster: dict = {}
    for r in members:
        by_cluster.setdefault(r.cluster_id, []).append(r.id)
    for r in drops:
        cluster_max = max(lengths[i] for i in by_cluster[r.cluster_id])
        assert lengths[r.keep_id] == cluster_max


def test_split_leakage_matrix_hand_computed(spark):
    """Tiny corpus with planted cross-fold gram sharing: folds 0/1 share
    exactly the grams of the common sentence; fold 2 shares nothing —
    and appears as EXPLICIT zero rows (dense contract, ADVICE r10: a
    zero-leakage pair must be distinguishable from an absent fold);
    within-fold duplication never double-counts a gram."""
    from novi_pdq_etl_project_prod_spark.operators.dedup import (
        split_leakage_matrix,
    )

    common = "alpha beta gamma delta"  # 3-grams: (a b g), (b g d) -> 2
    rows = [
        (0, common + " one"),          # adds (g d one)
        (0, common),                   # duplicate grams within fold 0
        (1, common + " two"),          # shares the 2 common grams with f0
        (2, "totally different words here now"),
    ]
    df = spark.createDataFrame(rows, "fold int, text string")
    got = {
        (r.fold_a, r.fold_b): r.shared_grams
        for r in split_leakage_matrix(df, "fold", "text", n=3).collect()
    }
    assert got == {(0, 1): 2, (0, 2): 0, (1, 2): 0}


import pytest as _pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_RATING = st.tuples(
    st.integers(min_value=0, max_value=9),   # subject
    st.sampled_from(["a", "b", "c"]),        # category
)


@given(rows=st.lists(_RATING, min_size=1, max_size=40))
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_fleiss_kappa_matches_python_model(spark, rows):
    """Random rating tables vs a pure-Python model of the same exact
    integer arithmetic — including subject exclusion (rating count !=
    n_raters) and the empty-qualifying-set edge (operator must emit a
    row with NULL ratios, never crash)."""
    from collections import Counter

    from novi_pdq_etl_project_prod_spark.operators.stats import fleiss_kappa

    n_raters = 3
    df = spark.createDataFrame(rows, "subj int, cat string")
    got = fleiss_kappa(df, "subj", "cat", n_raters).collect()[0]

    per_subj = Counter(s for s, _ in rows)
    ok = {s for s, c in per_subj.items() if c == n_raters}
    cells = Counter((s, c) for s, c in rows if s in ok)
    N = len(ok)
    assert got.n_subjects == N and got.n_raters == n_raters
    if N == 0:
        assert got.po is None and got.pe is None and got.kappa is None
        return
    nn = N * n_raters
    s2 = sum(v * v for v in cells.values())
    cj = Counter()
    for (_s, c), v in cells.items():
        cj[c] += v
    sc2 = sum(v * v for v in cj.values())
    assert got.po == (s2 - nn) / (nn * (n_raters - 1))
    assert got.pe == sc2 / (nn * nn)
    den = (n_raters - 1) * (nn * nn - sc2)
    if den == 0:
        # pe == 1 (every rating one category): kappa undefined -> NULL
        assert got.kappa is None
    else:
        assert got.kappa == ((s2 - nn) * nn - (n_raters - 1) * sc2) / den


def test_canonicalize_clusters_string_ids_deterministic_ties(spark):
    """Round-10 review: the tie-break must be type-safe — string doc ids
    (content-addressed corpora) pick the lexicographically smallest id
    among equal scores, never an arbitrary survivor."""
    from novi_pdq_etl_project_prod_spark.operators.dedup import (
        canonicalize_clusters,
    )

    clusters = spark.createDataFrame(
        [("sha_b", "c1"), ("sha_a", "c1"), ("sha_c", "c1")],
        "id string, cluster_id string",
    )
    scores = spark.createDataFrame(
        [("sha_a", 7), ("sha_b", 7), ("sha_c", 3)], "id string, score long"
    )
    got = sorted(
        map(tuple, canonicalize_clusters(clusters, scores).collect())
    )
    assert got == [("sha_b", "c1", "sha_a", 7), ("sha_c", "c1", "sha_a", 3)]


def test_kappas_single_category_corpus_yields_null(spark):
    """pe == 1 (one category everywhere) makes both kappas classically
    undefined: NULL, never an ANSI divide-by-zero crash (found by the
    Hypothesis model test)."""
    from novi_pdq_etl_project_prod_spark.operators.stats import (
        cohens_kappa,
        fleiss_kappa,
    )

    mono = spark.createDataFrame([("x", "x")] * 4, "ra string, rb string")
    row = cohens_kappa(mono, "ra", "rb").collect()[0]
    assert row.po == 1.0 and row.pe == 1.0 and row.kappa is None

    ratings = spark.createDataFrame(
        [(s, "a") for s in (1, 1, 1, 2, 2, 2)], "subj int, cat string"
    )
    row = fleiss_kappa(ratings, "subj", "cat", 3).collect()[0]
    assert row.po == 1.0 and row.pe == 1.0 and row.kappa is None


_DOC = st.tuples(
    st.integers(min_value=0, max_value=3),   # fold
    st.lists(
        st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
        min_size=0, max_size=6,
    ).map(" ".join),                          # text from a tiny vocabulary
)


@given(docs=st.lists(_DOC, min_size=1, max_size=10))
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_split_leakage_matrix_matches_python_model(spark, docs):
    """Random tiny corpora vs a Python model: per-fold distinct 3-gram
    sets, matrix = |intersection| for EVERY fold_a < fold_b pair
    (dense contract, ADVICE r10 — zero-leakage pairs are explicit 0
    rows). Short texts (< n tokens) contribute nothing."""
    from novi_pdq_etl_project_prod_spark.operators.dedup import (
        split_leakage_matrix,
    )

    df = spark.createDataFrame(docs, "fold int, text string")
    got = {
        (r.fold_a, r.fold_b): r.shared_grams
        for r in split_leakage_matrix(df, "fold", "text", n=3).collect()
    }

    folds: dict[int, set] = {}
    for fold, text in docs:
        toks = [t for t in text.split() if t]
        grams = {
            " ".join(toks[i:i + 3]) for i in range(len(toks) - 2)
        }
        folds.setdefault(fold, set()).update(grams)
    want = {}
    ks = sorted(folds)
    for i, a in enumerate(ks):
        for b in ks[i + 1:]:
            want[(a, b)] = len(folds[a] & folds[b])
    assert got == want


def test_incremental_exact_dups_membership_matrix(spark):
    """Planted exact dups in every membership combination: old×new
    (exact_old, canonical = min standing id), new×new (exact_new,
    first occurrence unreported), old×old (never compared), unique new
    (unreported), NULL text (never reported)."""
    from novi_pdq_etl_project_prod_spark.operators.dedup import (
        incremental_exact_dups,
    )

    standing = spark.createDataFrame(
        [(1, "alpha"), (4, "alpha"), (2, "beta"), (3, "gamma")],
        "doc_id long, text string",
    )
    increment = spark.createDataFrame(
        [
            (10, "alpha"),   # exact_old, dup_of = 1 (min standing)
            (11, "delta"), (12, "delta"),  # new×new: 12 dups 11
            (13, "unique words"),          # clean
            (14, None), (15, None),        # NULL text: never reported
        ],
        "doc_id long, text string",
    )
    got = sorted(
        map(tuple, incremental_exact_dups(increment, standing).collect())
    )
    assert got == [(10, 1, "exact_old"), (12, 11, "exact_new")]


def test_binary_confusion_report_hand_computed(spark):
    """tp=2 tn=3 fp=1 fn=2 (one NULL prediction counts as FALSE →
    a fn); precision 2/3, recall 1/2, f1 4/7, MCC vs the closed form;
    degenerate all-one-class corpus yields NULL ratios, no crash."""
    import math

    from novi_pdq_etl_project_prod_spark.operators.stats import (
        binary_confusion_report,
    )

    rows = [
        (True, True), (True, True),            # tp ×2
        (False, False), (False, False), (False, False),  # tn ×3
        (False, True),                          # fp
        (True, False), (True, None),            # fn ×2 (NULL pred = False)
    ]
    df = spark.createDataFrame(rows, "actual boolean, predicted boolean")
    got = binary_confusion_report(df, "actual", "predicted").collect()[0]
    assert (got.tp, got.tn, got.fp, got.fn) == (2, 3, 1, 2)
    assert got.precision == 2 / 3 and got.recall == 0.5 and got.f1 == 4 / 7
    assert got.mcc == (2 * 3 - 1 * 2) / math.sqrt(3 * 4 * 4 * 5)

    mono = spark.createDataFrame(
        [(True, True)] * 3, "actual boolean, predicted boolean"
    )
    row = binary_confusion_report(mono, "actual", "predicted").collect()[0]
    assert row.precision == 1.0 and row.recall == 1.0 and row.f1 == 1.0
    assert row.mcc is None  # zero marginals: undefined, never a crash


def test_canonicalize_clusters_unscored_members_survive_audit(spark):
    """ADVICE r10 (medium): members MISSING from the scores frame must
    not silently vanish from the drop list — the audit artifact gates a
    destructive dedup. Unscored members appear with NULL score and can
    never out-rank a scored member; a fully-unscored cluster still
    resolves deterministically (min id keeps)."""
    from novi_pdq_etl_project_prod_spark.operators.dedup import (
        canonicalize_clusters,
    )

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)],
        "id int, cluster_id int",
    )
    # id=3 unscored; cluster 10 entirely unscored
    scores = spark.createDataFrame(
        [(1, 5.0), (2, 9.0)], "id int, score double"
    )
    got = {
        r.doc_id: (r.cluster_id, r.keep_id, r.score)
        for r in canonicalize_clusters(clusters, scores).collect()
    }
    # cluster 1: keep=2 (top score); drops 1 (scored) AND 3 (unscored,
    # NULL score) — the inner-join regression lost id=3 entirely
    # cluster 10: all NULL scores -> min id 10 keeps, 11 drops
    assert got == {
        1: (1, 2, 5.0),
        3: (1, 2, None),
        11: (10, 10, None),
    }


def test_kappas_and_confusion_null_on_degenerate_under_ansi(spark):
    """ADVICE r10 (low): po/pe must stay NULL (not DIVIDE_BY_ZERO) on
    degenerate corpora even with spark.sql.ansi.enabled — the docstring
    contract is NULL-on-degenerate under BOTH ANSI settings."""
    from novi_pdq_etl_project_prod_spark.operators.stats import (
        cohens_kappa,
        fleiss_kappa,
    )

    # EFFECTIVE value (no fallback arg): conf.get(key, "false") returns
    # the fallback when the key was never explicitly set, so the
    # finally-restore would force ANSI *off* for the rest of the shared
    # session (Spark 4's built-in default is on) — a conf leak that made
    # size(NULL) read -1 in whatever test ran next (round-12 catch)
    old = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        empty = spark.createDataFrame([], "a string, b string")
        row = cohens_kappa(empty, "a", "b").collect()[0]
        # SUM over zero rows is NULL in both engines: n_rows surfaces
        # that honestly; the contract under test is the NULL ratios
        assert row.n_rows in (None, 0)
        assert row.po is None and row.pe is None and row.kappa is None

        # every subject rated 3 times, but n_raters=4 -> zero
        # qualifying subjects -> po/pe denominators are 0
        ratings = spark.createDataFrame(
            [(s, "x") for s in range(4) for _ in range(3)],
            "subj int, cat string",
        )
        frow = fleiss_kappa(ratings, "subj", "cat", 4).collect()[0]
        assert frow.n_subjects == 0
        assert frow.po is None and frow.pe is None and frow.kappa is None
    finally:
        spark.conf.set("spark.sql.ansi.enabled", old)
