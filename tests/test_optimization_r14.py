"""Round-14 optimization pins.

The optimization round rewrote *execution* of two hot paths without
changing any declared result:

1. ``minhash_signatures_md5`` — the shingle-explode → 64-min-agg
   declarative form became one Arrow-vectorized map pass
   (``_minhash_md5_sig_udf``). The md5-affine signature CONTRACT is
   unchanged; this file pins the Arrow output bit-for-bit against the
   old declarative twin (kept here as the reference implementation).
2. ``incremental_pairs_from_signatures`` gained ``n_new`` (caller-known
   row count) so the funnel's cache-fill count doubles as the
   broadcast-hint bound — same pairs either way.

The funnel's lazy-cache restructure is covered end to end by the m70/
m76/m82 oracles (tests/test_oracle_parity.py); here we only pin the
operator-level equivalences those oracles build on.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from novi_pdq_etl_project_prod_spark.operators.dedup import (
    MINHASH_MERSENNE31,
    incremental_pairs_from_signatures,
    md5_long60,
    minhash_affine_coeffs,
    minhash_signatures_md5,
)
from novi_pdq_etl_project_prod_spark.operators.text import shingles

pytestmark = pytest.mark.fastverify


def _declarative_minhash(df, id_col, text_col, n, num_hashes):
    """The pre-r14 reference implementation: shingle explode → k
    min-aggregates (kept verbatim so the Arrow path is pinned against
    the exact expression tree the DuckDB oracles mirror).

    NULL-text rows are filtered first: the old expression tree had an
    inconsistency for them ONLY — ``size(NULL)`` is NULL in Spark 4, so
    the ``when`` guard fell through and ``sequence(1, greatest(NULL,0))``
    = [1, 0] produced a single ``""`` shingle, i.e. a NULL-text doc got
    an md5("")-based signature while an EMPTY-text doc got none, and the
    DuckDB oracles (``WHERE len(t) >= n`` after splitting, NULL drops)
    agree with the empty-text treatment. The Arrow path drops both,
    per the operator's documented contract ("docs with < n tokens
    produce no rows"); no fixture document has NULL text at any SF
    (oracle parity over the full catalog pins that), so no declared
    query's result moves."""
    m = MINHASH_MERSENNE31
    coeffs = minhash_affine_coeffs(num_hashes)
    sh = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("id"), F.explode(shingles(text_col, n)).alias("__sh")
    )
    hashed = sh.select("id", (md5_long60(F.col("__sh")) % m).alias("__h"))
    aggs = [
        F.min((F.lit(a) * F.col("__h") + F.lit(b)) % m).alias(f"__m{i}")
        for i, (a, b) in enumerate(coeffs)
    ]
    per_doc = hashed.groupBy("id").agg(*aggs)
    return per_doc.select(
        "id",
        F.array(*[F.col(f"__m{i}") for i in range(num_hashes)]).alias(
            "signature"
        ),
    )


#: Edge-case corpus: normal docs, exact repeat, sub-n-token doc, empty,
#: NULL text, repeated shingles inside one doc, punctuation/whitespace.
_DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog"),
    (3, "one two"),
    (4, ""),
    (5, None),
    (6, "a b c a b c a b c a b c"),
    (7, "  leading   and   trailing   spaces  "),
    (8, "punct, marks! stay? attached. to-tokens"),
    # non-ASCII whitespace (ADVICE r14): NBSP / U+2028 / U+2029 are NOT
    # token separators under Java \s+ or RE2 \s+ — they must stay glued
    # inside tokens; a Python str.split() tokenizer would break here
    (9, "alpha\u00a0beta gamma\u2028delta epsilon\u2029zeta\u3000eta"),
    (10, "\u00a0lead nbsp\u00a0\u00a0and para\u2028sep mixed\ttabs\nnewlines"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(_DOCS, "doc_id long, text string")


@pytest.mark.parametrize("n,k", [(3, 64), (2, 16), (5, 8)])
def test_arrow_minhash_matches_declarative(spark, docs, n, k):
    new = {
        r["id"]: list(r["signature"])
        for r in minhash_signatures_md5(docs, "doc_id", "text", n, k).collect()
    }
    old = {
        r["id"]: list(r["signature"])
        for r in _declarative_minhash(docs, "doc_id", "text", n, k).collect()
    }
    assert new == old
    # sub-n-token, empty and NULL docs produce no signature row at all
    # (the explode form's groupBy never saw them) — same row set
    assert 4 not in new and 5 not in new


def test_arrow_minhash_matches_declarative_fixture(spark):
    from novi_pdq_etl_project_prod_spark.session import read_table

    d = read_table(spark, "/root/testdata/sf0.01", "documents").select(
        "doc_id", "text"
    )
    new = {
        r["id"]: list(r["signature"])
        for r in minhash_signatures_md5(d, "doc_id", "text", 3, 64).collect()
    }
    old = {
        r["id"]: list(r["signature"])
        for r in _declarative_minhash(d, "doc_id", "text", 3, 64).collect()
    }
    assert new == old


def test_null_text_docs_pass_through_ingest_undropped(spark):
    """Pin the NULL-text disposition of the funnel on the Arrow MinHash
    path (ADVICE r14): the OLD declarative tree gave every NULL-text doc
    an identical md5('')-derived signature, so NULL-text survivors
    near-dup-dropped each other; the Arrow path emits no signature for
    them (matching the documented contract and the DuckDB oracles), so
    they pass through un-dropped. Asserted here rather than implied by
    fixture absence: production streaming input is arbitrary."""
    from novi_pdq_etl_project_prod_spark.plans.ingest import ingest_increment

    rows = [
        (1, None),
        (2, None),
        (3, "shared near duplicate text body one two three four five"),
        (4, "shared near duplicate text body one two three four five six"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    res = ingest_increment(df, None, None, {})
    accepted = {r.doc_id for r in res["accepted"].collect()}
    near_drops = {r.doc_id for r in res["near_drops"].collect()}
    exact = {r.doc_id for r in res["exact_dups"].collect()}
    # both NULL-text docs survive: no md5 hash row (isNotNull-filtered),
    # no signature, therefore neither exact- nor near-dup disposition
    assert {1, 2} <= accepted
    assert not ({1, 2} & (near_drops | exact))
    # the sanity pair still behaves: larger-id near-dup drops
    assert 4 in near_drops and 3 in accepted


def test_pairs_n_new_hint_is_pure_optimization(spark, docs):
    sigs_new = minhash_signatures_md5(
        docs.where(F.col("doc_id") % 2 == 1), "doc_id", "text", 3, 64
    )
    sigs_old = minhash_signatures_md5(
        docs.where(F.col("doc_id") % 2 == 0), "doc_id", "text", 3, 64
    )
    base = incremental_pairs_from_signatures(
        sigs_new, sigs_old, 64, 16, 0.5
    ).collect()
    hinted = incremental_pairs_from_signatures(
        sigs_new, sigs_old, 64, 16, 0.5, n_new=sigs_new.count()
    ).collect()
    key = lambda r: (r["id_a"], r["id_b"])  # noqa: E731
    assert sorted(map(key, base)) == sorted(map(key, hinted))
    # and past the broadcast cap the hint must drop, not crash
    capped = incremental_pairs_from_signatures(
        sigs_new, sigs_old, 64, 16, 0.5, n_new=10**9
    ).collect()
    assert sorted(map(key, capped)) == sorted(map(key, base))
