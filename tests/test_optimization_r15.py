"""Round-15 optimization pins.

The second optimization round rewrote *execution* of more hot paths
without changing any declared result; each rewrite is pinned here
bit-for-bit against the declarative form it replaced (kept verbatim as
the reference implementation, exactly like test_optimization_r14 pins
the Arrow MinHash):

1. ``simhash_signatures_md5`` — token explode → 60-sum-agg became one
   Arrow-vectorized map pass (``_simhash_md5_sig_udf``).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from novi_pdq_etl_project_prod_spark.operators.dedup import (
    md5_long60,
    simhash_signatures_md5,
)
from novi_pdq_etl_project_prod_spark.operators.text import tokens

pytestmark = pytest.mark.fastverify


def _declarative_simhash(df, id_col, text_col, bits=60):
    """The pre-r15 reference implementation: token explode → ``bits``
    signed bit-sums in one hash-agg → sign-bit packing (kept verbatim so
    the Arrow path is pinned against the exact expression tree the m9
    DuckDB oracle mirrors)."""
    tok = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("__t")
    )
    hashed = tok.select("id", md5_long60(F.col("__t")).alias("__h"))
    aggs = [
        F.sum(
            F.shiftrightunsigned(F.col("__h"), i).bitwiseAND(F.lit(1)) * 2 - 1
        ).alias(f"__b{i}")
        for i in range(bits)
    ]
    per_doc = hashed.groupBy("id").agg(*aggs)
    sig = None
    for i in range(bits):
        term = F.when(F.col(f"__b{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return per_doc.select("id", sig.cast("long").alias("simhash"))


#: Edge-case corpus: normal docs, exact repeat, single token, empty,
#: NULL text, heavy term-frequency repetition (the TF weighting path),
#: punctuation, non-ASCII whitespace (the ADVICE r14 tokenizer class).
_DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog"),
    (3, "single"),
    (4, ""),
    (5, None),
    (6, "a b c a b c a b c a b c"),
    (7, "  leading   and   trailing   spaces  "),
    (8, "punct, marks! stay? attached. to-tokens"),
    (9, "alpha\u00a0beta gamma\u2028delta epsilon\u2029zeta\u3000eta"),
    (10, "\u00a0lead nbsp\u00a0\u00a0and para\u2028sep mixed\ttabs\nnewlines"),
    (11, "tie tie untie untie"),  # balanced bit-sums exercise the >0 edge
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(_DOCS, "doc_id long, text string")


def test_arrow_simhash_matches_declarative(spark, docs):
    new = {
        r["id"]: r["simhash"]
        for r in simhash_signatures_md5(docs, "doc_id", "text").collect()
    }
    old = {
        r["id"]: r["simhash"]
        for r in _declarative_simhash(docs, "doc_id", "text").collect()
    }
    assert new == old
    # empty and NULL docs produce no signature row at all (the explode
    # form's groupBy never saw them) — same row set
    assert 4 not in new and 5 not in new


def test_arrow_simhash_matches_declarative_fixture(spark):
    from novi_pdq_etl_project_prod_spark.session import read_table

    d = read_table(spark, "/root/testdata/sf0.01", "documents").select(
        "doc_id", "text"
    )
    new = {
        r["id"]: r["simhash"]
        for r in simhash_signatures_md5(d, "doc_id", "text").collect()
    }
    old = {
        r["id"]: r["simhash"]
        for r in _declarative_simhash(d, "doc_id", "text").collect()
    }
    assert new == old
