"""Round-8 operators: per-group frequency capping and the self-trained
bigram-LM cross-entropy (perplexity-filter) score."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from novi_pdq_etl_project_prod_spark.operators.multimodal import frequency_cap
from novi_pdq_etl_project_prod_spark.operators.text import ngram_lm_scores


def test_frequency_cap_keeps_top_by_preference(spark):
    df = spark.createDataFrame(
        [
            (1, "a", 100),
            (2, "a", 300),
            (3, "a", 200),
            (4, "b", 50),
        ],
        "doc_id long, source string, n_chars long",
    )
    out = frequency_cap(
        df, "source", cap=2, id_col="doc_id", prefer=(F.col("n_chars").desc(),)
    )
    got = {(r.doc_id, r.kept_rank) for r in out.collect()}
    # a: longest two kept (2 then 3); 1 dropped. b: lone row kept.
    assert got == {(2, 1), (3, 2), (4, 1)}


def test_frequency_cap_is_partitioning_invariant(spark):
    df = spark.range(200).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).cast("string").alias("source"),
        F.pmod(F.col("id") * 37, 113).alias("n_chars"),
    )
    a = frequency_cap(df, "source", 5, "doc_id",
                      prefer=(F.col("n_chars").desc(),))
    b = frequency_cap(df.repartition(13), "source", 5, "doc_id",
                      prefer=(F.col("n_chars").desc(),))
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_ngram_lm_scores_hand_computed(spark):
    """Tiny corpus, hand-derived add-1/2 bigram cross-entropy.

    corpus: d1 = "a b a b", d2 = "a b"
      unigrams: c(a)=3, c(b)=3, V=2
      bigrams: c(a,b)=3, c(b,a)=1
      term(a,b) = -log2((3+.5)/(3+.5*2)) = log2(8/7)
      term(b,a) = -log2((1+.5)/4)       = log2(8/3)
    """
    import math

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b")], "doc_id long, text string"
    )
    got = {r.id: r for r in ngram_lm_scores(df).collect()}
    t_ab = math.floor(math.log(8 / 7) / math.log(2) * 1e6)
    t_ba = math.floor(math.log(8 / 3) / math.log(2) * 1e6)
    assert got[1].n_bigrams == 3
    assert got[1].cross_entropy_bits == pytest.approx(
        (2 * t_ab + t_ba) / 1e6 / 3, abs=1e-12
    )
    assert got[2].n_bigrams == 1
    assert got[2].cross_entropy_bits == pytest.approx(t_ab / 1e6, abs=1e-12)


def test_ngram_lm_scores_excludes_short_docs(spark):
    df = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, "two words")], "doc_id long, text string"
    )
    got = {r.id for r in ngram_lm_scores(df).collect()}
    assert got == {3}


def test_ngram_lm_scores_partitioning_invariant(spark):
    from tests.conftest import SF_ORACLE

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    a = ngram_lm_scores(docs).collect()
    b = ngram_lm_scores(docs.repartition(17)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_pagerank_star_graph_ranks_hub_highest(spark):
    from novi_pdq_etl_project_prod_spark.operators.graphs import (
        pagerank_integer,
    )

    star = spark.createDataFrame(
        [(0, i) for i in range(1, 9)], "u long, v long"
    )
    got = {r.node: r.rank_micro for r in pagerank_integer(star).collect()}
    hub, leaves = got[0], [got[i] for i in range(1, 9)]
    assert hub > max(leaves)
    assert len(set(leaves)) == 1, "symmetric leaves must tie exactly"
    # damped mass stays near the n * unit total (floor-div loss only)
    assert sum(got.values()) <= 9 * 1_000_000
    assert sum(got.values()) > 9 * 1_000_000 * 0.9


def test_pagerank_is_exactly_deterministic(spark):
    from novi_pdq_etl_project_prod_spark.operators.graphs import (
        pagerank_integer,
    )

    edges = spark.range(300).select(
        F.pmod(F.col("id") * 13, 40).alias("u"),
        F.pmod(F.col("id") * 29 + 7, 40).alias("v"),
    )
    a = pagerank_integer(edges).collect()
    b = pagerank_integer(edges.repartition(11)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_bpe_train_merges_hand_computed(spark):
    """corpus 'low low lower': round1 (l,o)x3 [tie with (o,w) broken by
    x asc], round2 (lo,w)x3, round3 (e,r)x1 [tie with (low,e) broken by
    x asc], round4 (low,er)x1, round5 exhausted -> 4 rows only."""
    from novi_pdq_etl_project_prod_spark.operators.text import (
        bpe_train_merges,
    )

    df = spark.createDataFrame(
        [(1, "low low"), (2, "lower")], "doc_id long, text string"
    )
    got = [(r.round, r.x, r.y, r.merged, r.pair_count)
           for r in bpe_train_merges(df, rounds=5).collect()]
    assert got == [
        (1, "l", "o", "lo", 3),
        (2, "lo", "w", "low", 3),
        (3, "e", "r", "er", 1),
        (4, "low", "er", "lower", 1),
    ]


def test_bpe_train_merges_is_partitioning_invariant(spark):
    from tests.conftest import SF_ORACLE

    from novi_pdq_etl_project_prod_spark.operators.text import (
        bpe_train_merges,
    )

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    a = bpe_train_merges(docs, rounds=3).collect()
    b = bpe_train_merges(docs.repartition(13), rounds=3).collect()
    assert list(map(tuple, a)) == list(map(tuple, b))


def test_theil_sen_even_pair_count_takes_lower_median(spark, tmp_path):
    """The fixture's pair counts are odd, so parity alone can't pin the
    even case: with 4 months (6 pairs) both engines must take the
    nearest-rank LOWER median (rank (np+1) div 2 = 3)."""
    import duckdb

    from novi_pdq_etl_project_prod_spark.catalog.round8_queries import (
        D41_SQL,
        d41_theil_sen_trend,
    )

    li = spark.createDataFrame(
        [
            # one flag, 4 months, values chosen so all 6 slopes differ
            ("A", "2024-01-15", 10.00),
            ("A", "2024-02-15", 12.00),
            ("A", "2024-03-15", 19.00),
            ("A", "2024-04-15", 21.00),
        ],
        "l_returnflag string, d string, l_extendedprice double",
    ).select(
        "l_returnflag",
        F.col("d").cast("timestamp_ntz").alias("l_shipdate"),
        "l_extendedprice",
    )
    pq = str(tmp_path / "lineitem.parquet")
    li.write.parquet(pq)
    # drive the query body directly over the tiny table
    import novi_pdq_etl_project_prod_spark.catalog.round8_queries as r8
    orig = r8._t
    try:
        r8._t = lambda s, sf, name: li if name == "lineitem" else orig(s, sf, name)
        got = [(r.l_returnflag, r.n_pairs, r.theil_sen_slope_cents)
               for r in r8.d41_theil_sen_trend(spark, "ignored").collect()]
    finally:
        r8._t = orig
    # slopes (cents/month): pairs (1,2)=200,(1,3)=450,(1,4)=366.67,
    # (2,3)=700,(2,4)=450,(3,4)=200 -> sorted: 200,200,366.67,450,450,700
    # lower median = rank 3 = 366.666...
    assert got == [("A", 6, pytest.approx(1100 / 3))]
    con = duckdb.connect()
    con.register("lineitem_view", li.toPandas())
    con.sql("CREATE VIEW lineitem AS SELECT * FROM lineitem_view")
    du = con.sql(D41_SQL).fetchall()
    assert du[0][1] == 6 and du[0][2] == pytest.approx(1100 / 3)
    assert abs(got[0][2] - du[0][2]) == 0.0
