"""Ground-truth unit tests for the round-4 operators (crafted inputs with
hand-computable answers — the DuckDB parity test covers fixture-scale
equivalence; these pin the SEMANTICS)."""

from __future__ import annotations

from pyspark.sql import functions as F

from novi_pdq_etl_project_prod_spark.operators.similarity import (
    label_centroid_sums,
    nearest_centroid_assign,
)
from novi_pdq_etl_project_prod_spark.operators.text import (
    corpus_frequency_stats,
    max_ngram_repetition,
    ngram_novelty,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_corpus_frequency_stats_hand_computed(spark):
    df = _docs(spark, ["aa bb", "aa cc"])
    got = {r.doc_id: r for r in corpus_frequency_stats(df).collect()}
    # vocab: aa→2, bb→1, cc→1
    assert got[0].n_tokens == 2 and got[0].sum_tf == 3
    assert got[0].min_tf == 1 and got[0].n_hapax == 1
    assert got[1].sum_tf == 3 and got[1].n_hapax == 1


def test_max_ngram_repetition_counts_overlapping_positions(spark):
    # "a b a b a b a b": 6 overlapping 3-grams, "a b a"×3 and "b a b"×3
    df = _docs(spark, ["a b a b a b a b", "x y"])
    rows = {r.doc_id: r for r in max_ngram_repetition(df, n=3).collect()}
    assert rows[0].n_ngrams == 6 and rows[0].top_ngram_count == 3
    assert abs(rows[0].rep_frac - 0.5) < 1e-12
    assert 1 not in rows  # <n tokens → no grams → no row


def test_ngram_novelty_first_doc_wins(spark):
    df = _docs(spark, ["w x y z", "w x y z", "p q r s"])
    rows = {r.doc_id: r for r in ngram_novelty(df, n=4).collect()}
    assert rows[0].novelty_frac == 1.0  # first occurrence
    assert rows[1].novelty_frac == 0.0  # exact copy of an earlier doc
    assert rows[2].novelty_frac == 1.0  # disjoint grams


def test_label_centroid_sums_exact_micro_units(spark):
    df = spark.createDataFrame(
        [(0, 0, [1.0, -2.0]), (1, 0, [3.0, 4.0]), (2, 1, [0.5, 0.5])],
        "vec_id long, label int, embedding array<double>",
    )
    got = {
        (r.label, r.dim): r for r in label_centroid_sums(df).collect()
    }
    assert got[(0, 0)].sum_micro == 4_000_000 and got[(0, 0)].n_vecs == 2
    assert got[(0, 1)].sum_micro == 2_000_000
    assert got[(1, 0)].sum_micro == 500_000 and got[(1, 0)].n_vecs == 1


def test_nearest_centroid_reassigns_mislabeled_vector(spark):
    # label 0 clusters at (1, 0), label 1 at (-1, 0); vec 99 carries
    # label 0 but sits at (-1, 0) → must be assigned to label 1
    rows = [
        (0, 0, [1.0, 0.1]),
        (1, 0, [1.0, -0.1]),
        (2, 1, [-1.0, 0.1]),
        (3, 1, [-1.0, -0.1]),
        (99, 0, [-1.0, 0.0]),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )
    got = {r.id: r for r in nearest_centroid_assign(df).collect()}
    assert got[0].assigned_label == 0 and got[0].is_match
    assert got[99].assigned_label == 1 and not got[99].is_match
    # partitioning independence (exact integer math → bit-stable)
    again = {
        r.id: r.assigned_label
        for r in nearest_centroid_assign(df.repartition(7)).collect()
    }
    assert again == {r: got[r].assigned_label for r in got}


def test_lsh_pairs_bucket_cap_quarantines_hot_cells(spark):
    """A degenerate hot cluster (300 identical vectors) would alone emit
    ~45k candidate pairs; with max_bucket_occupancy the hot cells are
    dropped while pairs between ordinary vectors survive."""
    import numpy as np

    from novi_pdq_etl_project_prod_spark.operators.similarity import (
        embedding_near_dup_pairs_lsh,
    )

    rng = np.random.default_rng(7)
    hot = rng.normal(size=64)
    a = rng.normal(size=64)
    b = a + rng.normal(size=64) * 0.05  # near-dup of a
    rows = [(i, [float(x) for x in hot]) for i in range(300)]
    rows += [(1000, [float(x) for x in a]), (1001, [float(x) for x in b])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    capped = embedding_near_dup_pairs_lsh(
        df, threshold=0.9, dim=64, nbits=6, n_tables=8,
        max_bucket_occupancy=100,
    ).collect()
    got = {(r.id_a, r.id_b) for r in capped}
    assert (1000, 1001) in got, "ordinary near-dup pair lost to the cap"
    assert all(p == (1000, 1001) for p in got), f"hot-cell pairs leaked: {len(got)}"

    uncapped = embedding_near_dup_pairs_lsh(
        df, threshold=0.9, dim=64, nbits=6, n_tables=8,
    ).count()
    assert uncapped > 40_000  # the quadratic mass the cap removes


def test_kmeans_converges_on_separated_clusters(spark):
    """Three well-separated planted clusters: Lloyd's must converge with
    every planted group mapped to one distinct cluster id, and must be
    reproducible under repartitioning (integer-exact arithmetic)."""
    import numpy as np

    from novi_pdq_etl_project_prod_spark.operators.similarity import (
        kmeans_fit_assign,
    )

    rng = np.random.default_rng(11)
    centers = [rng.normal(size=8) * 10 for _ in range(3)]
    rows = []
    for i in range(90):
        c = i % 3
        v = centers[c] + rng.normal(size=8) * 0.2
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    got = {r.id: r.cluster for r in kmeans_fit_assign(df, k=3).collect()}
    assert len(got) == 90
    # each planted group lands in exactly one cluster, all distinct
    group_clusters = [
        {got[i] for i in range(g, 90, 3)} for g in range(3)
    ]
    assert all(len(s) == 1 for s in group_clusters), group_clusters
    assert len(set().union(*group_clusters)) == 3

    again = {
        r.id: r.cluster
        for r in kmeans_fit_assign(df.repartition(7), k=3).collect()
    }
    assert again == got
