"""Round-5 second-wave operator tests: CDC apply, incremental aggregate
merge, weighted moving average, cumulative distinct, interval overlap
join, containment pairs, cluster-scoped dup pairs.

Catalog-level value parity is covered by test_oracle_parity (every new
query is oracled); these tests pin the operator semantics the oracle
cannot see — edge orderings, error paths, and equivalence to a naive
reference implementation on adversarial micro-fixtures.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from novi_pdq_etl_project_prod_spark.operators.cdc import (
    apply_changes,
    merge_partial_aggs,
)
from novi_pdq_etl_project_prod_spark.operators.joins import interval_overlap_join
from novi_pdq_etl_project_prod_spark.operators.timeseries import weighted_moving_avg
from novi_pdq_etl_project_prod_spark.operators.windows import cumulative_distinct


# ---------------------------------------------------------------------------
# CDC apply
# ---------------------------------------------------------------------------

def _changelog(spark):
    rows = [
        # k1: insert -> update  => survives with v=2
        Row(k=1, seq=1, op="upsert", v=1),
        Row(k=1, seq=2, op="upsert", v=2),
        # k2: insert -> delete  => gone
        Row(k=2, seq=1, op="upsert", v=10),
        Row(k=2, seq=2, op="delete", v=None),
        # k3: delete -> re-insert (resurrection) => survives with v=30
        Row(k=3, seq=1, op="upsert", v=3),
        Row(k=3, seq=2, op="delete", v=None),
        Row(k=3, seq=3, op="upsert", v=30),
        # k4: only a tombstone => gone
        Row(k=4, seq=1, op="delete", v=None),
    ]
    return spark.createDataFrame(rows)


def test_apply_changes_latest_wins_and_deletes(spark):
    out = apply_changes(_changelog(spark), ["k"], ["seq"], "op")
    got = {r["k"]: r["v"] for r in out.collect()}
    assert got == {1: 2, 3: 30}


def test_apply_changes_requires_sequence(spark):
    with pytest.raises(ValueError):
        apply_changes(_changelog(spark), ["k"], [], "op")


def test_apply_changes_tie_break_is_total(spark):
    # two changes at the same seq: the second seq column breaks the tie
    rows = [
        Row(k=1, seq=1, sub=1, op="upsert", v=1),
        Row(k=1, seq=1, sub=2, op="upsert", v=2),
    ]
    out = apply_changes(
        spark.createDataFrame(rows), ["k"], ["seq", "sub"], "op"
    )
    assert [r["v"] for r in out.collect()] == [2]


# ---------------------------------------------------------------------------
# Incremental aggregate merge
# ---------------------------------------------------------------------------

def test_merge_partial_aggs_equals_full_recompute(spark):
    df = spark.range(1000).select(
        (F.col("id") % 7).alias("k"),
        F.col("id").alias("x"),
    )
    a = df.where(F.col("x") < 600)
    b = df.where(F.col("x") >= 600)

    def agg(d):
        return d.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("s"),
            F.min("x").alias("lo"),
            F.max("x").alias("hi"),
        )

    merged = merge_partial_aggs(
        agg(a), agg(b), ["k"], sum_cols=["n", "s"], min_cols=["lo"], max_cols=["hi"]
    )
    full = agg(df)
    assert sorted(merged.collect()) == sorted(full.collect())


def test_merge_partial_aggs_validates_columns(spark):
    d = spark.range(5).groupBy().agg(F.count(F.lit(1)).alias("n"))
    with pytest.raises(ValueError):
        merge_partial_aggs(d, d, [], sum_cols=["missing"])
    with pytest.raises(ValueError):
        merge_partial_aggs(d, d, [])


# ---------------------------------------------------------------------------
# Weighted moving average
# ---------------------------------------------------------------------------

def test_weighted_moving_avg_values_and_warmup(spark):
    rows = [Row(k="a", t=i, x=v) for i, v in enumerate([10, 20, 30, 40])]
    out = weighted_moving_avg(
        spark.createDataFrame(rows), ["k"], "t", "x", k=3
    ).orderBy("t")
    got = [r["wma"] for r in out.collect()]
    # first k-1 rows: no full window yet
    assert got[0] is None and got[1] is None
    # (3*30 + 2*20 + 1*10) / 6, (3*40 + 2*30 + 1*20) / 6
    assert got[2] == pytest.approx(140 / 6)
    assert got[3] == pytest.approx(200 / 6)


def test_weighted_moving_avg_k1_is_identity(spark):
    rows = [Row(k="a", t=i, x=i * 5) for i in range(3)]
    out = weighted_moving_avg(spark.createDataFrame(rows), ["k"], "t", "x", k=1)
    assert [r["wma"] for r in out.orderBy("t").collect()] == [0.0, 5.0, 10.0]
    with pytest.raises(ValueError):
        weighted_moving_avg(spark.createDataFrame(rows), ["k"], "t", "x", k=0)


# ---------------------------------------------------------------------------
# Cumulative distinct
# ---------------------------------------------------------------------------

def test_cumulative_distinct_counts_entities_once(spark):
    rows = [
        Row(u=1, t=1), Row(u=1, t=2),          # day 1: u1 twice
        Row(u=2, t=11), Row(u=1, t=12),        # day 2: u2 new, u1 repeat
        Row(u=3, t=21), Row(u=2, t=22),        # day 3: u3 new
    ]
    df = spark.createDataFrame(rows).withColumn("day", (F.col("t") / 10).cast("int"))
    out = (
        cumulative_distinct(df, "u", ["t"], "day", grain_name="day")
        .orderBy("day")
        .collect()
    )
    assert [(r["day"], r["n_events"], r["n_new"], r["cum_distinct"]) for r in out] == [
        (0, 2, 1, 1),
        (1, 2, 1, 2),
        (2, 2, 1, 3),
    ]


# ---------------------------------------------------------------------------
# Interval overlap join
# ---------------------------------------------------------------------------

def _naive_overlap(lefts, rights, closed=True):
    out = []
    for li, (llo, lhi) in lefts:
        for ri, (rlo, rhi) in rights:
            ok = (llo <= rhi and rlo <= lhi) if closed else (llo < rhi and rlo < lhi)
            if ok:
                out.append((li, ri))
    return sorted(out)


def test_interval_overlap_join_matches_naive_across_widths(spark):
    import random

    rng = random.Random(7)
    lefts = [(i, (lo := rng.randint(0, 500), lo + rng.randint(0, 80))) for i in range(60)]
    rights = [(i, (lo := rng.randint(0, 500), lo + rng.randint(0, 80))) for i in range(60)]
    ldf = spark.createDataFrame(
        [Row(lid=i, llo=a, lhi=b) for i, (a, b) in lefts]
    )
    rdf = spark.createDataFrame(
        [Row(rid=i, rlo=a, rhi=b) for i, (a, b) in rights]
    )
    expect = _naive_overlap(lefts, rights)
    # the canonical-first-bucket dedup must hold for ANY bucket width
    for width in (7, 64, 1000):
        got = sorted(
            (r["lid"], r["rid"])
            for r in interval_overlap_join(
                ldf, rdf, "llo", "lhi", "rlo", "rhi", bucket_width=width
            ).collect()
        )
        assert got == expect, f"width={width}"


def test_interval_overlap_join_open_intervals(spark):
    # touching endpoints: closed joins them, open does not
    ldf = spark.createDataFrame([Row(lid=1, llo=0, lhi=10)])
    rdf = spark.createDataFrame([Row(rid=1, rlo=10, rhi=20)])
    closed = interval_overlap_join(ldf, rdf, "llo", "lhi", "rlo", "rhi", 8)
    opened = interval_overlap_join(
        ldf, rdf, "llo", "lhi", "rlo", "rhi", 8, closed=False
    )
    assert closed.count() == 1
    assert opened.count() == 0


# ---------------------------------------------------------------------------
# Cluster-scoped dup pairs (SemDeDup)
# ---------------------------------------------------------------------------

def test_cluster_scoped_dup_pairs_matches_numpy(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    vecs, rows = {}, []
    for i in range(80):
        v = rng.normal(size=8)
        v /= np.linalg.norm(v)
        vecs[i] = v
        rows.append(Row(vec_id=i, embedding=[float(x) for x in v], label=i % 4))
    df = spark.createDataFrame(rows)

    from novi_pdq_etl_project_prod_spark.operators.similarity import (
        cluster_scoped_dup_pairs,
    )

    got = {
        (r["id_a"], r["id_b"])
        for r in cluster_scoped_dup_pairs(
            df, threshold_num=1, threshold_den=2
        ).collect()
    }
    # exact ground truth on the SAME milli-unit integers the operator uses
    expect = set()
    for a in range(80):
        for b in range(a + 1, 80):
            if a % 4 != b % 4:
                continue
            va = np.round(vecs[a] * 1000).astype(np.int64)
            vb = np.round(vecs[b] * 1000).astype(np.int64)
            dot = int(va @ vb)
            if dot >= 0 and 4 * dot * dot >= 1 * int(va @ va) * int(vb @ vb):
                expect.add((a, b))
    assert got == expect
    # cross-cluster pairs must never appear, regardless of similarity
    labels = {i: i % 4 for i in range(80)}
    assert all(labels[a] == labels[b] for a, b in got)


# ---------------------------------------------------------------------------
# Containment pairs
# ---------------------------------------------------------------------------

def test_containment_pairs_directed_subset(spark):
    from novi_pdq_etl_project_prod_spark.operators.dedup import (
        ngram_containment_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        Row(doc_id=1, text=base),                               # contained in 2
        Row(doc_id=2, text=base + " plus a very long unrelated tail "
            + " ".join(f"w{i}" for i in range(40))),
        Row(doc_id=3, text="совершенно другой текст без общих слов вообще "
            + " ".join(f"z{i}" for i in range(20))),
    ]
    out = ngram_containment_pairs(
        spark.createDataFrame(rows), n=3, threshold=0.9
    ).collect()
    got = {(r["id_a"], r["id_b"]): r["containment"] for r in out}
    # doc1 ⊂ doc2 at containment 1.0; the reverse direction fails the bar
    assert (1, 2) in got and got[(1, 2)] == 1.0
    assert (2, 1) not in got
    assert not any(3 in pair for pair in got)


# ---------------------------------------------------------------------------
# Embedding covariance moments
# ---------------------------------------------------------------------------

def test_embedding_covariance_partition_independent(spark):
    import numpy as np

    from novi_pdq_etl_project_prod_spark.operators.similarity import (
        embedding_covariance_moments,
    )

    rng = np.random.default_rng(3)
    rows = [
        Row(vec_id=i, embedding=[float(x) for x in rng.normal(size=5)])
        for i in range(200)
    ]
    df = spark.createDataFrame(rows)
    one = embedding_covariance_moments(df.coalesce(1)).collect()
    many = embedding_covariance_moments(df.repartition(13)).collect()
    key = lambda r: (r["dim_a"], r["dim_b"])  # noqa: E731
    assert sorted(one, key=key) == sorted(many, key=key)
    # spot-check cov against numpy population covariance on the SAME
    # quantized integers
    V = np.stack([np.asarray(r.embedding) for r in rows])
    M = (np.trunc(np.abs(V) * 1e6 + 0.5) * np.sign(V)).astype(np.int64)
    C = np.cov(M.T, bias=True) / 1e12
    got = {(r["dim_a"], r["dim_b"]): r["cov"] for r in one}
    for a in range(5):
        for b in range(a, 5):
            assert got[(a, b)] == pytest.approx(C[a, b], rel=1e-9)


# ---------------------------------------------------------------------------
# Dup-adjusted token accounting
# ---------------------------------------------------------------------------

def test_dup_adjusted_tokens_planted_duplicates(spark):
    from novi_pdq_etl_project_prod_spark.operators.text import (
        dup_adjusted_token_stats,
    )

    rows = [
        Row(doc_id=1, source="a", text="alpha beta gamma"),
        Row(doc_id=2, source="a", text="Alpha  beta   GAMMA"),  # dup of 1 (normalized)
        Row(doc_id=3, source="b", text="alpha beta gamma"),     # cross-source dup of 1
        Row(doc_id=4, source="b", text="unique text here now"),
    ]
    out = {r["grp"]: r for r in dup_adjusted_token_stats(spark.createDataFrame(rows)).collect()}
    # representative of the dup cluster is doc 1 (source a)
    assert out["a"]["n_docs"] == 2 and out["a"]["n_unique_docs"] == 1
    assert out["a"]["raw_tokens"] == 6 and out["a"]["unique_tokens"] == 3
    # source b's copy of the cluster counts zero unique tokens
    assert out["b"]["n_docs"] == 2 and out["b"]["n_unique_docs"] == 1
    assert out["b"]["raw_tokens"] == 7 and out["b"]["unique_tokens"] == 4


# ---------------------------------------------------------------------------
# Grouped table checksum
# ---------------------------------------------------------------------------

def test_grouped_checksum_localizes_drift(spark):
    from novi_pdq_etl_project_prod_spark.operators.quality import (
        grouped_table_checksum,
    )

    base = spark.range(100).select(
        (F.col("id") % 5).alias("g"),
        F.col("id").alias("k"),
        (F.col("id") * 7).alias("v"),
    )
    # replica with ONE value changed in group 2, plus a row order shuffle
    drifted = base.withColumn(
        "v", F.when(F.col("k") == 42, F.lit(-1)).otherwise(F.col("v"))
    ).repartition(7)
    cols = [F.col("k").cast("string"), F.col("v").cast("string")]
    a = {r["g"]: (r["n_rows"], r["xor_hi"], r["xor_lo"])
         for r in grouped_table_checksum(base, ["g"], cols).collect()}
    b = {r["g"]: (r["n_rows"], r["xor_hi"], r["xor_lo"])
         for r in grouped_table_checksum(drifted, ["g"], cols).collect()}
    diff = [g for g in a if a[g] != b[g]]
    assert diff == [42 % 5]          # exactly the drifted group flags
    assert all(a[g] == b[g] for g in a if g != 42 % 5)  # order-independent


def test_cluster_scoped_dup_pairs_cap_bounds_cells(spark):
    import numpy as np

    from novi_pdq_etl_project_prod_spark.operators.similarity import (
        cluster_scoped_dup_pairs,
    )

    rng = np.random.default_rng(5)
    rows = []
    for i in range(120):
        v = rng.normal(size=6)
        v /= np.linalg.norm(v)
        rows.append(Row(vec_id=i, embedding=[float(x) for x in v], label=0))
    df = spark.createDataFrame(rows)  # one hot cluster of 120
    full = cluster_scoped_dup_pairs(df, threshold_num=0, threshold_den=1)
    capped = cluster_scoped_dup_pairs(
        df, threshold_num=0, threshold_den=1, max_cluster_size=30
    )
    n_full, n_capped = full.count(), capped.count()
    # threshold 0 keeps every non-negative-dot pair: the cap must cut the
    # candidate mass roughly by the sub-split factor (4 sub-cells)
    assert n_capped < n_full / 2
    # capped output is a SUBSET of the exact pairs (no false pairs)
    fullset = {(r["id_a"], r["id_b"]) for r in full.collect()}
    capset = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert capset <= fullset
    # small clusters are untouched by the cap
    df2 = spark.createDataFrame(rows[:20])
    a = {(r["id_a"], r["id_b"]) for r in cluster_scoped_dup_pairs(
        df2, threshold_num=0, threshold_den=1).collect()}
    b = {(r["id_a"], r["id_b"]) for r in cluster_scoped_dup_pairs(
        df2, threshold_num=0, threshold_den=1, max_cluster_size=30).collect()}
    assert a == b


def test_interval_overlap_join_span_cap_quarantines_long_intervals(spark):
    ldf = spark.createDataFrame(
        [Row(lid=1, llo=0, lhi=5), Row(lid=2, llo=0, lhi=10_000)]
    )
    rdf = spark.createDataFrame([Row(rid=1, rlo=3, rhi=8)])
    # uncapped: both left intervals overlap the right one
    full = interval_overlap_join(ldf, rdf, "llo", "lhi", "rlo", "rhi", 10)
    assert {r["lid"] for r in full.collect()} == {1, 2}
    # capped at 3 buckets: the 1000-bucket interval is quarantined
    capped = interval_overlap_join(
        ldf, rdf, "llo", "lhi", "rlo", "rhi", 10, max_span_buckets=3
    )
    assert {r["lid"] for r in capped.collect()} == {1}


def test_apply_changes_matches_python_model_on_random_changelogs(spark):
    import random

    for seed in (0, 1, 2, 3, 4):
        rng = random.Random(seed)
        rows = [
            Row(
                k=rng.randint(1, 6),
                seq=i,
                op=rng.choice(["upsert", "upsert", "delete"]),
                v=rng.randint(0, 99),
            )
            for i in range(rng.randint(1, 40))
        ]
        # python model: replay in seq order, latest op wins per key
        state = {}
        for r in sorted(rows, key=lambda r: r.seq):
            if r.op == "delete":
                state.pop(r.k, None)
            else:
                state[r.k] = r.v
        got = {
            r["k"]: r["v"]
            for r in apply_changes(
                spark.createDataFrame(rows).repartition(5), ["k"], ["seq"], "op"
            ).collect()
        }
        assert got == state, f"seed={seed}"


def test_merge_partial_aggs_matches_recompute_on_random_splits(spark):
    import random

    df = spark.range(500).select(
        (F.col("id") % 11).alias("k"), (F.col("id") * 3 % 97).alias("x")
    )

    def agg(d):
        return d.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("s"),
            F.min("x").alias("lo"),
            F.max("x").alias("hi"),
        )

    full = sorted(agg(df).collect())
    for seed in (7, 8, 9):
        cut = random.Random(seed).randint(1, 499)
        merged = merge_partial_aggs(
            agg(df.where(F.col("id") < cut)),
            agg(df.where(F.col("id") >= cut)),
            ["k"],
            sum_cols=["n", "s"],
            min_cols=["lo"],
            max_cols=["hi"],
        )
        assert sorted(merged.collect()) == full, f"seed={seed}"


def test_cluster_scoped_dup_pairs_arrow_equals_jvm(spark):
    import numpy as np

    from novi_pdq_etl_project_prod_spark.operators.similarity import (
        cluster_scoped_dup_pairs,
    )

    rng = np.random.default_rng(17)
    rows = []
    for i in range(90):
        v = rng.normal(size=7)
        v /= np.linalg.norm(v)
        rows.append(Row(vec_id=i, embedding=[float(x) for x in v], label=i % 3))
    df = spark.createDataFrame(rows).repartition(6)
    for cap in (None, 20):
        a = sorted(cluster_scoped_dup_pairs(
            df, threshold_num=1, threshold_den=4,
            max_cluster_size=cap, use_arrow=True).collect())
        j = sorted(cluster_scoped_dup_pairs(
            df, threshold_num=1, threshold_den=4,
            max_cluster_size=cap, use_arrow=False).collect())
        # exact integer arithmetic on both engines: BIT-identical rows
        assert a == j and a, f"cap={cap}"


def test_lsh_pairs_block_engine_equals_pairs_engine(spark):
    import numpy as np

    from novi_pdq_etl_project_prod_spark.operators.similarity import (
        embedding_near_dup_pairs_lsh,
    )

    rng = np.random.default_rng(23)
    rows = []
    for i in range(300):
        v = rng.normal(size=16)
        v /= np.linalg.norm(v)
        rows.append(Row(vec_id=i, embedding=[float(x) for x in v]))
    df = spark.createDataFrame(rows)
    kw = dict(dim=16, nbits=4, n_tables=8, threshold=0.2,
              max_bucket_occupancy=500)
    blk = {(r["id_a"], r["id_b"]) for r in
           embedding_near_dup_pairs_lsh(df, engine="block", **kw).collect()}
    prs = {(r["id_a"], r["id_b"]) for r in
           embedding_near_dup_pairs_lsh(df, engine="pairs", **kw).collect()}
    # same buckets, same vectors: identical pair sets (cos may differ by
    # one ulp between BLAS gemm and einsum, but 0.2 is not a knife edge)
    assert blk == prs and blk
