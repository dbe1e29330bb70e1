"""Retraction through the standing-state tables (plans/retract.py,
VERDICT r11 #1): post-retraction reads equal a from-scratch build on the
surviving corpus (the m79==m74 pattern applied after a drop), replays
are no-ops, compaction makes the delete physical, and the ingest funnel
re-admits retracted content under a new id."""

from __future__ import annotations

import shutil
import time

from pyspark.sql import functions as F

TERMS = ("join", "vector", "stream")

DOCS = [
    (1, "join the stream of records and join again for vector work"),
    (2, "vector search over a stream needs a fast join plan"),
    (3, "wholly unrelated prose about gardens and weather patterns"),
    (4, "stream stream stream join vector join stream"),
    (5, "short vector note"),
    (6, "another document that says nothing about retrieval at all"),
    (7, "join vector stream join vector stream join vector stream"),
    (8, "final doc mentions join once amid other filler words here"),
]
DROP_IDS = {2, 4, 7}


def _docs(spark, rows=DOCS):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _survivors(spark):
    return _docs(spark, [r for r in DOCS if r[0] not in DROP_IDS])


def _bm25_rows(df):
    return sorted((r.id, r.n_hit_terms, r.score) for r in df.collect())


def test_retract_bm25_index_equals_from_scratch(spark, tmp_path):
    """Tombstone-filtered postings/doclens score IDENTICALLY to a
    from-scratch BM25 over the surviving corpus; a replayed retraction
    (same id) is a no-op; cost shape: the retraction commit appends one
    tombstone segment, never rewriting the index tables."""
    from novi_pdq_etl_project_prod_spark.operators.text import (
        bm25_scores,
        bm25_scores_from_index,
        build_bm25_index,
    )
    from novi_pdq_etl_project_prod_spark.plans.retract import (
        read_live_table,
        retract_docs,
    )
    from novi_pdq_etl_project_prod_spark.sources.layers import (
        commit_tables,
        segment_count,
    )

    root = str(tmp_path / "wh")
    # two increments -> two append segments per index table
    for rows in (DOCS[:4], DOCS[4:]):
        idx = build_bm25_index(_docs(spark, rows))
        commit_tables(
            {"bm25_postings": idx["postings"], "bm25_doclens": idx["doclens"]},
            root,
            "curated",
            append_tables=("bm25_postings", "bm25_doclens"),
        )
    drop = _docs(spark, [r for r in DOCS if r[0] in DROP_IDS])
    rep = retract_docs(drop, root, "curated", "cur-2026-08-a")
    assert rep == {
        "applied": True, "retraction_id": "cur-2026-08-a", "n_docs": 3,
    }
    # index tables untouched (still 2 segments each — O(drop) commit)
    assert segment_count(root, "curated", "bm25_postings") == 2
    assert segment_count(root, "curated", "bm25_doclens") == 2

    post = read_live_table(spark, root, "curated", "bm25_postings", "id")
    dl = read_live_table(spark, root, "curated", "bm25_doclens", "id")
    got = _bm25_rows(bm25_scores_from_index(post, dl, TERMS))
    want = _bm25_rows(bm25_scores(_survivors(spark), TERMS))
    assert got == want and len(got) > 0

    # replay: same retraction_id -> no-op, state byte-identical
    rep2 = retract_docs(drop, root, "curated", "cur-2026-08-a")
    assert rep2["applied"] is False
    post2 = read_live_table(spark, root, "curated", "bm25_postings", "id")
    assert sorted(map(tuple, post2.collect())) == sorted(
        map(tuple, post.collect())
    )


def test_retract_dsir_counts_and_guards(spark, tmp_path):
    """Negative bucket deltas cancel the dropped docs' mass exactly
    (summed live counts == from-scratch counts over survivors, zero-sum
    buckets aside), and the provenance guards refuse a mismatched
    n_buckets or an unseeded table."""
    import pytest

    from novi_pdq_etl_project_prod_spark.operators.text import (
        dsir_bucket_counts,
    )
    from novi_pdq_etl_project_prod_spark.plans.retract import (
        read_live_table,
        retract_docs,
    )
    from novi_pdq_etl_project_prod_spark.sources.layers import commit_tables

    root = str(tmp_path / "wh")
    b = 64
    for rows in (DOCS[:4], DOCS[4:]):
        commit_tables(
            {"dsir_raw_buckets": dsir_bucket_counts(_docs(spark, rows), n_buckets=b)},
            root,
            "curated",
            meta={"dsir_n_buckets:dsir_raw_buckets": b},
            append_tables=("dsir_raw_buckets",),
        )
    drop = _docs(spark, [r for r in DOCS if r[0] in DROP_IDS])

    with pytest.raises(ValueError, match="n_buckets"):
        retract_docs(
            drop, root, "curated", "bad-b",
            dsir_counts={"dsir_raw_buckets": 128},
        )
    with pytest.raises(ValueError, match="not in"):
        retract_docs(
            drop, root, "curated", "bad-t",
            dsir_counts={"dsir_other_buckets": b},
        )

    retract_docs(
        drop, root, "curated", "cur-dsir",
        dsir_counts={"dsir_raw_buckets": b},
    )
    live = (
        read_live_table(spark, root, "curated", "dsir_raw_buckets")
        .groupBy("b").agg(F.sum("n").alias("n"))
        .where(F.col("n") != 0)
    )
    want = dsir_bucket_counts(_survivors(spark), n_buckets=b)
    assert sorted(map(tuple, live.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_compact_retractions_physical_delete(spark, tmp_path):
    """One manifest commit rewrites every doc-keyed table anti-joined,
    drops the tombstones, resets segment lists; reads are identical
    before/after; non-attributed gram tables are skipped loudly and
    uncovered tables reported."""
    from novi_pdq_etl_project_prod_spark.operators.dedup import (
        doc_gram_set,
        gram_set,
    )
    from novi_pdq_etl_project_prod_spark.operators.text import (
        build_bm25_index,
    )
    from novi_pdq_etl_project_prod_spark.plans.retract import (
        compact_retractions,
        read_live_table,
        retract_docs,
    )
    from novi_pdq_etl_project_prod_spark.sources.layers import (
        commit_tables,
        read_manifest,
        read_manifest_meta,
        read_manifest_table,
        segment_count,
    )

    root = str(tmp_path / "wh")
    docs = _docs(spark)
    idx = build_bm25_index(docs)
    commit_tables(
        {
            "corpus": docs,
            "bm25_postings": idx["postings"],
            "bm25_doclens": idx["doclens"],
            # legacy SET-shaped gram table (no doc attribution)
            "standing_grams": gram_set(docs, k=3),
            # a table outside RETRACT_ID_COLS
            "aux_scores": docs.select("doc_id", F.length("text").alias("s")),
        },
        root,
        "curated",
        append_tables=("bm25_postings",),
    )
    drop = _docs(spark, [r for r in DOCS if r[0] in DROP_IDS])
    retract_docs(drop, root, "curated", "cur-x")

    before = sorted(
        map(tuple, read_live_table(
            spark, root, "curated", "bm25_postings", "id").collect())
    )
    rep = compact_retractions(spark, root, "curated")
    assert rep["applied"] is True
    assert rep["rewritten"] == [
        "bm25_doclens", "bm25_postings", "corpus",
    ]
    assert "standing_grams" in rep["skipped"]
    assert rep["untouched"] == ["aux_scores"]
    assert "retracted_ids" not in read_manifest(root, "curated")
    # physical: direct manifest read (no tombstone filter) lacks drops
    raw_corpus = read_manifest_table(spark, root, "curated", "corpus")
    assert {r.doc_id for r in raw_corpus.collect()} == {1, 3, 5, 6, 8}
    assert segment_count(root, "curated", "bm25_postings") == 1
    after = sorted(
        map(tuple, read_live_table(
            spark, root, "curated", "bm25_postings", "id").collect())
    )
    assert after == before
    # the retraction marker is KEPT (replay of cur-x stays a no-op)
    assert read_manifest_meta(root, "curated")["retraction:cur-x"][
        "n_docs"
    ] == 3
    # doc-attributed gram state IS retractable: same drop, fresh layer
    root2 = str(tmp_path / "wh2")
    commit_tables(
        {"standing_grams": doc_gram_set(docs, k=3)}, root2, "curated"
    )
    retract_docs(drop, root2, "curated", "cur-y")
    rep2 = compact_retractions(spark, root2, "curated")
    assert rep2["rewritten"] == ["standing_grams"]
    got_gh = {
        r.gh
        for r in read_manifest_table(
            spark, root2, "curated", "standing_grams"
        ).collect()
    }
    want_gh = {r.gh for r in gram_set(_survivors(spark), k=3).collect()}
    assert got_gh == want_gh


def test_stream_retractions_replay_no_double_subtract(spark, tmp_path):
    """The streaming retraction sink applies each drop batch exactly
    once: a checkpoint-loss replay changes nothing — the correctness
    line for the non-idempotent negative deltas."""
    from novi_pdq_etl_project_prod_spark.operators.text import (
        dsir_bucket_counts,
    )
    from novi_pdq_etl_project_prod_spark.plans.retract import read_live_table
    from novi_pdq_etl_project_prod_spark.sources.layers import (
        commit_tables,
        manifest_history,
    )
    from novi_pdq_etl_project_prod_spark.streaming.events import (
        stream_retractions,
    )

    root = str(tmp_path / "wh")
    b = 64
    commit_tables(
        {"dsir_raw_buckets": dsir_bucket_counts(_docs(spark), n_buckets=b)},
        root,
        "curated",
        append_tables=("dsir_raw_buckets",),
    )
    drops_dir = str(tmp_path / "drops")
    for ids in ((2,), (4, 7)):
        _docs(spark, [r for r in DOCS if r[0] in ids]).coalesce(1).write.mode(
            "append"
        ).parquet(drops_dir)
        time.sleep(1.1)
    chk = str(tmp_path / "chk")

    def _run():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(drops_dir)
        )
        stream_retractions(
            stream, root, "curated", chk,
            dsir_counts={"dsir_raw_buckets": b},
        )

    _run()
    n_commits = len(manifest_history(root, "curated"))
    assert n_commits == 3  # seed + 2 drop batches
    live = (
        read_live_table(spark, root, "curated", "dsir_raw_buckets")
        .groupBy("b").agg(F.sum("n").alias("n")).where(F.col("n") != 0)
    )
    want = dsir_bucket_counts(_survivors(spark), n_buckets=b)
    got_rows = sorted(map(tuple, live.collect()))
    assert got_rows == sorted(map(tuple, want.collect()))
    tomb = read_live_table(spark, root, "curated", "retracted_ids")
    assert sorted(r.id for r in tomb.collect()) == [2, 4, 7]

    # checkpoint loss: replayed batches are marker-gated no-ops
    shutil.rmtree(chk)
    _run()
    assert len(manifest_history(root, "curated")) == n_commits
    live2 = (
        read_live_table(spark, root, "curated", "dsir_raw_buckets")
        .groupBy("b").agg(F.sum("n").alias("n")).where(F.col("n") != 0)
    )
    assert sorted(map(tuple, live2.collect())) == got_rows


def test_ingest_funnel_readmits_retracted_content(spark, tmp_path):
    """After retracting an accepted doc, a re-arrival of its CONTENT
    under a NEW id flows through the funnel as accepted — the standing
    hash no longer exact-drops it and the standing signature no longer
    near-suppresses it (the from-scratch semantics the tombstone filter
    buys before any physical rewrite)."""
    from novi_pdq_etl_project_prod_spark.plans.ingest import (
        run_incremental_ingest,
    )
    from novi_pdq_etl_project_prod_spark.plans.retract import retract_docs
    from novi_pdq_etl_project_prod_spark.sources.layers import (
        read_manifest_tables,
    )

    rules = {"min_len": "length(trim(text)) >= 10"}
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    root = str(tmp_path / "wh")
    docs_dir = str(tmp_path / "docs")
    chk1 = str(tmp_path / "chk1")

    _docs(spark, [(1, text)]).coalesce(1).write.mode("append").parquet(
        docs_dir
    )
    stream = (
        spark.readStream.schema("doc_id long, text string").parquet(docs_dir)
    )
    run_incremental_ingest(stream, root, "curated", chk1, rules)

    retract_docs(_docs(spark, [(1, text)]), root, "curated", "drop-1")

    # same content, new id, fresh stream identity
    docs2 = str(tmp_path / "docs2")
    _docs(spark, [(2, text)]).coalesce(1).write.mode("append").parquet(docs2)
    stream2 = (
        spark.readStream.schema("doc_id long, text string").parquet(docs2)
    )
    run_incremental_ingest(
        stream2, root, "curated", str(tmp_path / "chk2"), rules
    )

    tables = read_manifest_tables(spark, root, "curated")
    corpus = {r.doc_id for r in tables["corpus"].collect()}
    assert 2 in corpus  # re-admitted, not exact_old / near_dup
    # no dup report ever materialized (empty frames are dropped from
    # commits — the re-arrival matched nothing standing)
    assert (
        "exact_dups" not in tables
        or tables["exact_dups"].where(F.col("doc_id") == 2).count() == 0
    )


def test_retractable_grams_through_ingest_and_compaction(spark, tmp_path):
    """retractable_grams=True persists doc-attributed (doc_id, gh) gram
    state; retraction + compaction leave exactly the surviving corpus'
    gram set, and the incremental span path reads the attributed table
    unchanged."""
    from novi_pdq_etl_project_prod_spark.operators.dedup import gram_set
    from novi_pdq_etl_project_prod_spark.plans.ingest import (
        run_incremental_ingest,
    )
    from novi_pdq_etl_project_prod_spark.plans.retract import (
        compact_retractions,
        retract_docs,
    )
    from novi_pdq_etl_project_prod_spark.sources.layers import (
        read_manifest_table,
    )

    rules = {"min_len": "length(trim(text)) >= 10"}
    rows = [
        (1, "one two three four five six seven eight nine ten"),
        (2, "eleven twelve thirteen fourteen fifteen sixteen seventeen"),
        (3, "twenty one twenty two twenty three twenty four twenty five"),
    ]
    root = str(tmp_path / "wh")
    docs_dir = str(tmp_path / "docs")
    _docs(spark, rows).coalesce(1).write.mode("append").parquet(docs_dir)
    stream = (
        spark.readStream.schema("doc_id long, text string").parquet(docs_dir)
    )
    run_incremental_ingest(
        stream, root, "curated", str(tmp_path / "chk"), rules,
        span_k=4, retractable_grams=True,
    )
    grams = read_manifest_table(spark, root, "curated", "standing_grams")
    assert set(grams.columns) == {"doc_id", "gh"}

    retract_docs(_docs(spark, rows[1:2]), root, "curated", "g-drop")
    rep = compact_retractions(spark, root, "curated")
    assert "standing_grams" in rep["rewritten"]
    got = {
        r.gh
        for r in read_manifest_table(
            spark, root, "curated", "standing_grams"
        ).collect()
    }
    want = {
        r.gh
        for r in gram_set(
            _docs(spark, [rows[0], rows[2]]), k=4
        ).collect()
    }
    assert got == want


def test_redropped_doc_never_double_subtracts(spark, tmp_path):
    """Doc-level idempotence (round-12 review): duplicate rows within a
    drop frame, and a doc retracted AGAIN under a NEW retraction_id,
    are filtered before the negative deltas — the bucket mass is
    subtracted exactly once, and the tombstone table holds one id set."""
    from novi_pdq_etl_project_prod_spark.operators.text import (
        dsir_bucket_counts,
    )
    from novi_pdq_etl_project_prod_spark.plans.retract import (
        read_live_table,
        retract_docs,
    )
    from novi_pdq_etl_project_prod_spark.sources.layers import commit_tables

    root = str(tmp_path / "wh")
    b = 64
    commit_tables(
        {"dsir_raw_buckets": dsir_bucket_counts(_docs(spark), n_buckets=b)},
        root,
        "curated",
        append_tables=("dsir_raw_buckets",),
    )
    # drop frame carries doc 2 TWICE (e.g. once per near-dup partner)
    dup_rows = [r for r in DOCS if r[0] == 2] * 2 + [
        r for r in DOCS if r[0] == 4
    ]
    retract_docs(
        _docs(spark, dup_rows), root, "curated", "first",
        dsir_counts={"dsir_raw_buckets": b},
    )
    # doc 2 re-dropped under a NEW retraction id alongside doc 7
    rep = retract_docs(
        _docs(spark, [r for r in DOCS if r[0] in (2, 7)]),
        root, "curated", "second",
        dsir_counts={"dsir_raw_buckets": b},
    )
    assert rep["applied"] is True and rep["n_docs"] == 1  # only doc 7
    live = (
        read_live_table(spark, root, "curated", "dsir_raw_buckets")
        .groupBy("b").agg(F.sum("n").alias("n")).where(F.col("n") != 0)
    )
    want = dsir_bucket_counts(_survivors(spark), n_buckets=b)
    assert sorted(map(tuple, live.collect())) == sorted(
        map(tuple, want.collect())
    )
    tomb = read_live_table(spark, root, "curated", "retracted_ids")
    assert sorted(r.id for r in tomb.collect()) == [2, 4, 7]


def test_curate_retract_maintain_composition(spark, tmp_path):
    """End to end, the curate-then-keep-ingesting flow: near-dup
    canonicalization over the live corpus drops the cluster losers
    through ONE retraction commit; searches immediately see the
    post-curation state; the maintenance tick (retraction_id_cols=True)
    then makes the delete physical on its normal cadence."""
    from novi_pdq_etl_project_prod_spark.operators.text import (
        bm25_scores,
        bm25_scores_from_index,
        build_bm25_index,
        dsir_bucket_counts,
    )
    from novi_pdq_etl_project_prod_spark.plans.maintenance import (
        run_maintenance_tick,
    )
    from novi_pdq_etl_project_prod_spark.plans.retract import (
        read_live_table,
        retract_near_dup_drops,
    )
    from novi_pdq_etl_project_prod_spark.sources.layers import (
        commit_tables,
        read_manifest,
        read_manifest_table,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, base),                      # near-dup cluster {1,2,3}:
        (2, base + " lam"),             #   survivor = 3 (longest),
        (3, base + " lam zup"),         #   drops = {1, 2}
        (4, "wholly distinct text about joins and vectors and streams"),
        (5, "another unique document mentioning join exactly once here"),
    ]
    docs = _docs(spark, rows)
    root = str(tmp_path / "wh")
    b = 64
    idx = build_bm25_index(docs)
    commit_tables(
        {
            "corpus": docs,
            "bm25_postings": idx["postings"],
            "bm25_doclens": idx["doclens"],
            "dsir_raw_buckets": dsir_bucket_counts(docs, n_buckets=b),
        },
        root,
        "curated",
        append_tables=("bm25_postings", "bm25_doclens",
                       "dsir_raw_buckets"),
    )
    rep = retract_near_dup_drops(
        spark, root, "curated", "curation-2026-08",
        dsir_counts={"dsir_raw_buckets": b},
    )
    assert rep["applied"] is True and rep["n_docs"] == 2
    assert rep["n_clusters"] >= 1

    survivors = _docs(spark, rows[2:])
    # live reads (tombstone-filtered) == from-scratch on survivors
    got = _bm25_rows(bm25_scores_from_index(
        read_live_table(spark, root, "curated", "bm25_postings", "id"),
        read_live_table(spark, root, "curated", "bm25_doclens", "id"),
        ("join", "alpha"),
    ))
    want = _bm25_rows(bm25_scores(survivors, ("join", "alpha")))
    assert got == want and len(got) > 0
    live_corpus = read_live_table(
        spark, root, "curated", "corpus", "doc_id"
    )
    assert {r.doc_id for r in live_corpus.collect()} == {3, 4, 5}

    # the maintenance tick makes it physical on the normal cadence
    tick = run_maintenance_tick(
        spark, root, "curated", retraction_id_cols=True,
    )
    assert tick["retractions"]["applied"] is True
    assert "corpus" in tick["retractions"]["rewritten"]
    assert "retracted_ids" not in read_manifest(root, "curated")
    raw = read_manifest_table(spark, root, "curated", "corpus")
    assert {r.doc_id for r in raw.collect()} == {3, 4, 5}
    # idempotent curation: a rerun finds the same clusters already
    # resolved — nothing to drop (marker replay also guards)
    rep2 = retract_near_dup_drops(
        spark, root, "curated", "curation-2026-08-b",
        dsir_counts={"dsir_raw_buckets": b},
    )
    assert rep2["n_docs"] == 0
    # next tick: retraction lane reports a clean no-op
    tick2 = run_maintenance_tick(
        spark, root, "curated", retraction_id_cols=True,
    )
    assert tick2["retractions"]["applied"] is False


def test_rewrite_docs_atomic_excision_roundtrip(spark, tmp_path):
    """The REWRITE half of the retraction story: span excision changes
    doc content; rewrite_docs retracts the old identities and re-ingests
    the cleaned versions through the funnel in ONE manifest flip. A
    rewrite that collapses into existing content is exact-dropped (its
    old id still retracted); live BM25 and DSIR state equal a
    from-scratch build over the final corpus; replay is a no-op."""
    from novi_pdq_etl_project_prod_spark.operators.dedup import (
        excise_repeated_spans,
    )
    from novi_pdq_etl_project_prod_spark.operators.text import (
        bm25_scores,
        bm25_scores_from_index,
        build_bm25_index,
        dsir_bucket_counts,
    )
    from novi_pdq_etl_project_prod_spark.plans.retract import (
        read_live_table,
        rewrite_docs,
    )
    from novi_pdq_etl_project_prod_spark.sources.layers import (
        commit_tables,
        manifest_history,
    )

    block = " ".join(f"s{i}" for i in range(10))  # 10-token repeat
    p = "alpha beta gamma delta epsilon"
    q = "zeta eta theta iota kappa lam"
    rows = [
        (1, p + " " + block),   # cleaned -> p (== doc 4's text: dup!)
        (2, q + " " + block),   # cleaned -> q (unique: accepted)
        (3, "wholly unrelated standing document with its own words"),
        (4, p),                 # standing doc equal to 1's cleaned text
    ]
    docs = _docs(spark, rows)
    b = 64
    root = str(tmp_path / "wh")
    idx = build_bm25_index(docs)
    hashes = (
        docs.selectExpr("md5(text) AS h", "doc_id")
        .groupBy("h").agg(F.min("doc_id").alias("canonical_id"))
    )
    from novi_pdq_etl_project_prod_spark.operators.dedup import (
        minhash_signatures_md5,
    )

    commit_tables(
        {
            "corpus": docs,
            "content_hashes": hashes,
            "minhash_signatures": minhash_signatures_md5(
                docs, "doc_id", "text", 3, 64
            ),
            "bm25_postings": idx["postings"],
            "bm25_doclens": idx["doclens"],
            "dsir_raw_buckets": dsir_bucket_counts(docs, n_buckets=b),
        },
        root,
        "curated",
        append_tables=("bm25_postings", "bm25_doclens",
                       "dsir_raw_buckets"),
    )
    n0 = len(manifest_history(root, "curated"))

    ex = excise_repeated_spans(docs, k=10, min_count=2)
    rewrites = (
        ex.where(F.col("n_removed") > 0)
        .select(F.col("doc_id").alias("old_id"),
                F.col("text").alias("new_text"))
        .join(docs.select(F.col("doc_id").alias("old_id"),
                          F.col("text").alias("old_text")), "old_id")
        .withColumn("new_id", F.col("old_id") + 100)
    )
    rep = rewrite_docs(
        rewrites, root, "curated", "excise-2026-08",
        rules={"nonempty": "length(trim(text)) > 0"},
        bm25_tables={"postings": "bm25_postings",
                     "doclens": "bm25_doclens"},
        dsir_counts={"dsir_raw_buckets": b},
    )
    assert rep == {"applied": True, "retraction_id": "excise-2026-08",
                   "n_rewrites": 2, "n_quarantined": 0}
    # ONE atomic commit for the whole rewrite
    assert len(manifest_history(root, "curated")) == n0 + 1

    final_rows = [(3, rows[2][1]), (4, p), (102, q)]
    live_corpus = read_live_table(spark, root, "curated", "corpus",
                                  "doc_id")
    assert {r.doc_id for r in live_corpus.collect()} == {3, 4, 102}
    dups = read_live_table(spark, root, "curated", "exact_dups", "doc_id")
    assert [(r.doc_id, r.dup_of, r.dup_type) for r in dups.collect()] == [
        (101, 4, "exact_old")
    ]
    got = _bm25_rows(bm25_scores_from_index(
        read_live_table(spark, root, "curated", "bm25_postings", "id"),
        read_live_table(spark, root, "curated", "bm25_doclens", "id"),
        ("alpha", "zeta", "s0"),
    ))
    want = _bm25_rows(
        bm25_scores(_docs(spark, final_rows), ("alpha", "zeta", "s0"))
    )
    assert got == want and len(got) > 0
    live_counts = (
        read_live_table(spark, root, "curated", "dsir_raw_buckets")
        .groupBy("b").agg(F.sum("n").alias("n")).where(F.col("n") != 0)
    )
    want_counts = dsir_bucket_counts(_docs(spark, final_rows), n_buckets=b)
    assert sorted(map(tuple, live_counts.collect())) == sorted(
        map(tuple, want_counts.collect())
    )
    # replay: no-op
    rep2 = rewrite_docs(
        rewrites, root, "curated", "excise-2026-08",
        rules={"nonempty": "length(trim(text)) > 0"},
    )
    assert rep2["applied"] is False
    assert len(manifest_history(root, "curated")) == n0 + 1


def test_standalone_sinks_honor_retraction(spark, tmp_path):
    """The standalone incremental sinks (not just the composed funnel)
    read standing state through the tombstone filter: after retracting
    a doc, a re-arrival of its exact content under a new id is NOT
    reported exact_old, and a near-dup of it pairs with nothing."""
    from novi_pdq_etl_project_prod_spark.plans.retract import retract_docs
    from novi_pdq_etl_project_prod_spark.sources.layers import (
        read_manifest,
        read_manifest_tables,
    )
    from novi_pdq_etl_project_prod_spark.streaming.events import (
        stream_incremental_exact_dups,
        stream_incremental_near_dups,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"

    def _feed(dirname, rows):
        d = str(tmp_path / dirname)
        _docs(spark, rows).coalesce(1).write.mode("append").parquet(d)
        return (
            spark.readStream.schema("doc_id long, text string").parquet(d)
        )

    root = str(tmp_path / "wh")
    stream_incremental_exact_dups(
        _feed("d1", [(1, base)]), root, "curated", str(tmp_path / "c1")
    )
    stream_incremental_near_dups(
        _feed("d2", [(1, base)]), root, "curated", str(tmp_path / "c2")
    )
    retract_docs(_docs(spark, [(1, base)]), root, "curated", "drop-1")

    # exact re-arrival under a new id: accepted as NEW content
    stream_incremental_exact_dups(
        _feed("d3", [(2, base)]), root, "curated", str(tmp_path / "c3")
    )
    tables = read_manifest_tables(spark, root, "curated")
    dups = (
        [] if "exact_dups" not in read_manifest(root, "curated")
        else [(r.doc_id, r.dup_type) for r in tables["exact_dups"].collect()]
    )
    assert ("2", "exact_old") not in dups and (2, "exact_old") not in dups
    # the new id's hash row landed (so FUTURE copies of it dedup again)
    hashes = read_manifest_tables(spark, root, "curated")["content_hashes"]
    assert 2 in {r.canonical_id for r in hashes.collect()}

    # near-dup of the retracted doc: pairs with nothing standing
    stream_incremental_near_dups(
        _feed("d4", [(3, base + " lam")]), root, "curated",
        str(tmp_path / "c4"),
    )
    manifest = read_manifest(root, "curated")
    if "near_dup_pairs" in manifest:
        pairs = read_manifest_tables(spark, root, "curated")[
            "near_dup_pairs"
        ]
        assert pairs.where(
            (F.col("id_a") == 1) | (F.col("id_b") == 1)
        ).count() == 0
