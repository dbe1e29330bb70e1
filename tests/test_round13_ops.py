"""Round-13 operators: retractable gram state certification (m87), the
persisted-IVF hybrid identity pin (m88 == m85), retraction-marker
folding, the quarantined-rewrite contract, gram-shape flag validation,
and the DSIR net-negative reader guard (VERDICT r12 items 2/3/5 +
ADVICE r12 1-4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"

DOCS = [
    (1, "join the stream of records and join again for vector work"),
    (2, "vector search over a stream needs a fast join plan"),
    (3, "wholly unrelated prose about gardens and weather patterns"),
    (4, "stream stream stream join vector join stream"),
    (5, "short vector note"),
    (6, "another document that says nothing about retrieval at all"),
]


def _docs(spark, rows=DOCS):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# m87 — retractable gram state
# ---------------------------------------------------------------------------


def test_m87_equals_from_scratch_gram_build(spark):
    """The certified claim, in-engine: the accumulated doc-attributed
    gram table anti-joined against the drop list routes the span
    detector EXACTLY like a gram set built from scratch over the
    surviving corpus — and the drop actually bites (some span set
    differs from the unretracted run)."""
    from novi_pdq_etl_project_prod_spark.catalog import (
        round13_queries as r13,
    )
    from novi_pdq_etl_project_prod_spark.operators.dedup import (
        doc_gram_set,
        gram_set,
        incremental_repeated_spans,
    )
    from novi_pdq_etl_project_prod_spark.session import read_table

    k = r13._M87_K
    docs = read_table(spark, SF, "documents")
    standing = docs.where(F.col("doc_id") % 2 == 0)
    survivors = standing.where(~F.expr(r13._M87_DROP))
    inc = docs.where(F.col("doc_id") % 2 == 1)

    got = sorted(
        map(tuple, r13.QUERIES["m87_retracted_grams"](spark, SF).collect())
    )
    want = sorted(
        map(
            tuple,
            incremental_repeated_spans(
                inc, gram_set(survivors, k=k), k=k
            ).collect(),
        )
    )
    assert got == want and len(got) > 0

    unretracted = sorted(
        map(
            tuple,
            incremental_repeated_spans(
                inc, doc_gram_set(standing, k=k), k=k
            ).collect(),
        )
    )
    assert got != unretracted, (
        "retraction changed no span — drop set too small to bite"
    )


# ---------------------------------------------------------------------------
# m88 — persisted-IVF hybrid identity
# ---------------------------------------------------------------------------


def test_m88_identical_to_m85(spark):
    """Two paths, one answer (the m79==m74 pattern): the persisted-index
    hybrid's fused ranking is ROW-IDENTICAL to m85's in-query IVF route
    — same deterministic centroids, same probe routing, same fusion."""
    from novi_pdq_etl_project_prod_spark.catalog import (
        round12_queries as r12,
        round13_queries as r13,
    )

    ann = sorted(
        map(tuple, r12.QUERIES["m85_hybrid_ann"](spark, SF).collect())
    )
    persisted = sorted(
        map(
            tuple,
            r13.QUERIES["m88_hybrid_ann_persisted"](spark, SF).collect(),
        )
    )
    assert persisted == ann and len(persisted) > 0


# ---------------------------------------------------------------------------
# retraction-marker folding (VERDICT r12 #3)
# ---------------------------------------------------------------------------


def test_fold_retraction_markers_bounds_meta_and_keeps_exactly_once(
    spark, tmp_path
):
    """Folding moves every retraction:<id> meta marker into the
    append-shaped applied_retractions table in ONE CAS commit; a LATE
    replay of a folded retraction is still a no-op (no double
    subtract), non-retraction meta survives, and a second fold is a
    clean no-op."""
    from novi_pdq_etl_project_prod_spark.operators.text import (
        dsir_bucket_counts,
    )
    from novi_pdq_etl_project_prod_spark.plans.retract import (
        APPLIED_RETRACTIONS_TABLE,
        fold_retraction_markers,
        read_live_table,
        retract_docs,
    )
    from novi_pdq_etl_project_prod_spark.sources.layers import (
        commit_tables,
        read_manifest,
        read_manifest_meta,
    )

    root = str(tmp_path / "wh")
    b = 64
    commit_tables(
        {"dsir_raw_buckets": dsir_bucket_counts(_docs(spark), n_buckets=b)},
        root,
        "curated",
        append_tables=("dsir_raw_buckets",),
    )
    drop_a = _docs(spark, [r for r in DOCS if r[0] == 2])
    drop_b = _docs(spark, [r for r in DOCS if r[0] == 4])
    retract_docs(
        drop_a, root, "curated", "ra", dsir_counts={"dsir_raw_buckets": b}
    )
    retract_docs(
        drop_b, root, "curated", "rb", dsir_counts={"dsir_raw_buckets": b}
    )
    live_before = sorted(
        map(
            tuple,
            read_live_table(spark, root, "curated", "dsir_raw_buckets")
            .groupBy("b").agg(F.sum("n").alias("n"))
            .where(F.col("n") != 0).collect(),
        )
    )

    rep = fold_retraction_markers(spark, root, "curated")
    assert rep["applied"] is True and rep["n_folded"] == 2
    meta = read_manifest_meta(root, "curated")
    assert not any(k.startswith("retraction:") for k in meta)
    # non-retraction meta survives the fold
    assert meta["dsir_n_buckets:dsir_raw_buckets"] == b
    applied = read_live_table(
        spark, root, "curated", APPLIED_RETRACTIONS_TABLE
    )
    assert sorted(r.retraction_id for r in applied.collect()) == ["ra", "rb"]

    # LATE replay of a folded retraction: still exactly-once
    rep2 = retract_docs(
        drop_a, root, "curated", "ra", dsir_counts={"dsir_raw_buckets": b}
    )
    assert rep2["applied"] is False
    live_after = sorted(
        map(
            tuple,
            read_live_table(spark, root, "curated", "dsir_raw_buckets")
            .groupBy("b").agg(F.sum("n").alias("n"))
            .where(F.col("n") != 0).collect(),
        )
    )
    assert live_after == live_before

    # second fold: nothing to move
    assert fold_retraction_markers(spark, root, "curated")["applied"] is False

    # a FRESH retraction after the fold still applies and re-folds
    retract_docs(
        _docs(spark, [r for r in DOCS if r[0] == 6]), root, "curated", "rc"
    )
    rep3 = fold_retraction_markers(spark, root, "curated")
    assert rep3["n_folded"] == 1
    applied2 = read_live_table(
        spark, root, "curated", APPLIED_RETRACTIONS_TABLE
    )
    assert sorted(r.retraction_id for r in applied2.collect()) == [
        "ra", "rb", "rc",
    ]
    # the protocol table is never reported as an uncovered doc-keyed
    # table by compaction
    from novi_pdq_etl_project_prod_spark.plans.retract import (
        compact_retractions,
    )

    crep = compact_retractions(spark, root, "curated")
    assert crep["applied"] is True
    assert APPLIED_RETRACTIONS_TABLE not in crep["untouched"]
    assert APPLIED_RETRACTIONS_TABLE in read_manifest(root, "curated")


def test_rewrite_docs_folded_marker_replay_noop(spark, tmp_path):
    """rewrite_docs consults the folded marker table too: a late replay
    of a folded rewrite id changes nothing."""
    from novi_pdq_etl_project_prod_spark.operators.dedup import (
        minhash_signatures_md5,
    )
    from novi_pdq_etl_project_prod_spark.plans.retract import (
        fold_retraction_markers,
        rewrite_docs,
    )
    from novi_pdq_etl_project_prod_spark.sources.layers import (
        commit_tables,
        manifest_history,
    )

    docs = _docs(spark)
    root = str(tmp_path / "wh")
    hashes = (
        docs.selectExpr("md5(text) AS h", "doc_id")
        .groupBy("h").agg(F.min("doc_id").alias("canonical_id"))
    )
    commit_tables(
        {
            "corpus": docs,
            "content_hashes": hashes,
            "minhash_signatures": minhash_signatures_md5(
                docs, "doc_id", "text", 3, 64
            ),
        },
        root,
        "curated",
    )
    rewrites = spark.createDataFrame(
        [(3, DOCS[2][1], 103, "completely fresh replacement text here")],
        "old_id long, old_text string, new_id long, new_text string",
    )
    rules = {"nonempty": "length(trim(text)) > 0"}
    rep = rewrite_docs(rewrites, root, "curated", "rw-1", rules=rules)
    assert rep["applied"] is True
    fold_retraction_markers(spark, root, "curated")
    n = len(manifest_history(root, "curated"))
    rep2 = rewrite_docs(rewrites, root, "curated", "rw-1", rules=rules)
    assert rep2["applied"] is False
    assert len(manifest_history(root, "curated")) == n


def test_ivf_index_topk_honors_tombstones(spark, tmp_path):
    """The persisted ANN index joins the retraction contract: a
    retracted doc's vector is anti-joined out of the stored lists
    BEFORE the top-k window — dropped ids never returned, results still
    carry k live neighbors, and every surviving candidate's score is
    bit-identical to the unfiltered search (re-ranked)."""
    from novi_pdq_etl_project_prod_spark.operators.similarity import (
        build_ivf_index,
        ivf_index_topk,
    )
    from novi_pdq_etl_project_prod_spark.session import read_table

    emb = read_table(spark, SF, "embeddings")
    root = str(tmp_path / "wh")
    build_ivf_index(emb, root, table="t", n_lists=8)
    probes = emb.where(F.col("vec_id") < 2)
    k = 5
    base = ivf_index_topk(
        spark, root, probes, table="t", k=k + 3, nprobe=3
    ).collect()
    # tombstone ids that actually appear in the unfiltered top-k so the
    # filter provably bites
    drop_ids = sorted({r.neighbor_id for r in base if r.rank <= 2})
    tomb = spark.createDataFrame([(i,) for i in drop_ids], "doc_id long")
    got = ivf_index_topk(
        spark, root, probes, table="t", k=k, nprobe=3, tombstones=tomb
    ).collect()
    assert all(r.neighbor_id not in drop_ids for r in got)
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append((r.rank, r.neighbor_id, r.score))
    # expected: unfiltered candidates minus the drops, re-ranked, top k
    want_q = {}
    for r in base:
        if r.neighbor_id not in drop_ids:
            want_q.setdefault(r.query_id, []).append((r.score, r.neighbor_id))
    for q, rows in by_q.items():
        rows.sort()
        assert [rk for rk, _, _ in rows] == list(range(1, len(rows) + 1))
        assert len(rows) == k  # k LIVE neighbors, not k minus drops
        want = sorted(want_q[q], key=lambda s: (-s[0], s[1]))[:k]
        assert [(n, s) for _, n, s in rows] == [(n, s) for s, n in want]


def test_maintenance_tick_rebuilds_stale_ivf_index(spark, tmp_path):
    """The ANN refresh lane: no index -> the tick builds one; below the
    staleness threshold -> recorded no-op; appends past the threshold
    -> rebuild whose persisted search equals the in-query IVF route
    over the live corpus (two paths, one answer); a retraction drives
    staleness and the next rebuild physically drops the vector."""
    from novi_pdq_etl_project_prod_spark.operators.similarity import (
        ivf_index_topk,
        ivf_topk,
    )
    from novi_pdq_etl_project_prod_spark.plans.maintenance import (
        run_maintenance_tick,
    )
    from novi_pdq_etl_project_prod_spark.plans.retract import retract_docs
    from novi_pdq_etl_project_prod_spark.session import read_table
    from novi_pdq_etl_project_prod_spark.sources.layers import commit_tables

    emb = read_table(spark, SF, "embeddings")
    root = str(tmp_path / "wh")
    first = emb.where(F.col("vec_id") < 400)
    commit_tables(
        {"embeddings": first}, root, "curated",
        append_tables=("embeddings",),
    )
    cfg = {"source_table": "embeddings", "index_table": "ann",
           "n_lists": 8, "staleness_threshold": 0.1}
    t1 = run_maintenance_tick(spark, root, "curated", ivf_rebuild=cfg)
    assert t1["ann_rebuild"]["fired"] is True  # never built -> builds
    t2 = run_maintenance_tick(spark, root, "curated", ivf_rebuild=cfg)
    assert t2["ann_rebuild"]["fired"] is False
    assert t2["ann_rebuild"]["staleness"] == 0.0

    # append 25% more vectors: past threshold -> rebuild
    commit_tables(
        {"embeddings": emb.where(
            (F.col("vec_id") >= 400) & (F.col("vec_id") < 500))},
        root, "curated", append_tables=("embeddings",),
    )
    t3 = run_maintenance_tick(spark, root, "curated", ivf_rebuild=cfg)
    assert t3["ann_rebuild"]["fired"] is True
    assert t3["ann_rebuild"]["n_live"] == 500

    # two paths, one answer on the refreshed index
    probes = emb.where(F.col("vec_id") < 2)
    live = emb.where(F.col("vec_id") < 500)
    got = sorted(map(tuple, ivf_index_topk(
        spark, root, probes, table="ann", k=5, nprobe=3).collect()))
    want = sorted(map(tuple, ivf_topk(
        live, probes, k=5, n_lists=8, nprobe=3).collect()))
    assert got == want and len(got) > 0

    # retraction counts as staleness; the rebuild drops the vectors
    drop_rows = [(int(i), "x") for i in range(60)]
    retract_docs(
        spark.createDataFrame(drop_rows, "vec_id long, text string"),
        root, "curated", "ann-drop", id_col="vec_id",
    )
    t4 = run_maintenance_tick(spark, root, "curated", ivf_rebuild=cfg)
    assert t4["ann_rebuild"]["fired"] is True
    assert t4["ann_rebuild"]["n_live"] == 440
    refreshed = ivf_index_topk(
        spark, root, probes.unionByName(emb.where(F.col("vec_id") == 70)),
        table="ann", k=5, nprobe=3,
    ).collect()
    assert len(refreshed) > 0
    assert all(r.neighbor_id >= 60 for r in refreshed)

    # COMPACTION COUPLING (second round-13 review): a BELOW-threshold
    # retraction whose tombstones get physically cleared on this tick
    # must force the rebuild — otherwise the reader guard loses its
    # tombstone source while the index still holds the dropped vectors
    retract_docs(
        spark.createDataFrame(
            [(int(i), "x") for i in range(60, 80)],
            "vec_id long, text string",
        ),
        root, "curated", "ann-drop-2", id_col="vec_id",
    )
    t5 = run_maintenance_tick(
        spark, root, "curated",
        retraction_id_cols={"embeddings": "vec_id"},
        ivf_rebuild=cfg,
    )
    assert t5["retractions"]["applied"] is True
    # churn 20/440 = 0.045 < 0.1: only the coupling fires the rebuild
    assert t5["ann_rebuild"]["fired"] is True
    assert t5["ann_rebuild"]["forced"] is True
    assert t5["ann_rebuild"]["n_live"] == 420
    after = ivf_index_topk(
        spark, root, emb.where(F.col("vec_id") == 100),
        table="ann", k=5, nprobe=3,
    ).collect()
    assert len(after) > 0
    assert all(r.neighbor_id >= 80 for r in after)

    # config-key guard: the tick owns force
    with pytest.raises(ValueError, match="force"):
        run_maintenance_tick(
            spark, root, "curated",
            ivf_rebuild={**cfg, "force": True},
        )


def test_maintenance_tick_folds_markers_on_cadence(spark, tmp_path):
    """The tick's marker-fold lane: below fold_markers_min the audit is
    a recorded no-op (one meta read); at the threshold the markers move
    to the table and exactly-once survives, composed with the
    retraction rewrite on the same tick."""
    from novi_pdq_etl_project_prod_spark.plans.maintenance import (
        run_maintenance_tick,
    )
    from novi_pdq_etl_project_prod_spark.plans.retract import (
        APPLIED_RETRACTIONS_TABLE,
        read_live_table,
        retract_docs,
    )
    from novi_pdq_etl_project_prod_spark.sources.layers import (
        commit_tables,
        read_manifest_meta,
    )

    root = str(tmp_path / "wh")
    docs = _docs(spark)
    commit_tables({"corpus": docs}, root, "curated")
    retract_docs(_docs(spark, DOCS[1:2]), root, "curated", "ra")
    tick = run_maintenance_tick(
        spark, root, "curated", retraction_id_cols=True,
        fold_markers_min=2,
    )
    assert tick["marker_fold"] == {
        "applied": False, "markers": 1, "threshold": 2,
    }
    retract_docs(_docs(spark, DOCS[3:4]), root, "curated", "rb")
    tick2 = run_maintenance_tick(
        spark, root, "curated", retraction_id_cols=True,
        fold_markers_min=2,
    )
    assert tick2["marker_fold"]["applied"] is True
    assert tick2["marker_fold"]["n_folded"] == 2
    meta = read_manifest_meta(root, "curated")
    assert not any(k.startswith("retraction:") for k in meta)
    applied = read_live_table(
        spark, root, "curated", APPLIED_RETRACTIONS_TABLE
    )
    assert sorted(r.retraction_id for r in applied.collect()) == ["ra", "rb"]
    # exactly-once across tick-driven fold: replay still a no-op
    assert retract_docs(
        _docs(spark, DOCS[1:2]), root, "curated", "ra"
    )["applied"] is False


# ---------------------------------------------------------------------------
# quarantined rewrites keep the old version (ADVICE r12 #3)
# ---------------------------------------------------------------------------


def test_rewrite_quarantined_keeps_old_version(spark, tmp_path):
    """A rewrite whose new text fails the expectation rules must NOT
    delete the doc: the old version survives (its id is not
    tombstoned, its DSIR mass is not subtracted), the quarantine row is
    the audit trail, and live state equals a from-scratch build over
    {old version of the failed rewrite} ∪ {accepted rewrites}."""
    from novi_pdq_etl_project_prod_spark.operators.dedup import (
        minhash_signatures_md5,
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
    from novi_pdq_etl_project_prod_spark.sources.layers import commit_tables

    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "one two three four five six seven eight nine ten eleven"),
        (3, "wholly unrelated standing document with its own words"),
    ]
    docs = _docs(spark, rows)
    b = 64
    root = str(tmp_path / "wh")
    idx = build_bm25_index(docs)
    hashes = (
        docs.selectExpr("md5(text) AS h", "doc_id")
        .groupBy("h").agg(F.min("doc_id").alias("canonical_id"))
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
        append_tables=("bm25_postings", "bm25_doclens", "dsir_raw_buckets"),
    )
    rewrites = spark.createDataFrame(
        [
            # doc 1's rewrite shrinks below the length rule: QUARANTINED
            (1, rows[0][1], 101, "too short"),
            # doc 2's rewrite is valid: applied
            (2, rows[1][1], 102, "a perfectly valid replacement text body"),
        ],
        "old_id long, old_text string, new_id long, new_text string",
    )
    rep = rewrite_docs(
        rewrites, root, "curated", "rw-q",
        rules={"min_len": "length(trim(text)) >= 20"},
        bm25_tables={"postings": "bm25_postings", "doclens": "bm25_doclens"},
        dsir_counts={"dsir_raw_buckets": b},
    )
    assert rep["applied"] is True
    assert rep["n_rewrites"] == 1 and rep["n_quarantined"] == 1

    final_rows = [
        (1, rows[0][1]),  # old version SURVIVES the failed rewrite
        (3, rows[2][1]),
        (102, "a perfectly valid replacement text body"),
    ]
    live_corpus = read_live_table(spark, root, "curated", "corpus", "doc_id")
    assert {r.doc_id for r in live_corpus.collect()} == {1, 3, 102}
    quar = read_live_table(spark, root, "curated", "ingest_quarantine")
    assert [r.doc_id for r in quar.collect()] == [101]

    got = sorted(
        map(
            tuple,
            bm25_scores_from_index(
                read_live_table(
                    spark, root, "curated", "bm25_postings", "id"
                ),
                read_live_table(
                    spark, root, "curated", "bm25_doclens", "id"
                ),
                ("alpha", "valid", "three"),
            ).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            bm25_scores(
                _docs(spark, final_rows), ("alpha", "valid", "three")
            ).collect(),
        )
    )
    assert got == want and len(got) > 0
    live_counts = sorted(
        map(
            tuple,
            read_live_table(spark, root, "curated", "dsir_raw_buckets")
            .groupBy("b").agg(F.sum("n").alias("n"))
            .where(F.col("n") != 0).collect(),
        )
    )
    want_counts = sorted(
        map(
            tuple,
            dsir_bucket_counts(
                _docs(spark, final_rows), n_buckets=b
            ).collect(),
        )
    )
    assert live_counts == want_counts


# ---------------------------------------------------------------------------
# gram-shape flag validation (ADVICE r12 #1/#2)
# ---------------------------------------------------------------------------


def _feed(spark, tmp_path, dirname, rows):
    d = str(tmp_path / dirname)
    _docs(spark, rows).coalesce(1).write.mode("append").parquet(d)
    return spark.readStream.schema("doc_id long, text string").parquet(d)


_RULES = {"min_len": "length(trim(text)) >= 10"}
_ROWS_A = [(1, "one two three four five six seven eight nine ten")]
_ROWS_B = [(2, "eleven twelve thirteen fourteen fifteen sixteen seventeen")]


def test_ingest_retractable_flag_mismatch_raises(spark, tmp_path):
    """Restarting the composed funnel with the retractable_grams flag
    flipped against an existing standing_grams table fails LOUDLY
    before committing mixed-schema segments — both directions."""
    from novi_pdq_etl_project_prod_spark.plans.ingest import (
        run_incremental_ingest,
    )

    # attributed table, then a False restart
    root = str(tmp_path / "wh1")
    run_incremental_ingest(
        _feed(spark, tmp_path, "d1", _ROWS_A), root, "curated",
        str(tmp_path / "c1"), _RULES, span_k=4, retractable_grams=True,
    )
    with pytest.raises(Exception) as excinfo:
        run_incremental_ingest(
            _feed(spark, tmp_path, "d2", _ROWS_B), root, "curated",
            str(tmp_path / "c2"), _RULES, span_k=4, retractable_grams=False,
        )
    assert "retractable_grams" in str(excinfo.value)

    # flag OMITTED on restart: the standing shape is inferred — the
    # attributed table keeps growing attributed, no NULL contributors
    from novi_pdq_etl_project_prod_spark.sources.layers import (
        read_manifest_table,
    )

    run_incremental_ingest(
        _feed(spark, tmp_path, "d2b", _ROWS_B), root, "curated",
        str(tmp_path / "c2b"), _RULES, span_k=4,
    )
    grams = read_manifest_table(spark, root, "curated", "standing_grams")
    assert set(grams.columns) == {"doc_id", "gh"}
    assert grams.where(F.col("doc_id").isNull()).count() == 0

    # set-shaped table, then a True restart
    root2 = str(tmp_path / "wh2")
    run_incremental_ingest(
        _feed(spark, tmp_path, "d3", _ROWS_A), root2, "curated",
        str(tmp_path / "c3"), _RULES, span_k=4, retractable_grams=False,
    )
    with pytest.raises(Exception) as excinfo:
        run_incremental_ingest(
            _feed(spark, tmp_path, "d4", _ROWS_B), root2, "curated",
            str(tmp_path / "c4"), _RULES, span_k=4, retractable_grams=True,
        )
    assert "retractable_grams" in str(excinfo.value)


def test_stream_spans_bootstrap_retractable(spark, tmp_path):
    """The standalone span sink can BOOTSTRAP a retractable gram table
    (ADVICE r12 #2): retractable_grams=True on an empty layer commits
    doc-attributed rows from the first trigger; existing tables keep
    schema inference, and an explicit contradictory flag raises."""
    from novi_pdq_etl_project_prod_spark.sources.layers import (
        read_manifest_table,
    )
    from novi_pdq_etl_project_prod_spark.streaming.events import (
        stream_incremental_repeated_spans,
    )

    root = str(tmp_path / "wh")
    stream_incremental_repeated_spans(
        _feed(spark, tmp_path, "d1", _ROWS_A), root, "curated",
        str(tmp_path / "c1"), k=4, retractable_grams=True,
    )
    grams = read_manifest_table(spark, root, "curated", "standing_grams")
    assert set(grams.columns) == {"doc_id", "gh"}

    # schema inference continues the attributed shape without the flag
    stream_incremental_repeated_spans(
        _feed(spark, tmp_path, "d2", _ROWS_B), root, "curated",
        str(tmp_path / "c2"), k=4,
    )
    grams2 = read_manifest_table(spark, root, "curated", "standing_grams")
    assert set(grams2.columns) == {"doc_id", "gh"}
    assert grams2.where(F.col("doc_id").isNull()).count() == 0

    # an explicit flag contradicting the standing shape fails loudly
    with pytest.raises(Exception) as excinfo:
        stream_incremental_repeated_spans(
            _feed(spark, tmp_path, "d3", [(9, "x y z w v u t s r q")]),
            root, "curated", str(tmp_path / "c3"), k=4,
            retractable_grams=False,
        )
    assert "retractable_grams" in str(excinfo.value)


# ---------------------------------------------------------------------------
# DSIR net-negative reader guard (ADVICE r12 #4)
# ---------------------------------------------------------------------------


def test_dsir_reader_rejects_net_negative_counts(spark):
    """Retracting a doc that was never counted drives bucket sums
    net-negative; the incremental reader fails loudly instead of
    silently skewing every weight through log(<=0) NaNs."""
    from novi_pdq_etl_project_prod_spark.operators.text import (
        dsir_bucket_counts,
        incremental_dsir_logweights,
    )
    from novi_pdq_etl_project_prod_spark.plans.retract import (
        dsir_negative_deltas,
    )

    b = 64
    target = dsir_bucket_counts(_docs(spark, DOCS[:3]), n_buckets=b)
    standing = dsir_bucket_counts(_docs(spark, DOCS[3:4]), n_buckets=b)
    # a never-counted doc retracted: its negative delta has no positive
    # mass to cancel
    poisoned = standing.unionByName(
        dsir_negative_deltas(_docs(spark, DOCS[4:6]), n_buckets=b)
    )
    with pytest.raises(ValueError, match="negative"):
        incremental_dsir_logweights(
            _docs(spark, [(9, "nine ten eleven")]), target, poisoned,
            n_buckets=b,
        )["weights"].collect()
