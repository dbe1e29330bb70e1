"""Composed incremental-ingest pipeline (plans/ingest.py, VERDICT r10
#2): stream==batch metamorphic certification over 3 increments with
every funnel disposition exercised, one-manifest-per-trigger atomicity,
checkpoint-loss replay, and the schema gate."""

from __future__ import annotations

import shutil
import time

import pytest
from pyspark.sql import functions as F

BASE = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
SECOND = "other corpus entirely second text body lorem ipsum dolor sit"
RULES = {"min_len": "length(trim(text)) >= 20"}

# three increments planting every disposition:
#   batch 1: 1 accepted, 2 accepted, 3 quarantined (short),
#            4 exact_new (copy of 1)
#   batch 2: 5 exact_old (copy of standing 1), 6 near_dup vs standing 1,
#            7 accepted, 8 quarantined
#   batch 3: 9 exact_old vs 6's hash (near-dropped content is still
#            SEEN content), 10 accepted, 11 near_dup of 10 (new_new,
#            larger id drops), 12 accepted
BATCHES = [
    [(1, BASE), (2, SECOND), (3, "too short"), (4, BASE)],
    [(5, BASE), (6, BASE + " lam"), (7, "seventh document carries its own wholly distinct vocabulary and phrasing"), (8, "tiny")],
    [(9, BASE + " lam"), (10, "fresh third corpus wholly new words"), (11, "fresh third corpus wholly new words lam"), (12, "completely distinct final document text")],
]

EXPECTED_DISPOSITION = {
    1: "accepted", 2: "accepted", 3: "quarantined", 4: "exact_dup",
    5: "exact_dup", 6: "near_dup", 7: "accepted", 8: "quarantined",
    9: "exact_dup", 10: "accepted", 11: "near_dup", 12: "accepted",
}


def _batch_twin(spark):
    """Sequentially apply ingest_increment the way the sink does,
    accumulating the standing hash/signature tables; returns the
    accumulated funnel outputs."""
    from novi_pdq_etl_project_prod_spark.plans.ingest import (
        ingest_increment,
    )

    hashes = None
    sigs = None
    acc = {"accepted": [], "quarantine": [], "exact_dups": [], "pairs": [],
           "near_drops": []}
    for rows in BATCHES:
        df = spark.createDataFrame(rows, "doc_id long, text string")
        res = ingest_increment(df, hashes, sigs, RULES)
        acc["accepted"].extend(
            (r.doc_id, r.text) for r in res["accepted"].collect()
        )
        acc["quarantine"].extend(r.doc_id for r in res["quarantine"].collect())
        acc["exact_dups"].extend(
            (r.doc_id, r.dup_of, r.dup_type) for r in res["exact_dups"].collect()
        )
        acc["pairs"].extend(
            (r.id_a, r.id_b, r.pair_type)
            for r in res["near_dup_pairs"].collect()
        )
        acc["near_drops"].extend(
            r.doc_id for r in res["near_drops"].collect()
        )
        nh = res["new_hashes"]
        ns = res["new_sigs"]
        hashes = nh if hashes is None else hashes.unionByName(nh)
        sigs = ns if sigs is None else sigs.unionByName(ns)
        # materialize the accumulated standing state (the sink reads it
        # back from parquet; localCheckpoint is the in-memory analogue)
        hashes = hashes.localCheckpoint()
        sigs = sigs.localCheckpoint()
    return acc


def test_ingest_funnel_dispositions_hand_computed(spark):
    """The batch funnel lands every planted doc in its expected
    disposition — including doc 9: content that was near-DROPPED at
    ingest is still recorded in the hash table, so its re-fetch is
    exact_old (the cheap filter keeps already-rejected content out)."""
    from novi_pdq_etl_project_prod_spark.plans.ingest import (
        ingest_disposition,
        ingest_increment,
    )

    hashes = None
    sigs = None
    got: dict = {}
    for rows in BATCHES:
        df = spark.createDataFrame(rows, "doc_id long, text string")
        res = ingest_increment(df, hashes, sigs, RULES)
        got.update(
            (r.doc_id, r.disposition)
            for r in ingest_disposition(res).collect()
        )
        hashes = (res["new_hashes"] if hashes is None
                  else hashes.unionByName(res["new_hashes"])).localCheckpoint()
        sigs = (res["new_sigs"] if sigs is None
                else sigs.unionByName(res["new_sigs"])).localCheckpoint()
    assert got == EXPECTED_DISPOSITION
    # doc 9's exact_dup points at 6 (the near-dropped doc whose hash was
    # recorded), not at any accepted doc — the SEEN-content contract
    # pinned explicitly


def test_run_incremental_ingest_matches_batch_and_replay(spark, tmp_path):
    """The streaming composition equals the sequential batch funnel
    table-for-table after 3 increments; each trigger commits exactly ONE
    manifest; a checkpoint-loss replay is a no-op."""
    from novi_pdq_etl_project_prod_spark.plans.ingest import (
        run_incremental_ingest,
    )
    from novi_pdq_etl_project_prod_spark.sources.layers import (
        manifest_history,
        read_manifest_tables,
    )

    updates_dir = str(tmp_path / "docs")
    for rows in BATCHES:
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("append").parquet(updates_dir)
        time.sleep(1.1)  # distinct mtimes -> maxFilesPerTrigger ordering

    root = str(tmp_path / "wh")
    chk = str(tmp_path / "chk")

    def _run():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(updates_dir)
        )
        run_incremental_ingest(stream, root, "curated", chk, RULES)

    _run()
    twin = _batch_twin(spark)
    tables = read_manifest_tables(spark, root, "curated")

    got_corpus = sorted(
        (r.doc_id, r.text) for r in tables["corpus"].collect()
    )
    assert got_corpus == sorted(twin["accepted"])
    assert sorted(
        r.doc_id for r in tables["ingest_quarantine"].collect()
    ) == sorted(twin["quarantine"])
    assert sorted(
        (r.doc_id, r.dup_of, r.dup_type)
        for r in tables["exact_dups"].collect()
    ) == sorted(twin["exact_dups"])
    assert sorted(
        (r.id_a, r.id_b, r.pair_type)
        for r in tables["near_dup_pairs"].collect()
    ) == sorted(twin["pairs"])
    # signature table mirrors the ACCEPTED corpus only
    assert sorted(r.id for r in tables["minhash_signatures"].collect()) == [
        d for d, disp in sorted(EXPECTED_DISPOSITION.items())
        if disp == "accepted"
    ]
    # hash table records every hash SEEN once (valid docs' distinct
    # content, including near-dropped docs' hashes): batch1 {BASE,
    # SECOND}, batch2 {6's BASE+lam, 7's}, batch3 {10's, 11's, 12's}
    # — 7 distinct hashes
    assert tables["content_hashes"].count() == 7

    # ONE manifest per trigger: 3 increments -> exactly 3 commits
    assert len(manifest_history(root, "curated")) == 3

    # cumulative funnel accounting rides the commit meta (the
    # expectations-sink convention): totals across all 3 increments
    from novi_pdq_etl_project_prod_spark.sources.layers import (
        read_manifest_meta,
    )

    counts = read_manifest_meta(root, "curated")["ingest_counts:corpus"]
    assert counts == {
        "n_rows": 12,
        "quarantined": 2,
        "exact_dups": 3,
        "near_dups": 2,
        "accepted": 5,
    }

    # checkpoint-loss replay: marker-gated no-op, byte-identical tables
    shutil.rmtree(chk)
    _run()
    after = read_manifest_tables(spark, root, "curated")
    assert len(manifest_history(root, "curated")) == 3
    assert sorted(
        (r.doc_id, r.text) for r in after["corpus"].collect()
    ) == got_corpus


def test_run_incremental_ingest_schema_gate_blocks_drift(spark, tmp_path):
    """A retyped/extra column in a later increment fails the batch
    BEFORE anything commits: the corpus keeps its pre-drift contents and
    the manifest count is unchanged — the append-segment wedge the
    schema gate exists to prevent."""
    from novi_pdq_etl_project_prod_spark.operators.expectations import (
        ExpectationError,
    )
    from novi_pdq_etl_project_prod_spark.plans.ingest import (
        run_incremental_ingest,
    )
    from novi_pdq_etl_project_prod_spark.sources.layers import (
        manifest_history,
        read_manifest_tables,
    )

    updates_dir = str(tmp_path / "docs")
    spark.createDataFrame(
        BATCHES[0], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(updates_dir)

    root = str(tmp_path / "wh")

    def _run(chk):
        stream = (
            spark.readStream.schema("doc_id long, text string, extra int")
            .option("mergeSchema", "true")
            .option("maxFilesPerTrigger", 1)
            .parquet(updates_dir)
        )
        run_incremental_ingest(
            stream, root, "curated", chk, RULES
        )

    # first run with the original schema
    stream0 = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(updates_dir)
    )
    from novi_pdq_etl_project_prod_spark.plans.ingest import (
        run_incremental_ingest as _rii,
    )

    _rii(stream0, root, "curated", str(tmp_path / "chk0"), RULES)
    n_commits = len(manifest_history(root, "curated"))

    # drifted increment: an added column, unreviewed
    spark.createDataFrame(
        [(20, SECOND + " drifted doc", 1)],
        "doc_id long, text string, extra int",
    ).coalesce(1).write.mode("append").parquet(updates_dir)
    with pytest.raises(Exception) as excinfo:
        _run(str(tmp_path / "chk1"))
    assert "schema drift" in str(excinfo.value)
    assert len(manifest_history(root, "curated")) == n_commits
    tables = read_manifest_tables(spark, root, "curated")
    assert 20 not in {r.doc_id for r in tables["corpus"].collect()}


def test_mega_batch_guard_drops_hint_same_results(spark, monkeypatch):
    """VERDICT r10 #6: past BROADCAST_HINT_MAX_ROWS the exact-dedup
    path drops its forced broadcast hints (AQE shuffle join instead of
    an OOM-bound broadcast). Forcing the cap to 0 exercises the
    unhinted path end-to-end: dispositions must be identical."""
    from novi_pdq_etl_project_prod_spark.operators import dedup
    from novi_pdq_etl_project_prod_spark.plans.ingest import (
        ingest_disposition,
        ingest_increment,
    )

    monkeypatch.setattr(dedup, "BROADCAST_HINT_MAX_ROWS", 0)
    hashes = None
    sigs = None
    got: dict = {}
    for rows in BATCHES:
        df = spark.createDataFrame(rows, "doc_id long, text string")
        res = ingest_increment(df, hashes, sigs, RULES)
        got.update(
            (r.doc_id, r.disposition)
            for r in ingest_disposition(res).collect()
        )
        hashes = (res["new_hashes"] if hashes is None
                  else hashes.unionByName(res["new_hashes"])).localCheckpoint()
        sigs = (res["new_sigs"] if sigs is None
                else sigs.unionByName(res["new_sigs"])).localCheckpoint()
    assert got == EXPECTED_DISPOSITION


# ---------------------------------------------------------------------------
# span stage (round-11 continuation): expectations → exact → near-dup →
# long-substring spans, all through the same one-manifest commit
# ---------------------------------------------------------------------------

RUN1 = "one two three four five six"
RUN2 = "red orange yellow green blue indigo"

#: three increments planting the span-stage cases among docs the funnel
#: ACCEPTS (shared runs are 6 tokens of otherwise-disjoint vocabulary,
#: so MinHash jaccard stays well under the 0.5 near-dup threshold):
#:   batch 1: doc 1 carries RUN1 — no spans at ITS arrival (nothing
#:            standing yet: the arrival-time contract);
#:   batch 2: doc 2 re-uses RUN1 (cross-increment span vs standing
#:            grams), doc 3 is clean;
#:   batch 3: docs 4 and 5 share RUN2 (within-increment repeat: BOTH
#:            report spans), doc 6 is a quarantined short row (never
#:            reaches the span stage).
SPAN_BATCHES = [
    [(1, "aaa bbb " + RUN1 + " ccc ddd eee fff ggg")],
    [(2, "xxx yyy " + RUN1 + " zzz qqq rrr sss ttt"),
     (3, "ppp uuu vvv www hhh iii jjj kkk lll mmm")],
    [(4, "nnn ooo " + RUN2 + " pp2 qq2 rr2 ss2 tt2"),
     (5, RUN2 + " different tail entirely here word2 word3 word4 word5"),
     (6, "tiny")],
]

#: hand-derived maximal spans (1-based token positions, k=4): RUN1 sits
#: at tokens 3-8 of doc 2 (4-gram starts 3,4,5 → merged [3,9)); RUN2 at
#: 3-8 of doc 4 and 1-6 of doc 5.
EXPECTED_SPANS = {(2, 3, 9, 6), (4, 3, 9, 6), (5, 1, 7, 6)}
SPAN_K = 4


def test_ingest_span_stage_stream_matches_batch(spark, tmp_path):
    """With span_k set the composed sink adds the long-substring stage:
    span audit rows for accepted docs (judged at arrival — standing
    grams plus within-increment repeats) and the standing gram set,
    committed through the SAME one-manifest-per-trigger transaction;
    the sequential batch twin produces the identical span set, and the
    standing gram table is exactly the accepted corpus' distinct
    k-grams."""
    import hashlib

    from novi_pdq_etl_project_prod_spark.plans.ingest import (
        ingest_increment,
        run_incremental_ingest,
    )
    from novi_pdq_etl_project_prod_spark.sources.layers import (
        manifest_history,
        read_manifest_meta,
        read_manifest_tables,
    )

    updates_dir = str(tmp_path / "docs")
    for rows in SPAN_BATCHES:
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("append").parquet(updates_dir)
        time.sleep(1.1)

    root = str(tmp_path / "wh")
    chk = str(tmp_path / "chk")

    def _run():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(updates_dir)
        )
        run_incremental_ingest(
            stream, root, "curated", chk, RULES, span_k=SPAN_K
        )

    _run()
    tables = read_manifest_tables(spark, root, "curated")

    got_spans = {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in tables["repeated_spans"].collect()
    }
    assert got_spans == EXPECTED_SPANS

    # every doc with planted content was ACCEPTED except the
    # quarantined short row — spans are audit rows, not drops
    accepted = sorted(r.doc_id for r in tables["corpus"].collect())
    assert accepted == [1, 2, 3, 4, 5]

    # standing gram set == the accepted corpus' distinct k-gram md5s
    def grams(text):
        t = text.split()
        return {
            hashlib.md5(
                " ".join(t[i : i + SPAN_K]).encode()
            ).hexdigest()
            for i in range(len(t) - SPAN_K + 1)
        }

    want_grams = set()
    for rows in SPAN_BATCHES:
        for doc_id, text in rows:
            if doc_id != 6:
                want_grams |= grams(text)
    got_grams = {r.gh for r in tables["standing_grams"].collect()}
    assert got_grams == want_grams

    # still ONE manifest per trigger, and the funnel accounting now
    # carries the span_docs counter (docs 2, 4, 5)
    assert len(manifest_history(root, "curated")) == 3
    counts = read_manifest_meta(root, "curated")["ingest_counts:corpus"]
    assert counts["span_docs"] == 3
    assert counts["accepted"] == 5
    assert counts["quarantined"] == 1

    # batch twin: sequential ingest_increment with accumulated gram
    # state produces the identical span set (stream == batch)
    hashes = sigs = standing_grams = None
    twin_spans = set()
    for rows in SPAN_BATCHES:
        df = spark.createDataFrame(rows, "doc_id long, text string")
        res = ingest_increment(
            df, hashes, sigs, RULES,
            standing_grams=standing_grams, span_k=SPAN_K,
        )
        twin_spans |= {
            (r.doc_id, r.span_start, r.span_end, r.span_tokens)
            for r in res["repeated_spans"].collect()
        }
        hashes = (res["new_hashes"] if hashes is None
                  else hashes.unionByName(res["new_hashes"])).localCheckpoint()
        sigs = (res["new_sigs"] if sigs is None
                else sigs.unionByName(res["new_sigs"])).localCheckpoint()
        ng = res["new_grams"]
        standing_grams = (
            ng if standing_grams is None
            else standing_grams.unionByName(ng)
        ).localCheckpoint()
    assert twin_spans == got_spans

    # checkpoint-loss replay: marker-gated no-op (span tables included)
    shutil.rmtree(chk)
    _run()
    after = read_manifest_tables(spark, root, "curated")
    assert len(manifest_history(root, "curated")) == 3
    assert {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in after["repeated_spans"].collect()
    } == EXPECTED_SPANS

    # restart with the span stage DISABLED: the cumulative accounting
    # must carry span_docs forward, not erase it (round-11 review —
    # the counts merge iterates the union of key sets)
    spark.createDataFrame(
        [(7, "a wholly new final document with plenty of length here")],
        "doc_id long, text string",
    ).coalesce(1).write.mode("append").parquet(updates_dir)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(updates_dir)
    )
    run_incremental_ingest(stream, root, "curated", chk, RULES)  # no span_k
    counts2 = read_manifest_meta(root, "curated")["ingest_counts:corpus"]
    assert counts2["span_docs"] == 3          # carried, not erased
    assert counts2["accepted"] == 6           # doc 7 admitted


def test_maintenance_cadence_hook(spark, tmp_path):
    """maintenance_every=N runs the tick inside the sink: with a tight
    segment threshold the standing tables get compacted on cadence
    (segment count bounded, contents identical); with default
    thresholds the tick is pure audit — NO extra commits, no churn
    (VERDICT r11 #7's no-churn-at-cadence claim)."""
    from novi_pdq_etl_project_prod_spark.plans.ingest import (
        run_incremental_ingest,
    )
    from novi_pdq_etl_project_prod_spark.sources.layers import (
        manifest_history,
        read_manifest_tables,
        segment_count,
    )

    def _drive(root, chk, updates_dir, **kw):
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(updates_dir)
        )
        run_incremental_ingest(stream, root, "curated", chk, RULES, **kw)

    updates_dir = str(tmp_path / "docs")
    for rows in BATCHES:
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("append").parquet(updates_dir)
        time.sleep(1.1)

    # no-churn lane: cadence fires every batch, thresholds never trip ->
    # exactly the 3 ingest commits, nothing rewritten
    root_a = str(tmp_path / "wh_a")
    _drive(root_a, str(tmp_path / "chk_a"), updates_dir,
           maintenance_every=1)
    assert len(manifest_history(root_a, "curated")) == 3

    # compaction lane: 1-segment threshold -> every standing table is
    # kept compact by the cadence, contents equal to the no-churn lane
    root_b = str(tmp_path / "wh_b")
    _drive(root_b, str(tmp_path / "chk_b"), updates_dir,
           maintenance_every=1,
           maintenance_kwargs={"max_segments": 1})
    assert segment_count(root_b, "curated", "content_hashes") == 1
    ta = read_manifest_tables(spark, root_a, "curated")
    tb = read_manifest_tables(spark, root_b, "curated")
    assert sorted(map(tuple, ta["corpus"].collect())) == sorted(
        map(tuple, tb["corpus"].collect())
    )
    assert sorted(map(tuple, ta["content_hashes"].collect())) == sorted(
        map(tuple, tb["content_hashes"].collect())
    )
