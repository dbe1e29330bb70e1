"""Round-12 operators: batch multi-probe BM25 (bm25_scores_batch), the
ANN-hybrid recall pin (m85 vs its exact twin m84), and retraction
semantic properties on the catalog fixtures."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"

DOCS = [
    (1, "join the stream of records and join again for vector work"),
    (2, "vector search over a stream needs a fast join plan"),
    (3, "wholly unrelated prose about gardens and weather patterns"),
    (4, "stream stream stream join vector join stream"),
    (5, ""),  # zero-token doc: counts in n_docs, no postings
    (6, "another document that says nothing about retrieval at all"),
]
PROBES = [
    (0, ("join", "vector")),
    (1, ("stream",)),
    (2, ("gardens", "join", "absentterm")),
    (3, ("absentterm",)),  # no hits anywhere -> absent from output
]


def _index(spark):
    from novi_pdq_etl_project_prod_spark.operators.text import (
        build_bm25_index,
    )

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    return build_bm25_index(docs)


def test_bm25_batch_equals_per_query_from_index(spark):
    """The metamorphic core claim: bm25_scores_batch restricted to one
    query_id is ROW-IDENTICAL to bm25_scores_from_index with that
    query's terms — batching cannot shift df/dl/corpus stats."""
    from novi_pdq_etl_project_prod_spark.operators.text import (
        bm25_scores_batch,
        bm25_scores_from_index,
    )

    idx = _index(spark)
    probes = spark.createDataFrame(
        [(q, t) for q, ts in PROBES for t in ts],
        "query_id long, term string",
    )
    batch = bm25_scores_batch(idx["postings"], idx["doclens"], probes)
    got = defaultdict(set)
    for r in batch.collect():
        got[r.query_id].add((r.id, r.n_hit_terms, r.score))
    for q, terms in PROBES:
        single = {
            (r.id, r.n_hit_terms, r.score)
            for r in bm25_scores_from_index(
                idx["postings"], idx["doclens"], terms
            ).collect()
        }
        assert got.get(q, set()) == single, f"query {q} diverges"
    assert 3 not in got  # zero-hit probe absent, like the single path


def test_bm25_batch_topk_window(spark):
    """topk adds a per-query rank window: rank runs 1..k by (score
    desc, id asc), rows beyond k are cut."""
    from novi_pdq_etl_project_prod_spark.operators.text import (
        bm25_scores_batch,
    )

    idx = _index(spark)
    probes = spark.createDataFrame(
        [(0, "join"), (0, "vector"), (1, "stream")],
        "query_id long, term string",
    )
    out = bm25_scores_batch(idx["postings"], idx["doclens"], probes, topk=2)
    rows = sorted(
        (r.query_id, r.rank, r.id, r.score) for r in out.collect()
    )
    by_q = defaultdict(list)
    for q, rank, i, s in rows:
        by_q[q].append((rank, i, s))
    for q, rs in by_q.items():
        assert [r for r, _, _ in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 2
        scores = [s for _, _, s in rs]
        assert scores == sorted(scores, reverse=True)


def test_bm25_batch_duplicate_probe_rows_are_deduped(spark):
    """A probe table with repeated (query_id, term) rows scores each
    term once (the .distinct() contract) — a thousand-probe audit
    joining a dirty probe list can't double-count a term."""
    from novi_pdq_etl_project_prod_spark.operators.text import (
        bm25_scores_batch,
    )

    idx = _index(spark)
    clean = spark.createDataFrame(
        [(0, "join"), (0, "vector")], "query_id long, term string"
    )
    dirty = spark.createDataFrame(
        [(0, "join"), (0, "join"), (0, "vector"), (0, "vector")],
        "query_id long, term string",
    )
    a = sorted(
        map(tuple, bm25_scores_batch(
            idx["postings"], idx["doclens"], clean).collect())
    )
    b = sorted(
        map(tuple, bm25_scores_batch(
            idx["postings"], idx["doclens"], dirty).collect())
    )
    assert a == b


def test_m85_ann_hybrid_recall_pin(spark):
    """The ANN-backed hybrid's fused top-10 recalls >= 0.7 of the exact
    hybrid's per probe (measured 0.80 mean at nprobe=6/16 on this
    fixture) — the m10/m17 GT-recall pattern applied to the fused
    ranking (VERDICT r11 #2)."""
    from novi_pdq_etl_project_prod_spark.catalog import round12_queries as r12

    exact = r12.QUERIES["m84_hybrid_batch_exact"](spark, SF).collect()
    ann = r12.QUERIES["m85_hybrid_ann"](spark, SF).collect()
    e, a = defaultdict(set), defaultdict(set)
    for r in exact:
        e[r.query_id].add(r.neighbor_id)
    for r in ann:
        a[r.query_id].add(r.neighbor_id)
    assert set(e) == set(a) == set(r12._PROBE_IDS)
    recalls = {q: len(e[q] & a[q]) / len(e[q]) for q in e}
    assert sum(recalls.values()) / len(recalls) >= 0.7, recalls
    assert min(recalls.values()) >= 0.5, recalls


def test_m80_retraction_properties(spark):
    """Semantic pins on the catalog fixture: retracted ids never appear
    in the post-retraction BM25 output, and the scores differ from the
    unretracted m79 on at least one surviving doc (the df/idf mass
    actually moved — retraction is not just a row filter on results)."""
    from novi_pdq_etl_project_prod_spark.catalog import (
        round11_queries as r11,
        round12_queries as r12,
    )

    out = {r.doc_id: (r.n_hit_terms, r.score)
           for r in r12.QUERIES["m80_retracted_bm25"](spark, SF).collect()}
    assert out and all(d % 7 != 3 for d in out)
    full = {r.doc_id: (r.n_hit_terms, r.score)
            for r in r11.QUERIES["m79_bm25_from_index"](spark, SF).collect()}
    moved = [d for d in out if d in full and out[d][1] != full[d][1]]
    assert moved, "retraction shifted no surviving score"


def test_m82_funnel_retraction_covers_all_increment_docs(spark):
    """The post-retraction funnel still lands every increment doc in
    exactly one disposition, and at least one doc's disposition differs
    from the unretracted m70 funnel (the retracted state genuinely
    re-routes arrivals)."""
    from novi_pdq_etl_project_prod_spark.catalog import (
        round11_queries as r11,
        round12_queries as r12,
    )
    from novi_pdq_etl_project_prod_spark.session import read_table

    got = {r.doc_id: r.disposition
           for r in r12.QUERIES["m82_retracted_funnel"](spark, SF).collect()}
    docs = read_table(spark, SF, "documents")
    odd_ids = {r.doc_id for r in docs.where(
        F.col("doc_id") % 2 == 1).select("doc_id").collect()}
    assert set(got) == odd_ids
    base = {r.doc_id: r.disposition
            for r in r11.QUERIES["m70_ingest_funnel"](spark, SF).collect()}
    assert any(got[d] != base[d] for d in got), (
        "retraction changed no disposition — drop set too small to bite"
    )
