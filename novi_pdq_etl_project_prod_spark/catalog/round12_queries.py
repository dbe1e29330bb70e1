"""Round-12 catalog additions — retraction certification and batched
retrieval (VERDICT r11 items 1-3).

M80/M81/M82 certify RETRACTION (``plans.retract``): standing state with
curation drops tombstoned/negative-delta'd reads EXACTLY like a
from-scratch build over the surviving corpus — the m79==m74 pattern
applied after a drop, for each state family:

- m80: the BM25 inverted index (postings/doclens anti-joined);
- m81: the DSIR raw distribution (negative bucket deltas summed);
- m82: the ingest funnel's content-hash + signature state (a retracted
  doc no longer exact-drops or near-suppresses arrivals).

M83 is the batch multi-probe BM25 (one join-shaped job for a probe
TABLE, per-query top-k via the o3/w4 window pattern); m84 the exact
multi-probe HYBRID (batch BM25 ⊕ brute dense ⊕ RRF — the oracle twin
m85's recall is pinned against); m85 the ANN-backed hybrid (dense
channel through the IVF route: one corpus assignment amortized over the
probe batch, probed-list joins instead of per-probe corpus scans) —
GT-recall-pinned against m84 (the m10/m17 pattern), no SQL oracle by
nature of the approximate channel.

Reference anchor for the retraction family: the idempotent
delete-month-then-append (``spark_jobs/transform_operator.py:16-31``,
``dags/pdq_etl_dag.py:183-187``) — the reference can retract a slice;
these queries certify the engine can retract through append-shaped
state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from novi_pdq_etl_project_prod_spark.catalog.round11_queries import (
    _M70_RULES,
    _M74_TERMS,
    bm25_ctes,
    dsir_incremental_sql,
    funnel_ctes,
)
from novi_pdq_etl_project_prod_spark.session import read_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


QUERIES = {}
ORACLES = {}


# ---------------------------------------------------------------------------
# M80 — post-retraction BM25 from the persisted index: the index built
# additively over two increments (unioned segment frames), then a drop
# list (doc_id % 7 = 3) tombstone-filtered via plans.retract.retract_ids
# — scores must equal a from-scratch m74 over the surviving corpus.
# ---------------------------------------------------------------------------

_M80_DROP = "doc_id % 7 = 3"


def m80_retracted_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    from novi_pdq_etl_project_prod_spark.operators.text import (
        bm25_scores_from_index,
        build_bm25_index,
    )
    from novi_pdq_etl_project_prod_spark.plans.retract import retract_ids

    docs = _t(spark, sf_dir, "documents")
    # two increments -> two index segments (the additive contract the
    # readers sum over), exactly what stream_bm25_index accumulates
    idx_a = build_bm25_index(docs.where(F.col("doc_id") % 2 == 0))
    idx_b = build_bm25_index(docs.where(F.col("doc_id") % 2 == 1))
    postings = idx_a["postings"].unionByName(idx_b["postings"])
    doclens = idx_a["doclens"].unionByName(idx_b["doclens"])
    tomb = docs.where(F.expr(_M80_DROP)).select("doc_id")
    out = bm25_scores_from_index(
        retract_ids(postings, tomb, "id"),
        retract_ids(doclens, tomb, "id"),
        _M74_TERMS,
    )
    return out.select(
        F.col("id").alias("doc_id"), "n_hit_terms", "score"
    ).orderBy("doc_id")


_M80_SOURCE = (
    f"(SELECT doc_id, text FROM documents WHERE NOT ({_M80_DROP}))"
)

M80_SQL = f"""
WITH {bm25_ctes(_M80_SOURCE)}
SELECT doc_id, n_hit_terms, score FROM bm
ORDER BY doc_id
"""

QUERIES["m80_retracted_bm25"] = m80_retracted_bm25
ORACLES["m80_retracted_bm25"] = M80_SQL


# ---------------------------------------------------------------------------
# M81 — post-retraction incremental DSIR: standing raw counts carry a
# NEGATIVE delta segment for the dropped docs (doc_id % 6 = 0 among the
# standing evens); the increment's weights must equal scoring against a
# from-scratch distribution over the surviving standing corpus.
# ---------------------------------------------------------------------------

_M81_B = 256


def m81_retracted_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    from novi_pdq_etl_project_prod_spark.operators.text import (
        dsir_bucket_counts,
        incremental_dsir_logweights,
    )
    from novi_pdq_etl_project_prod_spark.plans.retract import (
        dsir_negative_deltas,
    )

    docs = _t(spark, sf_dir, "documents")
    target = docs.where(F.col("lang") == "en")
    raw = docs.where(F.col("lang") != "en")
    standing = raw.where(F.col("doc_id") % 2 == 0)
    dropped = standing.where(F.col("doc_id") % 6 == 0)
    inc = raw.where(F.col("doc_id") % 2 == 1)
    live_counts = dsir_bucket_counts(standing, n_buckets=_M81_B).unionByName(
        dsir_negative_deltas(dropped, n_buckets=_M81_B)
    )
    res = incremental_dsir_logweights(
        inc,
        dsir_bucket_counts(target, n_buckets=_M81_B),
        live_counts,
        n_buckets=_M81_B,
    )
    return res["weights"].select(
        F.col("id").alias("doc_id"), "n_feats", "logweight"
    ).orderBy("doc_id")


M81_SQL = dsir_incremental_sql("doc_id % 2 = 0 AND doc_id % 6 <> 0")

QUERIES["m81_retracted_dsir"] = m81_retracted_dsir
ORACLES["m81_retracted_dsir"] = M81_SQL


# ---------------------------------------------------------------------------
# M82 — post-retraction ingest funnel: the accumulated content-hash and
# signature state, tombstone-filtered, must route an increment exactly
# like a funnel whose standing corpus never contained the dropped docs.
# Standing = even-id non-null-text docs that are the min-id
# representative of their content hash (per-hash-unique, the shape a
# prior exact-dedup ingest leaves behind — which is what makes
# "filter accumulated state" == "rebuild from survivors" exact);
# drop list = standing ids divisible by 10; increment = odd ids.
# ---------------------------------------------------------------------------


def m82_retracted_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from novi_pdq_etl_project_prod_spark.operators.dedup import (
        minhash_signatures_md5,
    )
    from novi_pdq_etl_project_prod_spark.plans.ingest import (
        ingest_disposition,
        ingest_increment,
    )
    from novi_pdq_etl_project_prod_spark.plans.retract import retract_ids

    from novi_pdq_etl_project_prod_spark import cache

    docs = _t(spark, sf_dir, "documents")
    evens = docs.where(
        (F.col("doc_id") % 2 == 0) & F.col("text").isNotNull()
    ).select("doc_id", "text")
    reps = (
        evens.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    # persisted (lazily) — optimization r14: the derived standing corpus
    # feeds the hash table, the signature build AND the tombstone list;
    # without the persist each consumer re-runs the dedup join
    standing = cache.track(evens.join(reps, "doc_id"))
    # the ACCUMULATED state a prior ingest left behind...
    hashes = (
        standing.select(F.md5("text").alias("h"), "doc_id")
        .groupBy("h")
        .agg(F.min("doc_id").alias("canonical_id"))
    )
    sigs = minhash_signatures_md5(standing, "doc_id", "text", 3, 64)
    # ...then the curation drop, applied as the tombstone filter
    tomb = standing.where(F.col("doc_id") % 10 == 0).select("doc_id")
    # the retracted signature relation is referenced three times by the
    # band join; persist it (lazily — the funnel's fused count job
    # fills it) so the minhash doesn't run per reference
    res = ingest_increment(
        docs.where(F.col("doc_id") % 2 == 1).select("doc_id", "text"),
        retract_ids(hashes, tomb, "canonical_id"),
        cache.track(retract_ids(sigs, tomb, "id")),
        _M70_RULES,
        truncate_lineage=True,
    )
    return ingest_disposition(res).orderBy("doc_id")


_M82_STANDING = (
    "SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0 "
    "AND text IS NOT NULL AND doc_id % 10 <> 0 "
    "AND doc_id IN (SELECT MIN(doc_id) FROM documents "
    "WHERE doc_id % 2 = 0 AND text IS NOT NULL GROUP BY md5(text))"
)

M82_SQL = f"""
WITH {funnel_ctes(
    "SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1",
    _M82_STANDING,
)}
SELECT doc_id, disposition FROM (
  SELECT doc_id, 'quarantined' AS disposition FROM quar
  UNION ALL
  SELECT doc_id, 'exact_dup' FROM exact_dup
  UNION ALL
  SELECT doc_id, 'near_dup' FROM near_drop
  UNION ALL
  SELECT doc_id, 'accepted' FROM surv
  WHERE doc_id NOT IN (SELECT doc_id FROM near_drop)
)
ORDER BY doc_id
"""

QUERIES["m82_retracted_funnel"] = m82_retracted_funnel
ORACLES["m82_retracted_funnel"] = M82_SQL


# ---------------------------------------------------------------------------
# M83 — batch multi-probe BM25 over the persisted index (VERDICT r11
# #3): a (query_id, term) probe TABLE scored in ONE join-shaped job —
# per-term posting sums computed once across probes, per-query top-5 via
# the o3/w4 window pattern. Scores are per-query identical to
# m74/m79 (shared _bm25_score_terms tree; df/dl/stats are
# query-independent).
# ---------------------------------------------------------------------------

#: Shared probe set for m83/m84/m85: query_id doubles as the probe's
#: embedding vec_id in the hybrid queries (documents.doc_id ≡
#: embeddings.vec_id in the fixture).
_PROBES: list[tuple[int, tuple[str, ...]]] = [
    (0, ("join", "vector", "stream", "window", "quality")),
    (1, ("hash", "merge", "sort")),
    (2, ("customer", "order", "line", "table")),
    (3, ("filter", "scan", "batch", "column", "group", "key")),
]
_M83_K = 5


def _probe_frame(spark: SparkSession) -> DataFrame:
    rows = [(q, t) for q, ts in _PROBES for t in ts]
    return spark.createDataFrame(rows, "query_id long, term string")


def m83_bm25_probe_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from novi_pdq_etl_project_prod_spark.operators.text import (
        bm25_scores_batch,
        build_bm25_index,
    )

    docs = _t(spark, sf_dir, "documents")
    idx = build_bm25_index(docs)
    out = bm25_scores_batch(
        idx["postings"], idx["doclens"], _probe_frame(spark), topk=_M83_K
    )
    return out.select(
        "query_id",
        F.col("id").alias("doc_id"),
        "n_hit_terms",
        "score",
        "rank",
    ).orderBy("query_id", "rank")


_PROBE_VALUES = ", ".join(
    f"({q}, '{t}')" for q, ts in _PROBES for t in ts
)

# The batched generalization of the m74 chain: probes fan out AFTER the
# per-(doc, term) tf sums; same double-product scoring tree, grouped by
# (query_id, doc_id). Shared by M83 (scores+rank) and M84 (the hybrid's
# lexical channel) so the two can't drift.
_M83_CTES = f"""probes AS (
  SELECT CAST(query_id AS BIGINT) AS query_id, term
  FROM (VALUES {_PROBE_VALUES}) v(query_id, term)
),
toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS t
  FROM documents
),
dl AS (SELECT doc_id, len(t) AS dl FROM toks),
stats AS (SELECT count(*) AS n_docs, sum(dl) AS dl_sum FROM dl),
tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(t) AS term FROM toks)
  WHERE term IN (SELECT DISTINCT term FROM probes)
  GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
qterms AS (
  SELECT p.query_id, tf.doc_id,
         CAST(floor(
           ((ln(2*n_docs + 2) - ln(2*df + 1))
            * ((44e0 * CAST(tf AS DOUBLE) * CAST(dl_sum AS DOUBLE))
               / (20e0 * CAST(tf AS DOUBLE) * CAST(dl_sum AS DOUBLE)
                  + 6e0 * CAST(dl_sum AS DOUBLE)
                  + 18e0 * CAST(dl.dl AS DOUBLE) * CAST(n_docs AS DOUBLE))))
           * 1e6) AS BIGINT) AS tq
  FROM probes p
  JOIN tf USING (term)
  JOIN dfreq USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
),
qbm AS (
  SELECT query_id, doc_id,
         CAST(count(*) AS BIGINT) AS n_hit_terms,
         CAST(sum(tq) AS DOUBLE) / 1e6 AS score
  FROM qterms GROUP BY 1, 2
)"""

M83_SQL = f"""
WITH {_M83_CTES}
SELECT query_id, doc_id, n_hit_terms, score,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY score DESC, doc_id ASC)
            AS INT) AS rank
FROM qbm
QUALIFY rank <= {_M83_K}
ORDER BY query_id, rank
"""

QUERIES["m83_bm25_probe_batch"] = m83_bm25_probe_batch
ORACLES["m83_bm25_probe_batch"] = M83_SQL


# ---------------------------------------------------------------------------
# M84 — exact multi-probe HYBRID retrieval: the m83 lexical channel and
# a brute-force dense channel (per-probe exact cosine) fused with RRF —
# the batched generalization of m78, and the GROUND TRUTH m85's
# ANN-backed ranking is recall-pinned against.
# ---------------------------------------------------------------------------

_M84_KIN, _M84_KOUT, _M84_C = 20, 10, 60
_PROBE_IDS = [q for q, _ in _PROBES]


def _lex_channel(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """(query_id, neighbor_id, rank) — batch-BM25 top-KIN per probe,
    probe's own doc excluded (the m78 self-exclusion convention)."""
    from novi_pdq_etl_project_prod_spark.operators.text import (
        bm25_scores_batch,
        build_bm25_index,
    )

    idx = build_bm25_index(docs)
    scores = bm25_scores_batch(
        idx["postings"], idx["doclens"], _probe_frame(spark)
    ).where(F.col("id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("id").asc()
    )
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= _M84_KIN)
        .select("query_id", F.col("id").alias("neighbor_id"), "rank")
    )


def m84_hybrid_batch_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from novi_pdq_etl_project_prod_spark.operators.similarity import (
        brute_force_topk,
        rrf_fuse,
    )

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    lex = _lex_channel(spark, docs)
    dense = brute_force_topk(
        emb, emb.where(F.col("vec_id").isin(_PROBE_IDS)), k=_M84_KIN
    )
    return rrf_fuse([lex, dense], k=_M84_KOUT, c=_M84_C).orderBy(
        "query_id", "rank"
    )


_PROBE_IDS_IN = ", ".join(str(q) for q in _PROBE_IDS)

M84_SQL = f"""
WITH {_M83_CTES},
lex AS (
  SELECT query_id, doc_id AS neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS r
  FROM qbm WHERE doc_id <> query_id
  QUALIFY r <= {_M84_KIN}
),
q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id IN ({_PROBE_IDS_IN})
),
den AS (
  SELECT query_id, vec_id AS neighbor_id,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY list_dot_product(qv, embedding::DOUBLE[])
             / (sqrt(list_dot_product(qv, qv))
                * sqrt(list_dot_product(embedding::DOUBLE[],
                                        embedding::DOUBLE[]))) DESC,
             vec_id ASC
         ) AS r
  FROM embeddings, q WHERE vec_id <> query_id
  QUALIFY r <= {_M84_KIN}
),
fused AS (
  SELECT coalesce(lex.query_id, den.query_id) AS query_id,
         coalesce(lex.neighbor_id, den.neighbor_id) AS neighbor_id,
         coalesce(1.0 / ({_M84_C} + CAST(lex.r AS DOUBLE)), 0.0)
         + coalesce(1.0 / ({_M84_C} + CAST(den.r AS DOUBLE)), 0.0)
           AS rrf_score
  FROM lex FULL JOIN den USING (query_id, neighbor_id)
)
SELECT query_id, neighbor_id, rrf_score,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY rrf_score DESC, neighbor_id ASC)
            AS INT) AS rank
FROM fused
QUALIFY rank <= {_M84_KOUT}
ORDER BY query_id, rank
"""

QUERIES["m84_hybrid_batch_exact"] = m84_hybrid_batch_exact
ORACLES["m84_hybrid_batch_exact"] = M84_SQL


# ---------------------------------------------------------------------------
# M85 — ANN-backed multi-probe hybrid (VERDICT r11 #2): the SAME lexical
# channel and fusion as m84, but the dense channel routes through the
# IVF path — ONE corpus assignment pass amortized over the probe batch,
# then probed-list joins (nprobe/n_lists of the lists per probe) instead
# of a per-probe corpus scan. Approximate by construction, so NO SQL
# oracle (the m10/m17 class): correctness is the GT-recall pin against
# m84 in tests/test_round12_ops.py, and the driver records the weaker
# rows-only check.
# ---------------------------------------------------------------------------

# nprobe=6/16 lists probed: measured mean fused recall@10 vs m84 = 0.80
# at sf0.01 (0.65 at nprobe=4) — the recall/cost dial documented in
# ivf_topk, pinned >= 0.7 by test_round12_ops.
_M85_NLISTS, _M85_NPROBE = 16, 6


def m85_hybrid_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from novi_pdq_etl_project_prod_spark.operators.similarity import (
        ivf_topk,
        rrf_fuse,
    )

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    lex = _lex_channel(spark, docs)
    dense = ivf_topk(
        emb,
        emb.where(F.col("vec_id").isin(_PROBE_IDS)),
        k=_M84_KIN,
        n_lists=_M85_NLISTS,
        nprobe=_M85_NPROBE,
    ).select("query_id", "neighbor_id", "rank")
    return rrf_fuse([lex, dense], k=_M84_KOUT, c=_M84_C).orderBy(
        "query_id", "rank"
    )


QUERIES["m85_hybrid_ann"] = m85_hybrid_ann
# no ORACLES entry: approximate dense channel — GT-recall-pinned vs m84


# ---------------------------------------------------------------------------
# M86 — the REWRITE state algebra (the second shape VERDICT r11 #1
# names: corpora that rewrite docs, not just shrink): span excision
# (m72's chain) changes every doc carrying a repeated span; the old
# identities are tombstoned out of the BM25 index and the cleaned
# versions' postings appended under fresh ids — and the resulting index
# must score EXACTLY like a from-scratch build over the rewritten
# corpus. This is the frame-level algebra of plans.retract.rewrite_docs
# (whose one-manifest atomicity is pytested); the oracle rebuilds
# excision + rewrite + BM25 end to end.
# ---------------------------------------------------------------------------

_M86_K = 10


def m86_rewrite_excised(spark: SparkSession, sf_dir: str) -> DataFrame:
    from novi_pdq_etl_project_prod_spark.operators.dedup import (
        excise_repeated_spans,
    )
    from novi_pdq_etl_project_prod_spark.operators.text import (
        bm25_scores_from_index,
        build_bm25_index,
    )
    from novi_pdq_etl_project_prod_spark.plans.retract import retract_ids

    docs = _t(spark, sf_dir, "documents")
    # fresh-id shift derived from the DATA (max id + 1), not a literal:
    # a fixed shift collides with live ids once the corpus outgrows it
    # (round-12 second review) — the oracle derives the same scalar
    shift = docs.agg(F.max("doc_id")).first()[0] + 1
    from novi_pdq_etl_project_prod_spark import cache

    ex = excise_repeated_spans(docs, k=_M86_K, min_count=2)
    # persisted (optimization r14): `changed` feeds both the tombstone
    # list and the rewritten-index build — since the excision became
    # row-local (no exchange for ReuseExchange to dedupe), an unpersisted
    # frame would run span detection once per consumer
    changed = cache.track(ex.where(F.col("n_removed") > 0))
    tomb = changed.select("doc_id")
    rewritten = changed.select(
        (F.col("doc_id") + F.lit(shift)).alias("doc_id"), "text"
    )
    idx_o = build_bm25_index(docs)
    idx_n = build_bm25_index(rewritten)
    post = retract_ids(idx_o["postings"], tomb, "id").unionByName(
        idx_n["postings"]
    )
    dl = retract_ids(idx_o["doclens"], tomb, "id").unionByName(
        idx_n["doclens"]
    )
    out = bm25_scores_from_index(post, dl, _M74_TERMS)
    return out.select(
        F.col("id").alias("doc_id"), "n_hit_terms", "score"
    ).orderBy("doc_id")


_M86_EXCISE_CTES = f"""etoks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS t
  FROM documents
),
eg AS (
  SELECT doc_id, i AS s,
         md5(array_to_string(list_slice(t, i, i + {_M86_K} - 1), ' ')) AS gh
  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - {_M86_K} + 1)) AS i
        FROM etoks WHERE len(t) >= {_M86_K})
),
erep AS (SELECT gh FROM eg GROUP BY gh HAVING count(*) >= 2),
emarks AS (SELECT doc_id, s, s + {_M86_K} AS e FROM eg JOIN erep USING (gh)),
ecov AS (
  SELECT DISTINCT doc_id, unnest(generate_series(s, e - 1)) AS pos
  FROM emarks
),
etk AS (
  SELECT doc_id, unnest(t) AS tok,
         unnest(generate_series(1, len(t))) AS pos
  FROM etoks
),
ekept AS (
  SELECT k.doc_id,
         string_agg(k.tok, ' ' ORDER BY k.pos) AS cleaned
  FROM etk k
  LEFT JOIN ecov c ON c.doc_id = k.doc_id AND c.pos = k.pos
  WHERE c.pos IS NULL
  GROUP BY k.doc_id
),
changed AS (SELECT DISTINCT doc_id FROM ecov),
shift AS (SELECT MAX(doc_id) + 1 AS s FROM documents),
rewritten AS (
  SELECT doc_id, text FROM documents
  WHERE doc_id NOT IN (SELECT doc_id FROM changed)
  UNION ALL
  SELECT c.doc_id + (SELECT s FROM shift) AS doc_id,
         coalesce(k.cleaned, '') AS text
  FROM changed c LEFT JOIN ekept k ON k.doc_id = c.doc_id
)"""

M86_SQL = f"""
WITH {_M86_EXCISE_CTES},
{bm25_ctes("rewritten")}
SELECT doc_id, n_hit_terms, score FROM bm
ORDER BY doc_id
"""

QUERIES["m86_rewrite_excised"] = m86_rewrite_excised
ORACLES["m86_rewrite_excised"] = M86_SQL
