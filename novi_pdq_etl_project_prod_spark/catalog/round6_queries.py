"""Round-6 catalog additions.

- ``m47`` exact BPE token accounting (VERDICT r05 item 6): greedy
  longest-match-first segmentation against a broadcast merge-rank
  vocabulary, as a pure JVM nested higher-order-function fold
  (``text.bpe_vocab_token_count`` — zero Python, zero shuffle, inside
  whole-stage codegen), certified against a DuckDB recursive-CTE
  segmenter that walks each DISTINCT word one longest-match step per
  recursion level and multiplies by occurrence counts. This is the
  pluggable counter behind every token budget (packing, curation
  funnel, dup-adjusted accounting) — the whitespace proxy remains the
  default; a real deployment swaps in its tokenizer's merge table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from novi_pdq_etl_project_prod_spark.operators.text import (
    BPE_FIXTURE_VOCAB,
    bpe_token_counts,
)
from novi_pdq_etl_project_prod_spark.session import read_table


# ---------------------------------------------------------------------------
# M47 — exact BPE-vocabulary token counts per document.
# Spark: one row-local expression; oracle: recursive CTE over DISTINCT
# words (Zipf compression — segmentation work is per unique word, the
# same trick the Spark path would use for a 30k-piece vocabulary).
# ---------------------------------------------------------------------------

def m47_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return (
        bpe_token_counts(docs)
        .select("doc_id", F.col("n_tokens").alias("n_tokens_bpe"))
        .orderBy("doc_id")
    )


_VOCAB_VALUES = ", ".join(f"('{p}')" for p in BPE_FIXTURE_VOCAB)

M47_SQL = f"""
WITH RECURSIVE vocab(piece) AS (
  VALUES {_VOCAB_VALUES}
),
words AS (
  SELECT doc_id,
         unnest(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\\s]')) AS w
  FROM documents
),
wcount AS (
  SELECT doc_id, w, count(*) AS cnt FROM words GROUP BY doc_id, w
),
dwords AS (SELECT DISTINCT w FROM wcount),
seg(w, rem, ntok) AS (
  SELECT w, w, 0 FROM dwords
  UNION ALL
  SELECT w, substr(rem, 1 + best), ntok + 1 FROM (
    SELECT w, rem, ntok,
      coalesce(
        (SELECT max(length(piece)) FROM vocab WHERE starts_with(rem, piece)),
        1
      ) AS best
    FROM seg WHERE length(rem) > 0
  )
),
wtok AS (SELECT w, ntok FROM seg WHERE length(rem) = 0)
SELECT d.doc_id,
       coalesce(sum(c.cnt * t.ntok), 0)::BIGINT AS n_tokens_bpe
FROM documents d
LEFT JOIN wcount c ON d.doc_id = c.doc_id
LEFT JOIN wtok t ON c.w = t.w
GROUP BY d.doc_id
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# M48 — sequence packing under the BPE budget (the m26 packer driven by
# m47's exact tokenizer-unit counts): token budgets finally measured in
# the unit the training run bills in. Same content-addressed bucket fill
# (engine-portable md5), so the full composition oracles exactly.
# ---------------------------------------------------------------------------

def m48_bpe_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from novi_pdq_etl_project_prod_spark.operators.packing import pack_sequences

    docs = read_table(spark, sf_dir, "documents")
    sized = bpe_token_counts(docs).select(
        "doc_id", F.col("n_tokens").alias("tok")
    )
    return pack_sequences(
        sized, id_col="doc_id", token_count="tok", budget=512,
        bucket_hex_chars=2,
    )


M48_SQL = f"""
WITH RECURSIVE vocab(piece) AS (
  VALUES {_VOCAB_VALUES}
),
words AS (
  SELECT doc_id,
         unnest(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\\s]')) AS w
  FROM documents
),
wcount AS (
  SELECT doc_id, w, count(*) AS cnt FROM words GROUP BY doc_id, w
),
dwords AS (SELECT DISTINCT w FROM wcount),
seg(w, rem, ntok) AS (
  SELECT w, w, 0 FROM dwords
  UNION ALL
  SELECT w, substr(rem, 1 + best), ntok + 1 FROM (
    SELECT w, rem, ntok,
      coalesce(
        (SELECT max(length(piece)) FROM vocab WHERE starts_with(rem, piece)),
        1
      ) AS best
    FROM seg WHERE length(rem) > 0
  )
),
wtok AS (SELECT w, ntok FROM seg WHERE length(rem) = 0),
tok AS (
  SELECT d.doc_id,
         coalesce(sum(c.cnt * t.ntok), 0)::BIGINT AS n_tokens,
         substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 2) AS bucket
  FROM documents d
  LEFT JOIN wcount c ON d.doc_id = c.doc_id
  LEFT JOIN wtok t ON c.w = t.w
  GROUP BY d.doc_id
),
filled AS (
  SELECT doc_id, n_tokens, bucket,
         SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_tokens
  FROM tok
)
SELECT doc_id, n_tokens, bucket,
       bucket || '-' || CAST(((cum_tokens - n_tokens) // 512) AS VARCHAR) AS pack_id,
       n_tokens > 512 AS oversize
FROM filled
"""


# ---------------------------------------------------------------------------
# M49 — mixture planner: per-source sampling rates from dup-adjusted
# token accounting (m41) against a fixed per-source token budget. The
# report a mixture run actually executes from: rate = min(1, budget /
# unique_tokens) — duplication-adjusted so boilerplate-heavy sources
# don't buy extra weight with copies. Pure arithmetic over a
# source-cardinality aggregate; one double division per output row.
# ---------------------------------------------------------------------------

def m49_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from novi_pdq_etl_project_prod_spark.operators.text import (
        dup_adjusted_token_stats,
    )

    budget = 50_000
    docs = read_table(spark, sf_dir, "documents")
    stats = dup_adjusted_token_stats(docs)
    rate = F.when(F.col("unique_tokens") <= 0, F.lit(1.0)).otherwise(
        F.least(
            F.lit(1.0), F.lit(float(budget)) / F.col("unique_tokens")
        )
    )
    return stats.select(
        F.col("grp").alias("source"),
        "n_unique_docs",
        "unique_tokens",
        rate.alias("sample_rate"),
        F.least(F.lit(budget).cast("long"), F.col("unique_tokens")).alias(
            "planned_tokens"
        ),
    ).orderBy("source")


M49_SQL = """
WITH base AS (
  SELECT source AS grp, doc_id,
         md5(lower(array_to_string(
           list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> ''),
           ' '))) AS fp,
         len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         x -> x <> '')) AS nt
  FROM documents
),
marked AS (
  SELECT grp, nt,
         row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1 AS rep
  FROM base
),
stats AS (
  SELECT grp,
         CAST(SUM(CASE WHEN rep THEN 1 ELSE 0 END) AS BIGINT) AS n_unique_docs,
         CAST(SUM(CASE WHEN rep THEN nt ELSE 0 END) AS BIGINT) AS unique_tokens
  FROM marked
  GROUP BY grp
)
SELECT grp AS source,
       n_unique_docs,
       unique_tokens,
       CASE WHEN unique_tokens <= 0 THEN 1.0
            ELSE least(1.0, 50000.0 / unique_tokens) END AS sample_rate,
       least(50000, unique_tokens)::BIGINT AS planned_tokens
FROM stats
ORDER BY source
"""


# ---------------------------------------------------------------------------
# M50 — budgeted mixture EXECUTION: m49's planner rates applied to the
# corpus in the same job, fully distributed (no driver-side rate dict).
# The per-source rate joins on as a broadcast column (source-cardinality
# table), and each doc keeps iff its content-addressed uniform —
# md5("source:id") first 4 hex digits as an integer — clears
# round(rate·65536). Same decision rule as ``mixture_sample``, expressed
# distributively so plan → execute is ONE lineage, bit-reproducible
# across engines, runs, and partitionings.
# ---------------------------------------------------------------------------

def m50_budgeted_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from novi_pdq_etl_project_prod_spark.operators.text import (
        dup_adjusted_token_stats,
    )

    budget = 50_000
    docs = read_table(spark, sf_dir, "documents")
    stats = dup_adjusted_token_stats(docs)
    rates = stats.select(
        F.col("grp").alias("source"),
        F.when(F.col("unique_tokens") <= 0, F.lit(1.0))
        .otherwise(
            F.least(F.lit(1.0), F.lit(float(budget)) / F.col("unique_tokens"))
        )
        .alias("_rate"),
    )
    rated = docs.select("doc_id", "source").join(
        F.broadcast(rates), "source"
    )
    u = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col("source"), F.col("doc_id").cast("string"))),
            1,
            4,
        ),
        16,
        10,
    ).cast("long")
    keep = (F.col("_rate") >= 1.0) | (
        u < F.round(F.col("_rate") * 65536, 0).cast("long")
    )
    return (
        rated.where(keep)
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


M50_SQL = """
WITH base AS (
  SELECT source AS grp, doc_id,
         md5(lower(array_to_string(
           list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> ''),
           ' '))) AS fp,
         len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         x -> x <> '')) AS nt
  FROM documents
),
marked AS (
  SELECT grp, nt,
         row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1 AS rep
  FROM base
),
rates AS (
  SELECT grp AS source,
         CASE WHEN SUM(CASE WHEN rep THEN nt ELSE 0 END) <= 0 THEN 1.0
              ELSE least(1.0,
                         50000.0 / SUM(CASE WHEN rep THEN nt ELSE 0 END))
         END AS rate
  FROM marked
  GROUP BY grp
)
SELECT d.doc_id, d.source
FROM documents d
JOIN rates r ON d.source = r.source
WHERE r.rate >= 1.0
   OR CAST(('0x' || substr(md5(d.source || ':' || CAST(d.doc_id AS VARCHAR)), 1, 4))
           AS BIGINT)
      < CAST(round(r.rate * 65536) AS BIGINT)
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# M51 — shard manifest: the output stage of the packing pipeline. Packs
# are assigned to a fixed shard count by a content-addressed hash of the
# pack id (stable across runs/partitionings/engines), and the manifest
# carries per-shard doc/pack/token totals plus an order-independent
# integer checksum — what a training loader verifies before reading a
# single byte. One narrow agg over (doc_id, pack_id, n_tokens) rows.
# ---------------------------------------------------------------------------

def m51_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from novi_pdq_etl_project_prod_spark.operators.packing import pack_sequences
    from novi_pdq_etl_project_prod_spark.operators.text import token_count

    n_shards = 16
    docs = read_table(spark, sf_dir, "documents")
    sized = docs.select("doc_id", token_count("text").alias("tok"))
    packed = pack_sequences(
        sized, id_col="doc_id", token_count="tok", budget=512,
        bucket_hex_chars=2,
    )
    shard = (
        F.conv(F.substring(F.md5(F.col("pack_id")), 1, 8), 16, 10)
        .cast("long") % n_shards
    )
    doc_sig = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    return (
        packed.select(
            shard.alias("shard_id"),
            "pack_id",
            "n_tokens",
            doc_sig.alias("_sig"),
        )
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("pack_id").alias("n_packs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("_sig").alias("checksum"),
        )
        .orderBy("shard_id")
    )


M51_SQL = """
WITH tok AS (
  SELECT doc_id,
         len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> ''))
           AS n_tokens,
         substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket
  FROM documents
),
filled AS (
  SELECT doc_id, n_tokens, bucket,
         SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_tokens
  FROM tok
),
packed AS (
  SELECT doc_id, n_tokens,
         bucket || '-' || CAST(((cum_tokens - n_tokens) // 512) AS VARCHAR)
           AS pack_id
  FROM filled
)
SELECT CAST(('0x' || substr(md5(pack_id), 1, 8)) AS BIGINT) % 16 AS shard_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT pack_id) AS BIGINT) AS n_packs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                     AS BIGINT)) AS BIGINT) AS checksum
FROM packed
GROUP BY 1
ORDER BY shard_id
"""


# ---------------------------------------------------------------------------
# M52 — contamination report: m19's train×eval 3-gram overlap pairs
# reduced to the per-source rate a dataset card publishes (share of
# train docs sharing ≥2 distinct grams with the held-out split).
# ---------------------------------------------------------------------------

def m52_contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from novi_pdq_etl_project_prod_spark.operators.dedup import (
        contamination_pairs,
    )

    docs = read_table(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") % 97 != 0)
    ev = docs.where(F.col("doc_id") % 97 == 0)
    pairs = contamination_pairs(train, ev, n=3, min_overlap=2)
    hits = (
        pairs.select(F.col("train_id").alias("doc_id"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    return (
        train.select("doc_id", "source")
        .join(hits, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_train_docs"),
            F.coalesce(F.sum("__hit"), F.lit(0)).cast("long").alias(
                "n_contaminated"
            ),
            (
                F.coalesce(F.sum("__hit"), F.lit(0)).cast("double")
                / F.count(F.lit(1))
            ).alias("contamination_rate"),
        )
        .orderBy("source")
    )


M52_SQL = """
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS t
  FROM documents
),
idx AS (
  SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
  FROM toks WHERE len(t) >= 3
),
sh AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh FROM idx
),
pairs AS (
  SELECT tr.doc_id AS train_id
  FROM (SELECT * FROM sh WHERE doc_id % 97 <> 0) tr
  JOIN (SELECT * FROM sh WHERE doc_id % 97 = 0) ev ON tr.sh = ev.sh
  GROUP BY tr.doc_id, ev.doc_id
  HAVING COUNT(*) >= 2
),
hits AS (SELECT DISTINCT train_id FROM pairs)
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_train_docs,
       CAST(SUM(CASE WHEN h.train_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_contaminated,
       SUM(CASE WHEN h.train_id IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
         / COUNT(*) AS contamination_rate
FROM documents d
LEFT JOIN hits h ON d.doc_id = h.train_id
WHERE d.doc_id % 97 <> 0
GROUP BY d.source
ORDER BY d.source
"""


# ---------------------------------------------------------------------------
# F11 — bitwise scalar surface: AND/OR/XOR, shifts, population count.
# Bit tricks are the bread and butter of hash partitioners, bucket
# routers, bloom-filter probes, and flag columns — exact integer ops,
# so parity is bit-for-bit by construction. Row-local; scan-bound.
# ---------------------------------------------------------------------------

def f11_bitwise_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return (
        o.where(k < 1000)
        .select(
            "o_orderkey",
            k.bitwiseAND(F.lit(255)).alias("low_byte"),
            k.bitwiseOR(F.lit(4096)).alias("with_flag"),
            k.bitwiseXOR(F.lit(255)).alias("xored"),
            F.shiftleft(k, 3).alias("shl3"),
            F.shiftright(k, 2).alias("shr2"),
            F.bit_count(k).alias("popcount"),
        )
        .orderBy("o_orderkey")
    )


F11_SQL = """
SELECT o_orderkey,
       o_orderkey & 255 AS low_byte,
       o_orderkey | 4096 AS with_flag,
       xor(o_orderkey, 255) AS xored,
       o_orderkey << 3 AS shl3,
       o_orderkey >> 2 AS shr2,
       CAST(bit_count(o_orderkey::BIGINT) AS INT) AS popcount
FROM orders
WHERE o_orderkey < 1000
ORDER BY o_orderkey
"""


QUERIES = {
    "f11_bitwise_surface": f11_bitwise_surface,
    "m47_bpe_token_count": m47_bpe_token_count,
    "m48_bpe_packing": m48_bpe_packing,
    "m49_mixture_plan": m49_mixture_plan,
    "m50_budgeted_mixture": m50_budgeted_mixture,
    "m51_shard_manifest": m51_shard_manifest,
    "m52_contamination_report": m52_contamination_report,
}

ORACLES = {
    "f11_bitwise_surface": F11_SQL,
    "m47_bpe_token_count": M47_SQL,
    "m48_bpe_packing": M48_SQL,
    "m49_mixture_plan": M49_SQL,
    "m50_budgeted_mixture": M50_SQL,
    "m51_shard_manifest": M51_SQL,
    "m52_contamination_report": M52_SQL,
}
