"""Round-2 catalog additions: interval-join attribution (the batch twin
of the stream-stream join), sequence packing, distribution analytics,
and the z-order layout expression.

Each query follows the determinism contract in catalog/__init__ (exact
decimal aggregation, double only at the edge, engine-portable md5/bit
arithmetic) so the DuckDB oracle hash-matches bit-for-bit.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from novi_pdq_etl_project_prod_spark.operators import text as TX
from novi_pdq_etl_project_prod_spark.operators.packing import pack_sequences
from novi_pdq_etl_project_prod_spark.operators.stats import (
    fixed_width_histogram,
    zscore_outliers,
)
from novi_pdq_etl_project_prod_spark.session import read_events
from novi_pdq_etl_project_prod_spark.sources.skipping import zorder_col, zorder_sql
from novi_pdq_etl_project_prod_spark.streaming.events import (
    click_purchase_attribution,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# ---------------------------------------------------------------------------
# X6 — interval-join attribution: batch twin of the stream-stream join
# streaming.events.click_purchase_attribution (withWatermark is a no-op
# on batch input, so this runs the IDENTICAL operator graph the stream
# runs — the oracle therefore certifies the streaming join's semantics)
# ---------------------------------------------------------------------------

def x6_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events(spark, sf_dir)
    return click_purchase_attribution(ev, attribution_window="1 hour")


X6_SQL = """
WITH ev AS (
  SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, value
  FROM events
)
SELECT c.user_id,
       c.event_id AS click_id,
       p.event_id AS purchase_id,
       c.ts AS click_ts,
       p.ts AS purchase_ts,
       p.value AS purchase_value
FROM ev c
JOIN ev p
  ON c.user_id = p.user_id
 AND p.event_type = 'purchase'
 AND c.event_type = 'click'
 AND p.ts > c.ts
 AND p.ts <= c.ts + INTERVAL 1 HOUR
"""


# ---------------------------------------------------------------------------
# M26 — sequence packing: fixed token-budget bins via contiguous fill
# inside md5 hash buckets (content-addressed → engine-portable)
# ---------------------------------------------------------------------------

def m26_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    sized = docs.select("doc_id", TX.token_count("text").alias("tok"))
    return pack_sequences(
        sized, id_col="doc_id", token_count="tok", budget=512, bucket_hex_chars=1
    )


M26_SQL = """
WITH tok AS (
  SELECT doc_id,
         len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> ''))
           AS n_tokens,
         substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS bucket
  FROM documents
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
# D6 — fixed-width histogram of the price distribution (single shuffle;
# the share-of-total window runs over the tiny bucket list, not the scan)
# ---------------------------------------------------------------------------

def d6_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return fixed_width_histogram(
        li,
        "l_extendedprice",
        width=5000.0,
        extra_aggs={
            "sum_price": F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast(
                "double"
            )
        },
    )


D6_SQL = """
WITH hist AS (
  SELECT CAST(floor(l_extendedprice / 5000.0) AS BIGINT) AS bucket,
         COUNT(*) AS n_rows,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
  FROM lineitem
  GROUP BY 1
)
SELECT bucket,
       bucket * 5000.0 AS bucket_lo,
       n_rows,
       sum_price,
       n_rows / SUM(n_rows) OVER () AS pct_rows
FROM hist
"""


# ---------------------------------------------------------------------------
# D7 — z-score anomaly flags over the monthly event-value series
# (exact decimal moments → double at the edge; stats.zscore_outliers)
# ---------------------------------------------------------------------------

def d7_monthly_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events(spark, sf_dir).withColumn(
        "yyyymm", (F.year("ts") * 100 + F.month("ts")).cast("int")
    )
    return zscore_outliers(
        ev, keys=["event_type"], series_col="yyyymm", measure="value", z_threshold=2.0
    )


D7_SQL = """
WITH grain AS (
  SELECT event_type,
         CAST(year(CAST(ts AS TIMESTAMP)) * 100
              + month(CAST(ts AS TIMESTAMP)) AS INT) AS yyyymm,
         COUNT(*) AS n_rows,
         SUM(CAST(value AS DECIMAL(18,2))) AS sum_dec,
         SUM(CAST(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))
                  AS DECIMAL(38,4))) AS sumsq_dec
  FROM events
  GROUP BY 1, 2
),
win AS (
  SELECT *,
         COUNT(*) OVER (PARTITION BY event_type) AS cnt,
         CAST(SUM(CAST(sum_dec AS DECIMAL(38,4)))
                OVER (PARTITION BY event_type) AS DOUBLE) AS s1,
         CAST(SUM(sumsq_dec) OVER (PARTITION BY event_type) AS DOUBLE) AS s2
  FROM grain
),
scored AS (
  SELECT event_type, yyyymm, n_rows,
         CAST(sum_dec AS DOUBLE) AS series_sum,
         s1 / cnt AS key_mean,
         CASE WHEN cnt > 1 AND (s2 - s1 * s1 / cnt) / (cnt - 1) > 0
              THEN (CAST(sum_dec AS DOUBLE) - s1 / cnt)
                   / sqrt((s2 - s1 * s1 / cnt) / (cnt - 1))
         END AS zscore
  FROM win
)
SELECT event_type, yyyymm, n_rows, series_sum, key_mean, zscore,
       abs(COALESCE(zscore, 0.0)) >= 2.0 AS is_outlier
FROM scored
"""


# ---------------------------------------------------------------------------
# Z1 — z-order (Morton) layout expression over orders: the clustering
# key write_zordered sorts by, certified against pure-SQL bit arithmetic
# ---------------------------------------------------------------------------

def z1_zorder_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    keyed = o.select(
        "o_orderkey",
        (F.col("o_custkey") % 4096).alias("x"),
        ((F.year("o_orderdate") * 12 + F.month("o_orderdate")) % 4096).alias("y"),
    )
    z = zorder_col("x", "y", bits=12)
    return keyed.select(
        "o_orderkey",
        "x",
        "y",
        z.alias("zval"),
        F.shiftright(z, 18).alias("file_bucket"),
    )


Z1_SQL = f"""
WITH keyed AS (
  SELECT o_orderkey,
         o_custkey % 4096 AS x,
         (year(o_orderdate) * 12 + month(o_orderdate)) % 4096 AS y
  FROM orders
)
SELECT o_orderkey, x, y,
       {zorder_sql('x', 'y', 12)} AS zval,
       ({zorder_sql('x', 'y', 12)}) >> 18 AS file_bucket
FROM keyed
"""


QUERIES = {
    "x6_click_attribution": x6_click_attribution,
    "m26_sequence_packing": m26_sequence_packing,
    "d6_price_histogram": d6_price_histogram,
    "d7_monthly_anomalies": d7_monthly_anomalies,
    "z1_zorder_values": z1_zorder_values,
}

ORACLES = {
    "x6_click_attribution": X6_SQL,
    "m26_sequence_packing": M26_SQL,
    "d6_price_histogram": D6_SQL,
    "d7_monthly_anomalies": D7_SQL,
    "z1_zorder_values": Z1_SQL,
}
