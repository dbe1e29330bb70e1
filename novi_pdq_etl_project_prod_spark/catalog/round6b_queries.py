"""Round-6b catalog additions — robust statistics, sequential smoothing,
mergeable sketches, and schema-invariant audits.

- ``d18`` grouped exponential moving average: the sequential recurrence
  SQL window frames can't express, folded JVM-side per key
  (``timeseries.grouped_ema``) and certified against a DuckDB
  recursive-CTE walk of the identical recurrence.
- ``d19`` MAD robust outliers (50% breakdown point — the gate that
  still works when half the data is corrupt), exact cross-engine via
  the certified d11 percentile-interpolation pattern.
- ``d20``/``d21`` K-Minimum-Values distinct sketch: deterministic
  md5-register bottom-k (``operators.sketches``), estimate + exact
  register state, and a shard-merge query certifying the mergeability
  law min-k(min-k(A) ∪ min-k(B)) = min-k(A ∪ B) bit-for-bit — the
  partial-aggregation contract that lets per-day sketches answer
  "distinct users this quarter" without rescanning 100 TB.
- ``dq10`` functional-dependency audit: which assumed key→attribute
  invariants actually hold (the reference's grain-uniqueness gate,
  generalized to arbitrary candidate FDs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from novi_pdq_etl_project_prod_spark.operators.quality import fd_violation_report
from novi_pdq_etl_project_prod_spark.operators.sketches import (
    HASH_DOMAIN,
    kmv_estimate,
    kmv_merge,
    kmv_set_overlap,
    kmv_sketch,
)
from novi_pdq_etl_project_prod_spark.operators.stats import mad_outlier_summary
from novi_pdq_etl_project_prod_spark.operators.timeseries import grouped_ema
from novi_pdq_etl_project_prod_spark.session import read_table


# ---------------------------------------------------------------------------
# D18 — EMA of monthly national revenue. One shuffle to (nation, month)
# grain, then a row-local left fold per nation; the oracle replays the
# recurrence as a recursive CTE. alpha = 0.25 (exact binary) so both
# engines' correctly-rounded doubles agree bit-for-bit.
# ---------------------------------------------------------------------------

def d18_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    monthly = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .withColumn(
            "yyyymm",
            (F.year("o_orderdate") * 100 + F.month("o_orderdate")).cast("int"),
        )
        .groupBy("n_name", "yyyymm")
        .agg(F.sum(cents).alias("__cents"))
        .select("n_name", "yyyymm", (F.col("__cents") / F.lit(100.0)).alias("rev"))
    )
    return grouped_ema(
        monthly, ["n_name"], "yyyymm", "rev", alpha=0.25
    ).orderBy("n_name", "rn")


D18_SQL = """
WITH RECURSIVE monthly AS (
  SELECT n_name,
         CAST(year(o_orderdate) * 100 + month(o_orderdate) AS INTEGER) AS yyyymm,
         SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) / 100.0 AS rev
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
),
seq AS (
  SELECT n_name, yyyymm, rev,
         CAST(row_number() OVER (PARTITION BY n_name ORDER BY yyyymm) AS INTEGER) AS rn
  FROM monthly
),
e(n_name, rn, yyyymm, rev, ema) AS (
  SELECT n_name, rn, yyyymm, rev, rev FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.n_name, s.rn, s.yyyymm, s.rev, 0.25 * s.rev + 0.75 * e.ema
  FROM seq s JOIN e ON s.n_name = e.n_name AND s.rn = e.rn + 1
)
SELECT n_name, rn, yyyymm, rev, ema FROM e ORDER BY n_name, rn
"""


# ---------------------------------------------------------------------------
# D19 — MAD robust outliers per return flag. Two percentile shuffles +
# two broadcast joins of group-cardinality tables.
# ---------------------------------------------------------------------------

def d19_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return (
        mad_outlier_summary(li, ["l_returnflag"], "l_extendedprice", k=3.0)
        .select(
            "l_returnflag",
            F.col("med").alias("med_price"),
            F.col("mad").alias("mad_price"),
            "n_rows",
            "n_outliers",
        )
        .orderBy("l_returnflag")
    )


D19_SQL = """
WITH med AS (
  SELECT l_returnflag,
         quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5) AS med_price,
         count(*) AS n_rows
  FROM lineitem GROUP BY 1
),
dev AS (
  SELECT m.l_returnflag, m.med_price, m.n_rows,
         abs(CAST(l.l_extendedprice AS DOUBLE) - m.med_price) AS adev
  FROM lineitem l JOIN med m ON l.l_returnflag = m.l_returnflag
),
mad AS (
  SELECT l_returnflag, quantile_cont(adev, 0.5) AS mad_price
  FROM dev GROUP BY 1
)
SELECT d.l_returnflag,
       any_value(d.med_price) AS med_price,
       any_value(ma.mad_price) AS mad_price,
       any_value(d.n_rows) AS n_rows,
       CAST(count(*) FILTER (WHERE d.adev > 3.0 * ma.mad_price) AS BIGINT)
         AS n_outliers
FROM dev d JOIN mad ma ON d.l_returnflag = ma.l_returnflag
GROUP BY d.l_returnflag
ORDER BY d.l_returnflag
"""


# ---------------------------------------------------------------------------
# D20 — KMV distinct sketch vs truth. The estimate column is pure
# IEEE-double arithmetic over integer register state, so it certifies
# bit-for-bit despite being an approximation of true_distinct.
# ---------------------------------------------------------------------------

_KMV_K = 64
_KMV_SCALE = float((_KMV_K - 1) * HASH_DOMAIN)


def d20_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    sk = kmv_sketch(li, "l_partkey", ["l_returnflag"], k=_KMV_K)
    est = kmv_estimate(sk, ["l_returnflag"], k=_KMV_K)
    true = li.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("true_distinct")
    )
    return est.join(true, "l_returnflag").orderBy("l_returnflag")


_KMV_SKETCH_CTE = f"""
vals AS (
  SELECT DISTINCT l_returnflag, CAST(l_partkey AS VARCHAR) AS v FROM lineitem
),
h AS (
  SELECT l_returnflag,
         CAST(('0x' || substr(md5('kmv:' || v), 1, 15)) AS BIGINT) AS h
  FROM vals
),
rk AS (
  SELECT l_returnflag, h,
         row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rk
  FROM h
),
sk AS (
  SELECT l_returnflag,
         count(*) AS n_kept,
         max(h) AS kth_hash,
         CASE WHEN count(*) < {_KMV_K} THEN CAST(count(*) AS DOUBLE)
              ELSE {int(_KMV_SCALE)}.0 / CAST(max(h) AS DOUBLE) END
           AS est_distinct
  FROM rk WHERE rk <= {_KMV_K} GROUP BY l_returnflag
)"""

D20_SQL = f"""
WITH {_KMV_SKETCH_CTE},
t AS (
  SELECT l_returnflag, count(DISTINCT l_partkey) AS true_distinct
  FROM lineitem GROUP BY 1
)
SELECT sk.l_returnflag, n_kept, kth_hash, est_distinct, true_distinct
FROM sk JOIN t USING (l_returnflag)
ORDER BY sk.l_returnflag
"""


# ---------------------------------------------------------------------------
# D21 — sketch mergeability, certified. Four disjoint shards each build
# their own bottom-k; the merged sketch must equal the direct sketch of
# the union EXACTLY (min-k(min-k(A) ∪ min-k(B)) = min-k(A ∪ B)), so the
# oracle computes the direct sketch and the hash comparison proves the
# merge law — the property that lets per-shard/per-day sketches roll up
# without rescanning history.
# ---------------------------------------------------------------------------

def d21_kmv_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").withColumn(
        "__shard", F.pmod(F.col("l_orderkey"), F.lit(4))
    )
    # One pass builds every shard's sketch (shard id is just an extra
    # group key — the per-day/per-file pattern at scale), then the merge
    # collapses shards per group. No re-scan per shard.
    shard_sk = kmv_sketch(li, "l_partkey", ["l_returnflag", "__shard"], k=_KMV_K)
    merged = kmv_merge(shard_sk, ["l_returnflag"], k=_KMV_K)
    return kmv_estimate(merged, ["l_returnflag"], k=_KMV_K).orderBy("l_returnflag")


D21_SQL = f"""
WITH {_KMV_SKETCH_CTE}
SELECT l_returnflag, n_kept, kth_hash, est_distinct
FROM sk ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# D22 — theta-sketch set intersection: how many distinct parts do two
# return-flag populations share, answered from two k-row sketches plus
# the exact truth for calibration. The estimate is a deterministic
# function of the registers, so it certifies bit-for-bit.
# ---------------------------------------------------------------------------

def d22_kmv_set_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    est = kmv_set_overlap(li, "l_partkey", "l_returnflag", k=_KMV_K)
    pairs = li.select(F.col("l_returnflag").alias("set_a"), "l_partkey").distinct()
    true = (
        pairs.join(
            li.select(F.col("l_returnflag").alias("set_b"), "l_partkey").distinct(),
            "l_partkey",
        )
        .where(F.col("set_a") < F.col("set_b"))
        .groupBy("set_a", "set_b")
        .agg(F.count(F.lit(1)).alias("true_intersection"))
    )
    return est.join(F.broadcast(true), ["set_a", "set_b"], "left").orderBy(
        "set_a", "set_b"
    )


D22_SQL = f"""
WITH vals AS (
  SELECT DISTINCT l_returnflag AS s, CAST(l_partkey AS VARCHAR) AS v FROM lineitem
),
h AS (
  SELECT s, CAST(('0x' || substr(md5('kmv:' || v), 1, 15)) AS BIGINT) AS h
  FROM vals
),
rk AS (
  SELECT s, h, row_number() OVER (PARTITION BY s ORDER BY h) AS rk FROM h
),
sk AS (SELECT s, h FROM rk WHERE rk <= {_KMV_K}),
theta AS (
  SELECT s,
         CASE WHEN count(*) < {_KMV_K} THEN {HASH_DOMAIN} ELSE max(h) END
           AS theta
  FROM sk GROUP BY s
),
base AS (
  SELECT a.s AS set_a, b.s AS set_b, a.theta AS ta, b.theta AS tb
  FROM theta a JOIN theta b ON a.s < b.s
),
common AS (
  SELECT a.s AS set_a, b.s AS set_b, count(*) AS n_common
  FROM sk a
  JOIN sk b ON a.h = b.h AND a.s < b.s
  JOIN theta xa ON xa.s = a.s
  JOIN theta xb ON xb.s = b.s
  WHERE a.h < least(xa.theta, xb.theta)
  GROUP BY 1, 2
),
truth AS (
  SELECT a.s AS set_a, b.s AS set_b, count(*) AS true_intersection
  FROM (SELECT DISTINCT l_returnflag AS s, l_partkey FROM lineitem) a
  JOIN (SELECT DISTINCT l_returnflag AS s, l_partkey FROM lineitem) b
    ON a.l_partkey = b.l_partkey AND a.s < b.s
  GROUP BY 1, 2
)
SELECT base.set_a, base.set_b,
       least(ta, tb) AS theta,
       coalesce(n_common, 0) AS n_common,
       CAST(coalesce(n_common, 0) AS DOUBLE) * {float(HASH_DOMAIN)!r}
         / CAST(least(ta, tb) AS DOUBLE) AS est_intersection,
       true_intersection
FROM base
LEFT JOIN common USING (set_a, set_b)
LEFT JOIN truth USING (set_a, set_b)
ORDER BY set_a, set_b
"""


# ---------------------------------------------------------------------------
# DQ10 — functional-dependency audit over orders + lineitem: two FDs
# that hold by construction (key → attribute) and two plausible-looking
# ones that don't. One count-distinct hash-agg per FD, 4-row output.
# ---------------------------------------------------------------------------

def dq10_fd_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    rep_o = fd_violation_report(
        orders,
        [
            ("o_orderkey->o_custkey", ["o_orderkey"], "o_custkey"),
            ("o_custkey->o_orderpriority", ["o_custkey"], "o_orderpriority"),
        ],
    )
    rep_l = fd_violation_report(
        li,
        [
            ("l_orderkey->l_returnflag", ["l_orderkey"], "l_returnflag"),
            ("l_partkey->l_suppkey", ["l_partkey"], "l_suppkey"),
        ],
    )
    return rep_o.unionByName(rep_l).orderBy("fd")


def _fd_sql(fd: str, table: str, det: str, dep: str) -> str:
    return f"""
SELECT '{fd}' AS fd,
       count(*) AS n_keys,
       CAST(count(*) FILTER (WHERE b > 1) AS BIGINT) AS n_violating_keys,
       max(b) AS max_branching
FROM (SELECT {det}, count(DISTINCT {dep}) AS b FROM {table} GROUP BY {det})
"""


DQ10_SQL = (
    _fd_sql("o_orderkey->o_custkey", "orders", "o_orderkey", "o_custkey")
    + " UNION ALL "
    + _fd_sql("o_custkey->o_orderpriority", "orders", "o_custkey", "o_orderpriority")
    + " UNION ALL "
    + _fd_sql("l_orderkey->l_returnflag", "lineitem", "l_orderkey", "l_returnflag")
    + " UNION ALL "
    + _fd_sql("l_partkey->l_suppkey", "lineitem", "l_partkey", "l_suppkey")
    + " ORDER BY fd"
)


QUERIES = {
    "d18_ema": d18_ema,
    "d19_mad_outliers": d19_mad_outliers,
    "d20_kmv_distinct": d20_kmv_distinct,
    "d21_kmv_merge": d21_kmv_merge,
    "d22_kmv_set_overlap": d22_kmv_set_overlap,
    "dq10_fd_violations": dq10_fd_violations,
}

ORACLES = {
    "d18_ema": D18_SQL,
    "d19_mad_outliers": D19_SQL,
    "d20_kmv_distinct": D20_SQL,
    "d21_kmv_merge": D21_SQL,
    "d22_kmv_set_overlap": D22_SQL,
    "dq10_fd_violations": DQ10_SQL,
}


# ---------------------------------------------------------------------------
# M53 — triangle census of the FREQUENT co-purchase graph: parts are
# linked when they co-occur in >= 2 orders (the market-basket support
# threshold; without it the 2,000-part catalog saturates into a near-
# complete graph where every triangle is coincidence). Spark runs the
# degree-oriented algorithm (arboricity-bounded wedge join); the oracle
# counts the same triangles with the naive a<b<c three-way join —
# different algorithm, identical integers. Per-order fan-out is bounded
# by basket size, so pair counting is one linear hash-agg at any scale.
# ---------------------------------------------------------------------------

def m53_copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from novi_pdq_etl_project_prod_spark.operators.graphs import triangle_stats

    li = read_table(spark, sf_dir, "lineitem")
    # Frequency pre-prune (VERDICT r06 item 3): an item seen in a single
    # order can never reach pair support >= 2, so drop it BEFORE pair
    # generation — identical output (removing it changes no surviving
    # pair's support), strictly smaller baskets. The frequent-item list
    # is item-catalog-sized → broadcast semi-join.
    frequent = (
        li.groupBy("l_partkey")
        .agg(F.count_distinct("l_orderkey").alias("__n"))
        .where(F.col("__n") >= 2)
        .select("l_partkey")
    )
    pruned = li.select("l_orderkey", "l_partkey").join(
        F.broadcast(frequent), "l_partkey", "leftsemi"
    )
    # Basket-local pair generation: ONE shuffle (groupBy order) replaces
    # the distinct + orderkey self-join of the r06 shape — the sorted
    # basket array dedups items and emits each p1 < p2 pair exactly once,
    # with per-order fan-out still C(basket, 2)-bounded.
    baskets = pruned.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("ps")
    )
    pair = baskets.select(
        F.explode(
            F.flatten(
                F.transform(
                    "ps",
                    lambda x, i: F.transform(
                        F.slice(F.col("ps"), i + 2, F.size("ps")),
                        lambda y: F.struct(x.alias("p1"), y.alias("p2")),
                    ),
                )
            )
        ).alias("pr")
    )
    pairs = (
        pair.select("pr.p1", "pr.p2")
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("__support"))
        .where(F.col("__support") >= 2)
        .select("p1", "p2")
    )
    return triangle_stats(pairs, "p1", "p2")


M53_SQL = """
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM items a
  JOIN items b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= 2
),
deg AS (
  SELECT x, count(*) AS deg
  FROM (SELECT u AS x FROM edges UNION ALL SELECT v AS x FROM edges)
  GROUP BY x
),
tri AS (
  SELECT count(*) AS n_triangles
  FROM edges e1
  JOIN edges e2 ON e2.u = e1.v
  JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
),
summary AS (
  SELECT count(*) AS n_vertices,
         CAST(SUM(deg * (deg - 1)) / 2 AS BIGINT) AS n_wedges
  FROM deg
),
ne AS (SELECT count(*) AS n_edges FROM edges)
SELECT n_vertices, n_edges, n_wedges, n_triangles,
       CASE WHEN n_wedges > 0
            THEN 3.0 * CAST(n_triangles AS DOUBLE) / CAST(n_wedges AS DOUBLE)
            ELSE 0.0 END AS global_clustering
FROM summary, ne, tri
"""

QUERIES["m53_copurchase_triangles"] = m53_copurchase_triangles
ORACLES["m53_copurchase_triangles"] = M53_SQL


# ---------------------------------------------------------------------------
# J7 — Bloom-filter semi-join pruning, with its false-positive ledger.
# A deliberately small filter (256 bits / 2 hashes for ~80 build keys)
# so false positives actually occur and the accounting is exercised:
# n_pass - n_true IS the pruning inefficiency a production filter sizes
# m against. Every integer is exact cross-engine (md5 positions, shift/
# AND block math — f11's certified surface).
# ---------------------------------------------------------------------------

_BLOOM_M = 256
_BLOOM_H = 2


def j7_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    from novi_pdq_etl_project_prod_spark.operators.joins import (
        bloom_build,
        bloom_prune,
    )

    part = read_table(spark, sf_dir, "part")
    li = read_table(spark, sf_dir, "lineitem")
    build = part.where(F.col("p_brand") == "Brand#7").select("p_partkey")
    bloom = bloom_build(build, "p_partkey", m_bits=_BLOOM_M, n_hashes=_BLOOM_H)
    n_probe = li.agg(F.count(F.lit(1)).alias("n_probe"))
    n_pass = bloom_prune(
        li, bloom, "l_partkey", m_bits=_BLOOM_M, n_hashes=_BLOOM_H
    ).agg(F.count(F.lit(1)).alias("n_pass"))
    n_true = li.join(
        build.withColumnRenamed("p_partkey", "l_partkey"), "l_partkey", "left_semi"
    ).agg(F.count(F.lit(1)).alias("n_true"))
    out = n_probe.crossJoin(n_pass).crossJoin(n_true)
    fp = F.col("n_pass") - F.col("n_true")
    denom = F.col("n_probe") - F.col("n_true")
    return out.select(
        "n_probe",
        "n_pass",
        "n_true",
        fp.alias("n_false_pos"),
        F.when(denom > 0, fp.cast("double") / denom.cast("double"))
        .otherwise(F.lit(0.0))
        .alias("fp_rate"),
    )


J7_SQL = f"""
WITH build AS (
  SELECT DISTINCT p_partkey FROM part WHERE p_brand = 'Brand#7'
),
pos AS (
  SELECT DISTINCT
    (CAST(('0x' || substr(md5('bf' || j || ':' || CAST(p_partkey AS VARCHAR)), 1, 8))
          AS BIGINT) % {_BLOOM_M}) AS p
  FROM build, (VALUES (0), (1)) t(j)
),
blocks AS (
  SELECT p >> 5 AS block_id,
         bit_or(1::BIGINT << CAST(p & 31 AS INTEGER)) AS mask
  FROM pos GROUP BY 1
),
probe AS (
  SELECT l_partkey,
    (CAST(('0x' || substr(md5('bf0:' || CAST(l_partkey AS VARCHAR)), 1, 8))
          AS BIGINT) % {_BLOOM_M}) AS p0,
    (CAST(('0x' || substr(md5('bf1:' || CAST(l_partkey AS VARCHAR)), 1, 8))
          AS BIGINT) % {_BLOOM_M}) AS p1
  FROM lineitem
),
flagged AS (
  SELECT
    ((coalesce((SELECT mask FROM blocks b WHERE b.block_id = p0 >> 5), 0)
      & (1::BIGINT << CAST(p0 & 31 AS INTEGER))) <> 0
     AND
     (coalesce((SELECT mask FROM blocks b WHERE b.block_id = p1 >> 5), 0)
      & (1::BIGINT << CAST(p1 & 31 AS INTEGER))) <> 0) AS pass,
    l_partkey IN (SELECT p_partkey FROM build) AS is_true
  FROM probe
),
agg AS (
  SELECT count(*) AS n_probe,
         count(*) FILTER (WHERE pass) AS n_pass,
         count(*) FILTER (WHERE is_true) AS n_true
  FROM flagged
)
SELECT n_probe, n_pass, n_true,
       n_pass - n_true AS n_false_pos,
       CASE WHEN n_probe - n_true > 0
            THEN CAST(n_pass - n_true AS DOUBLE)
                 / CAST(n_probe - n_true AS DOUBLE)
            ELSE 0.0 END AS fp_rate
FROM agg
"""

QUERIES["j7_bloom_prune"] = j7_bloom_prune
ORACLES["j7_bloom_prune"] = J7_SQL


# ---------------------------------------------------------------------------
# D23 — quantiles from the deterministic bottom-k row sample, vs truth.
# The sample membership is a pure function of (row id, value) — the
# value tie-break matters because the synthetic lineitem has duplicate
# (orderkey, linenumber) keys with different prices — so the oracle
# draws the IDENTICAL sample and the estimate certifies bit-for-bit;
# the truth columns calibrate the O(1/sqrt(k)) sampling error.
# ---------------------------------------------------------------------------

_SQS_K = 512


def d23_sample_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from novi_pdq_etl_project_prod_spark.operators.sketches import (
        sample_quantile_sketch,
    )

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.concat_ws(
            "-",
            F.col("l_orderkey").cast("string"),
            F.col("l_linenumber").cast("string"),
        ).alias("rid"),
        F.col("l_extendedprice").cast("double").alias("v"),
    )
    samp = sample_quantile_sketch(li, "rid", "v", ["l_returnflag"], k=_SQS_K)
    est = samp.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_sample"),
        F.percentile(F.col("v"), F.lit(0.5)).alias("est_p50"),
        F.percentile(F.col("v"), F.lit(0.9)).alias("est_p90"),
    )
    # truth at (flag, value, count) grain: percentile buffers distinct
    # values, not raw rows (the d19/d24 lesson; bit-identical by the
    # frequency-interpolation contract)
    true = (
        li.groupBy("l_returnflag", "v")
        .agg(F.count(F.lit(1)).alias("__c"))
        .groupBy("l_returnflag")
        .agg(
            F.percentile(F.col("v"), F.lit(0.5), F.col("__c")).alias("true_p50"),
            F.percentile(F.col("v"), F.lit(0.9), F.col("__c")).alias("true_p90"),
        )
    )
    return est.join(true, "l_returnflag").orderBy("l_returnflag")


D23_SQL = f"""
WITH base AS (
  SELECT DISTINCT l_returnflag,
         CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)
           AS rid,
         CAST(l_extendedprice AS DOUBLE) AS v
  FROM lineitem
),
h AS (
  SELECT l_returnflag, v,
         CAST(('0x' || substr(md5('sqs:' || rid), 1, 15)) AS BIGINT) AS h
  FROM base
),
rk AS (
  SELECT l_returnflag, v,
         row_number() OVER (PARTITION BY l_returnflag ORDER BY h, v) AS rk
  FROM h
),
est AS (
  SELECT l_returnflag,
         count(*) AS n_sample,
         quantile_cont(v, 0.5) AS est_p50,
         quantile_cont(v, 0.9) AS est_p90
  FROM rk WHERE rk <= {_SQS_K} GROUP BY 1
),
tru AS (
  SELECT l_returnflag,
         quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5) AS true_p50,
         quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.9) AS true_p90
  FROM lineitem GROUP BY 1
)
SELECT est.l_returnflag, n_sample, est_p50, est_p90, true_p50, true_p90
FROM est JOIN tru USING (l_returnflag)
ORDER BY est.l_returnflag
"""

QUERIES["d23_sample_quantiles"] = d23_sample_quantiles
ORACLES["d23_sample_quantiles"] = D23_SQL


# ---------------------------------------------------------------------------
# D24 — exact quantity-weighted median price per return flag. Integer
# crossing test over a RANGE-frame cumulative (the SQL-standard default
# frame), so the result is a pure function of the (value, weight)
# multiset on both engines.
# ---------------------------------------------------------------------------

def d24_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from novi_pdq_etl_project_prod_spark.operators.stats import weighted_median

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_extendedprice").cast("double").alias("price"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    return (
        weighted_median(li, ["l_returnflag"], "price", "qty")
        .select(
            "l_returnflag",
            F.col("weighted_median").alias("wmedian_price"),
            F.col("total_weight").alias("total_qty"),
        )
        .orderBy("l_returnflag")
    )


D24_SQL = """
WITH cum AS (
  SELECT l_returnflag,
         CAST(l_extendedprice AS DOUBLE) AS price,
         SUM(CAST(l_quantity AS BIGINT))
           OVER (PARTITION BY l_returnflag ORDER BY CAST(l_extendedprice AS DOUBLE)
                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c,
         SUM(CAST(l_quantity AS BIGINT))
           OVER (PARTITION BY l_returnflag) AS total
  FROM lineitem
)
SELECT l_returnflag,
       MIN(CASE WHEN 2 * c >= total THEN price END) AS wmedian_price,
       CAST(MAX(total) AS BIGINT) AS total_qty
FROM cum
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# D25 — Gini concentration of customer spend per nation: rank-weighted
# integer sums (permutation-invariant under ties), one double division
# at the edge. The data-source-dominance audit for mixtures.
# ---------------------------------------------------------------------------

def d25_gini_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from novi_pdq_etl_project_prod_spark.operators.stats import gini_index

    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    spend = (
        orders.groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
                "spend_cents"
            )
        )
        .join(customer, F.col("o_custkey") == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
    )
    return gini_index(spend, ["n_name"], F.col("spend_cents")).orderBy("n_name")


D25_SQL = """
WITH spend AS (
  SELECT n_name, o_custkey,
         SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS x
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
),
ranked AS (
  SELECT n_name, x,
         row_number() OVER (PARTITION BY n_name ORDER BY x) AS i
  FROM spend
),
agg AS (
  SELECT n_name,
         count(*) AS n_rows,
         CAST(SUM(x) AS BIGINT) AS total_cents,
         CAST(SUM(i * x) AS BIGINT) AS a
  FROM ranked GROUP BY 1
)
SELECT n_name, n_rows, total_cents,
       CASE WHEN n_rows * total_cents > 0
            THEN CAST(2 * a - (n_rows + 1) * total_cents AS DOUBLE)
                 / CAST(n_rows * total_cents AS DOUBLE)
            ELSE 0.0 END AS gini
FROM agg
ORDER BY n_name
"""

QUERIES["d24_weighted_median"] = d24_weighted_median
ORACLES["d24_weighted_median"] = D24_SQL
QUERIES["d25_gini_spend"] = d25_gini_spend
ORACLES["d25_gini_spend"] = D25_SQL


# ---------------------------------------------------------------------------
# D26 — ABC (Pareto) classification of customer spend per nation:
# class A = customers inside the first 80% of revenue (descending),
# B = next 15%, C = the tail. The class boundary test is integer
# cross-multiplication (cum·100 vs threshold·total) over a RANGE-frame
# cumulative ordered by (spend desc, custkey) — deterministic and
# engine-portable; only counts leave the query.
# ---------------------------------------------------------------------------

def d26_pareto_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    spend = (
        orders.groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("cents")
        )
        .join(customer, F.col("o_custkey") == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select("n_name", "o_custkey", "cents")
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("n_name")
        .orderBy(F.col("cents").desc(), F.col("o_custkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy("n_name")
    classed = spend.select(
        "n_name",
        "cents",
        F.sum("cents").over(w).alias("cum"),
        F.sum("cents").over(tot).alias("total"),
    ).select(
        "n_name",
        "cents",
        F.when(F.col("cum") * 100 <= F.col("total") * 80, "A")
        .when(F.col("cum") * 100 <= F.col("total") * 95, "B")
        .otherwise("C")
        .alias("abc"),
    )
    return (
        classed.groupBy("n_name", "abc")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("cents").alias("class_cents"),
        )
        .orderBy("n_name", "abc")
    )


D26_SQL = """
WITH spend AS (
  SELECT n_name, o_custkey,
         SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
),
cum AS (
  SELECT n_name, cents,
         SUM(cents) OVER (PARTITION BY n_name
                          ORDER BY cents DESC, o_custkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS c,
         SUM(cents) OVER (PARTITION BY n_name) AS total
  FROM spend
),
classed AS (
  SELECT n_name, cents,
         CASE WHEN c * 100 <= total * 80 THEN 'A'
              WHEN c * 100 <= total * 95 THEN 'B'
              ELSE 'C' END AS abc
  FROM cum
)
SELECT n_name, abc,
       count(*) AS n_customers,
       CAST(SUM(cents) AS BIGINT) AS class_cents
FROM classed
GROUP BY 1, 2
ORDER BY n_name, abc
"""


# ---------------------------------------------------------------------------
# M54 — Zipf coverage curve of the corpus vocabulary: what share of all
# token occurrences do the top-ranked words carry, at vocab-relative
# cuts (rank 1 / 10% / 50% / 100%)? The BPE/vocab-budget sizing audit
# (a vocabulary budget is justified by where this curve flattens).
# Exact integers + one double division per row; rank ties break on the
# word itself.
# ---------------------------------------------------------------------------

def m54_zipf_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from novi_pdq_etl_project_prod_spark.operators.cumulative import (
        partitioned_cumulative,
    )

    docs = read_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(
            F.filter(F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda w: w != "")
        ).alias("w")
    )
    freq = words.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    # Distributed vocab ranking (VERDICT r06 item 2): two-pass bucketed
    # row_number + running occurrence total over (cnt desc, w) — the
    # m40 lesson (never a full-vocab single-partition window) without
    # giving up the exact full curve a TakeOrderedAndProject top-k would.
    ranked = partitioned_cumulative(
        freq,
        [],
        "cnt",
        sums={"cum": "cnt"},
        row_number_col="rank",
        descending=True,
        tiebreak=["w"],
    ).select("w", "cnt", F.col("rank").cast("int").alias("rank"), "cum")
    total = freq.agg(
        F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("vocab")
    )
    # Vocab-relative cut ranks (1, 10%, 50%, 100% — integer ceil) so the
    # curve is non-empty at any corpus scale: the driver's synthetic
    # documents hold only ~31 distinct words, where absolute cuts like
    # top-1000 select nothing.
    cuts = total.select(
        F.explode(
            F.array_distinct(
                F.array(
                    F.lit(1).cast("int"),
                    F.expr("CAST((vocab + 9) div 10 AS INT)"),
                    F.expr("CAST((vocab + 1) div 2 AS INT)"),
                    F.col("vocab").cast("int"),
                )
            )
        ).alias("rank")
    )
    curve = (
        ranked.join(F.broadcast(cuts), "rank")
        .crossJoin(F.broadcast(total))
        .select(
            "rank",
            F.col("cum").alias("cum_occurrences"),
            "total",
            "vocab",
            (F.col("cum").cast("double") / F.col("total").cast("double")).alias(
                "coverage"
            ),
        )
    )
    return curve.orderBy("rank")


M54_SQL = """
WITH words AS (
  SELECT w FROM (
    SELECT unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS w
    FROM documents
  ) WHERE w <> ''
),
freq AS (SELECT w, count(*) AS cnt FROM words GROUP BY w),
ranked AS (
  SELECT w, cnt,
         row_number() OVER (ORDER BY cnt DESC, w) AS rank,
         SUM(cnt) OVER (ORDER BY cnt DESC, w
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM freq
),
total AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS total,
         CAST(count(*) AS BIGINT) AS vocab
  FROM freq
),
cuts AS (
  SELECT DISTINCT CAST(unnest(ARRAY[
    1, (vocab + 9) // 10, (vocab + 1) // 2, vocab
  ]) AS INTEGER) AS rank
  FROM total
)
SELECT CAST(rank AS INTEGER) AS rank,
       CAST(cum AS BIGINT) AS cum_occurrences,
       total,
       vocab,
       CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) AS coverage
FROM ranked JOIN cuts USING (rank), total
ORDER BY rank
"""

QUERIES["d26_pareto_classes"] = d26_pareto_classes
ORACLES["d26_pareto_classes"] = D26_SQL
QUERIES["m54_zipf_coverage"] = m54_zipf_coverage
ORACLES["m54_zipf_coverage"] = M54_SQL


# ---------------------------------------------------------------------------
# A9 — association rules over order baskets: support / confidence / lift
# for the strongest part pairs (support ≥ 2 orders, top-20 by lift).
# All counts are exact integers; the three ratios are identical IEEE
# expressions on both engines, and the top-k ordering is fully
# deterministic (lift desc, then the pair itself), compiling to
# TakeOrderedAndProject, not a global sort.
# ---------------------------------------------------------------------------

def a9_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    n_orders = items.select("l_orderkey").distinct().agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    item_n = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_item"))
    other = items.select("l_orderkey", F.col("l_partkey").alias("p2"))
    pair_n = (
        items.join(other, "l_orderkey")
        .where(F.col("l_partkey") < F.col("p2"))
        .groupBy(F.col("l_partkey").alias("p1"), F.col("p2"))
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .where(F.col("n_pair") >= 2)
    )
    na = item_n.select(F.col("l_partkey").alias("p1"), F.col("n_item").alias("n_a"))
    nb = item_n.select(F.col("l_partkey").alias("p2"), F.col("n_item").alias("n_b"))
    joined = (
        pair_n.join(F.broadcast(na), "p1")
        .join(F.broadcast(nb), "p2")
        .crossJoin(F.broadcast(n_orders))
    )
    support = F.col("n_pair").cast("double") / F.col("n_orders").cast("double")
    confidence = F.col("n_pair").cast("double") / F.col("n_a").cast("double")
    lift = (
        F.col("n_pair").cast("double") * F.col("n_orders").cast("double")
    ) / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
    return (
        joined.select(
            "p1",
            "p2",
            "n_pair",
            "n_a",
            "n_b",
            support.alias("support"),
            confidence.alias("confidence"),
            lift.alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "p1", "p2")
        .limit(20)
    )


A9_SQL = """
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n_orders AS (
  SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM items
),
item_n AS (
  SELECT l_partkey, count(*) AS n_item FROM items GROUP BY 1
),
pair_n AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS n_pair
  FROM items a
  JOIN items b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= 2
)
SELECT p1, p2, n_pair,
       na.n_item AS n_a,
       nb.n_item AS n_b,
       CAST(n_pair AS DOUBLE) / CAST(n_orders AS DOUBLE) AS support,
       CAST(n_pair AS DOUBLE) / CAST(na.n_item AS DOUBLE) AS confidence,
       (CAST(n_pair AS DOUBLE) * CAST(n_orders AS DOUBLE))
         / (CAST(na.n_item AS DOUBLE) * CAST(nb.n_item AS DOUBLE)) AS lift
FROM pair_n
JOIN item_n na ON na.l_partkey = p1
JOIN item_n nb ON nb.l_partkey = p2
CROSS JOIN n_orders
ORDER BY lift DESC, p1, p2
LIMIT 20
"""

QUERIES["a9_association_rules"] = a9_association_rules
ORACLES["a9_association_rules"] = A9_SQL


# ---------------------------------------------------------------------------
# M55 — near-dup component size distribution: how many clusters of each
# size does the dedup graph hold (singletons excluded — nodes appear in
# the graph only if they have a near-dup pair)? The dedup health
# histogram: mass in big components means aggressive transitive merging
# (one wrong edge chains unrelated docs); all-pairs means conservative.
# Composes m43's iterative components; the oracle re-derives the same
# components with its recursive-CTE closure and histograms them.
# ---------------------------------------------------------------------------

def m55_component_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from novi_pdq_etl_project_prod_spark.operators.dedup import (
        near_dup_clusters,
        ngram_jaccard_pairs,
    )

    docs = read_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.5)
    comp = near_dup_clusters(pairs)
    return (
        comp.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("size"))
        .groupBy("size")
        .agg(
            F.count(F.lit(1)).alias("n_components"),
            (F.count(F.lit(1)) * F.col("size")).cast("long").alias("n_docs"),
        )
        .orderBy("size")
    )


_M43_CLOSURE = """
WITH RECURSIVE toks AS (
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
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT id_a, id_b
  FROM common
  JOIN sizes sa ON id_a = sa.doc_id
  JOIN sizes sb ON id_b = sb.doc_id
  WHERE CAST(n_common AS DOUBLE) / (sa.sz + sb.sz - n_common) >= 0.5
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM pairs
),
nodes AS (SELECT DISTINCT src AS id FROM edges),
reach(id, lbl) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.dst AS id, r.lbl FROM reach r JOIN edges e ON e.src = r.id
),
comp AS (SELECT id, MIN(lbl) AS cluster_id FROM reach GROUP BY id)
"""

M55_SQL = (
    _M43_CLOSURE
    + """
SELECT size,
       count(*) AS n_components,
       CAST(count(*) * size AS BIGINT) AS n_docs
FROM (SELECT cluster_id, count(*) AS size FROM comp GROUP BY 1)
GROUP BY size
ORDER BY size
"""
)

QUERIES["m55_component_size_histogram"] = m55_component_size_histogram
ORACLES["m55_component_size_histogram"] = M55_SQL


# ---------------------------------------------------------------------------
# M56 — Neyman (minimum-variance) sampling allocation across strata:
# n_h ∝ N_h·σ_h. The statistically-optimal counterpart to m49's
# token-budget mixture planner — when the goal is estimating a corpus
# statistic, variance, not volume, should set the per-stratum budget.
# σ_h comes from exact DECIMAL moment sums (the d16 pattern), weights
# are floored to integer micro-units before summing so the share
# denominators are exact integers, and every double step (int→double
# conversion, division, sqrt, floor) is IEEE-correctly-rounded and
# therefore identical cross-engine.
# ---------------------------------------------------------------------------

_NEYMAN_BUDGET = 10_000


def m56_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = read_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("decimal(38,0)")
    mom = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(cents).alias("__s1"),
        F.sum(cents * cents).alias("__s2"),
    )
    n = F.col("n_rows").cast("double")
    s1 = F.col("__s1").cast("double")
    s2 = F.col("__s2").cast("double")
    sigma = F.sqrt((n * s2 - s1 * s1) / (n * (n - 1)))
    weighted = mom.select(
        "l_returnflag",
        "l_linestatus",
        "n_rows",
        sigma.alias("sigma_cents"),
        F.floor(n * sigma * F.lit(1e6)).cast("long").alias("w_micro"),
    )
    # total weight accumulates in DECIMAL(38,0): w_micro ≈ n·σ·1e6 per
    # stratum reaches ~4.5e18 at 10× lineitem, so a BIGINT sum across
    # strata wraps (caught by the r08 full-catalog 10× sweep). The
    # decimal→double cast is correctly rounded, matching the oracle's
    # HUGEINT→DOUBLE.
    total = F.sum(F.col("w_micro").cast("decimal(38,0)")).over(
        Window.partitionBy()
    )
    share = F.col("w_micro").cast("double") / F.col("__tw").cast("double")
    return (
        weighted.withColumn("__tw", total)
        .select(
            "l_returnflag",
            "l_linestatus",
            "n_rows",
            "sigma_cents",
            "w_micro",
            share.alias("alloc_share"),
            F.floor(share * F.lit(float(_NEYMAN_BUDGET)))
            .cast("long")
            .alias("alloc_n"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


M56_SQL = f"""
WITH mom AS (
  SELECT l_returnflag, l_linestatus,
         count(*) AS n_rows,
         SUM(CAST(round(l_extendedprice * 100, 0) AS HUGEINT)) AS s1,
         SUM(CAST(round(l_extendedprice * 100, 0) AS HUGEINT)
             * CAST(round(l_extendedprice * 100, 0) AS HUGEINT)) AS s2
  FROM lineitem GROUP BY 1, 2
),
sig AS (
  SELECT l_returnflag, l_linestatus, n_rows,
         sqrt((CAST(n_rows AS DOUBLE) * CAST(s2 AS DOUBLE)
               - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
              / (CAST(n_rows AS DOUBLE) * CAST(n_rows - 1 AS DOUBLE)))
           AS sigma_cents
  FROM mom
),
wt AS (
  SELECT *,
         CAST(floor(CAST(n_rows AS DOUBLE) * sigma_cents * 1e6) AS BIGINT)
           AS w_micro
  FROM sig
),
tot AS (SELECT SUM(CAST(w_micro AS HUGEINT)) AS tw FROM wt)
SELECT l_returnflag, l_linestatus, n_rows, sigma_cents, w_micro,
       CAST(w_micro AS DOUBLE) / CAST(tw AS DOUBLE) AS alloc_share,
       CAST(floor(CAST(w_micro AS DOUBLE) / CAST(tw AS DOUBLE)
                  * {float(_NEYMAN_BUDGET)!r}) AS BIGINT) AS alloc_n
FROM wt, tot
ORDER BY l_returnflag, l_linestatus
"""

QUERIES["m56_neyman_allocation"] = m56_neyman_allocation
ORACLES["m56_neyman_allocation"] = M56_SQL


# ---------------------------------------------------------------------------
# D27 — exact two-sample Kolmogorov–Smirnov statistic between the price
# distributions of two populations: D = max |F_A(x) - F_B(x)| over the
# merged support. Complements dq8's binned χ² with the unbinned exact
# test. Shape: (value, side-counts) grain — one hash-agg — then a
# RANGE-frame cumulative per side over distinct values and a 1-row max.
# Every number is an integer count or a correctly-rounded double ratio,
# so the statistic certifies bit-for-bit.
#
# Scale stance (reworked, VERDICT r06 item 2): the cumulative is the
# RANGE-partitioned two-pass (operators/cumulative.py) — no task ever
# sorts the whole merged support, so the exact statistic stays
# distributed even for near-unique measures; the totals ride a 1-row
# broadcast, not an unpartitioned window. At whole-corpus 100 TB scale
# dq8's binned chi-square remains the cheap continuous gate; this is
# the exact test you can now afford on full columns, not just slices.
# ---------------------------------------------------------------------------

def d27_ks_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from novi_pdq_etl_project_prod_spark.operators.cumulative import (
        partitioned_cumulative,
    )

    li = read_table(spark, sf_dir, "lineitem")
    per_value = (
        li.where(F.col("l_returnflag").isin("A", "R"))
        .groupBy(F.col("l_extendedprice").cast("double").alias("v"))
        .agg(
            F.sum(F.when(F.col("l_returnflag") == "A", 1).otherwise(0))
            .cast("long")
            .alias("ca"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("long")
            .alias("cr"),
        )
    )
    totals = per_value.agg(
        F.sum("ca").alias("n_a"), F.sum("cr").alias("n_r")
    )
    cum = partitioned_cumulative(
        per_value, [], "v", sums={"cum_a": "ca", "cum_r": "cr"}
    ).crossJoin(F.broadcast(totals))
    gap = F.abs(
        F.col("cum_a").cast("double") / F.col("n_a").cast("double")
        - F.col("cum_r").cast("double") / F.col("n_r").cast("double")
    )
    return cum.agg(
        F.max("n_a").alias("n_a"),
        F.max("n_r").alias("n_r"),
        F.max(gap).alias("ks_d"),
    )


D27_SQL = """
WITH per_value AS (
  SELECT CAST(l_extendedprice AS DOUBLE) AS v,
         CAST(count(*) FILTER (WHERE l_returnflag = 'A') AS BIGINT) AS ca,
         CAST(count(*) FILTER (WHERE l_returnflag = 'R') AS BIGINT) AS cr
  FROM lineitem
  WHERE l_returnflag IN ('A', 'R')
  GROUP BY 1
),
cum AS (
  SELECT
    SUM(ca) OVER (ORDER BY v RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS cum_a,
    SUM(cr) OVER (ORDER BY v RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS cum_r,
    SUM(ca) OVER () AS n_a,
    SUM(cr) OVER () AS n_r
  FROM per_value
)
SELECT CAST(MAX(n_a) AS BIGINT) AS n_a,
       CAST(MAX(n_r) AS BIGINT) AS n_r,
       MAX(abs(CAST(cum_a AS DOUBLE) / CAST(n_a AS DOUBLE)
               - CAST(cum_r AS DOUBLE) / CAST(n_r AS DOUBLE))) AS ks_d
FROM cum
"""

QUERIES["d27_ks_statistic"] = d27_ks_statistic
ORACLES["d27_ks_statistic"] = D27_SQL


# ---------------------------------------------------------------------------
# D28 — Mann–Whitney U (rank-sum) between the same two populations as
# d27, with exact tie handling: doubled average ranks (2·avg = 2C−m+1,
# C the cumulative count through the tied value group, m its size) keep
# every rank quantity an integer, and the tie-corrected normal
# approximation's variance uses exact Σ(m³−m). Doubles appear only in
# the final z (correctly-rounded ops incl. sqrt), so the statistic
# certifies bit-for-bit. Same exact-audit scale stance as d27.
# ---------------------------------------------------------------------------

def d28_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    from novi_pdq_etl_project_prod_spark.operators.stats import mann_whitney

    li = read_table(spark, sf_dir, "lineitem")
    return mann_whitney(li, "l_returnflag", "A", "R", "l_extendedprice")


D28_SQL = """
WITH per_value AS (
  SELECT CAST(l_extendedprice AS DOUBLE) AS v,
         CAST(count(*) FILTER (WHERE l_returnflag = 'A') AS BIGINT) AS ca,
         CAST(count(*) FILTER (WHERE l_returnflag = 'R') AS BIGINT) AS cr
  FROM lineitem
  WHERE l_returnflag IN ('A', 'R')
  GROUP BY 1
),
cum AS (
  SELECT ca, cr, ca + cr AS m,
         SUM(ca + cr) OVER (ORDER BY v
                            RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS C
  FROM per_value
),
agg AS (
  SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
         CAST(SUM(cr) AS BIGINT) AS n_r,
         CAST(SUM(ca * (2 * C - m + 1)) AS BIGINT) AS r2a,
         CAST(SUM(m * m * m - m) AS BIGINT) AS tie_mass
  FROM cum
)
SELECT n_a, n_r,
       CAST(r2a - n_a * (n_a + 1) AS DOUBLE) / 2.0 AS u_a,
       CAST((r2a - n_a * (n_a + 1)) - n_a * n_r AS DOUBLE)
         / (2.0 * sqrt(CAST(n_a AS DOUBLE) * CAST(n_r AS DOUBLE) / 12.0
                       * (CAST(n_a + n_r + 1 AS DOUBLE)
                          - CAST(tie_mass AS DOUBLE)
                            / (CAST(n_a + n_r AS DOUBLE)
                               * CAST(n_a + n_r - 1 AS DOUBLE)))))
         AS z_score
FROM agg
"""

QUERIES["d28_mann_whitney"] = d28_mann_whitney
ORACLES["d28_mann_whitney"] = D28_SQL


# ---------------------------------------------------------------------------
# D29 — exact Spearman rank correlation (quantity vs price per return
# flag): Pearson over doubled-integer average ranks with DECIMAL(38,0)
# moments; doubles only in the final correctly-rounded expression. The
# robust association measure beside d9's exact Pearson.
# ---------------------------------------------------------------------------

def d29_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    from novi_pdq_etl_project_prod_spark.operators.stats import (
        spearman_correlation,
    )

    li = read_table(spark, sf_dir, "lineitem")
    return spearman_correlation(
        li, ["l_returnflag"], "l_quantity", "l_extendedprice"
    ).orderBy("l_returnflag")


D29_SQL = """
WITH rx AS (
  SELECT l_returnflag, CAST(l_quantity AS DOUBLE) AS vx,
         2 * SUM(count(*)) OVER (PARTITION BY l_returnflag
                                 ORDER BY CAST(l_quantity AS DOUBLE)
                                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - count(*) + 1 AS r2x
  FROM lineitem GROUP BY 1, 2
),
ry AS (
  SELECT l_returnflag, CAST(l_extendedprice AS DOUBLE) AS vy,
         2 * SUM(count(*)) OVER (PARTITION BY l_returnflag
                                 ORDER BY CAST(l_extendedprice AS DOUBLE)
                                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - count(*) + 1 AS r2y
  FROM lineitem GROUP BY 1, 2
),
ranked AS (
  SELECT l.l_returnflag, r2x, r2y
  FROM lineitem l
  JOIN rx ON rx.l_returnflag = l.l_returnflag
         AND rx.vx = CAST(l.l_quantity AS DOUBLE)
  JOIN ry ON ry.l_returnflag = l.l_returnflag
         AND ry.vy = CAST(l.l_extendedprice AS DOUBLE)
),
agg AS (
  SELECT l_returnflag,
         count(*) AS n_rows,
         SUM(CAST(r2x AS HUGEINT)) AS sx,
         SUM(CAST(r2y AS HUGEINT)) AS sy,
         SUM(CAST(r2x AS HUGEINT) * CAST(r2y AS HUGEINT)) AS sxy,
         SUM(CAST(r2x AS HUGEINT) * CAST(r2x AS HUGEINT)) AS sxx,
         SUM(CAST(r2y AS HUGEINT) * CAST(r2y AS HUGEINT)) AS syy
  FROM ranked GROUP BY 1
)
SELECT l_returnflag, n_rows,
       CASE WHEN sqrt((CAST(n_rows AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                      * (CAST(n_rows AS DOUBLE) * CAST(syy AS DOUBLE)
                         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) > 0
            THEN (CAST(n_rows AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / sqrt((CAST(n_rows AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * (CAST(n_rows AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
       END AS spearman_rho
FROM agg
ORDER BY l_returnflag
"""

QUERIES["d29_spearman"] = d29_spearman
ORACLES["d29_spearman"] = D29_SQL
