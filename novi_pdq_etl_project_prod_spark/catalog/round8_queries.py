"""Round-8 catalog additions.

G3 — declarative MERGE (VERDICT r07 item 5): the Delta-parity
``merge_frames`` entry point (one call covering when-matched-update /
when-matched-delete / when-not-matched-insert, NOT-MATCHED-BY-SOURCE
pass-through) exercised over the fixture star schema and oracled against
an equivalent DuckDB update/delete/insert CTE. The snapshot-committed
variant (``operators.modeling.merge_into`` — CAS pointer + optimistic
retry) is pinned by concurrent-writer pytests in
``tests/test_modeling_advanced.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from novi_pdq_etl_project_prod_spark.session import read_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# G3 — MERGE INTO customer: update matched balances from order spend,
# delete heavy customers (n_orders > 25), insert synthetic new customers
# derived from nation — every branch of the MERGE grammar in one query.
# Measures stay exact integers (cents), so the result hashes bit-for-bit.
# ---------------------------------------------------------------------------


def g3_merge_into(spark: SparkSession, sf_dir: str) -> DataFrame:
    from novi_pdq_etl_project_prod_spark.operators.modeling import merge_frames

    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")

    target = cust.select(
        "c_custkey",
        "c_name",
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("c_acctbal_cents"),
        "c_nationkey",
    )
    spend = orders.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
            "spend_cents"
        ),
    )
    new_rows = nation.select(
        (F.col("n_nationkey").cast("long") + F.lit(1_000_000)).alias("c_custkey"),
        F.lit(1).cast("long").alias("n_orders"),
        (F.col("n_nationkey").cast("long") * 1000).alias("spend_cents"),
    )
    source = spend.unionByName(new_rows)

    return merge_frames(
        target,
        source,
        on=("c_custkey",),
        when_matched_delete="s.n_orders > 25",
        when_matched_update={
            "c_acctbal_cents": "t.c_acctbal_cents + s.spend_cents",
            "c_name": "concat(t.c_name, ':U')",
        },
        when_not_matched_insert={
            "c_custkey": "s.c_custkey",
            "c_name": "concat('new:', CAST(s.c_custkey AS STRING))",
            "c_acctbal_cents": "s.spend_cents",
            "c_nationkey": "CAST(0 AS INT)",
        },
    ).orderBy("c_custkey")


G3_SQL = """
WITH tgt AS (
  SELECT c_custkey, c_name,
         CAST(round(c_acctbal * 100, 0) AS BIGINT) AS c_acctbal_cents,
         c_nationkey
  FROM customer
),
src AS (
  SELECT o_custkey AS c_custkey,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS spend_cents
  FROM orders GROUP BY 1
  UNION ALL
  SELECT CAST(n_nationkey AS BIGINT) + 1000000,
         CAST(1 AS BIGINT),
         CAST(n_nationkey AS BIGINT) * 1000
  FROM nation
)
SELECT t.c_custkey,
       t.c_name || ':U' AS c_name,
       t.c_acctbal_cents + s.spend_cents AS c_acctbal_cents,
       t.c_nationkey
FROM tgt t JOIN src s USING (c_custkey)
WHERE s.n_orders <= 25
UNION ALL
SELECT t.c_custkey, t.c_name, t.c_acctbal_cents, t.c_nationkey
FROM tgt t
WHERE NOT EXISTS (SELECT 1 FROM src s WHERE s.c_custkey = t.c_custkey)
UNION ALL
SELECT s.c_custkey,
       'new:' || CAST(s.c_custkey AS VARCHAR) AS c_name,
       s.spend_cents AS c_acctbal_cents,
       CAST(0 AS INT) AS c_nationkey
FROM src s
WHERE NOT EXISTS (SELECT 1 FROM tgt t WHERE t.c_custkey = s.c_custkey)
ORDER BY c_custkey
"""


# ---------------------------------------------------------------------------
# DQ11 — declarative expectations report: per-rule violation counts over
# a deterministically dirtied lineitem (clean fixture rows are planted
# with violations keyed on l_orderkey residues so every rule fires).
# One row-local tagging pass + one map-side aggregate, rules evaluated
# keep-when-TRUE with NULL counting as violation (the DLT convention).
# ---------------------------------------------------------------------------

#: Expectation rules shared between the Spark query and the DuckDB twin.
DQ11_RULES = {
    "non_negative_qty": "l_quantity >= 0",
    "price_positive": "l_extendedprice > 0",
    "valid_returnflag": "l_returnflag IN ('A', 'N', 'R')",
    "discount_range": "l_discount BETWEEN 0 AND 0.5",
    "shipdate_present": "l_shipdate IS NOT NULL",
}


def dq11_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from novi_pdq_etl_project_prod_spark.operators.expectations import (
        expectation_report,
    )

    li = _t(spark, sf_dir, "lineitem")
    dirty = li.select(
        F.when(F.col("l_orderkey") % 97 == 0, F.lit(-1.0))
        .otherwise(F.col("l_quantity"))
        .alias("l_quantity"),
        F.when(F.col("l_orderkey") % 101 == 0, F.lit(0.0))
        .otherwise(F.col("l_extendedprice"))
        .alias("l_extendedprice"),
        F.when(F.col("l_orderkey") % 103 == 0, F.lit("X"))
        .otherwise(F.col("l_returnflag"))
        .alias("l_returnflag"),
        F.when(F.col("l_orderkey") % 107 == 0, F.lit(None).cast("double"))
        .otherwise(F.col("l_discount"))
        .alias("l_discount"),
        F.when(
            F.col("l_orderkey") % 109 == 0,
            F.lit(None).cast("timestamp_ntz"),
        )
        .otherwise(F.col("l_shipdate"))
        .alias("l_shipdate"),
        "l_orderkey",
    )
    return expectation_report(dirty, DQ11_RULES)


_DQ11_VIOLATIONS = {
    name: f"NOT coalesce({expr}, FALSE)" for name, expr in DQ11_RULES.items()
}
_DQ11_COUNT_COLS = ",\n         ".join(
    f"SUM(CASE WHEN {v} THEN 1 ELSE 0 END) AS {name}"
    for name, v in _DQ11_VIOLATIONS.items()
)
_DQ11_ANY = " OR ".join(f"({v})" for v in _DQ11_VIOLATIONS.values())
_DQ11_ROWS = "\n  UNION ALL\n".join(
    f"  SELECT '{name}' AS rule, {name} AS n_violations, n_rows FROM agg"
    for name in DQ11_RULES
)

DQ11_SQL = f"""
WITH dirty AS (
  SELECT CASE WHEN l_orderkey % 97 = 0 THEN -1.0 ELSE l_quantity END
           AS l_quantity,
         CASE WHEN l_orderkey % 101 = 0 THEN 0.0 ELSE l_extendedprice END
           AS l_extendedprice,
         CASE WHEN l_orderkey % 103 = 0 THEN 'X' ELSE l_returnflag END
           AS l_returnflag,
         CASE WHEN l_orderkey % 107 = 0 THEN NULL ELSE l_discount END
           AS l_discount,
         CASE WHEN l_orderkey % 109 = 0 THEN NULL ELSE l_shipdate END
           AS l_shipdate
  FROM lineitem
),
agg AS (
  SELECT {_DQ11_COUNT_COLS},
         SUM(CASE WHEN {_DQ11_ANY} THEN 1 ELSE 0 END)
           AS _total_rows_failing,
         count(*) AS n_rows
  FROM dirty
)
SELECT rule,
       CAST(n_violations AS BIGINT) AS n_violations,
       CAST(n_rows AS BIGINT) AS n_rows,
       CAST(n_violations AS DOUBLE) / CAST(n_rows AS DOUBLE)
         AS violation_rate
FROM (
{_DQ11_ROWS}
  UNION ALL
  SELECT '_total_rows_failing', _total_rows_failing, n_rows FROM agg
)
ORDER BY rule
"""


QUERIES = {
    "g3_merge_into": g3_merge_into,
    "dq11_expectations": dq11_expectations,
}

ORACLES = {
    "g3_merge_into": G3_SQL,
    "dq11_expectations": DQ11_SQL,
}
