"""JDBC source/sink (SURVEY.md §2.1 S3, S6): the reference's Postgres
read/write surface, kept for interop — the engine's native storage is
the parquet medallion (``sources.layers``), but a user migrating from
the reference may still need to read/write their warehouse.

Key differences from the reference's usage, on purpose:

- **Partitioned reads.** The reference reads every JDBC source through a
  single partition (no ``partitionColumn`` anywhere — SURVEY.md §6), so
  one task pulls the whole table. ``read_jdbc_table`` requires explicit
  partitioning bounds for anything non-trivial.
- **Pushdown subquery** stays supported (``dbtable=(SELECT ...) x`` —
  reference ``spark_jobs/transform_operator.py:41-52``) but filters
  pushed via ``.where`` reach the database automatically
  (``pushDownPredicate`` defaults true); the subquery trick is only
  needed for expressions Spark won't push.
- **No DELETE side-channel.** The reference shells out to psycopg2 for
  month deletes because "Spark JDBC doesn't support deletes"; on the
  medallion layout that operation is partition overwrite instead. For
  genuine JDBC idempotency, stage to a temp table and swap server-side.

These functions build Spark's standard JDBC reader/writer options; they
are exercised in tests only up to option construction (no database
server ships in this environment).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, DataFrameReader, SparkSession


def jdbc_reader(
    spark: SparkSession,
    url: str,
    table_or_query: str,
    user: str,
    password: str,
    driver: str = "org.postgresql.Driver",
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetch_size: int = 10_000,
) -> DataFrameReader:
    """Configure (but do not run) a JDBC read. ``table_or_query`` may be a
    table name or a parenthesized pushdown subquery aliased like
    ``(SELECT ... WHERE yyyymm = 202401) x``."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table_or_query)
        .option("user", user)
        .option("password", password)
        .option("driver", driver)
        .option("fetchsize", str(fetch_size))
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError(
                "partitioned JDBC read needs lower_bound, upper_bound and "
                "num_partitions alongside partition_column"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader


def read_jdbc_table(spark: SparkSession, url: str, table: str, **kw) -> DataFrame:
    return jdbc_reader(spark, url, table, **kw).load()


def month_slice_query(
    table: str, yyyymm: int, columns: str = "*", month_column: str = "yyyymm"
) -> str:
    """The reference's pushdown-subquery idiom (S3) as a helper:
    ``(SELECT <cols> FROM <table> WHERE yyyymm = <y>) src``.

    ``month_column`` is emitted verbatim so callers can quote it for
    case-sensitive dialects (Spark's JDBC writer quotes identifiers at
    CREATE time, so e.g. Derby needs ``'"yyyymm"'``)."""
    return (
        f"(SELECT {columns} FROM {table} "
        f"WHERE {month_column} = {int(yyyymm)}) src"
    )


def write_jdbc_append(
    df: DataFrame,
    url: str,
    table: str,
    user: str,
    password: str,
    driver: str = "org.postgresql.Driver",
    batch_size: int = 10_000,
) -> None:
    """S6 — append write with JDBC batch inserts. Executor-parallel: each
    partition opens one connection; repartition the DataFrame to control
    connection count against the database."""
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("user", user)
        .option("password", password)
        .option("driver", driver)
        .option("batchsize", str(batch_size))
        .mode("append")
        .save()
    )
