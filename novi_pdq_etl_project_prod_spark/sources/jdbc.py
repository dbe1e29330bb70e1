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

These functions build Spark's standard JDBC reader/writer options; the
full read/write path runs live in ``tests/test_jdbc_roundtrip.py``
against embedded Apache Derby (bundled with the Spark distribution), so
append, read-back, pushdown subqueries, partitioned reads, and the
idempotent month load below are all executed, not just constructed.
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


def execute_jdbc_statement(
    spark: SparkSession,
    url: str,
    sql: str,
    user: str | None = None,
    password: str | None = None,
    driver: str | None = None,
) -> None:
    """Driver-side DDL/DML through the JVM's DriverManager — the
    reference's psycopg2 side-channel (``dags/pdq_etl_dag.py:183-187``
    month deletes) without leaving the JVM. One short-lived connection;
    use only for metadata-sized statements (deletes by key, DDL), never
    to move data. Credentials go through ``java.util.Properties`` so the
    statement authenticates exactly like the DataFrame reader/writer.

    ``driver`` (a JDBC driver class name) forces registration before the
    ``getConnection`` call: DriverManager's ServiceLoader auto-discovery
    can miss jars added via ``spark.jars`` (they land in a child
    classloader), while an explicit ``Class.forName`` through the
    context classloader — the same thing Spark's own JDBC relation does
    — always finds them."""
    if driver:
        loader = (
            spark._jvm.java.lang.Thread.currentThread().getContextClassLoader()
        )
        spark._jvm.java.lang.Class.forName(driver, True, loader)
    props = spark._jvm.java.util.Properties()
    if user is not None:
        props.setProperty("user", user)
    if password is not None:
        props.setProperty("password", password)
    conn = spark._jvm.java.sql.DriverManager.getConnection(url, props)
    try:
        stmt = conn.createStatement()
        try:
            stmt.execute(sql)
        finally:
            stmt.close()
    finally:
        conn.close()


#: SQLStates that mean "this table does not exist" — Derby (42X05),
#: Postgres (42P01), MySQL/SQLServer (42S02), older ODBC-style (S0002).
#: Everything else (auth = class 28, connection = class 08, syntax, ...)
#: must propagate: treating an auth failure as "table missing" would skip
#: the idempotent delete and silently duplicate rows on replay.
_TABLE_MISSING_SQLSTATES = frozenset({"42X05", "42P01", "42S02", "S0002"})


def _is_table_missing(
    exc: BaseException, extra_sqlstates: frozenset[str] | set[str] = frozenset()
) -> bool:
    """True iff the JDBC exception chain carries a table-not-found
    SQLState. Walks ``getCause()`` because drivers wrap the interesting
    SQLException (Derby nests EmbedSQLException under a generic one) AND
    ``getNextException()`` because some drivers (Postgres batch paths)
    chain the informative SQLException laterally instead of as a cause."""
    states = _TABLE_MISSING_SQLSTATES | set(extra_sqlstates)
    seen: list = []
    queue = [getattr(exc, "java_exception", None)]
    while queue and len(seen) < 16:
        je = queue.pop(0)
        if je is None or any(je.equals(s) for s in seen):
            continue
        seen.append(je)
        try:
            state = je.getSQLState()
        except Exception:
            state = None
        if state is not None and str(state) in states:
            return True
        for link in ("getCause", "getNextException"):
            try:
                queue.append(getattr(je, link)())
            except Exception:
                pass
    return False


def write_jdbc_month_idempotent(
    df: DataFrame,
    url: str,
    table: str,
    user: str,
    password: str,
    driver: str = "org.postgresql.Driver",
    month_column: str = "yyyymm",
    batch_size: int = 10_000,
    extra_table_missing_sqlstates: frozenset[str] | set[str] = frozenset(),
) -> None:
    """S7 over JDBC: delete-month-then-append, the reference's idempotent
    month load (`transform_lease.py` delete_month + append) as one call.

    First-load detection recognizes table-not-found SQLStates for Derby,
    Postgres, MySQL and SQLServer out of the box; other dialects that use
    different codes (Oracle 42000, DB2 42704) pass theirs via
    ``extra_table_missing_sqlstates``. An unrecognized state fails loudly
    rather than risking a skipped delete.

    The months present in ``df`` are collected driver-side (bounded: one
    value per month, never data-sized), each deleted via
    :func:`execute_jdbc_statement`, then the frame is appended. Re-running
    with the same input rewrites identical rows — safe for retries and
    for streaming foreachBatch replays. Quoting matches what Spark's
    JDBC writer creates: the table name passes through UNQUOTED (the
    database canonicalizes it), while column names are dialect-quoted
    and stay case-sensitive."""
    months = [r[0] for r in df.select(month_column).distinct().collect()]
    spark = df.sparkSession
    creds = {"user": user, "password": password, "driver": driver}
    try:  # first load: the table only exists after the first append
        execute_jdbc_statement(
            spark, url, f"SELECT 1 FROM {table} WHERE 1=0", **creds
        )
        exists = True
    except Exception as exc:
        # Only a table-not-found SQLState means "first load". Auth or
        # connection failures re-raise — swallowing them would skip the
        # delete and duplicate rows when the append then succeeds/retries.
        if not _is_table_missing(exc, extra_table_missing_sqlstates):
            raise
        exists = False
    if exists:
        for m in months:
            execute_jdbc_statement(
                spark,
                url,
                f'DELETE FROM {table} WHERE "{month_column}" = {int(m)}',
                **creds,
            )
    write_jdbc_append(
        df, url, table, user=user, password=password, driver=driver,
        batch_size=batch_size,
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
