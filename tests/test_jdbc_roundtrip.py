"""Live JDBC round-trip for the S6 sink / S3 source (VERDICT r01 item 3).

No database server ships in this environment, but Spark's own
distribution bundles Apache Derby (derby*.jar on the default classpath),
so the embedded in-process database exercises the exact same JDBC code
path the reference uses against Postgres (spark_jobs/
transform_lease.py:140-151 append; transform_operator.py:41-52 pushdown
subquery) — real DriverManager connection, real batch INSERTs, real
ResultSet reads.
"""

from __future__ import annotations

import pytest

from novi_pdq_etl_project_prod_spark.sources.jdbc import (
    jdbc_reader,
    month_slice_query,
    write_jdbc_append,
)

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _seed_df(spark):
    return spark.range(100).selectExpr(
        "id AS k",
        "CAST(id % 12 + 202401 AS INT) AS yyyymm",
        "CAST(id * 1.5 AS DOUBLE) AS measure",
    )


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    home = tmp_path_factory.mktemp("derby_home")
    # derby.log and the database directory both live under the tmp home
    spark._jvm.System.setProperty("derby.system.home", str(home))
    url = f"jdbc:derby:{home}/smokedb;create=true"
    try:  # skip (don't fail) if the bundled Derby jars ever disappear
        spark._jvm.java.sql.DriverManager.getConnection(url).close()
    except Exception as exc:  # pragma: no cover
        pytest.skip(f"embedded Derby unavailable: {exc}")
    # seed the shared read-side table so every test is order-independent
    write_jdbc_append(
        _seed_df(spark), url, "fact_smoke", user="app", password="app",
        driver=DERBY_DRIVER,
    )
    return url


def test_jdbc_append_and_read_back(spark, derby_url):
    df = _seed_df(spark)
    write_jdbc_append(
        df, derby_url, "fact_append", user="app", password="app",
        driver=DERBY_DRIVER,
    )
    back = (
        jdbc_reader(spark, derby_url, "fact_append", "app", "app", DERBY_DRIVER)
        .load()
    )
    assert back.count() == 100
    assert {r.k for r in back.collect()} == set(range(100))

    # append is append: a second write doubles the rows (the reference's
    # idempotency comes from delete-month-first, which on JDBC is the
    # server-side swap documented in sources/jdbc.py)
    write_jdbc_append(
        df, derby_url, "fact_append", user="app", password="app",
        driver=DERBY_DRIVER,
    )
    assert (
        jdbc_reader(spark, derby_url, "fact_append", "app", "app", DERBY_DRIVER)
        .load()
        .count()
        == 200
    )


def test_jdbc_month_slice_pushdown_subquery(spark, derby_url):
    # Spark's JDBC writer creates quoted (case-sensitive) identifiers, so
    # the Derby-side subquery must quote them too
    q = month_slice_query(
        "fact_smoke", 202403, columns='"k", "yyyymm"', month_column='"yyyymm"'
    )
    sliced = (
        jdbc_reader(spark, derby_url, q, "app", "app", DERBY_DRIVER).load()
    )
    rows = sliced.collect()
    assert rows and all(r.yyyymm == 202403 for r in rows)
    assert set(sliced.columns) == {"k", "yyyymm"}


def test_jdbc_partitioned_read(spark, derby_url):
    back = jdbc_reader(
        spark,
        derby_url,
        "fact_smoke",
        "app",
        "app",
        DERBY_DRIVER,
        partition_column="k",
        lower_bound=0,
        upper_bound=100,
        num_partitions=4,
    ).load()
    # 4 concurrent embedded connections, one per partition
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 100


def test_jdbc_month_idempotent_rerun(spark, derby_url):
    from novi_pdq_etl_project_prod_spark.sources.jdbc import (
        read_jdbc_table,
        write_jdbc_month_idempotent,
    )

    df = _seed_df(spark).where("yyyymm IN (202401, 202402)")
    for _ in range(3):  # re-running must never duplicate a month
        write_jdbc_month_idempotent(
            df, derby_url, "fact_idem", user="app", password="app",
            driver=DERBY_DRIVER,
        )
    back = read_jdbc_table(
        spark, derby_url, "fact_idem", user="app", password="app",
        driver=DERBY_DRIVER,
    )
    assert back.count() == df.count()
    assert back.exceptAll(df).count() == 0


def test_stream_to_jdbc_exactly_once_across_restarts(spark, derby_url, tmp_path):
    import pyspark.sql.functions as F

    from novi_pdq_etl_project_prod_spark.session import read_events
    from novi_pdq_etl_project_prod_spark.sources.jdbc import read_jdbc_table
    from novi_pdq_etl_project_prod_spark.streaming.events import (
        read_event_stream,
        stream_to_jdbc_monthly,
    )

    src = str(tmp_path / "incoming")
    ev = read_events(spark, "/root/testdata/sf0.001")
    ev.where("event_id % 2 = 0").coalesce(1).write.mode("append").parquet(src)

    chk = str(tmp_path / "chk")
    kw = dict(user="app", password="app", driver=DERBY_DRIVER)
    stream_to_jdbc_monthly(
        read_event_stream(spark, src), derby_url, "ev_rollup",
        checkpoint_dir=chk, **kw,
    )
    ev.where("event_id % 2 = 1").coalesce(1).write.mode("append").parquet(src)
    stream_to_jdbc_monthly(  # restart on the same checkpoint
        read_event_stream(spark, src), derby_url, "ev_rollup",
        checkpoint_dir=chk, **kw,
    )

    got = read_jdbc_table(spark, derby_url, "ev_rollup", **kw)
    want = (
        ev.groupBy(
            (F.year("ts") * 100 + F.month("ts")).alias("yyyymm"),
            F.col("user_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
    )
    assert got.count() == want.count()
    assert got.agg(F.sum("n_events")).collect()[0][0] == ev.count()
    assert got.selectExpr("CAST(yyyymm AS INT) yyyymm", "user_id", "n_events", "sum_value").exceptAll(want).count() == 0
