"""SparkSession factory with scale-honest defaults.

The reference launches Spark via ``spark-submit --master local[*]`` with stock
configs (reference ``dags/pdq_etl_dag.py:37-40``). This engine centralizes
session construction and turns on the configs that matter at 100 TB:

- AQE (runtime re-plan, partition coalescing, skew-join splitting). The
  reference manufactures skew with its ``operator_no = 0`` sentinel
  (reference ``spark_jobs/transform_operator.py:89``); AQE's skew-join
  handling is the first line of defense, salting (operators.dedup) the second.
- Dynamic partition overwrite: the reference's psycopg2 ``DELETE FROM t WHERE
  yyyymm = %s`` + append idempotency dance (reference
  ``spark_jobs/transform_operator.py:16-31``) becomes a single declarative
  ``mode("overwrite").partitionBy("yyyymm")`` write.
- Arrow for any pandas interchange (vectorized batches, not pickled rows).
- UTC session timezone so time extraction is deterministic across engines.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "novi_pdq_etl_project_prod_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    On a real cluster ``master`` comes from the environment / spark-submit;
    locally we default to ``local[$SPARK_GRAFT_CPUS]``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        # fixture-scale parallelism: single small parquet files would give
        # 1-partition scans (whole query on one core). 8 MB split size
        # spreads even sf0.1 files across the local cores; on a real
        # cluster with TB-scale inputs, raise back toward the 128 MB
        # default via SPARK_GRAFT_MAX_PARTITION_BYTES.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "8m"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def read_events(spark: SparkSession, sf_dir: str):
    """Read the ``events`` fixture, normalizing ``ts`` to TimestampType.

    The fixture's ``ts`` encoding has varied across driver testdata
    generations: INT64 TIMESTAMP(NANOS) (Spark rejects it by default; the
    legacy conf maps it to long nanos) and plain TIMESTAMP(MICROS) with
    isAdjustedToUTC=false (Spark reads TIMESTAMP_NTZ). Adapt to whatever is
    on disk and always hand back a session-tz (UTC) TimestampType column so
    every downstream query sees one stable schema.
    """
    import os as _os

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(_os.path.join(sf_dir, "events.parquet"))
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        # integer division: epoch-nanos (~1.7e18) exceed double's 2^53
        # mantissa, so `/ 1000` through double arithmetic drifts by ±1µs
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if not isinstance(ts_type, T.TimestampType):
        # TIMESTAMP_NTZ → session-tz timestamp (a value-preserving relabel
        # under the engine's forced UTC session timezone)
        return df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str):
    """Read the driver-provided parquet tables and register temp views.

    Returns a dict name -> DataFrame. Scans stay lazily declared so Catalyst
    can push filters/projections into the parquet reader.
    """
    out = {}
    for name in names:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
