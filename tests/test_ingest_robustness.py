"""Ingest robustness: malformed DSV lines, property-based cast fuzzing
(hypothesis), and a production-shape streaming parquet sink run."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


@pytest.fixture
def shared_spark(spark):
    return spark

from novi_pdq_etl_project_prod_spark.sources.dsv import read_dsv
from novi_pdq_etl_project_prod_spark.functions.casts import NULL_TOKENS
from tests.conftest import SF_SMOKE


def test_dsv_malformed_lines_do_not_poison_good_rows(spark, tmp_path):
    p = tmp_path / "dirty.dsv"
    p.write_text(
        "A}B}C\n"
        "1}x}2.5\n"
        "2}y\n"            # short line
        "3}z}4.5}extra\n"  # long line
        "4}w}9.0\n"
    )
    df = read_dsv(spark, str(p))
    rows = {r.A: r for r in df.collect()}
    assert set(rows) == {"1", "2", "3", "4"}
    assert rows["2"].C is None          # short line null-padded
    assert rows["3"].C == "4.5"         # long line truncated to schema
    assert rows["4"].C == "9.0"


def _py_to_int_robust(s):
    """Python reference model of to_int_robust (the reference's UDF
    semantics: int(x) if x and x.strip().isdigit() else None)."""
    if s is None:
        return None
    t = s.strip()
    if t in NULL_TOKENS:
        return None
    if t.isdigit() and t.isascii():
        v = int(t)
        return v if -(2**31) <= v < 2**31 else None
    return None


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.sampled_from(list(NULL_TOKENS)),
            st.integers(0, 10**12).map(str),
            st.text(
                alphabet="0123456789 abcXYZ.-+eé世",
                max_size=12,
            ),
        ),
        min_size=1,
        max_size=80,
    )
)
def test_to_int_robust_matches_python_model(shared_spark, values):
    from novi_pdq_etl_project_prod_spark.functions.casts import to_int_robust

    pdf = pd.DataFrame({"s": pd.Series(values, dtype="object")})
    df = shared_spark.createDataFrame(pdf)
    got = [r.v for r in df.select(to_int_robust("s").alias("v")).collect()]
    want = [_py_to_int_robust(v) for v in values]
    assert got == want


def test_streaming_parquet_sink_with_checkpoint(spark, tmp_path):
    """Production streaming shape: file source → watermarked agg →
    parquet sink with checkpoint, availableNow trigger."""
    from novi_pdq_etl_project_prod_spark.session import read_events
    from novi_pdq_etl_project_prod_spark.streaming.events import (
        read_event_stream,
        windowed_event_counts,
    )

    src = str(tmp_path / "src")
    read_events(spark, SF_SMOKE).write.parquet(src)
    out = str(tmp_path / "out")
    chk = str(tmp_path / "chk")
    q = (
        windowed_event_counts(read_event_stream(spark, src), watermark="0 seconds")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", chk)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    result = spark.read.parquet(out)
    batch = windowed_event_counts(spark.read.parquet(src))
    # append mode emits only watermark-closed windows; with the stream
    # exhausted and 0s watermark, all but the last window close
    assert result.count() >= batch.count() - 5
    # rerun with same checkpoint: no new input → no duplicate output
    n1 = result.count()
    q2 = (
        windowed_event_counts(read_event_stream(spark, src), watermark="0 seconds")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", chk)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    assert spark.read.parquet(out).count() == n1


def _py_to_num_zero_default(s):
    """Python model of to_num_zero_default (reference to_num semantics:
    blank/null-token/unparseable -> 0.0)."""
    if s is None:
        return 0.0
    t = s.strip()
    if t in NULL_TOKENS:
        return 0.0
    try:
        v = float(t)
    except ValueError:
        return 0.0
    if v != v or v in (float("inf"), float("-inf")):  # NaN/Inf tokens differ per engine
        return None  # sentinel: excluded from comparison
    return v


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.sampled_from(list(NULL_TOKENS)),
            st.floats(
                min_value=-1e6, max_value=1e6, allow_nan=False
            ).map(lambda f: f"{f:.4f}"),
            st.text(alphabet="0123456789 .eE+-abz", max_size=10),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_to_num_zero_default_matches_python_model(shared_spark, values):
    from novi_pdq_etl_project_prod_spark.functions.casts import to_num_zero_default

    pdf = pd.DataFrame({"s": pd.Series(values, dtype="object")})
    df = shared_spark.createDataFrame(pdf)
    got = [r.v for r in df.select(to_num_zero_default("s").alias("v")).collect()]
    for g, s in zip(got, values):
        w = _py_to_num_zero_default(s)
        if w is None:
            continue  # engine-specific inf/nan literal handling: skip
        assert g == pytest.approx(w, abs=0.0), (s, g, w)


def test_json_lines_source_roundtrip(spark, tmp_path):
    """S-surface breadth: the raw layer's JSON rows are readable as a
    first-class JSON-lines source (schema'd read, no inference surprises)."""
    from pyspark.sql import types as T
    from novi_pdq_etl_project_prod_spark.sources.json_raw import (
        encode_raw_json,
        parse_raw_json,
        tolerant_string_schema,
    )

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").limit(100)
    src = li.select(
        (F.year("l_shipdate") * 100 + F.month("l_shipdate")).alias("yyyymm"),
        F.col("l_orderkey").cast("string").alias("OK"),
        F.col("l_quantity").cast("string").alias("QTY"),
    )
    raw = encode_raw_json(src)
    # write raw layer out as JSON-lines, read back as a JSON source
    d = str(tmp_path / "jl")
    raw.select("yyyymm", "raw").write.json(d)
    schema = T.StructType(
        [T.StructField("yyyymm", T.IntegerType()), T.StructField("raw", T.StringType())]
    )
    back = spark.read.schema(schema).json(d)
    assert back.count() == 100
    parsed = parse_raw_json(back, tolerant_string_schema(["OK", "QTY"]))
    got = {(r.yyyymm, r.OK, r.QTY) for r in parsed.collect()}
    want = {(r.yyyymm, r.OK, r.QTY) for r in src.collect()}
    assert got == want


def test_orc_roundtrip_preserves_schema_and_values(spark, tmp_path):
    """ORC source/sink round-trip (columnar-format coverage beyond
    parquet): schema, row count, and a decimal checksum survive, and a
    selective predicate reaches the ORC scan as a pushed filter."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    path = str(tmp_path / "li_orc")
    li.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert back.schema == li.schema
    assert back.count() == li.count()
    chk = lambda df: df.agg(  # noqa: E731
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("s")
    ).collect()[0].s
    assert chk(back) == chk(li)
    sel = back.where("l_orderkey = 100")
    plan = sel._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "l_orderkey" in plan
