"""Fixture-drift armor (VERDICT r04 item 4).

Round 3 died because the driver's regenerated testdata changed one
column's parquet encoding. ``session.read_table`` is the single
assert-and-adapt boundary for every fixture; these tests synthesize the
historical encodings (INT64 TIMESTAMP(NANOS), TIMESTAMP_NTZ,
UTC-adjusted micros) plus plausible future drift (integer/float width
changes) from the real sf0.001 fixtures and assert catalog queries
return IDENTICAL output on the drifted copies.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from novi_pdq_etl_project_prod_spark.catalog import QUERIES
from novi_pdq_etl_project_prod_spark.session import read_table

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

#: Queries exercised per drift dir — cheap ones covering every drifted
#: fixture family (events, lineitem+orders, documents, embeddings, dims).
PROBE_QUERIES = (
    "x4_event_windows",
    "t1_pricing_summary",
    "m3_token_stats",
    "m7_embedding_topk",
    "j1_star_join",
)


def _rewrite(src_dir: str, out_dir: str, transforms: dict) -> str:
    """Copy the sf dir, rewriting selected tables' arrow schemas.

    ``transforms`` maps table -> fn(pa.Table) -> pa.Table.
    """
    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        src = os.path.join(src_dir, f"{t}.parquet")
        dst = os.path.join(out_dir, f"{t}.parquet")
        if t in transforms:
            pq.write_table(transforms[t](pq.read_table(src)), dst,
                           version="2.6", store_schema=False)
        else:
            shutil.copyfile(src, dst)
    return out_dir


def _cast_col(tbl: pa.Table, col: str, typ: pa.DataType) -> pa.Table:
    i = tbl.schema.get_field_index(col)
    return tbl.set_column(i, col, tbl.column(col).cast(typ))


def _rows(df):
    return sorted(
        tuple(str(v) for v in row) for row in df.collect()
    )


def _run_probes(spark, sf_dir):
    return {q: _rows(QUERIES[q](spark, sf_dir)) for q in PROBE_QUERIES}


@pytest.fixture(scope="module")
def baseline(spark):
    return _run_probes(spark, SF)


def test_int64_nanos_events_encoding(spark, tmp_path, baseline):
    """r01/r02-era encoding: events.ts as INT64 TIMESTAMP(NANOS)."""
    d = _rewrite(SF, str(tmp_path / "nanos"), {
        "events": lambda t: _cast_col(t, "ts", pa.timestamp("ns")),
    })
    assert read_table(spark, d, "events").schema["ts"].dataType.simpleString() == "timestamp"
    assert _run_probes(spark, d) == baseline


def test_utc_adjusted_micros_encoding(spark, tmp_path, baseline):
    """isAdjustedToUTC=true micros on every timestamp column (a plausible
    next driver generation; reads as TimestampType directly)."""
    d = _rewrite(SF, str(tmp_path / "utc"), {
        "events": lambda t: _cast_col(t, "ts", pa.timestamp("us", tz="UTC")),
        "orders": lambda t: _cast_col(t, "o_orderdate", pa.timestamp("us", tz="UTC")),
        "lineitem": lambda t: _cast_col(t, "l_shipdate", pa.timestamp("us", tz="UTC")),
    })
    assert _run_probes(spark, d) == baseline


def test_numeric_width_drift(spark, tmp_path, baseline):
    """Value-preserving width drift: key/int columns widened to int64,
    embeddings stored as float64 (exact upcast of the float32 values),
    n_chars narrowed to int32. read_table must normalize all of it."""
    d = _rewrite(SF, str(tmp_path / "widths"), {
        "nation": lambda t: _cast_col(
            _cast_col(t, "n_nationkey", pa.int64()), "n_regionkey", pa.int64()
        ),
        "customer": lambda t: _cast_col(t, "c_nationkey", pa.int64()),
        "supplier": lambda t: _cast_col(t, "s_nationkey", pa.int64()),
        "part": lambda t: _cast_col(t, "p_size", pa.int64()),
        "lineitem": lambda t: _cast_col(t, "l_linenumber", pa.int64()),
        "documents": lambda t: _cast_col(t, "n_chars", pa.int32()),
        "embeddings": lambda t: _cast_col(
            _cast_col(t, "embedding", pa.list_(pa.float64())),
            "label", pa.int64(),
        ),
    })
    emb = read_table(spark, d, "embeddings")
    assert emb.schema["embedding"].dataType.simpleString() == "array<float>"
    assert _run_probes(spark, d) == baseline


def test_missing_canonical_column_fails_loudly(spark, tmp_path):
    """A fixture missing a canonical column must raise one clear
    AssertionError naming the drift, not crash 142 queries downstream."""
    d = _rewrite(SF, str(tmp_path / "broken"), {
        "events": lambda t: t.drop_columns(["user_id"]),
    })
    with pytest.raises(AssertionError, match="user_id"):
        read_table(spark, d, "events")


def test_canonical_fixture_returns_raw_scan(spark):
    """Already-canonical fixtures must come back without a cast
    projection, keeping pushdown/pruning plans byte-identical."""
    df = read_table(spark, SF, "lineitem")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "Project" not in plan, plan
