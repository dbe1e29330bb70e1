"""Every catalog query with an oracle must match DuckDB exactly at sf0.01.

This mirrors the driver's t2 correctness gate (BASELINE.md) but with exact
value equality — stricter than the driver's hash.
"""

from __future__ import annotations

import pytest

from novi_pdq_etl_project_prod_spark.catalog import ORACLES, QUERIES
from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare_query

ORACLED = sorted(ORACLES)


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_parity(spark, name):
    report = compare_query(spark, QUERIES[name], ORACLES[name], SF_ORACLE)
    assert report["match"], f"{name}: {report}"


def test_all_queries_return_rows(spark):
    for name, fn in QUERIES.items():
        df = fn(spark, SF_ORACLE)
        assert df.columns, f"{name} has no columns"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert len(df.columns) >= 3
