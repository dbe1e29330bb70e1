"""Local replica of the driver's DuckDB-oracle comparison.

Stricter than the driver: exact value equality after aligning columns by
name and sorting rows canonically. If this passes, any order-insensitive
value-hash comparison passes too.
"""

from __future__ import annotations

import math
import os
from decimal import Decimal

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _canon(v):
    """Canonicalize a scalar for cross-engine comparison."""
    if v is None:
        return None
    # numpy scalars: unwrap BEFORE the isinstance chain (np.int64 is not a
    # Python int, and str()-ing it would diverge from a plain int column
    # produced by a non-Arrow toPandas)
    if type(v).__module__ == "numpy" and getattr(v, "shape", None) == ():
        v = v.item()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().replace(tzinfo=None).isoformat()
    if hasattr(v, "isoformat"):
        try:
            return v.replace(tzinfo=None).isoformat()
        except TypeError:
            return v.isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_canon(x) for x in v)
    if isinstance(v, (int, str, bool, bytes)):
        return v
    return str(v)


def _frame_to_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(_canon(v) for v in row) for row in df.itertuples(index=False, name=None)]
    rows.sort(key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))
    return rows


def _driver_compat_issues(sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    """Checks mirroring the DRIVER's (laxer-typed, stricter-hashed) compare.

    The driver sorts with pandas ``sort_values`` and value-hashes without
    numeric coercion, so two failure classes pass our exact comparison but
    fail (or crash) the driver:

    1. array/list/dict cells — ``sort_values`` factorizes object columns and
       raises ``TypeError: unhashable type`` (round-1 ``m1`` crash);
    2. int-vs-float dtype divergence with no nulls — e.g. DuckDB HUGEINT
       materializes as float64 while Spark emits int64, and the driver's
       hash distinguishes ``291.0`` from ``291`` (round-1 ``t4`` red row).
       Null-driven float upcasts are excluded: both engines upcast the same
       way and the driver canonicalizes those consistently.
    """
    issues: list[str] = []
    for label, df in (("spark", sdf), ("oracle", odf)):
        for c in df.columns:
            if df[c].dtype.kind != "O":
                continue
            bad = df[c].map(
                lambda v: isinstance(v, (list, dict, set))
                or type(v).__name__ == "ndarray"
            )
            if bad.any():
                issues.append(f"{label}.{c}: unhashable array/map cells")
    for c in set(sdf.columns) & set(odf.columns):
        ks, ko = sdf[c].dtype.kind, odf[c].dtype.kind
        if {ks, ko} == {"i", "f"}:
            float_side = sdf[c] if ks == "f" else odf[c]
            if not float_side.isna().any():
                issues.append(
                    f"{c}: dtype kind mismatch spark={sdf[c].dtype} "
                    f"oracle={odf[c].dtype} with no nulls (driver hash diverges)"
                )
    return issues


def compare_query(spark, fn, sql: str, sf_dir: str) -> dict:
    """Run Spark query + DuckDB oracle, return a comparison report."""
    sdf = fn(spark, sf_dir).toPandas()
    con = duckdb_con(sf_dir)
    odf = con.execute(sql).df()
    con.close()
    report = {
        "spark_rows": len(sdf),
        "oracle_rows": len(odf),
        "spark_cols": sorted(sdf.columns),
        "oracle_cols": sorted(odf.columns),
        "match": False,
        "detail": "",
    }
    if sorted(sdf.columns) != sorted(odf.columns):
        report["detail"] = "column mismatch"
        return report
    if len(sdf) != len(odf):
        report["detail"] = "row count mismatch"
        return report
    compat = _driver_compat_issues(sdf, odf)
    if compat:
        report["detail"] = f"driver-compat: {compat}"
        return report
    a, b = _frame_to_rows(sdf), _frame_to_rows(odf)
    if a == b:
        report["match"] = True
        return report
    diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
    report["detail"] = f"value mismatch; first diffs: {diffs}"
    return report
