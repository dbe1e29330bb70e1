"""Time-grain and composite-key derivation (SURVEY.md §2.3 E4, E5, E8).

The reference models time as ``yyyymm = year*100 + month`` integers — never a
date column (SURVEY.md §1.1). Precedence when deriving from source columns:
``CYCLE_YEAR_MONTH`` first, else ``CYCLE_YEAR*100 + CYCLE_MONTH`` (reference
``spark_jobs/transform_lease.py:85-88``; pandas twin
``dags/pdq_etl_dag.py:120-140``), with a ``>= 200001`` data floor applied by
callers (reference ``dags/pdq_etl_dag.py:213``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from novi_pdq_etl_project_prod_spark.functions.casts import to_int_robust

#: Reference data floor: months before 2000-01 are dropped
#: (reference ``dags/pdq_etl_dag.py:213``).
YYYYMM_FLOOR = 200001


def derive_yyyymm(
    yyyymm_col: Column | str,
    year_col: Column | str,
    month_col: Column | str,
) -> Column:
    """``coalesce(yyyymm, year*100 + month)`` from tolerant string columns (E4).

    Faithful to reference ``spark_jobs/transform_lease.py:85-88``: the
    pre-combined column wins; the fallback requires BOTH year and month to
    parse (a null component yields null, so the row is droppable by the
    validity filter P4).
    """
    ym = to_int_robust(yyyymm_col)
    y = to_int_robust(year_col)
    m = to_int_robust(month_col)
    return F.coalesce(ym, (y * F.lit(100) + m)).alias("yyyymm")


def yyyymm_from_date(date_col: Column | str) -> Column:
    """Month-integer grain from a real date/timestamp column.

    The Spark-native path for sources that carry dates (e.g. the testdata
    ``l_shipdate``): identical semantics to E4 but derived from a typed
    column, so Catalyst can still constant-fold and push comparisons.
    """
    c = F.col(date_col) if isinstance(date_col, str) else date_col
    return (F.year(c) * F.lit(100) + F.month(c)).alias("yyyymm")


def composite_key(*cols: Column | str, sep: str = "-") -> Column:
    """String composite key via ``concat_ws`` (E5).

    Faithful to ``lease_key = concat_ws("-", district_no, lease_no)``
    (reference ``spark_jobs/transform_lease.py:106-109``): components are the
    *casted ints re-stringified*, so a zero-padded source ``"08"`` becomes
    ``"8"`` in the key — callers must pass already-cast int columns to keep
    that semantic.
    """
    cast_cols = [
        (F.col(c) if isinstance(c, str) else c).cast("string") for c in cols
    ]
    return F.concat_ws(sep, *cast_cols)
