"""Robust tolerant-string casts (SURVEY.md §2.3 E1-E3, E7, E11).

The reference parses everything as strings and casts late with three
behaviors the engine preserves faithfully (SURVEY.md §7.3):

- null-token set ``{"", "NULL", "null", "NaN", "nan"}`` → SQL null
  (reference ``dags/pdq_etl_dag.py:198-199,152``);
- blank/null **measure** → ``0.0``, not null
  (reference ``spark_jobs/transform_operator.py:78-82``,
  ``spark_jobs/transform_lease.py:39-44``);
- blank/null **key** → null int (reference ``spark_jobs/transform_lease.py:31-36``),
  with the caller optionally coalescing to a 0 sentinel
  (reference ``spark_jobs/transform_operator.py:89``).

All are pure Column expressions — the reference's sole Python UDF
(``transform_operator.py:76``) is replaced by ``to_int_robust`` which keeps
the exact ``isdigit``-style semantics via ``rlike`` without leaving the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tokens the reference treats as null at extract time
#: (reference ``dags/pdq_etl_dag.py:198-199``).
NULL_TOKENS = ("", "NULL", "null", "NaN", "nan")


def normalize_null_tokens(col: Column | str) -> Column:
    """Map the reference's null-token set (after trim) to SQL null (E7)."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.trim(c)
    return F.when(t.isin(*NULL_TOKENS) | c.isNull(), F.lit(None)).otherwise(t)


def to_int_robust(col: Column | str) -> Column:
    """Blank / non-digit-string / null → null, else int (E1/E2).

    Mirrors ``int(x) if x and x.strip().isdigit() else None`` (the reference
    UDF, ``transform_operator.py:76``) and the built-in twin at
    ``transform_lease.py:31-36`` — as a codegen-friendly expression.
    """
    c = F.col(col) if isinstance(col, str) else col
    t = F.trim(c)
    # try_cast guards ANSI-mode overflow on absurdly long digit strings
    return F.when(t.rlike(r"^[0-9]+$"), t.try_cast("int")).otherwise(
        F.lit(None).cast("int")
    )


def to_num_zero_default(col: Column | str) -> Column:
    """Blank/null/unparseable measure → 0.0, else double (E3).

    Faithful to ``to_num`` (``transform_operator.py:78-82``) /
    ``to_num_col`` (``transform_lease.py:39-44``): measures are never null
    downstream, they are zero.
    """
    c = F.col(col) if isinstance(col, str) else col
    cleaned = normalize_null_tokens(c)
    # try_cast, not cast: Spark 4 runs in ANSI mode by default, where a plain
    # cast of an unparseable string throws instead of yielding null.
    return F.coalesce(cleaned.try_cast("double"), F.lit(0.0))
