"""Distributed ``}``-delimited DSV scan (SURVEY.md §2.1 S1, S2; §2.3 E6-E7).

The reference reads its two source files with a pandas chunk loop —
``pd.read_csv(path, sep="}", dtype=str, keep_default_na=False,
na_values=["", "NULL", "null", "NaN", "nan"], quoting=3, chunksize=1_000_000)``
plus explicit ``gc.collect()`` per chunk "to avoid OOM" (reference
``dags/pdq_etl_dag.py:189-249``).

Spark-first replacement: a single declarative ``spark.read.csv`` scan.
File splits give parallelism for free; executor memory management replaces
the chunk loop; at 100 TB the same one-liner scales to thousands of input
splits with no code change. All values land as strings (the reference's
string-first schema), null-token scrubbing is an explicit expression so the
semantics stay visible and testable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from novi_pdq_etl_project_prod_spark.functions.casts import normalize_null_tokens

QUOTE_NONE = chr(0)  # Spark: NUL quote char effectively disables quoting


def read_dsv(
    spark: SparkSession,
    path: str,
    sep: str = "}",
    scrub_null_tokens: bool = True,
    corrupt_record_col: str | None = None,
) -> DataFrame:
    """Read a ``sep``-delimited text file with header, all-string columns.

    Equivalent to the reference's S1+S2+E7 stack:
    - header row used for column names, names whitespace-trimmed
      (reference ``dags/pdq_etl_dag.py:206``);
    - every column ``StringType`` (``dtype=str``);
    - quoting disabled (pandas ``quoting=3`` / QUOTE_NONE);
    - null tokens ``"" NULL null NaN nan`` → null, values trimmed
      (reference ``dags/pdq_etl_dag.py:198-199``).
    """
    reader = (
        spark.read.option("sep", sep)
        .option("header", True)
        .option("quote", QUOTE_NONE)
        .option("inferSchema", False)
        .option("mode", "PERMISSIVE")
    )
    if corrupt_record_col:
        # capture short/garbled lines instead of silently null-padding:
        # PERMISSIVE + columnNameOfCorruptRecord routes the raw line into
        # a side column the caller can quarantine (poison-line hygiene —
        # at 100 TB there is always a torn line somewhere)
        reader = reader.option("columnNameOfCorruptRecord", corrupt_record_col)
    df = reader.csv(path)
    # S2: trim header whitespace
    df = df.toDF(*[c.strip() for c in df.columns])
    if scrub_null_tokens:
        keep = [c for c in df.columns if c != corrupt_record_col]
        df = df.select(
            *[normalize_null_tokens(F.col(c)).alias(c) for c in keep],
            *([F.col(corrupt_record_col)] if corrupt_record_col and corrupt_record_col in df.columns else []),
        )
    return df
