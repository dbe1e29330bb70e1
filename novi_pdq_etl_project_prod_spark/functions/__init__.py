"""Scalar expression library — UDF-free column functions.

Every function here returns a Column built from ``pyspark.sql.functions``
primitives so it stays inside whole-stage codegen (no Python workers in the
hot path). The reference's one Python UDF (``to_int``, reference
``spark_jobs/transform_operator.py:76``) is deliberately re-expressed as a
built-in expression (SURVEY.md §2.3 E2).
"""

from novi_pdq_etl_project_prod_spark.functions.casts import (  # noqa: F401
    NULL_TOKENS,
    normalize_null_tokens,
    to_int_robust,
    to_num_zero_default,
)
from novi_pdq_etl_project_prod_spark.functions.keys import (  # noqa: F401
    composite_key,
    derive_yyyymm,
    yyyymm_from_date,
)
