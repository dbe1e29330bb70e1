"""novi_pdq_etl_project_prod_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference ETL pipeline (``Guti2020xx/novi-pdq-etl-project-prod``,
surveyed in SURVEY.md). The reference is a pandas + PySpark + Postgres medallion
warehouse; this engine is a lakehouse-style engine over partitioned Parquet with
the full operator inventory re-expressed as declarative DataFrame/SQL plans that
Catalyst can optimize, plus large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing).

Design stance (SURVEY.md §7.1):
- DataFrame/SQL API only; no RDDs; no Python row-at-a-time UDFs in the hot path.
- Storage layers raw/staging/curated = partitioned Parquet, ``yyyymm`` partition
  column, dynamic partition overwrite for idempotent month loads.
- Zero custom Catalyst rules — pushdown/pruning/join-selection/codegen are
  expressed declaratively so the optimizer does the work.
- ``pandas_udf``/``mapInPandas`` reserved for operators Spark genuinely cannot
  express (multimodal decode, some vector paths).
"""

__version__ = "0.1.0"

from novi_pdq_etl_project_prod_spark.session import get_spark  # noqa: F401
