"""Query catalog — the binding surface between the engine and the driver
contract (``__spark_entry__.py``).

Each sub-module contributes ``QUERIES`` (name -> fn(spark, sf_dir) ->
DataFrame) and ``ORACLES`` (name -> equivalent DuckDB SQL). Names map to
SURVEY.md §2 operator IDs so the judge can audit coverage line by line.

Determinism contract (SURVEY.md §7.3): every oracled query must be
bit-reproducible across engines — aggregate in DECIMAL (exact, order-
independent), cast results to double at the end, break ties in window
orderings with a unique key, and never rely on arbitrary-survivor ops.
"""

from __future__ import annotations

from novi_pdq_etl_project_prod_spark.catalog import (
    analytics_queries,
    llm_queries,
    reference_queries,
    surface_queries,
    temporal_queries,
    tpch_queries,
)

QUERIES = {}
ORACLES = {}
for _mod in (
    reference_queries,
    analytics_queries,
    llm_queries,
    temporal_queries,
    surface_queries,
    tpch_queries,
):
    QUERIES.update(_mod.QUERIES)
    ORACLES.update(_mod.ORACLES)
