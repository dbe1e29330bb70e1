"""Multidimensional aggregation: cube / rollup / grouping sets / pivot
(SURVEY.md §2.4 note: "cube/rollup are natural Spark extensions of A3").

The reference reconciles rollups by hand with six parallel CTE
aggregations (reference ``dags/pdq_etl_dag.py:257-316``); Spark computes
all levels in one pass with ``rollup``/``cube`` — a single shuffle
producing every grouping level, with ``grouping()`` flags to
disambiguate subtotal rows from genuine-null keys.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rollup_agg(
    df: DataFrame, dims: Sequence[str], aggs: Sequence[Column]
) -> DataFrame:
    """Hierarchical subtotals: (d1, d2, ..), (d1, ..), (), one shuffle."""
    flags = [F.grouping(d).cast("int").alias(f"g_{d}") for d in dims]
    return df.rollup(*dims).agg(*aggs, *flags)


def cube_agg(df: DataFrame, dims: Sequence[str], aggs: Sequence[Column]) -> DataFrame:
    """All 2^n grouping combinations in one pass."""
    flags = [F.grouping(d).cast("int").alias(f"g_{d}") for d in dims]
    return df.cube(*dims).agg(*aggs, *flags)


def pivot_agg(
    df: DataFrame,
    group_by: Sequence[str],
    pivot_col: str,
    pivot_values: Sequence[str],
    agg: Column,
) -> DataFrame:
    """Pivot with an explicit value list — always pass ``pivot_values`` at
    scale: without it Spark runs an extra distinct job over the data to
    discover the domain before planning."""
    return df.groupBy(*group_by).pivot(pivot_col, list(pivot_values)).agg(agg)


def grouping_sets_agg(
    df: DataFrame,
    sets: Sequence[Sequence[str]],
    aggs: Sequence[Column],
) -> DataFrame:
    """Exactly the requested grouping combinations (rollup/cube are the
    special cases) in one shuffle — the planner expands rows once per
    set, so cost scales with len(sets), not 2^n."""
    dims = []
    for s in sets:
        for d in s:
            if d not in dims:
                dims.append(d)
    flags = [F.grouping(d).cast("int").alias(f"g_{d}") for d in dims]
    return df.groupingSets([list(s) for s in sets], *dims).agg(*aggs, *flags)
