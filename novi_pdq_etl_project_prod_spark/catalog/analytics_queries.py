"""Analytics extensions beyond the reference's literal surface
(SURVEY.md §7.2 M6 "richer analytics"): window functions, cube/rollup/
grouping sets, pivot, distinct counting, set ops, TPC-H-style reporting.

Populated incrementally; every entry ships with a DuckDB oracle.
"""

from __future__ import annotations

QUERIES: dict = {}
ORACLES: dict = {}
