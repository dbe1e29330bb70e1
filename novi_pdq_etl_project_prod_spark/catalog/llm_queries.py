"""Training-data pipeline operators (SURVEY.md §7.2 M6): dedup (exact +
near), similarity search, text analysis, multimodal plumbing — over the
``documents`` and ``embeddings`` fixture tables.

Populated incrementally; SQL-expressible ops ship with DuckDB oracles,
genuinely approximate ops (MinHash-LSH, SimHash) are registered without an
oracle (driver records a rows-only check) and are instead validated against
exact similarity ground truth in ``tests/``.
"""

from __future__ import annotations

QUERIES: dict = {}
ORACLES: dict = {}
