"""Operators — the engine's dataflow surface.

- ``transform``: tolerant parse → typed monthly-grain tables (reference
  transform jobs, SURVEY.md §2.2-§2.4).
- ``modeling``: star-schema dims/facts, dedup + upsert-as-overwrite
  (reference ``model_curated.py``).
- ``quality``: the three reference DQ checks + raising wrappers
  (reference DAG ``dq_*`` tasks).
- ``rollup``: cube/rollup/grouping-sets generalizations of the
  reconciliation aggregations.
- ``windows``: ranking / lag / moving-window analytics (new surface the
  star schema implies).
- ``dedup``: exact + near-duplicate detection (MinHash-LSH, SimHash,
  n-gram Jaccard) for training-data pipelines.
- ``similarity``: embedding similarity search (brute-force + LSH-bucketed).
- ``text``: language-ID, quality scoring, token counting, fingerprinting.
- ``multimodal``: binary-column plumbing with stubbed decoders.
- ``sketches``: mergeable bounded-state summaries (KMV distinct,
  theta-intersection, deterministic sample quantiles).
- ``graphs``: edge-list statistics (degree-oriented triangle census).
"""
