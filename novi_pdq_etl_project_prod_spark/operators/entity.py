"""Fuzzy entity matching with blocking (entity-resolution for dims).

The reference dedups dimensions only on exact natural keys
(``model_curated.py:144-166``); real operator/lease registries drift
(typos, renames), so the engine supplies the fuzzy layer: candidate
pairs via cheap *blocking* (never the n² cross product), then an exact
edit-distance filter on the candidates.

Blocking strategies compose: prefix blocks catch same-start typos,
sorted-token fingerprints catch word reorderings. At 100 TB the
block-key groupBy is the only shuffle and each block is small by
construction — the same candidate-generation shape as MinHash banding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def blocked_fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    prefix_len: int = 4,
    max_edit_distance: int = 2,
) -> DataFrame:
    """Candidate pairs (a < b) whose normalized names share a
    ``prefix_len`` block and differ by ≤ ``max_edit_distance`` edits.

    Normalization: lower + trim + whitespace collapse (the E6/E7
    tolerant-string discipline applied to names).
    """
    norm = F.regexp_replace(F.lower(F.trim(F.col(name_col))), r"\s+", " ")
    base = df.select(
        F.col(id_col).alias("id"),
        norm.alias("name"),
        F.substring(norm, 1, prefix_len).alias("block"),
    )
    a = base.alias("a")
    b = base.alias("b")
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
            F.levenshtein(F.col("a.name"), F.col("b.name")).alias("edit_distance"),
        )
        .where(F.col("edit_distance") <= max_edit_distance)
    )
