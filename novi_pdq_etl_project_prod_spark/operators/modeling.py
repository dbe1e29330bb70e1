"""Star-schema modeling: dims, facts, and upsert-as-overwrite
(SURVEY.md §2.1 S8-S9, §2.4 A4, §2.2 P2/P5).

The reference stages dims through Postgres load tables and upserts with
``INSERT ... ON CONFLICT`` (reference ``spark_jobs/model_curated.py:30-101``).
On a lakehouse there is no ON CONFLICT; the idiomatic replacement is
**latest-wins dedup + snapshot overwrite**:

    new ∪ old ──row_number over (pk, order by is_new desc)──▶ keep rn=1

which is also *deterministic*, unlike the reference's ``dropDuplicates``
survivor choice (reference ``model_curated.py:144-166`` — SURVEY.md §7.3
calls this out as the main correctness trap).

Scale notes: dims are small relative to facts (classic star), so the
window dedup is a cheap shuffle on the pk; fact→dim joins downstream
broadcast the dim side. At true 100 TB dims, swap the snapshot overwrite
for a MERGE on a transactional table format — the operator signatures here
don't change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_dim(
    df: DataFrame,
    pk: tuple[str, ...],
    order_by: tuple[str, ...] = (),
    deterministic: bool = True,
) -> DataFrame:
    """A4 — one row per natural key.

    ``deterministic=False`` reproduces the reference's ``dropDuplicates([pk])``
    arbitrary-survivor semantics (``model_curated.py:144,151,158,166``);
    the default picks the canonical survivor via ``row_number`` ordered by
    ``order_by`` (falling back to the non-key columns descending, nulls last,
    so a fully-populated row beats a sparse one).
    """
    df = df.na.drop(subset=list(pk))  # P5 (reference model_curated.py:151,158)
    if not deterministic:
        return df.dropDuplicates(list(pk))
    order_cols = list(order_by) or [
        F.col(c).desc_nulls_last() for c in df.columns if c not in pk
    ]
    if not order_cols:
        return df.dropDuplicates(list(pk))
    w = Window.partitionBy(*[F.col(k) for k in pk]).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def upsert_dim(
    existing: DataFrame | None,
    incoming: DataFrame,
    pk: tuple[str, ...],
) -> DataFrame:
    """S9 — latest-wins upsert as a pure DataFrame op.

    ``INSERT ... ON CONFLICT (pk) DO UPDATE`` (reference
    ``model_curated.py:72-101``) becomes: stack old+new with a precedence
    flag, keep the highest-precedence row per key. The result is the new
    dim snapshot; persist it with ``sources.layers.overwrite_snapshot``.
    """
    incoming = incoming.withColumn("__is_new", F.lit(1))
    if existing is None:
        stacked = incoming
    else:
        stacked = incoming.unionByName(
            existing.withColumn("__is_new", F.lit(0)), allowMissingColumns=True
        )
    w = Window.partitionBy(*[F.col(k) for k in pk]).orderBy(F.col("__is_new").desc())
    return (
        stacked.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "__is_new")
    )


def project_fact(
    df: DataFrame,
    key_cols: tuple[str, ...],
    measure_cols: tuple[str, ...],
    month_col: str = "yyyymm",
) -> DataFrame:
    """P2 — fact projection: keys + month + measures, reference column
    layout (``model_curated.py:179-189``)."""
    return df.select(
        *[F.col(c) for c in key_cols],
        F.col(month_col),
        *[F.col(c) for c in measure_cols],
    )
