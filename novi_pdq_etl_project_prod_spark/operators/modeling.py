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

from pyspark.sql import Column, DataFrame, Window
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


def merge_into_snapshot(
    existing: DataFrame | None,
    source: DataFrame,
    pk: tuple[str, ...],
    update_cols: tuple[str, ...] | None = None,
    delete_condition: Column | None = None,
) -> DataFrame:
    """MERGE semantics over a snapshot table, as a pure DataFrame op:

    - matched + ``delete_condition`` → row removed;
    - matched otherwise → ``update_cols`` taken from source (others kept);
    - not matched → source row inserted.

    This is the general form of ``upsert_dim`` (which is latest-wins on
    every column). The result is the new snapshot; persist it with
    ``overwrite_snapshot``. On a transactional table format the same
    call-site becomes a real MERGE — the operator signature is the
    contract, the storage swap is mechanical.
    """
    if existing is None:
        return source if delete_condition is None else source.where(
            ~F.coalesce(delete_condition, F.lit(False))
        )
    update_cols = tuple(
        update_cols
        if update_cols is not None
        else [c for c in source.columns if c not in pk]
    )
    keep_cols = [c for c in existing.columns if c not in pk and c not in update_cols]
    src = source.select(
        *[F.col(k) for k in pk],
        *[F.col(c).alias(f"__src_{c}") for c in update_cols],
        F.lit(True).alias("__matched_src"),
    )
    joined = existing.join(src, list(pk), "full_outer")
    is_matched = F.col("__matched_src") & existing[pk[0]].isNotNull()
    merged = joined.select(
        *[F.col(k) for k in pk],
        *[
            F.when(F.col("__matched_src").isNotNull(), F.col(f"__src_{c}"))
            .otherwise(F.col(c))
            .alias(c)
            for c in update_cols
        ],
        *[F.col(c) for c in keep_cols],
    )
    if delete_condition is not None:
        # delete applies to matched rows only
        was_matched = joined.select(
            *[F.col(k) for k in pk], F.col("__matched_src").isNotNull().alias("__m")
        )
        merged = (
            merged.join(was_matched, list(pk))
            .where(~(F.col("__m") & F.coalesce(delete_condition, F.lit(False))))
            .drop("__m")
        )
    return merged


def merge_frames(
    target: DataFrame | None,
    source: DataFrame,
    on: tuple[str, ...],
    when_matched_update: dict[str, str] | None = None,
    when_matched_delete: str | None = None,
    when_not_matched_insert: dict[str, str] | bool = True,
    check_duplicate_source: bool = True,
    schema_evolution: bool = False,
) -> DataFrame:
    """Declarative MERGE as a pure DataFrame op (VERDICT r07 item 5) —
    the Delta-parity idiom users reach for first, composing the
    snapshot-layer pieces (:func:`merge_into_snapshot`, CDC tombstones)
    behind ONE entry point:

    - ``when_matched_update``: {target_col: SQL expr} evaluated over the
      joined row with aliases ``t`` (target) and ``s`` (source) — e.g.
      ``{"acctbal": "t.acctbal + s.delta"}``;
    - ``when_matched_delete``: SQL predicate (same aliases); delete wins
      over update when both apply (Delta's clause-order semantics with
      the delete clause first);
    - ``when_not_matched_insert``: True inserts source rows mapped by
      column name (missing target columns become NULL), a {target_col:
      expr} mapping builds the row explicitly (``s`` alias only), False
      skips inserts;
    - NOT MATCHED BY SOURCE rows pass through unchanged (ANSI MERGE);
    - NULL merge keys never match (ANSI / Delta): a NULL-key source row
      inserts, a NULL-key target row passes through untouched.

    Multiple source rows matching one target key make the update
    non-deterministic, so (like Delta) the operator REFUSES them —
    ``check_duplicate_source`` runs one cheap count-distinct agg and
    raises. Output schema = target schema (or the insert mapping when
    the target is None/empty); with ``schema_evolution=True`` source
    columns absent from the target are APPENDED (Delta's mergeSchema):
    matched/inserted rows take the source value, unmatched target rows
    take NULL.

    Scale: one full-outer shuffle join on ``on``, one dup-guard agg
    over the source keys. Nothing corpus-sized touches the driver.

    Skew note (VERDICT r08 item 7, measured round 9): FULL OUTER is
    excluded from both broadcast and AQE skew-split, so a hot target
    key (the reference's operator-0 sentinel) serializes into one
    sort-merge task. At 10× (6M rows, 50% on one key) the measured
    penalty is mild — 3.32 s vs 2.96 s (1.12×) against the
    AQE-splittable decomposition ``target LEFT OUTER source`` (update/
    delete/carry branch) ∪ ``source LEFT ANTI target`` (insert branch).
    For pathological hot-key mass where the single task dominates,
    rewrite along that decomposition (semantically identical given the
    dup-source guard) rather than salting: the merge key is the output
    grain, so salt would have to be unwound anyway.
    """
    on = tuple(on)
    if check_duplicate_source:
        # NULL-key source rows are exempt: under ANSI equality they can
        # never match a target row (they always insert), so multiples
        # are not a non-determinism hazard
        non_null = None
        for k in on:
            nn = F.col(k).isNotNull()
            non_null = nn if non_null is None else (non_null & nn)
        dup = (
            source.where(non_null)
            .groupBy(*on)
            .agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            key = {k: dup[0][k] for k in on}
            raise ValueError(
                f"merge_frames: source has multiple rows for key {key} — "
                "MERGE updates would be non-deterministic; dedup the "
                "source first (dedup_dim / latest-wins)."
            )
    if target is None:
        if when_not_matched_insert is False:
            raise ValueError("merge_frames: no target and inserts disabled")
        s = source.alias("s")
        if when_not_matched_insert is True:
            return s.select(*source.columns)
        return s.select(
            *[F.expr(e).alias(c) for c, e in when_not_matched_insert.items()]
        )

    out_cols = list(target.columns)
    evolved: list[str] = []
    if schema_evolution:
        evolved = [c for c in source.columns if c not in target.columns]
        out_cols += evolved
    t = target.withColumn("__t_present", F.lit(True)).alias("t")
    s = source.withColumn("__s_present", F.lit(True)).alias("s")
    cond = None
    for k in on:
        # plain equality, NOT eqNullSafe: ANSI MERGE (and Delta) treat a
        # NULL merge key as never-matching — a NULL-key source row
        # INSERTS rather than updating a NULL-key target row, and a
        # NULL-key target row passes through as NOT MATCHED BY SOURCE
        eq = F.col(f"t.{k}") == F.col(f"s.{k}")
        cond = eq if cond is None else (cond & eq)
    joined = t.join(s, cond, "full_outer")
    matched = F.col("t.__t_present").isNotNull() & F.col(
        "s.__s_present"
    ).isNotNull()
    target_only = F.col("s.__s_present").isNull()
    update_map = dict(when_matched_update or {})

    def _matched_value(c: str) -> Column:
        if c in update_map:
            return F.expr(update_map[c])
        if c in evolved:
            return F.col(f"s.{c}")
        return F.col(f"t.{c}")

    def _target_value(c: str) -> Column:
        return F.lit(None) if c in evolved else F.col(f"t.{c}")

    def _insert_value(c: str) -> Column:
        if when_not_matched_insert is False:
            return F.lit(None)
        if when_not_matched_insert is True:
            return F.col(f"s.{c}") if c in source.columns else F.lit(None)
        expr = when_not_matched_insert.get(c)
        return F.expr(expr) if expr is not None else F.lit(None)

    survives = F.when(
        matched,
        F.lit(True)
        if when_matched_delete is None
        else ~F.coalesce(F.expr(when_matched_delete), F.lit(False)),
    ).otherwise(
        F.when(target_only, F.lit(True)).otherwise(
            F.lit(when_not_matched_insert is not False)
        )
    )
    cols = [
        F.when(matched, _matched_value(c))
        .when(target_only, _target_value(c))
        .otherwise(_insert_value(c))
        .alias(c)
        for c in out_cols
    ]
    return joined.where(survives).select(*cols)


def _read_live_snapshot(spark, path: str) -> DataFrame | None:
    """Current committed snapshot of a pointer table (None before the
    first commit). Module-level so tests can monkeypatch it to inject a
    concurrent writer between read and commit."""
    from novi_pdq_etl_project_prod_spark.sources.layers import (
        resolve_table_path,
    )

    live = resolve_table_path(path)
    if live == path:
        return None
    return spark.read.parquet(live)


def merge_into(
    spark,
    root: str,
    layer: str,
    table: str,
    source: DataFrame,
    on: tuple[str, ...],
    when_matched_update: dict[str, str] | None = None,
    when_matched_delete: str | None = None,
    when_not_matched_insert: dict[str, str] | bool = True,
    max_retries: int = 3,
    schema_evolution: bool = False,
) -> str:
    """MERGE committed through the snapshot CAS pointer: read the live
    snapshot AND its version token, build :func:`merge_frames`, commit
    with ``expected_base`` — a concurrent writer flipping the pointer in
    between raises ``SnapshotConflictError`` and the merge re-reads and
    re-applies (optimistic concurrency, Delta's loop), up to
    ``max_retries`` before propagating. Lost updates are impossible:
    every committed merge was computed against the snapshot it replaced.

    Returns the table path."""
    from novi_pdq_etl_project_prod_spark.sources.layers import (
        SnapshotConflictError,
        current_snapshot,
        overwrite_snapshot,
        table_path,
    )

    path = table_path(root, layer, table)
    attempts = max_retries + 1
    for attempt in range(attempts):
        token = current_snapshot(path)
        target = _read_live_snapshot(spark, path)
        merged = merge_frames(
            target,
            source,
            on,
            when_matched_update=when_matched_update,
            when_matched_delete=when_matched_delete,
            when_not_matched_insert=when_not_matched_insert,
            schema_evolution=schema_evolution,
        )
        try:
            overwrite_snapshot(merged, root, layer, table, expected_base=token)
            return path
        except SnapshotConflictError:
            if attempt == attempts - 1:
                raise
    raise AssertionError("unreachable")


def scd2_apply(
    existing: DataFrame | None,
    incoming: DataFrame,
    pk: tuple[str, ...],
    attrs: tuple[str, ...],
    effective_col: str = "effective_yyyymm",
) -> DataFrame:
    """Slowly-changing-dimension Type 2: keep full attribute history.

    ``incoming`` carries (pk, attrs, effective_col). Rows whose attrs
    differ from the key's current version close that version
    (``valid_to`` = new effective) and open a new current one
    (``valid_to`` null, ``is_current`` true). Unchanged keys are left
    untouched; brand-new keys open their first version.

    Implementation: union existing versions + incoming candidates, one
    window per key ordered by effective month, dedup consecutive
    identical attr versions, then derive valid_to via lead(). One
    shuffle on the pk.
    """
    inc = incoming.select(
        *[F.col(k) for k in pk],
        *[F.col(a) for a in attrs],
        F.col(effective_col).alias("valid_from"),
    )
    if existing is None:
        versions = inc
    else:
        versions = existing.select(
            *[F.col(k) for k in pk], *[F.col(a) for a in attrs], "valid_from"
        ).unionByName(inc)
    w = Window.partitionBy(*[F.col(k) for k in pk]).orderBy("valid_from")
    fingerprint = F.concat_ws("\x1f", *[F.col(a).cast("string") for a in attrs])
    deduped = (
        versions.dropDuplicates([*pk, "valid_from"])
        .withColumn("__prev_fp", F.lag(fingerprint).over(w))
        .where(F.col("__prev_fp").isNull() | (fingerprint != F.col("__prev_fp")))
        .drop("__prev_fp")
    )
    w2 = Window.partitionBy(*[F.col(k) for k in pk]).orderBy("valid_from")
    return deduped.select(
        "*",
        F.lead("valid_from").over(w2).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())


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


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    pk: tuple[str, ...],
    compare_cols: tuple[str, ...],
) -> DataFrame:
    """Row-level diff between two snapshots of one table: full-outer join
    on the primary key, each row labeled added / removed / changed /
    unchanged — the audit a warehouse load runs before publishing a new
    snapshot (and the generalization of the reference's rollup
    reconciliation from aggregate-level to row-level).

    One shuffle (the full-outer join on pk); comparison is a null-safe
    equality over ``compare_cols`` so NULL→value transitions count as
    changes. At 100 TB both sides shuffle once on the same key —
    pre-bucketing both snapshots on pk makes the join shuffle-free.
    """
    from pyspark.sql import functions as F

    o = old.select(*pk, *compare_cols)
    n = new.select(*pk, *compare_cols)
    o_tag = o.select(
        *[F.col(c).alias(f"_o_{c}") for c in (*pk, *compare_cols)],
        F.lit(True).alias("_in_old"),
    )
    n_tag = n.select(
        *[F.col(c).alias(f"_n_{c}") for c in (*pk, *compare_cols)],
        F.lit(True).alias("_in_new"),
    )
    cond = [F.col(f"_o_{k}").eqNullSafe(F.col(f"_n_{k}")) for k in pk]
    j = o_tag.join(n_tag, on=cond, how="full_outer")
    same = None
    for c in compare_cols:
        eq = F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
        same = eq if same is None else (same & eq)
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    key_cols = [
        F.coalesce(F.col(f"_n_{k}"), F.col(f"_o_{k}")).alias(k) for k in pk
    ]
    return j.select(*key_cols, status.alias("diff_status"))
