"""Declarative data-quality expectations with quarantine semantics.

The reference enforces quality by raising mid-pipeline (existence-count
checks, SURVEY §2.4 A5) — all-or-nothing. This module adds the
lakehouse-native generalization (the Delta-Live-Tables idiom): rules are
declared as SQL predicates that every row must satisfy; violating rows
can be REPORTED (per-rule counts), DROPPED, QUARANTINED into a sibling
table, or turned into a hard failure — without hand-writing the split
each time.

Design rules:

- a rule is a SQL boolean expression over the row; NULL results count as
  violations (``coalesce(expr, false)`` — an expectation you can't
  evaluate is not satisfied), matching DLT's keep-when-true semantics;
- everything is one row-local projection over the corpus — the per-rule
  flags compile into the scan, violations are counted map-side, and the
  good/quarantine split is two filters over one persisted tagged frame
  (the corpus is scanned once, not once per rule);
- the quarantined write is ATOMIC with the good write: both tables move
  through one ``commit_tables`` manifest, so a reader can never see a
  cleaned table whose quarantine hasn't landed (or vice versa), and the
  per-rule violation counts ride the same commit as manifest meta.

Scale: no shuffle at all for tagging/splitting; the report is one
map-side-combined aggregate.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Column appended by :func:`apply_expectations` — array of violated
#: rule names (empty = row passes everything).
FAILED_RULES_COL = "__failed_rules"


def _violation(expr: str):
    # NULL-evaluating expectations are violations: keep-when-TRUE
    return ~F.coalesce(F.expr(expr), F.lit(False))


def apply_expectations(
    df: DataFrame, rules: Mapping[str, str]
) -> DataFrame:
    """Tag every row with the names of the rules it violates
    (:data:`FAILED_RULES_COL`, array<string>, empty when clean). One
    row-local projection — rules compile into the scan."""
    flags = [
        F.when(_violation(expr), F.lit(name)) for name, expr in rules.items()
    ]
    tagged = F.array_compact(F.array(*flags)) if flags else F.array().cast(
        "array<string>"
    )
    return df.withColumn(FAILED_RULES_COL, tagged)


def split_expectations(
    df: DataFrame, rules: Mapping[str, str]
) -> tuple[DataFrame, DataFrame]:
    """(good, quarantine): good rows drop the tag column; quarantined
    rows keep it as the audit trail of WHY each row was held back."""
    tagged = apply_expectations(df, rules)
    good = tagged.where(F.size(F.col(FAILED_RULES_COL)) == 0).drop(
        FAILED_RULES_COL
    )
    bad = tagged.where(F.size(F.col(FAILED_RULES_COL)) > 0)
    return good, bad


def expectation_report(df: DataFrame, rules: Mapping[str, str]) -> DataFrame:
    """Per-rule violation counts over the whole frame — one map-side
    aggregate, rows scanned once for ALL rules. Output:
    (rule, n_violations, n_rows, violation_rate), one row per rule in
    declaration order plus a ``_total_rows_failing`` summary row (rows
    violating ≥1 rule — rules overlap, so it is not the column sum)."""
    aggs = [
        F.sum(_violation(expr).cast("long")).alias(name)
        for name, expr in rules.items()
    ]
    any_fail = None
    for _, expr in rules.items():
        v = _violation(expr)
        any_fail = v if any_fail is None else (any_fail | v)
    aggs.append(
        F.sum(
            (any_fail if any_fail is not None else F.lit(False)).cast("long")
        ).alias("_total_rows_failing")
    )
    aggs.append(F.count(F.lit(1)).alias("__n"))
    row = df.agg(*aggs)
    pairs = [
        F.struct(F.lit(name).alias("rule"), F.col(name).alias("n_violations"))
        for name in rules
    ] + [
        F.struct(
            F.lit("_total_rows_failing").alias("rule"),
            F.col("_total_rows_failing").alias("n_violations"),
        )
    ]
    return (
        row.select(F.explode(F.array(*pairs)).alias("r"), F.col("__n"))
        .select(
            F.col("r.rule").alias("rule"),
            F.col("r.n_violations").cast("long").alias("n_violations"),
            F.col("__n").cast("long").alias("n_rows"),
            (F.col("r.n_violations").cast("double") / F.col("__n")).alias(
                "violation_rate"
            ),
        )
        .orderBy("rule")
    )


class ExpectationError(RuntimeError):
    """Raised by ``write_with_expectations(on_violation='fail')`` when
    any row violates any rule — nothing is committed."""


def schema_gate(
    existing: DataFrame | None,
    incoming: DataFrame,
    allow: tuple[str, ...] = (),
) -> list[dict]:
    """The DECLARATIVE schema expectation (VERDICT r09 item 7): diff the
    incoming frame's schema against the committed table's
    (:func:`~novi_pdq_etl_project_prod_spark.operators.quality.schema_drift`)
    and return the drift entries whose status is NOT in ``allow`` — the
    violations a gated write must refuse. ``allow`` names any of
    ``"added"``, ``"removed"``, ``"retyped"`` (default: block all drift).
    ``existing=None`` (first write — nothing to drift from) passes.
    Pure driver-side metadata, no jobs."""
    from novi_pdq_etl_project_prod_spark.operators.quality import (
        schema_drift,
    )

    if existing is None:
        return []
    bad_status = {"added", "removed", "retyped"} - set(allow)
    return [
        d
        for d in schema_drift(existing, incoming)
        if d["status"] in bad_status
    ]


def write_with_expectations(
    spark: SparkSession,
    root: str,
    layer: str,
    table: str,
    df: DataFrame,
    rules: Mapping[str, str],
    on_violation: str = "quarantine",
    quarantine_table: str | None = None,
    schema_allow: tuple[str, ...] | None = None,
) -> dict:
    """Validated publish: split ``df`` on ``rules`` and commit.

    ``on_violation``:

    - ``"quarantine"`` (default): good rows → ``table``, violating rows
      (with their :data:`FAILED_RULES_COL` audit column) →
      ``quarantine_table`` (default ``f"{table}_quarantine"``), BOTH in
      one atomic ``commit_tables`` manifest with the per-rule counts as
      commit meta (``expectations:{table}``);
    - ``"drop"``: good rows committed, violations counted in meta but
      discarded;
    - ``"fail"``: any violation aborts with :class:`ExpectationError`
      before anything is staged.

    ``schema_allow`` (None = no schema gate, today's behavior) arms the
    METADATA expectation (VERDICT r09 item 7): the incoming frame's
    schema is diffed against the committed ``table``'s and any drift
    whose status is not in the tuple (``"added"``/``"removed"``/
    ``"retyped"``; ``()`` blocks all drift) aborts with
    :class:`ExpectationError` BEFORE anything is staged — the reviewed-
    evolution gate to run ahead of a ``merge_frames(schema_evolution=
    True)`` that would otherwise widen the target silently. Permitted
    drift rides the commit meta (``schema_drift:{table}``) as the audit
    trail.

    Returns the per-rule violation counts dict (plus ``_total_rows_failing``
    and ``n_rows``). The tagged frame is persisted through the split so
    the corpus is scanned once for validate+report+write together.
    """
    from novi_pdq_etl_project_prod_spark import cache
    from novi_pdq_etl_project_prod_spark.sources.layers import commit_tables

    if on_violation not in ("quarantine", "drop", "fail"):
        raise ValueError(f"on_violation={on_violation!r}")
    extra_meta: dict = {}
    if schema_allow is not None:
        from novi_pdq_etl_project_prod_spark.operators.quality import (
            schema_drift,
        )
        from novi_pdq_etl_project_prod_spark.sources.layers import (
            read_manifest_table,
        )

        # one single-table read (not the whole layer's reader set) and
        # ONE diff, split into blocked vs permitted
        existing = read_manifest_table(spark, root, layer, table)
        drift = [] if existing is None else schema_drift(existing, df)
        blocked = [
            d for d in drift if d["status"] not in set(schema_allow)
        ]
        if blocked:
            raise ExpectationError(
                f"{table}: unreviewed schema drift {blocked}; allowed "
                f"statuses {sorted(schema_allow)} — nothing committed"
            )
        if drift:
            extra_meta[f"schema_drift:{table}"] = drift
    # own scope: the tagged persist is released on exit without touching
    # intermediates a calling pipeline may still be filling
    with cache.scope():
        tagged = cache.track(apply_expectations(df, rules), eager=True)
        report_rows = expectation_report(tagged.drop(FAILED_RULES_COL), rules)
        counts = {r.rule: r.n_violations for r in report_rows.collect()}
        n_rows = tagged.count()
        counts["n_rows"] = n_rows
        if on_violation == "fail" and counts["_total_rows_failing"] > 0:
            raise ExpectationError(
                f"{table}: {counts['_total_rows_failing']} of {n_rows} rows "
                f"violate expectations {sorted(rules)}; nothing committed"
            )
        good = tagged.where(F.size(F.col(FAILED_RULES_COL)) == 0).drop(
            FAILED_RULES_COL
        )
        tables = {table: good}
        if on_violation == "quarantine":
            qt = quarantine_table or f"{table}_quarantine"
            tables[qt] = tagged.where(F.size(F.col(FAILED_RULES_COL)) > 0)
        commit_tables(
            tables,
            root,
            layer,
            meta={f"expectations:{table}": counts, **extra_meta},
        )
        return counts
