"""Declarative expectations: tagging, splitting, reporting, and the
atomic quarantine publish (round 8)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from novi_pdq_etl_project_prod_spark.operators import expectations as X


RULES = {
    "pos": "v > 0",
    "small": "v < 100",
    "named": "name IS NOT NULL",
}


def _df(spark):
    return spark.createDataFrame(
        [
            (1, 5, "a"),       # clean
            (2, -3, "b"),      # violates pos
            (3, 500, None),    # violates small + named
            (4, None, "d"),    # v NULL -> violates pos AND small (NULL=fail)
        ],
        "id int, v int, name string",
    )


def test_apply_and_split(spark):
    good, bad = X.split_expectations(_df(spark), RULES)
    assert {r.id for r in good.collect()} == {1}
    got = {r.id: sorted(r[X.FAILED_RULES_COL]) for r in bad.collect()}
    assert got == {
        2: ["pos"],
        3: ["named", "small"],
        4: ["pos", "small"],
    }
    assert X.FAILED_RULES_COL not in good.columns


def test_expectation_report_counts(spark):
    rep = {r.rule: r for r in X.expectation_report(_df(spark), RULES).collect()}
    assert rep["pos"].n_violations == 2
    assert rep["small"].n_violations == 2
    assert rep["named"].n_violations == 1
    # rules overlap: 3 distinct failing rows, not 5
    assert rep["_total_rows_failing"].n_violations == 3
    assert rep["pos"].n_rows == 4
    assert rep["pos"].violation_rate == pytest.approx(0.5)


def test_write_quarantine_is_atomic_and_audited(spark, tmp_path):
    from novi_pdq_etl_project_prod_spark.sources.layers import (
        read_manifest_meta,
        read_manifest_tables,
    )

    root = str(tmp_path)
    counts = X.write_with_expectations(
        spark, root, "curated", "facts", _df(spark), RULES
    )
    assert counts["_total_rows_failing"] == 3 and counts["n_rows"] == 4
    tables = read_manifest_tables(spark, root, "curated")
    # good and quarantine landed in ONE manifest commit
    assert set(tables) == {"facts", "facts_quarantine"}
    assert {r.id for r in tables["facts"].collect()} == {1}
    q = {r.id: sorted(r[X.FAILED_RULES_COL])
         for r in tables["facts_quarantine"].collect()}
    assert q == {2: ["pos"], 3: ["named", "small"], 4: ["pos", "small"]}
    # per-rule counts ride the same commit as meta
    meta = read_manifest_meta(root, "curated")["expectations:facts"]
    assert meta["pos"] == 2 and meta["named"] == 1


def test_write_drop_discards_violations(spark, tmp_path):
    from novi_pdq_etl_project_prod_spark.sources.layers import (
        read_manifest_tables,
    )

    root = str(tmp_path)
    X.write_with_expectations(
        spark, root, "curated", "facts", _df(spark), RULES, on_violation="drop"
    )
    tables = read_manifest_tables(spark, root, "curated")
    assert set(tables) == {"facts"}
    assert {r.id for r in tables["facts"].collect()} == {1}


def test_write_fail_commits_nothing(spark, tmp_path):
    from novi_pdq_etl_project_prod_spark.sources.layers import read_manifest

    root = str(tmp_path)
    with pytest.raises(X.ExpectationError, match="3 of 4 rows"):
        X.write_with_expectations(
            spark, root, "curated", "facts", _df(spark), RULES,
            on_violation="fail",
        )
    assert read_manifest(root, "curated") == {}
    # a clean frame passes the fail gate and commits
    clean = _df(spark).where("id = 1")
    counts = X.write_with_expectations(
        spark, root, "curated", "facts", clean, RULES, on_violation="fail"
    )
    assert counts["_total_rows_failing"] == 0
    assert set(read_manifest(root, "curated")) == {"facts"}


def test_no_rules_passes_everything(spark, tmp_path):
    good, bad = X.split_expectations(_df(spark), {})
    assert good.count() == 4 and bad.count() == 0


def test_scope_isolation_preserves_caller_cache(spark, tmp_path):
    """The validated write must not release a calling pipeline's tracked
    intermediates (it runs in its own cache scope)."""
    from novi_pdq_etl_project_prod_spark import cache

    cache.clear_session_state(spark)
    mine = cache.track(_df(spark), eager=True)
    X.write_with_expectations(
        spark, str(tmp_path), "curated", "facts", _df(spark), RULES
    )
    assert mine.storageLevel.useMemory, "caller's persist was released"
    assert cache.release() == 1


def test_schema_gate_blocks_unreviewed_drift(spark, tmp_path):
    """VERDICT r09 item 7: schema drift as a declarative expectation.
    With schema_allow armed, an incoming frame whose schema drifts from
    the committed table in a non-allowed way aborts BEFORE staging; an
    allowed drift commits and rides the manifest meta as the audit
    trail. The first write (no committed table) always passes."""
    from novi_pdq_etl_project_prod_spark.sources.layers import (
        read_manifest_meta,
        read_manifest_tables,
    )

    root = str(tmp_path)
    # first write: nothing to drift from
    X.write_with_expectations(
        spark, root, "curated", "facts", _df(spark), RULES, schema_allow=()
    )

    # retyped column (v int -> string): blocked, nothing committed
    retyped = _df(spark).withColumn("v", F.col("v").cast("string"))
    with pytest.raises(X.ExpectationError, match="retyped"):
        X.write_with_expectations(
            spark, root, "curated", "facts", retyped, RULES, schema_allow=()
        )
    # added column: blocked by default...
    widened = _df(spark).withColumn("extra", F.lit(True))
    with pytest.raises(X.ExpectationError, match="added"):
        X.write_with_expectations(
            spark, root, "curated", "facts", widened, RULES, schema_allow=()
        )
    before = read_manifest_tables(spark, root, "curated")["facts"]
    assert "extra" not in before.columns

    # ...and committed when the evolution is reviewed (allow added),
    # with the drift recorded in the commit meta
    X.write_with_expectations(
        spark, root, "curated", "facts", widened, RULES,
        schema_allow=("added",),
    )
    after = read_manifest_tables(spark, root, "curated")["facts"]
    assert "extra" in after.columns
    drift = read_manifest_meta(root, "curated").get("schema_drift:facts")
    assert drift == [
        {"column": "extra", "status": "added", "old_type": None,
         "new_type": "boolean"}
    ]


def test_schema_gate_none_means_ungated(spark, tmp_path):
    """schema_allow=None (the default) keeps today's behavior: no
    metadata gate, any schema commits."""
    root = str(tmp_path)
    X.write_with_expectations(
        spark, root, "curated", "facts", _df(spark), RULES
    )
    widened = _df(spark).withColumn("extra", F.lit(1))
    X.write_with_expectations(
        spark, root, "curated", "facts", widened, RULES
    )


def test_schema_gate_helper_contract(spark):
    """The declarative helper itself: None existing passes everything;
    otherwise exactly the non-allowed drift statuses are returned."""
    old = spark.createDataFrame([(1, "a")], "id int, v string")
    new = spark.createDataFrame([(1, 1.0, True)], "id int, v double, w boolean")
    assert X.schema_gate(None, new) == []
    blocked = X.schema_gate(old, new, allow=("added",))
    assert [(d["column"], d["status"]) for d in blocked] == [("v", "retyped")]
    assert X.schema_gate(old, new, allow=("added", "retyped")) == []
