"""MERGE-into-snapshot and SCD Type 2 tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from novi_pdq_etl_project_prod_spark.operators.modeling import (
    merge_into_snapshot,
    scd2_apply,
)


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_merge_update_insert_delete(spark):
    target = _df(
        spark,
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
        "id int, name string, v int",
    )
    source = _df(
        spark,
        [(2, "B", 99), (3, "c", -1), (4, "d", 40)],
        "id int, name string, v int",
    )
    out = merge_into_snapshot(
        target,
        source,
        pk=("id",),
        update_cols=("name", "v"),
        delete_condition=F.col("v") < 0,
    )
    got = {(r.id, r.name, r.v) for r in out.collect()}
    # 1 untouched, 2 updated, 3 deleted (matched + v<0), 4 inserted
    assert got == {(1, "a", 10), (2, "B", 99), (4, "d", 40)}


def test_merge_without_existing_is_insert_all(spark):
    source = _df(spark, [(1, "a", 1)], "id int, name string, v int")
    out = merge_into_snapshot(None, source, pk=("id",))
    assert out.count() == 1


def test_scd2_history_tracking(spark):
    # month 1: operator 7 named "Alpha"; month 3 renamed "Alpha LLC";
    # month 5 unchanged (no new version); operator 8 appears in month 3
    m1 = _df(spark, [(7, "Alpha", 202401)], "op int, name string, effective_yyyymm int")
    m3 = _df(
        spark,
        [(7, "Alpha LLC", 202403), (8, "Beta", 202403)],
        "op int, name string, effective_yyyymm int",
    )
    m5 = _df(spark, [(7, "Alpha LLC", 202405)], "op int, name string, effective_yyyymm int")

    snap = scd2_apply(None, m1, pk=("op",), attrs=("name",))
    snap = scd2_apply(snap, m3, pk=("op",), attrs=("name",))
    snap = scd2_apply(snap, m5, pk=("op",), attrs=("name",))

    rows = {(r.op, r.name, r.valid_from, r.valid_to, r.is_current) for r in snap.collect()}
    assert rows == {
        (7, "Alpha", 202401, 202403, False),
        (7, "Alpha LLC", 202403, None, True),
        (8, "Beta", 202403, None, True),
    }
    # point-in-time query: who was operator 7 in 202402?
    asof = snap.where(
        (F.col("op") == 7)
        & (F.col("valid_from") <= 202402)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > 202402))
    ).collect()
    assert len(asof) == 1 and asof[0].name == "Alpha"


def test_scd2_is_idempotent_on_replay(spark):
    m1 = _df(spark, [(7, "Alpha", 202401)], "op int, name string, effective_yyyymm int")
    snap1 = scd2_apply(None, m1, pk=("op",), attrs=("name",))
    snap2 = scd2_apply(snap1, m1, pk=("op",), attrs=("name",))
    a = {tuple(r) for r in snap1.collect()}
    b = {tuple(r) for r in snap2.collect()}
    assert a == b


def test_snapshot_diff_all_four_statuses(spark):
    from novi_pdq_etl_project_prod_spark.operators.modeling import snapshot_diff

    old = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, "b"), (3, None, "c"), (4, 40.0, "d")],
        "pk int, price double, status string",
    )
    new = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 25.0, "b"), (3, 30.0, "c"), (5, 50.0, "e")],
        "pk int, price double, status string",
    )
    diff = {
        r.pk: r.diff_status
        for r in snapshot_diff(
            old, new, pk=("pk",), compare_cols=("price", "status")
        ).collect()
    }
    # NULL -> 30.0 must count as changed (null-safe compare)
    assert diff == {1: "unchanged", 2: "changed", 3: "changed",
                    4: "removed", 5: "added"}
