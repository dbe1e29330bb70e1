"""Invariant tests for the round-2 layout operators: sequence packing
(operators/packing.py) and z-order + footer-stats file skipping
(sources/skipping.py). The catalog parity test certifies values against
DuckDB; these pin the *semantic invariants* the oracle can't express —
pack budget bounds, partition-layout independence, and that pruning
actually skips files without changing the answer.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from novi_pdq_etl_project_prod_spark.operators.packing import (
    pack_fill_stats,
    pack_sequences,
)
from novi_pdq_etl_project_prod_spark.sources.skipping import (
    file_minmax_stats,
    pruned_read,
    write_zordered,
    zorder_col,
    zorder_col_multi,
)

SF_SMOKE = "/root/testdata/sf0.001"
BUDGET = 512


@pytest.fixture(scope="module")
def assignments(spark):
    docs = spark.read.parquet(os.path.join(SF_SMOKE, "documents.parquet"))
    sized = docs.select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("tok"),
    )
    return pack_sequences(
        sized, id_col="doc_id", token_count="tok", budget=BUDGET
    ).cache()


def test_pack_budget_invariant(assignments):
    # Contiguous fill: every row STARTS inside its pack's budget window,
    # so a pack exceeds the budget by at most its largest member minus 1.
    stats = (
        assignments.groupBy("pack_id")
        .agg(
            F.sum("n_tokens").alias("pack_tokens"),
            F.max("n_tokens").alias("max_tok"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .collect()
    )
    assert stats, "no packs produced"
    for r in stats:
        assert r.pack_tokens < BUDGET + r.max_tok, (
            f"pack {r.pack_id} = {r.pack_tokens} tokens "
            f"(max member {r.max_tok}) breaches the fill bound"
        )


def test_pack_oversize_flag(assignments):
    flagged = assignments.where("oversize").where(
        F.col("n_tokens") <= BUDGET
    )
    missed = assignments.where(~F.col("oversize")).where(
        F.col("n_tokens") > BUDGET
    )
    assert flagged.count() == 0 and missed.count() == 0


def test_pack_assignment_partition_independent(spark, assignments):
    # Content-addressed bucketing + id ordering ⇒ the SAME pack for every
    # row no matter how the input is partitioned (the 100 TB guarantee:
    # re-running on a differently-split corpus reproduces the layout).
    docs = spark.read.parquet(os.path.join(SF_SMOKE, "documents.parquet"))
    sized = docs.select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("tok"),
    ).repartition(17, "text")
    again = pack_sequences(sized, id_col="doc_id", token_count="tok", budget=BUDGET)
    diff = (
        assignments.select("doc_id", "pack_id")
        .exceptAll(again.select("doc_id", "pack_id"))
        .count()
    )
    assert diff == 0


def test_pack_fill_stats_consistency(assignments):
    fills = pack_fill_stats(assignments, budget=BUDGET)
    row = fills.agg(
        F.sum("n_docs").alias("docs"), F.sum("pack_tokens").alias("tok")
    ).collect()[0]
    src = assignments.agg(
        F.count(F.lit(1)).alias("docs"), F.sum("n_tokens").alias("tok")
    ).collect()[0]
    assert (row.docs, row.tok) == (src.docs, src.tok)


@pytest.fixture(scope="module")
def zordered_orders(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("zorder") / "orders_z")
    orders = (
        spark.read.parquet(os.path.join(SF_SMOKE, "orders.parquet"))
        .withColumn("x", (F.col("o_custkey") % 256).cast("long"))
        .withColumn(
            "y",
            ((F.year("o_orderdate") * 12 + F.month("o_orderdate")) % 256).cast(
                "long"
            ),
        )
    )
    write_zordered(orders, path, cols=["x", "y"], n_files=8, bits=8)
    return path


def test_zorder_layout_written(spark, zordered_orders):
    files = [
        f for f in os.listdir(zordered_orders) if f.endswith(".parquet")
    ]
    assert len(files) > 1, "range partitioning produced a single file"
    stats = file_minmax_stats(zordered_orders, ["x", "y"])
    assert all(st["x"][0] is not None for st in stats)
    # Clustering quality: each file covers a strict subset of the x range
    # (the whole point of the curve — un-clustered writes give every file
    # the full [0, 255] span and nothing can ever be skipped).
    spans = [st["x"][1] - st["x"][0] for st in stats]
    assert min(spans) < 255, f"no file has a sub-range x span: {spans}"


def test_pruned_read_skips_files_and_matches_full_scan(spark, zordered_orders):
    pred = {"x": (0, 31), "y": (0, 63)}
    df, files_read, files_total = pruned_read(spark, zordered_orders, pred)
    assert files_read < files_total, "footer stats pruned nothing"
    full = (
        spark.read.parquet(zordered_orders)
        .where(F.col("x").between(0, 31))
        .where(F.col("y").between(0, 63))
    )
    assert df.count() == full.count()
    assert df.exceptAll(full).count() == 0 and full.exceptAll(df).count() == 0


def test_pruned_read_empty_predicate_window(spark, zordered_orders):
    # A window outside every file's range reads zero files and zero rows.
    df, files_read, files_total = pruned_read(
        spark, zordered_orders, {"x": (10_000, 20_000)}
    )
    assert files_read == 0 and df.count() == 0


def test_zorder_col_interleaves_bits(spark):
    # (x=0b11, y=0b00) -> even positions -> 0b0101 = 5;
    # (x=0b00, y=0b11) -> odd positions  -> 0b1010 = 10.
    rows = (
        spark.range(1)
        .select(
            zorder_col(F.lit(3), F.lit(0), bits=2).alias("a"),
            zorder_col(F.lit(0), F.lit(3), bits=2).alias("b"),
            zorder_col(F.lit(3), F.lit(3), bits=2).alias("c"),
        )
        .collect()[0]
    )
    assert (rows.a, rows.b, rows.c) == (5, 10, 15)


def test_zorder3_prune_three_predicates(spark, tmp_path):
    # 3-D clustering: a point-ish predicate on all three dimensions
    # should skip most files, and the surviving scan must equal the
    # full-scan filter exactly.
    from pyspark.sql import functions as F

    li = (
        spark.read.parquet(os.path.join(SF_SMOKE, "lineitem.parquet"))
        .withColumn("a", (F.col("l_suppkey") % 64).cast("long"))
        .withColumn("b", (F.col("l_partkey") % 64).cast("long"))
        .withColumn("c", F.month("l_shipdate").cast("long"))
    )
    path = str(tmp_path / "li_z3")
    write_zordered(li, path, cols=["a", "b", "c"], n_files=16, bits=6)
    pred = {"a": (0, 15), "b": (0, 15), "c": (1, 6)}
    df, files_read, files_total = pruned_read(spark, path, pred)
    assert files_total == 16 and files_read < files_total
    full = spark.read.parquet(path)
    for col, (lo, hi) in pred.items():
        full = full.where(F.col(col).between(lo, hi))
    assert df.count() == full.count() > 0
    assert df.exceptAll(full).count() == 0


def test_zorder_multi_bit_overflow_guard(spark):
    with pytest.raises(ValueError):
        zorder_col_multi(["a", "b", "c"], bits=21)


# ---------------------------------------------------------------------------
# OPTIMIZE scheduler over the clustering audit (VERDICT r06 item 5)
# ---------------------------------------------------------------------------

def _shuffled_table(spark, root, n=4096, files=64):
    """A 2-col int table written in hash-shuffled order: every file's
    (x, y) [min, max] spans the whole domain → worst-case clustering."""
    from novi_pdq_etl_project_prod_spark.sources.layers import table_path

    df = spark.range(n).select(
        (F.col("id") % 64).cast("long").alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
        F.col("id").alias("payload"),
    )
    path = table_path(root, "curated", "facts")
    df.orderBy(F.xxhash64("payload")).repartition(files).write.mode(
        "overwrite"
    ).parquet(path)
    return df


def test_maybe_optimize_fires_once_then_noops(spark, tmp_path):
    from novi_pdq_etl_project_prod_spark.sources.layers import (
        resolve_table_path,
        table_path,
    )
    from novi_pdq_etl_project_prod_spark.sources.skipping import (
        clustering_report,
        maybe_optimize,
    )

    root = str(tmp_path)
    df = _shuffled_table(spark, root)
    path = table_path(root, "curated", "facts")
    before = clustering_report(resolve_table_path(path), ["x", "y"])
    # degraded layout: every file spans the whole domain
    assert before["columns"]["x"]["avg_overlap"] / (before["n_files"] - 1) > 0.9

    d1 = maybe_optimize(spark, root, "curated", "facts", ["x", "y"])
    assert d1["fired"] is True
    assert max(d1["after"].values()) < max(d1["clustering"].values())
    # data intact through the rewrite
    live = spark.read.parquet(resolve_table_path(path))
    assert live.count() == df.count()
    assert live.agg(F.sum("payload")).first()[0] == df.agg(F.sum("payload")).first()[0]

    # freshly clustered → the policy must not churn
    d2 = maybe_optimize(spark, root, "curated", "facts", ["x", "y"])
    assert d2["fired"] is False and "conflict" not in d2


def test_maybe_optimize_crash_leaves_old_layout_readable(spark, tmp_path, monkeypatch):
    from novi_pdq_etl_project_prod_spark.sources import layers
    from novi_pdq_etl_project_prod_spark.sources.skipping import maybe_optimize

    root = str(tmp_path)
    df = _shuffled_table(spark, root)
    path = layers.table_path(root, "curated", "facts")

    class Boom(RuntimeError):
        pass

    def no_commit(*a, **k):
        raise Boom("crash between z-order write and pointer commit")

    monkeypatch.setattr(layers, "_commit_pointer", no_commit)
    with pytest.raises(Boom):
        maybe_optimize(spark, root, "curated", "facts", ["x", "y"])
    monkeypatch.undo()
    # reader still sees the complete pre-optimize table
    live = spark.read.parquet(layers.resolve_table_path(path))
    assert live.count() == df.count()
    assert live.agg(F.sum("payload")).first()[0] == df.agg(F.sum("payload")).first()[0]
    # and a later (healthy) call completes the job
    d = maybe_optimize(spark, root, "curated", "facts", ["x", "y"])
    assert d["fired"] is True


def test_maybe_optimize_yields_to_concurrent_writer(spark, tmp_path, monkeypatch):
    """CAS: a writer that commits between the audit read and the
    re-cluster commit wins; the optimize aborts with conflict=True and
    the writer's data is untouched."""
    from novi_pdq_etl_project_prod_spark.sources import layers, skipping

    root = str(tmp_path)
    _shuffled_table(spark, root)
    newer = spark.range(17).select(
        F.col("id").alias("x"), F.col("id").alias("y"),
        F.col("id").alias("payload"),
    )
    real_write = skipping.write_zordered

    def race_then_write(df, snap_dir, cols, n_files, bits=12):
        layers.overwrite_snapshot(newer, root, "curated", "facts")
        real_write(df, snap_dir, cols, n_files, bits)

    monkeypatch.setattr(skipping, "write_zordered", race_then_write)
    d = skipping.maybe_optimize(spark, root, "curated", "facts", ["x", "y"])
    assert d.get("conflict") is True and d["fired"] is False
    live = spark.read.parquet(
        layers.resolve_table_path(layers.table_path(root, "curated", "facts"))
    )
    assert live.count() == 17  # the concurrent writer's table survived


def test_maybe_optimize_composes_with_month_partitioned_tables(spark, tmp_path):
    """A month-partitioned table re-clustered by the policy keeps its
    read_month semantics: yyyymm directories become a data column in the
    z-ordered snapshot (Spark recovers partition values on read), so
    month slices stay identical — pruning moves from directory listing
    to footer min/max skipping on the z-ordered files."""
    from novi_pdq_etl_project_prod_spark.sources.layers import (
        read_month,
        write_month_idempotent,
    )
    from novi_pdq_etl_project_prod_spark.sources.skipping import maybe_optimize

    root = str(tmp_path)
    df = spark.range(4096).select(
        (F.lit(200101) + (F.col("id") % 3)).cast("int").alias("yyyymm"),
        (F.col("id") % 64).cast("long").alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
        F.col("id").alias("payload"),
    )
    # hash-shuffled month files → degraded layout inside each month
    write_month_idempotent(
        df.orderBy(F.xxhash64("payload")).repartition(8), root, "curated", "facts"
    )
    before = {
        r.payload for r in read_month(spark, root, "curated", "facts", 200102).collect()
    }
    d = maybe_optimize(spark, root, "curated", "facts", ["x", "y"])
    assert d["fired"] is True
    after = {
        r.payload for r in read_month(spark, root, "curated", "facts", 200102).collect()
    }
    assert after == before and len(after) > 0
