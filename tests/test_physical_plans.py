"""Physical-plan assertions: the scale design claims, checked mechanically.

These tests read `.explain`-style plan text and assert the optimizations
the 100 TB story depends on actually fire: column pruning + filter
pushdown into the parquet scan, partition pruning on the medallion month
layout, broadcast joins for dims, map-side partial aggregation, and
top-k compiling to TakeOrderedAndProject instead of a global sort.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from novi_pdq_etl_project_prod_spark.catalog import QUERIES
from novi_pdq_etl_project_prod_spark.sources.layers import (
    read_month,
    write_month_idempotent,
)
from tests.conftest import SF_ORACLE


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_scan_prunes_columns_and_pushes_filters(spark):
    df = QUERIES["p3_month_filter"](spark, SF_ORACLE)
    plan = plan_of(df)
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    # projection pruned to the 4 referenced columns (of 16)
    m = re.search(r"ReadSchema: struct<([^>]*)>", scan)
    cols = [c.split(":")[0] for c in m.group(1).split(",")]
    assert set(cols) == {"l_orderkey", "l_linenumber", "l_quantity", "l_shipdate"}
    assert "PushedFilters: [IsNotNull(l_shipdate)" in scan


def test_month_partition_pruning(spark, tmp_path):
    li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet").withColumn(
        "yyyymm", F.year("l_shipdate") * 100 + F.month("l_shipdate")
    )
    root = str(tmp_path / "wh")
    write_month_idempotent(li.where("yyyymm in (200101, 200102)"), root, "staging", "t")
    pruned = read_month(spark, root, "staging", "t", 200102)
    plan = plan_of(pruned)
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    assert "PartitionFilters" in scan and "yyyymm" in scan
    # only one of the two month directories is listed
    assert pruned.count() == li.where("yyyymm = 200102").count()


def test_star_join_broadcasts_dims(spark):
    plan = plan_of(QUERIES["j1_star_join"](spark, SF_ORACLE))
    assert plan.count("BroadcastHashJoin") >= 3  # customer, nation, region
    assert "SortMergeJoin" not in plan or plan.count("SortMergeJoin") <= 1


def test_aggregation_is_partial_then_final(spark):
    plan = plan_of(QUERIES["a1_monthly_fact"](spark, SF_ORACLE))
    # map-side combine: two HashAggregate levels around the exchange
    assert plan.count("HashAggregate") >= 2
    assert "partial" in plan.lower()


def test_topk_compiles_to_take_ordered(spark):
    plan = plan_of(QUERIES["o3_topk"](spark, SF_ORACLE))
    assert "TakeOrderedAndProject" in plan
    # no global Sort node — the whole point of top-k pushdown
    assert not re.search(r"\bSort\b(?!MergeJoin)", plan)


def test_no_python_udfs_in_reference_queries(spark):
    """Reference-faithful operators must stay JVM-side (SURVEY.md §2.8
    policy): no BatchEvalPython / ArrowEvalPython stages in their plans."""
    for name in (
        "a1_monthly_fact", "p3_month_filter", "e1_robust_casts",
        "e4_yyyymm_derive", "j1_star_join", "dq_rollup_recon",
        "t1_pricing_summary", "w3_moving_sum", "m3_token_stats",
        "m1_exact_dedup_groups",
    ):
        plan = plan_of(QUERIES[name](spark, SF_ORACLE))
        assert "EvalPython" not in plan, f"{name} fell off the JVM path"


def test_whole_stage_codegen_covers_hot_path(spark):
    # AQE wraps the plan before execution and hides codegen annotations;
    # inspect the statically-planned version
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = plan_of(QUERIES["t1_pricing_summary"](spark, SF_ORACLE))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    # '*(n)' prefixes mark whole-stage-codegen spans; both aggregate
    # levels and the projection must be inside one
    assert plan.startswith("*(") and plan.count("*(") >= 2


def test_tpch_multiway_join_broadcasts_all_dims(spark):
    # t9 (Q7 shape): 5 joins, every one should be broadcast at oracle SF —
    # the probe-side lineitem is never shuffled before the final agg
    plan = plan_of(QUERIES["t9_volume_shipping"](spark, SF_ORACLE))
    assert plan.count("BroadcastHashJoin") == 5
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange hashpartitioning") == 1  # final agg only


def test_q21_rewrite_uses_two_narrow_shuffles(spark):
    # t19's window decorrelation: one grouped pass + one window, not the
    # 6-shuffle semi/anti-join plan of the textbook EXISTS form
    plan = plan_of(QUERIES["t19_lonely_late_suppliers"](spark, SF_ORACLE))
    assert plan.count("Exchange hashpartitioning") <= 3
    assert "SortMergeJoin" not in plan


def test_q10_limit_compiles_to_take_ordered(spark):
    plan = plan_of(QUERIES["t12_returned_items"](spark, SF_ORACLE))
    assert "TakeOrderedAndProject" in plan


def test_no_cartesian_products_in_catalog(spark):
    # cross joins are only ever against broadcast single-row aggregates
    # (scalar subqueries) or the brute-force baseline; anything else is a
    # plan regression that would be quadratic at scale
    allowed_nested_loop = {
        "t7_rich_customers",     # scalar-avg cross join (1-row broadcast)
        "t21_important_stock",   # scalar-total cross join (1-row broadcast)
        "m22_boilerplate_ngrams",  # scalar-doc-count cross join (1-row broadcast)
        "d8_heavy_hitters",      # scalar-total cross join (1-row broadcast)
        "m7_embedding_topk",     # brute-force baseline: cross join by design
        "m34_nearest_centroid",  # centroid table as 1-row broadcast
        "m36_kmeans_em_step",    # same 1-row broadcast centroid E-step
        "m2_ngram_jaccard_pairs",
        "m11_embedding_near_dup_pairs",
        "sql2_correlated_subquery",
        "d2_approx_distinct",
        "dq8_distribution_drift",  # 9-row cut-point + 1-row totals broadcasts
        "m44_pps_sample",        # scalar-max-weight cross join (1-row broadcast)
        "d22_kmv_set_overlap",   # 3-row theta-table cross join (broadcast)
        "j7_bloom_prune",        # three 1-row count aggregates composed
        "m53_copurchase_triangles",  # 1-row summary × edges × triangles
        "m54_zipf_coverage",     # 1-row total-occurrences broadcast
        "a9_association_rules",  # 1-row basket-count broadcast
        "d27_ks_statistic",      # 1-row side-totals broadcast
        "d33_kendall_tau",       # cell-grid non-equi join, |cells|²-bounded
        "m59_rank_fusion",       # brute-force channels: bounded query-set
                                 # cross join by design (the m7 baseline)
        "d35_monthly_drift",     # 1-row corpus-total broadcast
        "d36_pr_auc",            # 1-row side-totals broadcast
        "d37_expected_calibration_error",  # 1-row corpus-total broadcast
        "w12_distributed_rank",  # 1-row revenue-total broadcast
        "m62_lm_perplexity",     # 1-row vocabulary-size broadcast
        "m64_bpe_train",         # 1-row argmax-merge broadcast per round
        "d42_cohens_kappa",      # 1-row totals × 1-row marginal-product
                                 # broadcasts (label-alphabet-bounded)
        "d44_fleiss_kappa",      # 1-row totals × 1-row ΣC² broadcast
                                 # (category-alphabet-bounded)
        "m74_bm25_rank",         # 1-row corpus-stats (N, Σdl) broadcast
        "m79_bm25_from_index",   # same 1-row corpus-stats broadcast,
                                 # derived from the doclens index table
        "m78_hybrid_retrieval",  # m74's 1-row stats + the m7/m59
                                 # brute-force dense channel by design
        "m80_retracted_bm25",    # the m79 1-row corpus-stats broadcast,
                                 # post-retraction
        "m83_bm25_probe_batch",  # same 1-row stats broadcast, batched
        "m84_hybrid_batch_exact",  # m83's 1-row stats + the m7 brute
                                   # dense channel (the exact GT twin)
        "m85_hybrid_ann",        # m83's 1-row stats; dense channel is
                                 # the IVF probed-list equi-join
        "m86_rewrite_excised",   # the m79 1-row corpus-stats broadcast
                                 # over the rewritten corpus
        "m88_hybrid_ann_persisted",  # m85's shape with the dense
                                     # channel reading the persisted
                                     # index (same 1-row stats bcast)
    }
    skipped = {
        "m13_near_dup_clusters",  # iterative: builds many plans
        "m43_pair_components",    # same label-propagation loop
        "m46_pca_project",        # driver-side eigh while building the plan
    }
    # plan-building only — thread-pooled over the catalog (Catalyst
    # analysis releases the GIL inside py4j; VERDICT r08 item 4)
    from concurrent.futures import ThreadPoolExecutor

    def check(item):
        name, fn = item
        if name in skipped:
            return
        plan = plan_of(fn(spark, SF_ORACLE))
        assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
        if name not in allowed_nested_loop:
            assert "BroadcastNestedLoopJoin" not in plan, (
                f"{name} plans a nested-loop join"
            )

    with ThreadPoolExecutor(max_workers=8) as pool:
        list(pool.map(check, QUERIES.items()))


def test_dynamic_partition_pruning_on_month_layout(spark, tmp_path):
    """The 100 TB scan-pruning story beyond static pushdown: joining the
    month-partitioned fact against a FILTERED dim must inject a runtime
    partition filter (DPP) into the fact scan — only the dim-selected
    months' directories are read, even though the month predicate is not
    known until the dim side runs."""
    from pyspark.sql import functions as F

    from tests.conftest import SF_ORACLE

    fact_dir = str(tmp_path / "fact")
    li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet")
    fact = li.withColumn(
        "ship_yyyymm", F.year("l_shipdate") * 100 + F.month("l_shipdate")
    )
    fact.write.mode("overwrite").partitionBy("ship_yyyymm").parquet(fact_dir)

    months = (
        fact.select("ship_yyyymm").distinct().limit(3)
        .withColumn("wanted", F.lit(1))
    )
    months_dir = str(tmp_path / "months")
    months.write.mode("overwrite").parquet(months_dir)

    fact_p = spark.read.parquet(fact_dir)
    dim = spark.read.parquet(months_dir).where(F.col("wanted") == 1)
    joined = fact_p.join(dim, "ship_yyyymm").groupBy("ship_yyyymm").agg(
        F.count(F.lit(1)).alias("n")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    # and the result is correct: exactly the three chosen months survive
    assert joined.count() == 3


def test_bucketed_join_has_no_exchange(spark):
    """Co-bucketed tables join with NO shuffle on either side — the
    bucketing leg of the 100 TB story (SURVEY §7.1). Also value-checks
    the join against the plain (shuffling) equivalent."""
    from pyspark.sql import functions as F

    from novi_pdq_etl_project_prod_spark.sources.bucketing import (
        bucketed_join,
        write_bucketed,
    )

    fact = spark.range(10_000).select(
        (F.col("id") % 500).alias("k"), F.col("id").alias("v")
    )
    dim = spark.range(500).select(
        F.col("id").alias("k"), F.md5(F.col("id").cast("string")).alias("name")
    )
    write_bucketed(fact, "bkt_fact", ["k"], n_buckets=8, sort_cols=["k"])
    write_bucketed(dim, "bkt_dim", ["k"], n_buckets=8, sort_cols=["k"])
    # disable auto-broadcast: at test size Spark would broadcast the dim
    # (also shuffle-free, but then the bucketed layout isn't what's being
    # proven); at the 100 TB regime this join is fact⋈fact-sized where
    # broadcast isn't on the table
    prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "bkt_fact", "bkt_dim", ["k"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # values identical to the plain join
        expect = fact.join(dim, "k").count()
        assert joined.count() == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
        spark.sql("DROP TABLE IF EXISTS bkt_fact")
        spark.sql("DROP TABLE IF EXISTS bkt_dim")
