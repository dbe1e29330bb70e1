"""Scale probe: measure headline-query scaling beyond the provided
fixtures by self-replicating sf0.1 with key offsets (10× ≈ sf1: 6M
lineitem rows) into /tmp, then timing the same catalog queries.

This validates the 100 TB design claims empirically at the largest scale
the machine holds: wall-clock should grow ~linearly for scans/aggs and
stay shuffle-bound (not quadratic) for joins and LSH ops. Results land
in SCALE.md.

Usage: python tools/scale_probe.py [replication_factor]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from novi_pdq_etl_project_prod_spark.catalog import QUERIES
from novi_pdq_etl_project_prod_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
PROBE_QUERIES = [
    "a1_monthly_fact",
    "j1_star_join",
    "t1_pricing_summary",
    "x2_salted_agg",
    "m1_exact_dedup_groups",
    "m8_minhash_near_dups",
    "t9_volume_shipping",
    "t19_lonely_late_suppliers",
    "m19_decontaminate",
    "x7_gap_fill",
    "m26_sequence_packing",
    "d6_price_histogram",
    "d8_heavy_hitters",
    "x6_click_attribution",
    "x8_native_session_window",
]


def replicate(spark, out_dir: str, k: int) -> None:
    """k copies of the fact tables with shifted keys; dims stay single
    (star-schema semantics: facts grow, dims don't)."""
    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    o = spark.read.parquet(f"{SRC}/orders.parquet")
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    # events: read ts as raw long nanos (plain BIGINT in the replica —
    # session.read_events handles either form); replicate by shifting
    # user_id/event_id so months are unchanged but users/rows grow k×
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{SRC}/events.parquet")
    max_ok = o.agg(F.max("o_orderkey")).collect()[0][0] + 1
    max_doc = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    max_uid = ev.agg(F.max("user_id")).collect()[0][0] + 1
    max_eid = ev.agg(F.max("event_id")).collect()[0][0] + 1

    def shifted(df, col, step, i):
        return df.withColumn(col, F.col(col) + F.lit(i * step))

    li_k = li
    o_k = o
    d_k = docs
    e_k = ev
    for i in range(1, k):
        li_k = li_k.unionByName(shifted(li, "l_orderkey", max_ok, i))
        o_k = o_k.unionByName(shifted(o, "o_orderkey", max_ok, i))
        d_k = d_k.unionByName(shifted(docs, "doc_id", max_doc, i))
        e_k = e_k.unionByName(
            shifted(shifted(ev, "user_id", max_uid, i), "event_id", max_eid, i)
        )
    li_k.write.mode("overwrite").parquet(f"{out_dir}/lineitem.parquet")
    o_k.write.mode("overwrite").parquet(f"{out_dir}/orders.parquet")
    d_k.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")
    e_k.write.mode("overwrite").parquet(f"{out_dir}/events.parquet")
    for t in ("customer", "supplier", "part", "nation", "region", "embeddings"):
        shutil.copy(f"{SRC}/{t}.parquet", f"{out_dir}/{t}.parquet")


def replicate_docs_distinct(spark, out_dir: str, k: int) -> None:
    """k copies of documents with SHIFTED TOKENS, not just shifted ids:
    every token in replica i gets an ``x<i>`` suffix, so replicas are
    neither exact nor near duplicates of their source (all shingles
    differ), while each replica preserves the original internal near-dup
    structure (both members of a planted pair get the same suffix, so
    their Jaccard is unchanged). This isolates algorithmic scaling of
    m8/m19 from the replication artifact where key-only replication
    makes every replica a true near-dup of its source (candidate pairs
    then grow ~k² per original, which is a property of the synthetic
    data, not the algorithm)."""
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    max_doc = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    reps = spark.range(k).withColumnRenamed("id", "rep")
    out = (
        docs.crossJoin(F.broadcast(reps))
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * max_doc)
        .withColumn(
            "text",
            F.when(F.col("rep") == 0, F.col("text")).otherwise(
                F.expr(r"regexp_replace(text, '(\\S+)', concat('$1x', rep))")
            ),
        )
        .drop("rep")
    )
    out.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")
    for t in (
        "lineitem", "orders", "customer", "supplier", "part", "nation",
        "region", "embeddings", "events",
    ):
        shutil.copy(f"{SRC}/{t}.parquet", f"{out_dir}/{t}.parquet")


def main_docs(k: int) -> None:
    """100×-documents probe for the similarity ops (m8, m19)."""
    spark = get_spark(app_name="scale_probe_docs")
    out_dir = tempfile.mkdtemp(prefix=f"docsx{k}_")
    t0 = time.perf_counter()
    replicate_docs_distinct(spark, out_dir, k)
    n = spark.read.parquet(f"{out_dir}/documents.parquet").count()
    print(f"replicated docs x{k} ({n} rows) in {time.perf_counter()-t0:.1f}s")

    probe = [
        "m8_minhash_near_dups",
        "m19_decontaminate",
        "m22_boilerplate_ngrams",
        "m26_sequence_packing",
    ]
    results = {}
    for sf_label, sf_dir in (("sf0.1", SRC), (f"docs x{k}", out_dir)):
        timings = {}
        for name in probe:
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 2)
        results[sf_label] = timings
        print(sf_label, json.dumps(timings))
    for name in probe:
        a, b = results["sf0.1"][name], results[f"docs x{k}"][name]
        print(f"  {name}: {a}s -> {b}s  ({b/max(a,0.01):.1f}x wall for {k}x docs)")
    shutil.rmtree(out_dir, ignore_errors=True)


def main() -> None:
    if "--docs" in sys.argv:
        main_docs(int(sys.argv[sys.argv.index("--docs") + 1]))
        return
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark(app_name="scale_probe")
    out_dir = tempfile.mkdtemp(prefix=f"sfx{k}_")
    t0 = time.perf_counter()
    replicate(spark, out_dir, k)
    print(f"replicated x{k} in {time.perf_counter()-t0:.1f}s -> {out_dir}")

    results = {}
    for sf_label, sf_dir in (("sf0.1", SRC), (f"sf0.1x{k}", out_dir)):
        timings = {}
        for name in PROBE_QUERIES:
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 2)
        results[sf_label] = timings
        print(sf_label, json.dumps(timings))

    print("\nscaling factor per query (x{} data):".format(k))
    for name in PROBE_QUERIES:
        a, b = results["sf0.1"][name], results[f"sf0.1x{k}"][name]
        print(f"  {name}: {a}s -> {b}s  ({b/max(a,0.01):.1f}x wall for {k}x rows)")
    shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
