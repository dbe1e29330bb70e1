"""ANN lifecycle probe at ×1000 embedding density (VERDICT r13 #7):
the first artifact in the repo at a scale where IVF geometry and
shuffle layout genuinely bite — 2M isometrically-replicated vectors
through the FULL deployment lifecycle:

  commit corpus → tick builds the persisted index (density-scaled
  sqrt(N) geometry) → probe-batch search (wall + recall vs exact) →
  retract 1% → reader-side tombstone-guarded search → maintenance tick
  (tombstone compaction + forced rebuild via the persisted obligation)
  → post-rebuild search (wall + recall vs exact over survivors)

Every stage reports wall seconds; storage stages report committed
bytes. Output: tools/ann_lifecycle_probe_r14.json (override via
SPARK_GRAFT_ANNLIFE_OUT).

Usage: python tools/ann_lifecycle_probe.py [replication_factor]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from novi_pdq_etl_project_prod_spark.session import get_spark  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scale_probe import replicate_embeddings_isometric  # noqa: E402


def _du(path: str) -> int:
    total = 0
    for dirpath, _dirnames, filenames in os.walk(path):
        for f in filenames:
            try:
                total += os.path.getsize(os.path.join(dirpath, f))
            except OSError:
                pass
    return total


def _topk_sets(rows):
    out = defaultdict(set)
    for r in rows:
        out[r.query_id].add(r.neighbor_id)
    return out


def _recall(gt, got):
    vals = [len(gt[q] & got[q]) / max(len(gt[q]), 1) for q in gt]
    return {
        "mean": round(sum(vals) / len(vals), 3),
        "min": round(min(vals), 3),
    }


def main(k: int = 1000) -> None:
    from novi_pdq_etl_project_prod_spark.operators.similarity import (
        brute_force_topk,
        default_n_lists,
        ivf_index_topk,
    )
    from novi_pdq_etl_project_prod_spark.plans.maintenance import (
        run_maintenance_tick,
    )
    from novi_pdq_etl_project_prod_spark.plans.retract import (
        read_live_table,
        read_tombstones,
        retract_docs,
    )
    from novi_pdq_etl_project_prod_spark.sources.layers import (
        commit_tables,
        read_manifest_meta,
    )

    spark = get_spark(app_name="ann_lifecycle_probe")
    scratch = tempfile.mkdtemp(prefix=f"annlife{k}_")
    root = os.path.join(scratch, "wh")
    report: dict = {"replication": k}

    # 1. corpus commit (append-shaped, counted — the ingest contract)
    t0 = time.perf_counter()
    replicate_embeddings_isometric(spark, scratch, k, copy_rest=False)
    emb = spark.read.parquet(f"{scratch}/embeddings.parquet")
    n = emb.count()
    report["n_vectors"] = n
    report["replicate_wall_sec"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    commit_tables(
        {"embeddings": emb}, root, "curated",
        append_tables=("embeddings",),
        rowcount_deltas={"embeddings": n},
    )
    report["commit_wall_sec"] = round(time.perf_counter() - t0, 1)
    report["corpus_bytes"] = _du(root)

    n_lists = default_n_lists(n)
    # the recommended pairing for sqrt(N) geometry (geometry probe r14:
    # ~12.5% probed beats the frozen-16-list 25% scan on recall)
    nprobe = max(4, n_lists // 8)
    cfg = {
        "source_table": "embeddings", "index_table": "ann",
        "n_lists": None, "sample_size": None,
        "staleness_threshold": 0.1,
    }
    report["geometry"] = {
        "n_lists": n_lists, "nprobe": nprobe,
        "probed_fraction": round(nprobe / n_lists, 4),
    }

    # 2. tick builds the index (sqrt(N) geometry, sample floats 8x)
    pre_bytes = _du(root)
    t0 = time.perf_counter()
    t1 = run_maintenance_tick(spark, root, "curated", ivf_rebuild=cfg)
    report["build_wall_sec"] = round(time.perf_counter() - t0, 1)
    assert t1["ann_rebuild"]["fired"] is True
    report["build_report"] = {
        kk: t1["ann_rebuild"][kk]
        for kk in ("n_live", "count_source", "n_lists")
        if kk in t1["ann_rebuild"]
    }
    report["index_bytes"] = _du(root) - pre_bytes

    # 3. probe-batch search + recall vs exact
    probes = emb.where(F.col("vec_id") < 10)
    t0 = time.perf_counter()
    gt = _topk_sets(brute_force_topk(emb, probes, k=10).collect())
    report["exact_search_wall_sec"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    got = _topk_sets(ivf_index_topk(
        spark, root, probes, table="ann", k=10, nprobe=nprobe
    ).collect())
    report["ivf_search_wall_sec"] = round(time.perf_counter() - t0, 1)
    report["dense_recall_at_10"] = _recall(gt, got)

    # 4. retract 1% of the corpus (every 100th id)
    drops = emb.where(F.col("vec_id") % 100 == 0).select(
        "vec_id", F.lit("retracted").alias("text")
    )
    n_drop = drops.count()
    t0 = time.perf_counter()
    retract_docs(drops, root, "curated", "annlife-1pct", id_col="vec_id")
    report["retract_wall_sec"] = round(time.perf_counter() - t0, 1)
    report["n_dropped"] = n_drop

    # 5. reader-side guard: search through the tombstone anti-join
    tomb = read_tombstones(spark, root, "curated")
    t0 = time.perf_counter()
    guarded = ivf_index_topk(
        spark, root, probes, table="ann", k=10, nprobe=nprobe,
        tombstones=tomb,
    ).collect()
    report["guarded_search_wall_sec"] = round(time.perf_counter() - t0, 1)
    assert all(r.neighbor_id % 100 != 0 for r in guarded)

    # 6. compaction day: physical delete + forced rebuild (obligation)
    t0 = time.perf_counter()
    t2 = run_maintenance_tick(
        spark, root, "curated",
        retraction_id_cols={"embeddings": "vec_id"},
        ivf_rebuild=cfg,
    )
    report["compact_and_rebuild_wall_sec"] = round(
        time.perf_counter() - t0, 1
    )
    assert t2["retractions"]["applied"] is True
    assert t2["ann_rebuild"]["fired"] is True and t2["ann_rebuild"]["forced"]
    meta = read_manifest_meta(root, "curated")
    assert meta["ann_watermark:ann"]["serviced_obligation"] == meta[
        "ann_rebuild_owed"]  # obligation stamped serviced by this index
    report["rebuild_report"] = {
        kk: t2["ann_rebuild"][kk]
        for kk in ("n_live", "count_source", "staleness")
        if kk in t2["ann_rebuild"]
    }

    # 7. post-rebuild search: no guard needed, recall vs exact survivors
    live = read_live_table(spark, root, "curated", "embeddings", "vec_id")
    t0 = time.perf_counter()
    gt2 = _topk_sets(brute_force_topk(live, probes, k=10).collect())
    report["exact_survivor_wall_sec"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    got2 = _topk_sets(ivf_index_topk(
        spark, root, probes, table="ann", k=10, nprobe=nprobe
    ).collect())
    report["post_rebuild_search_wall_sec"] = round(
        time.perf_counter() - t0, 1
    )
    assert all(
        nb % 100 != 0 for nbs in got2.values() for nb in nbs
    )
    report["post_rebuild_recall_at_10"] = _recall(gt2, got2)
    report["final_warehouse_bytes"] = _du(root)

    out_path = os.environ.get(
        "SPARK_GRAFT_ANNLIFE_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "ann_lifecycle_probe_r14.json"),
    )
    with open(out_path, "w", encoding="utf-8") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report, indent=1))
    print(f"wrote {out_path}")
    shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1000)
