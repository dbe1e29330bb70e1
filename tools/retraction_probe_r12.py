"""Round-12 scale probe: retraction cost is O(drop), not O(corpus)
(VERDICT r11 #1's "done" measurement).

Builds a layer holding the BM25 index tables and a DSIR raw-count table
for a standing corpus at x1 / x10 / x100 of the sf0.01 documents
fixture (id-shifted replicas), then retracts a FIXED 50-doc drop list
at each scale and records:

- the retract_docs wall (tombstone append + negative deltas — the claim
  is FLAT across scales);
- the committed bytes of the retraction's own segments (flat);
- the post-retraction index search wall (bm25_scores_from_index over
  tombstone-filtered tables — grows with corpus, as any search does,
  but the RETRACTION added only an anti-join against 50 ids);
- the compact_retractions wall (the documented amortized O(corpus)
  physical rewrite, measured so the trade is numbers, not prose).

Usage: python tools/retraction_probe_r12.py [max_scale]
Writes tools/retraction_probe_r12.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from novi_pdq_etl_project_prod_spark.operators.text import (  # noqa: E402
    bm25_scores_from_index,
    build_bm25_index,
    dsir_bucket_counts,
)
from novi_pdq_etl_project_prod_spark.plans.retract import (  # noqa: E402
    compact_retractions,
    read_live_table,
    retract_docs,
)
from novi_pdq_etl_project_prod_spark.session import get_spark  # noqa: E402
from novi_pdq_etl_project_prod_spark.sources.layers import (  # noqa: E402
    commit_tables,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TERMS = ("join", "vector", "stream", "window", "quality")
N_DROP = 50
B = 256


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def main() -> None:
    import tempfile

    max_scale = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    spark = get_spark(app_name="retraction-probe")
    base = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    n_base = base.count()
    results = []
    for scale in (1, 10, 100):
        if scale > max_scale:
            break
        corpus = base.select("doc_id", "text")
        for i in range(1, scale):
            corpus = corpus.unionByName(
                base.select(
                    (F.col("doc_id") + i * n_base).alias("doc_id"), "text"
                )
            )
        corpus = corpus.localCheckpoint()
        root = tempfile.mkdtemp(prefix=f"retract_probe_x{scale}_")
        idx = build_bm25_index(corpus)
        commit_tables(
            {
                "bm25_postings": idx["postings"],
                "bm25_doclens": idx["doclens"],
                "dsir_raw_buckets": dsir_bucket_counts(corpus, n_buckets=B),
            },
            root,
            "curated",
            meta={"dsir_n_buckets:dsir_raw_buckets": B},
            append_tables=("bm25_postings", "bm25_doclens",
                           "dsir_raw_buckets"),
        )
        pre_bytes = _dir_bytes(root)
        # fixed drop list: the first N_DROP base ids — same at every scale
        drop = corpus.where(F.col("doc_id") < N_DROP)

        t0 = time.perf_counter()
        rep = retract_docs(
            drop, root, "curated", f"probe-x{scale}",
            dsir_counts={"dsir_raw_buckets": B},
        )
        retract_wall = time.perf_counter() - t0
        retract_bytes = _dir_bytes(root) - pre_bytes

        t0 = time.perf_counter()
        post = read_live_table(spark, root, "curated", "bm25_postings", "id")
        dl = read_live_table(spark, root, "curated", "bm25_doclens", "id")
        n_scored = bm25_scores_from_index(post, dl, TERMS).count()
        search_wall = time.perf_counter() - t0

        t0 = time.perf_counter()
        compact_retractions(spark, root, "curated")
        compact_wall = time.perf_counter() - t0

        row = {
            "scale": scale,
            "corpus_docs": n_base * scale,
            "dropped": rep["n_docs"],
            "retract_wall_s": round(retract_wall, 2),
            "retract_commit_bytes": retract_bytes,
            "post_retraction_search_wall_s": round(search_wall, 2),
            "search_rows": n_scored,
            "compact_wall_s": round(compact_wall, 2),
        }
        print(json.dumps(row), flush=True)
        results.append(row)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "retraction_probe_r12.json")
    with open(out, "w") as fh:
        json.dump({"probe": "retraction_o_drop", "sf_dir": SF_DIR,
                   "n_drop": N_DROP, "rows": results}, fh, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
