"""Retraction-marker growth probe (VERDICT r12 #3): measure what an
unbounded `retraction:<id>` manifest-meta population actually costs —
every commit on the layer rewrites the full manifest doc, so marker
count taxes EVERY writer — then fold the markers into the
applied_retractions table (`plans.retract.fold_retraction_markers`) and
measure the recovery, plus an exactly-once check that a LATE replay of
a folded retraction is still a no-op.

Synthetic markers are accumulated with the same commit path and the
same meta payload shape real retractions write ({"n_docs": 1,
"dsir_tables": [...]}) — batched 50 per commit so the probe costs ~20
commits rather than 10³ full retraction cycles; the timed
`retract_docs` calls at each checkpoint are REAL retractions.

    SPARK_GRAFT_MARKER_PROBE_OUT=tools/retraction_marker_probe_r13.json \
        python tools/retraction_marker_probe.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from novi_pdq_etl_project_prod_spark.session import get_spark  # noqa: E402

CHECKPOINTS = (0, 250, 500, 1000)
BATCH = 50
B = 64


def _manifest_bytes(root: str, layer: str) -> int:
    from novi_pdq_etl_project_prod_spark.sources.layers import (
        _manifest_path,
        resolve_table_path,
    )

    live = resolve_table_path(_manifest_path(root, layer))
    return os.path.getsize(os.path.join(live, "manifest.json"))


def _meta_read_wall(root: str, layer: str, n: int = 5) -> float:
    from novi_pdq_etl_project_prod_spark.sources.layers import (
        read_manifest_meta,
    )

    walls = []
    for _ in range(n):
        t0 = time.perf_counter()
        read_manifest_meta(root, layer)
        walls.append(time.perf_counter() - t0)
    return sorted(walls)[len(walls) // 2]


def main() -> None:
    from novi_pdq_etl_project_prod_spark.operators.text import (
        dsir_bucket_counts,
    )
    from novi_pdq_etl_project_prod_spark.plans.retract import (
        fold_retraction_markers,
        retract_docs,
    )
    from novi_pdq_etl_project_prod_spark.sources.layers import (
        commit_tables,
        read_manifest_meta,
    )

    spark = get_spark(app_name="retraction_marker_probe")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="marker_probe_")
    layer = "curated"

    def _doc(i: int):
        return spark.createDataFrame(
            [(100_000 + i, f"probe document number {i} alpha beta gamma")],
            "doc_id long, text string",
        )

    # seed the standing corpus + count table the real retractions hit
    seed = spark.createDataFrame(
        [(100_000 + i, f"probe document number {i} alpha beta gamma")
         for i in range(2000)],
        "doc_id long, text string",
    )
    commit_tables(
        {"dsir_raw_buckets": dsir_bucket_counts(seed, n_buckets=B)},
        root,
        layer,
        meta={"dsir_n_buckets:dsir_raw_buckets": B},
        append_tables=("dsir_raw_buckets",),
    )

    rows = []
    n_markers = 0
    real_used = 0
    for target in CHECKPOINTS:
        while n_markers < target:
            batch = {
                f"retraction:synth-{n_markers + j}": {
                    "n_docs": 1,
                    "dsir_tables": ["dsir_raw_buckets"],
                }
                for j in range(min(BATCH, target - n_markers))
            }
            commit_tables({}, root, layer, meta=batch)
            n_markers += len(batch)
        t0 = time.perf_counter()
        retract_docs(
            _doc(real_used), root, layer, f"real-{real_used}",
            dsir_counts={"dsir_raw_buckets": B},
        )
        retract_wall = time.perf_counter() - t0
        n_markers += 1
        real_used += 1
        rows.append({
            "markers": n_markers,
            "manifest_bytes": _manifest_bytes(root, layer),
            "meta_read_wall_s": round(_meta_read_wall(root, layer), 5),
            "retract_docs_wall_s": round(retract_wall, 3),
        })
        print(json.dumps(rows[-1]))

    t0 = time.perf_counter()
    rep = fold_retraction_markers(spark, root, layer)
    fold_wall = time.perf_counter() - t0
    assert rep["applied"] and rep["n_folded"] == n_markers, rep

    after = {
        "manifest_bytes": _manifest_bytes(root, layer),
        "meta_read_wall_s": round(_meta_read_wall(root, layer), 5),
        "fold_wall_s": round(fold_wall, 3),
        "n_folded": rep["n_folded"],
    }
    print("after fold:", json.dumps(after))

    # exactly-once across the fold: a LATE replay of a folded REAL
    # retraction is a no-op
    replay = retract_docs(
        _doc(0), root, layer, "real-0",
        dsir_counts={"dsir_raw_buckets": B},
    )
    assert replay["applied"] is False, replay
    meta = read_manifest_meta(root, layer)
    assert not any(k.startswith("retraction:") for k in meta)

    out = {
        "growth": rows,
        "after_fold": after,
        "replay_after_fold_noop": True,
        "note": (
            "synthetic markers share the real marker payload shape and "
            "commit path; retract_docs walls at each checkpoint are real "
            "retractions against a 2000-doc seeded DSIR table"
        ),
    }
    out_path = os.environ.get("SPARK_GRAFT_MARKER_PROBE_OUT")
    if out_path:
        with open(out_path, "w", encoding="utf-8") as fh:
            json.dump(out, fh, indent=1)
        print(f"wrote {out_path}")
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
