"""Worker process for the SHARDED partitioning-invariance sweep
(VERDICT r08 item 4, the suite-wall follow-up to the r08 parity shards).

Each worker takes one LPT-balanced shard of the catalog, runs every
query under the standard and hostile physical layouts in ITS OWN
SparkSession (the sweep mutates session conf, so shards must be
process-isolated, not thread-pooled), and writes per-query match
reports as JSON. Invariance checks values, not walls, so concurrent
shards are safe.

Usage: python tools/invariance_worker.py <shard> <of> <out.json> [sf_dir]
"""

from __future__ import annotations

import json
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from novi_pdq_etl_project_prod_spark.catalog import QUERIES  # noqa: E402
from novi_pdq_etl_project_prod_spark.session import get_spark  # noqa: E402
from tools.parity_worker import shard_assignment  # noqa: E402

#: (conf key, standard value, hostile value) — MUST match
#: tests/test_partitioning_invariance.py::_LAYOUT.
LAYOUT = [
    ("spark.sql.shuffle.partitions", "32", "7"),
    ("spark.sql.files.maxPartitionBytes", "8388608", "65536"),
    ("spark.sql.adaptive.coalescePartitions.enabled", "true", "false"),
]


def canon(v):
    if isinstance(v, float):
        return "f:nan" if math.isnan(v) else "f:" + v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return f"{type(v).__name__}:{v!r}"


def run_layout_comparison(spark, name: str, sf_dir: str) -> dict:
    def _run():
        rows = QUERIES[name](spark, sf_dir).collect()
        return sorted(tuple(canon(v) for v in row) for row in rows)

    for k, std, _ in LAYOUT:
        spark.conf.set(k, std)
    a = _run()
    for k, _, hostile in LAYOUT:
        spark.conf.set(k, hostile)
    b = _run()
    return {
        "match": a == b,
        "detail": (
            ""
            if a == b
            else f"layout-dependent: {len(a)} rows std vs {len(b)} hostile"
        ),
    }


def main() -> None:
    shard, of, out_path = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.001"
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark(app_name=f"inv_shard_{shard}", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    reports: dict[str, dict] = {}
    for name in shard_assignment(sorted(QUERIES), of)[shard]:
        try:
            reports[name] = run_layout_comparison(spark, name, sf_dir)
        except Exception as e:  # noqa: BLE001 — recorded as a failure
            reports[name] = {
                "match": False,
                "detail": f"worker exception {type(e).__name__}: {e}"[:500],
            }
    with open(out_path, "w", encoding="utf-8") as fh:
        json.dump(reports, fh)


if __name__ == "__main__":
    main()
