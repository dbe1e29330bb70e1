"""Worker process for the SHARDED oracle-parity run (VERDICT r07 item 8).

Runs one shard of the oracled catalog (``sorted(ORACLES)[shard::of]``)
against DuckDB at sf0.01 with its own SparkSession, and writes the
per-query comparison reports as JSON. Parity checks VALUES, not walls,
so concurrent shards are safe — unlike bench timings, which stay
serialized (SCALE.md methodology).

Usage: python tools/parity_worker.py <shard> <of> <out.json> [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from novi_pdq_etl_project_prod_spark.catalog import ORACLES, QUERIES  # noqa: E402
from novi_pdq_etl_project_prod_spark.session import get_spark  # noqa: E402
from tests.oracle_harness import compare_query  # noqa: E402


def _query_weights() -> dict[str, float]:
    """Per-query cost estimates from the newest BENCH_LOCAL file (sf0.1
    walls are a fine RELATIVE proxy for sf0.01 parity cost); queries
    without a timing get the median weight."""
    import glob
    import re

    files = sorted(
        glob.glob(os.path.join(REPO, "BENCH_LOCAL_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)),
    )
    for path in reversed(files):
        try:
            with open(path, encoding="utf-8") as fh:
                q = json.load(fh).get("queries") or {}
            if q:
                return {k: float(v) for k, v in q.items()}
        except (OSError, ValueError):
            continue
    return {}


def shard_assignment(names: list[str], n_shards: int) -> list[list[str]]:
    """Deterministic LPT (longest-processing-time) balancing: heaviest
    query first onto the currently-lightest shard, so the sharded parity
    wall is bounded by the heaviest SHARD, not the unlucky round-robin
    slice (VERDICT r08 item 4 — the 8-shard wall was dominated by one
    index slice that drew several multi-second queries)."""
    weights = _query_weights()
    med = sorted(weights.values())[len(weights) // 2] if weights else 1.0
    loads = [0.0] * n_shards
    shards: list[list[str]] = [[] for _ in range(n_shards)]
    for name in sorted(names, key=lambda n: (-weights.get(n, med), n)):
        i = loads.index(min(loads))
        loads[i] += weights.get(name, med)
        shards[i].append(name)
    return shards


def main() -> None:
    shard, of, out_path = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.01"
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark(app_name=f"parity_shard_{shard}", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    reports: dict[str, dict] = {}
    for name in shard_assignment(sorted(ORACLES), of)[shard]:
        try:
            reports[name] = compare_query(
                spark, QUERIES[name], ORACLES[name], sf_dir
            )
        except Exception as e:  # noqa: BLE001 — recorded as a failure
            reports[name] = {
                "match": False,
                "detail": f"worker exception {type(e).__name__}: {e}"[:500],
            }
    with open(out_path, "w", encoding="utf-8") as fh:
        json.dump(reports, fh)


if __name__ == "__main__":
    main()
