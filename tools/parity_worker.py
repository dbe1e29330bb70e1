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


def main() -> None:
    shard, of, out_path = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.01"
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark(app_name=f"parity_shard_{shard}", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    reports: dict[str, dict] = {}
    for name in sorted(ORACLES)[shard::of]:
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
