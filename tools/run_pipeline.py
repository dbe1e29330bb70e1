"""CLI entry point for the monthly pipeline — the spark-submit-friendly
twin of the reference's job scripts (``spark-submit transform_lease.py
--yyyymm Y``, reference ``dags/pdq_etl_dag.py:478-486``).

Usage:
    python tools/run_pipeline.py --operator-dsv op.dsv --lease-dsv lease.dsv \
        --root /path/warehouse --yyyymm 202401 [--yyyymm 202402 ...]

or with spark-submit on a cluster:
    spark-submit tools/run_pipeline.py --operator-dsv ... --yyyymm 202401
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description="Run the monthly PDQ pipeline")
    ap.add_argument("--operator-dsv", required=True)
    ap.add_argument("--lease-dsv", required=True)
    ap.add_argument("--root", required=True, help="warehouse root directory")
    ap.add_argument(
        "--yyyymm",
        action="append",
        type=int,
        required=True,
        help="month(s) to load (repeatable)",
    )
    args = ap.parse_args()

    from novi_pdq_etl_project_prod_spark.plans.pipeline import run_backfill
    from novi_pdq_etl_project_prod_spark.session import get_spark

    spark = get_spark(app_name="pdq_pipeline")
    results = run_backfill(
        spark, args.operator_dsv, args.lease_dsv, args.root, args.yyyymm
    )
    for r in results:
        print(
            f"yyyymm={r.yyyymm} staging_op={r.staging_operator_rows} "
            f"staging_lease={r.staging_lease_rows} fact_op={r.fact_operator_rows} "
            f"fact_lease={r.fact_lease_rows} rollup_mismatches={r.rollup_mismatches} "
            f"dims={r.dims}"
        )


if __name__ == "__main__":
    main()
