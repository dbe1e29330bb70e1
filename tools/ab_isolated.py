"""Isolated per-query A/B timing: each run is a FRESH process (fresh
JVM, no cache inheritance, no co-running queries), using bench.py's
exact methodology (sf0.001 warmup pass, noop-sink action, cleared
session state). This is the t12 clearance protocol from round 8
(SCALE.md) packaged as a tool — the regression gate's in-session retry
shares the session with 100+ other queries and can't separate
scheduling noise from real slowdowns.

Usage:
    python tools/ab_isolated.py m10_lsh_embedding_topk m19_decontaminate \
        [--runs 3] [--sf /root/testdata/sf0.1]

Prints one JSON object {query: {"runs": [...], "median": s}}.
Timings must stay serialized — never run two Spark workloads at once.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_CHILD = """
import json, sys, time
sys.path.insert(0, {repo!r})
from novi_pdq_etl_project_prod_spark.catalog import QUERIES
from novi_pdq_etl_project_prod_spark.session import get_spark
from novi_pdq_etl_project_prod_spark import cache

name, sf_dir = {name!r}, {sf_dir!r}
spark = get_spark(app_name="ab_isolated")
spark.sparkContext.setLogLevel("ERROR")

def run(d):
    t0 = time.perf_counter()
    QUERIES[name](spark, d).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0

run("/root/testdata/sf0.001")  # warmup: codegen + class loading
cache.clear_session_state(spark)
t = run(sf_dir)
print("AB_RESULT " + json.dumps(t))
"""


def measure(name: str, sf_dir: str, runs: int) -> dict:
    samples = []
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for _ in range(runs):
        out = subprocess.run(
            [sys.executable, "-c", _CHILD.format(repo=repo, name=name, sf_dir=sf_dir)],
            capture_output=True,
            text=True,
            check=True,
        )
        for line in out.stdout.splitlines():
            if line.startswith("AB_RESULT "):
                samples.append(round(json.loads(line.split(" ", 1)[1]), 3))
                break
        else:
            raise RuntimeError(f"no result line for {name}: {out.stderr[-2000:]}")
    return {"runs": samples, "median": sorted(samples)[len(samples) // 2]}


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--runs":
            runs = int(argv[i + 1])
            args.remove(argv[i + 1])
        elif a == "--sf":
            sf_dir = argv[i + 1]
            args.remove(argv[i + 1])
    print(
        json.dumps(
            {name: measure(name, sf_dir, runs) for name in args},
            indent=1,
        )
    )


if __name__ == "__main__":
    main()
