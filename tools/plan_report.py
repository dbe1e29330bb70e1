"""Generate PLANS.md — a physical-plan audit of every catalog query.

For each query the report shows the join strategies, shuffle (exchange)
count, whole-stage-codegen coverage, and whether the parquet scan
received pushed filters — the four signals the 100 TB design story rests
on. Regenerate after plan-affecting changes:

    python tools/plan_report.py > PLANS.md
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from novi_pdq_etl_project_prod_spark.catalog import ORACLES, QUERIES
from novi_pdq_etl_project_prod_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.01"

#: iterative queries that materialize intermediate results while building
#: their plan — skipped (their loop bodies are covered by other entries).
#: Each skip carries its reason; the generated PLANS.md prints this table
#: so every catalog query is accounted for, and
#: tests/test_registry_order.py pins rows ∪ SKIP == catalog (VERDICT r09
#: item 4 — d43/m66 silently missed the last regen and nothing failed).
SKIP = {
    "m13_near_dup_clusters":
        "iterative label propagation: collects a convergence flag per "
        "round while the plan is built; round-body plan == m8's",
    "m43_pair_components":
        "iterative component fold: same label-propagation loop shape, "
        "driver-side round counter",
    "m46_pca_project":
        "NumPy eigendecomposition on the driver between two Spark jobs; "
        "the covariance plan is audited as d15",
    "m63_supplier_pagerank":
        "10 unrolled rank rounds with localCheckpoint barriers; the "
        "edge-build plan is the audited part (one groupBy shuffle)",
    "m67_dedup_canonicalize":
        "consumes m13's iterative component labels; its own stages "
        "(score join, max/min-id tie pick, cluster join-back) follow "
        "the m13 round-body plan already audited via m8",
}

JOIN_KINDS = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
)


def net_exchanges(plan: str) -> int:
    """Exchanges NET of cached-subtree re-prints (VERDICT r12 item 7):
    explain prints every persisted intermediate's FULL child plan at
    each InMemoryTableScan reference, so a composed funnel's raw
    exchange count sums the same cached subtree many times even though
    the runtime executes it once. Collapse: each DISTINCT
    InMemoryRelation subtree (matched by its stripped-text signature)
    is counted the first time it appears; later re-prints are skipped.
    Subtree extent = the following lines with deeper tree-prefix
    indentation (Spark's `+-`/`:-`/`:  ` prefixes grow monotonically
    down a branch)."""
    lines = plan.splitlines()

    def depth(ln: str) -> int:
        m = re.match(r"^[\s:+|-]*", ln)
        return len(m.group(0))

    seen: set[str] = set()
    net = 0
    i = 0
    while i < len(lines):
        ln = lines[i]
        if "InMemoryRelation" in ln:
            d = depth(ln)
            j = i + 1
            while j < len(lines) and depth(lines[j]) > d:
                j += 1
            # expression ids (col#123, [id=#45], plan_id=67) and
            # whole-stage-codegen span ids (*(8)) differ across
            # re-prints of the SAME cached subtree — normalize them out
            # of the signature or nothing ever collapses. The signature
            # is the head + a bounded child-plan prefix (not the full
            # extent): re-prints of one cache are line-identical until
            # the printer truncates the deeper one, so full-extent
            # signatures spuriously separate them (measured on m70:
            # 52 "distinct" relations from ~10 actual caches).
            # ... and the tree-drawing prefix (':  +-' etc.) differs by
            # call-site depth, so it must go too (plain strip() leaves
            # ':'/'+-' in place and every re-print looks unique)
            sig = re.sub(
                r"#\d+|plan_id=\d+|\*\(\d+\)",
                "#",
                "\n".join(
                    re.sub(r"^[\s:+|-]*", "", x)
                    for x in lines[i:min(j, i + 40)]
                ),
            )
            if sig in seen:
                i = j
                continue
            seen.add(sig)
        if re.search(r"Exchange (hash|range)partitioning", ln):
            net += 1
        i += 1
    return net


def summarize(plan: str) -> dict:
    joins = {k: plan.count(k + " ") + plan.count(k + "\n") for k in JOIN_KINDS}
    joins = {k: v for k, v in joins.items() if v}
    return {
        "joins": joins,
        "shuffles": len(re.findall(r"Exchange hashpartitioning", plan)),
        "range_shuffles": len(re.findall(r"Exchange rangepartitioning", plan)),
        "net_shuffles": net_exchanges(plan),
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "pushed": bool(re.search(r"PushedFilters: \[[^\]]", plan)),
        "python_eval": ("ArrowEvalPython" in plan)
        or ("BatchEvalPython" in plan)
        or ("FlatMapGroupsInPandas" in plan)
        or ("MapInPandas" in plan),
    }


def main() -> None:
    spark = get_spark(app_name="plan_report")
    spark.sparkContext.setLogLevel("ERROR")
    # AQE wraps the plan in AdaptiveSparkPlan(isFinalPlan=false), which
    # hides whole-stage-codegen markers until execution — disable it so
    # the static plan shows real codegen spans and join strategies
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    print("# PLANS — physical-plan audit of the query catalog")
    print()
    print("Auto-generated by `tools/plan_report.py` at sf0.01. Signals:")
    print("**joins** (strategy × count), **shx** (hash+range exchanges as")
    print("explain prints them), **net** (exchanges net of cached-subtree")
    print("re-prints — explain re-prints every persisted intermediate's full")
    print("child plan at each InMemoryTableScan reference, so composed-funnel")
    print("rows read as hundreds of shuffles when the runtime executes each")
    print("cached stage once; net collapses duplicate InMemoryRelation")
    print("subtrees, so it is the runtime-shaped number), **cg** (distinct")
    print("whole-stage-codegen spans), **push** (filters pushed into a")
    print("parquet scan), **py** (Arrow/Pandas evaluation — expected only in")
    print("the vectorized similarity/multimodal operators and, since")
    print("optimization r14, the Arrow MinHash pass in operators.dedup).")
    print()
    print("Skipped (iterative — the plan can't be built without running")
    print("the loop; each row names where its per-round plan IS audited):")
    print()
    for name in sorted(SKIP):
        print(f"- `{name}` — {SKIP[name]}")
    print()
    print("Composed-plan footnote: for composed funnels (m70/m76/m82) the")
    print("raw shx sums re-printed cached subtrees; read the **net** column")
    print("for the runtime shape (the per-stage shapes are also audited")
    print("individually: m69, m66, dq11).")
    print()
    print("| query | oracle | joins | shx | net | cg | push | py |")
    print("|---|---|---|---|---|---|---|---|")
    for name in sorted(QUERIES):
        if name in SKIP:
            continue
        df = QUERIES[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        s = summarize(plan)
        joins = (
            ", ".join(
                f"{k.replace('Join', '').replace('Broadcast', 'B').replace('SortMerge', 'SM').replace('Shuffled', 'Sh').replace('NestedLoop', 'NL').replace('CartesianProduct', 'CART')}×{v}"
                for k, v in s["joins"].items()
            )
            or "—"
        )
        print(
            f"| {name} | {'✓' if name in ORACLES else '—'} | {joins}"
            f" | {s['shuffles'] + s['range_shuffles']} | {s['net_shuffles']}"
            f" | {s['codegen_spans']}"
            f" | {'✓' if s['pushed'] else '—'} | {'✓' if s['python_eval'] else '—'} |"
        )


if __name__ == "__main__":
    main()
