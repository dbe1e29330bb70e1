"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed with a count-style action so the full plan runs
(scan → shuffle → aggregate) without collecting result payloads to the
driver. A warmup pass on sf0.001 triggers JVM/codegen warmup so the
numbers reflect steady-state execution, not JIT cold start.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from novi_pdq_etl_project_prod_spark.catalog import QUERIES  # noqa: E402
from novi_pdq_etl_project_prod_spark.session import get_spark  # noqa: E402

#: Headline queries: the flagship transform, the heaviest joins/aggs, and
#: one of each north-star family as they land.
HEADLINE = [
    # reference-faithful core
    "a1_monthly_fact",
    "j1_star_join",
    "dq_rollup_recon",
    "a4_dedup_latest",
    "e1_robust_casts",
    "a2_duplicate_groups",
    # analytics extensions
    "t1_pricing_summary",
    "t2_shipping_priority",
    "w3_moving_sum",
    "r2_cube",
    "d1_count_distinct",
    # temporal / skew
    "x1_asof_join",
    "x3_sessionize",
    "x2_salted_agg",
    # training-data pipeline ops
    "m1_exact_dedup_groups",
    "m12_tfidf_top_terms",
    "m3_token_stats",
    "m7_embedding_topk",
    "m8_minhash_near_dups",
    "m10_lsh_embedding_topk",
    "m17_ivf_embedding_topk",
    "t9_volume_shipping",
    "t12_returned_items",
    "t19_lonely_late_suppliers",
    "m14_chunk_documents",
    "m19_decontaminate",
    "m21_curation_pipeline",
    "x5_event_funnel",
    "m22_boilerplate_ngrams",
    "m23_corpus_report",
    "m24_embedding_lsh_pairs",
    # round-2 additions
    "x6_click_attribution",
    "m26_sequence_packing",
    "d6_price_histogram",
    "d7_monthly_anomalies",
    "z1_zorder_values",
    "x7_gap_fill",
    "x8_native_session_window",
    "w8_decile_bins",
    "m27_kfold_assign",
    "m28_packed_sequences",
    "w9_range_frame",
    "m29_winnowing_fingerprints",
    # round-4 additions
    "m30_corpus_frequency_stats",
    "m32_ngram_novelty",
    "m34_nearest_centroid",
    "r7_bucketed_range_join",
    # round-5 additions
    "m36_kmeans_em_step",
    "m37_ivf_related_pairs",
    "c1_cdc_apply",
    "c2_incremental_merge",
    "x16_session_incident_overlap",
    "m38_semdedup_pairs",
    "m39_containment_pairs",
    "dq8_distribution_drift",
    "m40_vocab_coverage",
    "m41_dup_adjusted_tokens",
    "d15_embedding_covariance",
    "dq9_checksum_recon",
    "m42_curation_v2",
    "x17_retention_cohorts",
    "x18_event_transitions",
    "d16_moment_stats",
    # round-5 fourth wave
    "m43_pair_components",
    "m44_pps_sample",
    "c3_incremental_join",
    "m45_compression_signal",
    "m46_pca_project",
    "j6_scd2_lookup",
    "w11_time_weighted_avg",
    "d17_poisson_bootstrap",
    "x21_asof_nearest",
    # round-6 additions
    "m47_bpe_token_count",
    "m48_bpe_packing",
    "m49_mixture_plan",
    "m50_budgeted_mixture",
    "m51_shard_manifest",
    "m52_contamination_report",
    # round-6b additions
    "d18_ema",
    "d19_mad_outliers",
    "d20_kmv_distinct",
    "d21_kmv_merge",
    "d22_kmv_set_overlap",
    "dq10_fd_violations",
    "m53_copurchase_triangles",
    "j7_bloom_prune",
    "d23_sample_quantiles",
    "d24_weighted_median",
    "d25_gini_spend",
    "d26_pareto_classes",
    "m54_zipf_coverage",
    "a9_association_rules",
    "m55_component_size_histogram",
    "m56_neyman_allocation",
    "d27_ks_statistic",
    "d28_mann_whitney",
    "d29_spearman",
    # round-7 additions
    "d30_auc_exact",
    "d31_chi2_independence",
    "d32_calibration_bins",
    "d33_kendall_tau",
    "d34_trend_lines",
    "m59_rank_fusion",
    "m60_boilerplate_scrub",
    "d35_monthly_drift",
    "d36_pr_auc",
    "d37_expected_calibration_error",
    "w12_distributed_rank",
    "d38_winsorized_mean",
    "d39_autocorrelation",
    # round-8 additions
    "g3_merge_into",
    "m9_simhash_near_dups",
    "m13_near_dup_clusters",
    "dq11_expectations",
    "m61_domain_frequency_cap",
    "m62_lm_perplexity",
    "m63_supplier_pagerank",
    "d40_cusum_changepoint",
    "m64_bpe_train",
    "d41_theil_sen_trend",
    # round-9 additions
    "d42_cohens_kappa",
    "m65_minhash_calibration",
    "d43_seasonal_decompose",
    "m66_incremental_near_dups",
    # round-10 additions
    "d44_fleiss_kappa",
    "m67_dedup_canonicalize",
    "m68_split_leakage",
    "m69_incremental_exact_dups",
    "d45_confusion_report",
    # round-11 additions
    "m70_ingest_funnel",
    "m71_repeated_spans",
    "m72_span_excision",
    "m73_incremental_spans",
    "m74_bm25_rank",
    "m75_dsir_weights",
    "m76_ingest_spans",
    "m77_incremental_dsir",
    "m78_hybrid_retrieval",
    "m79_bm25_from_index",
    # round-12 additions
    "m80_retracted_bm25",
    "m81_retracted_dsir",
    "m82_retracted_funnel",
    "m83_bm25_probe_batch",
    "m84_hybrid_batch_exact",
    "m85_hybrid_ann",
    "m86_rewrite_excised",
    # round-13 additions
    "m87_retracted_grams",
    "m88_hybrid_ann_persisted",
]

#: Iterative heavies benched in DEDICATED fresh-JVM isolation (VERDICT
#: r11 #5): three consecutive rounds of environment flags on untouched
#: code (m64 especially) showed in-session timings of driver-loop
#: iterative queries track JVM/session state more than code. Each lane
#: query runs in its own subprocess — warmup at sf0.001, then 3 timed
#: runs — and is JUDGED on the isolated MEDIAN. NOTE: isolated absolutes
#: read 1.2-1.6x above in-session values (single-query JVMs never reach
#: the 140-query session's JIT steady state), so the first round under
#: methodology 3 re-baselines them via EXPLAINED_RESHAPES.
ISOLATED_LANE = (
    "m63_supplier_pagerank",
    "m64_bpe_train",
    "m66_incremental_near_dups",
)

WARMUP_SF = "/root/testdata/sf0.001"

#: Regression gate (VERDICT r02 item 5): flag any query >20% slower than
#: the most recent prior round's recorded timing.
REGRESSION_THRESHOLD = 1.20

#: Ceiling on the lane-median drift (round-13 self-review): the lane
#: has only 3 queries, so an uncapped lane median would let a
#: regression hitting 2 of 3 normalize itself away. Lane-to-lane
#: comparisons (both sides 3x-isolated fresh-JVM medians) have little
#: legitimate systematic drift — r13 measured 1.04-1.12 on a box whose
#: in-session drift was 0.70 — so anything past this cap is judged as a
#: suspect rather than absorbed as environment.
LANE_DRIFT_CAP = 1.20

#: Queries whose timing deliberately moved this round because of a
#: documented plan reshape — the gate still measures and reports them,
#: but annotates each flag with the explanation so the artifact reads as
#: "reshape cost" rather than silent drift (VERDICT r06 item 8 allows
#: "code-explained entries"). Cleared every round once the new baseline
#: absorbs the reshape.
EXPLAINED_RESHAPES: dict[str, str] = {
    # round 13: empty — the r12 lane-move entries are absorbed (the r12
    # baseline's lane timings are themselves isolated medians, so lane
    # queries now compare lane-to-lane; the residual flag source, the
    # in-session drift scalar not applying to fresh-JVM lane runs, is
    # fixed structurally by the separate lane drift below).
}

#: Timing-methodology version, recorded in the metric object. Bumped to 2
#: in round 6 when the bench started clearing cached/persisted blocks
#: between headline queries (VERDICT r05 item 2): v1 timings inherited
#: earlier queries' leaked caches, so v1-vs-v2 comparisons shift the
#: drift median (previously-polluted queries speed up, clean ones look
#: relatively slower). When the regression baseline predates the current
#: methodology the output says so, so a cross-methodology flag can be
#: read for what it is.
#: Bumped to 3 in round 12: ISOLATED_LANE queries are timed as
#: fresh-JVM isolated medians instead of in-session single shots.
METHODOLOGY = 3

#: Artifact convention (VERDICT r10 "what's wrong" #1): this script
#: rewrites BENCH_LOCAL_r{N}.json on EVERY run, and the driver re-runs
#: bench.py after the round's final commit — so the committed copy and
#: the driver's working-tree copy can differ by one session's noise.
#: The convention, recorded in the artifact itself: the DRIVER's
#: BENCH_r{N}.json is the authoritative per-round record; BENCH_LOCAL
#: is the full-detail local twin whose committed copy freezes the last
#: in-round run (same query set and methodology as any post-commit
#: re-run; next-round regression gates accept either file).
ARTIFACT_CONVENTION = (
    "BENCH_LOCAL is rewritten per run; driver BENCH_r{N}.json is "
    "authoritative; committed copy = last in-round run"
)


def _current_round() -> int:
    """1 + the newest driver-written BENCH_r{N}.json. Only driver files
    count — the BENCH_LOCAL files this script writes for the *current*
    round must not advance the counter between local reruns."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    rounds = [0]
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.match(r"BENCH_r(\d+)\.json$", os.path.basename(path))
        if m:
            rounds.append(int(m.group(1)))
    return max(rounds) + 1


def _timings_from_file(path: str) -> dict[str, float]:
    """Extract per-query timings from one bench artifact.

    Three shapes, in decreasing fidelity: the raw metric object (our
    BENCH_LOCAL files), the driver wrapper's ``parsed`` field, or a scrape
    of ``"name": sec`` pairs from the driver's 2,000-char stdout ``tail``
    (BENCH_r05 has parsed=null and a head-truncated tail — the scrape
    recovers the visible suffix rather than losing the round entirely;
    VERDICT r05 item 3)."""
    import re

    try:
        with open(path) as fh:
            doc = json.load(fh)
    except (OSError, json.JSONDecodeError):
        return {}
    if not isinstance(doc, dict):
        return {}
    for candidate in (doc.get("parsed"), doc):
        if isinstance(candidate, dict) and isinstance(candidate.get("queries"), dict):
            return dict(candidate["queries"])
    tail = doc.get("tail")
    if not isinstance(tail, str):
        return {}
    m = re.search(r'\{"metric".*', tail)
    if m:
        try:
            parsed = json.loads(m.group(0))["queries"]
            if isinstance(parsed, dict):
                return dict(parsed)
        except (json.JSONDecodeError, KeyError, TypeError):
            pass
    # head-truncated tail: scrape pairs, keep only known query names so
    # wrapper fields ("prior": 0.598 inside regressions, "sf": 0.1, ...)
    # can't masquerade as timings
    pairs = re.findall(r'"([A-Za-z0-9_]+)": ([0-9]+\.[0-9]+)', tail)
    scraped = {n: float(v) for n, v in pairs if n in HEADLINE}
    # drop the pairs inside the "regressions" block (they repeat names
    # with prior/now/retry structure — the findall above only keeps
    # name-keyed floats, and regression sub-keys aren't HEADLINE names,
    # so scraped already excludes them)
    return scraped


def _file_methodology(path: str) -> int:
    """Methodology version recorded in a bench artifact (1 when absent —
    every pre-round-6 file)."""
    try:
        with open(path) as fh:
            doc = json.load(fh)
    except (OSError, json.JSONDecodeError):
        return 1
    if not isinstance(doc, dict):
        return 1
    for candidate in (doc, doc.get("parsed")):
        if isinstance(candidate, dict) and "methodology" in candidate:
            try:
                return int(candidate["methodology"])
            except (TypeError, ValueError):
                return 1
    # driver wrapper: the metric line lives (possibly truncated) in the
    # stdout tail — scrape the key so a v2 driver file isn't misread as v1
    tail = doc.get("tail")
    if isinstance(tail, str):
        import re

        m = re.search(r'"methodology": (\d+)', tail)
        if m:
            return int(m.group(1))
    return 1


def _prior_round_timings() -> tuple[str | None, dict[str, float]]:
    """Per-query timings from the newest round that has any, preferring
    the full BENCH_LOCAL_r{N}.json this script writes over the driver's
    truncated BENCH_r{N}.json wrapper."""
    here = os.path.dirname(os.path.abspath(__file__))
    for n in range(_current_round() - 1, 0, -1):
        for stem in (f"BENCH_LOCAL_r{n:02d}.json", f"BENCH_r{n:02d}.json"):
            path = os.path.join(here, stem)
            timings = _timings_from_file(path)
            if timings:
                return stem, timings
    return None, {}


def _clear_session_state(spark) -> None:
    """Release cached DataFrames and persisted/localCheckpointed RDD
    blocks between queries so one query's leaked persists can't tax the
    next (VERDICT r05 item 2 — the likeliest cause of the 4 sub-second
    flags on code-unchanged queries in the ~95-query single session)."""
    from novi_pdq_etl_project_prod_spark import cache

    cache.clear_session_state(spark)


def _run(fn, spark, sf_dir) -> float:
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    # force full execution without driver-side payload: cheap count action
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def _isolated_main(name: str, sf_dir: str) -> None:
    """Subprocess entry for one ISOLATED_LANE query: fresh JVM, warmup
    at sf0.001, 3 timed runs, one JSON line on stdout."""
    spark = get_spark(app_name=f"bench-isolated-{name}")
    fn = QUERIES[name]
    try:
        _run(fn, spark, WARMUP_SF)
    except Exception:
        pass
    _clear_session_state(spark)
    runs = []
    for _ in range(3):
        runs.append(round(_run(fn, spark, sf_dir), 3))
        _clear_session_state(spark)
    print(json.dumps({"query": name, "runs": runs, "median": sorted(runs)[1]}))


def _run_isolated(name: str, sf_dir: str) -> dict | None:
    """Run one lane query in a dedicated subprocess; returns its JSON
    record (None on failure OR timeout — the caller falls back to an
    in-session timing so the headline sum and regression gate never
    silently lose the query)."""
    import subprocess

    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--isolated-query", name],
            capture_output=True,
            text=True,
            env={**os.environ, "SPARK_GRAFT_SF_DIR": sf_dir},
            timeout=1800,
        )
    except subprocess.TimeoutExpired:
        return None
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            doc = json.loads(line)
            if doc.get("query") == name:
                return doc
        except json.JSONDecodeError:
            continue
    return None


def main() -> None:
    if "--isolated-query" in sys.argv:
        name = sys.argv[sys.argv.index("--isolated-query") + 1]
        _isolated_main(
            name, os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        )
        return
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench")

    names = [n for n in HEADLINE if n in QUERIES]
    lane = [n for n in names if n in ISOLATED_LANE]
    names = [n for n in names if n not in ISOLATED_LANE]
    # warmup: run each once at tiny scale (codegen + class loading)
    for n in names:
        try:
            _run(QUERIES[n], spark, WARMUP_SF)
        except Exception:
            pass
    _clear_session_state(spark)

    timings: dict[str, float] = {}
    for n in names:
        timings[n] = round(_run(QUERIES[n], spark, sf_dir), 3)
        _clear_session_state(spark)

    # isolated lane (methodology 3): fresh-JVM medians, serialized after
    # the in-session pass so nothing measures while another JVM works
    isolated: dict[str, dict] = {}
    for n in lane:
        rec = _run_isolated(n, sf_dir)
        if rec is None:
            # fall back to an in-session timing so the query neither
            # vanishes from the headline sum nor escapes the gate (a
            # crash in the timed query itself still raises loudly here,
            # exactly like methodology 2). Warm up first: the main
            # warmup loop excluded lane queries and the subprocess's
            # warmup died with it — a cold first run would charge
            # codegen/class-loading to the gate.
            isolated[n] = {"error": "isolated run failed; timed in-session"}
            try:
                _run(QUERIES[n], spark, WARMUP_SF)
            except Exception:
                pass
            _clear_session_state(spark)
            timings[n] = round(_run(QUERIES[n], spark, sf_dir), 3)
            _clear_session_state(spark)
            continue
        isolated[n] = rec
        timings[n] = rec["median"]

    out = {
        "metric": "headline_wall_clock",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "methodology": METHODOLOGY,
        "isolated_lane": isolated,
        "artifact_convention": ARTIFACT_CONVENTION,
        "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
    }
    baseline_file, prior = _prior_round_timings()
    if prior:
        ratios = {
            n: t / prior[n]
            for n, t in timings.items()
            if n in prior and prior[n] > 0
        }
        if ratios:
            # normalize out uniform environment drift (the bench runs on
            # whatever box the round gets; a globally slower/faster
            # machine shifts EVERY ratio — only per-query deviation from
            # the median is a code regression)
            drift = sorted(ratios.values())[len(ratios) // 2]
            out["regression_baseline"] = baseline_file
            out["environment_drift"] = round(drift, 2)
            # ISOLATED_LANE queries run in fresh JVMs, so the session-
            # wide drift scalar does not apply to them (r13: a 0.70-
            # drift box flagged all three lane queries at raw ratios of
            # 1.03-1.18 — flat). Judge lane queries against the median
            # of their OWN ratios — CAPPED (round-13 self-review): with
            # only 2-3 lane samples a real regression hitting most of
            # the lane would otherwise become its own drift and
            # self-mask (and the n=2 len//2 "median" picks the larger
            # ratio). Lane-to-lane baselines share the fresh-JVM shape,
            # so legitimate lane drift is small; anything above the cap
            # is treated as suspect, not environment. No floor: a
            # faster-box lane median below 1 only flags MORE.
            lane_ratios = sorted(
                r for n, r in ratios.items() if n in ISOLATED_LANE
            )
            lane_drift = (
                min(lane_ratios[len(lane_ratios) // 2], LANE_DRIFT_CAP)
                if len(lane_ratios) >= 2
                else drift
            )
            out["lane_drift"] = round(lane_drift, 2)

            def _drift_for(name: str) -> float:
                return lane_drift if name in ISOLATED_LANE else drift
            here = os.path.dirname(os.path.abspath(__file__))
            base_meth = _file_methodology(os.path.join(here, baseline_file))
            if base_meth != METHODOLOGY:
                # the baseline was timed under a different methodology
                # (pre-clearing sessions let queries inherit leaked
                # caches); cross-methodology flags measure the
                # methodology delta, not a code regression — see
                # SCALE.md "Round-6 bench methodology change"
                out["baseline_methodology"] = base_meth
                out["baseline_methodology_mismatch"] = True
            suspects = {
                n
                for n, r in ratios.items()
                if r > _drift_for(n) * REGRESSION_THRESHOLD
                # noise floor: sub-second queries flap ±0.2s run-to-run
                # (JVM/page-cache state); require a real absolute delta
                and timings[n] - prior[n] * _drift_for(n) > 0.25
                # a query faster than its recorded baseline in absolute
                # terms is never a regression, whatever the drift median
                # says (drift < 1 can otherwise flag absolute speedups)
                and timings[n] > prior[n]
            }
            # median-retry confirm (VERDICT r09 item 8): single-shot
            # timings flap ±10-50% on ~1s queries (r05 flags, r08
            # m10/m19, r09 d20 all A/B'd as session variance). Re-run
            # each suspect 3x DEDICATED and judge on the MEDIAN of the
            # retries — the one-retry min() still let a pair of unlucky
            # samples sustain a flag across rounds. The REPORTED
            # timings stay first-run for cross-round comparability.
            confirmed = {}
            for n in sorted(suspects):
                if n in ISOLATED_LANE:
                    # lane queries were ALREADY 3x-isolated medians —
                    # an in-session retry would reintroduce exactly the
                    # noise the lane removes; judge on the lane runs
                    retries = isolated.get(n, {}).get("runs", [timings[n]])
                else:
                    retries = []
                    for _ in range(3):
                        retries.append(
                            round(_run(QUERIES[n], spark, sf_dir), 3)
                        )
                        _clear_session_state(spark)
                med = sorted(retries)[len(retries) // 2]
                best = min(timings[n], med)
                r = best / prior[n]
                d = _drift_for(n)
                if (
                    r > d * REGRESSION_THRESHOLD
                    and best - prior[n] * d > 0.25
                    and best > prior[n]
                ):
                    confirmed[n] = {
                        "prior": prior[n],
                        "now": timings[n],
                        "retries": retries,
                        "median": med,
                        "ratio": round(r, 2),
                        "vs_drift": round(r / d, 2),
                    }
                    if n in EXPLAINED_RESHAPES:
                        confirmed[n]["explained"] = EXPLAINED_RESHAPES[n]
            out["regressions"] = confirmed
    # durable per-round detail: the driver wrapper truncates stdout to a
    # 2,000-char tail, so also write the full metric object to a committed
    # local file the next round's gate can baseline on (VERDICT r05 item 3)
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        with open(
            os.path.join(here, f"BENCH_LOCAL_r{_current_round():02d}.json"), "w"
        ) as fh:
            json.dump(out, fh, indent=1)
    except OSError:
        pass
    print(json.dumps(out))


if __name__ == "__main__":
    main()
