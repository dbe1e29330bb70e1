"""Query catalog — the binding surface between the engine and the driver
contract (``__spark_entry__.py``).

Each sub-module contributes ``QUERIES`` (name -> fn(spark, sf_dir) ->
DataFrame) and ``ORACLES`` (name -> equivalent DuckDB SQL). Names map to
SURVEY.md §2 operator IDs so the judge can audit coverage line by line.

Determinism contract (SURVEY.md §7.3): every oracled query must be
bit-reproducible across engines — aggregate in DECIMAL (exact, order-
independent), cast results to double at the end, break ties in window
orderings with a unique key, and never rely on arbitrary-survivor ops.
"""

from __future__ import annotations

from novi_pdq_etl_project_prod_spark.catalog import (
    analytics_queries,
    llm_queries,
    reference_queries,
    round2_queries,
    round4_queries,
    round5_queries,
    round5c_queries,
    round6_queries,
    round6b_queries,
    round7_queries,
    round8_queries,
    round9_queries,
    round10_queries,
    round11_queries,
    round12_queries,
    round13_queries,
    surface_queries,
    temporal_queries,
    tpch_queries,
)

QUERIES = {}
ORACLES = {}
for _mod in (
    reference_queries,
    analytics_queries,
    llm_queries,
    temporal_queries,
    surface_queries,
    tpch_queries,
    round2_queries,
    round4_queries,
    round5_queries,
    round5c_queries,
    round6_queries,
    round6b_queries,
    round7_queries,
    round8_queries,
    round9_queries,
    round10_queries,
    round11_queries,
    round12_queries,
    round13_queries,
):
    QUERIES.update(_mod.QUERIES)
    ORACLES.update(_mod.ORACLES)

#: Fallback literal: queries with a driver row (green or documented-
#: no_oracle) through CORRECTNESS_r05.json. The authoritative list is
#: derived at import from the CORRECTNESS_r*.json files themselves (see
#: ``_derive_driver_certified`` below) so the ledger self-maintains the
#: moment the driver writes a new round's file; this literal is only the
#: fallback for installed/packaged contexts where the repo-root artifacts
#: are absent. The driver's per-round verify is budgeted at 50 queries (it
#: samples exactly the first 50 registry keys), so the registry is
#: iteration-ordered to surface not-yet-driver-certified queries first;
#: certified queries go last (they keep passing the repo's stricter
#: exact-value parity either way).
_DRIVER_CERTIFIED_FALLBACK = (
    # r01 rows
    "a1_monthly_fact p3_month_filter e1_robust_casts "
    "e4_yyyymm_derive e5_composite_key a2_duplicate_groups a4_dedup_latest "
    # (p1_json_flatten was r01-green but crashed in r03 when the driver's
    # testdata generation switched events.ts from INT64-nanos to
    # TIMESTAMP(MICROS) — fixed in session.read_events; listed with the
    # r03 crash set below for re-certification)
    "dq_non_negative dq_grain_unique dq_rollup_recon j1_star_join o3_topk "
    "u1_union_all w1_rank_in_nation w2_month_over_month w3_moving_sum "
    "w4_top3_orders_per_cust r1_rollup r2_cube r3_pivot r4_grouping_sets "
    "r5_grouping_sets_api w7_share_of_total g1_calendar_dim j2_semi_join "
    "j3_anti_join u2_intersect u3_except d1_count_distinct d2_approx_distinct "
    "t1_pricing_summary t2_shipping_priority t3_selective_revenue "
    "t5_promo_revenue t6_big_orders t7_rich_customers d3_percentiles "
    "sql1_rollup_recon_sql_api f1_scalar_surface f2_datetime_surface "
    "m2_ngram_jaccard_pairs m3_token_stats m4_lang_id m5_quality_filter "
    "m6_fingerprints m7_embedding_topk m12_tfidf_top_terms "
    # r02 rows (all green or documented-no_oracle; t4/m1 re-certified
    # after their r01 fixes)
    "d5_approx_percentiles t4_priority_lines m25_quantization_fidelity "
    "m22_boilerplate_ngrams m23_corpus_report m24_embedding_lsh_pairs "
    "m1_exact_dedup_groups m14_chunk_documents m15_gopher_quality "
    "m16_pii_redaction m8_minhash_near_dups m10_lsh_embedding_topk "
    "m17_ivf_embedding_topk m18_mixture_sample m20_exact_stratified_sample "
    "m21_curation_pipeline m19_decontaminate m13_near_dup_clusters "
    "x1_asof_join x5_event_funnel t8_returned_revenue x2_salted_agg "
    "x3_sessionize x4_event_windows m11_embedding_near_dup_pairs "
    "w5_window_navigation w6_densify_forward_fill d4_histogram "
    "f4_map_surface j4_local_supplier_volume f5_null_semantics "
    "e12_fuzzy_entity_pairs f3_regex_surface a6_array_agg_explode "
    "sql2_correlated_subquery dq2_rollup_suite t22_order_priority "
    "t9_volume_shipping t10_market_share t11_product_profit "
    "t12_returned_items t13_order_count_dist t14_top_supplier "
    "t15_supplier_cnt t16_small_qty_revenue t17_disjunctive_revenue "
    "t18_promo_suppliers t19_lonely_late_suppliers t20_best_supplier "
    "t21_important_stock "
    # r03 rows (19 green + m9 documented-no_oracle). The six r03 crashes
    # (x6 d7 x8 f7 x9 p1 — all one root cause: the driver's regenerated
    # events fixture switched ts to TIMESTAMP(MICROS); session.read_events
    # now adapts) are NOT listed: they lead the registry for
    # re-certification in r04.
    "m26_sequence_packing d6_price_histogram z1_zorder_values x7_gap_fill "
    "r6_unpivot d8_heavy_hitters d9_correlation d10_column_profile "
    "w8_decile_bins z2_zorder3_values m27_kfold_assign "
    "dq3_referential_integrity m28_packed_sequences u4_except_all "
    "u5_intersect_all f6_hof_surface w9_range_frame "
    "m29_winnowing_fingerprints dq4_snapshot_diff m9_simhash_near_dups "
    # r04 rows: the six r03 events-schema crashes re-certified green, the
    # 19 net-new r04 queries (18 hash-green + m35 documented-no_oracle).
    "p1_json_flatten x6_click_attribution d7_monthly_anomalies "
    "x8_native_session_window f7_json_path x9_unattributed_clicks "
    "m30_corpus_frequency_stats m31_ngram_repetition m32_ngram_novelty "
    "m33_label_centroids m34_nearest_centroid r7_bucketed_range_join "
    "dq6_month_completeness dq7_benford j5_null_safe_join x13_asof_forward "
    "g2_scd2_intervals x14_sliding_windows f9_variant_extract "
    "m35_kmeans_clusters x15_salted_join d11_exact_median f10_string_surface "
    "a7_boolean_aggs d12_mode_per_group "
    # r05 rows (47 hash-green + m37/m45/m46 documented-no_oracle)
    "m36_kmeans_em_step m37_ivf_related_pairs c1_cdc_apply c2_incremental_merge "
    "c3_incremental_join d13_weighted_moving_avg d14_iqr_outliers "
    "d15_embedding_covariance d16_moment_stats d17_poisson_bootstrap "
    "a8_filtered_aggs w10_cumulative_distinct w11_time_weighted_avg "
    "x16_session_incident_overlap x17_retention_cohorts x18_event_transitions "
    "x21_asof_nearest m38_semdedup_pairs m39_containment_pairs "
    "m40_vocab_coverage m41_dup_adjusted_tokens m42_curation_v2 "
    "m43_pair_components m44_pps_sample m45_compression_signal "
    "m46_pca_project dq8_distribution_drift dq9_checksum_recon j6_scd2_lookup"
).split()


def _derive_driver_certified(repo=None):
    """Latest-wins union of CORRECTNESS_r*.json rows whose most recent
    driver outcome is successful: hash/rows green, or the documented
    ``no_oracle`` class — the latter only while the query is STILL
    oracle-less. A query whose ORACLES membership changed since its
    latest driver row (a round-13-style graduation from no_oracle to an
    exact DuckDB oracle) is UNcertified: the stale no_oracle row never
    verified the new oracle surface, so the query re-enters the driver's
    first-50 window automatically until a hash-green row lands
    (VERDICT r13 item 1 — the m35 window gap). Mirrors
    tests/test_registry_order.py exactly so the ledger can never drift
    from the artifacts again (VERDICT r05 item 1). Returns None when no
    artifacts are present (installed package outside the build repo) so
    the caller falls back to the literal.

    ``repo`` overrides the artifact root (tests exercise future-round
    artifact sets in a tmp dir — VERDICT r06 item 1)."""
    import json
    import pathlib

    if repo is None:
        repo = pathlib.Path(__file__).resolve().parents[2]
    repo = pathlib.Path(repo)
    files = sorted(repo.glob("CORRECTNESS_r*.json"))
    if not files:
        return None
    latest = {}
    for f in files:
        try:
            rows = json.loads(f.read_text())
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            green = bool(row.get("hash_match") or row.get("rows_match"))
            latest[name] = green or (
                row.get("err") == "no_oracle" and name not in ORACLES
            )
    if not latest:
        return None
    return {name for name, ok in latest.items() if ok}


_DRIVER_CERTIFIED = _derive_driver_certified()
if _DRIVER_CERTIFIED is None:
    _DRIVER_CERTIFIED = _DRIVER_CERTIFIED_FALLBACK

#: Queries forced into the driver's first-50 sampling window although a
#: green driver row exists. Two triggers use this (clear entries once
#: the driver re-certifies them):
#:
#: 1. ORACLE SURFACE changed (the round-8/round-13 graduations from
#:    documented no_oracle to exact DuckDB SQL) — handled automatically
#:    by ``_derive_driver_certified`` since r14; this literal is for the
#:    residual manual cases.
#: 2. EXECUTION REWRITTEN since the last driver row (VERDICT r14 item
#:    1): the optimization rounds 14/15 rewrote how these queries
#:    compute (Arrow MinHash/SimHash, row-local span excision/scrub,
#:    fused funnel actions, cached-plan AQE, cumulative-machinery and
#:    cut-fitting reshapes, gram-join keys) without changing any
#:    declared result — the in-repo exact-value parity suite re-proves
#:    them, but the DRIVER's own oracle sample never re-ran any of
#:    them, so their driver rows predate their current execution.
#:    Re-entering them makes CORRECTNESS_r15 carry fresh hash rows for
#:    exactly the paths the optimizer touched.
RECERTIFY = frozenset((
    # r14 execution rewrites (Arrow MinHash + funnel fusion + lineage
    # truncation + row-local excision + cached-plan AQE consumers)
    "m8_minhash_near_dups m65_minhash_calibration "
    "m66_incremental_near_dups m67_dedup_canonicalize "
    "m13_near_dup_clusters m70_ingest_funnel m76_ingest_spans "
    "m82_retracted_funnel m87_retracted_grams m72_span_excision "
    "m71_repeated_spans m73_incremental_spans m86_rewrite_excised "
    "m53_copurchase_triangles m43_pair_components "
    "m55_component_size_histogram m63_supplier_pagerank d29_spearman "
    # r15 execution rewrites (Arrow SimHash, row-local scrub, shared
    # cut-fitting / cumulative reshapes, gram-join key)
    "m9_simhash_near_dups m60_boilerplate_scrub m42_curation_v2 "
    "d35_monthly_drift d24_weighted_median d19_mad_outliers "
    "d23_sample_quantiles d38_winsorized_mean m54_zipf_coverage "
    "d25_gini_spend d27_ks_statistic d28_mann_whitney "
    "w12_distributed_rank m39_containment_pairs m64_bpe_train"
).split())

#: Uncertified (never driver-green) queries lead the registry so they fall
#: inside the driver's first-50 sampling window. The budget check in
#: tests/test_registry_order.py asserts (uncertified + new) fits.
_certified = set(_DRIVER_CERTIFIED)
_uncertified = [q for q in QUERIES if q not in _certified or q in RECERTIFY]
_order = _uncertified + [q for q in QUERIES if q not in set(_uncertified)]
QUERIES = {q: QUERIES[q] for q in _order}
ORACLES = {q: ORACLES[q] for q in _order if q in ORACLES}

#: Exported for the registry-order test.
DRIVER_CERTIFIED = frozenset(_certified)
