"""Central query registry consumed by __spark_entry__.py.

Aggregates QUERIES / ORACLE_SQL from every operator module. Invariants
(enforced by tests/test_oracle_parity.py::test_registry_consistency):
  * every oracle key has a query;
  * queries without an oracle entry are intentionally rows-only
    (non-SQL-expressible ops, e.g. approximate sketches) and must be
    listed in ROWS_ONLY;
  * registration order follows PRIORITY_ORDER (below) — the driver's
    CORRECTNESS run covers only the FIRST 50 registered queries, so
    each round rotates unproven/reworked queries to the front and the
    most-recently-green family to the tail. Round-15 window, per the
    r14 staging (executed verbatim — an OPTIMIZATION round, so ZERO
    new registrations and zero semantic rework): (1) the 21
    r10-vintage anchors spilled at r14 (the oldest driver evidence in
    the registry), alphabetical; (2) the next 29 slots drain the
    r11/r12-green blocks in their existing order. Within the window
    the 22 oracles costing >=0.1 s in DuckDB at sf0.01 sit at the
    tail ascending (events_touch_attribution 0.10 s ...
    embed_mmr_rerank 3.51 s — re-timed this round, per-entry comments
    below), so a driver timeout leaves rows for everything before
    them. After r15 the oldest driver evidence is r11; the remaining
    r11/r12-green entries sit at positions 51+ for the r16 front, the
    r13-green block follows, and the r14-green window block sits at
    the tail (most-recently-proven, tail by convention).

    Note on the r13 TPC-H NULL sweep fixes (part_skyline,
    customer_value_deciles, lineitem_moving_avg, orders_window_funcs,
    orders_yoy_growth, orders_cohort_ltv, lineitem_rle_layout_audit,
    lineitem_approx_percentiles): these declare explicit NULL policies
    on both engines. On the NULL-free driver corpora their results are
    byte-identical to before (the policies only bind when a swept
    column is NULL), so existing driver evidence remains valid and
    none of them forces a window slot beyond those already rotated;
    the NULL behavior itself is gated by tests/test_tpch_null_parity.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .operators import analytics, cdc, dedup, multimodal, similarity, text

_MODULES = [cdc, analytics, dedup, text, similarity, multimodal]

# Queries that deliberately ship without an oracle (approximate /
# non-SQL-expressible semantics). The driver records a rows-only check.
# EMPTY since round 10: every registered query carries a DuckDB oracle.
# Graduation history (the guarantee-audit pattern — emit the
# DETERMINISTIC contract of an approximate operator instead of its
# merge-order-dependent estimates):
#   * embed_ann_lsh (r6): fixed md5-seeded hyperplanes make the
#     bucketing deterministic relational algebra
#     (similarity.py:_lsh_bucket_sql).
#   * lineitem_approx_percentiles (r8, r7 ask #7): Greenwald-Khanna
#     error-bound booleans stated TRUE by the oracle.
#   * approx_distinct_users (r9, r8 ask #4): HLL++ register merge is
#     max — partitioning-independent — so the |est-exact|/exact bound
#     boolean is a stable value.
#   * token_heavy_hitters (r10, r9 ask #2): Misra-Gries surviving
#     counters depend on partitioning, but the published guarantees do
#     not — the relation is the guaranteed-token set (exact counts,
#     integer-exact threshold) plus the survival/error-bound booleans
#     the math forces TRUE under any partitioning.
ROWS_ONLY: set[str] = set()

# Explicit registration order. Names listed here come first, in this
# order; anything registered by a module but not listed appends after,
# in module order (so new queries are never silently dropped —
# test_registry_consistency asserts the full set matches).
PRIORITY_ORDER = [
    # ---- round-15 window (first 50) ----
    # OPTIMIZATION round: ZERO new registrations (the surface is
    # frozen; the r14 plan executed verbatim). The window absorbs the
    # whole remaining r10-vintage block — the oldest driver evidence
    # becomes r11 — per the r13/r14 staging:
    # (1) the 21 r10-vintage anchors spilled at r14 (alphabetical;
    # the 7 with >=0.1 s DuckDB oracles at sf0.01 sit in the
    # cost-sorted window tail below):
    "docs_unimax_mix",
    "docs_unimax_sample",
    "docs_weighted_sample",
    "embed_cell_balance_audit",
    "events_interval_join",
    "events_salted_enrich",
    "events_sessionize",
    "events_value_histogram",
    "grouping_rollup",
    "lineitem_conditional_agg",
    "lineitem_stats_agg",
    "multimodal_silence_trim",
    "orders_bucketed_join",
    "token_heavy_hitters",
    # (2) the next 29 slots drain the r11/r12-green blocks in their
    # existing order (oldest remaining evidence); the 15 with >=0.1 s
    # oracles sit in the tail below:
    "docs_unimax_realized_mix",
    "props_json_extract",
    "queue_latency_profile",
    "queue_state_machine",
    "token_bigram_stats",
    "token_frequencies",
    "token_zipf_audit",
    "docs_bloom_dedup_audit",
    "docs_ccnet_buckets",
    "docs_chunks",
    "docs_embed_join",
    "docs_gopher_rules",
    "docs_hybrid_search",
    "docs_pack_bins",
    # (3) the window tail: every window oracle costing >=0.1 s in
    # DuckDB at sf0.01 (re-timed this round, min-of-2), ascending, so
    # a driver timeout leaves rows for everything before them:
    "events_touch_attribution",  # 0.10 s
    "cdc_time_travel_agg",  # 0.11 s
    "docs_classifier_calibration",  # 0.12 s
    "embed_ann_lsh",  # 0.12 s
    "token_kneser_ney",  # 0.14 s
    "embed_prototypicality",  # 0.15 s
    "docs_common_spans",  # 0.17 s
    "docs_kn_surprisal",  # 0.17 s
    "docs_kn_band",  # 0.17 s
    "lineitem_moving_avg",  # 0.18 s
    "part_triangle_counts",  # 0.20 s
    "headers_explode",  # 0.23 s
    "embed_cluster_purity",  # 0.25 s
    "docs_quality_kn_interaction",  # 0.26 s
    "docs_gram_novelty",  # 0.38 s
    "part_copurchase_pagerank",  # 0.93 s
    "embed_intrinsic_dim",  # 1.06 s
    "embed_kcenter_coreset",  # 1.32 s
    "docs_softdedup_weights",  # 1.62 s
    "docs_softdedup_effective_mass",  # 2.35 s
    "docs_ingest_chain_nd",  # 2.71 s
    "embed_mmr_rerank",  # 3.51 s
    # ---- position 51+ ----
    # The remainder of the r11/r12-green blocks, in their existing
    # order (next in line for the r16 front):
    "docs_pipeline_e2e",
    "docs_quality_psi_drift",
    "docs_repetition_filter",
    "docs_source_mix",
    "docs_stratified_sample",
    "docs_strip_self_repetition",
    "docs_unicode_normalize",
    "docs_url_canonicalize",
    "docs_url_host_stats",
    "embed_bq_search",
    "embed_centroids",
    "embed_ivf_assign",
    "embed_knn",
    "customer_golden_record",
    "lineitem_rle_layout_audit",
    "docs_simhash_bit_balance",
    "embed_pipeline_e2e",
    "docs_contamination",
    "docs_boilerplate_ngrams",
    "events_holt_forecast",
    "docs_minhash_calibration",
    "docs_ingest_chain_kn",
    "embed_intrinsic_dim_ann",
    "embed_matryoshka_audit",
    "embed_ndcg_audit",
    "embed_neardup_dedup",
    "embed_neardup_pairs",
    "embed_norm_stats",
    "embed_pq_codes",
    "embed_quantize",
    "events_cusum_changepoint",
    "events_dau_wau_mau",
    "events_seasonal_anomaly",
    "lineitem_column_profile",
    "multimodal_dedup",
    "multimodal_meta",
    "multimodal_scene_cuts",
    "orders_join_cardinality_audit",
    "part_skyline",
    "token_tfidf",
    "cdc_column_diff",
    "cdc_delta_agg",
    "cdc_envelope",
    "cdc_envelope_json",
    "cdc_latest_state",
    "cdc_op_filter",
    "cdc_scd2_history",
    "creds_display_format",
    "creds_lookup_join",
    "customer_balance_outliers",
    "customer_pii_anonymize",
    "docs_c4_line_dedup",
    "docs_c4_line_filter",
    "docs_lang_temperature_mix",
    "docs_linear_classifier",
    "docs_pii_scan",
    "docs_token_entropy",
    "docs_unigram_surprisal",
    "embed_kmeans",
    "embed_recall_audit",
    "events_anomaly_mad",
    "events_retention_cohorts",
    "events_session_window",
    "events_user_ewma",
    "events_user_paths",
    "lineitem_approx_percentiles",
    "lineitem_discount_regression",
    "lineitem_percentiles",
    "embed_ann_ivfpq",
    "embed_semdedup",
    "lineitem_pricing_agg",
    "lineitem_small_qty_parts",
    "lineitem_zorder_layout",
    "multimodal_features",
    "multimodal_neardup",
    "orders_cohort_ltv",
    "orders_enrich_join",
    "orders_market_basket",
    "orders_rfm_segments",
    "orders_shipping_priority",
    "orders_yoy_growth",
    "part_abc_pareto",
    "receiver_replay_dedup",
    "supplier_part_volume",
    "token_count_min",
    "token_vocab_coverage",
    "approx_distinct_users",
    "attempt_history_agg",
    "creds_last_wins",
    "customer_fuzzy_match",
    "customer_set_ops",
    "customer_value_deciles",
    "docs_c4_punct_gate",
    "docs_c4_span_dedup",
    "docs_dsir_weights",
    "docs_dup_span_filter",
    "docs_mixture_sample",
    "docs_quality_dup_interaction",
    "docs_strip_dup_spans",
    "docs_suffix_dup_spans",
    "docs_winnowing",
    "docs_word_pmi",
    "embed_ann_ivf",
    "embed_ivf_tuning",
    "embed_pca_power",
    "embed_silhouette",
    "events_ab_test",
    "events_asof_join",
    "events_cube",
    "events_funnel",
    "events_key_skew_audit",
    "events_markov_transitions",
    "events_rate_limit",
    "events_sliding",
    "events_tumbling",
    "fanout_union",
    "token_bpe_merges",
    "token_fertility_by_lang",
    "docs_dedup_modality_agreement",
    # The r14-green window block (most-recently-proven, tail by
    # convention), in its r14 order:
    "docs_ingest_chain_contam",
    "docs_ingest_chain_audit",
    "lineitem_metrics_unpivot",
    "lineitem_ship_delays",
    "multimodal_decoded_stats",
    "multimodal_frame_sample",
    "multimodal_resize",
    "nation_priority_pivot",
    "orders_daily_gapfill",
    "orders_grouping_sets",
    "orders_price_band_join",
    "orders_quarterly",
    "orders_semi_anti",
    "orders_window_funcs",
    "queue_ready_topk",
    "retry_schedule",
    "status_counts",
    "token_bigram_surprisal",
    "top_customers_per_nation",
    "user_activity_window",
    "docs_bm25_search",
    "docs_classifier_pr_curve",
    "docs_content_fingerprint",
    "docs_dedup_rate_by_source",
    "docs_exact_dedup",
    "docs_fingerprint_groups",
    "docs_lang_confusion",
    "docs_lang_id",
    "docs_minhash_sigs",
    "docs_mixture_realized_mix",
    "docs_pack_tuning",
    "docs_quality_score",
    "docs_rolling_fingerprint",
    "docs_text_stats",
    "docs_token_counts",
    "docs_train_split",
    "token_bpe_encode",
    "docs_simhash_pairs",
    "docs_simhash",
    "docs_simhash_dedup",
    "docs_dedup_sensitivity",
    "docs_minhash_pairs",
    "docs_ngram_containment",
    "docs_ngram_jaccard",
    "docs_ingest_chain",
    "docs_minhash_dedup",
    "docs_dedup_method_agreement",
    "docs_dup_clusters",
    "docs_cluster_dedup",
    "docs_lsh_tuning",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        for name, fn in mod.QUERIES.items():
            if name in merged:
                raise ValueError(f"duplicate query name: {name}")
            merged[name] = fn
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name in PRIORITY_ORDER:
        if name in merged:
            out[name] = merged.pop(name)
    out.update(merged)
    return out


def family_builds() -> dict[str, object]:
    """Shared persisted-kernel builders, namespaced `family_build:<mod>.
    <name>`. The bench materializes these FIRST in each pass and records
    each as its own row, so every per-query number is marginal cost and
    family first-consumers stop absorbing their family's one-time build
    (r6 verdict ask #4). Each value is (spark, sf_dir) -> list[DataFrame]
    to materialize."""
    out: dict[str, object] = {}
    for mod in _MODULES:
        for name, fn in getattr(mod, "FAMILY_BUILDS", {}).items():
            key = f"family_build:{mod.__name__.rsplit('.', 1)[-1]}.{name}"
            if key in out:
                raise ValueError(f"duplicate family build: {key}")
            out[key] = fn
    return out


def family_consumers() -> dict[str, tuple[str, ...]]:
    """Declared consumer queries per family build, same key namespace
    as family_builds(). The bench self-check
    (tests/test_plans.py::test_family_builds_feed_their_consumers)
    asserts each consumer's physical plan actually reads the family's
    persisted kernel (InMemoryTableScan witness), so a build whose
    projection drifts away from its consumers fails a test instead of
    surfacing as a silent per-query bench regression (r7 verdict
    ask #6)."""
    out: dict[str, tuple[str, ...]] = {}
    for mod in _MODULES:
        for name, consumers in getattr(mod, "FAMILY_CONSUMERS", {}).items():
            key = f"family_build:{mod.__name__.rsplit('.', 1)[-1]}.{name}"
            out[key] = tuple(consumers)
    return out


def oracle_sql() -> dict[str, str]:
    merged: dict[str, str] = {}
    for mod in _MODULES:
        merged.update(getattr(mod, "ORACLE_SQL", {}))
    ordered = {n: merged.pop(n) for n in PRIORITY_ORDER if n in merged}
    ordered.update(merged)
    return ordered
