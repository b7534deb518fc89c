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
    most-recently-green family to the tail. Round-6 window (the r5
    rotation never ran — zero-commit round): (1) the four queries that
    have NEVER had a driver row, (2) the eleven new round-6 queries
    (queue_state_machine, events_salted_enrich, orders_bucketed_join,
    docs_weighted_sample, docs_bm25_search, events_interval_join,
    embed_kcenter_coreset, docs_lsh_tuning, multimodal_silence_trim,
    embed_mmr_rerank, queue_latency_profile), (3) every query whose
    results or oracle changed this round — embed_ann_lsh (promoted
    from rows-only to a full oracle), the MinHash shingle family
    (byte-window shingles now hex-rendered so the oracle is portable
    to non-ASCII text), and the two graph queries that now read the
    shared _copurchase_degrees kernel, (4) the seven anchors whose
    only driver evidence is round 1, (5) a 19-query slice of the
    46-query r2-green block (preferring oracle-checked members over
    rows-only ones), and (6) the CC family — its distributed loop was
    reworked this round (per-plan repartition instead of session-conf
    mutation) and its expensive recursive-CTE oracles sit LAST in the
    window so a driver timeout there still leaves CORRECTNESS rows for
    everything before them. The r3/r5-green blocks and the remaining
    15 r2 queries append after the window in module order.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .operators import analytics, cdc, dedup, multimodal, similarity, text

_MODULES = [cdc, analytics, dedup, text, similarity, multimodal]

# Queries that deliberately ship without an oracle (approximate /
# non-SQL-expressible semantics). The driver records a rows-only check.
ROWS_ONLY = {
    "approx_distinct_users",
    # embed_ann_lsh graduated OUT of this set in round 6: with fixed
    # md5-seeded hyperplanes the bucketing is deterministic relational
    # algebra, so it carries a full DuckDB oracle (literal-plane
    # list_dot_product signatures; similarity.py:_lsh_bucket_sql).
    "lineitem_approx_percentiles",
    # Misra-Gries surviving-counter sets depend on partitioning/stream
    # order; the guarantees (coverage + error bound) are pinned in
    # tests/test_analytics.py instead of a SQL oracle.
    "token_heavy_hitters",
}

# Explicit registration order. Names listed here come first, in this
# order; anything registered by a module but not listed appends after,
# in module order (so new queries are never silently dropped —
# test_registry_consistency asserts the full set matches).
PRIORITY_ORDER = [
    # ---- round-6 window (first 50) ----
    # Never had ANY driver row (registered late in r4 at 51+):
    "docs_lang_confusion",
    "events_touch_attribution",
    "docs_dedup_rate_by_source",
    "embed_cell_balance_audit",
    # New round-6 queries:
    "queue_state_machine",        # streaming fold, first driver-visible check
    "queue_latency_profile",      # delivery-latency SLO over the same fold
    "events_salted_enrich",       # salted hot-key join, plain-join oracle
    "orders_bucketed_join",       # exchange-free bucketed fact-fact join
    "docs_weighted_sample",       # A-Res weighted sampling w/o replacement
    "docs_bm25_search",           # Okapi BM25 lexical top-k retrieval
    "events_interval_join",       # binned interval-overlap range join
    "embed_kcenter_coreset",      # greedy farthest-point coreset selection
    "docs_lsh_tuning",            # banding-parameter sweep w/ exact recall
    "multimodal_silence_trim",    # audio VAD/trim through the WAV decoder
    "embed_mmr_rerank",           # MMR diversified re-ranking after ANN
    # Results or oracle changed in round 6 (need fresh rows):
    "embed_ann_lsh",              # rows-only -> full deterministic oracle
    "docs_minhash_sigs",          # hex-rendered byte shingles (non-ASCII fix)
    "docs_minhash_pairs",
    "docs_minhash_dedup",
    "docs_ngram_jaccard",
    "docs_ngram_containment",
    "docs_dedup_method_agreement",
    "part_triangle_counts",       # shared _copurchase_degrees kernel
    "part_copurchase_pagerank",   # shared _copurchase_degrees kernel
    # The seven anchors whose only driver evidence is round 1:
    "approx_distinct_users",      # rows-only; error bounds pinned locally
    "props_json_extract",
    "headers_explode",
    "grouping_rollup",
    "events_value_histogram",
    "lineitem_conditional_agg",
    "lineitem_moving_avg",
    # 19-query slice of the r2-green block (last driver rows four
    # rounds old). lineitem_approx_percentiles (rows-only) yields its
    # slot to the oracle-checked docs_common_spans; the remaining 15
    # r2 queries (embed_*/multimodal_meta/multimodal_dedup/
    # docs_pipeline_e2e/docs_embed_join) rotate in next round.
    "lineitem_stats_agg",
    "events_sessionize",
    "docs_exact_dedup",
    "docs_fingerprint_groups",
    "docs_simhash",
    "docs_simhash_pairs",
    "docs_simhash_dedup",
    "docs_text_stats",
    "token_bigram_stats",
    "token_zipf_audit",
    "docs_lang_id",
    "docs_quality_score",
    "docs_content_fingerprint",
    "docs_token_counts",
    "token_frequencies",
    "docs_rolling_fingerprint",
    "docs_train_split",
    # Positions 49-50: the CC family — distributed loop reworked this
    # round (per-plan repartition); expensive recursive-CTE oracles
    # last in the window so a driver timeout there still leaves
    # CORRECTNESS rows for everything before it.
    "docs_dup_clusters",
    "docs_cluster_dedup",
    # ---- position 51+ ----
    # The remaining r2-green block members (evidence ages to five
    # rounds; first in line for the r7 window). docs_common_spans /
    # docs_boilerplate_ngrams / docs_chunks / docs_pack_bins /
    # docs_source_mix / token_tfidf / docs_contamination /
    # docs_repetition_filter / docs_stratified_sample yielded their
    # window slots to the new round-6 queries (never-driver-checked outranks freshness):
    "docs_common_spans",
    "docs_boilerplate_ngrams",
    "docs_chunks",
    "docs_pack_bins",
    "docs_source_mix",
    "token_tfidf",
    "docs_contamination",
    "docs_repetition_filter",
    "docs_stratified_sample",
    "lineitem_approx_percentiles",
    "docs_pipeline_e2e",
    "embed_quantize",
    "embed_pq_codes",
    "embed_pipeline_e2e",
    "embed_knn",
    "embed_centroids",
    "embed_neardup_pairs",
    "embed_neardup_dedup",
    "embed_ann_ivf",
    "embed_ivf_assign",
    "embed_norm_stats",
    "docs_embed_join",
    "multimodal_meta",
    "multimodal_dedup",
    # Registered after the round-6 window was frozen (same situation as
    # the late-r4 four): never driver-checked yet, local parity only —
    # FIRST in line for the r7 window front, ahead of staleness
    # rotation. Twenty-one late-r6 queries total; the expensive
    # recursive-CTE oracle (customer_golden_record) should sit at the
    # r7 window's tail per the CC-family convention:
    "docs_hybrid_search",
    "lineitem_column_profile",
    "embed_matryoshka_audit",
    "docs_ccnet_buckets",
    "docs_quality_psi_drift",
    "docs_gram_novelty",
    "part_skyline",
    "customer_golden_record",
    "events_cusum_changepoint",
    "docs_gopher_rules",
    "multimodal_scene_cuts",
    "cdc_time_travel_agg",
    "embed_bq_search",
    "events_seasonal_anomaly",
    "embed_ndcg_audit",
    "events_holt_forecast",
    "lineitem_rle_layout_audit",
    "orders_join_cardinality_audit",
    "docs_simhash_bit_balance",
    "docs_minhash_calibration",
    "events_dau_wau_mau",
    # r3-green and r5-green blocks append in module order below.
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


def oracle_sql() -> dict[str, str]:
    merged: dict[str, str] = {}
    for mod in _MODULES:
        merged.update(getattr(mod, "ORACLE_SQL", {}))
    ordered = {n: merged.pop(n) for n in PRIORITY_ORDER if n in merged}
    ordered.update(merged)
    return ordered
