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
    most-recently-green family to the tail. Round-7 window, exactly as
    the r6 verdict staged it (asks #1–#3): (1) the 21 queries
    registered after the r6 window froze — never driver-checked, local
    parity only — with the one expensive recursive-CTE oracle
    (customer_golden_record) moved to the window TAIL per the
    CC-family convention so a driver timeout there still leaves rows
    for everything before it, (2) genuinely new round-7 queries
    appended BEHIND those 21 (verdict ask #1: new work never displaces
    the staged front; verdict ask #2: they are registered at window
    positions BEFORE the window freezes, not after), (3) the full
    24-query r2-stale block (evidence five rounds old:
    docs_common_spans … multimodal_dedup), and (4) slot 49 holds the
    fifth new query (docs_bloom_dedup_audit — a genuinely-new query in
    the window beats re-proving an r3 anchor one round early; no
    r2-stale member lost its slot). After the r7 run no query's
    evidence is older than round 3. The sixth new query
    (token_vocab_coverage, landed after the window was full) plus the
    40 r3-green queries are staged at 51+ as the r8 window front;
    r5/r6-green blocks append after them in module order.
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
    # ---- round-7 window (first 50) ----
    # (1) The 21 late-r6 registrations, never driver-checked; the
    # recursive-CTE golden-record oracle is pulled to position 50:
    "docs_hybrid_search",
    "lineitem_column_profile",
    "embed_matryoshka_audit",
    "docs_ccnet_buckets",
    "docs_quality_psi_drift",
    "docs_gram_novelty",
    "part_skyline",
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
    # (2) New round-7 queries — registered before the window froze:
    "docs_strip_self_repetition",  # intra-doc repeated-gram removal
    "docs_url_canonicalize",       # crawl-URL canonical form per doc
    "docs_url_host_stats",         # host-level dedup bookkeeping
    "docs_unicode_normalize",      # NFC + invisible-strip + ws collapse
    # (3) The 24-query r2-stale block (last driver rows: round 2):
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
    # (4) Slot 49: the fifth new r7 query (it displaced the r3-stale
    # cdc_column_diff, which the r8 staging below covers anyway —
    # a genuinely-new query in the window beats re-proving an r3
    # anchor one round early, and no r2-stale member lost its slot):
    "docs_bloom_dedup_audit",
    # Position 50 — expensive recursive-CTE oracle at the window tail:
    "customer_golden_record",
    # ---- position 51+ ----
    # Round-7 post-window addition (the window was already exactly 50):
    # never driver-checked, local sf0.001+sf0.01 parity only — FIRST in
    # line for the r8 window front per the late-addition convention:
    "token_vocab_coverage",
    "cdc_column_diff",
    # The 39 remaining r3-stale queries, staged for the r8 window
    # (alphabetical; evidence will be four rounds old by then —
    # cdc_delta_agg yielded its slot-50 window place to the fourth new
    # r7 query, docs_unicode_normalize):
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
    "docs_linear_classifier",
    "docs_pii_scan",
    "docs_token_entropy",
    "docs_unigram_surprisal",
    "embed_ann_ivfpq",
    "embed_kmeans",
    "embed_recall_audit",
    "embed_semdedup",
    "events_anomaly_mad",
    "events_retention_cohorts",
    "events_session_window",
    "events_user_ewma",
    "events_user_paths",
    "lineitem_discount_regression",
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
    "token_bpe_merges",
    "token_count_min",
    # r5/r6-green blocks append in module order below.
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


def oracle_sql() -> dict[str, str]:
    merged: dict[str, str] = {}
    for mod in _MODULES:
        merged.update(getattr(mod, "ORACLE_SQL", {}))
    ordered = {n: merged.pop(n) for n in PRIORITY_ORDER if n in merged}
    ordered.update(merged)
    return ordered
