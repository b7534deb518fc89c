"""Central query registry consumed by __spark_entry__.py.

Aggregates QUERIES / ORACLE_SQL from every operator module. Invariants
(enforced by tests/test_oracle_parity.py::test_registry_consistency):
  * every oracle key has a query;
  * queries without an oracle entry are intentionally rows-only
    (non-SQL-expressible ops, e.g. approximate sketches / LSH ANN) and
    must be listed in ROWS_ONLY;
  * registration order follows PRIORITY_ORDER (below) — the driver's
    CORRECTNESS run covers only the FIRST 50 registered queries, so
    each round rotates unproven/reworked queries to the front and the
    most-recently-green family to the tail. Round-3 window: the r2 ERR
    fix (multimodal_features), the reworked envelope pair, the never-
    checked pair (embed_semdedup, docs_cluster_dedup), all thirty-one
    new round-3 queries, then the least-recently-verified r1-green
    fill (evidence now two rounds old). The most expensive oracle
    (docs_cluster_dedup's recursive CTE) sits at position 50 so a
    driver timeout there still leaves CORRECTNESS rows for everything
    before it.
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
    "embed_ann_lsh",
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
    # ---- round-3 window (first 50) ----
    # Broken/unproven first: the r2 ERR fix, the r2-reworked envelope
    # pair (r1 green evidence predates the before-image rework), and the
    # two queries that have never had a CORRECTNESS row.
    "multimodal_features",
    "cdc_envelope",
    "cdc_envelope_json",
    "embed_semdedup",
    # New round-3 queries (registered later this round; names absent
    # from the registry are skipped, so listing them early is safe).
    "multimodal_neardup",
    "multimodal_decoded_stats",
    "embed_ann_ivfpq",
    "docs_pii_scan",
    "docs_unigram_surprisal",
    "events_funnel",
    "events_retention_cohorts",
    "events_user_paths",
    "lineitem_small_qty_parts",
    "embed_kmeans",
    "orders_rfm_segments",
    "events_anomaly_mad",
    "orders_yoy_growth",
    "token_bpe_merges",
    "docs_winnowing",
    "embed_recall_audit",
    "events_user_ewma",
    "part_abc_pareto",
    "orders_market_basket",
    "docs_linear_classifier",
    "token_count_min",
    "events_ab_test",
    "part_copurchase_pagerank",
    "docs_dedup_method_agreement",
    "lineitem_zorder_layout",
    "part_triangle_counts",
    "multimodal_resize",
    "docs_token_entropy",
    "lineitem_discount_regression",
    "customer_fuzzy_match",
    "orders_cohort_ltv",
    # Least-recently-verified fill: the r1-green tail (last driver
    # evidence is two rounds old). r2-green family rotates out.
    "cdc_delta_agg",
    "receiver_replay_dedup",
    "creds_display_format",
    "cdc_latest_state",
    "cdc_scd2_history",
    "cdc_op_filter",
    "cdc_column_diff",
    "creds_lookup_join",
    "customer_balance_outliers",
    "customer_pii_anonymize",
    "orders_enrich_join",
    "orders_shipping_priority",
    "lineitem_pricing_agg",
    "events_session_window",
    # Position 50: docs_cluster_dedup carries the expensive
    # recursive-CTE oracle — last in the window so a driver timeout
    # there still leaves CORRECTNESS rows for everything before it.
    "docs_cluster_dedup",
    # ---- position 51+ (r4 rotation candidates) ----
    # r4 window plan: promote the r1-green tail below (its last driver
    # evidence will be three rounds old) plus token_heavy_hitters (the
    # one query with NO driver row of any kind — rows-only, currently
    # outside the window); the r3-new block above rotates out once
    # CORRECTNESS_r03 lands green.
    # r1-green queries that didn't fit this round's window:
    "creds_last_wins",
    "queue_ready_topk",
    "retry_schedule",
    "attempt_history_agg",
    "headers_explode",
    "events_rate_limit",
    "supplier_part_volume",
    "orders_semi_anti",
    "grouping_rollup",
    "orders_grouping_sets",
    "events_cube",
    "lineitem_percentiles",
    "orders_quarterly",
    "events_tumbling",
    "events_sliding",
    "user_activity_window",
    "events_asof_join",
    "customer_set_ops",
    "top_customers_per_nation",
    "orders_price_band_join",
    "orders_window_funcs",
    "lineitem_moving_avg",
    "customer_value_deciles",
    "nation_priority_pivot",
    "lineitem_conditional_agg",
    "lineitem_metrics_unpivot",
    "orders_daily_gapfill",
    "events_value_histogram",
    "lineitem_ship_delays",
    "status_counts",
    "fanout_union",
    "props_json_extract",
    "approx_distinct_users",
    # -- everything after this appends in module order (r2-green)
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
