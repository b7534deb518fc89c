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
    most-recently-green family to the tail. Round-4 window: queries
    with zero or stale driver rows first (token_heavy_hitters — never
    checked; multimodal_frame_sample — oracle added after its last
    driver row), then every query whose code/oracle changed THIS round
    (fuzzy match re-block, triangle re-orientation, method-agreement
    reuse, CC-family rework, y4m decode path, division-guard oracles,
    winnowing byte-addressing), any new round-4 queries, then the
    33-query r1-green tail whose last driver evidence is three rounds
    old. The r3-green block (fresh CORRECTNESS_r03 rows) rotates to
    the back. Expensive oracles (the CC recursive CTEs) sit at the end
    of the window so a driver timeout there still leaves CORRECTNESS
    rows for everything before them.
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
    # ---- round-4 window (first 50) ----
    # Zero/stale driver evidence first.
    "token_heavy_hitters",        # never had ANY driver row (rows-only)
    "multimodal_frame_sample",    # oracle added after its last (r2) driver row
    # Queries whose code or oracle changed THIS round (need fresh rows):
    "multimodal_decoded_stats",   # y4m video decode path added
    "multimodal_resize",          # y4m video decode path added
    "customer_fuzzy_match",       # high-cardinality blocking key rework
    "part_triangle_counts",       # degree-ordered orientation rework
    "docs_dedup_method_agreement",# persisted-pair-relation reuse
    "docs_winnowing",             # oracle byte-addressing fix (ADVICE)
    "events_ab_test",             # division-by-zero NULLIF guard (ADVICE)
    "events_funnel",              # division-by-zero NULLIF guard (ADVICE)
    # New round-4 queries (inserted here as they land):
    "docs_suffix_dup_spans",
    "docs_dup_span_filter",
    "docs_ngram_containment",
    "token_bigram_surprisal",
    "docs_dsir_weights",
    "token_bpe_encode",
    "docs_strip_dup_spans",
    "docs_word_pmi",
    "embed_silhouette",
    "events_markov_transitions",
    "embed_pca_power",
    "events_key_skew_audit",
    # The 33-query r1-green tail — last driver evidence is round 1,
    # three rounds old by now (VERDICT r3 "do this" #1).
    "creds_last_wins",
    "queue_ready_topk",
    "retry_schedule",
    "attempt_history_agg",
    "events_rate_limit",
    "supplier_part_volume",
    "orders_semi_anti",
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
    "customer_value_deciles",
    "nation_priority_pivot",
    "lineitem_metrics_unpivot",
    "orders_daily_gapfill",
    "lineitem_ship_delays",
    "status_counts",
    "fanout_union",
    # Positions 49-50: the reworked CC family carries the expensive
    # recursive-CTE oracles — last in the window so a driver timeout
    # there still leaves CORRECTNESS rows for everything before it.
    "docs_dup_clusters",
    "docs_cluster_dedup",
    # ---- position 51+ ----
    # Displaced from the window by the new r4 queries (the hash check
    # of a never-verified operator outranks freshness of these):
    # approx_distinct_users is rows-only at the driver (weak signal
    # regardless of freshness; error bounds pinned locally every run);
    # props_json_extract is a simple JSON point-lookup with local
    # parity coverage; headers_explode is a trivial array explode; and
    # grouping_rollup's grouping-analytics family keeps two fresher
    # window members (orders_grouping_sets, events_cube).
    "approx_distinct_users",
    "props_json_extract",
    "headers_explode",
    "grouping_rollup",
    # Displaced by the second pair of new r4 queries: simple CASE/
    # width_bucket aggregations whose local parity coverage is strong
    # and whose families keep fresher window members.
    "events_value_histogram",
    "lineitem_conditional_agg",
    # Displaced by events_key_skew_audit: the moving-average window
    # family keeps four fresher window members in the window.
    "lineitem_moving_avg",
    # Late-r4 additions, registered at 51+ by policy: the window was
    # already full of never-verified/reworked queries plus the stale
    # r1 tail, and displacing more anchors would age reference-operator
    # evidence instead. Both have sf0.001+sf0.01 local parity; the r5
    # rotation promotes them (never-driver-checked outranks freshness).
    "docs_lang_confusion",
    "events_touch_attribution",
    "docs_dedup_rate_by_source",
    "embed_cell_balance_audit",
    # r3-green block (fresh CORRECTNESS_r03 rows) + r2-green family
    # append in module order below.
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
