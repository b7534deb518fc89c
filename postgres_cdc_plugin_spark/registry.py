"""Central query registry consumed by __spark_entry__.py.

Aggregates QUERIES / ORACLE_SQL from every operator module. Invariants
(enforced by tests/test_oracle_parity.py::test_registry_consistency):
  * every oracle key has a query;
  * queries without an oracle entry are intentionally rows-only
    (non-SQL-expressible ops, e.g. approximate sketches / LSH ANN) and
    must be listed in ROWS_ONLY;
  * registration order follows PRIORITY_ORDER (below) — the driver's
    round-1 CORRECTNESS run covered only the first 50 registered
    queries, so queries with no driver evidence yet (the whole
    docs_/embed_/token_/multimodal_ family, plus every query added in
    round 2) and round-1 hash-fail fixes are registered FIRST;
    round-1-green queries fill the tail.
    docs_dup_clusters sits at the end of the 50-query window: its
    recursive-CTE oracle is the most expensive, so if the driver run
    dies there, everything before it still gets a CORRECTNESS row.
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
    "multimodal_features",
    "multimodal_frame_sample",
    "lineitem_approx_percentiles",
}

# Explicit registration order. Names listed here come first, in this
# order; anything registered by a module but not listed appends after,
# in module order (so new queries are never silently dropped —
# test_registry_consistency asserts the full set matches).
PRIORITY_ORDER = [
    # -- never driver-checked in round 1: dedup family (minus the
    #    expensive dup_clusters, hedged to position 50)
    "docs_exact_dedup",
    "docs_fingerprint_groups",
    "docs_minhash_sigs",
    "docs_minhash_pairs",
    "docs_minhash_dedup",
    "docs_ngram_jaccard",
    "docs_simhash",
    "docs_simhash_pairs",
    "docs_simhash_dedup",
    # -- never driver-checked: text / token family
    "docs_text_stats",
    "docs_lang_id",
    "docs_quality_score",
    "docs_content_fingerprint",
    "docs_token_counts",
    "token_frequencies",
    "docs_rolling_fingerprint",
    "docs_train_split",
    "docs_stratified_sample",
    "docs_repetition_filter",
    "docs_contamination",
    "token_tfidf",
    "docs_chunks",
    "docs_pack_bins",
    "docs_source_mix",
    # -- never driver-checked: embedding similarity family
    "embed_quantize",
    "embed_knn",
    "embed_centroids",
    "embed_neardup_pairs",
    "embed_neardup_dedup",
    "embed_ann_lsh",
    "embed_ann_ivf",
    "embed_norm_stats",
    "docs_embed_join",
    # -- never driver-checked: multimodal family
    "multimodal_meta",
    "multimodal_features",
    "multimodal_frame_sample",
    "multimodal_dedup",
    # -- round-1 driver hash FAILs, fixed round 2 — need fresh evidence
    "lineitem_stats_agg",
    "events_sessionize",
    # -- new round-2 queries (no driver evidence yet)
    "lineitem_approx_percentiles",
    "cdc_envelope_json",
    "docs_boilerplate_ngrams",
    "docs_common_spans",
    "embed_ivf_assign",
    "docs_pipeline_e2e",
    "token_bigram_stats",
    "token_zipf_audit",
    "embed_pq_codes",
    "embed_pipeline_e2e",
    # -- position 50: the expensive recursive-CTE oracle, last in window
    "docs_dup_clusters",
    # -- position 51+: new queries that didn't fit the 50-query window
    #    (local exact parity only until a future round rotates them in)
    "embed_semdedup",
    "docs_cluster_dedup",
    # -- everything after this appends in module order (round-1 green)
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
