"""Partitioning-invariance: the distributed-correctness property that
matters at 100 TB — results must not depend on how many partitions the
shuffle used. Every operator family with order-sensitive internals
(windows, folds, iterative label propagation, argmin aggregations,
sketch merges' DETERMINISTIC subset) is run under shuffle widths 1 and
16 at sf0.001 and compared in canonical exact form.

A query that passes the DuckDB oracle but silently depends on Spark's
default partitioning would break the first time a cluster resizes;
this pins the invariance directly instead of assuming it.
"""

from __future__ import annotations

import pytest

from postgres_cdc_plugin_spark import registry

from .conftest import normalize

# order-sensitive internals chosen from each family: window functions,
# per-key sequence folds, iterative min-label CC, Lloyd argmin, BPE
# argmax loop, winnowing sliding min, cumulative-share classification,
# LSH band joins + verify, CMS merge
_SENSITIVE = [
    "events_sessionize",
    "events_user_ewma",
    "docs_dup_clusters",
    "embed_kmeans",
    "token_bpe_merges",
    "docs_winnowing",
    "part_abc_pareto",
    "docs_minhash_dedup",
    "token_count_min",
    "orders_rfm_segments",
    "part_copurchase_pagerank",
    "part_triangle_counts",
    "orders_market_basket",
    "docs_dedup_method_agreement",
    # r6: greedy argmax loop, decimal-summed top-k, binned-join dedup
    "embed_kcenter_coreset",
    "docs_bm25_search",
    "events_interval_join",
    # late r6: sequential array fold (Holt), integer-scaled cumulative
    # window (CUSUM), delta-fold cumulative ledger (time travel),
    # union-find over fuzzy pairs + survivorship window (golden record),
    # Hamming pool + rerank (BQ), DCG folds over method top-ks (NDCG),
    # run-start windows under explicit orders (RLE audit)
    "events_holt_forecast",
    "events_cusum_changepoint",
    "cdc_time_travel_agg",
    "customer_golden_record",
    "embed_bq_search",
    "embed_ndcg_audit",
    "lineitem_rle_layout_audit",
    # r8: keep-first min-struct aggregations (line + span grain), the
    # GK sketch's bound audit (merge-order-dependent estimates must
    # still satisfy the deterministic bound at any width), and the
    # cross-modality full-outer pair join
    "docs_c4_line_dedup",
    "docs_c4_span_dedup",
    "lineitem_approx_percentiles",
    "docs_dedup_modality_agreement",
    "docs_mixture_sample",  # per-language cumulative admission windows
    # r9: HLL++ register max-merge (graduated audit booleans must be
    # width-independent), the nprobe sweep's per-grid-point top-k
    # windows, and the punctuated C4 gate's higher-order line folds
    "approx_distinct_users",
    "embed_ivf_tuning",
    "docs_c4_punct_gate",
    # r9 staged additions: shard-windowed packing rollups and the
    # ledger-derived realization audit (admission windows + global sum)
    "docs_pack_tuning",
    "docs_mixture_realized_mix",
    # r10: the Misra-Gries guarantee audit — surviving counters shift
    # with width but the guaranteed-token set and both booleans must not
    "token_heavy_hitters",
    # r10: the composed ingest chain (keep-first min-struct feeding the
    # admission windows — two order-sensitive stages chained)
    "docs_ingest_chain",
    # r10: the water-filling closed form (ordered prefix sums over the
    # languages relation) and the verify-threshold sweep (LSH band
    # joins + exact verify + per-grid distinct-loser counts)
    "docs_unimax_mix",
    "docs_dedup_sensitivity",
    # r10: the UniMax replication ledger (admission windows under the
    # remainder quota) and the KN top-k over joined rollups
    "docs_unimax_sample",
    "token_kneser_ney",
    # late r10: the ledger-derived realization audit (admission windows
    # + global delivered-total window) and the KN per-doc scorer
    # (decimal-hopped partial sums over joined model probabilities)
    "docs_unimax_realized_mix",
    "docs_kn_surprisal",
    # r11: the KN band gate — the scorer's decimal-hopped means feed
    # band comparisons, and the unscored bucket rides a left join
    "docs_kn_band",
    # r11: rank windows over the k-means fit's round-6 distances
    "embed_prototypicality",
    # r11: four order-sensitive stages chained (keep-first min-struct,
    # CC labeling, admission windows)
    "docs_ingest_chain_nd",
    # r11: tiled-block 2-NN candidates + bounded collect_list prefix
    "embed_intrinsic_dim",
    # r12: five order-sensitive stages chained (the KN gate's scored
    # left join feeds keep-first, CC labeling, admission windows) and
    # its per-stage attrition rollup (a 5-row ordered lag window)
    "docs_ingest_chain_kn",
    "docs_ingest_chain_audit",
    # r12: the within-cell tiled 2-NN leg + the exact leg joined per
    # label (two bounded collect_list prefixes through one audit)
    "embed_intrinsic_dim_ann",
]


@pytest.mark.parametrize("name", _SENSITIVE)
def test_result_is_partitioning_invariant(name, spark, sf_dir):
    queries = registry.queries()
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        narrow = normalize(queries[name](spark, sf_dir).toPandas())
        spark.conf.set("spark.sql.shuffle.partitions", "16")
        wide = normalize(queries[name](spark, sf_dir).toPandas())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert narrow.equals(wide), (
        f"{name}: result depends on shuffle partition count\n"
        f"width=1:\n{narrow.head(5).to_string()}\n"
        f"width=16:\n{wide.head(5).to_string()}"
    )
