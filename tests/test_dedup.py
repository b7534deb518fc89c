"""Value-level invariants for the dedup operator family that the
per-query oracle parity cannot express (cross-query relationships)."""

from __future__ import annotations

from postgres_cdc_plugin_spark.operators import dedup as D


def test_cluster_dedup_keeps_one_doc_per_component(spark, sf_dir):
    # the one-per-cluster claim: exactly one survivor per dup component
    # (the canonical), and cluster survivors are a subset of pairwise
    # dedup's (which keeps every LOCAL-minimum member, possibly several
    # per component)
    clusters = D.docs_dup_clusters(spark, sf_dir).collect()
    survivors = {
        r.doc_id for r in D.docs_cluster_dedup(spark, sf_dir).collect()
    }
    by_cluster: dict[int, list[int]] = {}
    for r in clusters:
        by_cluster.setdefault(r.cluster_id, []).append(r.doc_id)
    for cid, members in by_cluster.items():
        kept = [d for d in members if d in survivors]
        assert kept == [cid], (cid, kept)  # exactly the canonical
    pairwise = {
        r.doc_id for r in D.docs_simhash_dedup(spark, sf_dir).collect()
    }
    assert survivors <= pairwise, survivors - pairwise
