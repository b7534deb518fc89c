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


def test_cc_paths_bit_equal(spark, sf_dir):
    """The scale-adaptive CC dispatch must be invisible in the result:
    single-task union-find and the distributed doubling loop produce
    identical (doc_id, cluster_id) labelings on the same pair set.
    Exercises the distributed path explicitly (the sf under test is
    far below _CC_SINGLE_TASK_EDGE_CAP, so the dispatcher alone would
    never take it)."""
    from postgres_cdc_plugin_spark.session import load

    docs = load(spark, sf_dir, "documents")
    pairs = (
        D._simhash_pairs_df(docs).select("doc_a", "doc_b").localCheckpoint()
    )
    n = pairs.count()
    assert 0 < n <= D._CC_SINGLE_TASK_EDGE_CAP
    single = sorted(
        (r.doc_id, r.cluster_id)
        for r in D._cc_labels_single_task(pairs).collect()
    )
    dist = sorted(
        (r.doc_id, r.cluster_id)
        for r in D._cc_labels_distributed(spark, pairs, n).collect()
    )
    assert single == dist


def test_cc_distributed_on_long_chain(spark):
    """Min-label propagation on a path graph (worst-case diameter for
    its size): a 40-vertex chain needs many hop-rounds — validates the
    batched-convergence protocol and pointer doubling actually reach
    the fixpoint, not just on shallow near-dup graphs."""
    edges = [(i, i + 1) for i in range(40)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long").localCheckpoint()
    labels = D._cc_labels_distributed(spark, pairs, len(edges)).collect()
    assert {(r.doc_id, r.cluster_id) for r in labels} == {
        (i, 0) for i in range(41)
    }
    uf = D._cc_labels_single_task(pairs).collect()
    assert {(r.doc_id, r.cluster_id) for r in uf} == {(i, 0) for i in range(41)}
