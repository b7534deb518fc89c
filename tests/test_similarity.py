"""Quantitative checks for the approximate similarity operators: the
rows-only queries still have measurable quality/efficiency contracts —
recall against the exact top-k and a bound on candidates examined."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgres_cdc_plugin_spark.operators import similarity as S
from postgres_cdc_plugin_spark.session import load

K = S._TOP_K


def _recall(approx_df, exact_df) -> float:
    a = {r.vec_id for r in approx_df.collect()}
    e = {r.vec_id for r in exact_df.collect()}
    return len(a & e) / len(e)


def test_lsh_recall_and_candidate_bound(spark, sf_dir):
    knn = S.embed_knn(spark, sf_dir)
    lsh = S.embed_ann_lsh(spark, sf_dir)
    # multi-table probing must recover a nontrivial fraction of the true
    # top-k on this weakly-clustered corpus (single-table recall is ~0)
    assert _recall(lsh, knn) >= 0.2

    # ...while examining well under half the corpus: rebuild the
    # candidate set the operator joins on and bound its size
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    n = emb.count()
    bucketed = emb.select(
        "vec_id",
        F.explode(
            F.array(*[S._bucket_col(t) for t in range(S._N_TABLES)])
        ).alias("bucket"),
    )
    qb = bucketed.filter(F.col("vec_id") == S._QUERY_VEC_ID).select(
        F.col("bucket").alias("qbucket")
    )
    n_cand = (
        bucketed.filter(F.col("vec_id") != S._QUERY_VEC_ID)
        .join(F.broadcast(qb), F.col("bucket") == F.col("qbucket"))
        .select("vec_id")
        .distinct()
        .count()
    )
    assert n_cand < 0.5 * n, f"LSH examined {n_cand}/{n} vectors"


def test_ivf_recall_and_scan_fraction(spark, sf_dir):
    knn = S.embed_knn(spark, sf_dir)
    ivf = S.embed_ann_ivf(spark, sf_dir)
    assert _recall(ivf, knn) >= 0.3  # measured 0.4-0.5 at nprobe=3

    # nprobe cells of the 10-label corpus => ~30% scanned
    emb = load(spark, sf_dir, "embeddings")
    n_labels = emb.select("label").distinct().count()
    assert S._N_PROBE < n_labels


def test_ivfpq_adc_matches_python_reference(spark, sf_dir):
    """The ADC score of every returned vector equals a python rerun of
    the same round-6 codebook math (codes looked up in the query's
    per-(cell, subspace) table), and results come only from probed
    cells."""
    import numpy as np

    out = S.embed_ann_ivfpq(spark, sf_dir).collect()
    assert len(out) == S._TOP_K

    emb = {
        r.vec_id: (r.label, np.array(r.embedding, dtype=np.float64))
        for r in load(spark, sf_dir, "embeddings").collect()
    }
    qv = emb[S._QUERY_VEC_ID][1]
    # round-6 per-label centroids (the _centroid_vecs convention)
    by_label: dict = {}
    for _vid, (lab, v) in emb.items():
        by_label.setdefault(lab, []).append(v)
    cent = {
        lab: np.round(np.mean(np.stack(vs), axis=0), 6)
        for lab, vs in by_label.items()
    }
    sub = S._DIM // S._PQ_M

    def subd(a, b, m):
        d = a[m * sub : (m + 1) * sub] - b[m * sub : (m + 1) * sub]
        return round(float((d * d).sum()), 6)

    probed = sorted(
        cent,
        key=lambda c: (
            -round(
                float(qv @ cent[c])
                / (np.linalg.norm(qv) * np.linalg.norm(cent[c])),
                6,
            ),
            c,
        ),
    )[: S._N_PROBE]
    for r in out:
        lab, v = emb[r.vec_id]
        cell = min(
            cent,
            key=lambda c: (round(float(((v - cent[c]) ** 2).sum()), 6), c),
        )
        assert r.cell == cell and cell in probed
        codes = [
            min(cent, key=lambda c: (subd(v, cent[c], m), c))
            for m in range(S._PQ_M)
        ]
        expect = sum(subd(qv, cent[codes[m]], m) for m in range(S._PQ_M))
        assert abs(r.approx_sq_dist - expect) < 1e-9


def test_ann_results_are_true_cosines(spark, sf_dir):
    """Approximate = smaller candidate set, never wrong scores: every
    (vec_id, cosine) an ANN variant returns must equal the brute-force
    cosine for that vector."""
    knn_all = {
        r.vec_id: r.cosine_sim
        for r in S.embed_knn(spark, sf_dir).limit(0).unionByName(
            S.embed_knn(spark, sf_dir)
        ).collect()
    }
    for variant in (S.embed_ann_lsh, S.embed_ann_ivf):
        for r in variant(spark, sf_dir).collect():
            if r.vec_id in knn_all:
                assert abs(r.cosine_sim - knn_all[r.vec_id]) < 1e-9


def test_kmeans_assignment_invariants(spark, sf_dir):
    """Lloyd invariants: every vector is assigned exactly once, cells
    come from the deterministic lowest-vec_id init set, distances are
    non-negative, and the clustering is no worse than the init
    assignment (Lloyd iterations never increase total distortion when
    centroids are the cell means)."""
    from postgres_cdc_plugin_spark.operators.similarity import (
        _KM_K,
        _km_assign,
        embed_kmeans,
    )
    from pyspark.sql import functions as F

    final = embed_kmeans(spark, sf_dir)
    rows = final.collect()
    n_vecs = load(spark, sf_dir, "embeddings").count()
    assert len(rows) == n_vecs
    assert len({r.vec_id for r in rows}) == n_vecs
    init_cells = {
        r.vec_id
        for r in load(spark, sf_dir, "embeddings")
        .orderBy("vec_id")
        .limit(_KM_K)
        .collect()
    }
    assert {r.cell for r in rows} <= init_cells
    assert all(r.sq_dist >= 0.0 for r in rows)

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    cents0 = (
        emb.orderBy("vec_id")
        .limit(_KM_K)
        .select(F.col("vec_id").alias("cell"), F.col("v").alias("cv"))
    )
    init_cost = _km_assign(emb, cents0).agg(F.sum("sq_dist")).first()[0]
    final_cost = sum(r.sq_dist for r in rows)
    assert final_cost <= init_cost + 1e-6


def test_silhouette_bounds_and_cell_consistency(spark, sf_dir):
    """Simplified-silhouette invariants: per-cell means lie in [-1, 1],
    the reported cells are exactly the k-means fit's non-empty cells,
    and populations sum to the corpus size."""
    from postgres_cdc_plugin_spark.operators.similarity import (
        embed_kmeans,
        embed_silhouette,
    )

    sil = embed_silhouette(spark, sf_dir).collect()
    km = embed_kmeans(spark, sf_dir).collect()
    assert {r.cell for r in sil} == {r.cell for r in km}
    assert sum(r.n_vecs for r in sil) == len(km)
    for r in sil:
        assert r.avg_silhouette is not None
        assert -1.0 <= r.avg_silhouette <= 1.0, r


def test_silhouette_single_cluster_yields_null(spark):
    """With the codebook collapsed to one cell there is no 'other'
    centroid: the NULL-first branch must fire on every vector and the
    per-cell mean must be NULL (not 0, not a crash) — the case where
    Spark's NULL-skipping greatest() and DuckDB's NULL-propagating
    greatest() would otherwise diverge."""
    import postgres_cdc_plugin_spark.operators.similarity as S
    from pyspark.sql import functions as F

    one = spark.createDataFrame(
        [(7, [1.0] * 4, 0)], "vec_id long, embedding array<float>, label int"
    )
    orig = S.load
    try:
        S.load = lambda sp, sf, t: one  # noqa: ARG005
        rows = S.embed_silhouette(spark, "ignored").collect()
    finally:
        S.load = orig
    assert len(rows) == 1
    assert rows[0].n_vecs == 1
    assert rows[0].avg_silhouette is None


def test_pca_power_invariants_and_gapped_convergence(spark, sf_dir):
    """Guaranteed power-iteration invariants on the real corpus (unit
    loadings, 0 < eigenvalue estimate <= true top eigenvalue since
    ||C w|| <= lambda_max for unit w), plus actual convergence on a
    constructed corpus with a dominant direction, checked against
    numpy's eigensolver."""
    import math

    import numpy as np

    import postgres_cdc_plugin_spark.operators.similarity as S

    rows = S.embed_pca_power(spark, sf_dir).collect()
    w = np.array([r.loading for r in sorted(rows, key=lambda r: r.dim)])
    lam_est = rows[0].eigenvalue
    assert abs(np.linalg.norm(w) - 1.0) < 1e-4  # round-6 tolerance
    import pyarrow.parquet as pq

    X = np.array(
        [np.array(v, dtype=float) for v in
         pq.read_table(sf_dir + "/embeddings.parquet").to_pandas().embedding]
    )
    Xc = X - X.mean(0)
    lam_true = np.linalg.eigvalsh(Xc.T @ Xc / (len(X) - 1))[-1]
    assert 0.0 < lam_est <= lam_true + 1e-4

    # gapped corpus: a dominant direction 10x the noise floor
    n, d = 40, 6
    vecs = []
    for i in range(n):
        v = [0.0] * d
        v[0] = (i - n / 2) * 1.0          # dominant axis
        v[1] = 0.1 * ((-1) ** i)          # small orthogonal wiggle
        v[2] = 0.01 * i
        vecs.append((i, [float(x) for x in v], 0))
    df = spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int"
    )
    orig = S.load
    try:
        S.load = lambda sp, sf, t: df  # noqa: ARG005
        got = S.embed_pca_power(spark, "ignored").collect()
    finally:
        S.load = orig
    wg = np.array([r.loading for r in sorted(got, key=lambda r: r.dim)])
    Xg = np.array([np.array(v, dtype=float) for _, v, _ in vecs])
    Xgc = Xg - Xg.mean(0)
    evals, evecs = np.linalg.eigh(Xgc.T @ Xgc / (n - 1))
    assert abs(float(wg @ evecs[:, -1])) > 0.999
    assert math.isclose(got[0].eigenvalue, evals[-1], rel_tol=1e-3)


def test_kcenter_radius_is_nonincreasing_and_covering(spark, sf_dir):
    """Greedy farthest-point invariants: the selection distances
    (coverage radii) are non-increasing in rank — each pick is the
    farthest remaining point, so later picks can never be farther than
    earlier ones — and all picks are distinct corpus vectors when
    n >= k."""
    import postgres_cdc_plugin_spark.operators.similarity as S

    rows = sorted(
        S.embed_kcenter_coreset(spark, sf_dir).collect(), key=lambda r: r.rank
    )
    assert [r.rank for r in rows] == list(range(1, 9))
    assert rows[0].sel_dist is None
    dists = [r.sel_dist for r in rows[1:]]
    assert all(b <= a for a, b in zip(dists, dists[1:])), dists
    assert all(d > 0 for d in dists)
    assert len({r.vec_id for r in rows}) == 8


def test_mmr_scores_nonincreasing_and_diversify(spark, sf_dir):
    """MMR invariants: greedy marginal scores are non-increasing in
    rank (the argmax over a shrinking pool with growing redundancy can
    only fall), picks are distinct pool members, and the diversified
    set is NOT simply the relevance top-k — some pick must trade
    relevance for coverage on this corpus."""
    import postgres_cdc_plugin_spark.operators.similarity as S

    rows = sorted(
        S.embed_mmr_rerank(spark, sf_dir).collect(), key=lambda r: r.rank
    )
    assert [r.rank for r in rows] == list(range(1, 9))
    scores = [r.mmr_score for r in rows]
    assert all(b <= a + 1e-12 for a, b in zip(scores, scores[1:])), scores
    assert len({r.vec_id for r in rows}) == 8
    topk_relevance = {
        r.vec_id
        for r in S.embed_knn(spark, sf_dir).limit(8).collect()
    }
    assert {r.vec_id for r in rows} != topk_relevance


def test_hybrid_search_matches_per_leg_fusion(spark, sf_dir):
    """docs_hybrid_search must equal RRF fusion recomputed in Python
    from its two leg queries run standalone — full-outer semantics,
    rank assignment, and the exact 1/(K+rank) arithmetic."""
    from postgres_cdc_plugin_spark.operators.text import (
        _BM25_TERMS,
        bm25_search,
    )

    lex = sorted(
        bm25_search(load(spark, sf_dir, "documents"), _BM25_TERMS).collect(),
        key=lambda r: (-r.bm25_score, r.doc_id),
    )
    sem = sorted(
        S.embed_knn(spark, sf_dir).collect(),
        key=lambda r: (-r.cosine_sim, r.vec_id),
    )
    lex_rank = {r.doc_id: i + 1 for i, r in enumerate(lex)}
    sem_rank = {r.vec_id: i + 1 for i, r in enumerate(sem)}
    expected = {
        d: (1.0 / (S._RRF_K + lex_rank[d]) if d in lex_rank else 0.0)
        + (1.0 / (S._RRF_K + sem_rank[d]) if d in sem_rank else 0.0)
        for d in set(lex_rank) | set(sem_rank)
    }
    rows = S.docs_hybrid_search(spark, sf_dir).collect()
    assert {r.doc_id for r in rows} == set(expected)
    for r in rows:
        assert r.rrf_score == expected[r.doc_id], r
        assert r.lex_rank == lex_rank.get(r.doc_id), r
        assert r.sem_rank == sem_rank.get(r.doc_id), r
    # output order is the fused ranking: rrf DESC, doc_id tiebreak
    assert [r.doc_id for r in rows] == [
        d for d, _ in sorted(expected.items(), key=lambda kv: (-kv[1], kv[0]))
    ]


def test_hybrid_search_overlap_sums_both_legs(spark, monkeypatch):
    """A doc present in BOTH legs gets ONE fused row carrying both
    ranks and the two-term rrf sum (the sf corpora have disjoint legs,
    so this path needs a corpus where the legs provably intersect)."""
    docs = spark.createDataFrame(
        [
            (1, "spark vector join spark", "en", "web", 23),
            (2, "spark join filler filler", "en", "web", 24),
            (3, "vector filler filler filler", "en", "web", 27),
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0], 0), (1, [0.9, 0.1], 0), (2, [0.1, 0.9], 0),
         (3, [0.5, 0.5], 0)],
        "vec_id bigint, embedding array<float>, label int",
    )

    def fake_load(sp, sf_dir, table):
        return {"documents": docs, "embeddings": emb}[table]

    # the lexical leg routes through text.docs_bm25_search (r14 kernel
    # sharing), which resolves load from text.base — patch both bindings
    from postgres_cdc_plugin_spark.operators.text import base as TB

    monkeypatch.setattr(S, "load", fake_load)
    monkeypatch.setattr(TB, "load", fake_load)
    rows = {r.doc_id: r for r in S.docs_hybrid_search(spark, "ignored").collect()}
    assert set(rows) == {1, 2, 3}
    for d in (1, 2, 3):  # every doc is in both legs on this corpus
        r = rows[d]
        assert r.lex_rank is not None and r.sem_rank is not None, r
        assert r.rrf_score == 1.0 / (S._RRF_K + r.lex_rank) + 1.0 / (
            S._RRF_K + r.sem_rank
        ), r


def test_matryoshka_audit_identity_at_full_dim(spark, sf_dir, monkeypatch):
    """With the truncation width set to the FULL dimensionality the
    truncated leg must reproduce embed_knn exactly — recall 1.0 — which
    pins that the audit's truncated scan is the same kernel, differing
    only in the slice width."""
    monkeypatch.setattr(S, "_MRL_DIM", S._DIM)
    r = S.embed_matryoshka_audit(spark, sf_dir).collect()[0]
    assert (r.n_overlap, r.recall) == (S._TOP_K, 1.0)
    assert r.dim_trunc == r.dim_full == S._DIM


def test_bq_search_recall_and_code_width(spark, sf_dir):
    """Binary quantization must (a) recover a nontrivial fraction of
    the exact top-k through its Hamming pool + rerank, and (b) really
    be 32x narrower: both packed halves fit in 32 bits (non-negative,
    < 2^32 — the invariant that keeps the DuckDB oracle exact)."""
    knn = S.embed_knn(spark, sf_dir)
    bq = S.embed_bq_search(spark, sf_dir)
    assert _recall(bq, knn) >= 0.2

    emb = load(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    codes = emb.select(
        S._bq_half(v, 0).alias("lo"), S._bq_half(v, 32).alias("hi")
    )
    bounds = codes.agg(
        F.min("lo"), F.max("lo"), F.min("hi"), F.max("hi")
    ).collect()[0]
    assert 0 <= bounds[0] and bounds[1] < 2**32
    assert 0 <= bounds[2] and bounds[3] < 2**32


def test_ndcg_identity_and_bounds(spark, sf_dir):
    """DCG of the exact ranking against itself is the IDCG, so a method
    that IS embed_knn must score ndcg == 1.0 exactly (dcg and idcg are
    the same rounded double); and every audited method's ndcg lies in
    (0, 1] — an approximate method can never out-rank the exact one."""
    idcg = S._dcg_1row(
        S.embed_knn(spark, sf_dir).select("vec_id", "cosine_sim")
    ).collect()[0].dcg
    exact_dcg = S._dcg_1row(
        S.embed_knn(spark, sf_dir).select("vec_id", "cosine_sim")
    ).collect()[0].dcg
    assert exact_dcg == idcg
    rows = S.embed_ndcg_audit(spark, sf_dir).collect()
    assert {r.method for r in rows} == {"lsh", "ivf", "bq"}
    for r in rows:
        assert 0.0 < r.ndcg <= 1.0, r


def test_prototypicality_prunes_the_easy_fraction_per_cell(spark, sf_dir):
    """Independent recomputation (r11): per cell, the dropped set must
    be exactly the proto_rank <= floor(0.3 * cell_size) prefix of the
    (sq_dist, vec_id) order — the easiest examples — and the verdict
    must agree with plain-Python integer arithmetic on every row."""
    from collections import defaultdict

    from postgres_cdc_plugin_spark.operators.similarity import (
        _PROTO_PRUNE_PCT,
        embed_prototypicality,
    )

    rows = embed_prototypicality(spark, sf_dir).collect()
    assert rows
    cells = defaultdict(list)
    for r in rows:
        assert r.keep == (r.proto_rank * 100 > _PROTO_PRUNE_PCT * r.cell_size)
        cells[r.cell].append(r)
    for cell, rs in cells.items():
        rs.sort(key=lambda r: (r.sq_dist, r.vec_id))
        assert [r.proto_rank for r in rs] == list(range(1, len(rs) + 1)), cell
        assert all(r.cell_size == len(rs) for r in rs)
        n_drop = (_PROTO_PRUNE_PCT * len(rs)) // 100
        dropped = [r for r in rs if not r.keep]
        assert len(dropped) == n_drop, cell
        # the dropped set is the closest-to-prototype prefix
        assert dropped == rs[:n_drop], cell


def test_intrinsic_dim_ann_within_band_of_exact(spark, sf_dir):
    """The r11 verdict ask #4 invariance pin: the IVF-candidate TwoNN
    estimate (the 100 TB scale path) must stay within a stated band of
    the exact estimate — measured max per-label relative gap is 0.338
    at sf0.001, 0.26 at sf0.01, 0.245 at sf0.1 (tighter as n grows,
    as TwoNN theory predicts), so 0.45 pins the contract with margin
    without ever passing a broken candidate set (a label-shuffled cell
    assignment measures >1.0). Also pins the shared-kernel identity:
    the audit's exact leg must equal embed_intrinsic_dim row-for-row,
    since both are intrinsic_dim_from over _two_nn_candidates."""
    from postgres_cdc_plugin_spark.operators.similarity import (
        embed_intrinsic_dim,
        embed_intrinsic_dim_ann,
    )

    audit = {r.label: r for r in embed_intrinsic_dim_ann(spark, sf_dir).collect()}
    assert audit
    for r in audit.values():
        assert r.dim_exact is not None and r.dim_exact > 0, r
        assert r.dim_ann is not None and r.dim_ann > 0, r
        assert r.abs_gap / r.dim_exact <= 0.45, r
        # exact duplicates share a cell (identical vectors => identical
        # argmin), so restricting candidates can only lose usable rows
        assert r.n_used_ann <= r.n_used_exact
    exact = {r.label: r for r in embed_intrinsic_dim(spark, sf_dir).collect()}
    assert set(exact) == set(audit)
    for label, e in exact.items():
        a = audit[label]
        assert (e.n_vecs, e.n_used, e.intrinsic_dim) == (
            a.n_vecs,
            a.n_used_exact,
            a.dim_exact,
        ), label
