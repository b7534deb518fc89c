"""Similarity search over the `embeddings` table (array<float> column).

Training-data surface (BASELINE.json): brute-force cosine top-k as the
exact baseline, per-label centroids (the IVF coarse quantizer), pairwise
near-dup scoring, and a random-hyperplane LSH bucketed ANN as the scale
path.

Vector math stays JVM-side: zip_with/aggregate higher-order functions on
array<double>, no Python UDF. Embeddings are cast float->double so Spark
and the DuckDB oracle do identical IEEE arithmetic.

At 100 TB the brute-force variants are per-partition linear scans against
a broadcast query set; the LSH variant turns all-pairs similarity into an
equi-join on bucket signature — the same shuffle shape as the MinHash
dedup band join.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..session import load, spread

_DIM = 64
_N_TABLES = 8  # LSH hash tables (probes); recall grows with L
_N_PLANES = 6  # hyperplanes per table; bucket count 2^B grows with corpus
_QUERY_VEC_ID = 0
_TOP_K = 10
_N_PROBE = 3  # IVF cells probed
_NEARDUP_THRESHOLD = 0.30
_NEARDUP_TILES = 8  # block-matrix tiling factor for the exact pair join


def _load_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings under the r11 NULL policy: a row without a vector
    cannot be searched, clustered, indexed, or measured — excluded
    EXPLICITLY on BOTH engines (every oracle in this module reads the
    mirrored `embedding IS NOT NULL` view; the auto-included sweep
    tests/test_embed_null_parity.py keeps the class closed). The
    filter is a data-source predicate (reaches the parquet scan) and
    a no-op on the NULL-free synthetic corpora."""
    return load(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def _cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def _sq_dist(v, cv):
    """Unrounded squared euclidean distance as a left fold — shared
    verbatim by embed_ivf_assign / embed_semdedup so the round-6
    determinism convention cannot drift between operators."""
    return F.aggregate(
        F.zip_with(v, cv, lambda x, c: (x - c) * (x - c)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def embed_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k cosine neighbors of one query vector.

    Broadcast the 1-row query side, narrow per-row cosine, global top-k
    (TakeOrderedAndProject — per-partition k then merge, no full sort).
    Deterministic tie-break on vec_id after rounding.
    """
    emb = _load_vectors(spark, sf_dir)
    q = (
        emb.filter(F.col("vec_id") == _QUERY_VEC_ID)
        .select(F.col("embedding").cast("array<double>").alias("qv"))
    )
    cand = emb.filter(F.col("vec_id") != _QUERY_VEC_ID).select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    return (
        cand.crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.round(_cosine(F.col("v"), F.col("qv")), 6).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), F.asc("vec_id"))
        .limit(_TOP_K)
        # session-persisted (r14): the exact top-k is the recall/NDCG
        # denominator and the hybrid-search semantic leg — SIX queries
        # construct this identical plan (embed_knn, embed_recall_audit,
        # embed_matryoshka_audit, embed_ndcg_audit, docs_hybrid_search,
        # embed_intrinsic_dim's ANN gap via recall), so the corpus scan
        # behind it runs once per session via cache-manager plan
        # matching (the _verified_pairs precedent); the relation is
        # k rows. Repeat persist() calls on the identical plan are
        # no-ops.
        .persist()
    )


def embed_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroids — the IVF coarse-quantizer training step.

    posexplode to (label, dim, component), average per cell. One shuffle
    on (label, dim); partial means computed map-side.
    """
    emb = _load_vectors(spark, sf_dir)
    return (
        emb.select(
            "label",
            F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "component"),
        )
        .groupBy("label", "dim")
        .agg(F.round(F.avg("component"), 6).alias("centroid_val"))
    )


def embed_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above a threshold.

    Tiled block-matrix similarity join, fully executor-side (round 1
    collected the whole table to the driver and broadcast it — an OOM
    at 100x scale). Vectors hash into _NEARDUP_TILES tiles on vec_id;
    every unordered tile pair (i <= j) becomes one shuffle group, and
    applyInPandas computes that block's A @ B^T as one BLAS matmul —
    ~100x the element throughput of a per-pair expression join. Each
    vector is replicated T+1 times (its row-of-blocks plus its
    column-of-blocks), so shuffle volume is (T+1) * corpus while peak
    task memory is 2/T of the corpus: T tunes replication against tile
    size, and at 100 TB T grows ~ sqrt(corpus / executor memory).
    Exact but quadratic in compute; embed_ann_lsh is the approximate
    scale path.
    """
    import numpy as np
    import pandas as pd

    t_count = _NEARDUP_TILES
    emb = (
        _load_vectors(spark, sf_dir)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .withColumn("tile", F.pmod("vec_id", F.lit(t_count)).cast("int"))
    )
    # ONE scan: each vector emits its own block memberships — a-side of
    # every block in its row (j >= tile) and b-side of every block in
    # its column (i <= tile) — as an exploded JVM-built array. The
    # replication is paid in the shuffle either way; a second source
    # scan (the join-against-keys formulation) would be pure extra I/O
    # at 100 TB.
    t = F.col("tile")
    a_memb = F.transform(
        F.sequence(t, F.lit(t_count - 1)),
        lambda j: F.struct(
            t.alias("i"), j.cast("int").alias("j"), F.lit("a").alias("side")
        ),
    )
    b_memb = F.transform(
        F.sequence(F.lit(0), t),
        lambda i: F.struct(
            i.cast("int").alias("i"), t.alias("j"), F.lit("b").alias("side")
        ),
    )
    exploded = emb.select(
        "vec_id", "v", F.explode(F.concat(a_memb, b_memb)).alias("m")
    ).select(
        F.col("m.i").alias("i"),
        F.col("m.j").alias("j"),
        F.col("m.side").alias("side"),
        "vec_id",
        "v",
    )

    def tile_block(key, pdf):
        i, j = key
        a = pdf[pdf["side"] == "a"]
        b = pdf[pdf["side"] == "b"]
        if not len(a) or not len(b):
            return pd.DataFrame(
                {
                    "vec_a": pd.Series(dtype="int64"),
                    "vec_b": pd.Series(dtype="int64"),
                    "cosine_sim": pd.Series(dtype="float64"),
                }
            )
        a_ids = a["vec_id"].to_numpy()
        b_ids = b["vec_id"].to_numpy()
        a_mat = np.stack(a["v"].to_numpy())
        b_mat = np.stack(b["v"].to_numpy())
        sims = (a_mat @ b_mat.T) / np.outer(
            np.linalg.norm(a_mat, axis=1), np.linalg.norm(b_mat, axis=1)
        )
        sims = np.round(sims, 6)
        mask = sims >= _NEARDUP_THRESHOLD
        if i == j:
            # diagonal block carries both orientations + the diagonal
            mask &= a_ids[:, None] < b_ids[None, :]
        ai, bi = np.nonzero(mask)
        va, vb = a_ids[ai], b_ids[bi]
        return pd.DataFrame(
            {
                "vec_a": np.minimum(va, vb),
                "vec_b": np.maximum(va, vb),
                "cosine_sim": sims[ai, bi],
            }
        )

    return exploded.groupBy("i", "j").applyInPandas(
        tile_block, "vec_a bigint, vec_b bigint, cosine_sim double"
    )


def _two_nn_candidates(emb: DataFrame, cell_col: str | None = None) -> DataFrame:
    """Per-vector two-smallest-distance candidate relation (vec_id, d)
    via the embed_neardup_pairs TILED block pattern (one scan, each
    vector exploded into its row+column block memberships, one shuffle
    group per unordered tile pair, BLAS distances inside
    applyInPandas): each block emits only each member's TWO smallest
    squared distances to the other side, so per-vector candidates are
    bounded by 2*(tiles+1) rows and the global 2-NN is their 2-element
    sorted prefix (a globally-second distance is at worst second within
    its block). Exact without a CartesianProduct.

    With `cell_col`, the tiling runs WITHIN each cell (group key
    (cell, i, j)): the candidate set is same-cell vectors only — the
    IVF nprobe=1 ANN candidate semantics, the 100 TB scale path where
    the corpus is partitioned by cell and the 2-NN never leaves a
    partition. Shuffle volume drops from (tiles+1) * corpus to the
    same bound per cell; peak task memory is 2/tiles of the LARGEST
    CELL instead of the corpus.

    Determinism: squared distances are np.round-6 (bit-identical, the
    neardup convention); the 2-smallest prefix is by VALUE (ties
    collapse to equal values)."""
    import numpy as np
    import pandas as pd

    t_count = _NEARDUP_TILES
    base = emb.withColumn("tile", F.pmod("vec_id", F.lit(t_count)).cast("int"))
    t = F.col("tile")
    a_memb = F.transform(
        F.sequence(t, F.lit(t_count - 1)),
        lambda j: F.struct(
            t.alias("i"), j.cast("int").alias("j"), F.lit("a").alias("side")
        ),
    )
    b_memb = F.transform(
        F.sequence(F.lit(0), t),
        lambda i: F.struct(
            i.cast("int").alias("i"), t.alias("j"), F.lit("b").alias("side")
        ),
    )
    keys = ([cell_col] if cell_col else []) + ["i", "j"]
    exploded = base.select(
        *(([cell_col] if cell_col else []) + ["vec_id", "v"]),
        F.explode(F.concat(a_memb, b_memb)).alias("m"),
    ).select(
        *(([cell_col] if cell_col else [])),
        F.col("m.i").alias("i"),
        F.col("m.j").alias("j"),
        F.col("m.side").alias("side"),
        "vec_id",
        "v",
    )

    def block_two_nn(key, pdf):
        i, j = key[-2], key[-1]
        a = pdf[pdf["side"] == "a"]
        b = pdf[pdf["side"] == "b"]
        out_ids: list[np.ndarray] = []
        out_ds: list[np.ndarray] = []
        if len(a) and len(b):
            a_ids = a["vec_id"].to_numpy()
            b_ids = b["vec_id"].to_numpy()
            a_mat = np.stack(a["v"].to_numpy())
            b_mat = np.stack(b["v"].to_numpy())
            d2 = (
                (a_mat * a_mat).sum(axis=1)[:, None]
                - 2.0 * (a_mat @ b_mat.T)
                + (b_mat * b_mat).sum(axis=1)[None, :]
            )
            d2 = np.round(d2, 6)
            self_mask = a_ids[:, None] == b_ids[None, :]
            d2 = np.where(self_mask, np.inf, d2)
            sides = [(a_ids, d2)]
            if i != j:  # off-diagonal: b-vectors meet tile i here only
                sides.append((b_ids, d2.T))
            for ids, mat in sides:
                k = min(2, mat.shape[1])
                part = np.sort(mat, axis=1)[:, :k]
                for c in range(k):
                    col = part[:, c]
                    keep = np.isfinite(col)
                    out_ids.append(ids[keep])
                    out_ds.append(col[keep])
        if not out_ids:
            return pd.DataFrame(
                {
                    "vec_id": pd.Series(dtype="int64"),
                    "d": pd.Series(dtype="float64"),
                }
            )
        return pd.DataFrame(
            {
                "vec_id": np.concatenate(out_ids),
                "d": np.concatenate(out_ds),
            }
        )

    return exploded.groupBy(*keys).applyInPandas(
        block_two_nn, "vec_id bigint, d double"
    )


def intrinsic_dim_from(emb: DataFrame, cand: DataFrame) -> DataFrame:
    """TwoNN per-label MLE rollup over a candidate-distance relation
    (r11 verdict ask #4 — the kernel the exact query and the ANN
    variant share VERBATIM, so the audit's gap measures the candidate
    set, never a second estimator implementation): global 2-NN per
    vector = the 2-element sorted prefix of its candidates, mu^2 =
    d2/d1 one exact division, per-label d = n_used / sum(0.5 ln mu^2).
    Duplicates (d1 = 0, ln mu undefined) and vectors without a second
    neighbor are excluded from n_used but counted in n_vecs; the final
    estimate crosses the decimal hop (ln ulp + partial-sum order
    washed). The candidate aggregation is a bounded collect per
    vec_id; the rollup is |labels| rows."""
    two = (
        cand.groupBy("vec_id")
        .agg(F.slice(F.array_sort(F.collect_list("d")), 1, 2).alias("nn"))
        .select(
            "vec_id",
            F.element_at("nn", 1).alias("d1"),
            F.element_at("nn", 2).alias("d2"),
        )
    )
    usable = (F.col("d1") > 0) & F.col("d2").isNotNull()
    log_mu = F.lit(0.5) * F.log(F.col("d2") / F.col("d1"))
    per = (
        emb.select("vec_id", "label")
        .join(two, "vec_id", "left")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.sum(usable.cast("int")).cast("bigint").alias("n_used"),
            F.sum(F.when(usable, log_mu)).alias("s"),
        )
    )
    dim = (
        F.round(
            F.col("n_used") / F.expr("nullif(s, 0.0)"),
            6,
        )
        .cast("decimal(38,6)")
        .cast("double")
    )
    return per.select("label", "n_vecs", "n_used", dim.alias("intrinsic_dim"))


def embed_intrinsic_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TwoNN intrinsic-dimension estimate per label (r11; Facco et al.
    2017, "Estimating the intrinsic dimension of datasets by a minimal
    neighborhood information", public literature): for every vector the
    EXACT first and second nearest-neighbor distances (global, not
    per-label — classes share the ambient space), mu = r2/r1, and the
    per-label MLE d = n / sum(ln mu). The curation signal behind
    pruning theory (Sorscher et al. 2022 tie pruning gains to d) and a
    quantization-budget input: a low-d manifold embedded in a high-dim
    space tolerates far more aggressive PQ/BQ compression.

    Plan: _two_nn_candidates (tiled exact 2-NN, no CartesianProduct) +
    intrinsic_dim_from — since r12 both legs are shared kernels, and
    the 100 TB swap the r11 docstring promised (run the estimator over
    IVF ANN candidates at a recall discount) is a real registered code
    path: embed_intrinsic_dim_ann reports the exact-vs-ANN estimate
    gap per label.

    Scale: shuffle volume (tiles+1) * corpus, peak task memory
    2/tiles of the corpus — identical posture to embed_neardup_pairs.
    """
    emb = _load_vectors(spark, sf_dir).select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("v"),
    )
    return intrinsic_dim_from(emb, _two_nn_candidates(emb))


def embed_intrinsic_dim_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-vs-ANN TwoNN audit (r11 verdict ask #4): the intrinsic
    dimension estimated twice per label — once over the exact global
    2-NN (_two_nn_candidates), once over IVF ANN candidates (2-NN
    restricted to the vector's own coarse cell, embed_ivf_assign's
    assignment VERBATIM — nprobe=1, the 100 TB partition-pruned path
    where the 2-NN never leaves a cell partition) — and the gap
    between them. The docs_lsh_tuning pattern applied to geometry
    estimation: before trusting the cheap estimator at scale, measure
    what the candidate restriction costs (a cell-boundary-crossing
    true 2-NN is replaced by a farther same-cell neighbor, biasing mu
    toward 1 and the estimate up or down depending on the manifold).

    Both legs run intrinsic_dim_from VERBATIM, so the gap can only
    come from the candidate sets. n_used_ann also exposes the
    structural loss: singleton-cell vectors have no ANN candidates at
    all. abs_gap is a plain IEEE subtraction of two decimal-hopped
    doubles — identical cross-engine by construction.

    Scale: the ANN leg's tiling runs within cells (peak task memory
    2/tiles of the largest cell); the exact leg is the documented
    test-scale reference — at 100 TB only the ANN leg runs and this
    audit's sf-scale gap band is the evidence it can be trusted.
    """
    emb = _load_vectors(spark, sf_dir).select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("v"),
    )
    exact = intrinsic_dim_from(emb, _two_nn_candidates(emb)).select(
        "label",
        "n_vecs",
        F.col("n_used").alias("n_used_exact"),
        F.col("intrinsic_dim").alias("dim_exact"),
    )
    asg = embed_ivf_assign(spark, sf_dir).select("vec_id", "cell")
    emb_cell = emb.join(asg, "vec_id")
    ann = intrinsic_dim_from(
        emb, _two_nn_candidates(emb_cell, cell_col="cell")
    ).select(
        F.col("label").alias("ann_label"),
        F.col("n_used").alias("n_used_ann"),
        F.col("intrinsic_dim").alias("dim_ann"),
    )
    # null-safe label join: the NULL-label stratum is a real group in
    # BOTH legs' rollups (groupBy keeps it), so the audit must report
    # it — a plain equi-join silently dropped the row the exact query
    # emits (r12 review finding; the oracle mirrors with
    # IS NOT DISTINCT FROM)
    return exact.join(
        ann, F.col("label").eqNullSafe(F.col("ann_label"))
    ).select(
        "label",
        "n_vecs",
        "n_used_exact",
        "n_used_ann",
        "dim_exact",
        "dim_ann",
        F.abs(F.col("dim_ann") - F.col("dim_exact")).alias("abs_gap"),
    )


def _plane_coeffs(table: int) -> list[list[float]]:
    """Deterministic pseudo-random +/-1 hyperplanes from md5 — no RNG state,
    so replay/resume and the driver's re-runs see identical planes."""
    planes = []
    for p in range(_N_PLANES):
        row = []
        for d in range(_DIM):
            h = hashlib.md5(f"plane:{table}:{p}:{d}".encode()).digest()[0]
            row.append(1.0 if h % 2 == 0 else -1.0)
        planes.append(row)
    return planes


def _bucket_col(table: int):
    """Random-hyperplane signature for one table: bit p = sign(v.plane_p),
    prefixed with the table id so tables never collide. Expression form —
    used by tests to reconstruct candidate sets; the operator itself uses
    the BLAS batch form below (identical signatures)."""
    planes = _plane_coeffs(table)
    bits = [
        F.when(
            _dot(F.col("v"), F.array(*[F.lit(c) for c in planes[p]])) >= 0, "1"
        ).otherwise("0")
        for p in range(_N_PLANES)
    ]
    return F.concat(F.lit(f"{table}:"), *bits)


def _with_buckets_pandas(df: DataFrame) -> DataFrame:
    """(vec_id, label, v) -> one row per (vector, table) with its bucket.

    All _N_TABLES * _N_PLANES hyperplane projections happen as ONE BLAS
    matmul per Arrow batch — the per-row expression form pays 48
    interpreted 64-dim folds per vector (plus a 3072-literal plan), ~5x
    the wall-clock. Signatures are bit-identical to _bucket_col.
    """
    import numpy as np
    import pandas as pd

    planes = np.array(
        [_plane_coeffs(t)[p] for t in range(_N_TABLES) for p in range(_N_PLANES)]
    )  # (L*B, dim)

    # MSB = plane 0, matching the "1"/"0" join order of _bucket_col
    weights = 1 << np.arange(_N_PLANES - 1, -1, -1)

    def buckets(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf["v"].to_numpy())  # (n, dim)
            bits = (mat @ planes.T) >= 0  # (n, L*B)
            ids = pdf["vec_id"].to_numpy()
            labels = pdf["label"].to_numpy()
            vs = pdf["v"].to_numpy()
            frames = []
            for t in range(_N_TABLES):
                vals = bits[:, t * _N_PLANES : (t + 1) * _N_PLANES] @ weights
                frames.append(
                    pd.DataFrame(
                        {
                            "vec_id": ids,
                            "label": labels,
                            "v": vs,
                            "bucket": [f"{t}:{v:0{_N_PLANES}b}" for v in vals],
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    return df.mapInPandas(
        buckets, "vec_id bigint, label int, v array<double>, bucket string"
    )


def embed_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via multi-table random-hyperplane LSH.

    _N_TABLES independent hash tables of _N_PLANES bits each; candidates
    = union over tables of vectors sharing the query's bucket, deduped,
    then exact cosine re-rank. Multi-table probing is what makes
    hyperplane LSH usable — a single table's recall collapses when
    true-neighbor cosines sit near the noise floor (this corpus: top-10
    cosine ~0.37 vs sigma 0.12). L and B trade recall vs candidates:
    recall ~ 1-(1-(1-theta/pi)^B)^L, candidates ~ L*n/2^B; B grows with
    log(n) at scale. The bucket equi-join is the 100 TB path: signature
    computation is narrow, the join shuffles (bucket, vec_id) only.
    Approximate wrt true top-k, but DETERMINISTIC given the fixed
    md5-seeded planes — so since round 6 it carries a full DuckDB
    oracle (_lsh_bucket_sql renders the same signatures from literal
    plane lists); tests/test_similarity.py additionally measures recall
    against embed_knn and bounds candidates examined.
    """
    emb = _load_vectors(spark, sf_dir).select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    # bucket the 1-row query side separately — deriving both sides from
    # one bucketed relation would run the corpus-wide bucketing twice
    qrow = emb.filter(F.col("vec_id") == _QUERY_VEC_ID)
    qbuckets = _with_buckets_pandas(qrow).select(F.col("bucket").alias("qbucket"))
    cand_ids = (
        _with_buckets_pandas(
            emb.filter(F.col("vec_id") != _QUERY_VEC_ID).transform(spread, "vec_id")
        )
        .join(F.broadcast(qbuckets), F.col("bucket") == F.col("qbucket"))
        .select("vec_id")
        .distinct()  # dedup on the id only, never on the vector array
    )
    return (
        emb.join(cand_ids, "vec_id")
        .crossJoin(F.broadcast(qrow.select(F.col("v").alias("qv"))))
        .select(
            "vec_id",
            "label",
            F.round(_cosine(F.col("v"), F.col("qv")), 6).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), F.asc("vec_id"))
        .limit(_TOP_K)
        # session-persisted (r14): embed_ndcg_audit re-runs this leg —
        # k rows, one bucketed probe per session (embed_knn's note)
        .persist()
    )


def embed_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: coarse quantize with per-label centroids, probe the
    _N_PROBE nearest cells, exact re-rank inside them.

    The inverted-file pattern at scale: centroid training is one
    (label, dim) aggregation; cell probing is a broadcast join of the
    nprobe-row best-cells relation; the exact top-k scan touches only
    those cells' partitions of the corpus (at 100 TB: the corpus is
    stored partitioned by cell id, so the probe is partition pruning,
    not a filter). nprobe trades recall vs scan fraction — nprobe=3 of
    10 cells measures 0.4-0.5 recall@10 on this corpus vs 0.1 at
    nprobe=1 (weak cluster structure; neighbors spread across cells).
    """
    emb = _load_vectors(spark, sf_dir).select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    # centroid array per label: the FAMILY kernel verbatim (rounded
    # per-dim means, (cell, cv)) — an inline unrounded rebuild computed
    # the same cells on a different canonical plan, silently opting out
    # of the family build's cache (caught by the r8 family-consumer
    # plan self-check)
    cvec = _centroid_vecs(emb).select(F.col("cell").alias("label"), "cv")
    q = emb.filter(F.col("vec_id") == _QUERY_VEC_ID).select(F.col("v").alias("qv"))
    best_cells = (
        cvec.crossJoin(F.broadcast(q))
        .select("label", "qv", _cosine(F.col("cv"), F.col("qv")).alias("csim"))
        .orderBy(F.desc("csim"), F.asc("label"))
        .limit(_N_PROBE)
        .select("label", "qv")
    )
    return (
        emb.filter(F.col("vec_id") != _QUERY_VEC_ID)
        .join(F.broadcast(best_cells), "label")
        .select(
            "vec_id",
            "label",
            F.round(_cosine(F.col("v"), F.col("qv")), 6).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), F.asc("vec_id"))
        .limit(_TOP_K)
        # session-persisted (r14): consumed by embed_recall_audit and
        # embed_ndcg_audit besides its own query — k rows, one
        # cell-probe scan per session (see embed_knn's persist note)
        .persist()
    )


def _centroid_vecs(emb: DataFrame) -> DataFrame:
    """Per-label mean vectors as (cell, cv) — the deterministic coarse
    quantizer shared by embed_ivf_assign / embed_pq_codes /
    embed_pipeline_e2e. Means are rounded to 6 decimals on BOTH engines
    (the embed_centroids convention — washes out partial-sum order), so
    every downstream distance folds identical doubles in identical dim
    order and is bit-identical.

    Persisted: the codebook is k rows but costs a corpus-wide
    (label, dim) aggregation to build, and five operators consume it
    (ivf_assign / pq_codes / ann_ivfpq / semdedup / pipeline) — often
    several times within one query (candidate join + probe + lookup
    table). Cache-manager plan matching shares ONE build across all of
    them in a session."""
    return (
        emb.select("label", F.posexplode("v").alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(F.round(F.avg("x"), 6).alias("cx"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "cx"))).alias("s"))
        .select(
            F.col("label").alias("cell"),
            F.transform("s", lambda t: t.cx).alias("cv"),
        )
        .persist()
    )


def embed_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index BUILD: assign every vector to its nearest centroid —
    the partition-by-cell artifact embed_ann_ivf's docstring names as
    the 100 TB layout (cell id = the partition key the corpus is
    rewritten under, making cell probes partition pruning).

    Centroids are the per-label means rounded to 6 decimals on BOTH
    engines (the embed_centroids convention — washes out partial-sum
    order), so the per-(vector, cell) squared distance folds identical
    doubles in identical dim order and is bit-identical; the argmin
    orders by the round-6 distance with a cell tiebreak, deterministic
    across engines. Plan shape: one (label, dim) aggregation for the
    ~k-row centroid table, broadcast to a narrow per-vector argmin —
    the only data-sized shuffle is the vec_id window, and at scale
    that folds into the write that partitions the corpus by cell.
    """
    emb = _load_vectors(spark, sf_dir).select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    cvec = _centroid_vecs(emb)
    w = Window.partitionBy("vec_id").orderBy("sq_dist", "cell")
    return (
        emb.crossJoin(F.broadcast(cvec))
        .select(
            "vec_id",
            "label",
            "cell",
            F.round(_sq_dist("v", "cv"), 6).alias("sq_dist"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "label", "cell", "sq_dist")
    )


def embed_cell_balance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index-balance audit: per-cell population share and ratio to
    the mean cell size — the vector-index analog of
    events_key_skew_audit. A hot cell absorbs a disproportionate share
    of probe latency and signals the coarse quantizer needs
    re-training (or the cell needs splitting) BEFORE the index is
    rolled out; a starved cell wastes a probe budget slot. The
    assignment is the embed_ivf_assign kernel verbatim (and its SQL in
    the oracle), so the audit cannot drift from the index build it
    grades.

    Scale: one ivf_assign pass (broadcast codebook + per-vector
    argmin), then a cell-keyed rollup with map-side partials — k rows
    out. Shares are exact int64/int64 divisions; ratio factors cast to
    double before multiplying (no overflow at any corpus size)."""
    kc = (
        embed_ivf_assign(spark, sf_dir)
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n_vecs"))
    )
    g = kc.agg(
        F.count(F.lit(1)).alias("n_cells"), F.sum("n_vecs").alias("total")
    )
    return kc.crossJoin(F.broadcast(g)).select(
        "cell",
        "n_vecs",
        "n_cells",
        (F.col("n_vecs") / F.col("total").cast("double")).alias("vec_share"),
        (
            F.col("n_vecs").cast("double")
            * F.col("n_cells").cast("double")
            / F.col("total").cast("double")
        ).alias("balance_ratio"),
    )


def embed_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-quality audit: recall@k of the IVF cell-probe ANN against
    exact kNN for the query vector — the search-quality gate an index
    build pipeline checks before deployment, expressed as an
    oracle-checked 1-row relation (both rankings are deterministic:
    round-6 cosine with vec_id tiebreaks, so the overlap count is
    engine-exact, unlike typical ANN evaluations that can only be
    rows-only). Cost: the two top-k searches it audits, plus a k-row
    join."""
    exact = embed_knn(spark, sf_dir).select("vec_id")
    approx = embed_ann_ivf(spark, sf_dir).select("vec_id")
    return (
        exact.join(approx, "vec_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .select(
            F.lit(_TOP_K).alias("k"),
            "n_overlap",
            (F.col("n_overlap") / _TOP_K).alias("recall"),
        )
    )


_IVF_SWEEP_PROBES = (1, 2, 4)  # nprobe grid bracketing _N_PROBE


def embed_ivf_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF probe-budget tuning sweep (r8 verdict ask #5 — the audit
    symmetry gap): recall@k against exact kNN and candidate volume per
    nprobe in _IVF_SWEEP_PROBES, the nprobe-recall/cost curve an index
    owner reads before committing a 100 TB probe config. MinHash
    banding has docs_lsh_tuning; this is the coarse quantizer's
    counterpart. Every leg reuses the audited kernels verbatim (the
    embed_ndcg_audit pattern): cells and their query ranking come from
    the family centroid kernel (_centroid_vecs) with embed_ann_ivf's
    exact cell order (unrounded cosine desc, label asc), candidate
    ranking is the same round-6 cosine + vec_id tiebreak, and the
    exact leg IS embed_knn — so the sweep grades exactly the search it
    tunes and cannot drift from it.

    Scale: ONE corpus scan serves the whole grid — the (nprobe, cell)
    probe relation is sum(grid) tiny rows and broadcast, so each
    vector fans out only into the grid points that probe its cell;
    per-grid-point top-k is a window over candidate rows only, and the
    recall join touches the k-row exact leg. A wider grid costs
    broadcast rows, never extra scans.
    """
    emb = _load_vectors(spark, sf_dir).select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    cvec = _centroid_vecs(emb).select(F.col("cell").alias("label"), "cv")
    q = emb.filter(F.col("vec_id") == _QUERY_VEC_ID).select(
        F.col("v").alias("qv")
    )
    ranked = cvec.crossJoin(F.broadcast(q)).select(
        "label",
        "qv",
        F.row_number()
        .over(
            Window.orderBy(
                F.desc(_cosine(F.col("cv"), F.col("qv"))), F.asc("label")
            )
        )
        .alias("cell_rank"),
    )
    grid = spark.createDataFrame(
        [(int(p),) for p in _IVF_SWEEP_PROBES], "nprobe int"
    )
    # both sides are tiny (|grid| x k rows) but the theta-join must not
    # plan a CartesianProduct: broadcast the ranked cells explicitly
    probes = grid.join(
        F.broadcast(ranked), F.col("cell_rank") <= F.col("nprobe")
    ).select("nprobe", "label")
    # the query cosine folds ONCE per candidate vector (over the union
    # of all probed cells — the widest grid point); the per-grid-point
    # membership then fans the scored row out through a cheap broadcast
    # join instead of re-folding 64 dims per nprobe
    union_cells = ranked.filter(
        F.col("cell_rank") <= max(_IVF_SWEEP_PROBES)
    ).select("label", "qv")
    scored = (
        emb.filter(F.col("vec_id") != _QUERY_VEC_ID)
        .join(F.broadcast(union_cells), "label")
        .select(
            "label",
            "vec_id",
            F.round(_cosine(F.col("v"), F.col("qv")), 6).alias("cosine_sim"),
        )
    )
    cand = scored.join(F.broadcast(probes), "label").select(
        "nprobe", "vec_id", "cosine_sim"
    )
    vol = cand.groupBy("nprobe").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidates")
    )
    w = Window.partitionBy("nprobe").orderBy(
        F.desc("cosine_sim"), F.asc("vec_id")
    )
    topk = (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOP_K)
        .select("nprobe", "vec_id")
    )
    exact = embed_knn(spark, sf_dir).select("vec_id")
    ov = (
        topk.join(exact, "vec_id")
        .groupBy("nprobe")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_overlap"))
    )
    zero = F.lit(0).cast("bigint")
    return (
        grid.join(F.broadcast(vol), "nprobe", "left")
        .join(F.broadcast(ov), "nprobe", "left")
        .select(
            "nprobe",
            F.lit(_TOP_K).alias("k"),
            F.coalesce("n_candidates", zero).alias("n_candidates"),
            F.coalesce("n_overlap", zero).alias("n_overlap"),
            (F.coalesce("n_overlap", zero) / F.lit(_TOP_K)).alias("recall"),
        )
    )


_KM_K = 8  # k-means cluster count
_KM_ITERS = 2  # assignment passes (one centroid update between them)


def _km_assign(emb: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest-centroid assignment via partial min-struct aggregation
    (the embed_pq_codes argmin shape — no window, one ~vector-sized
    shuffle): round-6 squared distance with a cell tiebreak, the same
    cross-engine determinism convention as embed_ivf_assign."""
    d = F.round(_sq_dist(F.col("v"), F.col("cv")), 6)
    return (
        emb.crossJoin(F.broadcast(cents))
        .select(
            "vec_id",
            "label",
            "v",
            F.struct(d.alias("sq_dist"), F.col("cell")).alias("dc"),
        )
        .groupBy("vec_id", "label")
        .agg(F.min("dc").alias("m"), F.first("v").alias("v"))
        .select(
            "vec_id",
            "label",
            "v",
            F.col("m.cell").alias("cell"),
            F.col("m.sq_dist").alias("sq_dist"),
        )
    )


def embed_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means over the embedding corpus — the iterative
    clustering kernel behind codebook training, fully oracle-checked
    (most engines leave k-means rows-only; deterministic conventions
    make the whole iteration value-comparable against DuckDB CTEs).

    Deterministic spec: init = the _KM_K vectors with the smallest
    vec_ids (cell id = that vec_id); _KM_ITERS assignment passes with a
    centroid update between them. Assignment argmin is the round-6
    distance + cell-tiebreak min-struct (embed_ivf_assign convention);
    updated centroids are per-(cell, dim) means rounded to 6 decimals
    (embed_centroids convention), so every fold sees identical doubles
    in identical order on both engines. Cells that attract no vectors
    simply vanish from the next codebook — same on both engines.

    Scale: each pass is one broadcast of the k-row codebook + a narrow
    per-vector argmin (map-side partial min-struct), then one
    (cell, dim)-key aggregation to rebuild the codebook — per-iteration
    cost is ~2 corpus scans and no data-sized shuffle beyond the
    (vec_id) partial agg; iterations are bounded by _KM_ITERS, not
    data-dependent (no convergence loop to stall a 100 TB run).
    """
    _, assigned = _km_fit(_load_vectors(spark, sf_dir))
    return assigned.select("vec_id", "label", "cell", "sq_dist")


def _km_fit(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Lloyd's fit shared by embed_kmeans / embed_silhouette /
    embed_prototypicality / embed_cluster_purity: returns (final
    codebook, final assignment) — the codebook is exactly the one the
    final assignment pass measured distances against, so audits over
    the pair are self-consistent.

    Both relations PERSIST (r11): four session consumers fan out of
    the fit, and without the cache each re-ran the full _KM_ITERS
    broadcast-argmin passes (~1.3 s apiece at sf0.1). Cache-manager
    plan matching shares one fit across all four (the _verified_pairs
    pattern); the bench charges the one-time build to an explicit
    `family_build:similarity.km_fit` row (FAMILY_BUILDS below — the
    frozen attribution protocol)."""
    emb = raw.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    cents = (
        emb.orderBy("vec_id")
        .limit(_KM_K)
        .select(F.col("vec_id").alias("cell"), F.col("v").alias("cv"))
    )
    assigned = _km_assign(emb, cents)
    for _ in range(_KM_ITERS - 1):
        cents = (
            assigned.select("cell", F.posexplode("v").alias("dim", "x"))
            .groupBy("cell", "dim")
            .agg(F.round(F.avg("x"), 6).alias("cx"))
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "cx"))).alias("s"))
            .select("cell", F.transform("s", lambda t: t.cx).alias("cv"))
        )
        assigned = _km_assign(emb, cents)
    return cents.persist(), assigned.persist()


def embed_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering-quality audit: per-cell simplified silhouette of the
    k-means fit — the standard O(n·k) silhouette variant (distance to
    centroids instead of mean pairwise distance; Hruschka et al.'s
    simplified silhouette, public literature) that clustering pipelines
    report because the classic O(n²) form is unrunnable at corpus
    scale. For each vector: a = distance to its own (final) centroid,
    b = distance to the nearest OTHER centroid,
    s = (b - a) / max(a, b) — s near 1 means tight well-separated
    cells, near 0 means boundary vectors, negative means likely
    misassignment. Reported per cell with the cell's population.

    Determinism: a and b are IEEE sqrt of the round-6 squared
    distances (_km_assign convention; sqrt is correctly rounded, so
    bit-identical across engines); per-vector s is a pure-double
    expression; the per-cell mean goes through the round-6 decimal hop
    (partial-sum order wash). A vector with no other cell in the
    codebook (k collapsed to 1) yields NULL s on both engines and
    drops out of the mean. Division is guarded: coincident point and
    centroids (max(a,b) = 0) define s = 0.

    Scale: reuses the _km_fit passes (broadcast k-row codebook, narrow
    per-vector argmin) plus ONE more broadcast crossJoin for the
    nearest-other-centroid distance — still no data-sized shuffle
    beyond the per-vector aggregations; the rollup output is k rows.
    """
    cents, assigned = _km_fit(_load_vectors(spark, sf_dir))
    oth = (
        assigned.select("vec_id", F.col("cell").alias("own"), "v")
        .crossJoin(F.broadcast(cents))
        .filter(F.col("cell") != F.col("own"))
        .groupBy("vec_id")
        .agg(F.min(F.round(_sq_dist(F.col("v"), F.col("cv")), 6)).alias("b2"))
    )
    a = F.sqrt("sq_dist")
    b = F.sqrt("b2")
    # explicit NULL-first branch: Spark's greatest() skips NULLs while
    # DuckDB's propagates them, so the no-other-cell case must be
    # decided before either engine's greatest() semantics can differ
    s = (
        F.when(F.col("b2").isNull(), F.lit(None).cast("double"))
        .when(F.greatest(a, b) == 0.0, F.lit(0.0))
        .otherwise((b - a) / F.greatest(a, b))
    )
    return (
        assigned.join(oth, "vec_id", "left")
        .select("cell", s.alias("s"))
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.round(F.avg("s"), 6)
            .cast("decimal(38,6)")
            .cast("double")
            .alias("avg_silhouette"),
        )
    )


def embed_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """External cluster-validity audit (r11): per-cell label purity of
    the k-means fit against the corpus ground-truth labels — majority
    label, its count, purity = majority/size — plus the cell's
    contribution to overall corpus purity (the standard external
    validity measure, Manning/Raghavan/Schütze IR book ch. 16, public
    literature). embed_silhouette grades the GEOMETRY of the fit; this
    grades its AGREEMENT with labels — the pair a curation pipeline
    reads before trusting cluster-level decisions (semdedup pruning,
    prototype pruning) to respect semantic boundaries.

    Rides _km_fit VERBATIM (embed_kmeans' exact assignment — the audit
    cannot drift from the fit it grades). Majority tie policy: the
    SMALLEST label wins (max on (count, -label) struct — deterministic
    on both engines, no engine hash-order leak).

    Determinism: counts exact int64; purity and contribution are
    single int64/int64 IEEE divisions (bit-identical, no rounding).

    Scale: one (cell, label) rollup over the assignment (map-side
    combinable, |cells|x|labels| bounded), one cell rollup, one 1-row
    total broadcast. Nothing beyond the fit's own passes touches the
    corpus.

    Reference parity: no similarity surface in the reference
    (SURVEY.md §2.12 extension family); public-literature anchor only.
    """
    _, assigned = _km_fit(_load_vectors(spark, sf_dir))
    per = assigned.groupBy("cell", "label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    best = per.groupBy("cell").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_labels"),
        F.sum("n").cast("bigint").alias("cell_size"),
        F.max(F.struct(F.col("n"), (-F.col("label")).alias("neg"))).alias(
            "m"
        ),
    )
    tot = assigned.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    return best.crossJoin(F.broadcast(tot)).select(
        "cell",
        "cell_size",
        "n_labels",
        (-F.col("m.neg")).cast("int").alias("majority_label"),
        F.col("m.n").cast("bigint").alias("majority_n"),
        (F.col("m.n") / F.col("cell_size").cast("double")).alias("purity"),
        (F.col("m.n") / F.col("n_total").cast("double")).alias(
            "purity_contrib"
        ),
    )


_PROTO_PRUNE_PCT = 30  # prune the most prototypical (easiest) 30% per cell


def embed_prototypicality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSL-prototypes data pruning (r11; Sorscher et al. 2022, "Beyond
    neural scaling laws: beating power-law scaling via data pruning",
    public literature): rank every vector by closeness to its k-means
    cluster centroid — the cluster prototype — and mark the pruning
    verdict. The paper's abundant-data recipe keeps the HARD tail:
    examples closest to their prototype are the most redundant, so the
    easiest _PROTO_PRUNE_PCT% of each cluster is dropped and the rest
    kept. This is the embedding-side complement of the text-side
    quality gates: a coreset selector driven by the SAME k-means fit
    the cluster audits grade (embed_kmeans / embed_silhouette via
    _km_fit VERBATIM — the verdict can never disagree with the
    clustering it prunes).

    Determinism: sq_dist is the round-6 argmin distance (bit-identical
    across engines, _km_assign convention); the rank is row_number
    under the total order (sq_dist ASC, vec_id ASC); the keep verdict
    is pure int64 arithmetic (rank*100 > PCT*cell_size — no float
    fraction anywhere).

    Scale: reuses the _km_fit passes (broadcast k-row codebook, narrow
    per-vector argmin, no data-sized shuffle beyond the per-vector
    partial aggregations) + ONE cell-partitioned window for the
    rank/size — the skew ceiling is the largest cluster, the same
    bound every per-cell audit in this module already carries.

    Reference parity: no similarity surface in the reference
    (SURVEY.md §2.12 extension family); public-literature anchor only.
    """
    _, assigned = _km_fit(_load_vectors(spark, sf_dir))
    w = Window.partitionBy("cell").orderBy("sq_dist", "vec_id")
    ranked = assigned.select(
        "vec_id",
        "label",
        "cell",
        "sq_dist",
        F.row_number().over(w).cast("bigint").alias("proto_rank"),
        F.count(F.lit(1))
        .over(Window.partitionBy("cell"))
        .cast("bigint")
        .alias("cell_size"),
    )
    return ranked.select(
        "*",
        (
            F.col("proto_rank") * 100
            > F.lit(_PROTO_PRUNE_PCT) * F.col("cell_size")
        ).alias("keep"),
    )


_MMR_POOL = 32  # relevance candidate pool fed to the diversifier
_MMR_K = 8  # diversified result size
_MMR_LAMBDA = 0.7  # relevance vs redundancy trade-off


def embed_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998, public literature) — the diversification step between ANN
    retrieval and serving: take the _MMR_POOL most-relevant vectors
    for the query (exact round-6 cosine, the embed_knn convention),
    then greedily select _MMR_K of them maximizing
    λ·sim(q,d) − (1−λ)·max_{s∈selected} sim(d,s). Completes the
    retrieval story beside docs_bm25_search (lexical) and embed_knn
    (vector): relevance alone returns near-duplicates; MMR trades
    them for coverage. Fully oracle-checked: round-6 cosines, vec_id
    tiebreaks, and identical IEEE score arithmetic make every pick
    engine-exact.

    Scale: the candidate pool is top-k relevance (TakeOrderedAndProject
    over the corpus — the only corpus-sized step); the greedy loop then
    runs on the POOL-sized relation (k tiny broadcast joins + 1-row
    argmaxes, the embed_kcenter_coreset loop shape with lineage cut per
    pick) — pool size, not corpus size, bounds the iteration cost.
    """
    emb = _load_vectors(spark, sf_dir)
    q = emb.filter(F.col("vec_id") == _QUERY_VEC_ID).select(
        F.col("embedding").cast("array<double>").alias("qv")
    )
    pool = (
        emb.filter(F.col("vec_id") != _QUERY_VEC_ID)
        .select(
            "vec_id",
            "label",
            F.col("embedding").cast("array<double>").alias("v"),
        )
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            "v",
            F.round(_cosine(F.col("v"), F.col("qv")), 6).alias("simq"),
        )
        .orderBy(F.desc("simq"), F.asc("vec_id"))
        .limit(_MMR_POOL)
        .localCheckpoint(eager=False)
    )
    lam, mu = _MMR_LAMBDA, 1.0 - _MMR_LAMBDA
    first = (
        pool.orderBy(F.desc("simq"), F.asc("vec_id"))
        .limit(1)
        .select(
            "vec_id",
            "label",
            "v",
            "simq",
            F.lit(None).cast("double").alias("max_sim_selected"),
            (F.lit(lam) * F.col("simq")).alias("mmr_score"),
        )
        .localCheckpoint(eager=False)
    )
    picks = [first]
    cand = pool.join(
        F.broadcast(first.select(F.col("vec_id").alias("sel_id"))),
        F.col("vec_id") == F.col("sel_id"),
        "left_anti",
    ).crossJoin(F.broadcast(first.select(F.col("v").alias("sv")))).select(
        "vec_id",
        "label",
        "v",
        "simq",
        F.round(_cosine(F.col("v"), F.col("sv")), 6).alias("maxsim"),
    )
    # r14 examined, left alone: a rotating per-iteration persist of
    # `cand` (the kcenter probe) measured SLOWER here (3.33 -> 4.74 s
    # min at sf0.1) — the pool is _MMR_POOL rows rooted at a
    # localCheckpoint, so re-deriving the fold chain is cheaper than
    # building k InMemoryRelations. OPTIMIZATION_r14.md has the A/B.
    # r15: the checkpoints are eager=False — the pick loop is
    # statically bounded, so nothing reads them during construction
    # and the k+1 per-pick materialization JOBS collapse into the
    # consumer's single action (each checkpoint still computes exactly
    # once: RDD lineage is a DAG); 2.7-3.2 -> 2.2-2.4 s warm at
    # sf0.1/32c, identical picks. The chains/CC keep EAGER checkpoints
    # — measured 1.5-3x WORSE lazy there (convergence loops and
    # persisted-kernel side effects need the eagerness).
    for _ in range(_MMR_K - 1):
        score = F.lit(lam) * F.col("simq") - F.lit(mu) * F.col("maxsim")
        top = (
            cand.select(
                "vec_id", "label", "v", "simq", "maxsim", score.alias("mmr")
            )
            .orderBy(F.desc("mmr"), F.asc("vec_id"))
            .limit(1)
            .select(
                "vec_id",
                "label",
                "v",
                "simq",
                F.col("maxsim").alias("max_sim_selected"),
                F.col("mmr").alias("mmr_score"),
            )
            .localCheckpoint(eager=False)
        )
        picks.append(top)
        cand = cand.join(
            F.broadcast(top.select(F.col("vec_id").alias("sel_id"))),
            F.col("vec_id") == F.col("sel_id"),
            "left_anti",
        ).crossJoin(F.broadcast(top.select(F.col("v").alias("sv")))).select(
            "vec_id",
            "label",
            "v",
            "simq",
            F.greatest(
                "maxsim", F.round(_cosine(F.col("v"), F.col("sv")), 6)
            ).alias("maxsim"),
        )
    out: DataFrame | None = None
    for rank, p in enumerate(picks, start=1):
        row = p.select(
            F.lit(rank).cast("int").alias("rank"),
            "vec_id",
            "label",
            "simq",
            "max_sim_selected",
            "mmr_score",
        )
        out = row if out is None else out.unionByName(row)
    return out


_KC_K = 8  # coreset size (greedy farthest-point iterations)


def embed_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset selection (farthest-point traversal,
    Gonzalez 1985, public literature): seed with the lowest vec_id,
    then _KC_K-1 times pick the vector FARTHEST (round-6 squared L2,
    vec_id tiebreak) from the current center set — the
    diversity-sampling / coreset-selection step of a training-data
    pipeline (active learning, dataset distillation), and a
    2-approximation of the optimal k-center cover. sel_dist of the
    k-th pick = the corpus coverage radius after k-1 centers, so the
    result doubles as a coverage-curve audit. Fully oracle-checked:
    the deterministic seed, round-6 distance wash, and vec_id
    tiebreaks make every selection engine-exact (coreset pickers are
    normally rows-only). When the corpus has fewer than _KC_K vectors
    the argmax legitimately re-picks at radius 0 (both engines alike);
    k rows always come back.

    Scale: each of the k iterations is ONE narrow corpus pass — the
    running min-distance column folds against the single broadcast
    new center (least(mind, d)) — plus a 1-row TakeOrderedAndProject
    argmax; 1-row winners are localCheckpoint'd (the BPE/CC loop
    convention) so lineage stays linear in k. O(k·n) distance work,
    no data-sized shuffle at any corpus size; iterations are bounded
    by _KC_K, never by the data.
    """
    emb = _load_vectors(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    seed = (
        emb.orderBy("vec_id")
        .limit(1)
        .select("vec_id", "v", F.lit(None).cast("double").alias("sel_dist"))
        .localCheckpoint(eager=False)
    )
    picks = [seed]
    cand = emb.crossJoin(F.broadcast(seed.select(F.col("v").alias("cv")))).select(
        "vec_id", "v", F.round(_sq_dist(F.col("v"), F.col("cv")), 6).alias("mind")
    )
    # r14 examined, left alone: a rotating per-iteration persist of the
    # running (vec_id, v, mind) relation measured SLOWER at sf0.1
    # (2.51 -> 2.78 s min) — each iteration is one corpus SCAN with an
    # i-deep fold chain, so the I/O is already O(k·n) and the extra
    # fold FLOPs are cheaper than building k InMemoryRelations; at
    # scale the persist alternative also holds a corpus-sized cache
    # entry per iteration. OPTIMIZATION_r14.md has the A/B.
    # r15: eager=False checkpoints (the embed_mmr_rerank note):
    # 1.7-2.1 -> 1.6 s warm, identical picks.
    for _ in range(_KC_K - 1):
        top = (
            cand.orderBy(F.desc("mind"), F.asc("vec_id"))
            .limit(1)
            .select("vec_id", "v", F.col("mind").alias("sel_dist"))
            .localCheckpoint(eager=False)
        )
        picks.append(top)
        cand = cand.crossJoin(F.broadcast(top.select(F.col("v").alias("cv")))).select(
            "vec_id",
            "v",
            F.least(
                "mind", F.round(_sq_dist(F.col("v"), F.col("cv")), 6)
            ).alias("mind"),
        )
    out: DataFrame | None = None
    for rank, p in enumerate(picks, start=1):
        row = p.select(
            F.lit(rank).cast("int").alias("rank"), "vec_id", "sel_dist"
        )
        out = row if out is None else out.unionByName(row)
    return out


_PCA_ITERS = 3  # fixed power-iteration count (no data-dependent loop)


def embed_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding corpus via power
    iteration — the whitening/decorrelation primitive embedding
    pipelines run before indexing (OPQ rotation, SemDeDup's
    preprocessing), fully oracle-checked like embed_kmeans (PCA is
    usually rows-only in engine test suites; fixed iterations +
    deterministic arithmetic conventions make the whole computation
    value-comparable against DuckDB CTEs).

    Spec shared by both engines: center by per-dim round-6 means;
    start from the uniform unit vector (1/sqrt(d) per dim);
    _PCA_ITERS power steps, each computing y = X̃·w per vector (a
    strict left fold over the array, round-6), u = X̃ᵀ·y per dim
    (one d-key aggregation, round-6), then w' = u/‖u‖ (round-6,
    NULLIF-guarded: a rank-0 centered matrix — e.g. a single vector —
    yields NULL loadings on both engines rather than an inf/NULL
    divergence). The eigenvalue estimate is ‖u‖/(n-1) (u = (n-1)·C·w
    for unit w), reported through the decimal hop. Sign is
    deterministic: both engines run identical arithmetic from the
    same start vector, so they produce the same signed component.
    Like any power method, PROXIMITY to the true top component after
    a fixed iteration budget depends on the spectral gap (pinned in
    tests on a gapped corpus; on near-isotropic data the result is
    the deterministic 3-step iterate, still useful as a whitening
    direction and still engine-exact) — the fixed budget rather than
    a convergence loop is deliberate: a data-dependent loop is the
    thing that stalls a 100 TB run.

    Scale: the centered corpus is persisted and scanned twice per
    iteration (the y fold is a broadcast of the 1-row weight vector —
    narrow; the u step is ONE d-key aggregation with map-side
    partials); iterations are fixed, never data-dependent. No
    d×d covariance materialization anywhere — the memory profile is
    O(d) driver-side and O(rows) executor-side, which is what lets
    the same plan run at 100 TB where an explicit covariance +
    eigensolver cannot.
    """
    emb = _load_vectors(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    m = (
        emb.select(F.posexplode("v").alias("dim", "x"))
        .groupBy("dim")
        .agg(F.round(F.avg("x"), 6).alias("mx"))
        .groupBy()
        .agg(F.array_sort(F.collect_list(F.struct("dim", "mx"))).alias("s"))
        .select(F.transform("s", lambda t: t.mx).alias("mv"))
    )
    c = (
        emb.crossJoin(F.broadcast(m))
        .select(
            "vec_id", F.zip_with("v", "mv", lambda x, mx: x - mx).alias("vc")
        )
        .persist()
    )
    w = emb.limit(1).select(
        F.array_repeat(
            F.lit(1.0) / F.sqrt(F.size("v").cast("double")), F.size("v")
        ).alias("wv")
    )
    norm = None
    for _ in range(_PCA_ITERS):
        y = c.crossJoin(F.broadcast(w)).select(
            "vc",
            F.round(
                F.aggregate(
                    F.zip_with("vc", "wv", lambda a, b: a * b),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            ).alias("y"),
        )
        u = (
            y.select(F.posexplode("vc").alias("dim", "xc"), "y")
            .groupBy("dim")
            .agg(F.round(F.sum(F.col("xc") * F.col("y")), 6).alias("uv"))
        )
        norm = u.agg(F.sqrt(F.sum(F.col("uv") * F.col("uv"))).alias("nrm"))
        w = (
            u.crossJoin(F.broadcast(norm))
            .select(
                "dim",
                F.round(
                    F.col("uv") / F.nullif(F.col("nrm"), F.lit(0.0)), 6
                ).alias("wx"),
            )
            .groupBy()
            .agg(F.array_sort(F.collect_list(F.struct("dim", "wx"))).alias("s"))
            .select(F.transform("s", lambda t: t.wx).alias("wv"))
            # 1-row weight vector: localCheckpoint cuts the per-iteration
            # lineage so the final plan stays 1 iteration deep instead of
            # _PCA_ITERS crossJoin chains (the token_bpe_merges pattern;
            # measured ~26% wall-clock at sf0.1, all of it plan
            # compilation)
            .localCheckpoint(eager=False)
        )
    eig = (
        norm.crossJoin(F.broadcast(emb.agg(F.count(F.lit(1)).alias("n"))))
        .select(
            F.round(
                F.col("nrm")
                / F.nullif((F.col("n") - 1).cast("double"), F.lit(0.0)),
                6,
            )
            .cast("decimal(38,6)")
            .cast("double")
            .alias("eigenvalue")
        )
    )
    return (
        w.select(F.posexplode("wv").alias("dim", "loading"))
        .crossJoin(F.broadcast(eig))
        .select(F.col("dim").cast("int").alias("dim"), "loading", "eigenvalue")
    )


def embed_neardup_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup REMOVAL: drop vec_b of every pair at or
    above the similarity threshold (keep-lowest-vec_id policy — the same
    anti-join shape as the MinHash/SimHash dedups, completing the dedup
    family over the embedding modality)."""
    emb = _load_vectors(spark, sf_dir)
    losers = (
        embed_neardup_pairs(spark, sf_dir)
        .select(F.col("vec_b").alias("vec_id"))
        .distinct()
    )
    return emb.join(losers, "vec_id", "left_anti").select("vec_id", "label")


def embed_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell-bucketed semantic dedup (SemDeDup-style): assign every
    vector to its nearest IVF centroid, compare pairs ONLY within a
    cell, drop the higher vec_id of every intra-cell pair at or above
    the cosine threshold.

    This is the 100 TB embedding-dedup plan: where embed_neardup_pairs
    is exact-quadratic over the corpus (tiled, but still O(n^2)
    compute), here the all-pairs work is confined to each cell — the
    pair join is an EQUI-join on the cell id, so after the corpus is
    rewritten partitioned-by-cell (embed_ivf_assign's layout) the
    comparison is partition-local with zero cross-cell traffic, and
    total compute is sum(|cell|^2) ~ n^2/k. Misses only cross-cell
    near-dups — the accepted SemDeDup trade.

    Determinism: centroids are round-6 per-label means (the
    embed_centroids convention), the per-(vector, cell) squared
    distance is round-6 with a cell tiebreak (the embed_ivf_assign
    argmin), and pair cosines are round-6 before thresholding. The
    oracle mirrors every fold EXPLICITLY (dot and each norm as
    list_sum left-folds, cosine = dot/(na*nb)) rather than via
    list_cosine_similarity, so both engines evaluate the same doubles
    in the same operation order and the driver hash checks the full
    pipeline, not just counts.
    """
    emb = _load_vectors(spark, sf_dir).select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    cvec = _centroid_vecs(emb)
    # argmin via partial min-struct aggregation (the embed_pq_codes
    # shape): map-side combine leaves one ~corpus-sized shuffle keyed
    # on vec_id, no window sort. Persisted: the assignment feeds both
    # sides of the pair join AND the final anti-join — unpersisted,
    # the broadcast cross-join + argmin (the dominant stage) would run
    # three times.
    assign = (
        emb.crossJoin(F.broadcast(cvec))
        .select(
            "vec_id",
            "label",
            "cell",
            F.round(_sq_dist("v", "cv"), 6).alias("sq_dist"),
        )
        .groupBy("vec_id", "label")
        .agg(F.min(F.struct("sq_dist", "cell")).alias("b"))
        .select("vec_id", "label", F.col("b.cell").cast("int").alias("cell"))
        .persist()
    )
    # attach vectors to assignments (one equi-join on vec_id; at scale
    # this shuffle IS the partition-by-cell rewrite of the corpus).
    # Norms are folded ONCE per vector here — the pair predicate then
    # evaluates dot/(na*nb), the exact same doubles _cosine would
    # produce, at a third of the per-pair fold work. Persisted so the
    # a/b branches of the self-join share one materialization.
    av = assign.join(
        emb.select("vec_id", "v", _norm(F.col("v")).alias("nrm")), "vec_id"
    ).persist()
    a = av.select(
        F.col("cell"),
        F.col("vec_id").alias("vec_a"),
        F.col("v").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = av.select(
        F.col("cell"),
        F.col("vec_id").alias("vec_b"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    losers = (
        a.join(b, "cell")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .filter(F.round(cos, 6) >= _NEARDUP_THRESHOLD)
        .select(F.col("vec_b").alias("vec_id"))
        .distinct()
    )
    return assign.join(losers, "vec_id", "left_anti").select(
        "vec_id", "label", "cell"
    )


def embed_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label L2-norm profile of the embedding column — the sanity
    check a pipeline runs before cosine math (zero vectors, scale drift
    between labels).

    Norm is a left-fold over the array after a float→double cast, so
    Spark and DuckDB fold the same doubles in the same order; min/max are
    order-free and avg differences wash out at round-4. Narrow projection
    + one tiny groupBy — linear scan at any scale.
    """
    emb = _load_vectors(spark, sf_dir)
    sq = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = F.sqrt(sq)
    return (
        emb.select("label", norm.alias("norm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg("norm"), 4).alias("avg_norm"),
            F.round(F.min("norm"), 6).alias("min_norm"),
            F.round(F.max("norm"), 6).alias("max_norm"),
        )
    )


def embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization per vector: the 4x storage/bandwidth
    compression step an ANN index build applies before sharding
    embeddings at scale.

    Per vector: scale = 127/max|x| (symmetric, zero-preserving),
    q_i = round(x_i * scale) clamped to [-127, 127]. Emitted per-vector
    audit columns are integers (dims, saturated count, checksum of the
    quantized codes) plus the exact extremes the scale derives from —
    all bit-identical across engines, so the oracle hash-checks the
    full quantization, not just row counts. Pure narrow projection:
    zero shuffles at any scale; the codes themselves would be written
    as array<tinyint> by the index builder (elided here — the audit
    columns pin down every q_i through the checksum).
    """
    emb = _load_vectors(spark, sf_dir)
    v = F.transform("embedding", lambda x: x.cast("double"))
    mx = F.array_max(F.transform(v, F.abs))
    # two projections, not one: the quantized array feeds three audit
    # columns, and Catalyst does NOT common-subexpression higher-order
    # lambdas — inlining `q` re-runs the whole quantize transform per
    # audit column (measured 3x slower). Materializing it in its own
    # projection quantizes each vector exactly once.
    quantized = emb.select(
        "vec_id",
        "label",
        F.size("embedding").alias("n_dims"),
        mx.alias("max_abs"),
        F.transform(
            v, lambda x: F.round(x * (F.lit(127.0) / F.col("max_abs"))).cast("int")
        ).alias("q"),
    )
    return quantized.select(
        "vec_id",
        "label",
        "n_dims",
        "max_abs",
        F.size(F.filter("q", lambda c: F.abs(c) == 127)).alias("n_saturated"),
        F.aggregate("q", F.lit(0), lambda acc, c: acc + c).alias("q_checksum"),
        F.aggregate("q", F.lit(0), lambda acc, c: acc + F.abs(c)).alias("q_l1"),
    )


def docs_dedup_modality_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-MODALITY near-dup agreement: the text-side verified
    MinHash pairs (exact shingle Jaccard >= threshold, the relation
    docs_minhash_dedup drops on) full-outer-joined against the
    embedding-side cosine near-dup pairs (doc_id = vec_id, the
    docs_embed_join alignment) — the audit a pipeline runs before
    trusting EITHER dedup family alone: a pair flagged by text but not
    embeddings is boilerplate-style near-dup (shared surface form,
    different gist); flagged by embeddings only is a paraphrase
    (SemDeDup's target); flagged by both is a hard duplicate. The
    intra-text-modality version of this audit is dedup.py's
    docs_dedup_method_agreement (MinHash vs SimHash).

    Reuses BOTH persisted family kernels verbatim (_verified_pairs —
    the dedup family build; the tiled-BLAS embed_neardup_pairs), so
    the audit is a join of two already-built pair relations: marginal
    cost is two broadcast-sized scans at any corpus size where the
    families themselves are maintainable.
    """
    from .dedup import _JACCARD_THRESHOLD, _verified_pairs

    docs = load(spark, sf_dir, "documents")
    tp = (
        _verified_pairs(docs)
        .filter(F.col("jaccard") >= _JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "jaccard")
    )
    ep = embed_neardup_pairs(spark, sf_dir).select(
        F.col("vec_a").alias("doc_a"),
        F.col("vec_b").alias("doc_b"),
        "cosine_sim",
    )
    return tp.join(ep, ["doc_a", "doc_b"], "full_outer").select(
        "doc_a",
        "doc_b",
        "jaccard",
        "cosine_sim",
        F.col("jaccard").isNotNull().alias("text_dup"),
        F.col("cosine_sim").isNotNull().alias("embed_dup"),
        (F.col("jaccard").isNotNull() & F.col("cosine_sim").isNotNull()).alias(
            "both_dup"
        ),
    )


def docs_embed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal join: text documents x their embedding rows
    (doc_id = vec_id), profiled per (lang, label) cell — the alignment
    check a multimodal pipeline runs before training (does every
    language get embedding coverage? do clusters straddle languages?).

    The embedding side reduces to (vec_id, label, norm) BEFORE the join
    — vectors never travel through it — and broadcasts (it is the
    smaller relation; at 100 TB both sides would be bucketed on the id
    instead). Aggregates are chosen deterministic: counts, exact int
    avg, order-free min/max; avg_norm goes through the DECIMAL
    round-trip so its representation is canonical across engines."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    emb = _load_vectors(spark, sf_dir).select(
        "vec_id",
        "label",
        _norm(F.transform("embedding", lambda x: x.cast("double"))).alias("norm"),
    )
    return (
        docs.join(F.broadcast(emb), docs.doc_id == emb.vec_id)
        .groupBy("lang", "label")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.sum("n_chars") / F.count(F.lit(1)).cast("double")).alias("avg_chars"),
            F.round(F.avg("norm"), 4).cast("decimal(38,4)").cast("double").alias("avg_norm"),
            F.round(F.min("norm"), 6).alias("min_norm"),
            F.round(F.max("norm"), 6).alias("max_norm"),
        )
    )


_PQ_M = 4  # product-quantization subspaces; _DIM/_PQ_M dims each


def _sub_dist(m: int):
    """Round-6 squared distance between subspace m of the vector column
    `v` and of the centroid column `cv` (zip_with over slices — O(sub)
    per row, no per-element re-evaluation)."""
    sub = _DIM // _PQ_M
    return F.round(
        F.aggregate(
            F.zip_with(
                F.slice("v", m * sub + 1, sub),
                F.slice("cv", m * sub + 1, sub),
                lambda x, c: (x - c) * (x - c),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )


def embed_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization: encode each vector as _PQ_M small codes,
    one per disjoint subspace — the 64-dim embedding becomes 4 codebook
    ids (here 4 bytes vs 256: the compression that makes billion-vector
    ANN indexes RAM-resident). Codebook m = the per-label means of
    subspace m (the same deterministic coarse-quantizer convention as
    embed_ivf_assign, rounded to 6 decimals on both engines); code m =
    argmin over cells of the subspace squared distance, ties to the
    smallest cell. sq_err is the total reconstruction error — the sum
    of the four per-subspace minima in fixed subspace order, exact
    across engines because each term is already round-6.

    Plan shape: one tiny (label, dim) aggregation builds the codebook,
    broadcast to the scan; the per-vector 10-candidate expansion is
    collapsed map-side by the partial min-struct aggregation, so the
    only data-sized shuffle carries ~one row per vector — a better
    shape than a row_number window (which would shuffle all candidate
    rows). At 100 TB the codes join the IVF cell id in the partitioned
    index write."""
    emb = _load_vectors(spark, sf_dir).select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    cand = emb.crossJoin(F.broadcast(_centroid_vecs(emb))).select(
        "vec_id",
        "label",
        "cell",
        *[_sub_dist(m).alias(f"d{m}") for m in range(_PQ_M)],
    )
    agg = cand.groupBy("vec_id", "label").agg(
        *[
            F.min(F.struct(f"d{m}", "cell")).alias(f"b{m}")
            for m in range(_PQ_M)
        ]
    )
    err = F.col("b0.d0") + F.col("b1.d1") + F.col("b2.d2") + F.col("b3.d3")
    return agg.select(
        "vec_id",
        "label",
        *[
            F.col(f"b{m}.cell").cast("int").alias(f"code_{m}")
            for m in range(_PQ_M)
        ],
        err.alias("sq_err"),
    )


def embed_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF + PQ asymmetric-distance ANN search (ADC) — the query path of
    a compressed billion-vector index, completing the ANN family
    (brute-force kNN / LSH / IVF-exact / IVF-PQ).

    Search never touches raw corpus vectors: the _N_PROBE best cells
    come from the k-row centroid table; candidates are scored by
    looking their 4 PQ codes up in the query's per-(cell, subspace)
    distance table (k x M values, computed once per query). Plan shape:
    index build is the embed_pq_codes/_ivf_assign one-groupBy argmin;
    probe + LUT are broadcast joins of k-row relations; the only
    data-sized work is the probed cells' index scan (partition pruning
    under the cell layout) and one top-k (TakeOrderedAndProject). Every
    distance is round-6 per subspace (sums of identical doubles in
    identical order), so the whole search is bit-identical to the
    DuckDB oracle."""
    emb = _load_vectors(spark, sf_dir).select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    cvec = _centroid_vecs(emb)
    full_d = F.round(_sq_dist("v", "cv"), 6)
    cand = emb.crossJoin(F.broadcast(cvec)).select(
        "vec_id",
        "label",
        "cell",
        full_d.alias("fd"),
        *[_sub_dist(m).alias(f"d{m}") for m in range(_PQ_M)],
    )
    index = (
        cand.groupBy("vec_id", "label")
        .agg(
            F.min(F.struct("fd", "cell")).alias("bf"),
            *[
                F.min(F.struct(f"d{m}", "cell")).alias(f"b{m}")
                for m in range(_PQ_M)
            ],
        )
        .select(
            "vec_id",
            "label",
            F.col("bf.cell").cast("int").alias("cell"),
            *[
                F.col(f"b{m}.cell").cast("int").alias(f"code_{m}")
                for m in range(_PQ_M)
            ],
        )
    )
    q = emb.filter(F.col("vec_id") == _QUERY_VEC_ID).select(
        F.col("v").alias("qv")
    )
    probed = (
        cvec.crossJoin(F.broadcast(q))
        .select(
            "cell", F.round(_cosine(F.col("cv"), F.col("qv")), 6).alias("csim")
        )
        .orderBy(F.desc("csim"), F.asc("cell"))
        .limit(_N_PROBE)
        .select(F.col("cell").cast("int").alias("cell"))
    )
    # the query's ADC lookup table: distance from the query's subspace m
    # to EVERY cell's centroid subspace m (codes may reference any cell,
    # not just probed ones)
    lut = cvec.crossJoin(F.broadcast(q.select(F.col("qv").alias("v")))).select(
        F.col("cell").cast("int").alias("cell"),
        *[_sub_dist(m).alias(f"q{m}") for m in range(_PQ_M)],
    )
    scored = index.join(F.broadcast(probed), "cell").filter(
        F.col("vec_id") != _QUERY_VEC_ID
    )
    for m in range(_PQ_M):
        lm = lut.select(
            F.col("cell").alias(f"code_{m}"), F.col(f"q{m}")
        )
        scored = scored.join(F.broadcast(lm), f"code_{m}")
    approx = sum(F.col(f"q{m}") for m in range(_PQ_M))
    return (
        scored.select(
            "vec_id", "label", "cell", approx.alias("approx_sq_dist")
        )
        .orderBy("approx_sq_dist", "vec_id")
        .limit(_TOP_K)
    )


def embed_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The embedding index build end-to-end, one logical plan: exact
    cosine near-dup removal → codebook trained on the SURVIVORS →
    per-vector IVF cell assignment + product-quantization codes. Emits
    the index shard table (vec_id, cell, codes, errors) a vector store
    partitions by cell — the embedding-modality counterpart of
    docs_pipeline_e2e.

    Each stage reuses the standalone operator's exact formula
    (embed_neardup_pairs keep-lowest policy, _centroid_vecs round-6
    means, embed_ivf_assign full-distance argmin, embed_pq_codes
    subspace argmins), so the composite is fully oracle-checkable.
    Training the codebook AFTER dedup is the methodological point:
    near-dup clusters would otherwise drag the cell means toward
    duplicated content. Plan shape: the tiled BLAS pair join (the one
    quadratic stage, LSH at 100 TB), one anti-join, one tiny (label,
    dim) aggregation broadcast back, and a single partial-agg shuffle
    for all nine argmins at once — cell + 4 codes come out of ONE
    groupBy, not five windows.
    """
    emb = _load_vectors(spark, sf_dir).select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    losers = (
        embed_neardup_pairs(spark, sf_dir)
        .select(F.col("vec_b").alias("vec_id"))
        .distinct()
    )
    kept = emb.join(losers, "vec_id", "left_anti")
    full_d = F.round(_sq_dist("v", "cv"), 6)
    cand = kept.crossJoin(F.broadcast(_centroid_vecs(kept))).select(
        "vec_id",
        "label",
        "cell",
        full_d.alias("fd"),
        *[_sub_dist(m).alias(f"d{m}") for m in range(_PQ_M)],
    )
    agg = cand.groupBy("vec_id", "label").agg(
        F.min(F.struct("fd", "cell")).alias("bf"),
        *[
            F.min(F.struct(f"d{m}", "cell")).alias(f"b{m}")
            for m in range(_PQ_M)
        ],
    )
    err = F.col("b0.d0") + F.col("b1.d1") + F.col("b2.d2") + F.col("b3.d3")
    return agg.select(
        "vec_id",
        "label",
        F.col("bf.cell").cast("int").alias("cell"),
        F.col("bf.fd").alias("sq_dist"),
        *[
            F.col(f"b{m}.cell").cast("int").alias(f"code_{m}")
            for m in range(_PQ_M)
        ],
        err.alias("sq_err"),
    )


_MRL_DIM = _DIM // 2  # truncated-prefix dims for the matryoshka audit


def embed_matryoshka_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation audit: recall@k of cosine search over the
    FIRST _MRL_DIM embedding dims against the full-dim exact top-k —
    the serving decision behind prefix-truncatable representations
    (Kusupati et al. 2022, public literature): halving stored dims
    halves index memory and doubles scan throughput IF recall holds,
    and this 1-row relation is the measurement a pipeline gates that
    rollout on.

    Same deterministic conventions as embed_recall_audit (round-6
    cosine, vec_id tiebreaks), so the overlap count is engine-exact;
    the truncated ranking reuses the embed_knn plan shape verbatim
    (broadcast 1-row query slice, narrow per-row cosine,
    TakeOrderedAndProject top-k). Cost: two corpus-linear top-k scans
    + a k-row join — the cheaper truncated scan is the one a rollout
    would keep."""
    emb = _load_vectors(spark, sf_dir)
    q = emb.filter(F.col("vec_id") == _QUERY_VEC_ID).select(
        F.slice(F.col("embedding").cast("array<double>"), 1, _MRL_DIM).alias("qv")
    )
    cand = emb.filter(F.col("vec_id") != _QUERY_VEC_ID).select(
        "vec_id",
        F.slice(F.col("embedding").cast("array<double>"), 1, _MRL_DIM).alias("v"),
    )
    trunc = (
        cand.crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(_cosine(F.col("v"), F.col("qv")), 6).alias("cos_t"),
        )
        .orderBy(F.desc("cos_t"), F.asc("vec_id"))
        .limit(_TOP_K)
        .select("vec_id")
    )
    exact = embed_knn(spark, sf_dir).select("vec_id")
    return (
        exact.join(trunc, "vec_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .select(
            F.lit(_TOP_K).alias("k"),
            F.lit(_DIM).alias("dim_full"),
            F.lit(_MRL_DIM).alias("dim_trunc"),
            "n_overlap",
            (F.col("n_overlap") / _TOP_K).alias("recall"),
        )
    )


_BQ_RERANK_K = 50  # Hamming candidate pool fed to the exact rerank


def _bq_half(v, lo_bit: int):
    """Sign-bit pack of 32 embedding dims starting at lo_bit into one
    bigint (bit i set iff component > 0). Two 32-bit halves instead of
    one 64-bit word: bit 63 of an int64 is the sign bit, and 1<<63
    overflow semantics differ between engines — halves keep every
    packed value positive and the oracle exact. pow(2, i) is an exact
    double for i <= 31."""
    return (
        F.aggregate(
            F.sequence(F.lit(0), F.lit(31)),
            F.lit(0.0),
            lambda acc, i: acc
            + F.when(
                F.element_at(v, i + F.lit(lo_bit + 1)) > 0.0, F.pow(2.0, i)
            ).otherwise(F.lit(0.0)),
        )
    ).cast("bigint")


def embed_bq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantized retrieval: 64-dim vectors compress 32x into two
    sign-bit-packed bigints; candidates come from a Hamming-distance
    scan over the codes (bit_count(xor) — pure integer codegen), then
    the top-_BQ_RERANK_K pool is reranked by EXACT cosine — the
    compress-then-rerank serving stack modern vector databases run
    (binary quantization, public literature) and the cheapest ANN
    variant in this family: the corpus scan touches 16 bytes per
    vector instead of 256.

    Determinism: the packed code is an exact integer function of the
    stored signs; Hamming is integer; pool and final top-k both break
    ties on vec_id; the rerank cosine reuses the _cosine kernel with
    the round-6 convention (same as embed_knn).

    Scale: one narrow pack projection (code columns persist with the
    index at 100 TB — recomputing here keeps the query self-contained),
    a broadcast 1-row query, TakeOrderedAndProject for the Hamming
    top-K pool, and an O(K) exact rerank. Same plan family as
    embed_knn but with the full-width arithmetic confined to K rows.
    """
    emb = _load_vectors(spark, sf_dir)
    v = F.col("embedding").cast("array<double>")
    codes = emb.select(
        "vec_id",
        v.alias("v"),
        _bq_half(v, 0).alias("code_lo"),
        _bq_half(v, 32).alias("code_hi"),
    )
    q = codes.filter(F.col("vec_id") == _QUERY_VEC_ID).select(
        F.col("v").alias("qv"),
        F.col("code_lo").alias("q_lo"),
        F.col("code_hi").alias("q_hi"),
    )
    hamming = (
        F.bit_count(F.col("code_lo").bitwiseXOR(F.col("q_lo")))
        + F.bit_count(F.col("code_hi").bitwiseXOR(F.col("q_hi")))
    ).cast("int")
    pool = (
        codes.filter(F.col("vec_id") != _QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select("vec_id", "v", "qv", hamming.alias("hamming"))
        .orderBy(F.asc("hamming"), F.asc("vec_id"))
        .limit(_BQ_RERANK_K)
    )
    return (
        pool.select(
            "vec_id",
            "hamming",
            F.round(_cosine(F.col("v"), F.col("qv")), 6).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), F.asc("vec_id"))
        .limit(_TOP_K)
        # session-persisted (r14): embed_ndcg_audit re-runs this leg —
        # k rows, one quantized scan per session (see embed_knn's note)
        .persist()
    )


def _dcg_1row(topk: DataFrame) -> DataFrame:
    """1-row DCG of a (vec_id, cosine_sim) top-k relation, ranked by
    (cosine_sim DESC, vec_id ASC) — graded relevance IS the reported
    exact cosine (every audited method reranks/reports exact cosines).
    The ≤k-term sum is rounded through the decimal hop: log2 may differ
    by an ulp between engines and aggregation order is free."""
    w = Window.orderBy(F.desc("cosine_sim"), F.asc("vec_id"))
    ranked = topk.select(
        "cosine_sim", F.row_number().over(w).alias("r")
    )
    return ranked.agg(
        F.round(F.sum(F.col("cosine_sim") / F.log2(F.col("r") + 1)), 6)
        .cast("decimal(38,6)")
        .cast("double")
        .alias("dcg")
    )


def embed_ndcg_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-quality audit of every ANN serving path against the
    exact ranking: NDCG@k (Järvelin & Kekäläinen 2002, public
    literature) for the LSH, IVF, and binary-quantization searches,
    with graded relevance = the exact cosine each method reports —
    recall (embed_recall_audit) counts WHICH true neighbors survive;
    NDCG also scores WHERE they land, which is what a serving rollout
    actually gates on.

    Determinism: each method's top-k is already engine-exact
    (oracle-checked queries, reused verbatim); ranks re-derive from
    (cosine_sim DESC, vec_id) identically in both engines; DCG sums
    round through the decimal hop and the final ndcg is one exact
    division of two rounded doubles. Scale: each leg's own audited
    plan does the corpus work; the audit itself folds k rows per
    method — O(1) regardless of corpus size.
    """
    idcg = _dcg_1row(
        embed_knn(spark, sf_dir).select("vec_id", "cosine_sim")
    ).select(F.col("dcg").alias("idcg"))
    methods = (
        ("lsh", embed_ann_lsh),
        ("ivf", embed_ann_ivf),
        ("bq", embed_bq_search),
    )
    out: DataFrame | None = None
    for name, fn in methods:
        row = (
            _dcg_1row(fn(spark, sf_dir).select("vec_id", "cosine_sim"))
            .crossJoin(F.broadcast(idcg))
            .select(
                F.lit(name).alias("method"),
                F.lit(_TOP_K).alias("k"),
                "dcg",
                "idcg",
                (F.col("dcg") / F.col("idcg")).alias("ndcg"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


_RRF_K = 60  # reciprocal-rank-fusion damping constant (Cormack et al. 2009)


def docs_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 lexical top-k fused with exact cosine
    top-k by reciprocal-rank fusion — the two-leg search the reference's
    similarity mandate implies (BASELINE lexical + vector legs), joined
    the way production retrieval stacks combine them:
    rrf(d) = Σ_legs 1 / (K + rank_leg(d)), K = 60 (Cormack, Clarke &
    Buettcher 2009, public literature). A document missing from a leg
    contributes 0 for that leg.

    Reuses both production kernels verbatim — text.bm25_search (the
    streaming postings index shares it) and embed_knn — so the fused
    ranking can never drift from the per-leg queries. doc_id = vec_id
    is the cross-modal key (same convention as docs_embed_join).

    Determinism: each leg's rank is an int from its already-pinned
    deterministic order (score DESC, id ASC); 1/(K+rank) and the 2-term
    sum are exact IEEE double ops on integer-derived values, so
    rrf_score needs NO rounding to be engine-identical. Ties between a
    lex-only and a sem-only doc at the same rank are real (equal rrf)
    and break on doc_id.

    Scale: both legs are already top-k relations (k = 20 and 10), so
    the fusion is a full-outer join of two k-row relations — free at
    any corpus size; the corpus-sized work is each leg's own
    (independently audited) retrieval plan. At 100 TB the legs run as
    one corpus scan each (BM25: query-term-filtered explode; kNN:
    broadcast query vector, TakeOrderedAndProject) and the fusion cost
    stays O(k). The fusion itself is the standalone rrf_fuse kernel, so
    a serving path fusing the STREAMING postings index's search with
    the same kNN leg produces bit-identical output
    (tests/test_streaming.py pins it)."""
    from .text import docs_bm25_search

    # the lexical leg goes through docs_bm25_search itself (r14) so
    # both queries register/read the SAME session-persisted top-k
    # regardless of which runs first
    return rrf_fuse(docs_bm25_search(spark, sf_dir), embed_knn(spark, sf_dir))


def rrf_fuse(lex: DataFrame, sem: DataFrame) -> DataFrame:
    """RRF fusion kernel over a (doc_id, bm25_score, ...) lexical top-k
    and a (vec_id, cosine_sim, ...) semantic top-k — shared by the
    batch docs_hybrid_search and the streaming-index serving path (one
    formula, zero drift)."""
    wl = Window.orderBy(F.desc("bm25_score"), F.asc("doc_id"))
    lex = lex.select(
        "doc_id",
        "bm25_score",
        F.row_number().over(wl).cast("int").alias("lex_rank"),
    )
    ws = Window.orderBy(F.desc("cosine_sim"), F.asc("vec_id"))
    sem = sem.select(
        "vec_id",
        "cosine_sim",
        F.row_number().over(ws).cast("int").alias("sem_rank"),
    )
    rrf = F.coalesce(
        F.lit(1.0) / (F.lit(float(_RRF_K)) + F.col("lex_rank")), F.lit(0.0)
    ) + F.coalesce(
        F.lit(1.0) / (F.lit(float(_RRF_K)) + F.col("sem_rank")), F.lit(0.0)
    )
    return (
        lex.join(sem, lex.doc_id == sem.vec_id, "full")
        .select(
            F.coalesce("doc_id", "vec_id").alias("doc_id"),
            "lex_rank",
            "bm25_score",
            "sem_rank",
            "cosine_sim",
            rrf.alias("rrf_score"),
        )
        .orderBy(F.desc("rrf_score"), F.asc("doc_id"))
    )


QUERIES = {
    "embed_quantize": embed_quantize,
    "embed_pq_codes": embed_pq_codes,
    "embed_pipeline_e2e": embed_pipeline_e2e,
    "embed_knn": embed_knn,
    "embed_centroids": embed_centroids,
    "embed_neardup_pairs": embed_neardup_pairs,
    "embed_neardup_dedup": embed_neardup_dedup,
    "embed_semdedup": embed_semdedup,
    "embed_ann_lsh": embed_ann_lsh,
    "embed_ann_ivf": embed_ann_ivf,
    "embed_ann_ivfpq": embed_ann_ivfpq,
    "embed_ivf_assign": embed_ivf_assign,
    "embed_cell_balance_audit": embed_cell_balance_audit,
    "embed_kmeans": embed_kmeans,
    "embed_prototypicality": embed_prototypicality,
    "embed_cluster_purity": embed_cluster_purity,
    "embed_intrinsic_dim": embed_intrinsic_dim,
    "embed_intrinsic_dim_ann": embed_intrinsic_dim_ann,
    "embed_silhouette": embed_silhouette,
    "embed_pca_power": embed_pca_power,
    "embed_kcenter_coreset": embed_kcenter_coreset,
    "embed_mmr_rerank": embed_mmr_rerank,
    "embed_recall_audit": embed_recall_audit,
    "embed_ivf_tuning": embed_ivf_tuning,
    "embed_norm_stats": embed_norm_stats,
    "docs_embed_join": docs_embed_join,
    "docs_dedup_modality_agreement": docs_dedup_modality_agreement,
    "docs_hybrid_search": docs_hybrid_search,
    "embed_bq_search": embed_bq_search,
    "embed_ndcg_audit": embed_ndcg_audit,
    "embed_matryoshka_audit": embed_matryoshka_audit,
}

_COS_SQL = "list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])"


def _lsh_bucket_sql(tbl_alias: str, table: int) -> str:
    """SQL mirror of one LSH table's bucket signature: bit p =
    sign(v . plane_p) with the SAME deterministic md5 +/-1 hyperplanes
    the operator uses (_plane_coeffs), rendered as literal DOUBLE
    lists. With fixed seeded planes the bucketing is plain relational
    algebra, so embed_ann_lsh gets a full value oracle instead of a
    rows-only check (r4 verdict ask #8). Sign flips from summation
    order are the only cross-engine hazard; tests pin the expression
    fold == BLAS-batch signatures on the test corpora, and no vector
    sits near the decision boundary there."""
    planes = _plane_coeffs(table)
    bits = []
    for p in range(_N_PLANES):
        lst = ",".join("1.0" if c > 0 else "-1.0" for c in planes[p])
        bits.append(
            f"CASE WHEN list_dot_product({tbl_alias}.embedding::DOUBLE[], "
            f"[{lst}]) >= 0 THEN '1' ELSE '0' END"
        )
    return f"'{table}:' || " + " || ".join(bits)


_LSH_CAND_SQL = " OR ".join(
    f"({_lsh_bucket_sql('c', t)}) = ({_lsh_bucket_sql('q', t)})"
    for t in range(_N_TABLES)
)

_PQ_SUB = _DIM // _PQ_M
_PQ_DIST_SQL = ",\n".join(
    f"""round(list_sum(list_transform(range(1, {_PQ_SUB + 1}),
        i -> (e.embedding[i + {m * _PQ_SUB}]::DOUBLE - c.cv[i + {m * _PQ_SUB}])
           * (e.embedding[i + {m * _PQ_SUB}]::DOUBLE - c.cv[i + {m * _PQ_SUB}]))), 6)
        AS d{m}"""
    for m in range(_PQ_M)
)
_PQ_CODE_SQL = ",\n".join(
    f"CAST((min(struct_pack(d{m}:=d{m}, cell:=cell))).cell AS INTEGER) AS code_{m}"
    for m in range(_PQ_M)
)
_PQ_ERR_SQL = " + ".join(
    f"(min(struct_pack(d{m}:=d{m}, cell:=cell))).d{m}" for m in range(_PQ_M)
)
# the query-side ADC lookup columns: the same per-subspace round-6
# distance, but from the QUERY vector (q.qv) to each centroid
_PQ_QDIST_SQL = ",\n".join(
    f"""round(list_sum(list_transform(range(1, {_PQ_SUB + 1}),
        i -> (q.qv[i + {m * _PQ_SUB}] - c.cv[i + {m * _PQ_SUB}])
           * (q.qv[i + {m * _PQ_SUB}] - c.cv[i + {m * _PQ_SUB}]))), 6)
        AS q{m}"""
    for m in range(_PQ_M)
)


def _cent_cte_sql(src: str) -> str:
    """Round-6 per-label centroid CTE body — the SQL mirror of
    _centroid_vecs, shared by every oracle that derives cells
    (embed_pq_codes / embed_pipeline_e2e / embed_ivf_assign /
    embed_semdedup) so a rounding or dim-indexing fix cannot be applied
    to one copy and silently break parity for the rest. Parameterized
    on the source relation: pipeline_e2e trains on the dedup survivors."""
    return f"""
            SELECT label AS cell, list(cx ORDER BY dim) AS cv
            FROM (
                SELECT label, dim, round(avg(x), 6) AS cx
                FROM (
                    SELECT label,
                           unnest(embedding::DOUBLE[]) AS x,
                           unnest(range(1, len(embedding) + 1)) AS dim
                    FROM {src}
                )
                GROUP BY label, dim
            )
            GROUP BY label
    """


# round-6 full squared distance between e.embedding and c.cv — the SQL
# mirror of _sq_dist, shared for the same no-drift reason.
_SQDIST_SQL = """round(list_sum(list_transform(
                       range(1, len(e.embedding) + 1),
                       i -> (e.embedding[i]::DOUBLE - c.cv[i])
                            * (e.embedding[i]::DOUBLE - c.cv[i]))), 6)"""

# same round-6 distance over a pre-cast DOUBLE[] column e.v (the
# embed_kmeans CTEs cast once up front, matching the Spark side's
# single cast of `embedding` to array<double>)
_KM_DIST_SQL = """round(list_sum(list_transform(
                       range(1, len(e.v) + 1),
                       i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))), 6)"""

def _mmr_iteration_ctes(k: int) -> str:
    """One MMR step as a CTE pair: argmax of λ·simq − (1−λ)·maxsim over
    the remaining pool, then the greatest() fold of redundancy against
    that pick — the SQL mirror of one embed_mmr_rerank loop pass."""
    lam, mu = _MMR_LAMBDA, 1.0 - _MMR_LAMBDA
    return f"""
        m{k} AS (
            SELECT vec_id, label, v, simq, maxsim AS msel,
                   CAST({lam} AS DOUBLE) * simq
                       - CAST({mu!r} AS DOUBLE) * maxsim AS mmr
            FROM d{k - 1}
            ORDER BY mmr DESC, vec_id ASC LIMIT 1
        ),
        d{k} AS (
            SELECT d.vec_id, d.label, d.v, d.simq,
                   greatest(d.maxsim,
                            round(list_cosine_similarity(d.v, m.v), 6))
                       AS maxsim
            FROM d{k - 1} d, m{k} m WHERE d.vec_id <> m.vec_id
        )"""


_MMR_SQL = (
    f"""
        WITH e AS (
            SELECT vec_id, label, embedding::DOUBLE[] AS v FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL)
        ),
        q AS (SELECT v AS qv FROM e WHERE vec_id = {_QUERY_VEC_ID}),
        pool AS (
            SELECT vec_id, label, v,
                   round(list_cosine_similarity(v, q.qv), 6) AS simq
            FROM e, q WHERE vec_id <> {_QUERY_VEC_ID}
            ORDER BY simq DESC, vec_id ASC LIMIT {_MMR_POOL}
        ),
        m1 AS (
            SELECT vec_id, label, v, simq,
                   CAST(NULL AS DOUBLE) AS msel,
                   CAST({_MMR_LAMBDA} AS DOUBLE) * simq AS mmr
            FROM pool ORDER BY simq DESC, vec_id ASC LIMIT 1
        ),
        d1 AS (
            SELECT p.vec_id, p.label, p.v, p.simq,
                   round(list_cosine_similarity(p.v, m.v), 6) AS maxsim
            FROM pool p, m1 m WHERE p.vec_id <> m.vec_id
        ),"""
    + ",".join(_mmr_iteration_ctes(k) for k in range(2, _MMR_K + 1))
    + "\n        "
    + "\n        UNION ALL ".join(
        f"SELECT CAST({k} AS INT) AS rank, vec_id, label, simq,"
        f" msel AS max_sim_selected, mmr AS mmr_score FROM m{k}"
        for k in range(1, _MMR_K + 1)
    )
)

# round-6 distance between two pre-cast DOUBLE[] columns d.v and c.v —
# the k-center oracle's mirror of _sq_dist (same no-drift convention as
# _KM_DIST_SQL, different aliases).
_KC_DIST_SQL = """round(list_sum(list_transform(
                       range(1, len(d.v) + 1),
                       i -> (d.v[i] - c.v[i]) * (d.v[i] - c.v[i]))), 6)"""


def _kc_iteration_ctes(k: int) -> str:
    """One greedy k-center step as a CTE pair: the argmax pick over the
    running min-distance relation, then the least() fold of distances
    against that pick — the SQL mirror of one embed_kcenter_coreset
    loop iteration."""
    return f"""
        c{k} AS (
            SELECT vec_id, v, mind AS sel FROM d{k - 1}
            ORDER BY mind DESC, vec_id ASC LIMIT 1
        ),
        d{k} AS (
            SELECT d.vec_id, d.v, least(d.mind, {_KC_DIST_SQL}) AS mind
            FROM d{k - 1} d, c{k} c
        )"""


_KC_SQL = (
    """
        WITH e AS (
            SELECT vec_id, embedding::DOUBLE[] AS v FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL)
        ),
        c1 AS (
            SELECT vec_id, v, CAST(NULL AS DOUBLE) AS sel
            FROM e ORDER BY vec_id ASC LIMIT 1
        ),
        d1 AS (
            SELECT d.vec_id, d.v, """
    + _KC_DIST_SQL
    + """ AS mind
            FROM e d, c1 c
        ),"""
    + ",".join(_kc_iteration_ctes(k) for k in range(2, _KC_K + 1))
    + "\n        "
    + "\n        UNION ALL ".join(
        f"SELECT CAST({k} AS INT) AS rank, vec_id, sel AS sel_dist FROM c{k}"
        for k in range(1, _KC_K + 1)
    )
)

ORACLE_SQL = {
    "embed_kcenter_coreset": _KC_SQL,
    "embed_mmr_rerank": _MMR_SQL,
    "docs_embed_join": """
        SELECT lang, label, count(*) AS n_docs,
               sum(n_chars) / CAST(count(*) AS DOUBLE) AS avg_chars,
               CAST(CAST(round(avg(norm), 4) AS DECIMAL(38,4)) AS DOUBLE) AS avg_norm,
               round(min(norm), 6) AS min_norm,
               round(max(norm), 6) AS max_norm
        FROM (
            SELECT d.lang, e.label, d.n_chars,
                   sqrt(list_sum(list_transform(e.embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS norm
            FROM documents d JOIN (SELECT * FROM embeddings WHERE embedding IS NOT NULL) e ON d.doc_id = e.vec_id
        )
        GROUP BY lang, label
    """,
    "embed_quantize": """
        SELECT vec_id, label,
               CAST(len(embedding) AS INT) AS n_dims,
               max_abs,
               CAST(len(list_filter(q, c -> abs(c) = 127)) AS INT)
                   AS n_saturated,
               CAST(list_sum(q) AS INT) AS q_checksum,
               CAST(list_sum(list_transform(q, c -> abs(c))) AS INT) AS q_l1
        FROM (
            SELECT vec_id, label, embedding, max_abs,
                   list_transform(embedding,
                       x -> CAST(round(CAST(x AS DOUBLE) * (127.0 / max_abs))
                                 AS INT)) AS q
            FROM (
                SELECT vec_id, label, embedding,
                       list_max(list_transform(embedding,
                           x -> abs(CAST(x AS DOUBLE)))) AS max_abs
                FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL)
            )
        )
    """,
    "embed_norm_stats": """
        SELECT label, count(*) AS n_vecs,
               round(avg(norm), 4) AS avg_norm,
               round(min(norm), 6) AS min_norm,
               round(max(norm), 6) AS max_norm
        FROM (
            SELECT label,
                   sqrt(list_sum(list_transform(embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS norm
            FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL)
        )
        GROUP BY label
    """,
    "embed_knn": f"""
        SELECT a.vec_id, a.label,
               round(list_cosine_similarity(
                   a.embedding::DOUBLE[],
                   (SELECT embedding::DOUBLE[] FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL) WHERE vec_id = {_QUERY_VEC_ID})
               ), 6) AS cosine_sim
        FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL) a
        WHERE a.vec_id <> {_QUERY_VEC_ID}
        ORDER BY cosine_sim DESC, a.vec_id ASC
        LIMIT {_TOP_K}
    """,
    "embed_ann_lsh": f"""
        WITH q AS (
            SELECT embedding FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL) WHERE vec_id = {_QUERY_VEC_ID}
        ),
        cand AS (
            SELECT DISTINCT c.vec_id
            FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL) c, q
            WHERE c.vec_id <> {_QUERY_VEC_ID} AND ({_LSH_CAND_SQL})
        )
        SELECT a.vec_id, a.label,
               round(list_cosine_similarity(
                   a.embedding::DOUBLE[],
                   (SELECT embedding::DOUBLE[] FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL)
                    WHERE vec_id = {_QUERY_VEC_ID})
               ), 6) AS cosine_sim
        FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL) a JOIN cand USING (vec_id)
        ORDER BY cosine_sim DESC, a.vec_id ASC
        LIMIT {_TOP_K}
    """,
    "embed_centroids": """
        SELECT label, CAST(i - 1 AS INT) AS dim, round(avg(component), 6) AS centroid_val
        FROM (
            SELECT label,
                   unnest(embedding::DOUBLE[]) AS component,
                   unnest(range(1, len(embedding) + 1)) AS i
            FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL)
        )
        GROUP BY label, i
    """,
    "embed_ann_ivf": f"""
        WITH cent AS (
{_cent_cte_sql("embeddings")}
        ),
        q AS (
            SELECT embedding::DOUBLE[] AS qv FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL)
            WHERE vec_id = {_QUERY_VEC_ID}
        ),
        best AS (
            SELECT cell AS label FROM cent, q
            ORDER BY list_cosine_similarity(cv, qv) DESC, cell ASC
            LIMIT {_N_PROBE}
        )
        SELECT e.vec_id, e.label,
               round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) AS cosine_sim
        FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL) e, q, best b
        WHERE e.label = b.label AND e.vec_id <> {_QUERY_VEC_ID}
        ORDER BY cosine_sim DESC, e.vec_id ASC
        LIMIT {_TOP_K}
    """,
    "embed_pq_codes": f"""
        WITH cent AS (
{_cent_cte_sql("embeddings")}
        ),
        dist AS (
            SELECT e.vec_id, e.label, c.cell,
                   {_PQ_DIST_SQL}
            FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL) e CROSS JOIN cent c
        )
        SELECT vec_id, label,
               {_PQ_CODE_SQL},
               {_PQ_ERR_SQL} AS sq_err
        FROM dist
        GROUP BY vec_id, label
    """,
    "embed_ann_ivfpq": f"""
        WITH cent AS (
{_cent_cte_sql("embeddings")}
        ),
        q AS (
            SELECT embedding::DOUBLE[] AS qv FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL)
            WHERE vec_id = {_QUERY_VEC_ID}
        ),
        dist AS (
            SELECT e.vec_id, e.label, c.cell,
                   {_SQDIST_SQL} AS fd,
                   {_PQ_DIST_SQL}
            FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL) e CROSS JOIN cent c
        ),
        idx AS (
            SELECT vec_id, label,
                   CAST((min(struct_pack(fd:=fd, cell:=cell))).cell
                        AS INTEGER) AS cell,
                   {_PQ_CODE_SQL}
            FROM dist
            GROUP BY vec_id, label
        ),
        probed AS (
            SELECT CAST(c.cell AS INTEGER) AS cell
            FROM cent c, q
            ORDER BY round(list_cosine_similarity(c.cv, q.qv), 6) DESC,
                     c.cell ASC
            LIMIT {_N_PROBE}
        ),
        lut AS (
            SELECT CAST(c.cell AS INTEGER) AS cell,
                   {_PQ_QDIST_SQL}
            FROM cent c, q
        )
        SELECT i.vec_id, i.label, i.cell,
               l0.q0 + l1.q1 + l2.q2 + l3.q3 AS approx_sq_dist
        FROM idx i
        JOIN probed p ON i.cell = p.cell
        JOIN lut l0 ON l0.cell = i.code_0
        JOIN lut l1 ON l1.cell = i.code_1
        JOIN lut l2 ON l2.cell = i.code_2
        JOIN lut l3 ON l3.cell = i.code_3
        WHERE i.vec_id <> {_QUERY_VEC_ID}
        ORDER BY approx_sq_dist, i.vec_id
        LIMIT {_TOP_K}
    """,
    "embed_pipeline_e2e": f"""
        WITH kept AS (
            SELECT e.vec_id, e.label, e.embedding
            FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL) e
            WHERE NOT EXISTS (
                SELECT 1
                FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL) a JOIN (SELECT * FROM embeddings WHERE embedding IS NOT NULL) b ON a.vec_id < b.vec_id
                WHERE round({_COS_SQL}, 6) >= {_NEARDUP_THRESHOLD}
                  AND b.vec_id = e.vec_id
            )
        ),
        cent AS (
{_cent_cte_sql("kept")}
        ),
        dist AS (
            SELECT e.vec_id, e.label, c.cell,
                   {_SQDIST_SQL}
                       AS fd,
                   {_PQ_DIST_SQL}
            FROM kept e CROSS JOIN cent c
        )
        SELECT vec_id, label,
               CAST((min(struct_pack(fd:=fd, cell:=cell))).cell AS INTEGER)
                   AS cell,
               (min(struct_pack(fd:=fd, cell:=cell))).fd AS sq_dist,
               {_PQ_CODE_SQL},
               {_PQ_ERR_SQL} AS sq_err
        FROM dist
        GROUP BY vec_id, label
    """,
    "embed_kmeans": f"""
        WITH emb2 AS (
            SELECT vec_id, label, embedding::DOUBLE[] AS v FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL)
        ),
        c0 AS (
            SELECT vec_id AS cell, v AS cv FROM emb2 ORDER BY vec_id LIMIT {_KM_K}
        ),
        d1 AS (
            SELECT e.vec_id, e.label, c.cell, {_KM_DIST_SQL} AS sq_dist
            FROM emb2 e CROSS JOIN c0 c
        ),
        a1 AS (
            SELECT vec_id,
                   (min(struct_pack(sq_dist:=sq_dist, cell:=cell))).cell AS cell
            FROM d1 GROUP BY vec_id
        ),
        c1 AS (
            SELECT cell, list(cx ORDER BY dim) AS cv
            FROM (
                SELECT a.cell, t.dim, round(avg(t.x), 6) AS cx
                FROM (
                    SELECT vec_id, unnest(v) AS x,
                           unnest(range(1, len(v) + 1)) AS dim
                    FROM emb2
                ) t JOIN a1 a ON a.vec_id = t.vec_id
                GROUP BY a.cell, t.dim
            ) GROUP BY cell
        ),
        d2 AS (
            SELECT e.vec_id, e.label, c.cell, {_KM_DIST_SQL} AS sq_dist
            FROM emb2 e CROSS JOIN c1 c
        )
        SELECT vec_id, label,
               (min(struct_pack(sq_dist:=sq_dist, cell:=cell))).cell AS cell,
               (min(struct_pack(sq_dist:=sq_dist, cell:=cell))).sq_dist AS sq_dist
        FROM d2 GROUP BY vec_id, label
    """,
    "embed_pca_power": f"""
        WITH emb2 AS (
            SELECT vec_id, embedding::DOUBLE[] AS v FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL)
        ),
        m AS (
            SELECT list(mx ORDER BY dim) AS mv FROM (
                SELECT dim, round(avg(x), 6) AS mx FROM (
                    SELECT unnest(v) AS x,
                           unnest(range(1, len(v) + 1)) AS dim
                    FROM emb2
                ) GROUP BY dim
            )
        ),
        c AS (
            SELECT vec_id,
                   list_transform(range(1, len(v) + 1), i -> v[i] - mv[i])
                       AS vc
            FROM emb2 CROSS JOIN m
        ),
        w0 AS (
            SELECT list_transform(range(1, len(v) + 1),
                                  i -> 1.0 / sqrt(CAST(len(v) AS DOUBLE)))
                       AS wv
            FROM emb2 ORDER BY vec_id LIMIT 1
        ),
        {",".join(f'''
        y{k} AS (
            SELECT vec_id, vc,
                   round(list_sum(list_transform(
                       range(1, len(vc) + 1), i -> vc[i] * wv[i])), 6) AS y
            FROM c CROSS JOIN w{k - 1}
        ),
        u{k} AS (
            SELECT dim, round(sum(xc * y), 6) AS uv FROM (
                SELECT unnest(vc) AS xc,
                       unnest(range(1, len(vc) + 1)) AS dim, y
                FROM y{k}
            ) GROUP BY dim
        ),
        n{k} AS (SELECT sqrt(sum(uv * uv)) AS nrm FROM u{k}),
        w{k} AS (
            SELECT list(wx ORDER BY dim) AS wv FROM (
                SELECT dim, round(uv / nullif(nrm, 0), 6) AS wx
                FROM u{k} CROSS JOIN n{k}
            )
        )''' for k in range(1, _PCA_ITERS + 1))},
        cnt AS (SELECT count(*) AS n FROM emb2)
        SELECT CAST(t.dim - 1 AS INT) AS dim, t.wx AS loading,
               CAST(CAST(round(
                   n{_PCA_ITERS}.nrm / nullif(CAST(cnt.n - 1 AS DOUBLE), 0),
               6) AS DECIMAL(38,6)) AS DOUBLE) AS eigenvalue
        FROM (
            SELECT unnest(wv) AS wx,
                   unnest(range(1, len(wv) + 1)) AS dim
            FROM w{_PCA_ITERS}
        ) t CROSS JOIN n{_PCA_ITERS} CROSS JOIN cnt
    """,
    "embed_silhouette": f"""
        WITH emb2 AS (
            SELECT vec_id, label, embedding::DOUBLE[] AS v FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL)
        ),
        c0 AS (
            SELECT vec_id AS cell, v AS cv FROM emb2 ORDER BY vec_id LIMIT {_KM_K}
        ),
        d1 AS (
            SELECT e.vec_id, e.label, c.cell, {_KM_DIST_SQL} AS sq_dist
            FROM emb2 e CROSS JOIN c0 c
        ),
        a1 AS (
            SELECT vec_id,
                   (min(struct_pack(sq_dist:=sq_dist, cell:=cell))).cell AS cell
            FROM d1 GROUP BY vec_id
        ),
        c1 AS (
            SELECT cell, list(cx ORDER BY dim) AS cv
            FROM (
                SELECT a.cell, t.dim, round(avg(t.x), 6) AS cx
                FROM (
                    SELECT vec_id, unnest(v) AS x,
                           unnest(range(1, len(v) + 1)) AS dim
                    FROM emb2
                ) t JOIN a1 a ON a.vec_id = t.vec_id
                GROUP BY a.cell, t.dim
            ) GROUP BY cell
        ),
        d2 AS (
            SELECT e.vec_id, e.label, c.cell, {_KM_DIST_SQL} AS sq_dist
            FROM emb2 e CROSS JOIN c1 c
        ),
        a2 AS (
            SELECT vec_id,
                   (min(struct_pack(sq_dist:=sq_dist, cell:=cell))).cell AS cell,
                   (min(struct_pack(sq_dist:=sq_dist, cell:=cell))).sq_dist
                       AS sq_dist
            FROM d2 GROUP BY vec_id
        ),
        oth AS (
            SELECT d.vec_id, min(d.sq_dist) AS b2
            FROM d2 d JOIN a2 ON a2.vec_id = d.vec_id AND d.cell <> a2.cell
            GROUP BY d.vec_id
        )
        SELECT a2.cell,
               CAST(count(*) AS BIGINT) AS n_vecs,
               CAST(CAST(round(avg(
                   CASE WHEN oth.b2 IS NULL THEN NULL
                        WHEN greatest(sqrt(a2.sq_dist), sqrt(oth.b2)) = 0
                        THEN 0.0
                        ELSE (sqrt(oth.b2) - sqrt(a2.sq_dist))
                             / greatest(sqrt(a2.sq_dist), sqrt(oth.b2))
                   END), 6) AS DECIMAL(38,6)) AS DOUBLE) AS avg_silhouette
        FROM a2 LEFT JOIN oth ON oth.vec_id = a2.vec_id
        GROUP BY a2.cell
    """,
    "embed_cell_balance_audit": f"""
        WITH cent AS (
{_cent_cte_sql("embeddings")}
        ),
        dist AS (
            SELECT e.vec_id, c.cell,
                   {_SQDIST_SQL}
                       AS sq_dist
            FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL) e CROSS JOIN cent c
        ),
        assigned AS (
            SELECT vec_id, cell
            FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY vec_id ORDER BY sq_dist, cell) AS rn
                FROM dist
            )
            WHERE rn = 1
        ),
        kc AS (SELECT cell, count(*) AS n_vecs FROM assigned GROUP BY cell),
        g AS (
            SELECT count(*) AS n_cells, CAST(sum(n_vecs) AS BIGINT) AS total
            FROM kc
        )
        SELECT cell,
               CAST(n_vecs AS BIGINT) AS n_vecs,
               CAST(n_cells AS BIGINT) AS n_cells,
               n_vecs / CAST(total AS DOUBLE) AS vec_share,
               CAST(n_vecs AS DOUBLE) * CAST(n_cells AS DOUBLE)
                   / CAST(total AS DOUBLE) AS balance_ratio
        FROM kc CROSS JOIN g
    """,
    "embed_ivf_assign": f"""
        WITH cent AS (
{_cent_cte_sql("embeddings")}
        ),
        dist AS (
            SELECT e.vec_id, e.label, c.cell,
                   {_SQDIST_SQL}
                       AS sq_dist
            FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL) e CROSS JOIN cent c
        )
        SELECT vec_id, label, cell, sq_dist
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY vec_id ORDER BY sq_dist, cell) AS rn
            FROM dist
        )
        WHERE rn = 1
    """,
    "embed_neardup_pairs": f"""
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               round({_COS_SQL}, 6) AS cosine_sim
        FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL) a JOIN (SELECT * FROM embeddings WHERE embedding IS NOT NULL) b ON a.vec_id < b.vec_id
        WHERE round({_COS_SQL}, 6) >= {_NEARDUP_THRESHOLD}
    """,
    "embed_neardup_dedup": f"""
        SELECT e.vec_id, e.label
        FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL) e
        WHERE NOT EXISTS (
            SELECT 1 FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL) a JOIN (SELECT * FROM embeddings WHERE embedding IS NOT NULL) b ON a.vec_id < b.vec_id
            WHERE round({_COS_SQL}, 6) >= {_NEARDUP_THRESHOLD}
              AND b.vec_id = e.vec_id
        )
    """,
    "embed_semdedup": f"""
        WITH cent AS (
{_cent_cte_sql("embeddings")}
        ),
        dist AS (
            SELECT e.vec_id, e.label, c.cell,
                   {_SQDIST_SQL}
                       AS sq_dist
            FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL) e CROSS JOIN cent c
        ),
        assign AS (
            SELECT vec_id, label,
                   CAST((min(struct_pack(sq_dist:=sq_dist, cell:=cell))).cell
                        AS INTEGER) AS cell
            FROM dist
            GROUP BY vec_id, label
        ),
        losers AS (
            -- cosine as EXPLICIT left folds (dot and norms via
            -- list_sum, divided) so the doubles match Spark's
            -- zip_with/aggregate fold bit-for-bit pre-rounding
            SELECT DISTINCT b.vec_id AS vec_id
            FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL) a JOIN (SELECT * FROM embeddings WHERE embedding IS NOT NULL) b ON a.vec_id < b.vec_id
            JOIN assign sa ON sa.vec_id = a.vec_id
            JOIN assign sb ON sb.vec_id = b.vec_id AND sb.cell = sa.cell
            WHERE round(
                list_sum(list_transform(range(1, len(a.embedding) + 1),
                    i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
                / (sqrt(list_sum(list_transform(a.embedding,
                       x -> x::DOUBLE * x::DOUBLE)))
                   * sqrt(list_sum(list_transform(b.embedding,
                       x -> x::DOUBLE * x::DOUBLE)))), 6)
                >= {_NEARDUP_THRESHOLD}
        )
        SELECT s.vec_id, s.label, s.cell
        FROM assign s
        WHERE NOT EXISTS (SELECT 1 FROM losers l WHERE l.vec_id = s.vec_id)
    """,
}

# recall@k audit: wraps the exact-kNN and IVF-probe oracles verbatim as
# subqueries (nested WITH inside a derived table) — the audit's oracle
# can never drift from the searches it audits
ORACLE_SQL["embed_recall_audit"] = f"""
    WITH exact AS (SELECT vec_id FROM ({ORACLE_SQL["embed_knn"]})),
    appr AS (SELECT vec_id FROM ({ORACLE_SQL["embed_ann_ivf"]}))
    SELECT {_TOP_K} AS k,
           CAST(count(*) AS BIGINT) AS n_overlap,
           count(*) * 1.0 / {_TOP_K} AS recall
    FROM exact JOIN appr USING (vec_id)
"""

# nprobe sweep: the centroid CTE (_cent_cte_sql), embed_ann_ivf's cell
# ranking, and the exact-kNN oracle, each verbatim; the grid is
# interpolated from _IVF_SWEEP_PROBES so the two engines can never
# sweep different budgets.
ORACLE_SQL["embed_ivf_tuning"] = f"""
    WITH cent AS (
{_cent_cte_sql("embeddings")}
    ),
    q AS (
        SELECT embedding::DOUBLE[] AS qv FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL)
        WHERE vec_id = {_QUERY_VEC_ID}
    ),
    ranked AS (
        SELECT cell AS label,
               row_number() OVER (
                   ORDER BY list_cosine_similarity(cv, qv) DESC, cell ASC
               ) AS cell_rank
        FROM cent, q
    ),
    grid AS (SELECT unnest({list(_IVF_SWEEP_PROBES)}) AS nprobe),
    cand AS (
        SELECT g.nprobe, e.vec_id,
               round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6)
                   AS cosine_sim
        FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL) e
        JOIN ranked r ON e.label = r.label
        JOIN grid g ON r.cell_rank <= g.nprobe, q
        WHERE e.vec_id <> {_QUERY_VEC_ID}
    ),
    vol AS (
        SELECT nprobe, CAST(count(*) AS BIGINT) AS n_candidates
        FROM cand GROUP BY nprobe
    ),
    topk AS (
        SELECT nprobe, vec_id FROM (
            SELECT nprobe, vec_id,
                   row_number() OVER (
                       PARTITION BY nprobe
                       ORDER BY cosine_sim DESC, vec_id ASC
                   ) AS rn
            FROM cand
        ) WHERE rn <= {_TOP_K}
    ),
    exact AS (SELECT vec_id FROM ({ORACLE_SQL["embed_knn"]})),
    ov AS (
        SELECT nprobe, CAST(count(*) AS BIGINT) AS n_overlap
        FROM topk JOIN exact USING (vec_id) GROUP BY nprobe
    )
    SELECT g.nprobe, {_TOP_K} AS k,
           coalesce(v.n_candidates, CAST(0 AS BIGINT)) AS n_candidates,
           coalesce(o.n_overlap, CAST(0 AS BIGINT)) AS n_overlap,
           coalesce(o.n_overlap, CAST(0 AS BIGINT)) * 1.0 / {_TOP_K} AS recall
    FROM grid g
    LEFT JOIN vol v USING (nprobe)
    LEFT JOIN ov o USING (nprobe)
"""

# hybrid RRF fusion: wraps the BM25 oracle (text._bm25_sql — the same
# parametrized mirror the non-ASCII gate drives) and the exact-kNN
# oracle verbatim as the two leg subqueries, so the fused oracle can
# never drift from the per-leg oracles. 1/(K+rank) and the 2-term sum
# are exact IEEE double ops on integers — no rounding needed.
from .dedup import _JACCARD_THRESHOLD as _AGREE_JACCARD  # noqa: E402
from .dedup import _VERIFIED_SQL as _AGREE_VERIFIED_SQL  # noqa: E402
from .text import _BM25_TERMS as _HYBRID_TERMS  # noqa: E402
from .text import _bm25_sql as _hybrid_bm25_sql  # noqa: E402

ORACLE_SQL["embed_bq_search"] = f"""
    WITH codes AS (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               CAST(list_sum(list_transform(range(0, 32),
                   i -> CASE WHEN embedding[i + 1] > 0
                             THEN CAST(pow(2, i) AS BIGINT)
                             ELSE 0 END)) AS BIGINT) AS code_lo,
               CAST(list_sum(list_transform(range(0, 32),
                   i -> CASE WHEN embedding[i + 33] > 0
                             THEN CAST(pow(2, i) AS BIGINT)
                             ELSE 0 END)) AS BIGINT) AS code_hi
        FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL)
    ),
    q AS (SELECT * FROM codes WHERE vec_id = {_QUERY_VEC_ID}),
    pool AS (
        SELECT c.vec_id,
               CAST(bit_count(xor(c.code_lo, q.code_lo))
                    + bit_count(xor(c.code_hi, q.code_hi)) AS INT)
                   AS hamming,
               round(list_cosine_similarity(c.v, q.v), 6) AS cosine_sim
        FROM codes c, q
        WHERE c.vec_id <> {_QUERY_VEC_ID}
        ORDER BY hamming ASC, c.vec_id ASC
        LIMIT {_BQ_RERANK_K}
    )
    SELECT vec_id, hamming, cosine_sim FROM pool
    ORDER BY cosine_sim DESC, vec_id ASC
    LIMIT {_TOP_K}
"""

ORACLE_SQL["docs_hybrid_search"] = f"""
    WITH lex AS (
        SELECT doc_id, bm25_score,
               CAST(row_number() OVER (ORDER BY bm25_score DESC, doc_id ASC)
                    AS INT) AS lex_rank
        FROM ({_hybrid_bm25_sql(_HYBRID_TERMS)})
    ),
    sem AS (
        SELECT vec_id, cosine_sim,
               CAST(row_number() OVER (ORDER BY cosine_sim DESC, vec_id ASC)
                    AS INT) AS sem_rank
        FROM ({ORACLE_SQL["embed_knn"]})
    )
    SELECT coalesce(l.doc_id, s.vec_id) AS doc_id,
           l.lex_rank, l.bm25_score, s.sem_rank, s.cosine_sim,
           coalesce(CAST(1.0 AS DOUBLE) / ({_RRF_K} + l.lex_rank),
                    CAST(0.0 AS DOUBLE))
             + coalesce(CAST(1.0 AS DOUBLE) / ({_RRF_K} + s.sem_rank),
                        CAST(0.0 AS DOUBLE)) AS rrf_score
    FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.vec_id
    ORDER BY rrf_score DESC, doc_id ASC
"""

# matryoshka audit oracle: the truncated leg is the kNN oracle with the
# embedding sliced to its first _MRL_DIM dims (DuckDB list slice on the
# DOUBLE-cast list so both engines fold identical IEEE values); the
# full-dim leg wraps ORACLE_SQL["embed_knn"] verbatim.
ORACLE_SQL["embed_matryoshka_audit"] = f"""
    WITH exact AS (SELECT vec_id FROM ({ORACLE_SQL["embed_knn"]})),
    trunc AS (
        SELECT a.vec_id
        FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL) a
        WHERE a.vec_id <> {_QUERY_VEC_ID}
        ORDER BY round(list_cosine_similarity(
                     (a.embedding::DOUBLE[])[1:{_MRL_DIM}],
                     (SELECT (embedding::DOUBLE[])[1:{_MRL_DIM}]
                      FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL) WHERE vec_id = {_QUERY_VEC_ID})
                 ), 6) DESC, a.vec_id ASC
        LIMIT {_TOP_K}
    )
    SELECT {_TOP_K} AS k,
           {_DIM} AS dim_full,
           {_MRL_DIM} AS dim_trunc,
           CAST(count(*) AS BIGINT) AS n_overlap,
           count(*) * 1.0 / {_TOP_K} AS recall
    FROM exact JOIN trunc USING (vec_id)
"""


# composed AFTER the per-method entries exist: NDCG reuses each audited
# oracle verbatim as its candidate source (one formula, zero drift)
ORACLE_SQL["embed_ndcg_audit"] = f"""
    WITH idcg AS (
        SELECT dcg AS idcg FROM (
        SELECT CAST(CAST(round(sum(cosine_sim / log2(r + 1)), 6)
                    AS DECIMAL(38,6)) AS DOUBLE) AS dcg
        FROM (SELECT cosine_sim,
                     row_number() OVER (ORDER BY cosine_sim DESC,
                                        vec_id ASC) AS r
              FROM ({ORACLE_SQL["embed_knn"]}))
    )
    ),
    m_lsh AS (SELECT 'lsh' AS method, dcg FROM (
        SELECT CAST(CAST(round(sum(cosine_sim / log2(r + 1)), 6)
                    AS DECIMAL(38,6)) AS DOUBLE) AS dcg
        FROM (SELECT cosine_sim,
                     row_number() OVER (ORDER BY cosine_sim DESC,
                                        vec_id ASC) AS r
              FROM ({ORACLE_SQL["embed_ann_lsh"]}))
    )),
    m_ivf AS (SELECT 'ivf' AS method, dcg FROM (
        SELECT CAST(CAST(round(sum(cosine_sim / log2(r + 1)), 6)
                    AS DECIMAL(38,6)) AS DOUBLE) AS dcg
        FROM (SELECT cosine_sim,
                     row_number() OVER (ORDER BY cosine_sim DESC,
                                        vec_id ASC) AS r
              FROM ({ORACLE_SQL["embed_ann_ivf"]}))
    )),
    m_bq AS (SELECT 'bq' AS method, dcg FROM (
        SELECT CAST(CAST(round(sum(cosine_sim / log2(r + 1)), 6)
                    AS DECIMAL(38,6)) AS DOUBLE) AS dcg
        FROM (SELECT cosine_sim,
                     row_number() OVER (ORDER BY cosine_sim DESC,
                                        vec_id ASC) AS r
              FROM ({ORACLE_SQL["embed_bq_search"]}))
    )),
    m AS (SELECT * FROM m_lsh UNION ALL SELECT * FROM m_ivf
          UNION ALL SELECT * FROM m_bq)
    SELECT m.method, {_TOP_K} AS k, m.dcg, idcg.idcg,
           m.dcg / idcg.idcg AS ndcg
    FROM m, idcg
"""

# Shared persisted kernels for explicit family_build:* bench rows (see
# operators/dedup.py FAMILY_BUILDS for the convention).
FAMILY_CONSUMERS = {
    "ivf_centroids": (
        "embed_ann_ivf",
        "embed_ivf_assign",
        "embed_cell_balance_audit",
        "embed_recall_audit",
        "embed_ivf_tuning",
        "embed_pq_codes",
        "embed_ann_ivfpq",
        "embed_pipeline_e2e",
    ),
    "km_fit": (
        "embed_kmeans",
        "embed_silhouette",
        "embed_prototypicality",
        "embed_cluster_purity",
    ),
}

FAMILY_BUILDS = {
    # deterministic IVF coarse-quantizer centroids: consumed by
    # embed_ann_ivf, embed_ivf_assign, embed_cell_balance_audit,
    # embed_recall_audit, embed_pq_codes, embed_ann_ivfpq,
    # embed_pipeline_e2e
    "ivf_centroids": lambda spark, sf_dir: [
        _centroid_vecs(
            _load_vectors(spark, sf_dir).select(
                "vec_id",
                "label",
                F.col("embedding").cast("array<double>").alias("v"),
            )
        )
    ],
    # the Lloyd fit (final codebook + final assignment): consumed by
    # embed_kmeans, embed_silhouette, embed_prototypicality,
    # embed_cluster_purity (r11)
    "km_fit": lambda spark, sf_dir: list(
        _km_fit(_load_vectors(spark, sf_dir))
    ),
}

# Cross-modality agreement oracle: the dedup module's verified-pair SQL
# and this module's cosine-pair SQL, joined exactly as the query joins
# the two persisted kernels (imports above — one formula per modality,
# zero drift from the per-modality oracles).
ORACLE_SQL["docs_dedup_modality_agreement"] = f"""
    WITH tp AS (
        SELECT doc_a, doc_b, jaccard FROM ({_AGREE_VERIFIED_SQL})
        WHERE jaccard >= {_AGREE_JACCARD}
    ),
    ep AS (
        SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
               round({_COS_SQL}, 6) AS cosine_sim
        FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL) a JOIN (SELECT * FROM embeddings WHERE embedding IS NOT NULL) b ON a.vec_id < b.vec_id
        WHERE round({_COS_SQL}, 6) >= {_NEARDUP_THRESHOLD}
    )
    SELECT coalesce(tp.doc_a, ep.doc_a) AS doc_a,
           coalesce(tp.doc_b, ep.doc_b) AS doc_b,
           tp.jaccard, ep.cosine_sim,
           tp.doc_a IS NOT NULL AS text_dup,
           ep.doc_a IS NOT NULL AS embed_dup,
           tp.doc_a IS NOT NULL AND ep.doc_a IS NOT NULL AS both_dup
    FROM tp FULL OUTER JOIN ep
      ON tp.doc_a = ep.doc_a AND tp.doc_b = ep.doc_b
"""

# Prototypicality chains the embed_kmeans assignment oracle VERBATIM —
# one clustering formula, zero drift between the fit and the pruning
# verdict built on it.
ORACLE_SQL["embed_prototypicality"] = f"""
    WITH asg AS ({ORACLE_SQL["embed_kmeans"]}),
    ranked AS (
        SELECT vec_id, label, cell, sq_dist,
               row_number() OVER (
                   PARTITION BY cell ORDER BY sq_dist, vec_id
               ) AS proto_rank,
               count(*) OVER (PARTITION BY cell) AS cell_size
        FROM asg
    )
    SELECT vec_id, label, cell, sq_dist,
           CAST(proto_rank AS BIGINT) AS proto_rank,
           CAST(cell_size AS BIGINT) AS cell_size,
           proto_rank * 100 > {_PROTO_PRUNE_PCT} * cell_size AS keep
    FROM ranked
"""

# Purity chains the embed_kmeans assignment oracle VERBATIM, like
# embed_prototypicality above.
ORACLE_SQL["embed_cluster_purity"] = f"""
    WITH asg AS ({ORACLE_SQL["embed_kmeans"]}),
    per AS (
        SELECT cell, label, CAST(count(*) AS BIGINT) AS n
        FROM asg GROUP BY cell, label
    ),
    best AS (
        SELECT cell,
               CAST(count(*) AS BIGINT) AS n_labels,
               CAST(sum(n) AS BIGINT) AS cell_size,
               max(struct_pack(n:=n, neg:=-label)) AS m
        FROM per GROUP BY cell
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM asg)
    SELECT cell, cell_size, n_labels,
           CAST(-(m.neg) AS INT) AS majority_label,
           CAST(m.n AS BIGINT) AS majority_n,
           m.n / CAST(cell_size AS DOUBLE) AS purity,
           m.n / CAST(n_total AS DOUBLE) AS purity_contrib
    FROM best CROSS JOIN tot
"""

# TwoNN intrinsic dimension: exact all-pairs 2-NN in the oracle (the
# tiled Spark plan is physical-only — proven value-neutral by parity),
# same round-6 squared distances, same usable/degenerate policy.
ORACLE_SQL["embed_intrinsic_dim"] = """
    WITH e AS (
        SELECT vec_id, label, embedding::DOUBLE[] AS v FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL)
    ),
    p AS (
        SELECT a.vec_id AS vid,
               round(list_sum(list_transform(
                   range(1, len(a.v) + 1),
                   i -> (a.v[i] - b.v[i]) * (a.v[i] - b.v[i]))), 6) AS d
        FROM e a JOIN e b ON a.vec_id <> b.vec_id
    ),
    nn AS (
        SELECT vid, d,
               row_number() OVER (PARTITION BY vid ORDER BY d) AS rn
        FROM p
    ),
    two AS (
        SELECT vid,
               max(CASE WHEN rn = 1 THEN d END) AS d1,
               max(CASE WHEN rn = 2 THEN d END) AS d2
        FROM nn WHERE rn <= 2 GROUP BY vid
    ),
    j AS (
        SELECT e.label, two.d1, two.d2
        FROM e LEFT JOIN two ON e.vec_id = two.vid
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(CASE WHEN d1 > 0 AND d2 IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_used,
           CAST(CAST(round(
               sum(CASE WHEN d1 > 0 AND d2 IS NOT NULL
                        THEN 1 ELSE 0 END)
               / nullif(sum(CASE WHEN d1 > 0 AND d2 IS NOT NULL
                                 THEN 0.5 * ln(d2 / d1) END), 0.0), 6
           ) AS DECIMAL(38,6)) AS DOUBLE) AS intrinsic_dim
    FROM j GROUP BY label
"""

# Exact-vs-ANN TwoNN audit: the exact leg is the oracle above verbatim;
# the ANN leg restricts the pair join to same-coarse-cell vectors
# (embed_ivf_assign's assignment CTEs verbatim — nprobe=1), same
# round-6 distances, same usable/degenerate policy, same decimal hop.
ORACLE_SQL["embed_intrinsic_dim_ann"] = f"""
    WITH e AS (
        SELECT vec_id, label, embedding::DOUBLE[] AS v
        FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL)
    ),
    p AS (
        SELECT a.vec_id AS vid,
               round(list_sum(list_transform(
                   range(1, len(a.v) + 1),
                   i -> (a.v[i] - b.v[i]) * (a.v[i] - b.v[i]))), 6) AS d
        FROM e a JOIN e b ON a.vec_id <> b.vec_id
    ),
    two AS (
        SELECT vid,
               max(CASE WHEN rn = 1 THEN d END) AS d1,
               max(CASE WHEN rn = 2 THEN d END) AS d2
        FROM (SELECT vid, d, row_number() OVER (
                  PARTITION BY vid ORDER BY d) AS rn FROM p)
        WHERE rn <= 2 GROUP BY vid
    ),
    x AS (
        SELECT label,
               CAST(count(*) AS BIGINT) AS n_vecs,
               CAST(sum(CASE WHEN d1 > 0 AND d2 IS NOT NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_used_exact,
               CAST(CAST(round(
                   sum(CASE WHEN d1 > 0 AND d2 IS NOT NULL
                            THEN 1 ELSE 0 END)
                   / nullif(sum(CASE WHEN d1 > 0 AND d2 IS NOT NULL
                                     THEN 0.5 * ln(d2 / d1) END), 0.0), 6
               ) AS DECIMAL(38,6)) AS DOUBLE) AS dim_exact
        FROM e LEFT JOIN two ON e.vec_id = two.vid GROUP BY label
    ),
    cent AS (
{_cent_cte_sql("embeddings")}
    ),
    dist AS (
        SELECT e.vec_id, c.cell,
               {_SQDIST_SQL}
                   AS sq_dist
        FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL) e
        CROSS JOIN cent c
    ),
    asg AS (
        SELECT vec_id, cell
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY vec_id ORDER BY sq_dist, cell) AS rn
            FROM dist
        )
        WHERE rn = 1
    ),
    pa AS (
        SELECT a.vec_id AS vid,
               round(list_sum(list_transform(
                   range(1, len(a.v) + 1),
                   i -> (a.v[i] - b.v[i]) * (a.v[i] - b.v[i]))), 6) AS d
        FROM e a JOIN asg sa ON sa.vec_id = a.vec_id
        -- null-safe cell match: a NULL-label centroid is a REAL cell
        -- (the Spark side's groupBy(cell) groups its members), so its
        -- within-cell 2-NN must exist here too — a plain = join
        -- silently orphaned NULL-cell vectors (caught by the
        -- embeddings NULL sweep, r12)
        JOIN asg sb ON sb.cell IS NOT DISTINCT FROM sa.cell
        JOIN e b ON b.vec_id = sb.vec_id AND a.vec_id <> b.vec_id
    ),
    twoa AS (
        SELECT vid,
               max(CASE WHEN rn = 1 THEN d END) AS d1,
               max(CASE WHEN rn = 2 THEN d END) AS d2
        FROM (SELECT vid, d, row_number() OVER (
                  PARTITION BY vid ORDER BY d) AS rn FROM pa)
        WHERE rn <= 2 GROUP BY vid
    ),
    a AS (
        SELECT label,
               CAST(sum(CASE WHEN d1 > 0 AND d2 IS NOT NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_used_ann,
               CAST(CAST(round(
                   sum(CASE WHEN d1 > 0 AND d2 IS NOT NULL
                            THEN 1 ELSE 0 END)
                   / nullif(sum(CASE WHEN d1 > 0 AND d2 IS NOT NULL
                                     THEN 0.5 * ln(d2 / d1) END), 0.0), 6
               ) AS DECIMAL(38,6)) AS DOUBLE) AS dim_ann
        FROM e LEFT JOIN twoa ON e.vec_id = twoa.vid GROUP BY label
    )
    SELECT x.label, x.n_vecs, x.n_used_exact, a.n_used_ann,
           x.dim_exact, a.dim_ann,
           abs(a.dim_ann - x.dim_exact) AS abs_gap
    FROM x JOIN a ON x.label IS NOT DISTINCT FROM a.label
"""
