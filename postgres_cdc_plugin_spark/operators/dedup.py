"""Deduplication operators over the `documents` table.

The LLM-training-data extension surface (BASELINE.json north star): exact
hash dedup, MinHash signatures over character shingles, banded LSH for
candidate pairs, true n-gram Jaccard verification, and near-dup removal.

LSH design: _N_HASHES salted min-hashes grouped into _N_BANDS bands of
_ROWS_PER_BAND rows; the band key hashes all rows of the band together,
so two documents collide on a band only if all of its min-hashes agree —
collision probability J^r per band, which keeps the candidate set sparse
even on a corpus with a tiny shingle vocabulary. Candidates are verified
with exact shingle-set Jaccard before any document is dropped.

All hashes are md5-based so the DuckDB oracle computes bit-identical
values. Spark-side the pair generation is the scalable formulation:
explode (band, key) and equi-join on them — a plain shuffle hash join on
the band key — rather than the O(n^2) OR-condition self-join the SQL
oracle uses. Same result set, cluster-shaped plan.

At 100 TB: shingling is a narrow explode (no shuffle); signatures are one
groupBy(doc_id) with map-side partial min() (no distinct shuffle — min is
duplicate-insensitive); the band join shuffles only (band, key, doc_id)
tuples; the expensive exact-Jaccard intersection runs only on the sparse
candidate set. Skewed band buckets are split by AQE skew-join handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..session import load, spread, spread_scan

_N_BANDS = 3
_ROWS_PER_BAND = 3
_N_HASHES = _N_BANDS * _ROWS_PER_BAND
_SHINGLE = 8  # character shingle width
_JACCARD_THRESHOLD = 0.8  # verified similarity above which doc_b is dropped
_CC_MAX_ROUNDS = 50  # min-label propagation safety valve (fails loud)


def _fingerprint():
    return F.md5(F.lower(F.trim(F.col("text"))))


def docs_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: normalized-text hash, first doc per fingerprint wins.

    The hash-groupBy dedup baseline. row_number over the fingerprint
    (deterministic doc_id order) keeps the canonical copy — the same
    last/first-wins window shape as the credentials upsert
    (cdc_webhook--1.0.sql:188-197).
    """
    docs = load(spark, sf_dir, "documents")
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    return (
        docs.withColumn("fingerprint", _fingerprint())
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "fingerprint", "lang", "source", "n_chars")
    )


def docs_dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-hygiene segmentation: exact-duplicate rate per source —
    the "which crawl is dirtiest" audit that decides where to point
    cleaning effort and which feeds to renegotiate. A document is a
    duplicate when it is not the canonical (first-doc_id) copy of its
    normalized-text fingerprint; the verdict reuses the
    docs_exact_dedup window kernel verbatim, so this audit cannot
    drift from the dedup pass it explains.

    Scale: the fingerprint window is the dedup pass's one shuffle; the
    rollup keys on source (map-side partials, |sources| rows out).
    Rates are exact int64/int64 divisions."""
    docs = load(spark, sf_dir, "documents")
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    flagged = (
        docs.withColumn("fingerprint", _fingerprint())
        .withColumn("rn", F.row_number().over(w))
        .select(
            "source",
            "n_chars",
            (F.col("rn") > 1).cast("int").alias("is_dup"),
        )
    )
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("is_dup").cast("bigint").alias("n_dups"),
        (
            F.sum("is_dup") / F.count(F.lit(1)).cast("double")
        ).alias("dup_rate"),
        F.sum(F.col("n_chars") * F.col("is_dup")).cast("bigint").alias(
            "dup_chars"
        ),
    )


def docs_fingerprint_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-group stats per content fingerprint."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.withColumn("fingerprint", _fingerprint())
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("canonical_doc_id"),
            F.max("n_chars").alias("max_chars"),
        )
    )


def _shingles(docs: DataFrame, distinct: bool) -> DataFrame:
    """Byte shingles per doc: narrow explode, no shuffle.
    distinct=True (set semantics, for Jaccard) costs one dedup shuffle;
    min-hash signatures skip it — min() is duplicate-insensitive.

    Shingling operates on the utf-8 BYTES of the text: substr on a
    binary column is O(1) byte addressing, while substring on a string
    is an O(i) codepoint scan — byte-grams make shingling O(n) per doc
    instead of O(n^2) (~5x wall-clock on this corpus). Byte-grams are
    the standard choice in large-scale corpus dedup; a mid-codepoint
    window is a legitimate shingle.

    The shingle VALUE is the hex rendition of the byte window, not the
    raw bytes: a mid-codepoint byte slice is not valid UTF-8, so no
    engine-portable string form of the raw window exists (DuckDB can
    neither substr nor md5 a BLOB), while hex is plain ASCII that both
    engines hash identically — which is what lets the whole MinHash
    family keep exact DuckDB oracles on NON-ASCII corpora
    (tests/test_nonascii_parity.py; this gate caught the raw-byte form
    diverging). hex() is a narrow codegen expression; the 2x shingle
    width only affects the pre-aggregation stream.

    distinct=True dedup happens PER DOCUMENT via array_distinct before
    the explode (r14): (doc_id, g) set semantics never needed the
    corpus-wide exchange a .distinct() pays — doc_id is in the key, so
    the dedup is per-doc by definition — and the array form keeps the
    relation hash-partitioned by doc_id, which the signature rollup
    (groupBy doc_id) and the per-doc size count then reuse exchange-
    free. Two exchanges removed from every Jaccard-family plan vs the
    r13 formulation, identical rows out.
    """
    grams = F.expr(
        f"transform(sequence(1, greatest(octet_length(b) - {_SHINGLE - 1},"
        f" 1)), i -> hex(substr(b, CAST(i AS INT), {_SHINGLE})))"
    )
    # the source is a single small parquet file (one input split); without
    # an explicit repartition the ~100x explode amplification and per-
    # shingle hashing all run in ONE task — shuffle the cheap pre-explode
    # rows to unlock full parallelism
    return (
        docs.select("doc_id", F.col("text").cast("binary").alias("b"))
        .transform(spread, "doc_id")
        .select(
            "doc_id",
            (F.array_distinct(grams) if distinct else grams).alias("gs"),
        )
        .select("doc_id", F.explode("gs").alias("g"))
    )


def _minhash_sigs(docs: DataFrame, shingles: DataFrame | None = None) -> DataFrame:
    """_N_HASHES min-hashes per doc: one groupBy(doc_id) with map-side
    partial min().

    One md5 per shingle; the _N_HASHES hash functions are overlapping
    8-hex-char windows of that digest (one-permutation-hashing style:
    each window induces a different ranking of shingles, so the argmin
    differs per window). Saves _N_HASHES-1 md5 evaluations per shingle
    occurrence — the dominant cost of signature building.

    `shingles` lets a caller that already materialized the shingle
    relation (the Jaccard verify path) share it: min() is duplicate-
    insensitive, so signatures over the DISTINCT shingle set are
    identical to signatures over the occurrence stream — and the corpus
    is shingled once, not twice. Registered queries ALWAYS pass the
    distinct relation (via _lsh_candidates or directly): a
    distinct=False caller computes the same values on a different
    canonical plan, which silently opts out of the family build's
    cache (the r7 docs_minhash_pairs drift).
    """
    sh = (shingles if shingles is not None else _shingles(docs, distinct=False)).select(
        "doc_id", F.md5("g").alias("hg")
    )
    aggs = [
        F.min(F.substring("hg", 1 + (h - 1) * 3, 8)).alias(f"mh{h}")
        for h in range(1, _N_HASHES + 1)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def _band_key(prefix: str, band: int, rows_per_band: int = _ROWS_PER_BAND):
    """Band key = md5 over the band's rows_per_band min-hashes: collides
    only when every row agrees (P = J^r)."""
    rows = [
        F.col(f"{prefix}mh{(band - 1) * rows_per_band + r}")
        for r in range(1, rows_per_band + 1)
    ]
    return F.md5(F.concat(*rows))


def _candidate_pairs(
    sigs: DataFrame, rows_per_band: int = _ROWS_PER_BAND
) -> DataFrame:
    """Banded LSH: pairs agreeing on >=1 full band, with bands_matched.

    Explode signatures to (band, key), equi-join on them (shuffle hash
    join on the band key — the scale path), then count join rows per
    pair. A doc has exactly ONE key per band, so the join emits at most
    one row per (pair, band) and count(*) IS the band-agreement count —
    no pair-distinct pass and no rejoin of the signature relation (the
    round-2 formulation spent two extra shuffle joins on that).

    rows_per_band parametrizes the banding (bands = _N_HASHES // r) so
    docs_lsh_tuning can sweep configurations over ONE signature build;
    the default is the production (3, 3) scheme.
    """
    n_bands = _N_HASHES // rows_per_band
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        _band_key("", b, rows_per_band).alias("k"),
                    )
                    for b in range(1, n_bands + 1)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.k").alias("k"))

    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.k") == F.col("b.k"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).cast("int").alias("bands_matched"))
    )


def _lsh_candidates(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Shared banded-LSH candidate kernel: distinct shingles ->
    signatures -> candidate pairs, each persisted. EVERY consumer must
    come through here (not through private _shingles/_minhash_sigs
    combinations) so the plans are canonically identical and the
    family build's cache entries always match — docs_minhash_pairs
    previously built its signatures from the occurrence-stream
    shingles (distinct=False), an identical RESULT on a different
    PLAN, so it silently rebuilt the whole signature pipeline next to
    the family's cached one (the r7 bench's 2.5x cold-vs-marginal
    drift, verdict ask #2)."""
    sh = _shingles(docs, distinct=True).persist()
    # pairs fan out twice (the intersection chain AND the doc_b
    # prefilter inside _exact_jaccard) — persist so the band join runs
    # once
    pairs = _candidate_pairs(_minhash_sigs(docs, shingles=sh).persist()).persist()
    return sh, pairs


def _verified_pairs(docs: DataFrame) -> DataFrame:
    """Candidate pairs + exact shingle-set Jaccard (the verify step)."""
    sh, pairs = _lsh_candidates(docs)
    return (
        _exact_jaccard(pairs, sh)
        # the verified-pair relation is pair-set sized (tiny) but costs
        # the whole candidate-intersection pipeline to build; persist so
        # the session's consumers (docs_ngram_jaccard, docs_minhash_dedup,
        # docs_ngram_containment) share one build via cache-manager plan
        # matching. Shingle-set sizes ride along so the containment
        # variant reuses the identical cached relation.
        .persist()
    )


def _exact_jaccard(
    pairs: DataFrame, sh: DataFrame, min_jaccard: float | None = None
) -> DataFrame:
    """Exact shingle-set Jaccard for a (doc_a, doc_b) pair relation over
    the DISTINCT shingle relation sh — the verify kernel shared by
    _verified_pairs and docs_lsh_tuning (one formula, zero drift).

    min_jaccard (r15, r14 verdict ask #3): when the CALLER keeps only
    pairs with jaccard >= t (the sweep's truth set), pairs whose
    size-ratio CEILING is already below t can skip the gram-expansion
    join entirely: n_inter <= min(sz_a, sz_b) and the union
    >= max(sz_a, sz_b), so J <= min/max — a per-pair upper bound from
    the per-doc sizes alone. The prune is EXACT for such callers
    (every dropped pair's true J < t, so the caller's filter would
    drop it anyway; a 1e-9 slack absorbs IEEE division rounding at the
    boundary so no J == t pair is ever lost), and it cuts the
    dominant cost — each surviving pair streams ~|doc| gram rows
    through two joins — by the pruned fraction. Callers that need
    EVERY pair's jaccard (_verified_pairs) leave it None.
    """
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))

    if min_jaccard is not None:
        # sizes is a doc-count-sized relation and broadcasts; the pair
        # relation never shuffles. Strictly a pre-filter — the kept
        # pairs flow through the identical exact pipeline below, with
        # sz_a/sz_b carried through the aggregation keys (functionally
        # dependent on the pair) so the pruned path never re-joins the
        # size relation. sizes is session-persisted here: it feeds both
        # endpoint joins, and the unpruned path's za/zb below read the
        # same cached relation for free (same canonical plan).
        sizes = sizes.persist()
        pa = sizes.select(
            F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a")
        )
        pb = sizes.select(
            F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b")
        )
        pruned = (
            pairs.join(F.broadcast(pa), "doc_a")
            .join(F.broadcast(pb), "doc_b")
            .filter(
                F.least("sz_a", "sz_b")
                / F.greatest("sz_a", "sz_b").cast("double")
                >= F.lit(float(min_jaccard) - 1e-9)
            )
        )
        sa = sh.alias("sa")
        sb = sh.join(
            F.broadcast(
                pruned.select(F.col("doc_b").alias("doc_id")).distinct()
            ),
            "doc_id",
            "semi",
        ).alias("sb")
        return (
            pruned.join(sa, pruned.doc_a == F.col("sa.doc_id"))
            .join(
                sb,
                (pruned.doc_b == F.col("sb.doc_id"))
                & (F.col("sa.g") == F.col("sb.g")),
            )
            .groupBy("doc_a", "doc_b", "sz_a", "sz_b")
            .agg(F.count(F.lit(1)).alias("n_inter"))
            .select(
                "doc_a",
                "doc_b",
                "n_inter",
                "sz_a",
                "sz_b",
                # same unrounded int/int IEEE division as below
                (
                    F.col("n_inter")
                    / (
                        F.col("sz_a") + F.col("sz_b") - F.col("n_inter")
                    ).cast("double")
                ).alias("jaccard"),
            )
        )

    # Candidate docs are a tiny fraction of the corpus, but the
    # (doc_id, g) intersection join would shuffle EVERY doc's shingles
    # on its right side — prefilter sb to candidate doc_bs with a
    # broadcast semi-join (a narrow map-side filter) so the wide
    # shuffle moves only candidate shingles. The sa side is already
    # pruned for free: `pairs` broadcasts onto sh without shuffling it.
    sa = sh.alias("sa")
    sb = sh.join(
        F.broadcast(pairs.select(F.col("doc_b").alias("doc_id")).distinct()),
        "doc_id",
        "semi",
    ).alias("sb")
    inter = (
        pairs.join(sa, pairs.doc_a == F.col("sa.doc_id"))
        .join(
            sb,
            (pairs.doc_b == F.col("sb.doc_id")) & (F.col("sa.g") == F.col("sb.g")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )

    za = sizes.alias("za")
    zb = sizes.alias("zb")
    return (
        inter.join(za, inter.doc_a == F.col("za.doc_id"))
        .join(zb, inter.doc_b == F.col("zb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            "n_inter",
            F.col("za.sz").alias("sz_a"),
            F.col("zb.sz").alias("sz_b"),
            # unrounded: int/int IEEE division is bit-identical across
            # engines, while round() diverges exactly at the .xxxx5
            # midpoints these rational values land on
            (
                F.col("n_inter")
                / (F.col("za.sz") + F.col("zb.sz") - F.col("n_inter")).cast("double")
            ).alias("jaccard"),
        )
    )


def docs_minhash_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signature table: the persisted artifact of a corpus-dedup
    pipeline (signatures computed once, reused by every later LSH pass).
    One groupBy(doc_id) with map-side partial min(), over the SAME
    distinct-shingle plan as the family kernel (min is duplicate-
    insensitive, so the values are identical; the shared plan is what
    lets this query read the family build's cache entry instead of
    re-shingling the corpus)."""
    docs = load(spark, sf_dir, "documents")
    return _minhash_sigs(docs, shingles=_shingles(docs, distinct=True))


def docs_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + banded-LSH candidate pairs with band-agreement counts.
    Reads the shared candidate kernel (_lsh_candidates) VERBATIM so its
    plan matches the family build's persisted pair relation."""
    docs = load(spark, sf_dir, "documents")
    return _lsh_candidates(docs)[1]


def docs_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact shingle-set Jaccard for every LSH candidate pair."""
    docs = load(spark, sf_dir, "documents")
    return _verified_pairs(docs).select("doc_a", "doc_b", "n_inter", "jaccard")


def docs_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment scores for every LSH candidate pair:
    containment_a = |A∩B| / |A| and containment_b = |A∩B| / |B| over
    the exact shingle sets, alongside the symmetric Jaccard.

    Jaccard under-scores QUOTATION: a short document wholly embedded in
    a long one has |A∩B| ≈ |A| but tiny |A∪B|-relative overlap, so the
    Jaccard-thresholded dedup keeps both. Containment (Broder's
    resemblance/containment pair, public literature) is the standard
    signal for that case — a training-data team filters on
    max(containment) to catch quote-inclusion near-dups. Zero extra
    pipeline cost: projects the SAME persisted verified-pair relation
    the Jaccard queries build (sizes ride along in the cache), so at
    any scale this adds two divisions per candidate pair."""
    docs = load(spark, sf_dir, "documents")
    return _verified_pairs(docs).select(
        "doc_a",
        "doc_b",
        "n_inter",
        "jaccard",
        (F.col("n_inter") / F.col("sz_a").cast("double")).alias("containment_a"),
        (F.col("n_inter") / F.col("sz_b").cast("double")).alias("containment_b"),
    )


def docs_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup removal: candidate generation (banded LSH) -> exact
    Jaccard verification -> drop doc_b of any pair above the similarity
    threshold; survivors pass through (anti join)."""
    docs = load(spark, sf_dir, "documents")
    losers = (
        _verified_pairs(docs)
        .filter(F.col("jaccard") >= _JACCARD_THRESHOLD)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    return docs.join(losers, "doc_id", "left_anti").select(
        "doc_id", "lang", "source", "n_chars"
    )


_DEDUP_SENS_THRESHOLDS = (0.2, 0.4, 0.6, 0.8, 0.95)


def docs_dedup_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-threshold sensitivity sweep (r10) — the tuning-audit
    family symmetry for the VERIFY threshold (docs_lsh_tuning sweeps
    candidate generation; this sweeps the Jaccard cutoff the verified
    pairs are judged against): for each candidate threshold, how many
    verified pairs qualify, how many documents the keep-min rule drops
    (distinct doc_b — exactly docs_minhash_dedup's loser set at that
    threshold), the survivor count, and the corpus drop rate. The
    curve a pipeline reads before committing a 100 TB dedup pass:
    Lee et al. 2022 (Deduplicating Training Data Makes Language Models
    Better, public literature) shows the kept-corpus size is sharply
    threshold-sensitive, so the cutoff is tuned on exactly this sweep.

    Reuses the persisted verified-pair family kernel
    (_verified_pairs) VERBATIM — the sweep grades the SAME relation
    docs_minhash_dedup acts on (FAMILY_CONSUMERS entry below), so the
    curve cannot drift from the dedup it predicts: the
    threshold-{_JACCARD_THRESHOLD} row's survivor count IS
    docs_minhash_dedup's row count (pinned in tests/test_dedup.py).

    Determinism: qualification counts are exact int64 conditional
    sums over bit-identical jaccard values (int/int divisions, never
    rounded); drop_frac is one int64/int64 IEEE division.

    Scale: the candidate relation is pair-set sized (banded LSH keeps
    it near-linear in true dups, never all-pairs); the grid fan-out is
    |thresholds| narrow copies of THAT small relation — no corpus
    cost beyond the family build already paid. The distinct-loser
    count per grid point is one two-level aggregation.

    Caveat (r10 advice): the sweep is CANDIDATE-RELATION-RELATIVE.
    Grid points below the banding's collision knee (the Jaccard value
    where the banded-LSH collision probability 1-(1-s^r)^b falls off)
    see only the pairs the banding surfaced, whose recall at low
    similarity is poor by design — so n_pairs / n_dropped / drop_frac
    at thresholds like 0.2/0.4 are LOWER BOUNDS on a true all-pairs
    sweep, not corpus-true counts. Rows at or above the operating
    point (the committed {_JACCARD_THRESHOLD} and its neighborhood)
    are the rows a 100 TB pass should read; the low rows exist to
    show the curve's shape over the SAME relation the dedup acts on.
    """
    docs = load(spark, sf_dir, "documents")
    vp = _verified_pairs(docs).select("doc_b", "jaccard")
    grid = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(float(t)) for t in _DEDUP_SENS_THRESHOLDS])
        ).alias("threshold")
    )
    hit = F.col("jaccard") >= F.col("threshold")
    per = (
        vp.crossJoin(F.broadcast(grid))
        .groupBy("threshold")
        .agg(
            F.sum(hit.cast("int")).cast("bigint").alias("n_pairs"),
            F.count_distinct(F.when(hit, F.col("doc_b")))
            .cast("bigint")
            .alias("n_dropped"),
        )
    )
    tot = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    return per.crossJoin(F.broadcast(tot)).select(
        "threshold",
        "n_pairs",
        "n_dropped",
        "n_docs",
        (F.col("n_docs") - F.col("n_dropped")).cast("bigint").alias(
            "n_survivors"
        ),
        (F.col("n_dropped") / F.expr("nullif(n_docs, 0)")).alias(
            "drop_frac"
        ),
    )


_LSH_SWEEP_ROWS = (2, 3, 9)  # rows-per-band configs; bands = 9 // r


def _lsh_sweep_kernels(
    docs: DataFrame,
) -> tuple[dict[int, DataFrame], DataFrame]:
    """The sweep family's persisted kernels: per-config candidate-pair
    relations over ONE shared signature build, plus the exact-verified
    truth set of the finest banding (the sweep's recall denominator).
    Extracted from docs_lsh_tuning so the bench can charge the build to
    an explicit family_build row (FAMILY_BUILDS below).

    r14: only the FINEST banding pays a band self-join. The swept
    configs form a nested refinement chain (docs_lsh_tuning's
    docstring proof: cand9 ⊆ cand3 ⊆ cand2), so the coarser bandings
    re-derive from the finest candidate set by re-checking band-key
    agreement against the signature relation — two signature joins of
    the PAIR relation instead of a second and third corpus-wide band
    self-join (band keys are the identical _band_key md5s, so the
    derived (doc_a, doc_b, bands_matched) rows are byte-equal to the
    self-join's). Scale: the pair relation is orders of magnitude
    smaller than the bands explode; the signature side broadcasts
    while it fits and falls back to an equi-join on doc id."""
    sh = _shingles(docs, distinct=True).persist()
    sigs = _minhash_sigs(docs, shingles=sh).persist()
    finest = _LSH_SWEEP_ROWS[0]
    cands = {finest: _candidate_pairs(sigs, finest).persist()}
    base = cands[finest].select("doc_a", "doc_b")
    for r in _LSH_SWEEP_ROWS[1:]:
        cands[r] = _rebanded_pairs(base, sigs, r).persist()
    truth = (
        # min_jaccard prunes pairs whose size-ratio ceiling is below
        # the threshold BEFORE the gram-expansion join (r15 — exact,
        # see _exact_jaccard; the filter below would drop them anyway)
        _exact_jaccard(base, sh, min_jaccard=_JACCARD_THRESHOLD)
        .filter(F.col("jaccard") >= _JACCARD_THRESHOLD)
        .select("doc_a", "doc_b")
        .persist()
    )
    return cands, truth


def _rebanded_pairs(
    pairs: DataFrame, sigs: DataFrame, rows_per_band: int
) -> DataFrame:
    """Candidate pairs for a COARSER banding derived from a superset
    pair relation: join both endpoints' signatures back and count the
    bands whose md5 band keys agree — exactly _candidate_pairs'
    count(*) over the band equi-join, provided every pair of the
    coarser banding is present in `pairs` (the nested-refinement
    property the sweep's configs guarantee)."""
    n_bands = _N_HASHES // rows_per_band
    a = sigs.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"mh{h}").alias(f"amh{h}") for h in range(1, _N_HASHES + 1)],
    )
    b = sigs.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"mh{h}").alias(f"bmh{h}") for h in range(1, _N_HASHES + 1)],
    )
    matched = sum(
        (
            _band_key("a", band, rows_per_band)
            == _band_key("b", band, rows_per_band)
        ).cast("int")
        for band in range(1, n_bands + 1)
    )
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select("doc_a", "doc_b", matched.alias("m"))
        .filter(F.col("m") >= 1)
        .select(
            "doc_a", "doc_b", F.col("m").cast("int").alias("bands_matched")
        )
    )


def docs_lsh_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding-parameter sweep — the tuning audit run BEFORE
    committing a 100 TB dedup pass: for each (rows-per-band r,
    bands b = 9//r) configuration over the SAME 9-hash signature build,
    report candidate volume, verified true positives (exact Jaccard >=
    threshold), precision, recall, and the theoretical collision
    probability 1-(1-J^r)^b at the threshold.

    The swept configs form a NESTED refinement chain: a matching
    3-row band forces a matching 2-row band on hashes 1-8 (bands at
    r=2 pair hashes (1,2)(3,4)(5,6)(7,8); hash 9 idles), and a 9-row
    match forces every band — so cand9 ⊆ cand3 ⊆ cand2, and the
    verified r=2 candidate set is the EXACT recall denominator for
    the whole sweep, not a sample. r=1 (any shared min-hash) is
    deliberately excluded: its candidate set is bucket-quadratic
    (3.2M pairs at sf0.1 vs 90k for r=2 — measured), which is
    precisely the configuration the audit exists to warn against.

    Reuses the production kernels verbatim (_minhash_sigs,
    _candidate_pairs parametrized by r, the _exact_jaccard verify), so
    the sweep can never drift from the dedup it tunes. Scale: ONE
    shingle pass + ONE signature aggregation feed all configs; each
    config is one band equi-join over the (Zipf-small) signature
    relation; the finest (r=2) join bounds the sweep's cost — the
    same work an actual re-banding would spend, measured before the
    full corpus pays it.
    """
    docs = load(spark, sf_dir, "documents")
    cands, truth = _lsh_sweep_kernels(docs)
    n_truth = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    out: DataFrame | None = None
    for r in _LSH_SWEEP_ROWS:
        b = _N_HASHES // r
        p = round(1.0 - (1.0 - _JACCARD_THRESHOLD**r) ** b, 6)
        n_cand = cands[r].agg(F.count(F.lit(1)).alias("n_cand"))
        n_true = (
            cands[r]
            .join(truth, ["doc_a", "doc_b"], "semi")
            .agg(F.count(F.lit(1)).alias("n_true"))
        )
        row = (
            n_cand.crossJoin(n_true)
            .crossJoin(n_truth)
            .select(
                F.lit(r).cast("int").alias("rows_per_band"),
                F.lit(b).cast("int").alias("n_bands"),
                F.lit(p).alias("p_collide_at_threshold"),
                F.col("n_cand").alias("n_candidates"),
                F.col("n_true").alias("n_true"),
                (
                    F.col("n_true") / F.expr("CAST(nullif(n_cand, 0) AS DOUBLE)")
                ).alias("lsh_precision"),
                (
                    F.col("n_true") / F.expr("CAST(nullif(n_truth, 0) AS DOUBLE)")
                ).alias("lsh_recall"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


def _lsh_any_band_sql_r(r: int) -> str:
    """SQL mirror of the r-parametrized band agreement (>=1 band whose
    md5(concatenated rows) keys collide) for docs_lsh_tuning's oracle."""

    def key(prefix: str, band: int) -> str:
        rows = " || ".join(
            f"{prefix}mh{(band - 1) * r + i}" for i in range(1, r + 1)
        )
        return f"md5({rows})"

    return " OR ".join(
        f"{key('a.', i)} = {key('b.', i)}" for i in range(1, _N_HASHES // r + 1)
    )


# --- SimHash -----------------------------------------------------------
#
# 64-bit SimHash from whitespace tokens: every token occurrence votes
# +1/-1 on each signature bit; bit b of the token hash is derived from
# md5 hex digit parity (digits 1..32 give the low bit, the same digits'
# second bit gives positions 33..64), so Spark and DuckDB compute
# bit-identical signatures with only instr/substr/% — no engine-specific
# hash. The signature is materialized as four 16-bit integer blocks:
# near-dup candidates must agree on >=1 whole block (guarantees recall
# for hamming distance <= 3 by pigeonhole), then exact hamming distance
# over bit_count(xor) verifies. Same LSH shuffle shape as MinHash above:
# explode (band, key), equi-join on the band key.
#
# At 100 TB: the vote aggregation is one groupBy(doc_id) with map-side
# partials (64 int sums); the candidate join shuffles (band, key,
# doc_id) only; 16-bit blocks keep buckets sparse (65k buckets/band).

_SIMHASH_BITS = 64
_SIMHASH_BLOCKS = 4
_BITS_PER_BLOCK = _SIMHASH_BITS // _SIMHASH_BLOCKS
_HAMMING_THRESHOLD = 3
_HEX = "0123456789abcdef"


def _simhash_vote_expr(b: int) -> str:
    """SQL text for the +-1 vote of signature bit b (1-based), given a
    column `h` holding md5(token). Valid in both Spark SQL and DuckDB
    modulo integer division spelling (handled by caller)."""
    digit = f"(instr('{_HEX}', substring(h, {((b - 1) % 32) + 1}, 1)) - 1)"
    if b <= 32:
        bit = f"({digit} % 2)"
    else:
        bit = f"(({digit} {{div}} 2) % 2)"
    return f"2 * {bit} - 1"


def _simhash_blocks_df(docs: DataFrame) -> DataFrame:
    """Per-doc SimHash as _SIMHASH_BLOCKS 16-bit integer block columns.

    Two-level formulation: the 64 hash bits are computed once per
    DISTINCT token (the vocabulary relation — Zipf makes it orders of
    magnitude smaller than the occurrence stream), then joined back to
    per-(doc, token) counts so the per-doc vote is sum(cnt * ±1) — cheap
    integer arithmetic on the big relation, expensive string hashing
    only on the tiny one. Classic dedup-before-expensive-map: at 100 TB
    the occurrence stream never touches md5. The vocab side broadcasts
    while it fits; Catalyst falls back to a shuffle join on `w` for
    open-vocabulary corpora.
    """
    # one spark.sql() call instead of a chain of wide Dataset ops: each
    # DataFrame transformation is eagerly analyzed, and re-analyzing
    # 64-column trees per step costs ~2s of driver time — a single SQL
    # parse+analysis pass is ~10x cheaper for this expression count.
    # The staging view gets a UNIQUE name and is dropped right after
    # sql() resolves it (analysis is eager; execution no longer needs
    # the catalog entry) — a fixed name would race concurrent callers
    # on the shared session and leak into the catalog.
    #
    # The per-(doc, token) count relation is built ONCE with DataFrame
    # ops and persisted: both SQL branches below consume it (the
    # vocabulary distinct AND the vote join), and Spark inlines CTEs —
    # a `tok` CTE referenced twice would tokenize the whole corpus
    # twice (this was round 2's plan; cutting the second explode+scan
    # is most of the SimHash-family wall time). The repartition hits
    # the RAW rows before the explode so the single-split source
    # parallelizes.
    import uuid as _uuid

    counts = (
        docs.transform(spread, "doc_id")
        .select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .persist()
    )
    view = f"_simhash_counts_{_uuid.uuid4().hex}"
    counts.createOrReplaceTempView(view)
    vote_cols = ", ".join(
        f"{_simhash_vote_expr(b).format(div='div')} AS t{b}"
        for b in range(1, _SIMHASH_BITS + 1)
    )
    vote_sums = ", ".join(
        f"sum(t{b} * cnt) AS v{b}" for b in range(1, _SIMHASH_BITS + 1)
    )
    block_cols = ", ".join(
        "("
        + " + ".join(
            f"(CASE WHEN v{(k - 1) * _BITS_PER_BLOCK + r + 1} >= 0 THEN 1 ELSE 0 END) * {1 << (_BITS_PER_BLOCK - 1 - r)}"
            for r in range(_BITS_PER_BLOCK)
        )
        + f") AS blk{k}"
        for k in range(1, _SIMHASH_BLOCKS + 1)
    )
    try:
        # persist the (tiny: 4 smallints/doc) signature relation too:
        # cache-manager plan matching makes every SimHash consumer in
        # the session (docs_simhash, pair LSH, cluster labeling) share
        # one vote computation instead of re-running it per query
        return docs.sparkSession.sql(f"""
        WITH vocab_votes AS (
            SELECT w, {vote_cols}
            FROM (SELECT w, md5(w) AS h FROM (SELECT DISTINCT w FROM {view}))
        ),
        votes AS (
            SELECT /*+ BROADCAST(vocab_votes) */ doc_id, {vote_sums}
            FROM {view} JOIN vocab_votes USING (w)
            GROUP BY doc_id
        )
        SELECT doc_id, {block_cols} FROM votes
        """).persist()
    finally:
        docs.sparkSession.catalog.dropTempView(view)


def docs_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash signature per document, as four 16-bit blocks plus
    the combined hex form (a string: blk1*2^48 would overflow signed
    int64 for high-bit-set signatures). Block columns double as the LSH
    band keys."""
    blocks = _simhash_blocks_df(load(spark, sf_dir, "documents"))
    combined = F.concat(
        *[
            F.format_string("%04x", F.col(f"blk{k}"))
            for k in range(1, _SIMHASH_BLOCKS + 1)
        ]
    )
    return blocks.select(
        "doc_id",
        *[F.col(f"blk{k}") for k in range(1, _SIMHASH_BLOCKS + 1)],
        combined.alias("simhash"),
    )


def simhash_block_pairs(
    blocks: DataFrame,
    id_col: str = "doc_id",
    hamming_threshold: int = _HAMMING_THRESHOLD,
) -> DataFrame:
    """Block-LSH near-dup pairs over ANY 4x16-bit signature relation
    (`id_col`, blk1..blk4) — the shared kernel behind text SimHash and
    the multimodal perceptual-hash near-dup. One band-key shuffle join,
    hamming computed INLINE from the block columns each band row
    carries (4 smallints — cheaper than a pair-distinct plus two
    rejoins of the signature relation), then one group-by to collapse
    multi-band agreements. Block agreement guarantees recall for
    hamming <= 3 by pigeonhole (4 blocks, 64 bits)."""
    bands = blocks.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(k).alias("band"), F.col(f"blk{k}").alias("k"))
                    for k in range(1, _SIMHASH_BLOCKS + 1)
                ]
            )
        ).alias("bk"),
        *[F.col(f"blk{k}") for k in range(1, _SIMHASH_BLOCKS + 1)],
    ).select(
        F.col(id_col),
        F.col("bk.band").alias("band"),
        F.col("bk.k").alias("k"),
        *[F.col(f"blk{k}") for k in range(1, _SIMHASH_BLOCKS + 1)],
    )
    a, b = bands.alias("a"), bands.alias("b")
    hamming = sum(
        F.bit_count(
            F.col(f"a.blk{k}").bitwiseXOR(F.col(f"b.blk{k}")).cast("bigint")
        )
        for k in range(1, _SIMHASH_BLOCKS + 1)
    )
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.k") == F.col("b.k"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            hamming.cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= hamming_threshold)
        # a pair agreeing on several blocks appears once per block; the
        # hamming value is identical on every copy
        .groupBy("doc_a", "doc_b")
        .agg(F.first("hamming").alias("hamming"))
    )


def _simhash_pairs_df(docs: DataFrame) -> DataFrame:
    # Persisted (r4): four session consumers fan out of this relation
    # (docs_simhash_pairs, docs_simhash_dedup, the CC family's
    # checkpoint build, docs_dedup_method_agreement) — without the
    # cache each re-ran the band join + hamming verify on top of the
    # persisted signature blocks, which r3's bench measured as the
    # dominant cost of the method-agreement audit (7.25 s). The
    # relation is pair-set sized, so the double-materialization under
    # the CC localCheckpoint costs KBs of storage for a whole candidate
    # pipeline saved per consumer.
    return simhash_block_pairs(_simhash_blocks_df(docs)).persist()


def docs_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: block-LSH candidates verified by exact
    hamming distance <= threshold."""
    return _simhash_pairs_df(load(spark, sf_dir, "documents"))


def docs_simhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup removal by SimHash: drop doc_b of every verified pair
    (keep-lowest-doc_id policy, same as the MinHash variant)."""
    docs = load(spark, sf_dir, "documents")
    losers = (
        _simhash_pairs_df(docs)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    return docs.join(losers, "doc_id", "left_anti").select(
        "doc_id", "lang", "source", "n_chars"
    )


def docs_dedup_method_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-method dedup audit: how much do the MinHash-verified
    (shingle-Jaccard >= threshold) and SimHash (hamming <= threshold)
    near-dup pair sets agree? The methodology sanity check a corpus
    team runs before trusting either family's drop list — reported as
    exact pair-set sizes plus their Jaccard overlap (one division of
    exact int64 counts, engine-identical). Both pair relations are the
    SAME kernels the dedup queries use (and both sides' oracles reuse
    those kernels' SQL verbatim), so this audit can never drift from
    the operators it audits. Cost: the two candidate pipelines plus a
    pair-key join of two tiny pair sets.

    Bench attribution: this query sorts alphabetically before its
    siblings (docs_minhash_* / docs_simhash_* / docs_ngram_*), so in a
    full bench pass IT pays the one-time build of both persisted pair
    pipelines that the siblings then reuse from cache — its per-query
    wall-clock is the family's shared build, not this audit's own
    cost. Measured at sf0.1: ~0.9 s with the pair relations already
    cached vs ~6 s as first consumer."""
    docs = load(spark, sf_dir, "documents")
    mh = (
        _verified_pairs(docs)
        .filter(F.col("jaccard") >= _JACCARD_THRESHOLD)
        .select("doc_a", "doc_b")
    )
    sh = _simhash_pairs_df(docs).select("doc_a", "doc_b")
    n_mh = mh.agg(F.count(F.lit(1)).alias("n_minhash"))
    n_sh = sh.agg(F.count(F.lit(1)).alias("n_simhash"))
    n_both = mh.join(sh, ["doc_a", "doc_b"]).agg(
        F.count(F.lit(1)).alias("n_both")
    )
    return (
        n_mh.crossJoin(n_sh)
        .crossJoin(n_both)
        .select(
            "n_minhash",
            "n_simhash",
            "n_both",
            # nullif guard: with BOTH pair sets empty the union size is
            # 0 and 0/0 diverges across engines (Spark non-ANSI NULL vs
            # DuckDB IEEE nan) — both sides now agree on NULL
            (
                F.col("n_both")
                / F.nullif(
                    F.col("n_minhash") + F.col("n_simhash") - F.col("n_both"),
                    F.lit(0),
                )
            ).alias("pair_set_jaccard"),
        )
    )


def _cc_union_find_pdf(pdf):
    """Path-compressed, min-rooted union-find over one pandas batch of
    edges. Roots are always the minimum doc_id of their component
    (np.unique sorts ids, and union always attaches the larger-index
    root under the smaller), so labels match the distributed min-label
    fixpoint bit-for-bit — pinned by test_cc_paths_bit_equal."""
    import numpy as np
    import pandas as pd

    a = pdf["doc_a"].to_numpy()
    b = pdf["doc_b"].to_numpy()
    ids, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    parent = np.arange(len(ids))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    n = len(a)
    for x, y in zip(inv[:n], inv[n:]):
        rx, ry = find(x), find(y)
        if rx != ry:
            if rx < ry:
                parent[ry] = rx
            else:
                parent[rx] = ry
    roots = np.array([find(i) for i in range(len(ids))], dtype=np.int64)
    return pd.DataFrame({"doc_id": ids, "cluster_id": ids[roots]})


# Above this many near-dup edges the dup graph stops being a single
# task's problem: 2M (doc_a, doc_b) int64 pairs is ~32 MB on the wire
# and the union-find loop stays in the low seconds — far below executor
# memory and far above any sf we test, while a 100 TB corpus (billions
# of edges) routes to the distributed doubling loop.
_CC_SINGLE_TASK_EDGE_CAP = 2_000_000
_CC_CHECK_EVERY = 2  # distributed rounds per convergence action


def _cc_labels_single_task(pairs: DataFrame) -> DataFrame:
    """Connected components for SUBCRITICAL dup graphs: route every
    edge to ONE executor task (groupBy on a constant) and run
    union-find there. One shuffle + one Arrow batch instead of
    O(rounds) join stages — the per-round job-scheduling overhead of
    the iterative path dominated wall time on sparse graphs (r3 bench:
    the CC family was ~10% of the whole suite). Executor-side, never a
    driver collect; only used below _CC_SINGLE_TASK_EDGE_CAP."""
    return pairs.groupBy(F.lit(1).alias("_g")).applyInPandas(
        lambda pdf: _cc_union_find_pdf(pdf), "doc_id long, cluster_id long"
    )


def _cc_labels_distributed(
    spark: SparkSession, pairs: DataFrame, n_pairs: int
) -> DataFrame:
    """Pregel-style min-label propagation with pointer doubling — the
    100 TB path for dup graphs too large for a single task.

    Size the iteration's shuffles to the SUBGRAPH, not the corpus: the
    label loop operates only on vertices in a near-dup pair — orders of
    magnitude smaller than the corpus (~100k edges per partition keeps
    tasks meaty; defaultParallelism caps the width). Width is applied
    PER-PLAN — explicit repartition(loop_width, key) on each relation
    the loop materializes (edges on the join key, labels on doc_id) —
    never by mutating session shuffle-width conf, which would leak loop
    width into any query running concurrently in the same session (the
    norm on a shared 100 TB cluster). Intra-batch join shuffles inherit
    the session width and are coalesced at runtime by AQE
    (coalescePartitions is pinned on in session.py), so tiny label
    relations never fan out to corpus-sized shuffle widths.

    Each round runs TWO (min-step, pointer-shortcut) passes, so labels
    travel ~4 hops per round (measured 6 -> 3 rounds at sf0.1).
    Convergence protocol (r4): rounds run in batches of _CC_CHECK_EVERY
    with NO per-round action — a batch's rounds nest into one lazy plan
    (bounded: <= 8 joins) that a single eager localCheckpoint
    materializes, then ONE limit(1).count() checks stability over the
    whole batch. Labels only ever decrease, so "unchanged across the
    batch" == fixpoint; this halves Spark jobs per round vs checking
    every round, and per-round fixed cost (job scheduling + checkpoint)
    is what dominates on sparse graphs. The round cap is a safety
    valve; a silent cap would return WRONG labels on longer chains —
    fail loud."""
    sc = spark.sparkContext
    loop_width = max(1, min(sc.defaultParallelism, 2 * n_pairs // 100_000 + 1))
    converged = False
    edges = (
        pairs.union(
            pairs.select(
                F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
            )
        )
        # Partition the materialized edge relation on the loop's join
        # key (doc_b) at loop width — every min-step joins edges on
        # doc_b, so the checkpointed layout is already join-shaped.
        .repartition(loop_width, "doc_b")
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("doc_a").alias("doc_id"))
        .distinct()
        .select("doc_id", F.col("doc_id").alias("cluster_id"))
        .repartition(loop_width, "doc_id")
        .localCheckpoint()
    )
    rounds = 0
    while rounds < _CC_MAX_ROUNDS:
        batch = min(_CC_CHECK_EVERY, _CC_MAX_ROUNDS - rounds)
        cur = labels.withColumn("old", F.col("cluster_id"))
        for _round_in_batch in range(batch):
            for _step in range(2):
                lab = cur.select(
                    F.col("doc_id").alias("l_id"),
                    F.col("cluster_id").alias("l_lab"),
                )
                nbr = (
                    edges.join(lab, edges.doc_b == F.col("l_id"))
                    .groupBy("doc_a")
                    .agg(F.min("l_lab").alias("nbr_min"))
                )
                cur = cur.join(nbr, cur.doc_id == nbr.doc_a, "left").select(
                    "doc_id",
                    "old",
                    F.least(
                        F.col("cluster_id"),
                        F.coalesce("nbr_min", F.col("cluster_id")),
                    ).alias("cluster_id"),
                )
                ptr = cur.select(
                    F.col("doc_id").alias("p_id"),
                    F.col("cluster_id").alias("p_lab"),
                )
                cur = cur.join(ptr, cur.cluster_id == ptr.p_id).select(
                    "doc_id",
                    "old",
                    F.least("cluster_id", "p_lab").alias("cluster_id"),
                )
        rounds += batch
        new_labels = (
            cur.select(
                "doc_id",
                "cluster_id",
                (F.col("cluster_id") < F.col("old")).alias("improved"),
            )
            .repartition(loop_width, "doc_id")
            .localCheckpoint()
        )
        labels = new_labels.drop("improved")
        if new_labels.filter("improved").limit(1).count() == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"dup-cluster min-label propagation did not converge within "
            f"{_CC_MAX_ROUNDS} rounds — a near-dup component has diameter "
            f"> {_CC_MAX_ROUNDS}; raise _CC_MAX_ROUNDS (wrong labels must "
            "never be returned silently)"
        )
    return labels


def _cc_labels(spark: SparkSession, pairs: DataFrame) -> DataFrame:
    """Scale-adaptive connected components over a checkpointed pair
    relation. The edge count is already materialized, so reading it
    costs one cheap action; subcritical graphs take the one-job
    union-find, larger ones the diameter-bounded doubling loop. Both
    produce identical labels (test_cc_paths_bit_equal)."""
    n_pairs = pairs.count()
    if n_pairs <= _CC_SINGLE_TASK_EDGE_CAP:
        return _cc_labels_single_task(pairs)
    return _cc_labels_distributed(spark, pairs, n_pairs)


def docs_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster assignment: connected components over the
    verified SimHash near-dup pairs, labeling every involved document
    with the smallest doc_id reachable from it (the cluster canonical).

    Pairwise dedup (docs_simhash_dedup) drops doc_b of each pair, which
    over-deletes on chains (a~b, b~c but a!~c). Cluster-based dedup
    keeps exactly one doc per component — the standard corpus-dedup
    refinement. Component labeling is scale-adaptive (see _cc_labels):
    a single-task union-find below _CC_SINGLE_TASK_EDGE_CAP edges,
    Pregel-style min-label propagation with pointer doubling above it.
    The DuckDB oracle computes the same closure with WITH RECURSIVE —
    an iterative Spark algorithm still fully value-checked.
    """
    docs = load(spark, sf_dir, "documents")
    return dup_clusters_from(spark, _simhash_pairs_df(docs))


def dup_clusters_from(spark: SparkSession, pairs: DataFrame) -> DataFrame:
    """Cluster labels + sizes over a prepared (doc_a, doc_b) near-dup
    pair relation — docs_dup_clusters' exact relation, factored (r11)
    so streaming.neardup.NearDupClusterLedger decides cluster
    membership at READ time over its maintained signature relation
    with the IDENTICAL plan: one late-arriving document can merge two
    clusters, so labels are a global decision (the ST17/ST18 pattern),
    and the streaming surface is bit-equal to batch by construction."""
    # localCheckpoint (not persist): the pair relation feeds both the
    # edge-count action and the label computation — materialize it once
    # and CUT lineage so neither re-runs the SimHash candidate plan.
    pairs = pairs.select("doc_a", "doc_b").localCheckpoint()
    labels = _cc_labels(spark, pairs)
    w = Window.partitionBy("cluster_id")
    return labels.select(
        "doc_id", "cluster_id", F.count(F.lit(1)).over(w).alias("cluster_size")
    )


def docs_cluster_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-canonical near-dup removal: keep exactly ONE document per
    connected component of the verified SimHash near-dup graph (the
    component's min doc_id — its cluster_id), plus every document in no
    component at all.

    This is the consistent one-per-cluster policy docs_simhash_dedup
    approximates: pairwise keep-lowest drops doc_b of every pair, which
    keeps every LOCAL-minimum doc — a component can retain several
    members (each smaller than all its direct neighbors) even though
    they are transitively near-dups. Here the anti-join key is "member
    of a component but not its canonical", so each component keeps
    exactly one doc (cluster survivors are a strict subset of the
    pairwise survivors — pinned in tests/test_dedup.py). Cost on
    top of docs_dup_clusters is one anti-join of the corpus against the
    (tiny) non-canonical member set — the component labeling dominates
    and is diameter-bounded (see docs_dup_clusters).
    """
    docs = load(spark, sf_dir, "documents")
    return cluster_survivors_from(
        spark, docs, _simhash_pairs_df(docs)
    )


def cluster_survivors_from(
    spark: SparkSession, docs: DataFrame, pairs: DataFrame
) -> DataFrame:
    """docs_cluster_dedup's exact relation over prepared inputs (r11
    factoring — see dup_clusters_from): keep the component canonical +
    every unpaired document."""
    losers = (
        dup_clusters_from(spark, pairs)
        .filter(F.col("doc_id") != F.col("cluster_id"))
        .select("doc_id")
    )
    return docs.join(losers, "doc_id", "left_anti").select(
        "doc_id", "lang", "source", "n_chars"
    )


def docs_softdedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-aware SOFT reweighting (r11) — the third dedup policy
    beside pairwise drop (docs_simhash_dedup) and cluster-canonical
    drop (docs_cluster_dedup): keep EVERY document, but give each
    near-dup cluster exactly one document-equivalent of sampling mass,
    w = 1 / |cluster| (singletons keep w = 1). Hard removal throws
    away the phrasing diversity inside a cluster; soft reweighting
    keeps it while still flattening the duplicated content's gradient
    contribution — the SoftDeDup idea (He et al. 2024, "SoftDedup: an
    Efficient Data Reweighting Method for Speeding Up Language Model
    Pre-training", public literature), realized over the SAME verified
    SimHash near-dup components the hard policies act on
    (docs_dup_clusters VERBATIM — the three policies can never
    disagree about what a duplicate is). The emitted relation is what
    a weighted sampler (docs_weighted_sample's shape) consumes in
    place of a drop list.

    Invariant (pinned in tests/test_dedup.py): sum(weight) = number of
    clusters + number of singletons — the effective corpus size under
    soft dedup equals the surviving count under cluster-canonical hard
    dedup.

    Determinism: cluster labels are min-reachable-doc_id (exact),
    sizes exact int64; weight is ONE 1.0/int64 IEEE division —
    bit-identical, no rounding.

    Scale: the component labeling is the cost (diameter-bounded
    doubling above the single-task cap — see _cc_labels); the weight
    relation adds one doc_id-key LEFT join of the narrow corpus
    projection onto the (small) labeled-member set and a per-row
    division. No new shuffle class; the cluster relation is
    pair-bounded, never corpus-quadratic.

    Reference parity: the reference has no dedup surface at all
    (SURVEY.md §2.12 extension family); public-literature anchor only.
    """
    docs = load(spark, sf_dir, "documents")
    return softdedup_weights_from(spark, docs, _simhash_pairs_df(docs))


def docs_softdedup_effective_mass(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Soft-dedup weights USED as the sampler input (r11 — the
    composition docs_softdedup_weights' docstring promises): per
    language, the RAW token mass beside the EFFECTIVE
    (duplicate-discounted) mass Σ tokens·weight, their corpus shares,
    and the share shift. Duplication is never uniform across
    languages, so a mixture designed on raw counts over-allocates the
    most-duplicated language; this is the one-page audit showing how
    far — the relation a soft-dedup pipeline feeds into the
    temperature mix in place of raw counts.

    Reuses docs_softdedup_weights VERBATIM (the weights cannot drift
    from the policy) and the token-count projection of the mixture
    family (filtered whitespace split).

    Determinism: raw counts exact int64, raw_share one int64/int64
    division; each doc's nt/cluster_size term is bit-identical
    (int64/int64), and the per-language sum crosses a round-THREE
    decimal hop — at 1e6-token language mass the partial-sum-order
    error (~n·eps·mass ≈ 1e-6) sits right at a 6-decimal quantum, so
    the wash uses the coarser grid with a 1000x margin; eff_tot is the
    30-value sum of those hopped masses re-hopped, and eff_share is
    then a division of bit-identical doubles (no further rounding
    needed). NULL-text docs carry NULL token counts and drop from both
    masses identically on both engines.

    Scale: the cluster labeling is the cost already paid by the
    weights relation; this adds one doc_id join of the narrow token
    projection, a languages-sized rollup, and a 1-row total broadcast.
    """
    docs = load(spark, sf_dir, "documents")
    w = docs_softdedup_weights(spark, sf_dir).select(
        "doc_id", "lang", "cluster_size"
    )
    nt = docs.select(
        "doc_id",
        F.size(F.expr("filter(split(text, ' '), x -> x != '')"))
        .cast("bigint")
        .alias("nt"),
    )
    hop3 = lambda c: (  # noqa: E731 — the round-3 decimal hop
        F.round(c, 3).cast("decimal(38,3)").cast("double")
    )
    per = (
        w.join(nt, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum((F.col("cluster_size") > 1).cast("int"))
            .cast("bigint")
            .alias("n_dup_docs"),
            F.sum("nt").cast("bigint").alias("raw_tokens"),
            hop3(
                F.sum(
                    F.col("nt").cast("double")
                    / F.col("cluster_size").cast("double")
                )
            ).alias("eff_tokens"),
        )
    )
    tot = per.agg(
        F.sum("raw_tokens").cast("bigint").alias("raw_tot"),
        hop3(F.sum("eff_tokens")).alias("eff_tot"),
    )
    raw_share = F.col("raw_tokens") / F.col("raw_tot").cast("double")
    eff_share = F.col("eff_tokens") / F.col("eff_tot")
    return per.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        "n_dup_docs",
        "raw_tokens",
        "eff_tokens",
        raw_share.alias("raw_share"),
        eff_share.alias("eff_share"),
        (raw_share - eff_share).alias("share_shift"),
    )


def softdedup_weights_from(
    spark: SparkSession, docs: DataFrame, pairs: DataFrame
) -> DataFrame:
    """docs_softdedup_weights' exact relation over prepared inputs (r11
    factoring — see dup_clusters_from): the weight join on top of the
    shared cluster labeling."""
    clusters = dup_clusters_from(spark, pairs)
    size = F.coalesce(F.col("cluster_size"), F.lit(1)).cast("bigint")
    return (
        docs.select("doc_id", "lang", "source")
        .join(clusters, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            "source",
            F.coalesce(F.col("cluster_id"), F.col("doc_id"))
            .cast("bigint")
            .alias("cluster_id"),
            size.alias("cluster_size"),
            (F.lit(1.0) / size.cast("double")).alias("weight"),
        )
    )


_SPAN_K = 20  # char width of the duplicated-substring probe grams
_SPAN_DUP_MAX = 0.8  # span-filter ceiling on the duplicated-char fraction


def _dup_spans(docs: DataFrame) -> DataFrame:
    """Merged cross-document duplicated spans (doc_id, n_chars,
    span_id, s, e) — the
    substring-level dedup signal of Lee et al., "Deduplicating Training
    Data Makes Language Models Better" (public literature), re-expressed
    relationally: their suffix-array scan finds substrings of length
    >= K occurring twice in the corpus; a position-addressed K-gram
    that occurs in >= 2 documents marks exactly the same spans, so the
    gram relation IS the match list, no suffix array needed.

    Shape: (1) a narrow positional K-gram explode; (2) ONE gram-content
    shuffle — a partitionBy(g) window computing min/max doc_id marks
    multi-document grams in the same pass that keeps their positions
    (">= 2 distinct docs" == min != max; measured ~2x vs the
    aggregate-then-semi-join formulation, which shuffled the gram
    stream twice and re-ran the explode for each consumer); (3) per-doc
    islands-and-gaps span merge — one doc_id-partitioned window merging
    overlapping/adjacent [i, i+K-1] intervals; (4) one doc_id rollup.
    Nothing is quadratic: cost scales with corpus chars + the
    duplicated-position subset. At 100 TB the gram shuffle is the big
    one — identical key shape (and AQE skew posture) to the MinHash
    shingle signature pass above.

    Char-addressed on BOTH engines (substring on string / substr on
    VARCHAR) — Unicode-safe like docs_winnowing post-r4."""
    n_grams = F.length("text") - (_SPAN_K - 1)
    grams = (
        docs.filter(n_grams >= 1)
        .transform(spread, "doc_id")
        .select(
            "doc_id",
            "n_chars",
            F.explode(F.sequence(F.lit(1), n_grams)).alias("i"),
            "text",
        )
        .select(
            "doc_id",
            "n_chars",
            "i",
            F.substring(F.col("text"), F.col("i"), _SPAN_K).alias("g"),
        )
    )
    wg = Window.partitionBy("g")
    hits = (
        grams.withColumn("d0", F.min("doc_id").over(wg))
        .withColumn("d1", F.max("doc_id").over(wg))
        .filter(F.col("d0") != F.col("d1"))
        .select("doc_id", "n_chars", "i")
    )
    w = Window.partitionBy("doc_id").orderBy("i")
    spans = (
        hits.withColumn("prev_i", F.lag("i").over(w))
        # break when this gram's interval [i, i+K-1] neither overlaps
        # nor touches the previous one's
        .withColumn(
            "brk",
            F.when(
                F.col("prev_i").isNull()
                | (F.col("i") > F.col("prev_i") + _SPAN_K),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "span_id",
            F.sum("brk").over(
                Window.partitionBy("doc_id")
                .orderBy("i")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("doc_id", "n_chars", "span_id")
        .agg(
            F.min("i").alias("s"),
            (F.max("i") + F.lit(_SPAN_K - 1)).alias("e"),
        )
        # persisted: the merged-span relation is span-count sized
        # (tiny) but costs the gram shuffle + window to build, and
        # THREE consumers (audit, filter, strip) share it via
        # cache-manager plan matching, same pattern as _verified_pairs
        .persist()
    )
    return spans


def _dup_span_stats(docs: DataFrame) -> DataFrame:
    """Per-doc rollup of the merged dup-span relation."""
    return _dup_spans(docs).groupBy("doc_id", "n_chars").agg(
        F.count(F.lit(1)).alias("n_dup_spans"),
        F.sum(F.col("e") - F.col("s") + 1).alias("dup_chars"),
    )


def docs_suffix_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated spans per document (see
    _dup_span_stats): how many maximal regions of each doc also occur
    verbatim elsewhere in the corpus, and what fraction of the doc they
    cover — the audit a substring-level dedup pass is driven by."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")
    return _dup_span_stats(docs).select(
        "doc_id",
        "n_dup_spans",
        "dup_chars",
        F.round(
            F.col("dup_chars") / F.col("n_chars").cast("double"), 6
        ).alias("dup_frac"),
    )


def docs_dup_span_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-dedup hygiene pass: drop documents whose cross-doc
    duplicated-span coverage exceeds _SPAN_DUP_MAX (mostly-copied
    documents), keep everything else — the filter Lee et al. apply
    after the span scan. One anti-join of the corpus against the
    (tiny) over-duplicated doc set; the span kernel dominates and is
    shared with docs_suffix_dup_spans via its plan shape.

    Bench attribution: alphabetically first of the span family
    (docs_dup_span_filter < docs_strip_dup_spans <
    docs_suffix_dup_spans), so in a full bench pass IT pays the
    one-time _dup_spans build the siblings then read from cache —
    its per-query wall-clock is the family's shared gram shuffle,
    not the anti-join."""
    docs = load(spark, sf_dir, "documents")
    heavy = (
        _dup_span_stats(docs.select("doc_id", "text", "n_chars"))
        .filter(
            F.col("dup_chars") / F.col("n_chars").cast("double")
            > _SPAN_DUP_MAX
        )
        .select("doc_id")
    )
    return docs.join(heavy, "doc_id", "left_anti").select(
        "doc_id", "lang", "source", "n_chars"
    )


def docs_strip_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The substring-dedup TRANSFORMATION itself (Lee et al.'s actual
    output): rewrite every document with its cross-document duplicated
    spans removed, keeping only corpus-unique content; emit the kept
    text's md5 plus before/after sizes so the rewrite is fully
    hash-audited without shipping full text through the result.

    The complement-interval assembly runs entirely in JVM higher-order
    expressions: per doc, the sorted merged spans become K+1 kept
    segments ([1, s1-1], [e_k+1, s_{k+1}-1], ..., [e_K+1, n]) via one
    transform over the collected span array, concatenated in order —
    no Python, no explode, one span-relation aggregation + one
    doc-keyed join against the corpus (docs without dup spans pass
    through untouched via the left join). The span kernel itself is
    the shared persisted relation (see _dup_spans)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")
    sp = (
        _dup_spans(docs)
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("s", "e"))).alias("sp"))
    )
    kept = F.expr(
        """
        concat_ws('', transform(
            sequence(0, size(sp)),
            k -> substring(
                text,
                CAST(IF(k = 0, 1, sp[k - 1].e + 1) AS INT),
                CAST(GREATEST(
                    IF(k = size(sp), n_chars, sp[k].s - 1)
                    - IF(k = 0, 1, sp[k - 1].e + 1) + 1,
                    0) AS INT)
            )
        ))
        """
    )
    return (
        docs.join(sp, "doc_id", "left")
        .select(
            "doc_id",
            "n_chars",
            # explicit NULL-array guard: concat_ws never returns NULL,
            # so a bare coalesce around the transform would turn
            # span-free docs into empty strings instead of passthrough
            F.when(F.col("sp").isNull(), F.col("text"))
            .otherwise(kept)
            .alias("kept_text"),
        )
        .select(
            "doc_id",
            "n_chars",
            F.length("kept_text").cast("bigint").alias("kept_chars"),
            F.md5("kept_text").alias("kept_md5"),
        )
    )


_QDI_BINS = 10  # fixed-width quality bins, the docs_quality_psi_drift grid


def docs_quality_dup_interaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality x duplication interaction — the measured correlation a
    pipeline checks before ordering its stages (low-quality strata
    usually duplicate more, which is why the cheap quality gate runs
    BEFORE the dedup shuffle; this query replaces that folklore with
    numbers for THIS corpus): per fixed-width quality bin, document
    count, exact-duplicate membership count (docs whose normalized-text
    fingerprint appears more than once), the would-be-dropped count
    (non-canonical copies), and both rates.

    Reuses text.py's _quality_parts and this module's _fingerprint
    VERBATIM (the same score docs_quality_score reports and the same
    fingerprint docs_exact_dedup drops on — zero drift from the stages
    it audits). Fixed-width bins, not quantiles: the bin is a pure
    per-row projection (the docs_quality_psi_drift convention), so the
    plan has no sort — one fingerprint-key aggregation joined back on
    the same key (co-partitioned), then a 10-row rollup. avg_quality
    crosses the decimal hop (partial-sum order); the rates are exact
    int/int divisions.
    """
    from .text import _quality_parts

    len_score, uniq_ratio = _quality_parts()
    quality = len_score * 0.5 + uniq_ratio * 0.5
    # NULL-text routing (r8 advice): least() skips NULLs on both
    # engines, so a NULL-q doc would otherwise land in the TOP bin and
    # every NULL fingerprint would share one dup group. NULL-text docs
    # get the dedicated bin -1 (avg_quality NULL there — sum over all
    # NULLs on both engines) and are excluded from the dup-group
    # aggregation (left join; flags coalesce to 0: a NULL text is not
    # an exact duplicate of another NULL text).
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        quality.alias("q"),
        _fingerprint().alias("fp"),
        F.when(F.col("text").isNull(), F.lit(-1))
        .otherwise(
            F.least(
                F.floor(quality * _QDI_BINS).cast("int"),
                F.lit(_QDI_BINS - 1),
            )
        )
        .alias("bin"),
    )
    grp = (
        d.filter(F.col("fp").isNotNull())
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_fp"), F.min("doc_id").alias("keeper")
        )
    )
    is_dup = F.coalesce((F.col("n_fp") > 1).cast("int"), F.lit(0))
    is_loser = F.coalesce(
        ((F.col("n_fp") > 1) & (F.col("doc_id") != F.col("keeper"))).cast(
            "int"
        ),
        F.lit(0),
    )
    return (
        d.join(grp, "fp", "left")
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(F.sum("q") / F.count(F.lit(1)).cast("double"), 6)
            .cast("decimal(38,6)")
            .cast("double")
            .alias("avg_quality"),
            F.sum(is_dup).cast("bigint").alias("n_dup_docs"),
            F.sum(is_loser).cast("bigint").alias("n_dup_losers"),
        )
        .select(
            "bin",
            "n_docs",
            "avg_quality",
            "n_dup_docs",
            "n_dup_losers",
            (F.col("n_dup_docs") / F.col("n_docs").cast("double")).alias(
                "dup_rate"
            ),
            (F.col("n_dup_losers") / F.col("n_docs").cast("double")).alias(
                "loser_rate"
            ),
        )
    )


def docs_c4_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4's corpus-wide exact line dedup (Raffel et al. 2020 §2.2 —
    the paper deduplicates three-sentence spans; at this corpus's
    synthetic line grain the unit is the _C4_LINE_WORDS-word line,
    imported VERBATIM from text.py's C4 kernel so the dedup and the
    rule gate can never disagree about what a line is): every line
    that occurs more than once in the corpus keeps only its FIRST
    occurrence (lexicographic min (doc_id, line_no) — doc-id order is
    arrival order, the docs_gram_novelty convention), including
    intra-document repeats; every document is rewritten from its
    surviving lines in order. Emits per doc the line counts plus the
    kept text's length and md5, the docs_strip_dup_spans hash-audit
    convention (the rewrite is fully checked without shipping text).

    Shape: ONE line-key aggregation — min(struct(doc_id, line_no,
    line)), map-side combinable, so a boilerplate line duplicated
    across millions of pages partial-aggregates to one row per map
    task instead of skewing a single reducer (the reason this is NOT a
    row_number window over the line key) — whose output IS the kept
    relation (the keeper tuple of every distinct line; no join back,
    the r8 rework: the first formulation re-joined the line relation
    on line to filter to keepers, a second full-relation shuffle that
    carried no information the min-struct didn't already have), then a
    doc-grain rollup (sort the surviving (line_no, line) structs, join
    words back with single spaces) and a left join against the doc
    list so dedup-untouched and fully-deduped docs both appear.
    Nothing is quadratic; the line relation is ~n_words/_C4_LINE_WORDS
    rows, smaller than the token explode every token query already
    pays.
    """
    from .text import _C4_LINES_EXPR

    docs = load(spark, sf_dir, "documents")
    lined = docs.select(
        "doc_id",
        F.expr("filter(split(text, ' '), x -> x != '')").alias("ws"),
    ).select("doc_id", F.expr(_C4_LINES_EXPR).alias("lines"))
    return c4_line_dedup_from(
        lined.select("doc_id", F.size("lines").alias("n_lines")),
        c4_lines_of(lined),
    )


def c4_lines_of(lined: DataFrame) -> DataFrame:
    """(doc_id, lines-array) -> the (doc_id, line_no, line) relation —
    the C4 line grain, shared by the batch dedup and streaming/lines.py
    so the two can never disagree about what a line is."""
    return lined.select(
        "doc_id", F.posexplode("lines").alias("line_no", "lw")
    ).select("doc_id", "line_no", F.array_join("lw", " ").alias("line"))


def c4_kept_lines(ln: DataFrame) -> DataFrame:
    """Keep-first keeper tuple of every distinct line — the min-struct
    core of c4_line_dedup_from, exposed so the composed ingest chain
    (text.ingest_sample_from / streaming IngestPipeline, ST19) counts
    post-dedup tokens from the IDENTICAL keeper set the line-dedup
    rollup reports. Map-side combinable: a boilerplate line duplicated
    across millions of pages partial-aggregates per map task."""
    return (
        ln.groupBy("line")
        .agg(F.min(F.struct("doc_id", "line_no", "line")).alias("k"))
        .select("k.doc_id", "k.line_no", "k.line")
    )


def c4_line_dedup_from(doc_counts: DataFrame, ln: DataFrame) -> DataFrame:
    """The keep-first line-dedup rollup over a (doc_id, n_lines) doc
    relation and a (doc_id, line_no, line) line relation — the kernel
    docs_c4_line_dedup and the streaming C4LineLedger share VERBATIM
    (the ledger maintains both relations incrementally and calls this
    at read time, so the streaming surface is bit-equal to batch)."""
    kept = (
        c4_kept_lines(ln)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.expr(
                "array_join(transform(array_sort("
                "collect_list(struct(line_no, line))), s -> s.line), ' ')"
            ).alias("kept_text"),
        )
    )
    return (
        doc_counts.join(kept, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_lines").cast("bigint").alias("n_lines"),
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept_lines"),
            (F.col("n_lines") - F.coalesce("n_kept", F.lit(0)))
            .cast("bigint")
            .alias("n_dup_lines"),
            F.length(F.coalesce("kept_text", F.lit("")))
            .cast("bigint")
            .alias("kept_chars"),
            F.md5(F.coalesce("kept_text", F.lit(""))).alias("kept_md5"),
        )
    )


def docs_c4_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4's dedup at its EXACT published grain (Raffel et al. 2020
    §2.2: "we removed all but one of any three-sentence span occurring
    more than once") — the span-grain companion of docs_c4_line_dedup
    (registered r8, staged for the r9 window): every 3-consecutive-line
    span (lines = the shared _C4_LINES_EXPR kernel, chr(1)-joined so
    the key is unambiguous) keeps its first occurrence (lexicographic
    min (doc_id, start)); every OTHER occurrence marks its three lines
    covered, overlapping removals union per doc (the islands-merge
    semantics of docs_strip_dup_spans at line grain), and each document
    is rewritten from its surviving lines with a length+md5 hash audit.

    Shape: one span-key min-struct aggregation (map-side combinable —
    a boilerplate span duplicated across millions of pages partial-
    aggregates per map task) re-joined to the span relation on the
    SAME key to identify non-keepers (both sides hash-partition on the
    key; unlike line dedup the non-keeper set is relative to the
    keeper, so this join is load-bearing), a 3x position explode +
    distinct for the covered set, a doc-keyed anti join, and the
    doc-grain rollup. Everything keys on span/doc — nothing quadratic,
    no window over a skewable key.
    """
    from .text import _C4_LINES_EXPR

    docs = load(spark, sf_dir, "documents")
    lined = (
        docs.select(
            "doc_id",
            F.expr("filter(split(text, ' '), x -> x != '')").alias("ws"),
        )
        .select("doc_id", F.expr(_C4_LINES_EXPR).alias("lines"))
        .select(
            "doc_id",
            F.expr("transform(lines, l -> array_join(l, ' '))").alias("ls"),
        )
    )
    spans = (
        lined.filter(F.size("ls") >= 3)
        .select(
            "doc_id",
            F.expr(
                """explode(transform(sequence(1, size(ls) - 2),
                    i -> struct(CAST(i AS INT) AS s,
                                concat_ws(chr(1),
                                          element_at(ls, CAST(i AS INT)),
                                          element_at(ls, CAST(i + 1 AS INT)),
                                          element_at(ls, CAST(i + 2 AS INT)))
                                    AS k)))"""
            ).alias("sp"),
        )
        .select("doc_id", F.col("sp.s").alias("s"), F.col("sp.k").alias("k"))
    )
    keeper = spans.groupBy("k").agg(F.min(F.struct("doc_id", "s")).alias("kp"))
    covered = (
        spans.join(keeper, "k")
        .filter(
            (F.col("doc_id") != F.col("kp.doc_id"))
            | (F.col("s") != F.col("kp.s"))
        )
        .select(
            "doc_id", F.explode(F.expr("sequence(s, s + 2)")).alias("line_no")
        )
        .distinct()
    )
    ln = lined.select(
        "doc_id", F.posexplode("ls").alias("p", "line")
    ).select("doc_id", (F.col("p") + 1).cast("int").alias("line_no"), "line")
    kept = (
        ln.join(covered, ["doc_id", "line_no"], "left_anti")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.expr(
                "array_join(transform(array_sort("
                "collect_list(struct(line_no, line))), s -> s.line), ' ')"
            ).alias("kept_text"),
        )
    )
    return (
        lined.select("doc_id", F.size("ls").alias("n_lines"))
        .join(kept, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_lines").cast("bigint").alias("n_lines"),
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept_lines"),
            (F.col("n_lines") - F.coalesce("n_kept", F.lit(0)))
            .cast("bigint")
            .alias("n_covered_lines"),
            F.length(F.coalesce("kept_text", F.lit("")))
            .cast("bigint")
            .alias("kept_chars"),
            F.md5(F.coalesce("kept_text", F.lit(""))).alias("kept_md5"),
        )
    )


def docs_simhash_bit_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash index-health audit: the fraction of documents with each
    of the 64 signature bits set. A well-mixed hash keeps every bit
    near 0.5; a bit pinned toward 0 or 1 carries no discriminating
    information, silently widening every 16-bit LSH block bucket — the
    audit a dedup pipeline runs before trusting its near-dup recall.
    `balanced` (within ±0.125 of fair) is evaluated as the PURE integer
    comparison 3·n_docs <= 8·n_ones <= 5·n_docs; ones_frac is one exact
    int/int division.

    Reuses the production signature relation verbatim (docs_simhash's
    4x16-bit blocks); the bit explode is a narrow 64x projection of the
    (already Zipf-bounded) signature relation, then one 64-group
    aggregation — map-side combinable, O(1) output at any corpus size.
    """
    sig = docs_simhash(spark, sf_dir).select("blk1", "blk2", "blk3", "blk4")
    blocks = F.array("blk1", "blk2", "blk3", "blk4")
    return (
        sig.select(
            F.explode(F.sequence(F.lit(0), F.lit(_SIMHASH_BITS - 1))).alias(
                "bit"
            ),
            blocks.alias("blks"),
        )
        .select(
            "bit",
            # variable-distance shift via integer division by 2^k (the
            # shiftright builtin takes only a literal distance); blocks
            # are 16-bit non-negative ints, so pow(2, k<=15) is exact
            (
                F.floor(
                    F.element_at(
                        "blks",
                        (F.col("bit") / _BITS_PER_BLOCK).cast("int") + 1,
                    )
                    / F.pow(F.lit(2.0), F.col("bit") % _BITS_PER_BLOCK)
                ).cast("int")
                % 2
            ).alias("is_set"),
        )
        .groupBy("bit")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("is_set").cast("bigint").alias("n_ones"),
        )
        .select(
            F.col("bit").cast("int").alias("bit"),
            "n_docs",
            "n_ones",
            (F.col("n_ones") / F.col("n_docs").cast("double")).alias(
                "ones_frac"
            ),
            (
                (8 * F.col("n_ones") >= 3 * F.col("n_docs"))
                & (8 * F.col("n_ones") <= 5 * F.col("n_docs"))
            ).alias("balanced"),
        )
    )


_NOVELTY_COVERED_MAX = 0.1  # novelty at or below this => doc is covered


def docs_gram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document gram novelty: the fraction of a doc's DISTINCT byte
    shingles whose corpus-wide first occurrence (min doc_id) is this
    doc — the incremental-crawl admission signal: a document whose
    grams are all already owned by earlier documents (novelty ≈ 0,
    `covered` = true) adds no new content and is skipped before the
    expensive dedup families even run. Doc-id order stands in for
    arrival order, the convention an append-only corpus gives for free.

    Reuses the _shingles kernel verbatim (same byte-hex grams as the
    whole MinHash family), so "novel" can never drift from what the
    dedup passes consider identical content.

    Scale: one gram-key aggregation (map-side combinable min) and one
    gram-key self-join — both hash-partition on the SAME key, so AQE
    reuses one exchange of the shingle relation; then a doc_id rollup.
    No window, no collect, no pair blow-up: cost is linear in total
    shingle volume regardless of duplication structure. The ratio is
    rounded through the decimal hop; counts are exact integers.
    """
    docs = load(spark, sf_dir, "documents")
    sh = _shingles(docs, distinct=True)
    first = sh.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    novelty = (
        F.round(
            F.sum((F.col("doc_id") == F.col("first_doc")).cast("int"))
            / F.count(F.lit(1)).cast("double"),
            6,
        )
        .cast("decimal(38,6)")
        .cast("double")
    )
    return (
        sh.join(first, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum((F.col("doc_id") == F.col("first_doc")).cast("int"))
            .cast("bigint")
            .alias("n_novel"),
            novelty.alias("novelty_ratio"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_novel",
            "novelty_ratio",
            (F.col("novelty_ratio") <= _NOVELTY_COVERED_MAX).alias("covered"),
        )
    )


def docs_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator-calibration audit: for every verified candidate
    pair, the signature-agreement Jaccard ESTIMATE (agreeing hashes / 9
    — the unbiased per-hash collision estimator, Broder 1997) beside
    the EXACT shingle-set Jaccard and the absolute error — the
    calibration check a dedup pipeline runs before trusting signature
    agreement as a similarity proxy (e.g. when tuning thresholds with
    docs_lsh_tuning). With 9 hashes the estimator is coarse by design;
    the audit makes that error VISIBLE per pair instead of assumed.

    Reuses the production kernels verbatim (_verified_pairs for the
    pair set + exact Jaccard, _minhash_sigs for the signatures), so the
    calibration can never drift from the index it audits. All values
    are exact: est = n_agree/9 and the exact Jaccard are int-derived
    IEEE divisions, abs_err one subtraction — nothing rounded.

    Scale: the pair relation is candidate-sized; the two signature
    joins are key-grain broadcasts/hash joins against the (Zipf-small)
    signature table. No new corpus-sized work beyond the audited
    kernels themselves.
    """
    docs = load(spark, sf_dir, "documents")
    vp = _verified_pairs(docs).select("doc_a", "doc_b", "jaccard")
    # build signatures from the SAME distinct-shingle plan
    # _verified_pairs persists internally — identical canonical plans,
    # so the cache manager reuses both relations instead of a second
    # shingle explode + signature aggregation (measured 2.4x solo)
    sigs = _minhash_sigs(docs, shingles=_shingles(docs, distinct=True))
    a = sigs.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"mh{h}").alias(f"a{h}") for h in range(1, _N_HASHES + 1)],
    )
    b = sigs.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"mh{h}").alias(f"b{h}") for h in range(1, _N_HASHES + 1)],
    )
    n_agree = sum(
        (F.col(f"a{h}") == F.col(f"b{h}")).cast("int")
        for h in range(1, _N_HASHES + 1)
    )
    est = F.col("n_agree") / F.lit(float(_N_HASHES))
    return (
        vp.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            n_agree.cast("int").alias("n_agree"),
            "jaccard",
        )
        .select(
            "doc_a",
            "doc_b",
            "n_agree",
            est.alias("est_jaccard"),
            "jaccard",
            F.abs(est - F.col("jaccard")).alias("abs_err"),
        )
    )


_SELF_REP_K = 3  # word width of the intra-doc repetition grams
# crawl-URL canonicalization: tracking params dropped before host dedup
_TRACKING_PREFIX = "utm_"
_TRACKING_KEYS = ("fbclid", "gclid", "ref")


def docs_strip_self_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITHIN-document repeated-gram REMOVAL — the intra-doc complement
    of docs_strip_dup_spans (Rae et al. 2021 §A1.2 measure dup-line /
    dup-paragraph fractions; docs_repetition_filter approximates the
    *gate*, this is the *transform*): every word position covered by a
    {_SELF_REP_K}-gram whose identical gram already occurred EARLIER in
    the same document is dropped; the first occurrence always survives.

    Exact semantics (pinned, both engines): with 0-based word
    positions, start i is a repeat iff some j < i has gram_j == gram_i;
    covered = union of [i, i+K-1] over repeat starts; kept_text is the
    uncovered words in original order. Overlapping repeats compose by
    plain set union, so the result is order- and engine-independent.

    Scale: the entire transform is higher-order array expressions over
    ONE split(text) — a narrow zero-shuffle projection at full
    parallelism; per-row cost is O(n_words * n_covered) with document
    length bounded by upstream chunking, never corpus-sized state. At
    100 TB this is a single scan, the cheapest possible shape for a
    rewrite-every-document transform.
    """
    k = _SELF_REP_K
    # r14 starved-scan guard: the O(n_words * n_covered) per-doc lambda
    # work otherwise runs in ONE task on a one-split scan (measured
    # 2.6 s -> 0.5 s at sf0.1/local[32]); no-op on a many-split input
    docs = spread_scan(load(spark, sf_dir, "documents"), "doc_id")
    words = F.split("text", " ")
    n = F.size(words)
    # grams must be guarded: Spark's sequence(0, n-k) DESCENDS when
    # n < k instead of returning an empty array
    grams = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.array_join(F.slice(words, i + 1, F.lit(k)), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    base = docs.select("doc_id", words.alias("ws"), grams.alias("gs"))
    repeat_starts = F.filter(
        F.sequence(F.lit(0), F.size("gs") - 1),
        lambda i: (F.array_position(F.col("gs"), F.get(F.col("gs"), i)) - 1) < i,
    )
    covered = F.array_distinct(
        F.flatten(
            F.transform(repeat_starts, lambda s: F.sequence(s, s + (k - 1)))
        )
    )
    staged = base.select(
        "doc_id",
        "ws",
        F.when(F.size("gs") > 0, covered)
        .otherwise(F.array().cast("array<int>"))
        .alias("cov"),
    )
    kept = F.array_join(
        F.filter("ws", lambda w, i: ~F.array_contains("cov", i)), " "
    )
    return staged.select(
        "doc_id",
        F.size("ws").cast("bigint").alias("n_words"),
        F.size("cov").cast("bigint").alias("n_removed"),
        kept.alias("kept_text"),
    )


def _url_parts(docs: DataFrame) -> DataFrame:
    """Shared URL kernel: derive each document's (deterministic
    synthetic) crawl URL, then canonicalize it — lowercase scheme/host,
    strip a leading www., strip the scheme's DEFAULT port (keep
    explicit non-default ports), drop the fragment, drop tracking
    params (utm_*, fbclid, gclid, ref), sort the surviving query params
    and strip a trailing path slash. The messy-URL construction is
    mirrored verbatim in the oracle (_URL_RAW_SQL) so the
    CANONICALIZATION rules are what the oracle actually checks.

    Everything is per-row regexp/array expressions: zero shuffles.
    """
    i = F.col("doc_id")
    scheme_raw = (
        F.when(i % 3 == 0, F.lit("http"))
        .when(i % 3 == 1, F.lit("https"))
        .otherwise(F.lit("HTTPS"))
    )
    www = (
        F.when(i % 4 == 0, F.lit("www."))
        .when(i % 4 == 1, F.lit("WWW."))
        .otherwise(F.lit(""))
    )
    port_raw = (
        F.when(
            i % 5 == 0,
            F.when(F.lower(scheme_raw) == "http", F.lit(":80")).otherwise(
                F.lit(":443")
            ),
        )
        .when(i % 5 == 1, F.lit(":8080"))
        .otherwise(F.lit(""))
    )
    path_raw = F.concat(
        F.lit("/articles/"),
        (i % 50).cast("string"),
        F.when(i % 2 == 0, F.lit("/")).otherwise(F.lit("")),
    )
    query_raw = (
        F.when(
            i % 4 == 0,
            F.concat(F.lit("?utm_source=feed&id="), (i % 25).cast("string")),
        )
        .when(
            i % 4 == 1,
            F.concat(
                F.lit("?id="), (i % 25).cast("string"), F.lit("&utm_campaign=x&b=2")
            ),
        )
        .when(i % 4 == 2, F.lit("?b=2&a=1"))
        .otherwise(F.lit(""))
    )
    frag = F.when(i % 6 == 0, F.lit("#section-2")).otherwise(F.lit(""))
    url = F.concat(
        scheme_raw,
        F.lit("://"),
        www,
        F.col("source"),
        F.lit(".Example.COM"),
        port_raw,
        path_raw,
        query_raw,
        frag,
    )
    raw = docs.select("doc_id", url.alias("url"))
    no_frag = F.regexp_replace("url", "#.*$", "")
    scheme = F.lower(F.regexp_extract(no_frag, "^([^:]+)://", 1))
    rest = F.regexp_replace(no_frag, "^[^:]+://", "")
    hostport = F.regexp_extract(rest, "^([^/?]+)", 1)
    pathq = F.regexp_replace(rest, "^[^/?]+", "")
    host = F.regexp_replace(
        F.lower(F.regexp_extract(hostport, "^([^:]+)", 1)), "^www\\.", ""
    )
    port = F.regexp_extract(hostport, ":([0-9]+)$", 1)
    keep_port = (
        (port != "")
        & ~((scheme == "http") & (port == "80"))
        & ~((scheme == "https") & (port == "443"))
    )
    path0 = F.regexp_extract(pathq, "^([^?]*)", 1)
    path1 = F.when(path0 == "", F.lit("/")).otherwise(path0)
    path = F.when(path1 == "/", path1).otherwise(
        F.regexp_replace(path1, "/$", "")
    )
    query = F.regexp_extract(pathq, "\\?(.*)$", 1)
    params = F.filter(F.split(query, "&"), lambda p: p != "")
    is_tracking = lambda p: F.substring_index(p, "=", 1).startswith(  # noqa: E731
        _TRACKING_PREFIX
    ) | F.substring_index(p, "=", 1).isin(*_TRACKING_KEYS)
    kept_params = F.array_sort(F.filter(params, lambda p: ~is_tracking(p)))
    qcanon = F.array_join(kept_params, "&")
    staged = raw.select(
        "doc_id",
        "url",
        scheme.alias("scheme"),
        host.alias("host"),
        F.when(keep_port, F.concat(F.lit(":"), port))
        .otherwise(F.lit(""))
        .alias("portpart"),
        path1.alias("path1"),
        (F.size(params) - F.size(kept_params))
        .cast("bigint")
        .alias("n_params_dropped"),
        qcanon.alias("qcanon"),
    ).select(
        "doc_id",
        "url",
        "host",
        "n_params_dropped",
        F.concat(
            F.col("scheme"),
            F.lit("://"),
            F.col("host"),
            F.col("portpart"),
            path,
            F.when(F.col("qcanon") != "", F.concat(F.lit("?"), F.col("qcanon")))
            .otherwise(F.lit("")),
        ).alias("canon_url"),
    )
    return staged


def docs_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-URL canonicalization (pairs with docs_dedup_rate_by_source
    — the URL-keyed half of crawl-corpus dedup bookkeeping): per
    document, the raw URL, its canonical form, the canonical host and
    the number of tracking params dropped. See _url_parts for the rule
    set. Zero-shuffle narrow projection at any corpus size.
    """
    return _url_parts(load(spark, sf_dir, "documents")).select(
        "doc_id", "url", "canon_url", "host", "n_params_dropped"
    )


def docs_url_host_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-level dedup bookkeeping over canonical URLs: per canonical
    host, the crawl volume, how many DISTINCT canonical URLs it
    contributes and the duplicate rate — the per-host signal a crawler
    uses to budget refetches and a dedup pipeline uses to find mirror
    hosts. dup_rate is an exact int/int IEEE division (never rounded).

    Scale: one hash aggregation on host (map-side combinable count +
    distinct via a two-level agg Spark plans automatically); host
    cardinality is web-scale-small relative to page count, and AQE
    splits skewed mega-hosts.
    """
    return host_stats_from_urls(_url_parts(load(spark, sf_dir, "documents")))


def host_stats_from_urls(u: DataFrame) -> DataFrame:
    """The host-grain aggregation kernel over a doc-grain canonical-URL
    relation (host, canon_url per document row) — shared VERBATIM by
    docs_url_host_stats and the streaming UrlHostLedger read-back
    (streaming/urls.py), so the streaming surface is bit-equal to the
    batch query by construction."""
    return (
        u.groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("canon_url").cast("bigint").alias("n_unique_urls"),
        )
        .select(
            "host",
            "n_docs",
            "n_unique_urls",
            (F.col("n_docs") - F.col("n_unique_urls")).alias("n_dup_docs"),
            (
                (F.col("n_docs") - F.col("n_unique_urls"))
                / F.col("n_docs").cast("double")
            ).alias("dup_rate"),
        )
    )


_BLOOM_M = 1 << 14  # filter size in bits (512 packed 32-bit words)
_BLOOM_K = 3  # hash functions per fingerprint


def docs_bloom_dedup_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter pre-dedup audit (Bloom 1970, public literature) —
    the measurement behind using a Bloom pre-filter to skip exact-dedup
    work at 100 TB: the corpus splits into a build half (even doc_ids)
    and a probe half (odd); the build half's distinct fingerprints are
    folded into an m=16384-bit / k=3-hash Bloom filter (_BLOOM_M /
    _BLOOM_K),
    and the audit reports how many probe-side fingerprints the filter
    flags that exact membership refutes (the false-positive rate a
    pipeline must budget for), plus the filter's fill ratio.

    The filter is REAL packed bits, built distributively: positions
    hash via md5 windows (bit-identical in DuckDB), pack into 32-bit
    words as (word_index, bit_or(mask)) — 32 bits per word, not 64,
    because a set bit 63 is a negative BIGINT that DuckDB's checked
    left-shift refuses to build; 512 always-positive words behave
    identically on both engines — the mergeable-sketch shape (map-side partial bit_or, same
    scale posture as Count-Min). Membership probes equi-join on word
    index and test (bits & mask) != 0; a probe fingerprint is flagged
    iff ALL k of its masks hit. Every output quantity is an exact
    integer; the two rates are exact int/int IEEE divisions.

    Scale: distinct-fingerprint relations are hash aggs; the sketch is
    512 packed 32-bit words regardless of corpus size; probes are word-grain joins
    against a broadcast-sized sketch. Nothing is quadratic and nothing
    collects.
    """
    docs = load(spark, sf_dir, "documents")
    sides = docs.select(
        (F.col("doc_id") % 2 == 0).alias("is_build"),
        _fingerprint().alias("fp"),
    ).distinct()
    build = sides.filter("is_build").select("fp")
    probe = sides.filter(~F.col("is_build")).select("fp")

    def positions(rel: DataFrame) -> DataFrame:
        return rel.select(
            "fp",
            F.explode(
                F.array(
                    *[
                        (
                            F.conv(
                                F.substring(
                                    F.md5(
                                        F.concat(F.lit(f"b{i}:"), F.col("fp"))
                                    ),
                                    1,
                                    8,
                                ),
                                16,
                                10,
                            ).cast("bigint")
                            % _BLOOM_M
                        )
                        for i in range(1, _BLOOM_K + 1)
                    ]
                )
            ).alias("p"),
        ).select(
            "fp",
            F.shiftright("p", 5).alias("wi"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p & 31 AS INT))").alias(
                "mask"
            ),
        )

    sketch = (
        positions(build)
        .groupBy("wi")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )
    probed = (
        positions(probe)
        .join(sketch, "wi", "left")
        .select(
            "fp",
            (
                F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("mask"))
                != 0
            )
            .cast("int")
            .alias("hit"),
        )
        .groupBy("fp")
        .agg((F.sum("hit") == _BLOOM_K).alias("bloom_member"))
    )
    exact = probe.join(
        build.select(F.col("fp").alias("bfp")),
        F.col("fp") == F.col("bfp"),
        "left_semi",
    )
    nb = build.agg(F.count(F.lit(1)).cast("bigint").alias("n_build"))
    np_ = probe.agg(F.count(F.lit(1)).cast("bigint").alias("n_probe"))
    ne = exact.agg(F.count(F.lit(1)).cast("bigint").alias("n_exact_dup"))
    nh = probed.filter("bloom_member").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bloom_hits")
    )
    fill = sketch.agg(
        F.sum(F.expr("bit_count(bits)")).cast("bigint").alias("bits_set")
    )
    return (
        nb.crossJoin(np_)
        .crossJoin(ne)
        .crossJoin(nh)
        .crossJoin(fill)
        .select(
            F.lit(_BLOOM_M).cast("bigint").alias("m_bits"),
            F.lit(_BLOOM_K).cast("int").alias("k_hashes"),
            "n_build",
            "n_probe",
            "n_exact_dup",
            "n_bloom_hits",
            (F.col("n_bloom_hits") - F.col("n_exact_dup")).alias(
                "n_false_pos"
            ),
            (
                (F.col("n_bloom_hits") - F.col("n_exact_dup"))
                / F.expr(
                    "CAST(nullif(n_probe - n_exact_dup, 0) AS DOUBLE)"
                )
            ).alias("fp_rate"),
            F.coalesce("bits_set", F.lit(0)).cast("bigint").alias("bits_set"),
            (
                F.coalesce("bits_set", F.lit(0))
                / F.lit(float(_BLOOM_M))
            ).alias("fill_ratio"),
        )
    )


QUERIES = {
    "docs_c4_line_dedup": docs_c4_line_dedup,
    "docs_quality_dup_interaction": docs_quality_dup_interaction,
    "docs_c4_span_dedup": docs_c4_span_dedup,
    "docs_gram_novelty": docs_gram_novelty,
    "docs_bloom_dedup_audit": docs_bloom_dedup_audit,
    "docs_strip_self_repetition": docs_strip_self_repetition,
    "docs_url_canonicalize": docs_url_canonicalize,
    "docs_url_host_stats": docs_url_host_stats,
    "docs_dedup_method_agreement": docs_dedup_method_agreement,
    "docs_suffix_dup_spans": docs_suffix_dup_spans,
    "docs_dup_span_filter": docs_dup_span_filter,
    "docs_strip_dup_spans": docs_strip_dup_spans,
    "docs_ngram_containment": docs_ngram_containment,
    "docs_dup_clusters": docs_dup_clusters,
    "docs_softdedup_weights": docs_softdedup_weights,
    "docs_softdedup_effective_mass": docs_softdedup_effective_mass,
    "docs_cluster_dedup": docs_cluster_dedup,
    "docs_exact_dedup": docs_exact_dedup,
    "docs_dedup_rate_by_source": docs_dedup_rate_by_source,
    "docs_fingerprint_groups": docs_fingerprint_groups,
    "docs_minhash_sigs": docs_minhash_sigs,
    "docs_minhash_pairs": docs_minhash_pairs,
    "docs_minhash_dedup": docs_minhash_dedup,
    "docs_dedup_sensitivity": docs_dedup_sensitivity,
    "docs_minhash_calibration": docs_minhash_calibration,
    "docs_lsh_tuning": docs_lsh_tuning,
    "docs_ngram_jaccard": docs_ngram_jaccard,
    "docs_simhash": docs_simhash,
    "docs_simhash_pairs": docs_simhash_pairs,
    "docs_simhash_dedup": docs_simhash_dedup,
    "docs_simhash_bit_balance": docs_simhash_bit_balance,
}

# Shared persisted kernels, exposed so the bench charges each family's
# one-time build to an explicit `family_build:*` row instead of
# distorting whichever family member happens to run first (r6 verdict
# ask #4). Each callable returns the kernel DataFrame(s) to
# materialize; queries then reuse them through cache-manager canonical
# plan matching, so every per-query bench number is MARGINAL cost.
# Declared consumers per family build — the bench self-check
# (tests/test_plans.py::test_family_builds_feed_their_consumers)
# asserts each one's physical plan actually reads the family's
# persisted kernel, so plan drift fails loudly (r7 verdict ask #6).
FAMILY_CONSUMERS = {
    "minhash_verified_pairs": (
        "docs_minhash_sigs",
        "docs_minhash_pairs",
        "docs_minhash_dedup",
        "docs_ngram_jaccard",
        "docs_ngram_containment",
        "docs_dedup_method_agreement",
        "docs_minhash_calibration",
        "docs_dedup_sensitivity",
    ),
    "lsh_sweep": ("docs_lsh_tuning",),
    "simhash_pairs": (
        "docs_simhash_pairs",
        "docs_simhash_dedup",
        "docs_dup_clusters",
        "docs_cluster_dedup",
        "docs_dedup_method_agreement",
        "docs_softdedup_weights",
        "docs_softdedup_effective_mass",
        "docs_ingest_chain_nd",
        "docs_ingest_chain_kn",
        "docs_ingest_chain_contam",
        "docs_ingest_chain_audit",
    ),
    "dup_spans": (
        "docs_suffix_dup_spans",
        "docs_dup_span_filter",
        "docs_strip_dup_spans",
    ),
}

FAMILY_BUILDS = {
    # shingles -> signatures -> band pairs -> exact-Jaccard verify:
    # consumed by docs_minhash_pairs/dedup, docs_ngram_jaccard/
    # containment, docs_dedup_method_agreement, docs_minhash_calibration
    "minhash_verified_pairs": lambda spark, sf_dir: [
        _verified_pairs(load(spark, sf_dir, "documents"))
    ],
    # per-config candidate sets + finest-banding truth set
    # (docs_lsh_tuning's sweep; shares sh/sigs with the family above)
    "lsh_sweep": lambda spark, sf_dir: (
        lambda ks: list(ks[0].values()) + [ks[1]]
    )(_lsh_sweep_kernels(load(spark, sf_dir, "documents"))),
    # simhash signature blocks -> block-LSH + hamming-verified pairs:
    # consumed by docs_simhash_pairs/dedup, docs_dup_clusters,
    # docs_cluster_dedup, docs_dedup_method_agreement
    "simhash_pairs": lambda spark, sf_dir: [
        _simhash_pairs_df(load(spark, sf_dir, "documents"))
    ],
    # positional 20-gram duplicated-span relation: consumed by
    # docs_suffix_dup_spans, docs_dup_span_filter, docs_strip_dup_spans.
    # The input projection must MATCH the consumers' (doc_id, text,
    # n_chars) exactly — cache-manager matching is on the canonical
    # plan, and a full-table-rooted build would persist a relation the
    # projected consumers never hit (r7 bench showed dup_span_filter
    # still paying the 3 s build until this was aligned).
    "dup_spans": lambda spark, sf_dir: [
        _dup_spans(
            load(spark, sf_dir, "documents").select(
                "doc_id", "text", "n_chars"
            )
        )
    ],
}

# byte shingles as hex (see _shingles: the engine-portable rendition of
# a byte window; i indexes BYTES, so the hex substring starts at 2i-1)
_SHINGLE_SQL = f"""
    SELECT DISTINCT doc_id,
           substr(hex(encode(text)), CAST(2 * i - 1 AS INT), {2 * _SHINGLE}) AS g
    FROM documents,
         unnest(range(1, greatest(octet_length(encode(text)) - {_SHINGLE - 1}, 1) + 1)) AS t(i)
"""

# signatures: DISTINCT is harmless for min(); same md5-window scheme
_SIG_SQL = f"""
    SELECT doc_id,
           {', '.join(f"min(substr(md5(g), {1 + (h - 1) * 3}, 8)) AS mh{h}" for h in range(1, _N_HASHES + 1))}
    FROM ({_SHINGLE_SQL})
    GROUP BY doc_id
"""


def _band_key_sql(prefix: str, band: int) -> str:
    rows = " || ".join(
        f"{prefix}mh{(band - 1) * _ROWS_PER_BAND + r}"
        for r in range(1, _ROWS_PER_BAND + 1)
    )
    return f"md5({rows})"


_MATCHED_SQL = " + ".join(
    f"(CASE WHEN {_band_key_sql('a.', b)} = {_band_key_sql('b.', b)} THEN 1 ELSE 0 END)"
    for b in range(1, _N_BANDS + 1)
)
_ANY_BAND_SQL = " OR ".join(
    f"{_band_key_sql('a.', b)} = {_band_key_sql('b.', b)}"
    for b in range(1, _N_BANDS + 1)
)

_PAIRS_SQL = f"""
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, {_MATCHED_SQL} AS bands_matched
    FROM ({_SIG_SQL}) a JOIN ({_SIG_SQL}) b
      ON a.doc_id < b.doc_id AND ({_ANY_BAND_SQL})
"""

_VERIFIED_SQL = f"""
    WITH sh AS ({_SHINGLE_SQL}),
    sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    cand AS ({_PAIRS_SQL}),
    inter AS (
        SELECT c.doc_a, c.doc_b, count(*) AS n_inter
        FROM cand c
        JOIN sh sa ON sa.doc_id = c.doc_a
        JOIN sh sb ON sb.doc_id = c.doc_b AND sa.g = sb.g
        GROUP BY c.doc_a, c.doc_b
    )
    SELECT i.doc_a, i.doc_b, i.n_inter,
           za.sz AS sz_a, zb.sz AS sz_b,
           i.n_inter / CAST(za.sz + zb.sz - i.n_inter AS DOUBLE) AS jaccard
    FROM inter i
    JOIN sizes za ON za.doc_id = i.doc_a
    JOIN sizes zb ON zb.doc_id = i.doc_b
"""

# SimHash oracle: same vote/bit/block formulas, DuckDB `//` integer
# division in place of Spark's `div`.
_SIMHASH_VOTES_SQL = ", ".join(
    f"sum({_simhash_vote_expr(b).format(div='//')}) AS v{b}"
    for b in range(1, _SIMHASH_BITS + 1)
)
_SIMHASH_BLOCKS_SQL = ", ".join(
    "("
    + " + ".join(
        f"(CASE WHEN v{(k - 1) * _BITS_PER_BLOCK + r + 1} >= 0 THEN 1 ELSE 0 END) * {1 << (_BITS_PER_BLOCK - 1 - r)}"
        for r in range(_BITS_PER_BLOCK)
    )
    + f") AS blk{k}"
    for k in range(1, _SIMHASH_BLOCKS + 1)
)
_SIMHASH_BASE_SQL = f"""
    SELECT doc_id, {_SIMHASH_BLOCKS_SQL}
    FROM (
        SELECT doc_id, {_SIMHASH_VOTES_SQL}
        FROM (
            SELECT doc_id, md5(unnest(string_split(text, ' '))) AS h
            FROM documents
        )
        GROUP BY doc_id
    )
"""
_SIMHASH_COMBINED_SQL = " || ".join(
    f"printf('%04x', blk{k})" for k in range(1, _SIMHASH_BLOCKS + 1)
)
_SIMHASH_HAMMING_SQL = " + ".join(
    f"bit_count(CAST(xor(a.blk{k}, b.blk{k}) AS BIGINT))"
    for k in range(1, _SIMHASH_BLOCKS + 1)
)
_SIMHASH_ANY_BLOCK_SQL = " OR ".join(
    f"a.blk{k} = b.blk{k}" for k in range(1, _SIMHASH_BLOCKS + 1)
)
_SIMHASH_PAIRS_SQL = f"""
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST({_SIMHASH_HAMMING_SQL} AS INT) AS hamming
    FROM ({_SIMHASH_BASE_SQL}) a JOIN ({_SIMHASH_BASE_SQL}) b
      ON a.doc_id < b.doc_id AND ({_SIMHASH_ANY_BLOCK_SQL})
    WHERE {_SIMHASH_HAMMING_SQL} <= {_HAMMING_THRESHOLD}
"""

_SPAN_CTES = f"""
        g AS (
            SELECT doc_id, n_chars, i,
                   substr(text, CAST(i AS INT), {_SPAN_K}) AS g
            FROM documents,
                 unnest(range(1, greatest(length(text) - {_SPAN_K - 1}, 0) + 1))
                     AS t(i)
        ),
        dup AS (
            SELECT g FROM g GROUP BY g HAVING count(DISTINCT doc_id) >= 2
        ),
        hits AS (
            SELECT g.doc_id, g.n_chars, g.i
            FROM g SEMI JOIN dup USING (g)
        ),
        marked AS (
            SELECT doc_id, n_chars, i,
                   CASE WHEN lag(i) OVER w IS NULL
                             OR i > lag(i) OVER w + {_SPAN_K}
                        THEN 1 ELSE 0 END AS brk
            FROM hits
            WINDOW w AS (PARTITION BY doc_id ORDER BY i)
        ),
        spans AS (
            SELECT doc_id, n_chars,
                   sum(brk) OVER (PARTITION BY doc_id ORDER BY i
                                  ROWS UNBOUNDED PRECEDING) AS span_id,
                   i
            FROM marked
        ),
        merged AS (
            SELECT doc_id, n_chars, span_id,
                   min(i) AS s, max(i) + {_SPAN_K - 1} AS e
            FROM spans GROUP BY doc_id, n_chars, span_id
        )
"""

# Messy-URL construction mirrored VERBATIM from _url_parts (the
# canonicalization rules are what the oracle checks, not the synthesis).
_URL_RAW_SQL = """
    SELECT doc_id,
           (CASE WHEN doc_id % 3 = 0 THEN 'http'
                 WHEN doc_id % 3 = 1 THEN 'https'
                 ELSE 'HTTPS' END)
           || '://'
           || (CASE WHEN doc_id % 4 = 0 THEN 'www.'
                    WHEN doc_id % 4 = 1 THEN 'WWW.'
                    ELSE '' END)
           || source || '.Example.COM'
           || (CASE WHEN doc_id % 5 = 0 THEN
                        (CASE WHEN doc_id % 3 = 0 THEN ':80' ELSE ':443' END)
                    WHEN doc_id % 5 = 1 THEN ':8080'
                    ELSE '' END)
           || '/articles/' || CAST(doc_id % 50 AS VARCHAR)
           || (CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END)
           || (CASE WHEN doc_id % 4 = 0
                        THEN '?utm_source=feed&id=' || CAST(doc_id % 25 AS VARCHAR)
                    WHEN doc_id % 4 = 1
                        THEN '?id=' || CAST(doc_id % 25 AS VARCHAR)
                             || '&utm_campaign=x&b=2'
                    WHEN doc_id % 4 = 2 THEN '?b=2&a=1'
                    ELSE '' END)
           || (CASE WHEN doc_id % 6 = 0 THEN '#section-2' ELSE '' END)
               AS url
    FROM documents
"""

_URL_CANON_SQL = f"""
    WITH raw AS ({_URL_RAW_SQL}),
    s1 AS (
        SELECT doc_id, url,
               regexp_replace(url, '#.*$', '') AS no_frag
        FROM raw
    ),
    s2 AS (
        SELECT doc_id, url,
               lower(regexp_extract(no_frag, '^([^:]+)://', 1)) AS scheme,
               regexp_replace(no_frag, '^[^:]+://', '') AS rest
        FROM s1
    ),
    s3 AS (
        SELECT doc_id, url, scheme,
               regexp_extract(rest, '^([^/?]+)', 1) AS hostport,
               regexp_replace(rest, '^[^/?]+', '') AS pathq
        FROM s2
    ),
    s4 AS (
        SELECT doc_id, url, scheme,
               regexp_replace(lower(regexp_extract(hostport, '^([^:]+)', 1)),
                              '^www\\.', '') AS host,
               regexp_extract(hostport, ':([0-9]+)$', 1) AS port,
               regexp_extract(pathq, '^([^?]*)', 1) AS path0,
               regexp_extract(pathq, '\\?(.*)$', 1) AS query
        FROM s3
    ),
    s5 AS (
        SELECT doc_id, url, scheme, host, port,
               CASE WHEN path0 = '' THEN '/' ELSE path0 END AS path1,
               list_filter(string_split(query, '&'), p -> p <> '') AS params
        FROM s4
    ),
    s6 AS (
        SELECT doc_id, url, scheme, host, port,
               CASE WHEN path1 = '/' THEN path1
                    ELSE regexp_replace(path1, '/$', '') END AS path,
               params,
               list_sort(list_filter(params,
                   p -> NOT (starts_with(split_part(p, '=', 1),
                                         '{_TRACKING_PREFIX}')
                             OR list_contains(
                                    {list(_TRACKING_KEYS)!r},
                                    split_part(p, '=', 1))))) AS kept
        FROM s5
    )
    SELECT doc_id, url, host,
           CAST(len(params) - len(kept) AS BIGINT) AS n_params_dropped,
           scheme || '://' || host
           || (CASE WHEN port <> ''
                         AND NOT (scheme = 'http' AND port = '80')
                         AND NOT (scheme = 'https' AND port = '443')
                    THEN ':' || port ELSE '' END)
           || path
           || (CASE WHEN array_to_string(kept, '&') <> ''
                    THEN '?' || array_to_string(kept, '&') ELSE '' END)
               AS canon_url
    FROM s6
"""

from .text.base import (  # noqa: E402  (shared C4 line kernel; the
    _C4_LINES_SQL as _C4L,  # submodule import keeps the text<->dedup
)  # circularity one-directional per module: base never imports dedup

ORACLE_SQL = {
    "docs_quality_dup_interaction": f"""
        WITH d AS (
            SELECT doc_id,
                   least(1.0, length(text) / 500.0) * 0.5
                   + len(list_distinct(string_split(text, ' ')))
                     / CAST(length(text) - length(replace(text, ' ', '')) + 1
                            AS DOUBLE) * 0.5 AS q,
                   md5(lower(trim(text))) AS fp,
                   CASE WHEN text IS NULL THEN -1
                        ELSE least(
                   CAST(floor((least(1.0, length(text) / 500.0) * 0.5
                   + len(list_distinct(string_split(text, ' ')))
                     / CAST(length(text) - length(replace(text, ' ', '')) + 1
                            AS DOUBLE) * 0.5) * {_QDI_BINS}) AS INT),
                         {_QDI_BINS - 1}) END AS bin
            FROM documents
        ),
        g AS (
            SELECT fp, count(*) AS n_fp, min(doc_id) AS keeper
            FROM d WHERE fp IS NOT NULL GROUP BY fp
        ),
        j AS (SELECT d.*, g.n_fp, g.keeper
              FROM d LEFT JOIN g USING (fp))
        SELECT bin,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(CAST(round(sum(q) / CAST(count(*) AS DOUBLE), 6)
                         AS DECIMAL(38,6)) AS DOUBLE) AS avg_quality,
               CAST(sum(CASE WHEN n_fp > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dup_docs,
               CAST(sum(CASE WHEN n_fp > 1 AND doc_id <> keeper
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_losers,
               sum(CASE WHEN n_fp > 1 THEN 1 ELSE 0 END)
                   / CAST(count(*) AS DOUBLE) AS dup_rate,
               sum(CASE WHEN n_fp > 1 AND doc_id <> keeper THEN 1 ELSE 0 END)
                   / CAST(count(*) AS DOUBLE) AS loser_rate
        FROM j GROUP BY bin
    """,
    "docs_c4_line_dedup": f"""
        WITH w AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x <> '') AS ws
            FROM documents
        ),
        lined AS (SELECT doc_id, {_C4L} AS lines FROM w),
        ln AS (
            SELECT doc_id, i - 1 AS line_no,
                   array_to_string(lines[i], ' ') AS line
            FROM (SELECT doc_id, lines,
                         unnest(range(1, len(lines) + 1)) AS i
                  FROM lined)
        ),
        kept AS (
            SELECT doc_id, count(*) AS n_kept,
                   string_agg(line, ' ' ORDER BY line_no) AS kept_text
            FROM (SELECT doc_id, line_no, line,
                         row_number() OVER (PARTITION BY line
                                            ORDER BY doc_id, line_no) AS rn
                  FROM ln)
            WHERE rn = 1 GROUP BY doc_id
        )
        SELECT l.doc_id,
               CAST(len(lines) AS BIGINT) AS n_lines,
               CAST(coalesce(n_kept, 0) AS BIGINT) AS n_kept_lines,
               CAST(len(lines) - coalesce(n_kept, 0) AS BIGINT)
                   AS n_dup_lines,
               CAST(length(coalesce(kept_text, '')) AS BIGINT) AS kept_chars,
               md5(coalesce(kept_text, '')) AS kept_md5
        FROM lined l LEFT JOIN kept USING (doc_id)
    """,
    "docs_c4_span_dedup": f"""
        WITH w AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x <> '') AS ws
            FROM documents
        ),
        lined AS (SELECT doc_id, {_C4L} AS lines FROM w),
        lstr AS (
            SELECT doc_id,
                   list_transform(lines, l -> array_to_string(l, ' ')) AS ls
            FROM lined
        ),
        spans AS (
            SELECT doc_id, i AS s,
                   ls[i] || chr(1) || ls[i + 1] || chr(1) || ls[i + 2] AS k
            FROM (SELECT doc_id, ls, unnest(range(1, len(ls) - 1)) AS i
                  FROM lstr)
        ),
        ranked AS (
            SELECT doc_id, s,
                   row_number() OVER (PARTITION BY k ORDER BY doc_id, s)
                       AS rn
            FROM spans
        ),
        covered AS (
            SELECT DISTINCT doc_id, s + j AS line_no
            FROM ranked, unnest(range(0, 3)) AS t(j)
            WHERE rn > 1
        ),
        ln AS (
            SELECT doc_id, i AS line_no, ls[i] AS line
            FROM (SELECT doc_id, ls, unnest(range(1, len(ls) + 1)) AS i
                  FROM lstr)
        ),
        kept AS (
            SELECT l.doc_id, count(*) AS n_kept,
                   string_agg(l.line, ' ' ORDER BY l.line_no) AS kept_text
            FROM ln l LEFT JOIN covered c
              ON l.doc_id = c.doc_id AND l.line_no = c.line_no
            WHERE c.doc_id IS NULL
            GROUP BY l.doc_id
        )
        SELECT d.doc_id,
               CAST(len(ls) AS BIGINT) AS n_lines,
               CAST(coalesce(n_kept, 0) AS BIGINT) AS n_kept_lines,
               CAST(len(ls) - coalesce(n_kept, 0) AS BIGINT)
                   AS n_covered_lines,
               CAST(length(coalesce(kept_text, '')) AS BIGINT) AS kept_chars,
               md5(coalesce(kept_text, '')) AS kept_md5
        FROM lstr d LEFT JOIN kept USING (doc_id)
    """,
    "docs_bloom_dedup_audit": f"""
        WITH sides AS (
            SELECT DISTINCT doc_id % 2 = 0 AS is_build,
                   md5(lower(trim(text))) AS fp
            FROM documents
        ),
        build AS (SELECT fp FROM sides WHERE is_build),
        probe AS (SELECT fp FROM sides WHERE NOT is_build),
        ks AS (SELECT unnest(range(1, {_BLOOM_K + 1})) AS i),
        bpos AS (
            SELECT fp,
                   CAST(('0x' || substr(md5('b' || i || ':' || fp), 1, 8))
                        AS BIGINT) % {_BLOOM_M} AS p
            FROM build, ks
        ),
        sketch AS (
            SELECT p >> 5 AS wi,
                   bit_or(1::BIGINT << CAST(p & 31 AS INT)) AS bits
            FROM bpos GROUP BY p >> 5
        ),
        ppos AS (
            SELECT fp,
                   CAST(('0x' || substr(md5('b' || i || ':' || fp), 1, 8))
                        AS BIGINT) % {_BLOOM_M} AS p
            FROM probe, ks
        ),
        hits AS (
            SELECT pp.fp,
                   CASE WHEN (COALESCE(s.bits, 0)
                              & (1::BIGINT << CAST(pp.p & 31 AS INT))) <> 0
                        THEN 1 ELSE 0 END AS hit
            FROM ppos pp LEFT JOIN sketch s ON pp.p >> 5 = s.wi
        ),
        member AS (
            SELECT fp FROM hits GROUP BY fp
            HAVING sum(hit) = {_BLOOM_K}
        ),
        nb AS (SELECT CAST(count(*) AS BIGINT) AS n_build FROM build),
        np AS (SELECT CAST(count(*) AS BIGINT) AS n_probe FROM probe),
        ne AS (
            SELECT CAST(count(*) AS BIGINT) AS n_exact_dup
            FROM probe WHERE fp IN (SELECT fp FROM build)
        ),
        nh AS (
            SELECT CAST(count(*) AS BIGINT) AS n_bloom_hits FROM member
        ),
        fill AS (
            SELECT CAST(COALESCE(sum(bit_count(bits)), 0) AS BIGINT)
                       AS bits_set
            FROM sketch
        )
        SELECT CAST({_BLOOM_M} AS BIGINT) AS m_bits,
               CAST({_BLOOM_K} AS INT) AS k_hashes,
               n_build, n_probe, n_exact_dup, n_bloom_hits,
               n_bloom_hits - n_exact_dup AS n_false_pos,
               (n_bloom_hits - n_exact_dup)
                   / CAST(nullif(n_probe - n_exact_dup, 0) AS DOUBLE)
                   AS fp_rate,
               bits_set,
               bits_set / CAST({_BLOOM_M} AS DOUBLE) AS fill_ratio
        FROM nb, np, ne, nh, fill
    """,
    "docs_strip_self_repetition": f"""
        WITH base AS (
            SELECT doc_id,
                   string_split(text, ' ') AS words,
                   len(string_split(text, ' ')) AS n
            FROM documents
        ),
        g AS (
            SELECT doc_id, words, n,
                   CASE WHEN n >= {_SELF_REP_K} THEN
                       list_transform(range(0, n - {_SELF_REP_K} + 1),
                           i -> array_to_string(
                               list_slice(words, i + 1, i + {_SELF_REP_K}),
                               ' '))
                   ELSE [] END AS grams
            FROM base
        ),
        c AS (
            SELECT doc_id, words, n,
                   list_distinct(flatten(list_transform(
                       list_filter(range(0, len(grams)),
                           i -> list_position(grams, grams[i + 1]) - 1 < i),
                       s -> range(s, s + {_SELF_REP_K})))) AS covered
            FROM g
        )
        SELECT doc_id,
               CAST(n AS BIGINT) AS n_words,
               CAST(len(covered) AS BIGINT) AS n_removed,
               array_to_string(
                   list_transform(
                       list_filter(range(0, n),
                           i -> NOT list_contains(covered, i)),
                       i -> words[i + 1]),
                   ' ') AS kept_text
        FROM c
    """,
    "docs_url_canonicalize": f"""
        SELECT doc_id, url, canon_url, host, n_params_dropped
        FROM ({_URL_CANON_SQL})
    """,
    "docs_url_host_stats": f"""
        SELECT host,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(DISTINCT canon_url) AS BIGINT) AS n_unique_urls,
               CAST(count(*) - count(DISTINCT canon_url) AS BIGINT)
                   AS n_dup_docs,
               (count(*) - count(DISTINCT canon_url))
                   / CAST(count(*) AS DOUBLE) AS dup_rate
        FROM ({_URL_CANON_SQL})
        GROUP BY host
    """,
    "docs_gram_novelty": f"""
        WITH sh AS ({_SHINGLE_SQL}),
        first AS (SELECT g, min(doc_id) AS first_doc FROM sh GROUP BY g),
        per_doc AS (
            SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS n_grams,
                   CAST(count(*) FILTER (WHERE doc_id = first_doc)
                        AS BIGINT) AS n_novel,
                   CAST(CAST(round(
                       count(*) FILTER (WHERE doc_id = first_doc)
                           / CAST(count(*) AS DOUBLE), 6
                   ) AS DECIMAL(38,6)) AS DOUBLE) AS novelty_ratio
            FROM sh JOIN first USING (g)
            GROUP BY doc_id
        )
        SELECT doc_id, n_grams, n_novel, novelty_ratio,
               novelty_ratio <= {_NOVELTY_COVERED_MAX} AS covered
        FROM per_doc
    """,
    "docs_dedup_method_agreement": f"""
        WITH mhp AS (
            SELECT doc_a, doc_b FROM ({_VERIFIED_SQL})
            WHERE jaccard >= {_JACCARD_THRESHOLD}
        ),
        shp AS (SELECT doc_a, doc_b FROM ({_SIMHASH_PAIRS_SQL})),
        nm AS (SELECT count(*) AS n_minhash FROM mhp),
        ns AS (SELECT count(*) AS n_simhash FROM shp),
        nb AS (
            SELECT count(*) AS n_both
            FROM mhp JOIN shp USING (doc_a, doc_b)
        )
        SELECT CAST(n_minhash AS BIGINT) AS n_minhash,
               CAST(n_simhash AS BIGINT) AS n_simhash,
               CAST(n_both AS BIGINT) AS n_both,
               n_both / CAST(NULLIF(n_minhash + n_simhash - n_both, 0) AS DOUBLE)
                   AS pair_set_jaccard
        FROM nm, ns, nb
    """,
    "docs_dup_clusters": f"""
        WITH RECURSIVE p AS ({_SIMHASH_PAIRS_SQL}),
        edges AS (
            SELECT doc_a AS s, doc_b AS t FROM p
            UNION ALL
            SELECT doc_b, doc_a FROM p
        ),
        verts AS (SELECT DISTINCT s AS doc_id FROM edges),
        reach(doc_id, r) AS (
            SELECT doc_id, doc_id FROM verts
            UNION
            SELECT e.t, reach.r FROM edges e JOIN reach ON e.s = reach.doc_id
        ),
        lab AS (SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY doc_id)
        SELECT doc_id, cluster_id,
               count(*) OVER (PARTITION BY cluster_id) AS cluster_size
        FROM lab
    """,
    "docs_softdedup_weights": f"""
        WITH RECURSIVE p AS ({_SIMHASH_PAIRS_SQL}),
        edges AS (
            SELECT doc_a AS s, doc_b AS t FROM p
            UNION ALL
            SELECT doc_b, doc_a FROM p
        ),
        verts AS (SELECT DISTINCT s AS doc_id FROM edges),
        reach(doc_id, r) AS (
            SELECT doc_id, doc_id FROM verts
            UNION
            SELECT e.t, reach.r FROM edges e JOIN reach ON e.s = reach.doc_id
        ),
        lab AS (SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY doc_id),
        clus AS (
            SELECT doc_id, cluster_id,
                   count(*) OVER (PARTITION BY cluster_id) AS cluster_size
            FROM lab
        )
        SELECT d.doc_id, d.lang, d.source,
               CAST(coalesce(c.cluster_id, d.doc_id) AS BIGINT) AS cluster_id,
               CAST(coalesce(c.cluster_size, 1) AS BIGINT) AS cluster_size,
               1.0 / CAST(coalesce(c.cluster_size, 1) AS DOUBLE) AS weight
        FROM documents d LEFT JOIN clus c USING (doc_id)
    """,
    "docs_softdedup_effective_mass": f"""
        WITH RECURSIVE p AS ({_SIMHASH_PAIRS_SQL}),
        edges AS (
            SELECT doc_a AS s, doc_b AS t FROM p
            UNION ALL
            SELECT doc_b, doc_a FROM p
        ),
        verts AS (SELECT DISTINCT s AS doc_id FROM edges),
        reach(doc_id, r) AS (
            SELECT doc_id, doc_id FROM verts
            UNION
            SELECT e.t, reach.r FROM edges e JOIN reach ON e.s = reach.doc_id
        ),
        lab AS (SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY doc_id),
        clus AS (
            SELECT doc_id,
                   count(*) OVER (PARTITION BY cluster_id) AS cluster_size
            FROM lab
        ),
        d AS (
            SELECT doc.lang,
                   CAST(coalesce(c.cluster_size, 1) AS BIGINT) AS cs,
                   CAST(len(list_filter(string_split(doc.text, ' '),
                                        x -> x <> '')) AS BIGINT) AS nt
            FROM documents doc LEFT JOIN clus c USING (doc_id)
        ),
        per AS (
            SELECT lang,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(CASE WHEN cs > 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_dup_docs,
                   CAST(sum(nt) AS BIGINT) AS raw_tokens,
                   CAST(CAST(round(
                       sum(CAST(nt AS DOUBLE) / CAST(cs AS DOUBLE)), 3
                   ) AS DECIMAL(38,3)) AS DOUBLE) AS eff_tokens
            FROM d GROUP BY lang
        ),
        tot AS (
            SELECT CAST(sum(raw_tokens) AS BIGINT) AS raw_tot,
                   CAST(CAST(round(sum(eff_tokens), 3)
                        AS DECIMAL(38,3)) AS DOUBLE) AS eff_tot
            FROM per
        )
        SELECT lang, n_docs, n_dup_docs, raw_tokens, eff_tokens,
               raw_tokens / CAST(raw_tot AS DOUBLE) AS raw_share,
               eff_tokens / eff_tot AS eff_share,
               raw_tokens / CAST(raw_tot AS DOUBLE)
                   - eff_tokens / eff_tot AS share_shift
        FROM per CROSS JOIN tot
    """,
    "docs_cluster_dedup": f"""
        WITH RECURSIVE p AS ({_SIMHASH_PAIRS_SQL}),
        edges AS (
            SELECT doc_a AS s, doc_b AS t FROM p
            UNION ALL
            SELECT doc_b, doc_a FROM p
        ),
        verts AS (SELECT DISTINCT s AS doc_id FROM edges),
        reach(doc_id, r) AS (
            SELECT doc_id, doc_id FROM verts
            UNION
            SELECT e.t, reach.r FROM edges e JOIN reach ON e.s = reach.doc_id
        ),
        lab AS (SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY doc_id)
        SELECT doc_id, lang, source, n_chars
        FROM documents d
        WHERE NOT EXISTS (
            SELECT 1 FROM lab
            WHERE lab.doc_id = d.doc_id AND lab.doc_id <> lab.cluster_id
        )
    """,
    "docs_simhash": f"""
        SELECT doc_id, blk1, blk2, blk3, blk4,
               {_SIMHASH_COMBINED_SQL} AS simhash
        FROM ({_SIMHASH_BASE_SQL})
    """,
    "docs_simhash_pairs": _SIMHASH_PAIRS_SQL,
    "docs_minhash_calibration": f"""
        WITH vp AS (
            SELECT doc_a, doc_b, jaccard FROM ({_VERIFIED_SQL})
        ),
        s AS ({_SIG_SQL})
        SELECT vp.doc_a, vp.doc_b,
               CAST((CASE WHEN a.mh1 = b.mh1 THEN 1 ELSE 0 END) + (CASE WHEN a.mh2 = b.mh2 THEN 1 ELSE 0 END) + (CASE WHEN a.mh3 = b.mh3 THEN 1 ELSE 0 END) + (CASE WHEN a.mh4 = b.mh4 THEN 1 ELSE 0 END) + (CASE WHEN a.mh5 = b.mh5 THEN 1 ELSE 0 END) + (CASE WHEN a.mh6 = b.mh6 THEN 1 ELSE 0 END) + (CASE WHEN a.mh7 = b.mh7 THEN 1 ELSE 0 END) + (CASE WHEN a.mh8 = b.mh8 THEN 1 ELSE 0 END) + (CASE WHEN a.mh9 = b.mh9 THEN 1 ELSE 0 END) AS INT) AS n_agree,
               ((CASE WHEN a.mh1 = b.mh1 THEN 1 ELSE 0 END) + (CASE WHEN a.mh2 = b.mh2 THEN 1 ELSE 0 END) + (CASE WHEN a.mh3 = b.mh3 THEN 1 ELSE 0 END) + (CASE WHEN a.mh4 = b.mh4 THEN 1 ELSE 0 END) + (CASE WHEN a.mh5 = b.mh5 THEN 1 ELSE 0 END) + (CASE WHEN a.mh6 = b.mh6 THEN 1 ELSE 0 END) + (CASE WHEN a.mh7 = b.mh7 THEN 1 ELSE 0 END) + (CASE WHEN a.mh8 = b.mh8 THEN 1 ELSE 0 END) + (CASE WHEN a.mh9 = b.mh9 THEN 1 ELSE 0 END)) / 9.0 AS est_jaccard,
               vp.jaccard,
               abs(((CASE WHEN a.mh1 = b.mh1 THEN 1 ELSE 0 END) + (CASE WHEN a.mh2 = b.mh2 THEN 1 ELSE 0 END) + (CASE WHEN a.mh3 = b.mh3 THEN 1 ELSE 0 END) + (CASE WHEN a.mh4 = b.mh4 THEN 1 ELSE 0 END) + (CASE WHEN a.mh5 = b.mh5 THEN 1 ELSE 0 END) + (CASE WHEN a.mh6 = b.mh6 THEN 1 ELSE 0 END) + (CASE WHEN a.mh7 = b.mh7 THEN 1 ELSE 0 END) + (CASE WHEN a.mh8 = b.mh8 THEN 1 ELSE 0 END) + (CASE WHEN a.mh9 = b.mh9 THEN 1 ELSE 0 END)) / 9.0 - vp.jaccard) AS abs_err
        FROM vp
        JOIN s a ON a.doc_id = vp.doc_a
        JOIN s b ON b.doc_id = vp.doc_b
    """,
    "docs_simhash_bit_balance": f"""
        WITH sig AS (SELECT * FROM ({_SIMHASH_BASE_SQL})),
        bits AS (
            SELECT t.b AS bit,
                   (CASE t.b // {_BITS_PER_BLOCK}
                        WHEN 0 THEN blk1 WHEN 1 THEN blk2
                        WHEN 2 THEN blk3 ELSE blk4 END
                    // CAST(pow(2, t.b % {_BITS_PER_BLOCK}) AS INT)) % 2
                       AS is_set
            FROM sig, unnest(range(0, {_SIMHASH_BITS})) AS t(b)
        )
        SELECT CAST(bit AS INT) AS bit,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(is_set) AS BIGINT) AS n_ones,
               sum(is_set) / CAST(count(*) AS DOUBLE) AS ones_frac,
               8 * sum(is_set) >= 3 * count(*)
                   AND 8 * sum(is_set) <= 5 * count(*) AS balanced
        FROM bits
        GROUP BY bit
    """,
    "docs_simhash_dedup": f"""
        SELECT doc_id, lang, source, n_chars
        FROM documents d
        WHERE NOT EXISTS (
            SELECT 1 FROM ({_SIMHASH_PAIRS_SQL}) p WHERE p.doc_b = d.doc_id
        )
    """,
    "docs_dedup_rate_by_source": """
        WITH flagged AS (
            SELECT source, n_chars,
                   CASE WHEN row_number() OVER (
                       PARTITION BY md5(lower(trim(text))) ORDER BY doc_id
                   ) > 1 THEN 1 ELSE 0 END AS is_dup
            FROM documents
        )
        SELECT source,
               count(*) AS n_docs,
               CAST(sum(is_dup) AS BIGINT) AS n_dups,
               sum(is_dup) / CAST(count(*) AS DOUBLE) AS dup_rate,
               CAST(sum(n_chars * is_dup) AS BIGINT) AS dup_chars
        FROM flagged
        GROUP BY source
    """,
    "docs_exact_dedup": """
        SELECT doc_id, fingerprint, lang, source, n_chars
        FROM (
            SELECT doc_id, md5(lower(trim(text))) AS fingerprint, lang, source, n_chars,
                   row_number() OVER (PARTITION BY md5(lower(trim(text))) ORDER BY doc_id) AS rn
            FROM documents
        )
        WHERE rn = 1
    """,
    "docs_fingerprint_groups": """
        SELECT md5(lower(trim(text))) AS fingerprint,
               count(*) AS n_copies,
               min(doc_id) AS canonical_doc_id,
               max(n_chars) AS max_chars
        FROM documents
        GROUP BY md5(lower(trim(text)))
    """,
    "docs_minhash_sigs": _SIG_SQL,
    "docs_minhash_pairs": _PAIRS_SQL,
    "docs_lsh_tuning": f"""
        WITH sh AS ({_SHINGLE_SQL}),
        sigs AS (
            SELECT doc_id,
                   {', '.join(f"min(substr(md5(g), {1 + (h - 1) * 3}, 8)) AS mh{h}" for h in range(1, _N_HASHES + 1))}
            FROM sh GROUP BY doc_id
        ),
        {','.join(f'''
        cand{r} AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM sigs a JOIN sigs b
              ON a.doc_id < b.doc_id AND ({_lsh_any_band_sql_r(r)})
        )''' for r in _LSH_SWEEP_ROWS)},
        sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        inter AS (
            SELECT c.doc_a, c.doc_b, count(*) AS n_inter
            FROM cand{_LSH_SWEEP_ROWS[0]} c
            JOIN sh sa ON sa.doc_id = c.doc_a
            JOIN sh sb ON sb.doc_id = c.doc_b AND sa.g = sb.g
            GROUP BY c.doc_a, c.doc_b
        ),
        truth AS (
            SELECT i.doc_a, i.doc_b
            FROM inter i
            JOIN sizes za ON za.doc_id = i.doc_a
            JOIN sizes zb ON zb.doc_id = i.doc_b
            WHERE i.n_inter / CAST(za.sz + zb.sz - i.n_inter AS DOUBLE)
                  >= {_JACCARD_THRESHOLD}
        ),
        tt AS (SELECT count(*) AS n_truth FROM truth),
        {','.join(f'''
        st{r} AS (
            SELECT (SELECT count(*) FROM cand{r}) AS n_cand,
                   (SELECT count(*) FROM cand{r} JOIN truth
                       USING (doc_a, doc_b)) AS n_true
        )''' for r in _LSH_SWEEP_ROWS)}
        {'''
        UNION ALL '''.join(f'''SELECT
               CAST({r} AS INT) AS rows_per_band,
               CAST({_N_HASHES // r} AS INT) AS n_bands,
               CAST({round(1.0 - (1.0 - _JACCARD_THRESHOLD**r) ** (_N_HASHES // r), 6)} AS DOUBLE)
                   AS p_collide_at_threshold,
               n_cand AS n_candidates, n_true,
               n_true / CAST(nullif(n_cand, 0) AS DOUBLE) AS lsh_precision,
               n_true / CAST(nullif((SELECT n_truth FROM tt), 0) AS DOUBLE)
                   AS lsh_recall
        FROM st{r}''' for r in _LSH_SWEEP_ROWS)}
    """,
    "docs_ngram_jaccard": f"""
        SELECT doc_a, doc_b, n_inter, jaccard FROM ({_VERIFIED_SQL})
    """,
    "docs_ngram_containment": f"""
        SELECT doc_a, doc_b, n_inter, jaccard,
               n_inter / CAST(sz_a AS DOUBLE) AS containment_a,
               n_inter / CAST(sz_b AS DOUBLE) AS containment_b
        FROM ({_VERIFIED_SQL})
    """,
    "docs_suffix_dup_spans": f"""
        WITH {_SPAN_CTES}
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_dup_spans,
               CAST(sum(e - s + 1) AS BIGINT) AS dup_chars,
               round(sum(e - s + 1) / CAST(max(n_chars) AS DOUBLE), 6)
                   AS dup_frac
        FROM merged GROUP BY doc_id
    """,
    "docs_dup_span_filter": f"""
        WITH {_SPAN_CTES},
        heavy AS (
            SELECT doc_id
            FROM merged GROUP BY doc_id, n_chars
            HAVING sum(e - s + 1) / CAST(n_chars AS DOUBLE) > {_SPAN_DUP_MAX}
        )
        SELECT doc_id, lang, source, n_chars
        FROM documents d
        WHERE doc_id NOT IN (SELECT doc_id FROM heavy)
    """,
    "docs_strip_dup_spans": f"""
        WITH {_SPAN_CTES},
        spagg AS (
            SELECT doc_id,
                   list_sort(list(struct_pack(s := s, e := e))) AS sp
            FROM merged GROUP BY doc_id
        ),
        rewritten AS (
            SELECT d.doc_id, d.n_chars,
                   CASE WHEN sp IS NULL THEN d.text ELSE
                       list_aggregate(
                           list_transform(
                               range(0, len(sp) + 1),
                               k -> substr(
                                   d.text,
                                   CAST(CASE WHEN k = 0 THEN 1
                                             ELSE sp[k].e + 1 END AS INT),
                                   CAST(greatest(
                                       (CASE WHEN k = len(sp) THEN d.n_chars
                                             ELSE sp[k + 1].s - 1 END)
                                       - (CASE WHEN k = 0 THEN 1
                                               ELSE sp[k].e + 1 END) + 1,
                                       0) AS INT))),
                           'string_agg', '')
                   END AS kept
            FROM documents d LEFT JOIN spagg USING (doc_id)
        )
        SELECT doc_id, n_chars,
               CAST(length(kept) AS BIGINT) AS kept_chars,
               md5(kept) AS kept_md5
        FROM rewritten
    """,
    "docs_minhash_dedup": f"""
        SELECT doc_id, lang, source, n_chars
        FROM documents d
        WHERE NOT EXISTS (
            SELECT 1 FROM ({_VERIFIED_SQL}) p
            WHERE p.doc_b = d.doc_id AND p.jaccard >= {_JACCARD_THRESHOLD}
        )
    """,
}

ORACLE_SQL["docs_dedup_sensitivity"] = f"""
    WITH vp AS ({_VERIFIED_SQL}),
    grid AS (
        SELECT unnest([{", ".join(f"CAST({t} AS DOUBLE)"
                                  for t in _DEDUP_SENS_THRESHOLDS)}])
            AS threshold
    ),
    per AS (
        SELECT threshold,
               CAST(sum(CASE WHEN jaccard >= threshold
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs,
               CAST(count(DISTINCT CASE WHEN jaccard >= threshold
                                        THEN doc_b END) AS BIGINT)
                   AS n_dropped
        FROM vp CROSS JOIN grid GROUP BY threshold
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
    SELECT threshold, n_pairs, n_dropped, n_docs,
           CAST(n_docs - n_dropped AS BIGINT) AS n_survivors,
           n_dropped / CAST(nullif(n_docs, 0) AS DOUBLE) AS drop_frac
    FROM per, tot
"""
