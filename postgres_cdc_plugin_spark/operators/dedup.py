"""Deduplication operators over the `documents` table.

The LLM-training-data extension surface (BASELINE.json north star): exact
hash dedup, MinHash signatures over character shingles, LSH banding for
candidate pairs, and true n-gram Jaccard verification of candidates.

All hashes are md5-based so the DuckDB oracle computes bit-identical
values. Spark-side the LSH pair generation is the scalable formulation:
explode (band, minhash) keys and equi-join on them — a plain shuffle
hash join on the band key — rather than the O(n^2) OR-condition self-join
the SQL oracle uses. Same result set, cluster-shaped plan.

At 100 TB: shingling is a narrow explode (no shuffle); signatures are one
groupBy(doc_id); the band join shuffles only (band, hash, doc_id) tuples,
and skewed buckets (a shingle shared by half the corpus) are handled by
AQE skew-join splitting plus the DISTINCT pair projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..session import load

_N_BANDS = 4
_SHINGLE = 8  # character shingle width
_MATCH_THRESHOLD = 2  # bands that must agree to call a pair near-dup


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


def _shingles(docs: DataFrame) -> DataFrame:
    """Distinct character shingles per doc: narrow explode, no shuffle."""
    idx = F.explode(
        F.sequence(F.lit(1), F.greatest(F.length("text") - (_SHINGLE - 2), F.lit(1)))
    ).alias("i")
    return (
        docs.select("doc_id", "text")
        .select("doc_id", "text", idx)
        .select(
            "doc_id",
            F.expr(f"substring(text, CAST(i AS INT), {_SHINGLE})").alias("g"),
        )
        .distinct()
    )


def _minhash_sigs(docs: DataFrame) -> DataFrame:
    """One min-hash per salted band: groupBy(doc_id) with min() partials."""
    sh = _shingles(docs)
    aggs = [
        F.min(F.md5(F.concat(F.lit(str(b)), F.col("g")))).alias(f"mh{b}")
        for b in range(1, _N_BANDS + 1)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def _candidate_pairs(sigs: DataFrame) -> DataFrame:
    """LSH banding: pairs agreeing on >=1 band, with bands_matched count.

    Explode signatures to (band, hash) keys, equi-join on them (shuffle
    hash join on the band key — the scale path), dedup pairs, then rejoin
    signatures to count agreements.
    """
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"), F.col(f"mh{b}").alias("h")
                    )
                    for b in range(1, _N_BANDS + 1)
                ]
            )
        ).alias("bh"),
    ).select("doc_id", F.col("bh.band").alias("band"), F.col("bh.h").alias("h"))

    a = bands.alias("a")
    b = bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )

    sa = sigs.alias("sa")
    sb = sigs.alias("sb")
    matched = sum(
        F.when(F.col(f"sa.mh{i}") == F.col(f"sb.mh{i}"), 1).otherwise(0)
        for i in range(1, _N_BANDS + 1)
    )
    return (
        pairs.join(sa, pairs.doc_a == F.col("sa.doc_id"))
        .join(sb, pairs.doc_b == F.col("sb.doc_id"))
        .select("doc_a", "doc_b", matched.alias("bands_matched"))
    )


def docs_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH candidate pairs with band-agreement counts."""
    docs = load(spark, sf_dir, "documents")
    return _candidate_pairs(_minhash_sigs(docs))


def docs_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup removal: drop any doc agreeing with a lower-id doc on
    >= _MATCH_THRESHOLD bands; survivors pass through (anti join)."""
    docs = load(spark, sf_dir, "documents")
    pairs = _candidate_pairs(_minhash_sigs(docs))
    losers = (
        pairs.filter(F.col("bands_matched") >= _MATCH_THRESHOLD)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    return docs.join(losers, "doc_id", "left_anti").select(
        "doc_id", "lang", "source", "n_chars"
    )


def docs_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True shingle-set Jaccard, computed only for LSH candidates that
    agree on >= _MATCH_THRESHOLD bands — the verify step of
    candidate-generation + verification dedup. The expensive set
    intersection runs on the (small) surviving pair set, not all O(n^2)
    pairs."""
    docs = load(spark, sf_dir, "documents")
    sh = _shingles(docs)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    pairs = _candidate_pairs(_minhash_sigs(docs)).filter(
        F.col("bands_matched") >= _MATCH_THRESHOLD
    )

    sa = sh.alias("sa")
    sb = sh.alias("sb")
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
            # No rounding: int/int IEEE division is bit-identical across
            # engines, while round() semantics differ exactly at the
            # .xxxx5 boundaries these rational values land on.
            (
                F.col("n_inter")
                / (F.col("za.sz") + F.col("zb.sz") - F.col("n_inter")).cast("double")
            ).alias("jaccard"),
        )
    )


QUERIES = {
    "docs_exact_dedup": docs_exact_dedup,
    "docs_fingerprint_groups": docs_fingerprint_groups,
    "docs_minhash_pairs": docs_minhash_pairs,
    "docs_minhash_dedup": docs_minhash_dedup,
    "docs_ngram_jaccard": docs_ngram_jaccard,
}

_SHINGLE_SQL = f"""
    SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), {_SHINGLE}) AS g
    FROM documents, unnest(range(1, greatest(length(text) - {_SHINGLE - 2}, 1) + 1)) AS t(i)
"""

_SIG_SQL = f"""
    SELECT doc_id,
           {', '.join(f"min(md5('{b}' || g)) AS mh{b}" for b in range(1, _N_BANDS + 1))}
    FROM ({_SHINGLE_SQL})
    GROUP BY doc_id
"""

_MATCHED_SQL = " + ".join(
    f"(CASE WHEN a.mh{b} = b.mh{b} THEN 1 ELSE 0 END)" for b in range(1, _N_BANDS + 1)
)
_ANY_BAND_SQL = " OR ".join(f"a.mh{b} = b.mh{b}" for b in range(1, _N_BANDS + 1))

_PAIRS_SQL = f"""
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, {_MATCHED_SQL} AS bands_matched
    FROM ({_SIG_SQL}) a JOIN ({_SIG_SQL}) b
      ON a.doc_id < b.doc_id AND ({_ANY_BAND_SQL})
"""

ORACLE_SQL = {
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
    "docs_minhash_pairs": _PAIRS_SQL,
    "docs_minhash_dedup": f"""
        SELECT doc_id, lang, source, n_chars
        FROM documents d
        WHERE NOT EXISTS (
            SELECT 1 FROM ({_PAIRS_SQL}) p
            WHERE p.doc_b = d.doc_id AND p.bands_matched >= {_MATCH_THRESHOLD}
        )
    """,
    "docs_ngram_jaccard": f"""
        WITH sh AS ({_SHINGLE_SQL}),
        sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        cand AS (SELECT * FROM ({_PAIRS_SQL}) WHERE bands_matched >= {_MATCH_THRESHOLD}),
        inter AS (
            SELECT c.doc_a, c.doc_b, count(*) AS n_inter
            FROM cand c
            JOIN sh sa ON sa.doc_id = c.doc_a
            JOIN sh sb ON sb.doc_id = c.doc_b AND sa.g = sb.g
            GROUP BY c.doc_a, c.doc_b
        )
        SELECT i.doc_a, i.doc_b, i.n_inter,
               i.n_inter / CAST(za.sz + zb.sz - i.n_inter AS DOUBLE) AS jaccard
        FROM inter i
        JOIN sizes za ON za.doc_id = i.doc_a
        JOIN sizes zb ON zb.doc_id = i.doc_b
    """,
}
