"""Degenerate-input robustness: every documents-table operator must
handle an EMPTY corpus and a single-document corpus by returning a
well-formed (possibly empty) result — never by crashing. At 100 TB a
partition-pruned read, a dried-up changefeed, or an over-aggressive
quality gate routinely hands downstream stages zero rows; an operator
that throws on empty input breaks the pipeline exactly when a filter
did its job.
"""

from __future__ import annotations

import pytest

from postgres_cdc_plugin_spark.operators import dedup, text

_DOC_QUERIES = [
    (dedup, "docs_exact_dedup"),
    (dedup, "docs_minhash_dedup"),
    (dedup, "docs_simhash_dedup"),
    (dedup, "docs_dup_clusters"),
    (dedup, "docs_cluster_dedup"),
    (text, "docs_winnowing"),
    (text, "token_bpe_merges"),
    (text, "token_bpe_encode"),
    (text, "token_heavy_hitters"),
    (text, "token_count_min"),
    (text, "docs_linear_classifier"),
    (dedup, "docs_suffix_dup_spans"),
    (dedup, "docs_dup_span_filter"),
    (dedup, "docs_ngram_containment"),
    (dedup, "docs_strip_dup_spans"),
    (text, "token_bigram_surprisal"),
    (text, "docs_dsir_weights"),
    (text, "docs_word_pmi"),
    (dedup, "docs_dedup_rate_by_source"),
    (text, "docs_lang_confusion"),
    (text, "docs_weighted_sample"),
    (text, "docs_bm25_search"),
    # late r6 documents operators
    (text, "docs_ccnet_buckets"),
    (text, "docs_quality_psi_drift"),
    (text, "docs_gopher_rules"),
    (dedup, "docs_gram_novelty"),
    # round-7 operators
    (dedup, "docs_strip_self_repetition"),
    (dedup, "docs_url_canonicalize"),
    (dedup, "docs_url_host_stats"),
    (text, "docs_unicode_normalize"),
    (dedup, "docs_bloom_dedup_audit"),
    (text, "token_vocab_coverage"),
    # round-8 operators
    (text, "docs_c4_line_filter"),
    (dedup, "docs_c4_line_dedup"),
    (text, "token_fertility_by_lang"),
    (text, "docs_lang_temperature_mix"),
    (dedup, "docs_quality_dup_interaction"),
    (dedup, "docs_c4_span_dedup"),
    (text, "docs_mixture_sample"),
    # round-9 operators
    (text, "docs_c4_punct_gate"),
    (text, "docs_mixture_realized_mix"),
    (text, "docs_pack_tuning"),
    # round-10 operators
    (text, "docs_ingest_chain"),
    (text, "docs_unimax_mix"),
    (text, "docs_unimax_sample"),
    (text, "docs_unimax_realized_mix"),
    (text, "docs_classifier_pr_curve"),
    (dedup, "docs_dedup_sensitivity"),
    (text, "token_kneser_ney"),
    (text, "docs_kn_surprisal"),
    # round-11 operators
    (text, "docs_kn_band"),
    (dedup, "docs_softdedup_weights"),
    (text, "docs_quality_kn_interaction"),
    (text, "docs_ingest_chain_nd"),
    (text, "docs_classifier_calibration"),
    (dedup, "docs_softdedup_effective_mass"),
    # round-12 operators
    (text, "docs_ingest_chain_kn"),
    (text, "docs_ingest_chain_audit"),
    # round-14 operators
    (text, "docs_ingest_chain_contam"),
]

_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


@pytest.fixture(scope="module")
def empty_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_corpus")
    spark.createDataFrame([], _SCHEMA).write.parquet(str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def single_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("single_corpus")
    spark.createDataFrame(
        [(1, "lonely document with a few tokens", "en", "s", 33)], _SCHEMA
    ).write.parquet(str(d / "documents.parquet"))
    return str(d)


@pytest.mark.parametrize("mod,name", _DOC_QUERIES, ids=[n for _, n in _DOC_QUERIES])
def test_empty_corpus_returns_empty(mod, name, spark, empty_dir):
    df = getattr(mod, name)(spark, empty_dir)
    if name == "docs_bloom_dedup_audit":
        # corpus-level audit: always exactly one row; an empty corpus
        # reads as an empty filter with zero probes, never a crash
        rows = df.collect()
        assert len(rows) == 1
        r = rows[0]
        assert r.n_build == 0 and r.n_probe == 0 and r.bits_set == 0
        assert r.fp_rate is None and r.fill_ratio == 0.0
        return
    if name == "docs_ingest_chain_audit":
        # stage-attrition table: always exactly 7 stage rows (r13 adds
        # line_dedup, r14 decontam); an empty corpus reads as zero
        # docs at every stage (token mass and the two ratio columns
        # are NULL — sum/ratio over nothing, not fake zeros)
        rows = sorted(df.collect(), key=lambda r: r.stage_no)
        assert [r.stage for r in rows] == [
            "raw", "gopher_gate", "kn_band", "neardup_dedup",
            "line_dedup", "admission", "decontam",
        ]
        assert all(r.n_docs == 0 for r in rows)
        assert all(r.n_tokens is None and r.kept_frac is None for r in rows)
        assert all(r.mass_frac is None for r in rows)
        return
    assert df.count() == 0
    assert len(df.schema.fields) > 0


@pytest.mark.parametrize("mod,name", _DOC_QUERIES, ids=[n for _, n in _DOC_QUERIES])
def test_single_doc_corpus_is_sane(mod, name, spark, single_dir):
    rows = getattr(mod, name)(spark, single_dir).collect()
    if name == "docs_dedup_sensitivity":
        # the sweep grades the candidate-pair relation; one document
        # yields no candidates, so there is nothing to sweep
        assert rows == []
    elif name == "docs_unimax_mix":
        # one language, 6 tokens: cap = 12 > budget (6*3 div 2 = 9),
        # so the sole language is uncapped and absorbs the full budget
        assert len(rows) == 1
        r = rows[0]
        assert not r.capped and r.cap_tokens == 12
        assert r.alloc_tokens == 9.0 and r.epochs_used == 1.5
    elif name == "docs_unimax_sample":
        # quota 9 over a 6-token corpus: one full copy + a 3-token
        # remainder the 6-token doc cannot fit -> exactly 1 copy
        assert len(rows) == 1
        r = rows[0]
        assert r.quota_tokens == 9 and r.lang_tokens == 6
        assert r.base_copies == 1 and not r.extra_copy and r.n_copies == 1
    elif name == "token_kneser_ney":
        # 5 distinct bigrams, every count 1: p_kn = (1-0.75)/1 +
        # 0.75*(1/1)*(1/5) = 0.4 exactly for every bigram
        assert len(rows) == 5
        assert all(r.p_kn == 0.4 and r.cf == 1 for r in rows)
    elif name == "docs_kn_surprisal":
        # every bigram scores p_kn = 0.4 -> surprisal = -log2(0.4)
        assert len(rows) == 1
        r = rows[0]
        assert r.n_bigrams == 5
        assert abs(r.kn_surprisal - 1.321928) < 1e-6
    elif name == "docs_unimax_realized_mix":
        # one full copy of the 6-token doc against quota 9: realized
        # exactly 1 epoch vs the designed 1.5, utilization 6/9
        assert len(rows) == 1
        r = rows[0]
        assert r.delivered_tokens == 6 and r.realized_epochs == 1.0
        assert r.designed_epochs == 1.5 and r.epoch_gap == -0.5
        assert r.utilization == 6 / 9 and r.achieved_share == 1.0
    elif name == "docs_classifier_pr_curve":
        # the single doc fails the gopher word-count rule -> label
        # False everywhere: no positives exist at any threshold
        assert len(rows) == len(text._PR_THRESHOLDS)
        assert all(r.tp == 0 and r.fn == 0 and r.recall is None for r in rows)
    elif name.startswith("docs_") and "dedup" in name:
        # one document can never be a duplicate of anything
        assert len(rows) == 1
    elif name in ("docs_dup_clusters",):
        assert rows == []  # no pairs -> no clustered vertices
    elif name in ("docs_suffix_dup_spans", "docs_ngram_containment"):
        assert rows == []  # cross-doc signals need >= 2 documents
    elif name == "docs_dup_span_filter":
        assert len(rows) == 1  # nothing to drop -> passthrough
    elif name == "docs_strip_dup_spans":
        # no cross-doc spans -> text passes through untouched
        assert len(rows) == 1 and rows[0].kept_chars == rows[0].n_chars
    elif name == "docs_dsir_weights":
        # single doc is raw-side; the target split is empty, weights
        # still well-defined through add-one smoothing
        assert len(rows) == 1
    elif name == "docs_dedup_rate_by_source":
        # one doc, one source, zero duplicates
        assert len(rows) == 1
        assert rows[0].n_dups == 0 and rows[0].dup_rate == 0.0
    elif name == "docs_lang_confusion":
        # one doc -> one (declared, predicted) cell with share 1.0
        assert len(rows) == 1 and rows[0].share_of_declared == 1.0
    elif name == "docs_bm25_search":
        # the single doc contains none of the fixed query terms, so the
        # inverted-index probe legitimately retrieves nothing
        assert rows == []
    elif name == "docs_strip_self_repetition":
        # no repeated 3-gram in the fixture text -> lossless passthrough
        assert len(rows) == 1
        assert rows[0].n_removed == 0
        assert rows[0].kept_text == "lonely document with a few tokens"
    elif name == "docs_bloom_dedup_audit":
        # doc_id=1 is probe-side: empty filter, one probe fingerprint,
        # zero hits of any kind, fp_rate = 0/1 exactly
        assert len(rows) == 1
        r = rows[0]
        assert r.n_build == 0 and r.n_probe == 1
        assert r.n_bloom_hits == 0 and r.n_false_pos == 0
        assert r.fp_rate == 0.0 and r.bits_set == 0
    elif name == "token_vocab_coverage":
        # the single doc's tokens ARE the top-16 vocabulary
        assert len(rows) == 1
        assert rows[0].n_oov == 0 and rows[0].oov_rate == 0.0
    elif name == "docs_unicode_normalize":
        # already NFC-normal, single-spaced ASCII -> unchanged
        assert len(rows) == 1
        assert not rows[0].changed
        assert rows[0].norm_text == "lonely document with a few tokens"
    elif name in ("docs_url_canonicalize", "docs_url_host_stats"):
        # one doc -> one URL -> one host with zero duplicate URLs
        assert len(rows) == 1
        if name == "docs_url_host_stats":
            assert rows[0].n_dup_docs == 0 and rows[0].dup_rate == 0.0
    elif name == "docs_lang_temperature_mix":
        # one language owns the whole corpus: share = temp share = 1,
        # sampling factor exactly 1.0
        assert len(rows) == 1
        r = rows[0]
        assert r.share == 1.0 and r.temp_share == 1.0
        assert r.sample_factor == 1.0
    elif name == "docs_quality_dup_interaction":
        # a single doc can't duplicate anything: one bin, zero dups
        assert len(rows) == 1
        assert rows[0].n_dup_docs == 0 and rows[0].dup_rate == 0.0
    elif name == "docs_mixture_sample":
        # one doc, one lang: temp share 1, quota = half the corpus
        # tokens -> the doc alone exceeds it and is not selected
        assert len(rows) == 1
        r = rows[0]
        assert r.quota_tokens == r.n_tokens // 2 and not r.selected
    elif name == "docs_c4_punct_gate":
        # doc_id=1 -> k=3: periods after words 3 and 6. Line 1 (5
        # words) ends unpunctuated ("few") -> dropped by the enforced
        # punct rule; line 2 ("tokens.") is punctuated but short
        assert len(rows) == 1
        r = rows[0]
        assert r.punct_every_k == 3 and r.n_lines == 2
        assert r.n_punct_lines == 1 and r.n_kept_lines == 0
        assert r.kept_words == 0 and not r.page_keep
    elif name == "docs_mixture_realized_mix":
        # quota = n//2 < n -> the sole doc is rejected: zero selected,
        # utilization 0, achieved share undefined (0-token realization)
        assert len(rows) == 1
        r = rows[0]
        assert r.n_docs == 1 and r.n_selected_docs == 0
        assert r.selected_tokens == 0 and r.utilization == 0.0
        assert r.achieved_share is None and r.share_gap is None
        assert r.temp_share == 1.0
    elif name == "docs_pack_tuning":
        # one 6-token doc, one shard: every budget packs one bin with
        # fill 6/budget and no overflow
        assert len(rows) == len(text._PACK_TUNE_BUDGETS)
        for r in rows:
            assert r.n_bins == 1 and r.n_docs == 1
            assert r.total_tokens == 6 and r.overflow_bins == 0
            assert r.avg_fill_ratio == 6 / r.budget
    elif name == "docs_c4_line_filter":
        # 6 words -> two 5-word lines; the 1-word tail line is short
        assert len(rows) == 1
        r = rows[0]
        assert r.n_lines == 2 and r.n_short_lines == 1
        assert r.n_kept_lines == 1 and r.kept_words == 5
        assert not r.page_keep  # fewer than 5 lines
    elif name == "docs_word_pmi":
        # N = 1: every pair of the doc's distinct words co-occurs with
        # df_a = df_b = n_pair_docs = 1, so pmi = log2(1*1/1) = 0 exactly
        assert len(rows) > 0
        assert all(r.pmi == 0.0 for r in rows)
    # token/*, winnowing, classifier: just must not crash and respect
    # their own schema; BPE may learn fewer than the configured merges


_EMB_SCHEMA = "vec_id long, embedding array<float>, label int"


@pytest.fixture(scope="module")
def empty_emb_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_emb")
    spark.createDataFrame([], _EMB_SCHEMA).write.parquet(str(d / "embeddings.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def single_emb_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("single_emb")
    spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0], 0)], _EMB_SCHEMA
    ).write.parquet(str(d / "embeddings.parquet"))
    return str(d)


_EMB_QUERIES = [
    "embed_kcenter_coreset",
    "embed_mmr_rerank",
    "embed_kmeans",
    "embed_ivf_assign",
    "embed_semdedup",
    "embed_neardup_dedup",
    "embed_silhouette",
    "embed_pca_power",
    "embed_cell_balance_audit",
    "embed_prototypicality",
    "embed_cluster_purity",
    "embed_intrinsic_dim",
]


@pytest.mark.parametrize("name", _EMB_QUERIES)
def test_empty_embeddings_returns_empty(name, spark, empty_emb_dir):
    from postgres_cdc_plugin_spark.operators import similarity

    df = getattr(similarity, name)(spark, empty_emb_dir)
    assert df.count() == 0


@pytest.mark.parametrize("name", _EMB_QUERIES)
def test_single_embedding_is_sane(name, spark, single_emb_dir):
    """One vector: assignments assign it somewhere; dedups keep it (a
    sole vector cannot be anyone's duplicate)."""
    from postgres_cdc_plugin_spark.operators import similarity

    rows = getattr(similarity, name)(spark, single_emb_dir).collect()
    if name == "embed_cell_balance_audit":
        # one vector, one occupied cell: share and balance are exactly 1
        assert len(rows) == 1
        assert rows[0].n_vecs == 1 and rows[0].vec_share == 1.0
        assert rows[0].balance_ratio == 1.0
        return
    if name == "embed_pca_power":
        # rank-0 centered matrix: one row per dim, NULL loadings and
        # eigenvalue (the NULLIF guard), never inf or a crash
        assert len(rows) == 4
        assert all(r.loading is None and r.eigenvalue is None for r in rows)
        return
    if name == "embed_mmr_rerank":
        # the sole vector IS the query; the candidate pool is empty, so
        # every greedy pick is empty — well-formed zero-row result
        assert rows == []
        return
    if name == "embed_kcenter_coreset":
        # n < k: greedy farthest-point legitimately re-picks the sole
        # vector (coverage radius 0 after the seed) — k rows, all vec 0,
        # sel_dist NULL for the seed then exactly 0.0
        assert len(rows) == 8
        assert all(r.vec_id == 0 for r in rows)
        assert rows[0].sel_dist is None or any(r.rank == 1 and r.sel_dist is None for r in rows)
        assert all(r.sel_dist == 0.0 for r in rows if r.rank > 1)
        return
    assert len(rows) == 1
    if name == "embed_silhouette":
        # one vector, one cell: no other centroid exists, silhouette NULL
        assert rows[0].n_vecs == 1 and rows[0].avg_silhouette is None
    elif name == "embed_cluster_purity":
        # one vector, one cell, one label: purity is exactly 1
        r = rows[0]
        assert r.cell_size == 1 and r.n_labels == 1
        assert r.purity == 1.0 and r.purity_contrib == 1.0
    elif name == "embed_intrinsic_dim":
        # one vector: no neighbor pair, estimator undefined, never inf
        r = rows[0]
        assert r.n_vecs == 1 and r.n_used == 0
        assert r.intrinsic_dim is None
    else:
        assert rows[0].vec_id == 0
        if name == "embed_prototypicality":
            # rank 1 of a 1-vector cell: 100 > 30 -> the hard tail keeps it
            assert rows[0].proto_rank == 1 and rows[0].keep


def test_silence_trim_degenerate_corpora(spark, empty_dir, single_dir):
    """Empty corpus -> empty result; the single-doc fixture (doc_id=1 ->
    audio modality) decodes and segments: window accounting must be
    self-consistent (lead + kept + trail == n_windows)."""
    from postgres_cdc_plugin_spark.operators import multimodal

    assert multimodal.multimodal_silence_trim(spark, empty_dir).count() == 0
    rows = multimodal.multimodal_silence_trim(spark, single_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_samples == 33 and r.n_windows == 1
    assert r.lead_trim + r.kept_windows + r.trail_trim == r.n_windows or (
        r.kept_windows == 0 and r.lead_trim == r.n_windows
    )


def test_lsh_tuning_single_doc_is_all_zero(spark, single_dir):
    """One document: every swept banding legitimately yields zero
    candidates and zero true pairs; precision/recall are NULL (0/0
    guarded by nullif), never a crash or an inf. Always 3 config
    rows — the sweep's shape is constant."""
    rows = dedup.docs_lsh_tuning(spark, single_dir).collect()
    assert len(rows) == 3
    assert all(r.n_candidates == 0 and r.n_true == 0 for r in rows)
    assert all(r.lsh_precision is None and r.lsh_recall is None for r in rows)


_EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


@pytest.fixture(scope="module")
def empty_ev_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_events")
    spark.createDataFrame([], _EV_SCHEMA).write.parquet(str(d / "events.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def single_error_dir(spark, tmp_path_factory):
    import datetime

    d = tmp_path_factory.mktemp("single_error")
    spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1, 12, 0, 0), 7, "error", 1.0, "{}")],
        _EV_SCHEMA,
    ).write.parquet(str(d / "events.parquet"))
    return str(d)


def test_interval_join_empty_events(spark, empty_ev_dir):
    from postgres_cdc_plugin_spark.operators import analytics

    df = analytics.events_interval_join(spark, empty_ev_dir)
    assert df.count() == 0
    assert len(df.schema.fields) > 0


def test_rle_audit_nullable_flag_columns(spark, tmp_path_factory):
    """The RLE audit's distributed run count must stay exact when the
    audited columns contain NULLs (round-7 fix: the partition-first row
    is now flagged explicitly via row_number()==1 instead of relying on
    lag-is-NULL, which eqNullSafe(NULL, NULL) silently un-flagged for a
    NULL first value). Proven by exact parity against the recursive
    IS-DISTINCT-FROM oracle on a NULL-bearing fixture, including NULL
    as the globally-first value under every swept ordering."""
    import duckdb
    import pandas as pd

    from postgres_cdc_plugin_spark.operators import analytics
    from postgres_cdc_plugin_spark.registry import oracle_sql

    from .conftest import normalize

    d = tmp_path_factory.mktemp("null_flags")
    rows = []
    for i in range(200):
        rows.append(
            (
                i,  # l_orderkey: pk order puts the NULL-flag row first
                1,  # l_linenumber
                f"1994-{1 + i % 12:02d}-01",  # l_shipdate (string is fine)
                200 - i,  # l_partkey: reversed so orderings differ
                None if i % 7 == 0 else "RNA"[i % 3],  # l_returnflag
                None if i < 3 else "OF"[i % 2],  # l_linestatus
            )
        )
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_linenumber long, l_shipdate string, "
        "l_partkey long, l_returnflag string, l_linestatus string",
    ).write.parquet(str(d / "lineitem.parquet"))

    got = analytics.lineitem_rle_layout_audit(spark, str(d)).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{d}/lineitem.parquet/*.parquet')"
    )
    want = con.sql(oracle_sql()["lineitem_rle_layout_audit"]).df()
    con.close()
    pd.testing.assert_frame_equal(normalize(got), normalize(want))


def test_holt_forecast_single_day_emits_nothing(spark, single_error_dir):
    """Holt needs >= 2 observations: a single-day event range must emit
    NO row on BOTH engines (pinned in round 7 — the Spark side used to
    emit a level-only row with a NULL trend while the recursive oracle,
    whose base case is day index 2, emitted nothing)."""
    import duckdb

    from postgres_cdc_plugin_spark.operators import analytics
    from postgres_cdc_plugin_spark.registry import oracle_sql

    assert analytics.events_holt_forecast(spark, single_error_dir).count() == 0
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{single_error_dir}/events.parquet/*.parquet')"
    )
    assert con.sql(oracle_sql()["events_holt_forecast"]).df().shape[0] == 0
    con.close()


def test_interval_join_excludes_own_bursts(spark, single_error_dir):
    """A user's session trivially overlaps their OWN error burst; the
    self-exclusion predicate must drop it — one lone error event yields
    no impacted foreign session."""
    from postgres_cdc_plugin_spark.operators import analytics

    assert analytics.events_interval_join(spark, single_error_dir).count() == 0
