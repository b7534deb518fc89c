"""Quantitative check for the HyperLogLog++ sketch query: the rows-only
approx_count_distinct result must sit within the configured relative
error of the exact distinct count."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgres_cdc_plugin_spark.operators import analytics as A
from postgres_cdc_plugin_spark.session import load


def test_approx_percentile_error_bound(spark, sf_dir):
    """approx_percentile (accuracy=10000) vs the exact full-sort
    percentile: at these scales the sketch's rank error (<=0.01%) means
    the returned value must be within a tight relative band of exact."""
    approx = {r.l_returnflag: r for r in A.lineitem_approx_percentiles(spark, sf_dir).collect()}
    exact = {r.l_returnflag: r for r in A.lineitem_percentiles(spark, sf_dir).collect()}
    assert set(approx) == set(exact)
    for k in exact:
        for col in ("price_p50", "price_p95", "qty_p50"):
            a, e = approx[k][col], exact[k][col]
            assert abs(a - e) / abs(e) <= 0.01, f"{k}.{col}: {a} vs exact {e}"


def test_approx_distinct_error_bound(spark, sf_dir):
    approx = {
        r.event_type: r.approx_users
        for r in A.approx_distinct_users(spark, sf_dir).collect()
    }
    exact = {
        r.event_type: r.n
        for r in load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k in exact:
        rel_err = abs(approx[k] - exact[k]) / exact[k]
        # rsd configured at 0.01; allow 5x headroom for small groups
        assert rel_err <= 0.05, f"{k}: {approx[k]} vs exact {exact[k]}"


def test_repetition_filter_single_token_doc(spark, tmp_path):
    # empty bigram array: 0/0 must yield NULL (matching DuckDB), not an
    # ANSI DIVIDE_BY_ZERO crash — the test corpora have no single-token
    # docs, so this edge needs its own fixture
    from postgres_cdc_plugin_spark.operators import text as T

    spark.createDataFrame(
        [(1, "solo", "en", "s", 4), (2, "a b a b a", "en", "s", 9)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        r.doc_id: r
        for r in T.docs_repetition_filter(spark, str(tmp_path)).collect()
    }
    # a single-token doc has top_token_frac 1.0, so keep is False on
    # both engines (False AND NULL = False); the bigram share is NULL
    assert out[1].dup_bigram_frac is None and out[1].keep is False
    assert out[2].dup_bigram_frac > 0.0


def test_pii_scan_detects_and_redacts(spark, tmp_path):
    # the driver corpora carry no PII (the oracle there pins regex-
    # engine parity only), so detection + deterministic redaction need
    # their own fixture
    import hashlib

    from postgres_cdc_plugin_spark.operators import text as T

    dirty = (
        "contact bob@example.com or alice@test.org, "
        "call 555-123-4567, server at 10.0.0.1 thanks"
    )
    clean = "no personal information in this document at all"
    spark.createDataFrame(
        [(1, dirty, "en", "s", len(dirty)), (2, clean, "en", "s", len(clean))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    out = {r.doc_id: r for r in T.docs_pii_scan(spark, str(tmp_path)).collect()}
    assert (out[1].n_emails, out[1].n_phones, out[1].n_ips) == (2, 1, 1)
    assert out[1].has_pii is True
    expected_redacted = (
        "contact <EMAIL> or <EMAIL>, call <PHONE>, server at <IP> thanks"
    )
    assert out[1].redacted_md5 == hashlib.md5(
        expected_redacted.encode()
    ).hexdigest()
    assert out[2].has_pii is False
    assert out[2].redacted_md5 == hashlib.md5(clean.encode()).hexdigest()
