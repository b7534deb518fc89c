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
