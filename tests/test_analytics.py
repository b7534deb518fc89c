"""Quantitative check for the HyperLogLog++ sketch query: the rows-only
approx_count_distinct result must sit within the configured relative
error of the exact distinct count."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgres_cdc_plugin_spark.operators import analytics as A
from postgres_cdc_plugin_spark.session import load


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
