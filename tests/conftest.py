"""Shared fixtures: one local SparkSession per test session, DuckDB
connection with testdata views registered (mirroring the driver's
harness), and a compare helper replicating the driver's row-count +
schema + order-insensitive value comparison."""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

from postgres_cdc_plugin_spark.session import get_spark, table_path

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

SF_SMALL = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="cdc-spark-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(autouse=True, scope="module")
def _lean_session_between_modules(spark):
    """Clear the session cache at every module boundary (r15, the
    verify-gate fix). The suite shares ONE SparkSession across ~1060
    tests, and every test's persist/family-kernel registration stayed
    alive for the rest of the run — Spark's CacheManager does a linear
    scan with full canonicalized-plan comparison on EVERY lookup, so
    late tests paid hundreds of deep plan comparisons per action:
    measured 87 s for a nulltext chain parity in the full suite vs
    <4 s with the file run alone (and 52 s vs 15 s for a single-doc
    degenerate check). Correctness never depends on the cache; no
    fixture shares a persisted relation across modules."""
    yield
    spark.catalog.clearCache()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMALL


@pytest.fixture(scope="session")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    yield con
    con.close()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Canonical exact form: sort columns by name, stringify every cell,
    sort rows. Matches the driver's order-insensitive value-hash bar —
    floats go through repr, so a 1-ulp difference, -0.0 vs 0.0, or an
    int64-vs-float64 dtype drift (DuckDB HUGEINT sums land in pandas as
    float64) all FAIL here, exactly as they fail the driver's hash.
    (Round 1 shipped two driver hash fails that the old rtol=1e-9
    compare waved through.)"""
    df = df.reindex(sorted(df.columns), axis=1)
    out = pd.DataFrame(index=df.index)
    for c in df.columns:
        s = df[c]
        if str(s.dtype).startswith("datetime64"):
            # unify resolution: pandas mishandles mixed us/ns with NaT
            s = s.astype("datetime64[ns]")
        mask = s.isna()
        if str(s.dtype).startswith("float"):
            vals = s.map(repr)
        else:
            vals = s.astype(str)
        vals = vals.mask(mask, "<NULL>")
        out[c] = vals
    return out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)


def assert_parity(spark_df, duck_rel, name: str):
    sp = normalize(spark_df.toPandas())
    dk = normalize(duck_rel.df())
    assert len(sp) == len(dk), f"{name}: row count {len(sp)} != oracle {len(dk)}"
    assert list(sp.columns) == list(dk.columns), (
        f"{name}: columns {list(sp.columns)} != oracle {list(dk.columns)}"
    )
    if not sp.equals(dk):
        diff = (sp != dk).any(axis=1)
        raise AssertionError(
            f"{name}: exact value mismatch on {int(diff.sum())}/{len(sp)} rows\n"
            f"spark:\n{sp[diff].head(5).to_string()}\n"
            f"oracle:\n{dk[diff].head(5).to_string()}"
        )
