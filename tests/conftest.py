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
    """Sort columns by name and rows by all values — the driver's
    order-insensitive compare."""
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("datetime64"):
            # unify resolution: pandas' assert_frame_equal mishandles
            # mixed us/ns resolution when NaT is present
            df[c] = df[c].astype("datetime64[ns]")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def assert_parity(spark_df, duck_rel, name: str):
    sp = normalize(spark_df.toPandas())
    dk = normalize(duck_rel.df())
    assert len(sp) == len(dk), f"{name}: row count {len(sp)} != oracle {len(dk)}"
    assert list(sp.columns) == list(dk.columns), (
        f"{name}: columns {list(sp.columns)} != oracle {list(dk.columns)}"
    )
    pd.testing.assert_frame_equal(sp, dk, check_dtype=False, check_exact=False, rtol=1e-9, atol=1e-9)
