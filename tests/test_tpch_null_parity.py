"""TPC-H group-key NULL-parity sweep (r13, r12 verdict ask #7 — the
last family outside the NULL-parity arc): the 66-query analytics
family (plus the CDC feeds built over orders/customer) groups, joins,
windows and pivots on TPC-H columns the synthetic generator never
NULLs — l_returnflag / l_linestatus, o_orderpriority / o_orderstatus,
c_mktsegment, nation/region names, part brand/type — so an engine
expression that coalesces a NULL group key, a window ordered on a
now-NULL column, or an oracle whose join silently orphans a NULL key
sits latent until real data hits it (exactly the class the
documents/events/embeddings/multimodal sweeps already gate).

Same discipline as the events sweep (tests/test_events_null_parity.py):
the REAL sf0.001 tables are kept as the structural backbone —
referential keys untouched, so every join/enrich plan runs its full
shape — and NULLs are INJECTED deterministically by primary-key
residue into the group-key and measure columns (each column class its
own residue, so classes overlap rarely but jointly cover every query).
Sweep surface is AUTO-INCLUDED: every oracle whose SQL reads any of
the seven TPC-H views. Any divergence is fixed ENGINE-MIRRORED, never
oracle-patched.
"""

from __future__ import annotations

import os
import re

import duckdb
import pytest
from pyspark.sql import functions as F

from postgres_cdc_plugin_spark import registry
from postgres_cdc_plugin_spark.session import table_path

from .conftest import SF_SMALL, TABLES, assert_parity

QUERIES = registry.queries()
ORACLES = registry.oracle_sql()

_TPCH = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]

# Auto-included surface: every oracle query whose SQL reads a TPC-H
# view. Word-boundary match so a column or function merely containing
# a table name (split_part, n_parts, ...) can't leak in — `_` is a
# word character, so \bpart\b does not match split_part.
TPCH_NAMES = sorted(
    n
    for n, sql in ORACLES.items()
    if any(re.search(rf"\b{t}\b", sql) for t in _TPCH)
)


def test_sweep_covers_the_tpch_surface():
    """Auto-inclusion completeness (the events-sweep contract): a regex
    drift that silently empties the sweep must fail loudly."""
    assert {
        "lineitem_pricing_agg",
        "orders_enrich_join",
        "orders_shipping_priority",
        "top_customers_per_nation",
        "nation_priority_pivot",
        "customer_value_deciles",
        "part_abc_pareto",
        "orders_grouping_sets",
        "grouping_rollup",
        "lineitem_discount_regression",
        "customer_fuzzy_match",
        "orders_join_cardinality_audit",
    } <= set(TPCH_NAMES)
    assert len(TPCH_NAMES) >= 40


# (column, key, modulus, residue) per table: deterministic injection so
# the fixture is stable across sessions and each NULL class is sparse
# enough to leave the structural backbone intact.
_INJECT = {
    "lineitem": [
        ("l_returnflag", "l_orderkey", 19, 0),
        ("l_linestatus", "l_orderkey", 23, 1),
        ("l_shipdate", "l_orderkey", 29, 2),
        ("l_quantity", "l_orderkey", 31, 3),
        ("l_discount", "l_orderkey", 37, 4),
        ("l_tax", "l_orderkey", 41, 5),
        ("l_extendedprice", "l_orderkey", 43, 6),
    ],
    "orders": [
        ("o_orderpriority", "o_orderkey", 19, 0),
        ("o_orderstatus", "o_orderkey", 23, 1),
        ("o_orderdate", "o_orderkey", 29, 2),
        ("o_totalprice", "o_orderkey", 31, 3),
    ],
    "customer": [
        ("c_mktsegment", "c_custkey", 11, 0),
        ("c_acctbal", "c_custkey", 13, 1),
        ("c_name", "c_custkey", 17, 2),
    ],
    "nation": [("n_name", "n_nationkey", 7, 0)],
    "region": [("r_name", "r_regionkey", 3, 0)],
    "part": [
        ("p_brand", "p_partkey", 11, 0),
        ("p_type", "p_partkey", 13, 1),
        ("p_name", "p_partkey", 17, 2),
        ("p_size", "p_partkey", 19, 3),
        ("p_retailprice", "p_partkey", 23, 4),
    ],
    "supplier": [
        ("s_name", "s_suppkey", 7, 0),
        ("s_acctbal", "s_suppkey", 11, 1),
    ],
}


@pytest.fixture(scope="session")
def nulltpch_dir(spark, tmp_path_factory):
    """The real sf0.001 TPC-H tables with deterministic NULL injection
    into group-key and measure columns (keys untouched — joins keep
    their full shape); events/documents/embeddings symlink to the real
    corpus."""
    d = tmp_path_factory.mktemp("nulltpch_sf")
    for t, specs in _INJECT.items():
        df = spark.read.parquet(table_path(SF_SMALL, t))
        for col, key, mod, rem in specs:
            df = df.withColumn(
                col,
                F.when(F.col(key) % mod == rem, F.lit(None)).otherwise(
                    F.col(col)
                ),
            )
        df.coalesce(1).write.parquet(os.path.join(str(d), f"{t}.parquet"))
    for t in TABLES:
        if t not in _INJECT:
            os.symlink(table_path(SF_SMALL, t), table_path(str(d), t))
    return str(d)


@pytest.fixture(scope="session")
def nulltpch_duck(nulltpch_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{table_path(nulltpch_dir, t)}"
            + ("/*.parquet')" if t in _INJECT else "')")
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", TPCH_NAMES)
def test_nulltpch_parity(name, spark, nulltpch_dir, nulltpch_duck):
    assert_parity(
        QUERIES[name](spark, nulltpch_dir),
        nulltpch_duck.sql(ORACLES[name]),
        f"nulltpch:{name}",
    )
