"""Central query registry consumed by __spark_entry__.py.

Aggregates QUERIES / ORACLE_SQL from every operator module. Invariants
(enforced by tests/test_oracle_parity.py::test_registry_consistency):
  * every oracle key has a query;
  * queries without an oracle entry are intentionally rows-only
    (non-SQL-expressible ops, e.g. approximate sketches / LSH ANN) and
    must be listed in ROWS_ONLY.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .operators import analytics, cdc, dedup, multimodal, similarity, text

_MODULES = [cdc, analytics, dedup, text, similarity, multimodal]

# Queries that deliberately ship without an oracle (approximate /
# non-SQL-expressible semantics). The driver records a rows-only check.
ROWS_ONLY = {
    "approx_distinct_users",
    "embed_ann_lsh",
    "multimodal_features",
    "multimodal_frame_sample",
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        for name, fn in mod.QUERIES.items():
            if name in out:
                raise ValueError(f"duplicate query name: {name}")
            out[name] = fn
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(getattr(mod, "ORACLE_SQL", {}))
    return out
