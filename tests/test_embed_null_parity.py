"""Embeddings-side NULL-parity sweep (r11 — the third leg of the
NULL-hardening arc after the documents sweep (r9) and the events sweep
(r10 ask #5)): every oracle query that reads the embeddings table must
degrade IDENTICALLY on a NULL embedding vector and a NULL label on
both engines. The synthetic embeddings carry no NULLs, so a NULL
vector flowing into a distance/argmin/codebook expression, or a NULL
label flowing into a rollup, sits latent until real data hits it —
the same class the events sweep surfaced 17 instances of.

Auto-included from the registry (any oracle whose SQL references the
embeddings view), so a new embedding query gets the gate for free. The
fixture swaps ONLY embeddings.parquet; every other table symlinks to
the real corpus so the cross-modality joiners run their full plan.
"""

from __future__ import annotations

import os
import re

import duckdb
import pytest

from postgres_cdc_plugin_spark import registry
from postgres_cdc_plugin_spark.session import table_path

from .conftest import SF_SMALL, TABLES, assert_parity

QUERIES = registry.queries()
ORACLES = registry.oracle_sql()

EMBED_NAMES = sorted(
    n for n, sql in ORACLES.items() if re.search(r"\bembeddings\b", sql)
)


def test_sweep_covers_the_embeddings_surface():
    assert {
        "embed_knn",
        "embed_kmeans",
        "embed_ann_ivf",
        "embed_neardup_pairs",
        "embed_intrinsic_dim",
        "embed_cluster_purity",
        "docs_embed_join",
        "docs_hybrid_search",
    } <= set(EMBED_NAMES)
    assert len(EMBED_NAMES) >= 25


_DIM = 64
_N = 30  # normal backbone vectors (vec_id 0 stays the retrieval query)


def _vec(i: int) -> list[float]:
    # deterministic, varied, exactly-representable decimals
    return [((i * 31 + d * 7) % 19 - 9) / 16.0 for d in range(_DIM)]


@pytest.fixture(scope="session")
def nullemb_dir(spark, tmp_path_factory):
    """30 structured vectors (4 labels) + one NULL-embedding row + one
    NULL-label row + one all-NULL payload row."""
    d = tmp_path_factory.mktemp("nullemb_sf")
    rows = [(i, _vec(i), i % 4) for i in range(_N)]
    rows += [
        (_N, None, 1),        # NULL embedding, labeled
        (_N + 1, _vec(77), None),  # normal embedding, NULL label
        (_N + 2, None, None),      # all-NULL payload
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(os.path.join(str(d), "embeddings.parquet"))
    for t in TABLES:
        if t != "embeddings":
            os.symlink(table_path(SF_SMALL, t), table_path(str(d), t))
    return str(d)


@pytest.fixture(scope="session")
def nullemb_duck(nullemb_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{table_path(nullemb_dir, t)}"
            + ("/*.parquet')" if t == "embeddings" else "')")
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", EMBED_NAMES)
def test_nullemb_parity(name, spark, nullemb_dir, nullemb_duck):
    assert_parity(
        QUERIES[name](spark, nullemb_dir),
        nullemb_duck.sql(ORACLES[name]),
        f"nullemb:{name}",
    )
