"""Documents-metadata and multimodal NULL-parity sweeps (r12, r11
verdict ask #6 — the last uncovered columns of the NULL-parity arc):

* documents.lang / documents.source are the GROUP-BY keys of the
  mixture / fertility / CCNet / source-mix / chain families; the
  synthetic corpus never carries a NULL in either, so an oracle that
  coalesces a NULL group key (or an engine-different NULL bucket in a
  window/rollup) sits latent until real data hits it. Sweep surface is
  AUTO-INCLUDED: every oracle whose SQL reads the documents view AND
  references lang or source.
* the multimodal family synthesizes payloads from documents.text, so a
  NULL text is a NULL payload — the missing-media row every real media
  corpus carries. The mm queries were the one family outside both
  existing text sweeps (they are not docs_/token_-prefixed), so NULL
  payload/meta had no gate at all. Sweep surface: every multimodal_*
  oracle plus the modality-agreement cross query.

Same discipline as the events sweep (tests/test_events_null_parity.py):
one fixture with a structured backbone (gate-passing texts, dup pairs,
3 langs x 3 sources) plus one row per NULL class; every other table
symlinks to the real corpus so embeddings joiners run their full plan;
any divergence is fixed ENGINE-MIRRORED, never oracle-patched.
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

# Auto-included surfaces (word-boundary matches so a column merely
# named "...lang..." elsewhere can't leak in).
LANGSRC_NAMES = sorted(
    n
    for n, sql in ORACLES.items()
    if re.search(r"\bdocuments\b", sql)
    and (re.search(r"\blang\b", sql) or re.search(r"\bsource\b", sql))
)
MM_NAMES = sorted(
    n
    for n in ORACLES
    if n.startswith("multimodal_") or n == "docs_dedup_modality_agreement"
)


def test_sweeps_cover_their_surfaces():
    """Auto-inclusion completeness (the events-sweep contract): a regex
    drift that silently empties either sweep must fail loudly."""
    assert {
        "docs_lang_id",
        "docs_lang_temperature_mix",
        "docs_mixture_sample",
        "docs_source_mix",
        "docs_stratified_sample",
        "docs_unimax_mix",
        "docs_ingest_chain",
        "docs_ingest_chain_kn",
        "token_fertility_by_lang",
    } <= set(LANGSRC_NAMES)
    assert len(LANGSRC_NAMES) >= 30
    assert {
        "multimodal_meta",
        "multimodal_dedup",
        "multimodal_features",
        "multimodal_neardup",
        "docs_dedup_modality_agreement",
    } <= set(MM_NAMES)
    assert len(MM_NAMES) >= 10


# Backbone word pool: mostly 5-8 letter alpha words (mean word length
# must clear the Gopher 3.0 floor despite the stopwords) + the gate's
# own stopwords so most backbone docs PASS the rule gate and the
# chain/mixture stages have real work.
_POOL = (
    "engine stream window partition cluster memory network schedule "
    "replica shuffle column vector payload decode sample budget "
    "quota ledger batch commit resume marker corpus bigram model"
).split()
_STOP = ["the", "of", "and", "to", "with"]


def _doc_text(doc_id: int) -> str:
    n_words = 50 + (doc_id * 11) % 40
    words = [_POOL[(doc_id * 7 + i * 3) % len(_POOL)] for i in range(n_words)]
    # two stopword pairs clear the >=2 stopword floor without dragging
    # the mean word length under 3.0
    words[5:5] = [_STOP[doc_id % 5], _STOP[(doc_id + 2) % 5]]
    return " ".join(words)


_LANGS = ["en", "de", "fr"]
_SOURCES = ["web", "books", "wiki"]


@pytest.fixture(scope="session")
def nulldocs_dir(spark, tmp_path_factory):
    """Documents feed with one row per NULL class over a 36-doc
    structured backbone (3 langs x 3 sources, gate-passing lengths,
    exact-dup and near-dup pairs so dedup/cluster/chain stages produce
    rows, two short gate-failing docs). Every other table symlinks to
    the real corpus."""
    d = tmp_path_factory.mktemp("nulldocs_sf")
    rows = []
    for doc_id in range(36):
        t = _doc_text(doc_id)
        rows.append(
            (
                doc_id,
                t,
                _LANGS[doc_id % 3],
                _SOURCES[(doc_id // 3) % 3],
                len(t),
            )
        )
    # exact duplicate + one-word-extension near duplicate
    rows.append((36, _doc_text(3), "de", "web", len(_doc_text(3))))
    near = _doc_text(5) + " epilogue"
    rows.append((37, near, "fr", "books", len(near)))
    # short gate-failing docs (the chains must drop them identically)
    rows.append((38, "tiny doc the of", "en", "wiki", 15))
    rows.append((39, "another small one and to", "de", "web", 24))
    t40, t41, t42 = _doc_text(40), _doc_text(41), _doc_text(42)
    rows += [
        # NULL lang — the mixture/fertility/CCNet group-key class
        (40, t40, None, "web", len(t40)),
        # NULL source — the source-mix / dedup-rate-by-source class
        (41, t41, "en", None, len(t41)),
        # NULL lang AND source — the doubly-unkeyed row
        (42, t42, None, None, len(t42)),
        # NULL text with real keys — NULL payload for the multimodal
        # family, an unscoreable doc for the KN/quality families
        (43, None, "fr", "wiki", 0),
        # all-NULL payload: only the doc_id survives
        (44, None, None, None, None),
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    ).coalesce(1).write.parquet(os.path.join(str(d), "documents.parquet"))
    for t in TABLES:
        if t != "documents":
            os.symlink(table_path(SF_SMALL, t), table_path(str(d), t))
    return str(d)


@pytest.fixture(scope="session")
def nulldocs_duck(nulldocs_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{table_path(nulldocs_dir, t)}"
            + ("/*.parquet')" if t == "documents" else "')")
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", LANGSRC_NAMES)
def test_nulllangsrc_parity(name, spark, nulldocs_dir, nulldocs_duck):
    assert_parity(
        QUERIES[name](spark, nulldocs_dir),
        nulldocs_duck.sql(ORACLES[name]),
        f"nulldocs:{name}",
    )


@pytest.mark.parametrize("name", MM_NAMES)
def test_nullpayload_parity(name, spark, nulldocs_dir, nulldocs_duck):
    assert_parity(
        QUERIES[name](spark, nulldocs_dir),
        nulldocs_duck.sql(ORACLES[name]),
        f"nulldocs:{name}",
    )
