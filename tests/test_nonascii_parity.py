"""Non-ASCII parity gate: the full documents-derived oracle surface
re-proven over a deliberately MULTIBYTE corpus (CJK, Cyrillic, Greek,
accented Latin, kana, emoji).

Every text/gram operator — winnowing's char-addressed grams, the
positional 20-gram suffix spans, shingles, BPE, fingerprints — slices
strings by CHARACTER; an implementation that byte-addresses (or an
oracle that does: DuckDB strlen() is bytes, length() is characters)
diverges exactly and only on input like this, which the driver's
ASCII-only documents table never exercises (r4 verdict ask #6). The
corpus embeds the dup structure the dedup queries need: exact dup
pairs, one-word-edit near-dups, and a long shared multibyte paragraph
at different offsets for the substring-span family.
"""

from __future__ import annotations

import os

import pytest

from postgres_cdc_plugin_spark import registry

from .conftest import assert_parity

QUERIES = registry.queries()
ORACLES = registry.oracle_sql()

# Every documents-only oracle query (token_heavy_hitters is rows-only):
# asserted below so a new text query is automatically pulled into this
# gate. Opt-outs are queries that ALSO read the embeddings table, which
# this fixture doesn't carry: docs_embed_join, and docs_hybrid_search's
# kNN leg (its text-touching BM25 leg is covered end-to-end on
# multibyte terms by test_nonascii_bm25_multibyte_terms below).
_EMBEDDINGS_JOINERS = {
    "docs_embed_join",
    "docs_hybrid_search",
    "docs_dedup_modality_agreement",
}
NONASCII_NAMES = sorted(
    n
    for n in ORACLES
    if n.startswith(("docs_", "token_")) and n not in _EMBEDDINGS_JOINERS
)

_POOLS = {
    "zh": (
        "数据 查询 引擎 分布式 计算 流处理 窗口 聚合 分区 排序 "
        "哈希 连接 扫描 内存 磁盘 网络 任务 调度 容错 副本"
    ).split(),
    "ru": (
        "данные запрос движок поток окно соединение раздел сортировка "
        "узел кластер память диск сеть задача отказ реплика"
    ).split(),
    "de": (
        "größe straße bäume käse übung fähig zuverlässig verfügbar "
        "ausführung verzögerung schlüssel spalte zeile tabelle"
    ).split(),
    "el": (
        "δεδομένα ερώτημα μηχανή ροή παράθυρο συνένωση διαμέρισμα "
        "ταξινόμηση κόμβος συστάδα μνήμη δίσκος δίκτυο"
    ).split(),
    "ja": (
        "データ クエリ エンジン 分散 計算 ストリーム 窓 集約 区画 整列 "
        "結合 走査 メモリ ディスク 通信 課題 予定 耐障害 🚀 ✨"
    ).split(),
}
_LANGS = sorted(_POOLS)

# the long shared multibyte paragraph for the substring-span family
_SHARED_SPAN = (
    "分布式查询引擎在大规模数据集上执行窗口聚合与哈希连接时 "
    "должен сохранять детерминированный порядок сортировки "
    "ώστε τα αποτελέσματα να είναι αναπαραγώγιμα σε κάθε εκτέλεση "
    "— übergroße Zwischenergebnisse füllen sonst den Arbeitsspeicher."
)


def _doc_text(doc_id: int) -> str:
    lang = _LANGS[doc_id % len(_LANGS)]
    pool = _POOLS[lang]
    n_words = 30 + (doc_id * 13) % 70
    words = [pool[(doc_id * 7 + i * 3) % len(pool)] for i in range(n_words)]
    return " ".join(words)


def _build_corpus() -> list[dict]:
    docs = []
    for doc_id in range(40):
        docs.append({"doc_id": doc_id, "text": _doc_text(doc_id)})
    # exact duplicates
    docs.append({"doc_id": 40, "text": _doc_text(3)})
    docs.append({"doc_id": 41, "text": _doc_text(10)})
    # near duplicates: one-word edit / one-word extension
    docs.append({"doc_id": 42, "text": _doc_text(5).replace(" ", " ", 1) + " конец"})
    docs.append({"doc_id": 43, "text": "начало " + _doc_text(6)})
    # shared long multibyte paragraph at different offsets
    docs.append({"doc_id": 44, "text": _SHARED_SPAN + " " + _doc_text(7)})
    docs.append({"doc_id": 45, "text": _doc_text(8) + " " + _SHARED_SPAN})
    docs.append(
        {
            "doc_id": 46,
            "text": _doc_text(9) + " " + _SHARED_SPAN + " " + _doc_text(11),
        }
    )
    # heavy repetition (repetition/boilerplate filters)
    docs.append({"doc_id": 47, "text": " ".join(["спам спам 重复 重复"] * 25)})
    # PII-ish + mixed-script punctuation
    docs.append(
        {
            "doc_id": 48,
            "text": "контакт: иван@example.com тел 555-123-4567 城市 café ñandú",
        }
    )
    # tiny doc (degenerate length)
    docs.append({"doc_id": 49, "text": "短"})
    for d in docs:
        d["lang"] = _LANGS[d["doc_id"] % len(_LANGS)]
        d["source"] = f"src{d['doc_id'] % 3}"
        d["n_chars"] = len(d["text"])
    return docs


@pytest.fixture(scope="session")
def nonascii_dir(tmp_path_factory):
    """Write the multibyte corpus as <dir>/documents.parquet — the same
    layout session.load expects, so every query runs unmodified."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = _build_corpus()
    d = tmp_path_factory.mktemp("nonascii_sf")
    table = pa.table(
        {
            "doc_id": pa.array([x["doc_id"] for x in docs], pa.int64()),
            "text": pa.array([x["text"] for x in docs], pa.string()),
            "lang": pa.array([x["lang"] for x in docs], pa.string()),
            "source": pa.array([x["source"] for x in docs], pa.string()),
            "n_chars": pa.array([x["n_chars"] for x in docs], pa.int64()),
        }
    )
    pq.write_table(table, os.path.join(str(d), "documents.parquet"))
    return str(d)


@pytest.fixture(scope="session")
def nonascii_duck(nonascii_dir):
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{os.path.join(nonascii_dir, 'documents.parquet')}')"
    )
    yield con
    con.close()


def test_nonascii_surface_is_complete():
    # only embeddings-table joiners may opt out of this gate
    text_queries = {
        n for n in ORACLES if n.startswith(("docs_", "token_"))
    }
    assert text_queries - set(NONASCII_NAMES) == _EMBEDDINGS_JOINERS


@pytest.mark.parametrize("name", NONASCII_NAMES)
def test_nonascii_parity(name, spark, nonascii_dir, nonascii_duck):
    assert_parity(
        QUERIES[name](spark, nonascii_dir),
        nonascii_duck.sql(ORACLES[name]),
        f"nonascii:{name}",
    )


@pytest.fixture(scope="session")
def nulltext_dir(spark, tmp_path_factory):
    """NULL-text and empty-text corpus — the recurring
    oracle-divergence class (the synthetic corpora never carry either,
    so an over-broad coalesce or a DuckDB fold seed silently disagrees
    with Spark's NULL-propagating expression until this gate catches
    it; r7 advice found the first instance, r8's sweep the second).
    One NULL-text doc whose language has no other documents (the
    all-NULL-aggregate edge), one empty-text doc, and ASCII anchors."""
    import os

    d = tmp_path_factory.mktemp("nulltext_sf")
    spark.createDataFrame(
        [
            (0, "a b c d e f g", "en", "s0", 13),
            (1, None, "fr", "s0", 0),
            (2, "a b c d e f g", "de", "s1", 13),
            (3, "", "el", "s1", 0),
            (4, "h i j k l m n o p q", "en", "s2", 19),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(os.path.join(str(d), "documents.parquet"))
    return str(d)


@pytest.fixture(scope="session")
def nulltext_duck(nulltext_dir):
    import os

    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{os.path.join(nulltext_dir, 'documents.parquet')}/*.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize(
    "name",
    [
        # docs_ingest_chain_kn is the sweep's one slow-tier member
        # (87 s — the five-stage composite's plan overhead, r15
        # verify-gate tier): its NULL behavior is a strict projection
        # of docs_ingest_chain_contam's (the six-stage sample IS the
        # kn sample widened by two columns), which stays always-on,
        # as do the audit's per-stage counts over the same stage sets.
        pytest.param(n, marks=pytest.mark.slow)
        if n == "docs_ingest_chain_kn"
        else n
        for n in NONASCII_NAMES
    ],
)
def test_nulltext_parity(name, spark, nulltext_dir, nulltext_duck):
    """Every documents-derived oracle query must degrade IDENTICALLY on
    NULL and empty text on both engines (promoted in r9 from the
    hand-listed C4/mixture sweep to the full auto-included surface —
    the same completeness contract as the non-ASCII gate above)."""
    assert_parity(
        QUERIES[name](spark, nulltext_dir),
        nulltext_duck.sql(ORACLES[name]),
        f"nulltext:{name}",
    )


def test_nonascii_bm25_multibyte_terms(spark, nonascii_dir, nonascii_duck):
    """The registered docs_bm25_search terms are ASCII and absent from
    this corpus (its registry parity run retrieves nothing), so prove
    the retrieval path END-TO-END on multibyte query terms: CJK,
    Cyrillic, and kana terms that DO occur here. Exercises tokenize /
    tf / df / idf / decimal-summed scoring / top-k on text where a
    byte-addressing bug would diverge."""
    from postgres_cdc_plugin_spark.operators.text import _bm25_sql, bm25_search
    from postgres_cdc_plugin_spark.session import load

    terms = ("данные", "データ", "查询")
    spark_df = bm25_search(load(spark, nonascii_dir, "documents"), terms)
    assert spark_df.count() > 0, "multibyte terms must retrieve documents"
    assert_parity(
        spark_df, nonascii_duck.sql(_bm25_sql(terms)), "nonascii:bm25_terms"
    )


def test_unicode_normalize_edge_cases(spark, tmp_path_factory):
    """docs_unicode_normalize on inputs the synthetic corpora never
    carry: NFD-decomposed accents (e + combining acute), zero-width
    chars inside words, BOM prefix, soft hyphen, tab/newline runs, and
    a leading/trailing NBSP (which must SURVIVE — the collapse class is
    explicitly ASCII-only). Proven semantically and by exact oracle
    parity."""
    import duckdb

    from postgres_cdc_plugin_spark.operators.text import docs_unicode_normalize
    from postgres_cdc_plugin_spark.registry import oracle_sql

    from .conftest import assert_parity

    texts = [
        "Café du  monde",          # NFD -> NFC composes é
        "zero​width ﻿bom",     # invisibles stripped
        "tab\tand\nnewline\r\frun",      # ASCII runs collapse
        " edge nbsp ",          # NBSP kept (not ASCII space)
        " plain  spaces  ",               # collapse + trim
        "soft­hyphen",               # soft hyphen stripped
        None,                        # NULL text -> NULL norm_text (r7 advice)
    ]
    d = tmp_path_factory.mktemp("nfc_edge")
    spark.createDataFrame(
        [(i, t, "xx", "s", len(t) if t else 0) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(d / "documents.parquet"))

    rows = {r.doc_id: r for r in docs_unicode_normalize(spark, str(d)).collect()}
    assert rows[0].norm_text == "Café du monde" and rows[0].changed
    assert rows[1].norm_text == "zerowidth bom"
    assert rows[2].norm_text == "tab and newline run"
    assert rows[3].norm_text == " edge nbsp "  # NBSP survives
    assert rows[4].norm_text == "plain spaces"
    assert rows[5].norm_text == "softhyphen"
    assert rows[6].norm_text is None and rows[6].changed is None
    assert all(
        r.n_chars_after == len(r.norm_text)
        for r in rows.values()
        if r.norm_text is not None
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet/*.parquet')"
    )
    assert_parity(
        docs_unicode_normalize(spark, str(d)),
        con.sql(oracle_sql()["docs_unicode_normalize"]),
        "docs_unicode_normalize",
    )
    con.close()
