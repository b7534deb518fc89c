"""Value-level invariants for the dedup operator family that the
per-query oracle parity cannot express (cross-query relationships)."""

from __future__ import annotations

import pytest

from postgres_cdc_plugin_spark.operators import dedup as D


def test_cluster_dedup_keeps_one_doc_per_component(spark, sf_dir):
    # the one-per-cluster claim: exactly one survivor per dup component
    # (the canonical), and cluster survivors are a subset of pairwise
    # dedup's (which keeps every LOCAL-minimum member, possibly several
    # per component)
    clusters = D.docs_dup_clusters(spark, sf_dir).collect()
    survivors = {
        r.doc_id for r in D.docs_cluster_dedup(spark, sf_dir).collect()
    }
    by_cluster: dict[int, list[int]] = {}
    for r in clusters:
        by_cluster.setdefault(r.cluster_id, []).append(r.doc_id)
    for cid, members in by_cluster.items():
        kept = [d for d in members if d in survivors]
        assert kept == [cid], (cid, kept)  # exactly the canonical
    pairwise = {
        r.doc_id for r in D.docs_simhash_dedup(spark, sf_dir).collect()
    }
    assert survivors <= pairwise, survivors - pairwise


def test_cc_paths_bit_equal(spark, sf_dir):
    """The scale-adaptive CC dispatch must be invisible in the result:
    single-task union-find and the distributed doubling loop produce
    identical (doc_id, cluster_id) labelings on the same pair set.
    Exercises the distributed path explicitly (the sf under test is
    far below _CC_SINGLE_TASK_EDGE_CAP, so the dispatcher alone would
    never take it)."""
    from postgres_cdc_plugin_spark.session import load

    docs = load(spark, sf_dir, "documents")
    pairs = (
        D._simhash_pairs_df(docs).select("doc_a", "doc_b").localCheckpoint()
    )
    n = pairs.count()
    assert 0 < n <= D._CC_SINGLE_TASK_EDGE_CAP
    single = sorted(
        (r.doc_id, r.cluster_id)
        for r in D._cc_labels_single_task(pairs).collect()
    )
    dist = sorted(
        (r.doc_id, r.cluster_id)
        for r in D._cc_labels_distributed(spark, pairs, n).collect()
    )
    assert single == dist


@pytest.mark.slow  # long-chain convergence drain; CC path bit-equality stays always-on via test_cc_paths_bit_equal (r15 verify-gate tier)
def test_cc_distributed_on_long_chain(spark):
    """Min-label propagation on a path graph (worst-case diameter for
    its size): a 40-vertex chain needs many hop-rounds — validates the
    batched-convergence protocol and pointer doubling actually reach
    the fixpoint, not just on shallow near-dup graphs."""
    edges = [(i, i + 1) for i in range(40)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long").localCheckpoint()
    labels = D._cc_labels_distributed(spark, pairs, len(edges)).collect()
    assert {(r.doc_id, r.cluster_id) for r in labels} == {
        (i, 0) for i in range(41)
    }
    uf = D._cc_labels_single_task(pairs).collect()
    assert {(r.doc_id, r.cluster_id) for r in uf} == {(i, 0) for i in range(41)}


def _strip_self_rep_rows(spark, tmp_path, texts):
    d = tmp_path / "self_rep"
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(d / "documents.parquet"))
    from postgres_cdc_plugin_spark.operators.dedup import (
        docs_strip_self_repetition,
    )

    return {
        r.doc_id: r
        for r in docs_strip_self_repetition(spark, str(d)).collect()
    }


def test_strip_self_repetition_semantics(spark, tmp_path):
    """Pinned removal semantics (K=3, 0-based positions): a start i is a
    repeat iff an identical gram starts at some j < i; covered = union
    of [i, i+2]; the FIRST occurrence always survives; overlapping
    repeats compose by set union."""
    rows = _strip_self_rep_rows(
        spark,
        tmp_path,
        [
            # exact tandem repeat: "x y z x y z q" -> gram at 3 repeats
            # gram at 0 -> positions 3..5 drop, first copy + tail stay
            "x y z x y z q",
            # all-same run "a a a a a": starts 1,2 repeat start 0 ->
            # covered 1..4, only position 0 survives
            "a a a a a",
            # no intra-doc repeat -> lossless passthrough
            "p q r s t u",
            # repeat appears twice more: both later starts covered
            "m n o m n o m n o",
        ],
    )
    assert rows[0].kept_text == "x y z q" and rows[0].n_removed == 3
    assert rows[1].kept_text == "a" and rows[1].n_removed == 4
    assert rows[2].kept_text == "p q r s t u" and rows[2].n_removed == 0
    assert rows[3].kept_text == "m n o" and rows[3].n_removed == 6
    assert all(r.n_words - r.n_removed == len(r.kept_text.split(" ")) for r in rows.values() if r.kept_text)


def test_url_canonicalize_rules(spark, tmp_path):
    """Each canonicalization rule observed on a crafted doc_id: scheme/
    host lowercased, www stripped, default port stripped, non-default
    port kept, tracking params dropped, survivors sorted, fragment and
    trailing slash removed."""
    d = tmp_path / "urls"
    spark.createDataFrame(
        # doc_id 0: http (0%3), www. (0%4), :80 (0%5), trailing / (0%2),
        # utm_source+id query (0%4), #fragment (0%6)
        # doc_id 30: http (30%3=0), '' www (30%4=2), :8080 kept (30%5=0
        # -> :80... careful) -- use 31: 31%3=1 https, 31%4=3 no www,
        # 31%5=1 :8080, 31%2=1 no slash, 31%4=3 no query, 31%6=1 no frag
        [(0, "t", "en", "srcA", 1), (31, "t", "en", "srcB", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(d / "documents.parquet"))
    from postgres_cdc_plugin_spark.operators.dedup import docs_url_canonicalize

    rows = {r.doc_id: r for r in docs_url_canonicalize(spark, str(d)).collect()}
    r0 = rows[0]
    assert r0.url == "http://www.srcA.Example.COM:80/articles/0/?utm_source=feed&id=0#section-2"
    assert r0.canon_url == "http://srca.example.com/articles/0?id=0"
    assert r0.host == "srca.example.com"
    assert r0.n_params_dropped == 1
    r31 = rows[31]
    assert r31.url == "https://srcB.Example.COM:8080/articles/31"
    assert r31.canon_url == "https://srcb.example.com:8080/articles/31"
    assert r31.n_params_dropped == 0


def test_strip_self_repetition_matches_python_reference(spark, tmp_path):
    """Third-implementation check: 300 seeded random docs over a 4-word
    alphabet (dense with accidental repeats) must match a direct
    pure-Python transcription of the pinned semantics — independent of
    both the Spark array-lambda formulation and the DuckDB oracle."""
    import random

    rng = random.Random(7)
    alphabet = ["a", "b", "c", "d"]
    texts = [
        " ".join(rng.choice(alphabet) for _ in range(rng.randrange(1, 26)))
        for _ in range(300)
    ]

    def ref(words, k=3):
        grams = (
            [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
            if len(words) >= k
            else []
        )
        seen: set[str] = set()
        covered: set[int] = set()
        for i, g in enumerate(grams):
            if g in seen:
                covered.update(range(i, i + k))
            else:
                seen.add(g)
        kept = [w for i, w in enumerate(words) if i not in covered]
        return " ".join(kept), len(covered)

    rows = _strip_self_rep_rows(spark, tmp_path, texts)
    assert len(rows) == 300
    for i, t in enumerate(texts):
        want_text, want_removed = ref(t.split(" "))
        assert rows[i].kept_text == want_text, (i, t)
        assert rows[i].n_removed == want_removed, (i, t)


def test_url_canonicalize_matches_urllib_reference(spark, tmp_path):
    """Third-implementation check: the canonicalization rules replayed
    through stdlib urllib.parse (independent URL grammar) over every
    doc_id residue class must equal the regexp formulation."""
    from urllib.parse import urlsplit

    d = tmp_path / "urls_prop"
    n = 120  # covers all (3,4,5,2,6,25,50)-residue combinations' lcm slice
    spark.createDataFrame(
        [(i, "t", "en", f"src{i % 7}", 1) for i in range(n)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(d / "documents.parquet"))
    from postgres_cdc_plugin_spark.operators.dedup import docs_url_canonicalize

    def ref_canon(url: str) -> str:
        u = urlsplit(url)
        scheme = u.scheme.lower()
        host = u.hostname or ""
        if host.startswith("www."):
            host = host[4:]
        keep = u.port is not None and not (
            (scheme == "http" and u.port == 80)
            or (scheme == "https" and u.port == 443)
        )
        path = u.path or "/"
        if len(path) > 1 and path.endswith("/"):
            path = path[:-1]
        tracked = ("fbclid", "gclid", "ref")
        kept = sorted(
            p
            for p in u.query.split("&")
            if p
            and not p.split("=")[0].startswith("utm_")
            and p.split("=")[0] not in tracked
        )
        return (
            f"{scheme}://{host}"
            + (f":{u.port}" if keep else "")
            + path
            + (("?" + "&".join(kept)) if kept else "")
        )

    for r in docs_url_canonicalize(spark, str(d)).collect():
        assert r.canon_url == ref_canon(r.url), (r.doc_id, r.url)


def test_c4_line_dedup_matches_python_reference(spark, tmp_path):
    """Third-implementation check (the r7 strip_self_repetition
    convention): 200 seeded random docs over a 3-word alphabet (dense
    with accidental duplicate 5-word lines, intra- and cross-doc) must
    match a direct pure-Python transcription of the pinned semantics —
    independent of both the Spark formulation and the DuckDB oracle."""
    import hashlib
    import random

    from postgres_cdc_plugin_spark.operators.dedup import docs_c4_line_dedup

    rng = random.Random(11)
    alphabet = ["x", "y", "z"]
    texts = [
        " ".join(rng.choice(alphabet) for _ in range(rng.randrange(1, 23)))
        for _ in range(200)
    ]
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))

    W = 5
    first: dict[str, tuple[int, int]] = {}
    doc_lines: dict[int, list[str]] = {}
    for i, t in enumerate(texts):
        ws = [w for w in t.split(" ") if w]
        lines = [
            " ".join(ws[j * W : (j + 1) * W])
            for j in range(-(-len(ws) // W))
        ]
        doc_lines[i] = lines
        for ln_no, ln in enumerate(lines):
            first.setdefault(ln, (i, ln_no))
    rows = {
        r.doc_id: r for r in docs_c4_line_dedup(spark, str(tmp_path)).collect()
    }
    assert len(rows) == 200
    for i in range(200):
        kept = [
            ln
            for ln_no, ln in enumerate(doc_lines[i])
            if first[ln] == (i, ln_no)
        ]
        kept_text = " ".join(kept)
        r = rows[i]
        assert r.n_lines == len(doc_lines[i]), i
        assert r.n_kept_lines == len(kept), i
        assert r.kept_chars == len(kept_text), i
        assert r.kept_md5 == hashlib.md5(kept_text.encode()).hexdigest(), i


def test_quality_dup_interaction_sums_match_exact_dedup(spark, sf_dir):
    """Cross-query consistency: the interaction audit's totals must
    reconcile exactly with the corpus and the exact-dedup pass it
    audits — sum(n_docs) = corpus size, and sum(n_dup_losers) = docs
    the fingerprint dedup would drop (corpus - distinct fingerprints)."""
    from pyspark.sql import functions as F

    from postgres_cdc_plugin_spark.operators.dedup import (
        _fingerprint,
        docs_quality_dup_interaction,
    )
    from postgres_cdc_plugin_spark.session import load

    agg = (
        docs_quality_dup_interaction(spark, sf_dir)
        .agg(
            F.sum("n_docs").alias("docs"),
            F.sum("n_dup_losers").alias("losers"),
            F.sum("n_dup_docs").alias("dups"),
        )
        .collect()[0]
    )
    docs = load(spark, sf_dir, "documents")
    n = docs.count()
    n_fp = docs.select(_fingerprint().alias("fp")).distinct().count()
    assert agg.docs == n
    assert agg.losers == n - n_fp
    assert agg.dups >= agg.losers  # every loser group also counts its keeper


def test_modality_agreement_reconciles_with_both_families(spark, sf_dir):
    """Cross-query consistency: the agreement relation's per-modality
    pair sets must equal the relations of the families it audits — the
    text side is exactly the verified pairs at the dedup threshold, the
    embedding side exactly embed_neardup_pairs."""
    from pyspark.sql import functions as F

    from postgres_cdc_plugin_spark.operators.dedup import (
        _JACCARD_THRESHOLD,
        _verified_pairs,
    )
    from postgres_cdc_plugin_spark.operators.similarity import (
        docs_dedup_modality_agreement,
        embed_neardup_pairs,
    )
    from postgres_cdc_plugin_spark.session import load

    agree = docs_dedup_modality_agreement(spark, sf_dir)
    text_pairs = sorted(
        (r.doc_a, r.doc_b)
        for r in agree.filter("text_dup").select("doc_a", "doc_b").collect()
    )
    want_text = sorted(
        (r.doc_a, r.doc_b)
        for r in _verified_pairs(load(spark, sf_dir, "documents"))
        .filter(F.col("jaccard") >= _JACCARD_THRESHOLD)
        .select("doc_a", "doc_b")
        .collect()
    )
    assert text_pairs == want_text
    emb_pairs = sorted(
        (r.doc_a, r.doc_b)
        for r in agree.filter("embed_dup").select("doc_a", "doc_b").collect()
    )
    want_emb = sorted(
        (r.vec_a, r.vec_b)
        for r in embed_neardup_pairs(spark, sf_dir)
        .select("vec_a", "vec_b")
        .collect()
    )
    assert emb_pairs == want_emb
    both = sorted(
        (r.doc_a, r.doc_b)
        for r in agree.filter("both_dup").select("doc_a", "doc_b").collect()
    )
    assert set(both) == set(text_pairs) & set(emb_pairs)


def test_c4_span_dedup_matches_python_reference(spark, tmp_path):
    """Third-implementation check for the span-grain C4 dedup: 150
    seeded docs whose lines are sampled from a 6-line pool (dense
    duplicate 3-line spans, overlapping within and across docs) must
    match a pure-Python transcription of keep-first / cover-the-rest /
    islands-union semantics."""
    import hashlib
    import random

    from postgres_cdc_plugin_spark.operators.dedup import docs_c4_span_dedup

    rng = random.Random(29)
    pool = [
        " ".join(ws)
        for ws in (
            ["a"] * 5, ["b"] * 5, ["c"] * 5,
            ["a", "b", "a", "b", "a"],
            ["c", "a", "c", "a", "c"],
            ["b", "c", "b", "c", "b"],
        )
    ]
    doc_lines = [
        [rng.choice(pool) for _ in range(rng.randrange(1, 9))]
        for _ in range(150)
    ]
    texts = [" ".join(lines) for lines in doc_lines]
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))

    first: dict[tuple[str, str, str], tuple[int, int]] = {}
    for i, lines in enumerate(doc_lines):
        for s in range(len(lines) - 2):
            first.setdefault(tuple(lines[s : s + 3]), (i, s))
    rows = {
        r.doc_id: r for r in docs_c4_span_dedup(spark, str(tmp_path)).collect()
    }
    assert len(rows) == 150
    for i, lines in enumerate(doc_lines):
        covered: set[int] = set()
        for s in range(len(lines) - 2):
            if first[tuple(lines[s : s + 3])] != (i, s):
                covered.update(range(s, s + 3))
        kept = [ln for j, ln in enumerate(lines) if j not in covered]
        kept_text = " ".join(kept)
        r = rows[i]
        assert r.n_lines == len(lines), i
        assert r.n_covered_lines == len(covered), i
        assert r.kept_md5 == hashlib.md5(kept_text.encode()).hexdigest(), i


def test_c4_line_dedup_is_idempotent(spark, tmp_path):
    """Fixed point: after one keep-first pass every distinct line
    occurs exactly once corpus-wide, so a SECOND pass over the
    rewritten corpus (rebuilt by the independent python reference)
    must remove nothing. Also pins the re-lining stability that makes
    the property hold: every kept line is 5 words except possibly a
    doc's final line, so rejoining and re-splitting reproduces the
    kept lines exactly."""
    import random

    from postgres_cdc_plugin_spark.operators.dedup import docs_c4_line_dedup

    rng = random.Random(13)
    alphabet = ["p", "q"]
    texts = [
        " ".join(rng.choice(alphabet) for _ in range(rng.randrange(1, 28)))
        for _ in range(120)
    ]
    W = 5
    first: dict[str, tuple[int, int]] = {}
    doc_lines: dict[int, list[str]] = {}
    for i, t in enumerate(texts):
        ws = t.split(" ")
        lines = [
            " ".join(ws[j * W : (j + 1) * W]) for j in range(-(-len(ws) // W))
        ]
        doc_lines[i] = lines
        for ln_no, ln in enumerate(lines):
            first.setdefault(ln, (i, ln_no))
    rewritten = []
    for i, lines in enumerate(doc_lines.values()):
        kept = [
            ln for ln_no, ln in enumerate(lines) if first[ln] == (i, ln_no)
        ]
        if kept:  # fully-deduped docs leave the corpus
            rewritten.append((i, " ".join(kept)))
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rewritten],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    rows = docs_c4_line_dedup(spark, str(tmp_path)).collect()
    assert len(rows) == len(rewritten)
    assert all(r.n_dup_lines == 0 for r in rows)
    assert all(r.n_kept_lines == r.n_lines for r in rows)


def test_dedup_sensitivity_matches_minhash_dedup_at_committed_threshold(
    spark, sf_dir
):
    """The sweep's row at the committed _JACCARD_THRESHOLD must agree
    exactly with the dedup it predicts (both read the SAME persisted
    verified-pair kernel), and both counters must be monotone in the
    threshold — a sweep whose curve crosses itself is mis-joined."""
    rows = {
        r.threshold: r
        for r in D.docs_dedup_sensitivity(spark, sf_dir).collect()
    }
    committed = rows[D._JACCARD_THRESHOLD]
    assert committed.n_survivors == D.docs_minhash_dedup(spark, sf_dir).count()
    ts = sorted(rows)
    drops = [rows[t].n_dropped for t in ts]
    pairs = [rows[t].n_pairs for t in ts]
    assert drops == sorted(drops, reverse=True), drops
    assert pairs == sorted(pairs, reverse=True), pairs
    assert all(
        rows[t].n_survivors + rows[t].n_dropped == rows[t].n_docs for t in ts
    )


def test_softdedup_weights_conserve_cluster_mass(spark, sf_dir):
    """SoftDeDup invariants (r11): every document appears exactly once;
    cluster members carry 1/|cluster| so each component sums to one
    document-equivalent; the total effective corpus size equals the
    cluster-canonical hard-dedup survivor count; singletons keep
    weight 1 and are their own canonical."""
    from collections import Counter

    from postgres_cdc_plugin_spark.operators.dedup import (
        docs_cluster_dedup,
        docs_dup_clusters,
        docs_softdedup_weights,
    )
    from postgres_cdc_plugin_spark.session import load

    rows = docs_softdedup_weights(spark, sf_dir).collect()
    n_docs = load(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs
    assert len({r.doc_id for r in rows}) == n_docs
    by_cluster = Counter()
    for r in rows:
        assert r.weight == 1.0 / r.cluster_size
        by_cluster[r.cluster_id] += r.weight
    for cid, mass in by_cluster.items():
        assert abs(mass - 1.0) < 1e-9, cid
    survivors = docs_cluster_dedup(spark, sf_dir).count()
    assert abs(sum(r.weight for r in rows) - survivors) < 1e-6
    # members of real components carry the labeled sizes verbatim
    labeled = {
        r.doc_id: (r.cluster_id, r.cluster_size)
        for r in docs_dup_clusters(spark, sf_dir).collect()
    }
    for r in rows:
        if r.doc_id in labeled:
            assert (r.cluster_id, r.cluster_size) == labeled[r.doc_id]
        else:
            assert r.cluster_id == r.doc_id and r.cluster_size == 1


def test_softdedup_effective_mass_composes_weights_and_tokens(spark, sf_dir):
    """Independent composition check (r11): recompute every language's
    raw and effective token mass in plain Python from the proven
    weights relation and a whitespace token count — counts, masses
    (to the committed 3-decimal grid), shares, and the zero-sum share
    shift must all hold."""
    from collections import defaultdict
    from decimal import Decimal, ROUND_HALF_UP

    from postgres_cdc_plugin_spark.operators.dedup import (
        docs_softdedup_effective_mass,
        docs_softdedup_weights,
    )
    from postgres_cdc_plugin_spark.session import load

    w = {
        r.doc_id: (r.lang, r.cluster_size)
        for r in docs_softdedup_weights(spark, sf_dir).collect()
    }
    nt = {
        r.doc_id: r.nt
        for r in load(spark, sf_dir, "documents")
        .selectExpr(
            "doc_id",
            "cast(size(filter(split(text, ' '), x -> x != '')) as long) nt",
        )
        .collect()
    }
    raw = defaultdict(int)
    eff = defaultdict(float)
    docs_per = defaultdict(lambda: [0, 0])
    for doc_id, (lang, cs) in w.items():
        t = nt[doc_id]
        docs_per[lang][0] += 1
        docs_per[lang][1] += 1 if cs > 1 else 0
        if t is not None:
            raw[lang] += t
            eff[lang] += t / cs
    rows = docs_softdedup_effective_mass(spark, sf_dir).collect()
    assert {r.lang for r in rows} == set(docs_per)
    for r in rows:
        assert [r.n_docs, r.n_dup_docs] == docs_per[r.lang]
        assert r.raw_tokens == raw[r.lang]
        want = float(
            Decimal(eff[r.lang]).quantize(
                Decimal("0.001"), rounding=ROUND_HALF_UP
            )
        )
        assert abs(r.eff_tokens - want) <= 0.001, r.lang
    assert abs(sum(r.raw_share for r in rows) - 1.0) < 1e-9
    assert abs(sum(r.eff_share for r in rows) - 1.0) < 1e-9
    assert abs(sum(r.share_shift for r in rows)) < 1e-9


def test_lsh_sweep_rebanding_matches_self_join(spark, sf_dir):
    """r14 optimization pin: the sweep's coarser bandings derive from
    the finest candidate set via _rebanded_pairs (signature join-back +
    band-key recount) instead of per-config band self-joins. The
    derived relation must be ROW-IDENTICAL to the self-join form for
    every swept config — including bands_matched — and the nested
    refinement (cand9 ⊆ cand3 ⊆ cand2) the derivation relies on must
    hold on this corpus."""
    from postgres_cdc_plugin_spark.operators.dedup import (
        _LSH_SWEEP_ROWS,
        _candidate_pairs,
        _minhash_sigs,
        _rebanded_pairs,
        _shingles,
    )
    from postgres_cdc_plugin_spark.session import load

    docs = load(spark, sf_dir, "documents")
    sh = _shingles(docs, distinct=True)
    sigs = _minhash_sigs(docs, shingles=sh).persist()
    finest = _LSH_SWEEP_ROWS[0]
    base = _candidate_pairs(sigs, finest).select("doc_a", "doc_b").persist()
    prev_pairs = {tuple(r) for r in base.collect()}
    assert prev_pairs, "sweep fixture produced no candidates"
    for r in _LSH_SWEEP_ROWS[1:]:
        want = sorted(map(tuple, _candidate_pairs(sigs, r).collect()))
        got = sorted(map(tuple, _rebanded_pairs(base, sigs, r).collect()))
        assert got == want, f"rebanded r={r} diverged from the self-join"
        pairs_r = {(a, b) for a, b, _ in want}
        assert pairs_r <= prev_pairs, f"nested refinement broken at r={r}"
        prev_pairs = pairs_r
    sigs.unpersist()
    base.unpersist()


def test_exact_jaccard_size_prune_is_exact(spark, sf_dir):
    """r15 (r14 verdict ask #3): _exact_jaccard's min_jaccard size-ratio
    prune (J <= min(sz)/max(sz), so a pair whose ceiling is below the
    threshold can skip the gram-expansion join) must keep EXACTLY the
    rows the unpruned kernel keeps after the caller's >= threshold
    filter — same pairs, same n_inter/sizes/jaccard values — and must
    actually prune on this corpus (the sweep's r=2 candidate set
    carries size-dissimilar random collisions)."""
    from pyspark.sql import functions as F

    from postgres_cdc_plugin_spark.operators.dedup import (
        _JACCARD_THRESHOLD,
        _LSH_SWEEP_ROWS,
        _candidate_pairs,
        _exact_jaccard,
        _minhash_sigs,
        _shingles,
    )
    from postgres_cdc_plugin_spark.session import load

    docs = load(spark, sf_dir, "documents")
    sh = _shingles(docs, distinct=True).persist()
    base = (
        _candidate_pairs(_minhash_sigs(docs, shingles=sh), _LSH_SWEEP_ROWS[0])
        .select("doc_a", "doc_b")
        .persist()
    )
    t = _JACCARD_THRESHOLD
    want = sorted(
        map(tuple, _exact_jaccard(base, sh)
            .filter(F.col("jaccard") >= t).collect())
    )
    pruned = _exact_jaccard(base, sh, min_jaccard=t)
    got = sorted(map(tuple, pruned.filter(F.col("jaccard") >= t).collect()))
    assert got == want, "size-ratio prune changed the thresholded rows"
    # the prune must bite: fewer pairs enter the gram joins than exist
    n_base = base.count()
    n_kept = pruned.select("doc_a", "doc_b").count()
    assert n_kept < n_base, (n_kept, n_base)
    sh.unpersist()
    base.unpersist()
