"""Quantitative check for the HyperLogLog++ sketch query: the rows-only
approx_count_distinct result must sit within the configured relative
error of the exact distinct count."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from postgres_cdc_plugin_spark.operators import analytics as A
from postgres_cdc_plugin_spark.session import load


def test_approx_percentile_error_bound(spark, sf_dir):
    """approx_percentile (accuracy=10000) vs the exact full-sort
    percentile: at these scales the sketch's rank error (<=0.01%) means
    the returned value must be within a tight relative band of exact.
    The registered query is now the GK bound AUDIT (r8 graduation) —
    its booleans must all hold — and the raw estimates, recomputed
    inline with the same expression, keep the tighter value-band check
    against the exact percentiles."""
    audit = {
        r.l_returnflag: r
        for r in A.lineitem_approx_percentiles(spark, sf_dir).collect()
    }
    for k, r in audit.items():
        assert r.price_p50_bound_ok and r.price_p95_bound_ok, k
        assert r.qty_p50_bound_ok, k
    li = load(spark, sf_dir, "lineitem")
    approx = {
        r.l_returnflag: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.expr("approx_percentile(l_extendedprice, 0.5, 10000)").alias(
                "price_p50"
            ),
            F.expr("approx_percentile(l_extendedprice, 0.95, 10000)").alias(
                "price_p95"
            ),
            F.expr("approx_percentile(l_quantity, 0.5, 10000)").alias(
                "qty_p50"
            ),
        )
        .collect()
    }
    exact = {r.l_returnflag: r for r in A.lineitem_percentiles(spark, sf_dir).collect()}
    assert set(approx) == set(exact) == set(audit)
    for k in exact:
        for col in ("price_p50", "price_p95", "qty_p50"):
            a, e = approx[k][col], exact[k][col]
            assert abs(a - e) / abs(e) <= 0.01, f"{k}.{col}: {a} vs exact {e}"


def test_approx_distinct_error_bound(spark, sf_dir):
    """The graduated relation's audit booleans hold, its exact side
    matches an independently-computed exact distinct, and the raw
    HLL++ estimate really is inside the contracted bound (the direct
    check the boolean compresses)."""
    rows = {
        r.event_type: r for r in A.approx_distinct_users(spark, sf_dir).collect()
    }
    raw = {
        r.event_type: r
        for r in load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", A._HLL_RSD).alias("est"),
            F.count_distinct("user_id").alias("n"),
        )
        .collect()
    }
    assert set(rows) == set(raw)
    for k, r in rows.items():
        assert r.hll_bound_ok, f"{k}: bound violated in relation"
        assert r.n_exact_users == raw[k].n
        rel_err = abs(raw[k].est - raw[k].n) / raw[k].n
        assert rel_err <= A._HLL_ERR_BOUND, f"{k}: {raw[k].est} vs {raw[k].n}"


def test_c4_punct_gate_enforces_retention(spark, sf_dir):
    """The punctuation rule is ENFORCED, not reported: kept lines are a
    subset of punctuated lines, retention varies with the injection
    interval k (the profile sweep the gate exists to exercise), and
    k <= _C4_LINE_WORDS docs retain every full line while sparse-k docs
    lose some."""
    from postgres_cdc_plugin_spark.operators import text as T

    rows = T.docs_c4_punct_gate(spark, sf_dir).collect()
    assert rows
    by_k: dict[int, list] = {}
    for r in rows:
        assert r.n_kept_lines <= r.n_punct_lines  # kept requires punct
        assert r.n_kept_lines <= r.n_lines
        by_k.setdefault(r.punct_every_k, []).append(r)
    assert set(by_k) == {2, 3, 4, 5}
    rate = {
        k: sum(r.n_kept_lines for r in rs) / max(sum(r.n_lines for r in rs), 1)
        for k, rs in by_k.items()
    }
    # k=5 lines of 5 words always end punctuated; sparser k loses lines
    assert rate[5] > rate[4] > 0
    assert any(r.n_kept_lines > 0 for r in rows)
    assert any(r.n_kept_lines < r.n_lines for r in rows)


def test_c4_line_filter_rules_fire(spark, tmp_path):
    """Every C4 rule fires on a bespoke fixture the synthetic corpus
    can't exercise (it has no punctuation, javascript, lorem ipsum, or
    braces): terminal-punctuation reporting, the javascript line drop,
    the short-line drop, the lorem/brace page drops, and the 5-line
    page minimum. Lines are 5-word windows (text.py's _C4_LINE_WORDS).
    """
    from postgres_cdc_plugin_spark.operators import text as T

    docs = [
        # doc 0: 6 lines of 5 words; line 2 ends in '.', line 4 has
        # javascript, line 6 has 2 words (short)
        (0, "w w w w w x x x x x. y y y y y "
            "z z javascript z z q q q q q r r", "en", "s", 0),
        # doc 1: lorem ipsum page, 5 full lines
        (1, "lorem ipsum a b c " + "d e f g h " * 4, "en", "s", 0),
        # doc 2: brace page, one line ending in '?'
        (2, "code { x y z?", "en", "s", 0),
        # doc 3: clean but only 2 lines -> page minimum fails
        (3, "a b c d e f g h i j", "en", "s", 0),
        # doc 4: clean page, 5 lines, all kept
        (4, "k l m n o " * 5, "en", "s", 0),
    ]
    spark.createDataFrame(
        [(i, t.strip(), la, so, len(t.strip())) for i, t, la, so, _ in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    r = {
        x.doc_id: x for x in T.docs_c4_line_filter(spark, str(tmp_path)).collect()
    }
    assert r[0].n_lines == 6 and r[0].n_punct_lines == 1
    assert r[0].n_js_lines == 1 and r[0].n_short_lines == 1
    assert r[0].n_kept_lines == 4 and r[0].kept_words == 20
    assert r[1].page_has_lorem and not r[1].page_keep
    assert r[2].page_has_brace and r[2].n_punct_lines == 1
    assert not r[2].page_keep
    assert not r[3].page_keep and r[3].n_lines == 2
    assert r[4].page_keep and r[4].n_kept_lines == 5


def test_c4_line_dedup_keeps_first_occurrence(spark, tmp_path):
    """Corpus-wide exact line dedup: a line shared by three docs (and
    repeated within one) survives only at its lexicographically first
    (doc_id, line_no); docs rewritten from surviving lines in order."""
    from postgres_cdc_plugin_spark.operators import dedup as D

    dup = "a b c d e"
    docs = [
        (0, f"{dup} x y z w v", "en", "s", 0),
        (1, f"p q r s t {dup}", "en", "s", 0),
        (2, f"{dup} {dup}", "en", "s", 0),
        (3, "solo", "en", "s", 0),
    ]
    spark.createDataFrame(
        [(i, t, la, so, len(t)) for i, t, la, so, _ in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    r = {
        x.doc_id: x for x in D.docs_c4_line_dedup(spark, str(tmp_path)).collect()
    }
    assert r[0].n_lines == 2 and r[0].n_dup_lines == 0
    assert r[1].n_lines == 2 and r[1].n_dup_lines == 1
    assert r[2].n_lines == 2 and r[2].n_dup_lines == 2
    assert r[2].kept_chars == 0  # fully deduped -> empty rewrite
    assert r[3].n_lines == 1 and r[3].n_kept_lines == 1


def test_repetition_filter_single_token_doc(spark, tmp_path):
    # empty bigram array: 0/0 must yield NULL (matching DuckDB), not an
    # ANSI DIVIDE_BY_ZERO crash — the test corpora have no single-token
    # docs, so this edge needs its own fixture
    from postgres_cdc_plugin_spark.operators import text as T

    spark.createDataFrame(
        [(1, "solo", "en", "s", 4), (2, "a b a b a", "en", "s", 9)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        r.doc_id: r
        for r in T.docs_repetition_filter(spark, str(tmp_path)).collect()
    }
    # a single-token doc has top_token_frac 1.0, so keep is False on
    # both engines (False AND NULL = False); the bigram share is NULL
    assert out[1].dup_bigram_frac is None and out[1].keep is False
    assert out[2].dup_bigram_frac > 0.0


def test_pii_scan_detects_and_redacts(spark, tmp_path):
    # the driver corpora carry no PII (the oracle there pins regex-
    # engine parity only), so detection + deterministic redaction need
    # their own fixture
    import hashlib

    from postgres_cdc_plugin_spark.operators import text as T

    dirty = (
        "contact bob@example.com or alice@test.org, "
        "call 555-123-4567, server at 10.0.0.1 thanks"
    )
    clean = "no personal information in this document at all"
    spark.createDataFrame(
        [(1, dirty, "en", "s", len(dirty)), (2, clean, "en", "s", len(clean))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    out = {r.doc_id: r for r in T.docs_pii_scan(spark, str(tmp_path)).collect()}
    assert (out[1].n_emails, out[1].n_phones, out[1].n_ips) == (2, 1, 1)
    assert out[1].has_pii is True
    expected_redacted = (
        "contact <EMAIL> or <EMAIL>, call <PHONE>, server at <IP> thanks"
    )
    assert out[1].redacted_md5 == hashlib.md5(
        expected_redacted.encode()
    ).hexdigest()
    assert out[2].has_pii is False
    assert out[2].redacted_md5 == hashlib.md5(clean.encode()).hexdigest()


def test_funnel_is_monotone(spark, sf_dir):
    """Ordered-funnel invariant: each stage's population is a subset of
    the previous stage's (strictly-after semantics can only lose
    users), and pct_of_entry is the exact count ratio."""
    rows = sorted(A.events_funnel(spark, sf_dir).collect(), key=lambda r: r.stage_idx)
    assert [r.stage for r in rows] == ["signup", "view", "click", "purchase"]
    counts = [r.n_users for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert rows[0].pct_of_entry == 1.0
    for r in rows:
        assert 0.0 <= r.pct_of_entry <= 1.0
        assert r.pct_of_entry == round(r.n_users / rows[0].n_users, 4)


def test_retention_week0_counts_every_user(spark, sf_dir):
    """Every user is active in their own cohort week by definition, so
    the week_offset=0 diagonal must sum to the distinct user count and
    every cell must be positive."""
    df = A.events_retention_cohorts(spark, sf_dir)
    rows = df.collect()
    n_users = load(spark, sf_dir, "events").select("user_id").distinct().count()
    week0 = sum(r.n_active for r in rows if r.week_offset == 0)
    assert week0 == n_users
    assert all(r.n_active > 0 and r.week_offset >= 0 for r in rows)


def test_user_paths_bounded_by_trigram_total(spark, sf_dir):
    """Top-20 path counts are each >= 1, globally ordered, and their sum
    cannot exceed the exact number of length-3 windows (sum over users
    of max(0, n_events - 2))."""
    rows = A.events_user_paths(spark, sf_dir).collect()
    assert len(rows) == 20
    counts = [r.n_occurrences for r in rows]
    assert counts == sorted(counts, reverse=True)
    per_user = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    total_trigrams = sum(max(0, r.n - 2) for r in per_user)
    assert 0 < sum(counts) <= total_trigrams


def test_rfm_scores_are_balanced_quintiles(spark, sf_dir):
    """ntile(5) invariants: scores in 1..5 and bucket sizes differ by at
    most one within each dimension; the segment code decomposes back
    into its three digits."""
    rows = A.orders_rfm_segments(spark, sf_dir).collect()
    for dim in ("r_score", "f_score", "m_score"):
        sizes = {}
        for r in rows:
            s = getattr(r, dim)
            assert 1 <= s <= 5
            sizes[s] = sizes.get(s, 0) + 1
        assert max(sizes.values()) - min(sizes.values()) <= 1
    for r in rows:
        assert r.rfm_segment == r.r_score * 100 + r.f_score * 10 + r.m_score


def test_mad_anomalies_are_minority_per_type(spark, sf_dir):
    """MAD flags at 3x the median deviation must mark a strict minority
    of each event_type (by the definition of the median, at least half
    the rows sit at or below 1 MAD)."""
    rows = A.events_anomaly_mad(spark, sf_dir).collect()
    by_type = {}
    for r in rows:
        tot, anom = by_type.get(r.event_type, (0, 0))
        by_type[r.event_type] = (tot + 1, anom + bool(r.is_anomaly))
    for t, (tot, anom) in by_type.items():
        assert anom < tot / 2, f"{t}: {anom}/{tot} flagged"


def test_bpe_merge_semantics_on_runs(spark, tmp_path):
    """The replace-based merge application must be greedy left-to-right
    BPE: a run 'o o o' with merge (o,o) becomes 'oo o', never 'o oo',
    and bracketed symbols can never match a suffix ('xa b' vs rule
    (a,b)). Pinned on a synthetic corpus where the winning first merge
    is the run character."""
    from postgres_cdc_plugin_spark.operators import text as T

    # 'ooo' contributes (o,o) twice per word; five copies make (o,o)
    # the clear first merge, and the second iteration sees 'oo','o'
    text = " ".join(["ooo"] * 5 + ["xab"])
    spark.createDataFrame(
        [(1, text, "en", "s", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    rows = sorted(
        T.token_bpe_merges(spark, str(tmp_path)).collect(),
        key=lambda r: r.merge_rank,
    )
    assert (rows[0].sym_a, rows[0].sym_b, rows[0].freq) == ("o", "o", 10)
    # after the greedy rewrite each 'ooo' is ['oo','o'], so the second
    # merge pairs 'oo' with 'o' at freq 5 (not 'o','oo' — left-to-right)
    assert (rows[1].sym_a, rows[1].sym_b, rows[1].freq) == ("oo", "o", 5)


def test_winnowing_guarantee(spark, tmp_path):
    """The winnowing property: two documents sharing a substring of
    length >= k + w - 1 (= 15 here) must share at least one selected
    fingerprint, regardless of where the substring sits in each doc.
    Also checks density: selected fingerprints are ~2/(w+1) of grams,
    never more than 1 per window start."""
    from postgres_cdc_plugin_spark.operators import text as T

    shared = "zqxjkvbwpyfgmdh"  # 15 chars = k + w - 1
    d1 = "aaaaaaaa" + shared + "bbbbbbbbbbbb"
    d2 = "cccccccccccccccccc" + shared + "dddddd"
    spark.createDataFrame(
        [(1, d1, "en", "s", len(d1)), (2, d2, "en", "s", len(d2))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    rows = T.docs_winnowing(spark, str(tmp_path)).collect()
    fps = {1: set(), 2: set()}
    for r in rows:
        fps[r.doc_id].add(r.fp)
    assert fps[1] & fps[2], "shared 15-char substring produced no common fingerprint"
    for doc_id, text in ((1, d1), (2, d2)):
        n_windows = (len(text) - 7) - 7
        n_sel = sum(1 for r in rows if r.doc_id == doc_id)
        assert 1 <= n_sel <= n_windows


def test_heavy_hitters_guarantees(spark, sf_dir):
    """Misra-Gries contract on the driver corpus: estimates never
    exceed true counts, undercount is bounded by N/(k+1), and every
    token above the guarantee threshold is reported — checked directly
    on the raw merged sketch, and the graduated audit relation's
    booleans must all be TRUE with the exact guaranteed-token set."""
    from postgres_cdc_plugin_spark.operators import text as T
    from postgres_cdc_plugin_spark.operators.text import _MG_COUNTERS

    est = {r.token: r.est_count for r in T.mg_token_sketch(spark, sf_dir).collect()}
    true = {
        r.w: r.n
        for r in load(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_total = sum(true.values())
    bound = n_total / (_MG_COUNTERS + 1)
    for t, e in est.items():
        assert e <= true[t], f"{t}: est {e} > true {true[t]}"
        assert true[t] - e <= bound
    for t, n in true.items():
        if n > bound:
            assert t in est, f"heavy token {t} ({n} > {bound:.0f}) missing"
    audit = T.token_heavy_hitters(spark, sf_dir).collect()
    assert {r.token for r in audit} == {t for t, n in true.items() if n > bound}
    for r in audit:
        assert r.reported_ok and r.bound_ok, r
        assert r.exact_count == true[r.token]


def test_heavy_hitters_under_decrement_pressure(spark, tmp_path):
    """With vocabulary >> k the decrement path must actually run and the
    guarantees must still hold: a synthetic corpus with 3 dominant
    tokens over a 200-token tail."""
    import random

    from postgres_cdc_plugin_spark.operators import text as T
    from postgres_cdc_plugin_spark.operators.text import _MG_COUNTERS

    rng = random.Random(7)
    true: dict[str, int] = {}
    docs = []
    for doc_id in range(40):
        words = []
        for _ in range(50):
            if rng.random() < 0.45:
                w = f"heavy{rng.randrange(3)}"
            else:
                w = f"tail{rng.randrange(200)}"
            words.append(w)
            true[w] = true.get(w, 0) + 1
        docs.append((doc_id, " ".join(words), "en", "s", 0))
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    est = {
        r.token: r.est_count
        for r in T.mg_token_sketch(spark, str(tmp_path)).collect()
    }
    n_total = sum(true.values())
    bound = n_total / (_MG_COUNTERS + 1)
    for t, e in est.items():
        assert e <= true[t]
    for i in range(3):
        t = f"heavy{i}"
        assert true[t] > bound  # the fixture really is heavy
        assert t in est
        assert true[t] - est[t] <= bound
    # the audit relation under genuine decrement pressure: every
    # guaranteed token present, both booleans TRUE
    audit = {r.token: r for r in T.token_heavy_hitters(spark, str(tmp_path)).collect()}
    assert set(audit) == {t for t, n in true.items() if n > bound}
    assert all(r.reported_ok and r.bound_ok for r in audit.values())


def test_count_min_sketch_invariants(spark, sf_dir):
    """CMS contract: estimates never undercount, the min-over-rows is
    tight for at least one token (some bucket holds only that token or
    its sole collision), and every estimate is bounded by the corpus
    total (the degenerate all-collide bucket)."""
    from postgres_cdc_plugin_spark.operators import text as T

    rows = T.token_count_min(spark, sf_dir).collect()
    assert rows
    n_total = sum(r.exact_count for r in rows)
    assert all(r.overcount >= 0 for r in rows)
    assert any(r.overcount == 0 for r in rows)
    assert all(r.est_count <= n_total for r in rows)


def test_zorder_cells_bound_both_dimensions(spark, sf_dir):
    """The quad-tree property that makes z-order worth paying for: every
    z-bucket (16-bit Morton key >> 10) spans at most a 32x32 box in the
    (pk_lo, sk_lo) plane — so parquet min/max stats prune selective
    predicates on EITHER column. A single-column sort bounds only its
    own column."""
    rows = A.lineitem_zorder_layout(spark, sf_dir).collect()
    assert len(rows) > 1  # the audit actually partitions the space
    for r in rows:
        assert r.pk_max - r.pk_min <= 31, r
        assert r.sk_max - r.sk_min <= 31, r
        # the cell base is 32-aligned in both dims (quad-tree cells)
        assert r.pk_min // 32 == r.pk_max // 32
        assert r.sk_min // 32 == r.sk_max // 32


def test_fuzzy_match_blocking_is_lossless_on_adversarial_names(spark):
    """PassJoin segment blocking vs brute force on a synthetic corpus
    built to stress every lossless claim: shared constant prefixes
    (degenerate equal-split segments), pure indel variants (position
    shifts), length differences up to the full budget, names shorter
    than _FUZZY_SHORT, and cross-block near-misses that must NOT
    match. Deterministic corpus — no RNG."""
    import itertools

    from postgres_cdc_plugin_spark.operators import analytics as A

    base = [
        "Customer#000000001",
        "Customer#000000002",  # 1 sub from above
        "Customer#00000001",  # 1 deletion (shift tail)
        "Customer#0000000012",  # 1 insertion
        "Cust#000000001",  # far (4 deletions)
        "ACME Corp",
        "ACME Corp.",  # 1 insertion
        "ACME Co",  # 2 edits from ACME Corp
        "AB",  # short-name branch
        "ABC",  # short, 1 edit from AB
        "ZB",  # short, 1 sub from AB
        "completely-different-string",
    ]
    rows = []
    for idx, name in enumerate(base):
        # two blocks: same names exist in both, but pairs must never
        # cross the (segment, nation) boundary
        rows.append((idx, name, "BLK1", 0))
        rows.append((100 + idx, name + "x" if idx % 3 == 0 else name, "BLK2", 1))
    df = spark.createDataFrame(
        rows, "c_custkey long, c_name string, c_mktsegment string, c_nationkey long"
    )
    import postgres_cdc_plugin_spark.session as S

    orig = S.load
    try:
        S.load = lambda sp, sf, t: df  # noqa: ARG005
        A.load, saved = S.load, A.load
        got = sorted(
            (r.custkey_a, r.custkey_b, r.edit_distance)
            for r in A.customer_fuzzy_match(spark, "ignored").collect()
        )
    finally:
        A.load = saved
        S.load = orig

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    want = sorted(
        (ka, kb, lev(na, nb))
        for (ka, na, sa, za), (kb, nb, sb, zb) in itertools.combinations(rows, 2)
        if sa == sb and za == zb and lev(na, nb) <= A._FUZZY_MAX_DIST
    )
    assert got == want


def test_triangle_degree_orientation(spark, monkeypatch):
    """Degree-ordered compact-forward triangles: a hub graph pins both
    the counts and the orientation claim — the hub (max degree) must
    emit ZERO wedges (it is never the lowest-ranked corner), which is
    the whole point of degree ordering on skewed graphs."""
    from pyspark.sql import functions as F

    from postgres_cdc_plugin_spark.operators import analytics as A

    # hub 100 connected to leaves 1..6; triangle edges among leaves:
    # (1,2) closes hub-1-2; (3,4) closes hub-3-4; (1,3) closes hub-1-3
    edges = [(1, 100), (2, 100), (3, 100), (4, 100), (5, 100), (6, 100),
             (1, 2), (3, 4), (1, 3)]
    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], "part_a long, part_b long"
    )
    monkeypatch.setattr(A, "_copurchase_pairs", lambda sp, sf: pairs)
    out = {r.node: r.n_triangles for r in A.part_triangle_counts(spark, "x").collect()}
    assert out == {100: 3, 1: 2, 2: 1, 3: 2, 4: 1}

    # orientation invariant: every oriented edge points to the
    # higher-(degree, id) endpoint, so the hub's out-degree is 0
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    hub_out = [
        (a, b) for a, b in edges
        if (deg[a], a) > (deg[b], b)  # hub would be 'lo' only if lower-ranked
        and a == 100
    ]
    assert hub_out == []  # rank(100) is maximal: never a wedge source


def test_interval_join_invariant_to_bin_width(spark, sf_dir):
    """The time-bin width is PHYSICAL tuning only: rerunning the binned
    interval join with a 4x finer bin must produce the identical result
    relation (the exact overlap predicate decides membership; bins only
    route candidates)."""
    import postgres_cdc_plugin_spark.operators.analytics as A

    base = sorted(
        A.events_interval_join(spark, sf_dir).collect(),
        key=lambda r: (r.user_id, r.session_id),
    )
    orig = A._IJ_BIN_US
    try:
        A._IJ_BIN_US = orig // 4
        fine = sorted(
            A.events_interval_join(spark, sf_dir).collect(),
            key=lambda r: (r.user_id, r.session_id),
        )
    finally:
        A._IJ_BIN_US = orig
    assert base == fine


def test_column_profile_null_and_distinct_accounting(spark):
    """column_profile on a corpus WITH nulls (the sf tables have none):
    null rows leave n_rows, join n_null, and stay out of n_distinct and
    min/max; an all-null column profiles as 0-distinct with NULL
    bounds."""
    import postgres_cdc_plugin_spark.operators.analytics as A

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b"), (None, None)],
        "k int, s string",
    )
    rows = {r.col_name: r for r in A.column_profile(df, ("k", "s")).collect()}
    k, s = rows["k"], rows["s"]
    assert (k.n_rows, k.n_null, k.n_distinct) == (4, 1, 2)
    assert (k.min_val, k.max_val) == ("1", "2")
    assert (s.n_rows, s.n_null, s.n_distinct) == (4, 2, 2)
    assert (s.min_val, s.max_val) == ("a", "b")
    allnull = spark.createDataFrame([(None,), (None,)], "x string")
    r = A.column_profile(allnull, ("x",)).collect()[0]
    assert (r.n_rows, r.n_null, r.n_distinct) == (2, 2, 0)
    assert r.min_val is None and r.max_val is None


def test_column_profile_is_two_scans(spark, sf_dir):
    """The whole 11-column profile reads lineitem exactly TWICE — the
    no-distinct stats pass plus the one Expand-based multi-distinct
    pass — never the per-column scan union the UNION ALL oracle
    spelling would cost (11 scans), and never the fused single
    aggregate (a measured 5.8x regression: every cheap aggregate
    re-evaluated over the expanded relation)."""
    import postgres_cdc_plugin_spark.operators.analytics as A
    from postgres_cdc_plugin_spark.plans import inspect

    plan = inspect.physical_plan(A.lineitem_column_profile(spark, sf_dir))
    assert plan.count("Scan parquet") == 2, plan
    assert plan.count("Expand") == 1, plan


def test_hll_sketches_merge_losslessly(spark, sf_dir):
    """The documented 100 TB degrade for exact rolling/global distincts
    (events_dau_wau_mau, lineitem_column_profile, approx_distinct_users)
    is HLL sketch merging — valid because sketch union is register-wise
    max, associative and commutative: the union of per-day sketches must
    estimate EXACTLY what one single-pass sketch over the whole log
    estimates, not approximately."""
    from pyspark.sql import functions as F

    from postgres_cdc_plugin_spark.session import load

    ev = load(spark, sf_dir, "events")
    whole = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est")
    ).collect()[0].est
    merged = (
        ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]
        .est
    )
    assert whole == merged


def test_fertility_reconciles_with_bpe_encode(spark, sf_dir):
    """Cross-query consistency: token_fertility_by_lang's per-language
    word/BPE-token totals must equal token_bpe_encode's per-doc totals
    rolled up by the doc's language — both ride the same trained
    vocabulary, so any divergence is a kernel drift."""
    from postgres_cdc_plugin_spark.operators import text as T
    from postgres_cdc_plugin_spark.session import load

    fert = {
        r.lang: r for r in T.token_fertility_by_lang(spark, sf_dir).collect()
    }
    enc = T.token_bpe_encode(spark, sf_dir)
    langs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    rolled = {
        r.lang: r
        for r in enc.join(langs, "doc_id")
        .groupBy("lang")
        .agg(
            F.sum("n_words").alias("w"), F.sum("n_bpe_tokens").alias("t")
        )
        .collect()
    }
    assert set(fert) == set(rolled)
    for lang in fert:
        assert fert[lang].n_words == rolled[lang].w, lang
        assert fert[lang].n_bpe_tokens == rolled[lang].t, lang


def test_temperature_mix_properties(spark, sf_dir):
    """The temperature-mix algebra: raw shares sum to 1 exactly (they
    partition the token total), temperature shares sum to 1 within
    rounding, factors are anti-monotone in share (alpha < 1 compresses
    the distribution), and because sum(factor_i * share_i) = 1 the
    smallest-share language is never downsampled and the largest never
    upsampled."""
    from postgres_cdc_plugin_spark.operators import text as T

    rows = sorted(
        T.docs_lang_temperature_mix(spark, sf_dir).collect(),
        key=lambda r: r.share,
    )
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-12
    assert abs(sum(r.temp_share for r in rows) - 1.0) < 1e-5
    for a, b in zip(rows, rows[1:]):
        assert a.sample_factor >= b.sample_factor  # anti-monotone
    assert rows[0].sample_factor >= 1.0  # rarest language upsampled
    assert rows[-1].sample_factor <= 1.0  # dominant language downsampled


@pytest.mark.parametrize(
    "sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
@pytest.mark.parametrize("prefix_chars", [1, 2])
def test_mixture_bucketed_fill_matches_exact_window(spark, sf, prefix_chars):
    """The two-pass bucketed-histogram admission (the 100 TB path) is
    RESULT-INVARIANT to the exact per-language window — every ledger
    column, both SFs, and across bucket widths (the
    events_interval_join bin-width-invariance convention): offset +
    intra-bucket cumulative must reproduce the global cumulative
    exactly, because hex-prefix bucket order coarsens the
    (priority, doc_id) total order."""
    from postgres_cdc_plugin_spark.operators import text as T

    from .conftest import normalize

    exact = normalize(T.docs_mixture_sample(spark, sf).toPandas())
    alt = normalize(
        T.mixture_sample_bucketed(spark, sf, prefix_chars).toPandas()
    )
    assert exact.equals(alt), (
        f"bucketed fill diverged at prefix_chars={prefix_chars}, sf={sf}"
    )


def test_mixture_sample_realizes_quotas(spark, sf_dir):
    """The admission ledger's algebra: per language the selected set is
    a PREFIX of the (priority, doc_id) order, its token total never
    exceeds the quota, and adding the first rejected doc would exceed
    it (the fill is maximal); quotas themselves are floor(temp_share x
    budget) of the temperature relation."""
    from postgres_cdc_plugin_spark.operators import text as T

    rows = T.docs_mixture_sample(spark, sf_dir).collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    mix = {r.lang: r for r in T.docs_lang_temperature_mix(spark, sf_dir).collect()}
    budget = sum(m.n_tokens for m in mix.values()) // 2
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: (r.priority, r.doc_id))
        q = rs[0].quota_tokens
        assert q == int(mix[lang].temp_share * budget)
        sel = [r.selected for r in rs]
        # prefix property: no selected row after the first rejection
        if False in sel:
            cut = sel.index(False)
            assert not any(sel[cut:]), lang
        tok_sel = sum(r.n_tokens for r in rs if r.selected)
        assert tok_sel <= q, lang
        rejected = [r for r in rs if not r.selected]
        if rejected:
            assert tok_sel + rejected[0].n_tokens > q, lang


def test_approx_distinct_null_users_parity(spark, tmp_path):
    """NULL-user_id events must not inflate n_exact_users: the exact
    side counts only non-null deduped users, matching both the HLL
    sketch (which skips NULLs) and the oracle's count(DISTINCT user_id)
    (r9 advice #1 — the driver corpora carry no NULL user_id, so this
    gate exercises the divergence the sweep can't)."""
    import os

    import duckdb

    from postgres_cdc_plugin_spark import registry

    from .conftest import assert_parity

    d = str(tmp_path / "nulluser_sf")
    spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 10, "click", 1.0, "{}"),
            (2, "2024-01-01 00:01:00", None, "click", 2.0, "{}"),
            (3, "2024-01-01 00:02:00", 11, "click", 3.0, "{}"),
            (4, "2024-01-01 00:03:00", None, "view", 4.0, "{}"),
            (5, "2024-01-01 00:04:00", None, "view", 5.0, "{}"),
            (6, "2024-01-01 00:05:00", 10, "click", 6.0, "{}"),
        ],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id",
        "event_type", "value", "props",
    ).coalesce(1).write.parquet(os.path.join(d, "events.parquet"))

    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW events AS SELECT * FROM read_parquet("
            f"'{os.path.join(d, 'events.parquet')}/*.parquet')"
        )
        assert_parity(
            A.approx_distinct_users(spark, d),
            con.sql(registry.oracle_sql()["approx_distinct_users"]),
            "nulluser:approx_distinct_users",
        )
    finally:
        con.close()
    # the boolean must hold too: est (NULL-skipping) vs the non-null
    # exact count — 2 clicks, 1 view
    rows = {r.event_type: r for r in A.approx_distinct_users(spark, d).collect()}
    assert rows["click"].n_exact_users == 2
    assert rows["view"].n_exact_users == 0 or rows["view"].hll_bound_ok
    assert rows["click"].hll_bound_ok


def test_unimax_capped_is_prefix_and_conserves_budget(spark, sf_dir):
    """The water-filling closed form's two load-bearing claims: (1)
    cappedness is a PREFIX of the (cap_tokens, lang) order — the
    property that makes the one-pass window formulation equal to the
    sequential fill; (2) the allocation is conservative — capped
    languages get exactly their cap, uncapped languages split the
    remainder evenly, and the total equals the budget whenever any
    language is uncapped; nobody exceeds the epoch cap."""
    from postgres_cdc_plugin_spark.operators.text import (
        _UNIMAX_BUDGET_DEN,
        _UNIMAX_BUDGET_NUM,
        _UNIMAX_EPOCHS,
        docs_unimax_mix,
    )

    rows = docs_unimax_mix(spark, sf_dir).collect()
    assert rows
    ordered = sorted(rows, key=lambda r: (r.cap_tokens, r.lang))
    flags = [r.capped for r in ordered]
    assert flags == sorted(flags, reverse=True), flags  # prefix property
    total = sum(r.n_tokens for r in rows)
    budget = total * _UNIMAX_BUDGET_NUM // _UNIMAX_BUDGET_DEN
    for r in rows:
        if r.capped:
            assert r.alloc_tokens == float(r.cap_tokens)
            assert r.epochs_used == float(_UNIMAX_EPOCHS)
        else:
            assert r.epochs_used <= _UNIMAX_EPOCHS + 1e-12
    if any(not r.capped for r in rows):
        got = sum(r.alloc_tokens for r in rows)
        assert abs(got - budget) <= 1e-6 * max(budget, 1), (got, budget)
    # the sf corpora are skewed enough to exercise BOTH branches
    assert any(r.capped for r in rows) and any(not r.capped for r in rows)


def test_unimax_matches_sequential_waterfill(spark, tmp_path):
    """Third-implementation reference (the C4/line-dedup convention):
    the one-pass closed form must equal the SEQUENTIAL water-filling
    loop the UniMax paper describes, across the regimes that flip its
    branches — skewed (mixed capped/uncapped), uniform (none capped),
    zero-token languages, a single language, and capacity ties."""
    from postgres_cdc_plugin_spark.operators.text import (
        _UNIMAX_BUDGET_DEN,
        _UNIMAX_BUDGET_NUM,
        _UNIMAX_EPOCHS,
        docs_unimax_mix,
    )

    def sequential(tokens: dict[str, int]):
        budget = sum(tokens.values()) * _UNIMAX_BUDGET_NUM // _UNIMAX_BUDGET_DEN
        caps = sorted((n * _UNIMAX_EPOCHS, lang) for lang, n in tokens.items())
        remaining, m = budget, len(caps)
        out = {}
        for cap, lang in caps:
            if cap * m < remaining:  # uniform share still exceeds cap
                out[lang] = (True, float(cap))
                remaining -= cap
            else:
                out[lang] = (False, remaining / m if m else None)
                # remaining/m is constant for every later (larger) cap:
                # consume one share per language
                remaining -= remaining / m
            m -= 1
        return budget, out

    cases = [
        {"en": 100, "fr": 10, "de": 12, "zh": 9},   # skewed: 3 capped
        {"a": 20, "b": 20, "c": 20, "d": 20},        # uniform: none capped
        {"x": 0, "y": 0, "z": 50},                   # zero-token languages
        {"solo": 37},                                # single language
        {"p": 15, "q": 15, "r": 90},                 # capacity tie
    ]
    for i, tokens in enumerate(cases):
        d = tmp_path / f"unimax_{i}"
        rows = [
            (j, " ".join(["w"] * n) if n else "", lang, "s", 2 * n)
            for j, (lang, n) in enumerate(sorted(tokens.items()))
        ]
        spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(str(d / "documents.parquet"))
        _, expect = sequential(tokens)
        got = {r.lang: r for r in docs_unimax_mix(spark, str(d)).collect()}
        assert set(got) == set(tokens), (i, got)
        for lang, (capped, alloc) in expect.items():
            r = got[lang]
            assert r.capped == capped, (i, lang, r)
            if alloc is None:
                assert r.alloc_tokens is None
            else:
                assert abs(r.alloc_tokens - alloc) < 1e-9, (i, lang, r, alloc)


def test_unimax_sample_conserves_and_fills_quota(spark, sf_dir):
    """The replication ledger's contract: per language, delivered
    tokens (copies x doc tokens) never exceed the integer quota, the
    extra-copy set is a PREFIX of the admission order, and the fill is
    maximal — the first denied doc would have overflowed the
    remainder."""
    from collections import defaultdict

    from postgres_cdc_plugin_spark.operators.text import docs_unimax_sample

    rows = docs_unimax_sample(spark, sf_dir).collect()
    assert rows
    by_lang = defaultdict(list)
    for r in rows:
        by_lang[r.lang].append(r)
    for _lang, rs in by_lang.items():
        quota, lt = rs[0].quota_tokens, rs[0].lang_tokens
        assert all(
            r.quota_tokens == quota and r.lang_tokens == lt for r in rs
        )
        delivered = sum(
            r.n_copies * r.n_tokens
            for r in rs
            if r.n_copies is not None and r.n_tokens is not None
        )
        assert delivered <= quota
        rem = quota - rs[0].base_copies * lt if lt else 0
        order = sorted(rs, key=lambda r: (r.priority, r.doc_id))
        flags = [r.extra_copy for r in order if r.extra_copy is not None]
        assert flags == sorted(flags, reverse=True)  # prefix property
        denied = [r for r in order if r.extra_copy is False]
        if denied:
            assert denied[0].cum_tokens > rem  # maximal fill


@pytest.mark.parametrize(
    "sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
@pytest.mark.parametrize("prefix_chars", [1, 2])
def test_unimax_bucketed_fill_matches_exact_window(spark, sf, prefix_chars):
    """The UniMax remainder admission's 100 TB path (the shared
    _bucketed_admission kernel under the remainder quota) is
    RESULT-INVARIANT to the exact per-language window — every ledger
    column, both SFs, both bucket widths (the mixture_sample_bucketed
    convention; the invariance argument transfers because the
    admission order is identical)."""
    from postgres_cdc_plugin_spark.operators import text as T

    from .conftest import normalize

    exact = normalize(T.docs_unimax_sample(spark, sf).toPandas())
    alt = normalize(
        T.unimax_sample_bucketed(spark, sf, prefix_chars).toPandas()
    )
    assert exact.equals(alt), (
        f"unimax bucketed fill diverged at prefix_chars={prefix_chars}, sf={sf}"
    )


def test_pr_curve_matches_python_confusion(spark, sf_dir):
    """Independent composition check: the PR sweep's confusion counts
    recomputed in plain Python from the two PROVEN kernels it joins
    (classifier scores, gopher labels) — guards the class of bug
    oracle parity cannot see, where the Spark query and its SQL oracle
    share the same mis-composition."""
    from postgres_cdc_plugin_spark.operators.text import (
        classifier_scores,
        docs_classifier_pr_curve,
        gopher_rules_df,
    )
    from postgres_cdc_plugin_spark.session import load

    docs = load(spark, sf_dir, "documents")
    scored = {r.doc_id: r.score for r in classifier_scores(docs).collect()}
    labels = {r.doc_id: r.keep for r in gopher_rules_df(docs).collect()}
    joined = [(s, labels[d]) for d, s in scored.items() if d in labels]
    rows = docs_classifier_pr_curve(spark, sf_dir).collect()
    assert rows
    for r in rows:
        tp = sum(1 for s, lab in joined if s > r.threshold and lab)
        fp = sum(1 for s, lab in joined if s > r.threshold and not lab)
        fn = sum(1 for s, lab in joined if not s > r.threshold and lab)
        tn = sum(1 for s, lab in joined if not s > r.threshold and not lab)
        assert (r.tp, r.fp, r.fn, r.tn) == (tp, fp, fn, tn), r.threshold
        assert r.tp + r.fp + r.fn + r.tn == len(joined)
        if tp + fp:
            assert r.precision == tp / (tp + fp)
        else:
            assert r.precision is None


def test_dedup_sensitivity_matches_python_sweep(spark, sf_dir):
    """Independent composition check for the threshold sweep: counts
    recomputed in Python from the proven verified-pair relation
    (docs_ngram_jaccard's output) and the corpus size."""
    from postgres_cdc_plugin_spark.operators.dedup import (
        docs_dedup_sensitivity,
        docs_ngram_jaccard,
    )
    from postgres_cdc_plugin_spark.session import load

    pairs = [
        (r.doc_b, r.jaccard)
        for r in docs_ngram_jaccard(spark, sf_dir).collect()
    ]
    n_docs = load(spark, sf_dir, "documents").count()
    rows = docs_dedup_sensitivity(spark, sf_dir).collect()
    assert rows
    for r in rows:
        n_pairs = sum(1 for _, j in pairs if j >= r.threshold)
        dropped = len({b for b, j in pairs if j >= r.threshold})
        assert (r.n_pairs, r.n_dropped) == (n_pairs, dropped), r.threshold
        assert r.n_docs == n_docs and r.n_survivors == n_docs - dropped


def test_kn_probability_mass_per_context(spark, sf_dir):
    """The KN model's mass identity: for every context w1, the
    discounted bigram terms sum to exactly 1 - lambda(w1) (each of the
    right_types observed bigrams gives back D/ctx), so the backoff
    mass is precisely what discounting freed. Checked over the FULL
    model relation, not just the reported top-k."""
    from collections import defaultdict

    from postgres_cdc_plugin_spark.operators.text import (
        _KN_DISCOUNT,
        _bigram_counts,
        _kn_probs,
    )
    from postgres_cdc_plugin_spark.session import load

    model = _kn_probs(
        _bigram_counts(load(spark, sf_dir, "documents"))[1]
    ).collect()
    assert model
    by_w1 = defaultdict(list)
    for r in model:
        by_w1[r.g.split(" ", 1)[0]].append(r)
    for w1, rs in by_w1.items():
        ctx, rt = rs[0].ctx_count, rs[0].right_types
        assert len(rs) == rt, w1  # right_types IS the observed w2 count
        term1_sum = sum((r.cf - _KN_DISCOUNT) / r.ctx_count for r in rs)
        lam = _KN_DISCOUNT * rt / ctx
        assert abs(term1_sum - (1.0 - lam)) < 1e-9, w1
        # p_cont over DISTINCT continuations sums to 1 by construction
        # (sum of left_cont over distinct w2 = total bigram types)
    total_pcont = sum(
        {r.g.split(" ", 1)[1]: r.p_cont for r in model}.values()
    )
    assert abs(total_pcont - 1.0) < 1e-6


def test_kn_band_composes_scorer_and_corpus(spark, sf_dir):
    """Independent composition check for the KN band gate (r11):
    recompute every (lang, band) row in plain Python from the proven
    per-doc scorer relation joined against the corpus langs — bands,
    doc counts, bigram volumes, and surprisal ranges must all match,
    and every corpus document must land in exactly one band (the
    unscored bucket is a visible policy row, never a silent drop)."""
    from collections import defaultdict

    from postgres_cdc_plugin_spark.operators.text import (
        _KN_BAND_HI,
        _KN_BAND_LO,
        docs_kn_band,
        docs_kn_surprisal,
    )
    from postgres_cdc_plugin_spark.session import load

    scores = {
        r.doc_id: r for r in docs_kn_surprisal(spark, sf_dir).collect()
    }
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang").collect()
    expect = defaultdict(lambda: [0, 0, [], []])
    for d in docs:
        s = scores.get(d.doc_id)
        if s is None:
            band = "unscored"
        elif s.kn_surprisal < _KN_BAND_LO:
            band = "below"
        elif s.kn_surprisal > _KN_BAND_HI:
            band = "above"
        else:
            band = "keep"
        slot = expect[(d.lang, band)]
        slot[0] += 1
        if s is not None:
            slot[1] += s.n_bigrams
            slot[2].append(s.kn_surprisal)
    got = docs_kn_band(spark, sf_dir).collect()
    assert sum(r.n_docs for r in got) == len(docs)
    assert {(r.lang, r.band) for r in got} == set(expect)
    for r in got:
        n_docs, n_big, kns, _ = expect[(r.lang, r.band)]
        assert r.n_docs == n_docs
        if r.band == "unscored":
            assert r.n_bigrams is None and r.min_kn is None
        else:
            assert r.n_bigrams == n_big
            assert r.min_kn == min(kns) and r.max_kn == max(kns)


def test_quality_kn_interaction_composes_gate_and_scorer(spark, sf_dir):
    """Independent composition check (r11): recompute the gopher x KN
    cross-tab in plain Python from the two proven per-doc relations
    (docs_gopher_rules' keep verdict, docs_kn_surprisal's scores) —
    group membership, counts, and shares must all match, and every
    document must land in exactly one (verdict, band) cell."""
    from collections import Counter

    from postgres_cdc_plugin_spark.operators.text import (
        _KN_BAND_HI,
        _KN_BAND_LO,
        docs_gopher_rules,
        docs_kn_surprisal,
        docs_quality_kn_interaction,
    )

    keep = {r.doc_id: r.keep for r in docs_gopher_rules(spark, sf_dir).collect()}
    kn = {
        r.doc_id: r.kn_surprisal
        for r in docs_kn_surprisal(spark, sf_dir).collect()
    }
    expect = Counter()
    for doc_id, k in keep.items():
        s = kn.get(doc_id)
        band = (
            "unscored" if s is None
            else "below" if s < _KN_BAND_LO
            else "above" if s > _KN_BAND_HI
            else "keep"
        )
        expect[(k, band)] += 1
    rows = docs_quality_kn_interaction(spark, sf_dir).collect()
    assert {(r.gopher_keep, r.band): r.n_docs for r in rows} == dict(expect)
    assert sum(r.n_docs for r in rows) == len(keep)
    for r in rows:
        assert r.share == r.n_docs / len(keep)


def test_classifier_calibration_composes_scores_and_labels(spark, sf_dir):
    """Independent composition check (r11): recompute every reliability
    bin in plain Python from the proven scored relation and gopher
    labels — bin membership (same clip arithmetic), counts, label
    rates, and the monotone flags under the bin order must all match."""
    from collections import defaultdict

    from postgres_cdc_plugin_spark.operators.text import (
        _CAL_BINS,
        _CAL_LO,
        _CAL_W,
        classifier_scores,
        docs_classifier_calibration,
        docs_gopher_rules,
    )
    from postgres_cdc_plugin_spark.session import load

    docs = load(spark, sf_dir, "documents")
    scores = {r.doc_id: r.score for r in classifier_scores(docs).collect()}
    labels = {
        r.doc_id: r.keep for r in docs_gopher_rules(spark, sf_dir).collect()
    }
    cells = defaultdict(lambda: [0, 0])
    import math

    for doc_id, s in scores.items():
        b = min(max(int(math.floor((s - _CAL_LO) / _CAL_W)), 0), _CAL_BINS - 1)
        cells[b][0] += 1
        cells[b][1] += 1 if labels[doc_id] else 0
    rows = sorted(
        docs_classifier_calibration(spark, sf_dir).collect(),
        key=lambda r: r.bin,
    )
    assert {r.bin: (r.n_docs, r.n_true) for r in rows} == {
        b: tuple(v) for b, v in cells.items()
    }
    prev = None
    for r in rows:
        rate = r.n_true / r.n_docs
        assert r.label_rate == rate
        assert r.rate_monotone == (None if prev is None else rate >= prev)
        prev = rate
