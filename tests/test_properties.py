"""Property-based tests (hypothesis) for the pure config/scalar layer,
plus a seeded randomized equivalence check for the column-diff gate.

The reference has no property tests at all (SURVEY.md §5 — black-box
integration only); its retry/backoff and validation semantics are exactly
the kind of small algebra where properties beat examples: the invariants
below hold for EVERY config the reference would accept, not just the
handful its tests construct.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from postgres_cdc_plugin_spark.config import SubscriptionConfig

_valid_interval = st.integers(min_value=1, max_value=600)
_valid_retries = st.integers(min_value=0, max_value=20)
_attempt = st.integers(min_value=0, max_value=20)


def _cfg(**kw) -> SubscriptionConfig:
    base = dict(name="t", table_name="employees", webhook_url="http://x/")
    base.update(kw)
    return SubscriptionConfig(**base)


@given(ivl=_valid_interval, n=_valid_retries, a=_attempt)
def test_linear_backoff_is_constant(ivl, n, a):
    # src/cdc_webhook.c:103-106 — LINEAR delay never depends on attempt
    cfg = _cfg(retry_interval=ivl, retry_number=n, retry_backoff="LINEAR")
    assert cfg.backoff_delay(a) == ivl


@given(ivl=_valid_interval, a=st.integers(min_value=0, max_value=19))
def test_exponential_backoff_doubles(ivl, a):
    # src/cdc_webhook.c:107-109 — interval * 2^n via left shift
    cfg = _cfg(retry_interval=ivl, retry_backoff="EXPONENTIAL")
    assert cfg.backoff_delay(a + 1) == 2 * cfg.backoff_delay(a)
    assert cfg.backoff_delay(0) == ivl


@given(ivl=_valid_interval, n=_valid_retries)
def test_worst_case_sync_stall_closed_form(ivl, n):
    # BASELINE.md "worst-case sync stall": sum of EXPONENTIAL backoff
    # sleeps over the retry budget is interval * (2^retries - 1)
    cfg = _cfg(retry_interval=ivl, retry_number=n, retry_backoff="EXPONENTIAL")
    total = sum(cfg.backoff_delay(a) for a in range(cfg.retry_number))
    assert total == ivl * ((1 << n) - 1)


@given(n=_valid_retries)
def test_attempt_budget_is_retries_plus_one(n):
    # src/cdc_webhook.c:178; tests/test_retries.py:58-62
    assert _cfg(retry_number=n).attempt_budget == n + 1


@given(
    timing=st.text(min_size=1, max_size=10),
    backoff=st.text(min_size=1, max_size=10),
)
def test_invalid_enums_always_raise(timing, backoff):
    # cdc_webhook--1.0.sql:146-153 — anything outside the enum raises
    import pytest

    if timing not in ("BEFORE", "AFTER"):
        with pytest.raises(ValueError):
            _cfg(trigger_timing=timing)
    if backoff not in ("LINEAR", "EXPONENTIAL"):
        with pytest.raises(ValueError):
            _cfg(retry_backoff=backoff)


@given(n=st.integers(max_value=-1), ivl=st.integers(max_value=0))
def test_negative_retry_config_always_raises(n, ivl):
    # cdc_webhook--1.0.sql:171-177
    import pytest

    with pytest.raises(ValueError):
        _cfg(retry_number=n)
    with pytest.raises(ValueError):
        _cfg(retry_interval=ivl)


@given(cancel=st.booleans())
def test_async_cancel_combination_rule(cancel):
    # cdc_webhook--1.0.sql:166-168 — ASYNC+cancel_on_failure rejected
    import pytest

    if cancel:
        with pytest.raises(ValueError):
            _cfg(mode="ASYNC", cancel_on_failure=True)
    else:
        assert _cfg(mode="ASYNC", cancel_on_failure=False).mode == "ASYNC"


@settings(deadline=None, max_examples=30)
@given(
    rows=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(-3, 3)),
            st.one_of(st.none(), st.integers(-3, 3)),
            st.one_of(st.none(), st.integers(-3, 3)),
            st.one_of(st.none(), st.integers(-3, 3)),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_diff_gate_matches_null_safe_reference(rows, spark):
    """any_column_changed == python null-safe != on every generated row,
    including all-NULL columns (IS DISTINCT FROM semantics,
    cdc_webhook--1.0.sql:206). One Spark job per hypothesis example over
    a multi-row batch keeps runtime sane."""
    from postgres_cdc_plugin_spark.functions import scalar

    df = spark.createDataFrame(
        [
            {
                "old": {"a": oa, "b": ob},
                "new": {"a": na, "b": nb},
            }
            for oa, ob, na, nb in rows
        ],
        "old struct<a: int, b: int>, new struct<a: int, b: int>",
    )
    got = [
        r.changed
        for r in df.select(
            scalar.any_column_changed(["a", "b"]).alias("changed")
        ).collect()
    ]
    want = [(oa != na) or (ob != nb) for oa, ob, na, nb in rows]
    assert got == want
