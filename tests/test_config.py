"""Subscription validation rules — mirrors the reference's
tests/test_invalid_trigger_parameters.py:10-63 (each bad config RAISEs)."""

from __future__ import annotations

import pytest

from postgres_cdc_plugin_spark.config import SubscriptionConfig


def _cfg(**kw):
    base = dict(name="t", table_name="employees", webhook_url="http://x/")
    base.update(kw)
    return SubscriptionConfig(**base)


def test_valid_defaults():
    cfg = _cfg()
    assert cfg.operations == ("INSERT", "UPDATE", "DELETE")
    assert cfg.attempt_budget == 4  # retry_number 3 + 1


@pytest.mark.parametrize(
    "kw",
    [
        {"trigger_timing": "DURING"},
        {"retry_backoff": "QUADRATIC"},
        {"security": "PUBLIC"},
        {"mode": "BATCH"},
        {"mode": "ASYNC", "cancel_on_failure": True},
        {"retry_number": -1},
        {"retry_interval": 0},
        {"operations": ()},
        {"operations": ("INSERT", "TRUNCATE")},
    ],
)
def test_invalid_configs_raise(kw):
    with pytest.raises(ValueError):
        _cfg(**kw)


def test_backoff_schedule():
    # LINEAR constant; EXPONENTIAL ivl * 2^n (src/cdc_webhook.c:103-109)
    lin = _cfg(retry_backoff="LINEAR", retry_interval=2)
    exp = _cfg(retry_backoff="EXPONENTIAL", retry_interval=2)
    assert [lin.backoff_delay(n) for n in range(4)] == [2, 2, 2, 2]
    assert [exp.backoff_delay(n) for n in range(4)] == [2, 4, 8, 16]
