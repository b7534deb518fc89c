"""Capture-side transformations: op filter -> column-diff gate -> envelope.

The per-subscription dataflow the reference bakes into a generated
trigger function (cdc_webhook--1.0.sql:215-352), expressed as a
declarative plan over a change feed. All narrow column ops — a
subscription adds zero shuffles to the stream.
"""

from __future__ import annotations

import operator
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import SubscriptionConfig
from ..envelope import project_envelope


def op_filter(changes: DataFrame, cfg: SubscriptionConfig) -> DataFrame:
    """P1: restrict to the subscribed op set — the Spark analog of baking
    `BEFORE|AFTER INSERT OR UPDATE ...` into the trigger DDL
    (cdc_webhook--1.0.sql:201,355-366). Pushed into the source scan."""
    return changes.filter(F.col("op").isin(*cfg.operations))


def column_diff_gate(changes: DataFrame, cfg: SubscriptionConfig) -> DataFrame:
    """P2: on UPDATE, pass only if a tracked column changed — per-column
    `NEW.c IS DISTINCT FROM OLD.c`, OR-folded (cdc_webhook--1.0.sql:
    204-212, evaluated :229-235). eqNullSafe is the exact
    IS NOT DISTINCT FROM analog. Empty tracked set suppresses ALL update
    events (README.md:119-122)."""
    if "UPDATE" not in cfg.operations:
        return changes
    not_update = F.col("op") != "UPDATE"
    if not cfg.update_columns:
        return changes.filter(not_update)
    any_changed = reduce(
        operator.or_,
        [
            ~F.col(f"new.{c}").eqNullSafe(F.col(f"old.{c}"))
            for c in cfg.update_columns
        ],
    )
    return changes.filter(not_update | any_changed)


def capture_pipeline(changes: DataFrame, cfg: SubscriptionConfig) -> DataFrame:
    """Full capture-side plan: returns (seq, op, envelope, payload) rows
    ready for a sink. Works identically on batch and streaming inputs —
    the same declarative plan in both modes."""
    return project_envelope(column_diff_gate(op_filter(changes, cfg), cfg), cfg)
