"""Capture-side transformations: op filter -> column-diff gate -> envelope.

The per-subscription dataflow the reference bakes into a generated
trigger function (cdc_webhook--1.0.sql:215-352), expressed as a
declarative plan over a change feed. All narrow column ops — a
subscription adds zero shuffles to the stream.
"""

from __future__ import annotations

import operator
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import MapType, StringType, StructType

from ..config import SubscriptionConfig
from ..envelope import project_envelope


def op_filter(changes: DataFrame, cfg: SubscriptionConfig) -> DataFrame:
    """P1: restrict to the subscribed op set — the Spark analog of baking
    `BEFORE|AFTER INSERT OR UPDATE ...` into the trigger DDL
    (cdc_webhook--1.0.sql:201,355-366). Pushed into the source scan."""
    return changes.filter(F.col("op").isin(*cfg.operations))


def _image_field(side: str, col: str, dtype) -> Column:
    """Tracked-column accessor for either image representation: struct
    field in typed mode (getField — the tracked name is a LITERAL field
    name, so a dotted Postgres column like "a.b" is never misread as a
    nested path), element_at in schema-on-read (map) mode — a missing
    map key yields NULL, so a column added mid-stream diffs as
    NULL-vs-value (fires) and a dropped one as NULL-vs-NULL (quiet)."""
    if isinstance(dtype, StructType):
        return F.col(side).getField(col)
    return F.element_at(F.col(side), col)


def column_diff_gate(
    changes: DataFrame,
    cfg: SubscriptionConfig,
    old_col: str = "old",
    new_col: str = "new",
) -> DataFrame:
    """P2: on UPDATE, pass only if a tracked column changed — per-column
    `NEW.c IS DISTINCT FROM OLD.c`, OR-folded (cdc_webhook--1.0.sql:
    204-212, evaluated :229-235). eqNullSafe is the exact
    IS NOT DISTINCT FROM analog. Empty tracked set suppresses ALL update
    events (README.md:119-122). Works over typed-struct AND
    map<string,string> (schema-on-read) images; old_col/new_col name the
    image columns to compare (capture_pipeline points them at the
    side-parsed maps in schema-on-read mode)."""
    if "UPDATE" not in cfg.operations:
        return changes
    not_update = F.col("op") != "UPDATE"
    if not cfg.update_columns:
        return changes.filter(not_update)
    dtype = changes.schema[new_col].dataType
    any_changed = reduce(
        operator.or_,
        [
            ~_image_field(new_col, c, dtype).eqNullSafe(
                _image_field(old_col, c, dtype)
            )
            for c in cfg.update_columns
        ],
    )
    return changes.filter(not_update | any_changed)


def capture_pipeline(changes: DataFrame, cfg: SubscriptionConfig) -> DataFrame:
    """Full capture-side plan: returns (seq, op, envelope, payload) rows
    ready for a sink. Works identically on batch and streaming inputs —
    the same declarative plan in both modes.

    Image representation is schema-on-read by default: raw JSON-string
    old/new images (the feed's wire format, CHANGE_SCHEMA) are parsed to
    map<string,string> FOR THE DIFF GATE ONLY, which survives
    monitored-table ALTERs with no subscription restart — the
    reference's row_to_json drift tolerance (cdc_webhook--1.0.sql:
    266-277, SURVEY.md §1.4). The envelope carries the ORIGINAL raw
    JSON text: re-serializing the string map would retype every
    number/bool to a string and flatten nested objects, which is not
    what row_to_json delivers. Callers that ran parse_images (typed
    structs) keep typed column-diff semantics and struct-serialized
    images."""
    dtype = changes.schema["new"].dataType
    if isinstance(dtype, StringType):
        gated = column_diff_gate(
            op_filter(changes, cfg)
            .withColumn("old_map", F.from_json("old", "map<string,string>"))
            .withColumn("new_map", F.from_json("new", "map<string,string>")),
            cfg,
            old_col="old_map",
            new_col="new_map",
        ).drop("old_map", "new_map")
        return project_envelope(gated, cfg)
    if not isinstance(dtype, (StructType, MapType)):
        raise TypeError(
            f"old/new images must be json string, struct, or map — got {dtype}"
        )
    return project_envelope(column_diff_gate(op_filter(changes, cfg), cfg), cfg)
