"""Unit tests for the scalar-function layer (SURVEY.md §2.8 mappings),
each asserting the reference-documented behavior it re-expresses."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgres_cdc_plugin_spark.functions import scalar


def test_event_uuid_deterministic(spark):
    df = spark.createDataFrame([(1, "a"), (1, "a"), (2, "b")], "k long, s string")
    out = df.select(scalar.event_uuid("k", "s").alias("id")).collect()
    assert out[0].id == out[1].id  # replay-stable (SURVEY §7 #5)
    assert out[0].id != out[2].id
    assert len(out[0].id) == 32


def test_row_to_json_full_row(spark):
    df = spark.createDataFrame([(1, "x")], "id long, name string")
    out = df.select(scalar.row_to_json().alias("j")).collect()[0].j
    assert out == '{"id":1,"name":"x"}'


def test_headers_to_map_roundtrip(spark):
    df = spark.createDataFrame([('{"X-API-Key":"k","A":"b"}',)], "h string")
    out = df.select(scalar.headers_to_map("h").alias("m")).collect()[0].m
    assert out == {"X-API-Key": "k", "A": "b"}


def test_is_distinct_from_null_semantics(spark):
    # the IS DISTINCT FROM truth table (cdc_webhook--1.0.sql:206)
    df = spark.createDataFrame(
        [(1, 1), (1, 2), (None, 1), (None, None)], "a int, b int"
    )
    out = [r.d for r in df.select(scalar.is_distinct_from("a", "b").alias("d")).collect()]
    assert out == [False, True, True, False]


def test_any_column_changed_empty_set_suppresses(spark):
    df = spark.createDataFrame(
        [((1, "x"), (1, "y"))],
        "old struct<id:int,name:string>, new struct<id:int,name:string>",
    )
    # empty tracked set => False for every row (README.md:119-122)
    assert df.select(scalar.any_column_changed([]).alias("c")).collect()[0].c is False
    assert df.select(scalar.any_column_changed(["name"]).alias("c")).collect()[0].c is True
    assert df.select(scalar.any_column_changed(["id"]).alias("c")).collect()[0].c is False


def test_backoff_delay_schedule(spark):
    # LINEAR constant; EXPONENTIAL ivl*2^n (src/cdc_webhook.c:103-109)
    rows = [("LINEAR", 2, n) for n in range(4)] + [
        ("EXPONENTIAL", 2, n) for n in range(4)
    ]
    df = spark.createDataFrame(rows, "backoff string, ivl int, n int")
    out = [
        r.d
        for r in df.select(
            "backoff", "n", scalar.backoff_delay("backoff", "ivl", "n").alias("d")
        ).orderBy("backoff", "n").collect()
    ]
    assert out == [2, 4, 8, 16, 2, 2, 2, 2]  # EXPONENTIAL sorts first


def test_next_attempt_at(spark):
    df = spark.createDataFrame([("2024-01-01 00:00:00", 90)], "ts string, d int")
    out = df.select(
        scalar.next_attempt_at(F.to_timestamp("ts"), "d").alias("na")
    ).collect()[0].na
    assert out.minute == 1 and out.second == 30


def test_http_success_boundaries(spark):
    df = spark.createDataFrame([(199,), (200,), (299,), (300,), (404,)], "s int")
    out = [r.ok for r in df.select(scalar.http_success("s").alias("ok")).collect()]
    assert out == [False, True, True, False, False]  # src/cdc_webhook.c:137-140


def test_array_is_empty_pg_semantics(spark):
    df = spark.createDataFrame(
        [([],), (["INSERT"],), (None,)], "ops array<string>"
    )
    out = [r.e for r in df.select(scalar.array_is_empty("ops").alias("e")).collect()]
    assert out == [True, False, True]  # cdc_webhook--1.0.sql:180-182


def test_op_subscription_filter(spark):
    df = spark.createDataFrame(
        [("INSERT",), ("UPDATE",), ("DELETE",)], "op string"
    )
    out = df.filter(scalar.op_subscription_filter(["INSERT", "DELETE"])).collect()
    assert sorted(r.op for r in out) == ["DELETE", "INSERT"]


def test_event_uuid_null_and_shifted_segments_do_not_collide(spark):
    """concat_ws silently skips NULLs — per-segment digests must keep
    (NULL, '5') distinct from ('5', NULL), and values containing ':'
    must not blur segment boundaries."""
    df = spark.createDataFrame(
        [(None, "5"), ("5", None), ("a:b", "c"), ("a", "b:c")],
        "k string, s string",
    )
    ids = [r.id for r in df.select(scalar.event_uuid("k", "s").alias("id")).collect()]
    assert len(set(ids)) == 4
