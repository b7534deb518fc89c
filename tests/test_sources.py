"""Source-adapter tests: Debezium envelope parsing and the stateful
change-burst sessionizer."""

from __future__ import annotations

import json

from postgres_cdc_plugin_spark.sources import debezium


def _dbz(op, before=None, after=None, lsn=1, ts_ms=1_700_000_000_000,
         source_ts_ms=None):
    return json.dumps(
        {
            "before": json.dumps(before) if before else None,
            "after": json.dumps(after) if after else None,
            "source": {
                "schema": "public",
                "table": "employees",
                "ts_ms": source_ts_ms if source_ts_ms is not None else ts_ms,
                "lsn": lsn,
            },
            "op": op,
            "ts_ms": ts_ms,
        }
    )


def test_debezium_parse_ops_and_images(spark):
    rows = [
        (_dbz("c", after={"id": 1, "name": "Alice"}, lsn=10),),
        (_dbz("u", before={"id": 1, "name": "Alice"}, after={"id": 1, "name": "Bob"}, lsn=11),),
        (_dbz("d", before={"id": 1, "name": "Bob"}, lsn=12),),
        (_dbz("r", after={"id": 2, "name": "Snap"}, lsn=13),),  # snapshot read
    ]
    out = debezium.parse(spark.createDataFrame(rows, "value string")).orderBy("seq").collect()

    assert [r.op for r in out] == ["INSERT", "UPDATE", "DELETE", "INSERT"]
    assert [r.seq for r in out] == [10, 11, 12, 13]
    assert out[0].old is None and json.loads(out[0].new)["name"] == "Alice"
    assert json.loads(out[1].old)["name"] == "Alice"
    assert json.loads(out[1].new)["name"] == "Bob"
    assert out[2].new is None and json.loads(out[2].old)["name"] == "Bob"
    # key follows the row identity through all ops, incl. DELETE
    assert [r.key for r in out] == ["1", "1", "1", "2"]
    assert all(r.table_schema == "public" and r.table_name == "employees" for r in out)
    assert out[0].ts.year >= 2023


def test_debezium_feeds_capture_pipeline(spark):
    """A parsed Debezium feed drops straight into the engine's capture
    pipeline — adapter output is the canonical change shape."""
    from postgres_cdc_plugin_spark.config import SubscriptionConfig
    from postgres_cdc_plugin_spark.sources.changefeed import parse_images
    from postgres_cdc_plugin_spark.streaming.capture import capture_pipeline

    rows = [
        (_dbz("c", after={"id": 1, "name": "A"}, lsn=1),),
        (_dbz("d", before={"id": 1, "name": "A"}, lsn=2),),
    ]
    changes = parse_images(
        debezium.parse(spark.createDataFrame(rows, "value string")),
        "struct<id: bigint, name: string>",
    )
    cfg = SubscriptionConfig(
        name="dbz", table_name="employees", webhook_url="http://x/",
        operations=["INSERT"],
    )
    out = capture_pipeline(changes, cfg).collect()
    assert len(out) == 1  # DELETE filtered by the op subscription
    assert out[0].envelope.event.op == "INSERT"


def test_debezium_split_quarantines_malformed_not_tombstones(spark):
    """Malformed non-tombstone values land in the quarantine relation
    with their raw bytes (auditable/replayable); tombstones and valid-
    but-unconsumed ops (truncate) stay dropped by design."""
    rows = [
        (_dbz("c", after={"id": 1, "name": "A"}, lsn=1),),
        (None,),  # tombstone: dropped, NOT quarantined
        ("{not valid json at all",),  # malformed: quarantined
        (json.dumps({"foreign": "payload"}),),  # opless: quarantined
        (_dbz("t", lsn=5),),  # truncate: valid envelope, dropped
    ]
    feed = debezium.split(spark.createDataFrame(rows, "value string"))
    assert [r.op for r in feed.changes.collect()] == ["INSERT"]
    quarantined = sorted(r.value for r in feed.quarantine.collect())
    assert quarantined == sorted(
        ["{not valid json at all", json.dumps({"foreign": "payload"})]
    )
    # parse() remains the drop-everything view of the same split
    assert debezium.parse(
        spark.createDataFrame(rows, "value string")
    ).count() == 1


def test_debezium_file_transport_matches_changefeed_envelopes(spark, tmp_path):
    """Transport parity (SURVEY §1.4): the same logical changes fed
    through (a) the file changefeed source and (b) a Debezium dump via
    the file transport produce IDENTICAL canonical envelopes out of
    capture_pipeline — the engine is transport-agnostic."""
    import os

    from postgres_cdc_plugin_spark.config import SubscriptionConfig
    from postgres_cdc_plugin_spark.sources import changefeed
    from postgres_cdc_plugin_spark.sources.changefeed import parse_images
    from postgres_cdc_plugin_spark.streaming.capture import capture_pipeline

    ts = "2024-01-01T10:00:00.000000"
    ts_ms = 1_704_103_200_000
    cf_rows = [
        dict(seq=1, key="1", op="INSERT", table_schema="public",
             table_name="employees", old=None,
             new=json.dumps({"id": 1, "name": "A"}), ts=ts),
        dict(seq=2, key="1", op="UPDATE", table_schema="public",
             table_name="employees",
             old=json.dumps({"id": 1, "name": "A"}),
             new=json.dumps({"id": 1, "name": "B"}), ts=ts),
    ]
    dbz_rows = [
        _dbz("c", after={"id": 1, "name": "A"}, lsn=1, source_ts_ms=ts_ms),
        _dbz("u", before={"id": 1, "name": "A"},
             after={"id": 1, "name": "B"}, lsn=2, source_ts_ms=ts_ms),
    ]
    feed_dir = tmp_path / "cf_feed"
    changefeed.write_chunk(str(feed_dir), cf_rows)
    dump_dir = tmp_path / "dbz_dump"
    os.makedirs(dump_dir)
    with open(dump_dir / "part-0.txt", "w") as f:
        f.write("\n".join(dbz_rows) + "\n")

    cfg = SubscriptionConfig(
        name="parity", table_name="employees", webhook_url="http://x/",
        update_columns=("name",),  # empty set suppresses all UPDATEs
    )
    row_schema = "struct<id: bigint, name: string>"

    def run(stream):
        q = (
            capture_pipeline(parse_images(stream, row_schema), cfg)
            .writeStream.format("memory")
            .queryName(f"parity_{stream.sparkSession.sparkContext.applicationId.replace('-','_')}_{id(stream)}")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        name = q.name
        rows = spark.sql(f"select * from {name}").collect()
        return sorted(
            (
                r.envelope.event.op,
                r.envelope.event.data.old,
                r.envelope.event.data.new,
                r.envelope.table.name,
            )
            for r in rows
        )

    via_changefeed = run(changefeed.read_stream(spark, str(feed_dir)))
    via_debezium = run(debezium.file_stream(spark, str(dump_dir)))
    assert via_changefeed == via_debezium
    assert len(via_changefeed) == 2


def test_stateful_sessionizer_emits_closed_bursts(spark, tmp_path):
    """applyInPandasWithState burst sessionizer: a key's session closes
    (and emits) when a later change arrives past the gap; open sessions
    stay in the state store across micro-batches."""
    import os
    import time

    from postgres_cdc_plugin_spark.sources import changefeed
    from postgres_cdc_plugin_spark.streaming.stateful import sessionize_changes

    feed = tmp_path / "feed"
    os.makedirs(str(feed))
    out: list = []

    def chg(seq, key, hhmm):
        return {
            "seq": seq,
            "key": key,
            "op": "UPDATE",
            "table_schema": "public",
            "table_name": "t",
            "old": None,
            "new": None,
            "ts": f"2024-01-01T{hhmm}:00.000000",
        }

    src = changefeed.read_stream(spark, str(feed), maxFilesPerTrigger="1")
    q = (
        sessionize_changes(src, gap_seconds=1800.0)
        .writeStream.outputMode("append")
        .foreachBatch(lambda b, _i: out.extend(b.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="300 milliseconds")
        .start()
    )

    def wait_batches(n, timeout=60.0):
        deadline = time.time() + timeout
        while time.time() < deadline:
            if sum(1 for p in q.recentProgress if p["numInputRows"] > 0) >= n:
                return
            time.sleep(0.2)
        raise TimeoutError(f"never saw {n} data batches")

    try:
        # burst 1 for key A (2 changes 5 min apart); key B single change
        changefeed.write_chunk(str(feed), [chg(1, "A", "10:00"), chg(2, "A", "10:05"), chg(3, "B", "10:00")])
        wait_batches(1)
        assert out == []  # nothing closed yet
        # key A: change 2h later -> closes burst 1; key B stays open
        changefeed.write_chunk(str(feed), [chg(4, "A", "12:05")])
        wait_batches(2)
        deadline = time.time() + 20
        while time.time() < deadline and not out:
            time.sleep(0.2)
    finally:
        q.stop()

    assert len(out) == 1, out
    s = out[0]
    assert s.key == "A"
    assert s.n_changes == 2
    assert (s.session_start.hour, s.session_start.minute) == (10, 0)
    assert (s.session_end.hour, s.session_end.minute) == (10, 5)


# ---- corpus file-format ingestion (sources/corpus.py) ----------------


def _schema_shape(df):
    return [(f.name, f.dataType.simpleString()) for f in df.schema.fields]


def test_corpus_jsonl_ingest_quarantines_malformed(spark, tmp_path):
    from postgres_cdc_plugin_spark.sources import corpus

    p = tmp_path / "shard.jsonl"
    lines = [
        json.dumps(
            {"doc_id": 1, "text": "hello world", "lang": "en", "source": "s1", "n_chars": 11}
        ),
        # missing n_chars -> backfilled from text length
        json.dumps({"doc_id": 2, "text": "no n_chars", "lang": "en", "source": "s1"}),
        "{this is not json",
        # doc_id of the wrong type -> whole record quarantined
        json.dumps(
            {"doc_id": "abc", "text": "bad id", "lang": "en", "source": "s1", "n_chars": 6}
        ),
        # parseable but unusable (no text) -> quarantined, id preserved
        json.dumps({"doc_id": 5, "text": None, "lang": "en", "source": "s1", "n_chars": 0}),
    ]
    p.write_text("\n".join(lines) + "\n")
    clean, quarantine, raw = corpus.ingest(spark, str(p), "jsonl")

    rows = {r.doc_id: r for r in clean.collect()}
    assert set(rows) == {1, 2}
    assert rows[2].n_chars == len("no n_chars")
    assert _schema_shape(clean) == [
        ("doc_id", "bigint"),
        ("text", "string"),
        ("lang", "string"),
        ("source", "string"),
        ("n_chars", "bigint"),
    ]
    q = quarantine.collect()
    assert len(q) == 3
    raws = {r.raw_record for r in q}
    assert "{this is not json" in raws
    assert 5 in {r.doc_id for r in q}
    raw.unpersist()


def test_corpus_csv_ingest(spark, tmp_path):
    from postgres_cdc_plugin_spark.sources import corpus

    p = tmp_path / "shard.csv"
    p.write_text(
        "doc_id,text,lang,source,n_chars\n"
        "1,alpha beta,en,s0,10\n"
        "oops,gamma,en,s0,5\n"  # bad doc_id type -> quarantined
        "3,delta,de,s1,5\n"
    )
    clean, quarantine, raw = corpus.ingest(spark, str(p), "csv")
    assert {r.doc_id for r in clean.collect()} == {1, 3}
    assert quarantine.count() == 1
    assert "oops" in quarantine.collect()[0].raw_record
    raw.unpersist()


def test_corpus_parquet_ingest_matches_direct_read(spark, sf_dir):
    from postgres_cdc_plugin_spark.sources import corpus

    clean, quarantine, raw = corpus.ingest(
        spark, f"{sf_dir}/documents.parquet", "parquet"
    )
    direct = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert clean.count() == direct.count()
    assert quarantine.count() == 0
    assert [f.name for f in clean.schema.fields] == [
        f.name for f in corpus.DOCUMENTS_SCHEMA.fields
    ]
    raw.unpersist()


def test_corpus_unknown_format_rejected(spark):
    from postgres_cdc_plugin_spark.sources import corpus

    try:
        corpus.ingest(spark, "/nonexistent", "avro")
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "avro" in str(e)


def test_corpus_stream_ingest_routes_clean_and_quarantine(spark, tmp_path):
    # two shards land; the stream routes every batch into the clean
    # corpus and the quarantine audit log exactly once (checkpointed)
    from postgres_cdc_plugin_spark.sources import corpus

    feed = tmp_path / "feed"
    feed.mkdir()
    (feed / "a.jsonl").write_text(
        json.dumps({"doc_id": 1, "text": "one", "lang": "en", "source": "s"})
        + "\n{broken\n"
    )
    (feed / "b.jsonl").write_text(
        json.dumps({"doc_id": 2, "text": "two", "lang": "en", "source": "s"})
        + "\n"
    )
    clean_dir = str(tmp_path / "clean")
    quar_dir = str(tmp_path / "quar")
    ckpt = str(tmp_path / "ckpt")

    q = corpus.stream_ingest(spark, str(feed), clean_dir, quar_dir, ckpt)
    q.awaitTermination(60)

    clean = spark.read.parquet(clean_dir)
    assert {r.doc_id for r in clean.collect()} == {1, 2}
    assert {r.n_chars for r in clean.collect()} == {3}
    quar = spark.read.parquet(quar_dir)
    assert quar.count() == 1 and "{broken" in quar.collect()[0].raw_record

    # restart over the same checkpoint: no new shards -> no duplicates
    q2 = corpus.stream_ingest(spark, str(feed), clean_dir, quar_dir, ckpt)
    q2.awaitTermination(60)
    assert spark.read.parquet(clean_dir).count() == 2


def test_stream_ingest_replayed_batch_not_duplicated(spark, tmp_path):
    """foreachBatch is at-least-once: a REPLAYED micro-batch (fresh
    checkpoint over the same feed -> same batch id) must overwrite its
    own partition, not append duplicates (round-2 review fix)."""
    import json

    from postgres_cdc_plugin_spark.sources import corpus

    feed = tmp_path / "feed"
    feed.mkdir()
    (feed / "a.jsonl").write_text(
        json.dumps({"doc_id": 1, "text": "one", "lang": "en", "source": "s"})
        + "\n"
        + json.dumps({"doc_id": 2, "text": "two", "lang": "en", "source": "s"})
        + "\n"
    )
    clean_dir = str(tmp_path / "clean")
    quar_dir = str(tmp_path / "quar")

    q = corpus.stream_ingest(
        spark, str(feed), clean_dir, quar_dir, str(tmp_path / "ckpt1")
    )
    q.awaitTermination(60)
    assert spark.read.parquet(clean_dir).count() == 2

    # fresh checkpoint replays the same files as batch 0 again
    q2 = corpus.stream_ingest(
        spark, str(feed), clean_dir, quar_dir, str(tmp_path / "ckpt2")
    )
    q2.awaitTermination(60)
    replayed = spark.read.parquet(clean_dir)
    assert replayed.count() == 2
    assert {r.doc_id for r in replayed.collect()} == {1, 2}


def test_debezium_ts_is_database_change_time(spark):
    """ts must come from source.ts_ms (the DB change time), not the
    envelope-level ts_ms (connector processing time) — after a
    connector restart/backfill the two diverge by hours and event-time
    sessions/watermarks would collapse onto 'now'."""
    import datetime

    row = (_dbz(
        "c", after={"id": 1}, lsn=1,
        ts_ms=1_700_003_600_000,          # connector clock: 1h later
        source_ts_ms=1_700_000_000_000,   # DB change time
    ),)
    out = debezium.parse(spark.createDataFrame([row], "value string")).collect()[0]
    assert out.ts == datetime.datetime.utcfromtimestamp(1_700_000_000)


def test_debezium_tombstones_and_unmapped_ops_dropped(spark):
    """Kafka tombstones (null value), truncate events, and unparseable
    values must be dropped, not emitted as all-NULL ghost rows."""
    rows = [
        (_dbz("c", after={"id": 1}, lsn=1),),
        (None,),                      # tombstone
        ("{not json",),               # unparseable
        (_dbz("t", lsn=2),),          # truncate: unmapped op
    ]
    out = debezium.parse(spark.createDataFrame(rows, "value string")).collect()
    assert len(out) == 1 and out[0].op == "INSERT"


def test_debezium_custom_key_field(spark):
    """Tables whose PK is not literally 'id' pass key_field."""
    row = (_dbz("c", after={"order_id": 77, "x": 1}, lsn=1),)
    df = spark.createDataFrame([row], "value string")
    assert debezium.parse(df).collect()[0].key is None
    assert debezium.parse(df, key_field="order_id").collect()[0].key == "77"


def test_stateful_sessionizer_late_event_does_not_regress(spark, tmp_path):
    """A cross-batch LATE event inside the gap must extend the open
    session backwards (start) without moving its end backwards — the
    round-2 fix for the last-regression bug where a later in-gap event
    then measured its gap from the stale earlier time and spuriously
    split the session."""
    import os
    import time

    from postgres_cdc_plugin_spark.sources import changefeed
    from postgres_cdc_plugin_spark.streaming.stateful import sessionize_changes

    feed = tmp_path / "feed"
    os.makedirs(str(feed))
    out: list = []

    def chg(seq, key, hhmm):
        return {
            "seq": seq, "key": key, "op": "UPDATE",
            "table_schema": "public", "table_name": "t",
            "old": None, "new": None,
            "ts": f"2024-01-01T{hhmm}:00.000000",
        }

    src = changefeed.read_stream(spark, str(feed), maxFilesPerTrigger="1")
    q = (
        sessionize_changes(src, gap_seconds=1800.0)
        .writeStream.outputMode("append")
        .foreachBatch(lambda b, _i: out.extend(b.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="300 milliseconds")
        .start()
    )

    def wait_batches(n, timeout=60.0):
        deadline = time.time() + timeout
        while time.time() < deadline:
            if sum(1 for p in q.recentProgress if p["numInputRows"] > 0) >= n:
                return
            time.sleep(0.2)
        raise TimeoutError(f"never saw {n} data batches")

    try:
        changefeed.write_chunk(str(feed), [chg(1, "A", "10:00")])
        wait_batches(1)
        # LATE event 10 min earlier, then one 25 min after 10:00 — all
        # within one session; the buggy version closed at 09:50
        changefeed.write_chunk(str(feed), [chg(2, "A", "09:50")])
        wait_batches(2)
        changefeed.write_chunk(str(feed), [chg(3, "A", "10:25")])
        wait_batches(3)
        assert out == []  # still one open session, nothing closed
        # an event far past the gap closes it: start=09:50, end=10:25
        changefeed.write_chunk(str(feed), [chg(4, "A", "13:00")])
        wait_batches(4)
        deadline = time.time() + 20
        while time.time() < deadline and not out:
            time.sleep(0.2)
    finally:
        q.stop()

    assert len(out) == 1
    sess = out[0]
    assert sess.key == "A" and sess.n_changes == 3
    assert sess.session_start.strftime("%H:%M") == "09:50"
    assert sess.session_end.strftime("%H:%M") == "10:25"


def test_corpus_orc_ingest_roundtrip(spark, sf_dir, tmp_path):
    """ORC ingestion: write the driver documents out as ORC shards, read
    them back through the corpus contract, and require exact row parity
    with the parquet source — format breadth without semantic drift."""
    from postgres_cdc_plugin_spark.sources import corpus

    src = spark.read.parquet(f"{sf_dir}/documents.parquet")
    orc_dir = str(tmp_path / "docs_orc")
    src.write.mode("overwrite").orc(orc_dir)
    clean, quarantine, raw = corpus.ingest(spark, orc_dir, "orc")
    assert quarantine.count() == 0
    assert [f.name for f in clean.schema.fields] == [
        f.name for f in corpus.DOCUMENTS_SCHEMA.fields
    ]
    left = {r.doc_id: r.text for r in clean.collect()}
    right = {r.doc_id: r.text for r in src.collect()}
    assert left == right
    raw.unpersist()


def test_delta_cdf_transport_matches_changefeed(spark):
    """Transport parity (SURVEY §1.4, Delta CDF leg): the same logical
    changes as (a) file-changefeed rows and (b) a CDF-shaped relation
    canonicalize to IDENTICAL change rows — insert/update pre+post
    pairing/delete all covered. This pins the shared transport contract
    from_cdf implements (the on-disk read path is covered end-to-end by
    test_delta_cdf_native_reader_end_to_end below)."""
    from postgres_cdc_plugin_spark.sources import changefeed, delta_cdf

    ts = "2024-01-01 10:00:00"
    cdf_rows = [
        # (id, name, _change_type, _commit_version, _commit_timestamp)
        (1, "A", "insert", 1, ts),
        (1, "A", "update_preimage", 2, ts),
        (1, "B", "update_postimage", 2, ts),
        (2, "C", "insert", 2, ts),
        (1, "B", "delete", 3, ts),
    ]
    cdf = spark.createDataFrame(
        cdf_rows,
        "id long, name string, _change_type string, "
        "_commit_version long, _commit_timestamp string",
    )
    got = delta_cdf.from_cdf(cdf, key_field="id")
    # same column names and types (nullability flags differ for lit()
    # columns, which is irrelevant to the transport contract)
    assert [(f.name, f.dataType) for f in got.schema.fields] == [
        (f.name, f.dataType) for f in changefeed.CHANGE_SCHEMA.fields
    ]

    import json as _json

    want = {
        (1, "1", "INSERT", None, '{"id":1,"name":"A"}'),
        (2, "1", "UPDATE", '{"id":1,"name":"A"}', '{"id":1,"name":"B"}'),
        (2, "2", "INSERT", None, '{"id":2,"name":"C"}'),
        (3, "1", "DELETE", '{"id":1,"name":"B"}', None),
    }
    rows = {(r.seq, r.key, r.op, r.old, r.new) for r in got.collect()}
    assert rows == want
    for r in got.collect():
        assert r.table_schema == "public" and r.table_name == "employees"
        assert r.ts is not None

    # malformed inputs fail loud, not silently canonical
    import pytest

    with pytest.raises(ValueError):
        delta_cdf.from_cdf(cdf.drop("_commit_version"))
    with pytest.raises(ValueError):
        delta_cdf.from_cdf(cdf, key_field="nope")


def _write_delta_commit(root, version, actions):
    import json
    import os

    path = os.path.join(root, "_delta_log", f"{version:020d}.json")
    with open(path, "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")


def _build_delta_cdf_fixture(root):
    """Hand-built on-disk Delta table per the PUBLIC protocol
    (delta.io PROTOCOL.md): commit 0 = blind-append inserts, commit 1 =
    update recorded as a _change_data cdc file (whose add/remove
    actions must be IGNORED by a CDF reader), commit 2 = delete-only
    remove whose rows reconstruct from the immutable removed file."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(os.path.join(root, "_delta_log"))
    os.makedirs(os.path.join(root, "_change_data"))
    pq.write_table(
        pa.table({"id": pa.array([1, 2], pa.int64()), "name": ["A", "C"]}),
        os.path.join(root, "part-0.parquet"),
    )
    _write_delta_commit(
        root,
        0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {
                "metaData": {
                    "id": "fixture",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": "{}",
                    "partitionColumns": [],
                    "configuration": {"delta.enableChangeDataFeed": "true"},
                }
            },
            {
                "add": {
                    "path": "part-0.parquet",
                    "partitionValues": {},
                    "size": 1,
                    "modificationTime": 0,
                    "dataChange": True,
                }
            },
            {"commitInfo": {"timestamp": 1704100000000}},
        ],
    )
    pq.write_table(
        pa.table(
            {
                "id": pa.array([1, 1], pa.int64()),
                "name": ["A", "B"],
                "_change_type": ["update_preimage", "update_postimage"],
            }
        ),
        os.path.join(root, "_change_data", "cdc-1.parquet"),
    )
    pq.write_table(
        pa.table({"id": pa.array([1, 2], pa.int64()), "name": ["B", "C"]}),
        os.path.join(root, "part-1.parquet"),
    )
    _write_delta_commit(
        root,
        1,
        [
            {
                "cdc": {
                    "path": "_change_data/cdc-1.parquet",
                    "partitionValues": {},
                    "size": 1,
                    "dataChange": False,
                }
            },
            {
                "add": {
                    "path": "part-1.parquet",
                    "partitionValues": {},
                    "size": 1,
                    "modificationTime": 0,
                    "dataChange": True,
                }
            },
            {"remove": {"path": "part-0.parquet", "dataChange": True}},
            {"commitInfo": {"timestamp": 1704200000000}},
        ],
    )
    _write_delta_commit(
        root,
        2,
        [
            {"remove": {"path": "part-1.parquet", "dataChange": True}},
            {"commitInfo": {"timestamp": 1704300000000}},
        ],
    )


def test_delta_cdf_native_reader_end_to_end(spark, tmp_path):
    """SURVEY §1.4 Delta CDF leg, LIVE batch read path (r6): the native
    protocol reader derives insert/update/delete change rows from a
    real on-disk Delta table with no delta-spark — cdc files win over
    the same commit's add/remove, blind appends read as inserts,
    delete-only commits reconstruct from the removed file, and the
    canonical relation matches the changefeed transport contract."""
    from postgres_cdc_plugin_spark.sources import delta_cdf

    root = str(tmp_path / "dtable")
    _build_delta_cdf_fixture(root)

    got = delta_cdf.cdf_batch(spark, root, key_field="id")
    rows = {(r.seq, r.key, r.op, r.old, r.new) for r in got.collect()}
    assert rows == {
        (0, "1", "INSERT", None, '{"id":1,"name":"A"}'),
        (0, "2", "INSERT", None, '{"id":2,"name":"C"}'),
        (1, "1", "UPDATE", '{"id":1,"name":"A"}', '{"id":1,"name":"B"}'),
        (2, "1", "DELETE", '{"id":1,"name":"B"}', None),
        (2, "2", "DELETE", '{"id":2,"name":"C"}', None),
    }
    # commit timestamps rode in from commitInfo (millis -> timestamp)
    ts_by_seq = {r.seq: r.ts for r in got.collect()}
    assert ts_by_seq[0] < ts_by_seq[1] < ts_by_seq[2]

    # version-range selection
    only_update = delta_cdf.cdf_batch(
        spark, root, key_field="id", starting_version=1, ending_version=1
    )
    assert {(r.seq, r.op) for r in only_update.collect()} == {(1, "UPDATE")}


def test_delta_cdf_native_reader_fails_loud(spark, tmp_path):
    """Ambiguous or out-of-scope Delta structures must raise, never
    silently misread: (a) a file-rewriting commit without cdc actions,
    (b) reader features this minimal client does not implement,
    (c) a path that is not a Delta table."""
    import pytest

    from postgres_cdc_plugin_spark.sources import delta_cdf

    root = str(tmp_path / "dtable")
    _build_delta_cdf_fixture(root)

    # (a) merge-shaped commit: add+remove, no cdc
    _write_delta_commit(
        root,
        3,
        [
            {
                "add": {
                    "path": "part-1.parquet",
                    "partitionValues": {},
                    "size": 1,
                    "modificationTime": 0,
                    "dataChange": True,
                }
            },
            {"remove": {"path": "part-0.parquet", "dataChange": True}},
            {"commitInfo": {"timestamp": 1704400000000}},
        ],
    )
    with pytest.raises(ValueError, match="without cdc"):
        delta_cdf.read_cdf_log(spark, root)

    # (b) unsupported reader feature
    _write_delta_commit(
        root,
        4,
        [
            {
                "protocol": {
                    "minReaderVersion": 3,
                    "minWriterVersion": 7,
                    "readerFeatures": ["deletionVectors"],
                }
            },
            {"commitInfo": {"timestamp": 1704500000000}},
        ],
    )
    with pytest.raises(ValueError, match="deletionVectors"):
        delta_cdf.read_cdf_log(spark, root, starting_version=4)

    # (c) not a Delta table
    with pytest.raises(ValueError, match="_delta_log"):
        delta_cdf.read_cdf_log(spark, str(tmp_path / "nope"))


def test_delta_cdf_tailer_streams_new_commits(spark, tmp_path):
    """CdfTailer: the NATIVE streaming leg of the Delta CDF transport —
    an initial drain delivers the full backlog through the batch path,
    idle polls deliver nothing, a freshly-landed commit is picked up
    alone, a crashing consumer leaves the marker untouched so the
    range replays (at-least-once), and metadata-only commits advance
    the marker without a delivery."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from postgres_cdc_plugin_spark.sources import delta_cdf

    root = str(tmp_path / "dtable")
    _build_delta_cdf_fixture(root)
    tailer = delta_cdf.CdfTailer(
        spark, root, str(tmp_path / "ckpt"), key_field="id"
    )
    seen = []

    def consume(df, end_version):
        seen.append(
            (end_version, {(r.seq, r.key, r.op) for r in df.collect()})
        )

    # initial drain: the whole backlog (commits 0..2) in one micro-batch
    assert tailer.process_available(consume) == 3
    assert tailer.last_delivered() == 2
    assert seen[0] == (
        2,
        {
            (0, "1", "INSERT"),
            (0, "2", "INSERT"),
            (1, "1", "UPDATE"),
            (2, "1", "DELETE"),
            (2, "2", "DELETE"),
        },
    )

    # idle poll: no new commits, no delivery
    assert tailer.process_available(consume) == 0
    assert len(seen) == 1

    # a new commit lands: only it is delivered
    pq.write_table(
        pa.table({"id": pa.array([9], pa.int64()), "name": ["Z"]}),
        os.path.join(root, "part-9.parquet"),
    )
    _write_delta_commit(
        root,
        3,
        [
            {
                "add": {
                    "path": "part-9.parquet",
                    "partitionValues": {},
                    "size": 1,
                    "modificationTime": 0,
                    "dataChange": True,
                }
            },
            {"commitInfo": {"timestamp": 1704500000000}},
        ],
    )
    assert tailer.run(consume, poll_interval=0.0, max_polls=2) == 1
    assert seen[1] == (3, {(3, "9", "INSERT")})

    # crash between delivery and marker: the range replays verbatim
    pq.write_table(
        pa.table({"id": pa.array([10], pa.int64()), "name": ["Y"]}),
        os.path.join(root, "part-10.parquet"),
    )
    _write_delta_commit(
        root,
        4,
        [
            {
                "add": {
                    "path": "part-10.parquet",
                    "partitionValues": {},
                    "size": 1,
                    "modificationTime": 0,
                    "dataChange": True,
                }
            },
            {"commitInfo": {"timestamp": 1704600000000}},
        ],
    )

    def boom(df, end_version):
        raise RuntimeError("consumer crash")

    with pytest.raises(RuntimeError, match="consumer crash"):
        tailer.process_available(boom)
    assert tailer.last_delivered() == 3  # marker NOT advanced
    assert tailer.process_available(consume) == 1  # replayed
    assert seen[2] == (4, {(4, "10", "INSERT")})

    # metadata-only commit: marker advances, nothing delivered
    _write_delta_commit(
        root, 5, [{"commitInfo": {"timestamp": 1704700000000}}]
    )
    assert tailer.process_available(consume) == 1
    assert tailer.last_delivered() == 5
    assert len(seen) == 3

    # a fresh tailer on the SAME checkpoint resumes, not replays
    resumed = delta_cdf.CdfTailer(
        spark, root, str(tmp_path / "ckpt"), key_field="id"
    )
    assert resumed.last_delivered() == 5
    assert resumed.process_available(consume) == 0


def test_delta_table_to_webhook_end_to_end(spark, tmp_path):
    """Flagship wiring of the Delta leg: a Delta table's committed
    changes reach a LIVE webhook through register -> CdfTailer ->
    capture pipeline -> SYNC sink — the reference's trigger-to-webhook
    behavior (cdc_webhook--1.0.sql:355-366 + src/cdc_webhook.c:153-237)
    with a lakehouse table as the monitored source and no delta-spark.
    A second drain after a fresh commit delivers only that commit."""
    import json as _json
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from postgres_cdc_plugin_spark.config import SubscriptionConfig
    from postgres_cdc_plugin_spark.engine import CdcEngine
    from postgres_cdc_plugin_spark.sources import delta_cdf

    from .webhook_server import CaptureServer

    root = str(tmp_path / "dtable")
    _build_delta_cdf_fixture(root)
    with CaptureServer() as srv:
        engine = CdcEngine(spark, str(tmp_path / "wd"))
        cfg = engine.register(
            SubscriptionConfig(
                name="dl",
                table_name="employees",
                webhook_url=srv.url,
                # P2 semantics: the empty default suppresses ALL
                # UPDATE events — subscribe to the changing column
                update_columns=["name"],
            )
        )
        tailer = delta_cdf.CdfTailer(
            spark, root, str(tmp_path / "ck"), key_field="id"
        )
        assert engine.drain_delta(cfg, tailer) == 3
        payloads = srv.wait_for(5)
        ops = sorted(p["event"]["op"] for p in payloads)
        assert ops == ["DELETE", "DELETE", "INSERT", "INSERT", "UPDATE"]
        upd = next(p for p in payloads if p["event"]["op"] == "UPDATE")
        assert _json.loads(upd["event"]["data"]["old"])["name"] == "A"
        assert _json.loads(upd["event"]["data"]["new"])["name"] == "B"
        assert upd["table"]["name"] == "employees"

        # a fresh commit lands; the next drain ships ONLY it
        pq.write_table(
            pa.table({"id": pa.array([9], pa.int64()), "name": ["Z"]}),
            os.path.join(root, "part-9.parquet"),
        )
        _write_delta_commit(
            root,
            3,
            [
                {
                    "add": {
                        "path": "part-9.parquet",
                        "partitionValues": {},
                        "size": 1,
                        "modificationTime": 0,
                        "dataChange": True,
                    }
                },
                {"commitInfo": {"timestamp": 1704500000000}},
            ],
        )
        assert engine.drain_delta(cfg, tailer) == 1
        payloads = srv.wait_for(6)
    latest = payloads[-1]
    assert latest["event"]["op"] == "INSERT"
    assert _json.loads(latest["event"]["data"]["new"])["id"] == 9


def test_delta_table_to_async_queue(spark, tmp_path):
    """drain_delta's ASYNC branch: a Delta table's commits land in the
    durable delivery queue as PENDING events (enqueue sink keyed by the
    commit end-version, so a tailer replay overwrites rather than
    double-enqueues)."""
    from postgres_cdc_plugin_spark.config import SubscriptionConfig
    from postgres_cdc_plugin_spark.engine import CdcEngine
    from postgres_cdc_plugin_spark.sources import delta_cdf

    root = str(tmp_path / "dtable")
    _build_delta_cdf_fixture(root)
    engine = CdcEngine(spark, str(tmp_path / "wd"))
    cfg = engine.register(
        SubscriptionConfig(
            name="dlq",
            table_name="employees",
            webhook_url="http://sink.invalid/webhook",
            update_columns=["name"],
            mode="ASYNC",
        )
    )
    tailer = delta_cdf.CdfTailer(
        spark, root, str(tmp_path / "ck"), key_field="id"
    )
    assert engine.drain_delta(cfg, tailer) == 3
    state = engine.queue.state().collect()
    assert len(state) == 5
    assert all(r.status == "PENDING" for r in state)

    # marker rollback (crash before marker write) -> replay: the
    # version-keyed enqueue overwrites, the queue does not double up
    import os

    os.remove(os.path.join(str(tmp_path / "ck"), "version"))
    assert engine.drain_delta(cfg, tailer) == 3
    assert len(engine.queue.state().collect()) == 5


# --- golden wire-format fixtures (r9 verdict ask #5) -------------------
#
# tests/fixtures/debezium/*.jsonl reproduce the envelope structure of
# the public Debezium reference documentation ("Debezium connector for
# PostgreSQL" -> change event keys and values; inventory.customers
# examples): full value schema blocks, the documented source block
# (version/connector/name/ts_ms/snapshot/db/sequence/schema/table/
# txId/lsn/xmin), the transaction field, snapshot reads, truncate —
# in BOTH wire shapes the JSON converter emits (schemas.enable=true
# wrapped under "payload", and the flat schemas.enable=false twins).

import os as _os

_DBZ_FIXTURES = _os.path.join(
    _os.path.dirname(__file__), "fixtures", "debezium"
)


def test_debezium_golden_wrapped_frames_parse(spark):
    """The schemas.enable=true wire shape (the converter DEFAULT — what
    a stock Debezium topic actually carries): the parser must unwrap
    the payload, ignore the schema block, map snapshot reads to
    INSERT, take seq from source.lsn and ts from source.ts_ms, drop
    the truncate frame without quarantining it, and quarantine exactly
    the foreign frame and the torn frame."""
    import datetime

    feed = debezium.split(
        spark.read.text(
            _os.path.join(_DBZ_FIXTURES, "postgres_change_events.jsonl")
        )
    )
    rows = sorted(feed.changes.collect(), key=lambda r: r.seq)
    assert [r.op for r in rows] == ["INSERT", "INSERT", "UPDATE", "DELETE"]
    assert [r.seq for r in rows] == [24023100, 24023128, 24023136, 24023144]
    assert all(
        r.table_schema == "inventory" and r.table_name == "customers"
        for r in rows
    )
    # the key rides the row images through every op, incl. DELETE
    assert [r.key for r in rows] == ["1", "1", "1", "1"]
    # before/after images survive as raw JSON
    create = rows[1]
    assert create.old is None
    assert json.loads(create.new)["first_name"] == "Anne"
    update = rows[2]
    assert json.loads(update.old)["first_name"] == "Anne"
    assert json.loads(update.new)["first_name"] == "Anne Marie"
    assert rows[3].new is None
    # ts = source.ts_ms (database change time), not envelope ts_ms
    # expected datetime built from the integer source.ts_ms value
    # (1559033904863) — no float rounding, no deprecated utcfromtimestamp
    assert create.ts == datetime.datetime(
        1970, 1, 1
    ) + datetime.timedelta(milliseconds=1559033904863)
    # quarantine: the heartbeat-ish foreign frame + the torn frame —
    # NOT the truncate (valid envelope, dropped by design)
    q = sorted(r.value for r in feed.quarantine.collect())
    assert len(q) == 2
    assert any('"event":"heartbeat"' in v for v in q)
    assert any(v.endswith('"after":{"id":9') for v in q)


def test_debezium_wrapped_and_flat_frames_are_equivalent(spark):
    """The two converter shapes of the SAME logical events must produce
    identical canonical change rows — the contract that lets one
    pipeline consume topics regardless of the producer's
    schemas.enable setting."""
    wrapped = debezium.parse(
        spark.read.text(
            _os.path.join(_DBZ_FIXTURES, "postgres_change_events.jsonl")
        )
    )
    flat = debezium.parse(
        spark.read.text(
            _os.path.join(_DBZ_FIXTURES, "postgres_change_events_flat.jsonl")
        )
    )
    key = lambda r: r.seq  # noqa: E731
    assert sorted(wrapped.collect(), key=key) == sorted(
        flat.collect(), key=key
    )


def test_debezium_key_envelopes_extract_pk(spark):
    """Key frames (schema block + {"id": ...} payload) run through the
    same unwrap: get_json_object over the unwrapped payload pulls the
    PK — the shape a keyed consumer sees on the message KEY side."""
    from pyspark.sql import functions as F

    raw = spark.read.text(
        _os.path.join(_DBZ_FIXTURES, "postgres_change_event_keys.jsonl")
    )
    keys = raw.select(
        F.get_json_object(
            F.coalesce(
                F.get_json_object("value", "$.payload"), F.col("value")
            ),
            "$.id",
        ).alias("id")
    ).collect()
    # row events carry the PK; the truncate frame has no row identity
    assert [k.id for k in keys] == ["1", "1", "1", "1", None]


def test_debezium_golden_fixtures_through_streaming_transport(spark, tmp_path):
    """The wrapped golden frames replayed through the STREAMING file
    transport (debezium.file_stream) produce exactly the rows batch
    parse() extracts from the same file — the transport layer adds or
    loses nothing on the real wire shape."""
    import shutil

    dump = tmp_path / "golden_dump"
    dump.mkdir()
    shutil.copy(
        _os.path.join(_DBZ_FIXTURES, "postgres_change_events.jsonl"),
        dump / "part-0.txt",
    )
    q = (
        debezium.file_stream(spark, str(dump))
        .writeStream.format("memory")
        .queryName("golden_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = sorted(
        (r.seq, r.op, r.key, r.old, r.new, r.ts)
        for r in spark.sql("select * from golden_stream").collect()
    )
    batch = sorted(
        (r.seq, r.op, r.key, r.old, r.new, r.ts)
        for r in debezium.parse(
            spark.read.text(str(dump / "part-0.txt"))
        ).collect()
    )
    assert streamed == batch and len(streamed) == 4
