"""Fluent spool-file source: byte-level codec pins + Spark round-trip.

The byte fixtures mirror the reference's decode contract
(message/entry.go:11-35 [time, map] fixarray; message/time.go:31-53
EventTime ext(0) BE sec+nsec; defaultreader/reader.go:51-77 concatenated
entries, optional gzip)."""

from __future__ import annotations

import gzip

import pytest

from fluent_server_spark.sources.fluentfile import (
    decode_spool_blob,
    encode_entry,
    encode_event_time,
    read_spool_files,
    write_spool_file,
)


def test_event_time_bytes_literal():
    # fixext8, type 0, BE u32 sec, BE u32 nsec — the exact layout
    # message/time.go:50-52 reads back
    assert encode_event_time(1, 2) == bytes(
        [0xD7, 0x00, 0, 0, 0, 1, 0, 0, 0, 2]
    )


def test_entry_roundtrip_bytes_literal():
    # [1234567890, {"k": "v"}] — hand-assembled per the msgpack spec
    blob = encode_entry(1234567890, {"k": "v"})
    assert blob == bytes([0x92, 0xCE, 0x49, 0x96, 0x02, 0xD2, 0x81, 0xA1])\
        + b"k" + bytes([0xA1]) + b"v"
    [(sec, nsec, rec)] = list(decode_spool_blob(blob))
    assert (sec, nsec, rec) == (1234567890, 0, {"k": "v"})


def test_eventtime_nanosecond_fidelity():
    blob = encode_entry((1700000000, 987654321), {"a": 1})
    [(sec, nsec, rec)] = list(decode_spool_blob(blob))
    assert (sec, nsec) == (1700000000, 987654321)  # lossless ns
    assert rec == {"a": 1}


def test_concatenated_and_gzip_blobs(tmp_path):
    entries = [
        (1700000000, {"level": "INFO", "n": 1}),
        ((1700000001, 500), {"level": "WARN", "msg": "x y z"}),
        (1700000002, {"level": "ERROR", "ok": False, "nil": None}),
    ]
    raw = write_spool_file(str(tmp_path / "app.web.msgpack"), entries)
    gz = write_spool_file(
        str(tmp_path / "app.web2.msgpack.gz"), entries, compress=True
    )
    got_raw = list(decode_spool_blob(open(raw, "rb").read()))
    got_gz = list(decode_spool_blob(open(gz, "rb").read()))
    assert got_raw == got_gz
    assert got_raw[1][1] == 500 and got_raw[1][2]["msg"] == "x y z"
    # deterministic gzip bytes (mtime pinned) — fixture stability
    assert open(gz, "rb").read() == gzip.compress(open(raw, "rb").read(), mtime=0)


def test_spark_read_spool_files(spark, tmp_path):
    t0 = 1_700_000_000
    write_spool_file(
        str(tmp_path / "svc.alpha.msgpack"),
        [((t0 + i, 123456789 + i), {"level": "INFO", "i": i}) for i in range(5)],
    )
    write_spool_file(
        str(tmp_path / "svc.beta.msgpack.gz"),
        [(t0 + 100 + i, {"level": "WARN", "i": i}) for i in range(3)],
        compress=True,
    )
    df = read_spool_files(spark, str(tmp_path)).orderBy("tag", "ts")
    rows = df.collect()
    assert len(rows) == 8
    alpha = [r for r in rows if r.tag == "svc.alpha"]
    beta = [r for r in rows if r.tag == "svc.beta"]
    assert len(alpha) == 5 and len(beta) == 3
    # ns fidelity: ts truncates to µs, ts_nsec carries the full value
    assert alpha[0].ts_nsec == 123456789
    assert alpha[0].ts.microsecond == 123456
    assert int(alpha[0].ts.timestamp()) == t0
    assert alpha[0].record["level"] == "INFO" and alpha[0].record["i"] == "0"
    assert beta[2].record == {"level": "WARN", "i": "2"}


def test_bad_blob_raises(tmp_path):
    from fluent_server_spark.sources.fluentfile import MsgpackError

    with pytest.raises(MsgpackError):
        list(decode_spool_blob(bytes([0x91, 0x01])))  # fixarray(1), not an entry
    with pytest.raises(MsgpackError):
        list(decode_spool_blob(bytes([0xC1])))  # reserved code


def test_fluent_file_source_feeds_pipeline_schema(spark, tmp_path):
    """registry 'fluent-file' source: spool entries -> canonical turns
    schema, ready for the full parse->route pipeline."""
    from fluent_server_spark.sources.registry import load_turns

    entries = [
        (
            (1_700_000_000 + i, 42),
            {
                "conv_id": f"c{i % 2}",
                "turn_idx": i,
                "role": "assistant",
                "text": f'level=INFO component=planner msg="s{i}" dur_ms={i} tokens=1',
                "tool": "search",
            },
        )
        for i in range(6)
    ]
    write_spool_file(str(tmp_path / "conv.alpha.msgpack"), entries)
    turns = load_turns(spark, "fluent-file", str(tmp_path))
    assert [f.name for f in turns.schema.fields] == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts",
    ]
    rows = turns.orderBy("turn_idx").collect()
    assert len(rows) == 6 and rows[3].conv_id == "c1" and rows[3].turn_idx == 3

    from fluent_server_spark.functions.parse import parse_turns

    parsed = parse_turns(turns).select("parsed.*").collect()
    assert all(r.parse_ok for r in parsed)


def test_committed_spool_fixture_matches_regenerated(tmp_path):
    """The committed fixture bytes (fluent_server_spark/data/spool_fixture,
    read by the driver query with ZERO runtime writes) must equal a fresh
    deterministic regeneration — codec drift cannot silently stale them."""
    import os

    from fluent_server_spark.queries.spool import FIXTURE_DIR, materialize_fixture

    names = materialize_fixture(str(tmp_path))
    assert sorted(names) == sorted(os.listdir(FIXTURE_DIR))
    for name in names:
        with open(os.path.join(FIXTURE_DIR, name), "rb") as f:
            committed = f.read()
        with open(tmp_path / name, "rb") as f:
            regenerated = f.read()
        assert committed == regenerated, f"fixture drift in {name}"
