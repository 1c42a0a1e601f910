"""Parity with the reference's own test payloads.

The reference pins decode semantics with tiny literals: tag "tag.name",
unix ts 1441588984, record {"message": "foo"}
(reference: message/session_test.go:139-150, message/entry_test.go:12-35,
server/server_test.go:36-50). Same values, our data model: the turn's ts
must survive the whole pipeline at exactly that second, the parsed msg
must round-trip byte-identically, and the tag-ish routing key must land
the row in exactly one sink.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from fluent_server_spark.plans.pipeline import PipelineConfig, TranscriptPipeline

REF_UNIX = 1441588984  # 2015-09-07T01:23:04Z, from entry_test.go


def test_reference_literal_roundtrip(spark, tmp_path):
    ts = dt.datetime.fromtimestamp(REF_UNIX, dt.timezone.utc).replace(tzinfo=None)
    turns = spark.createDataFrame(
        [
            # the reference's {"message": "foo"} as a grok-able text
            ("tag.name", 0, "assistant", 'level=INFO component=fluentd msg="foo" dur_ms=0 tokens=0', "none", ts),
            # EventTime sub-second case (time.go keeps nsec; our contract is µs)
            ("tag.name", 1, "user", 'level=INFO component=fluentd msg="bar" dur_ms=1 tokens=1', "none",
             ts + dt.timedelta(microseconds=276)),
        ],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    cfg = PipelineConfig(
        sinks_path=str(tmp_path / "sinks"),
        checkpoint_path=str(tmp_path / "c.jsonl"),
        n_buckets=4,
        n_salt=2,
    )
    pipe = TranscriptPipeline(spark, cfg)
    pipe.run(turns, run_id="ref")
    rows = {r.turn_idx: r for r in pipe.read_sinks().collect()}
    assert len(rows) == 2
    r0 = rows[0]
    # record value round-trip (entry_test asserts record["message"] == "foo")
    assert r0.msg == "foo" and r0.parse_ok
    # ts.Unix() == 1441588984 (entry_test.go:31)
    assert int(r0.ts.timestamp()) == REF_UNIX
    # µs precision preserved end-to-end (time.go ext-time sec+nsec -> µs)
    assert rows[1].ts.microsecond == 276
    # tag-style key routed to exactly one sink, nothing dropped
    assert r0.sink == "sink_default" and rows[1].sink == "sink_user"
