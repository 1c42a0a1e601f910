"""mirror_json — the A24 read-path analogue: the JS e2e greps its value
out of the mirror JSON (reference contrib/js/index.js:28-45); we assert a
round-tripped text is findable in ours and counts match the oracle."""

from __future__ import annotations

import json

from fluent_server_spark.oracle.pandas_oracle import oracle_pipeline
from fluent_server_spark.plans.pipeline import PipelineConfig, TranscriptPipeline


def test_mirror_json_roundtrip(spark, turns_pdf, turns_sdf, tmp_path):
    cfg = PipelineConfig(
        sinks_path=str(tmp_path / "sinks"),
        checkpoint_path=str(tmp_path / "ckpt.jsonl"),
        n_buckets=8,
        n_salt=2,
    )
    pipe = TranscriptPipeline(spark, cfg)
    pipe.run(turns_sdf, run_id="mirror")
    doc = json.loads(pipe.mirror_json(limit_per_sink=10_000))

    routed = oracle_pipeline(turns_pdf)
    want_counts = routed.sink.value_counts().to_dict()
    got_counts = {k: v["n_turns"] for k, v in doc["counts"].items()}
    assert got_counts == want_counts

    # grep a specific turn's text out of the mirror, like the JS client
    probe = routed.iloc[123]
    sink_events = doc["events"][probe.sink]
    assert any(
        e["conv_id"] == probe.conv_id
        and e["turn_idx"] == int(probe.turn_idx)
        and e["text"] == probe.text
        for e in sink_events
    )
    # canonical order within each sink
    for evs in doc["events"].values():
        keys = [(e["conv_id"], e["turn_idx"]) for e in evs]
        assert keys == sorted(keys)


def test_mirror_http_server_serves_snapshot_and_metrics(spark, turns_pdf, tmp_path):
    """The HTTP mirror face (reference mirror.go:41-47): /mirror returns
    the consistent-snapshot document, /metrics the lineage records,
    /healthz liveness — counts agree with the pipeline's aggregates."""
    import json
    import urllib.request

    from fluent_server_spark.plans.mirror_http import MirrorHttpServer
    from fluent_server_spark.plans.pipeline import PipelineConfig, TranscriptPipeline

    pipe = TranscriptPipeline(
        spark,
        PipelineConfig(
            sinks_path=str(tmp_path / "sinks"),
            checkpoint_path=str(tmp_path / "ckpt.jsonl"),
        ),
    )
    pipe.run(spark.createDataFrame(turns_pdf), run_id="http1")

    srv = MirrorHttpServer(pipe, limit_per_sink=5).start()
    try:
        base = f"http://127.0.0.1:{srv.port}"

        def get(path):
            with urllib.request.urlopen(base + path, timeout=60) as r:
                return r.status, json.loads(r.read())

        assert get("/healthz") == (200, {"ok": True})

        status, doc = get("/mirror")
        assert status == 200
        want = {
            r["sink"]: r["n_turns"]
            for r in pipe.aggregates()["routed_counts"].collect()
        }
        assert {s: c["n_turns"] for s, c in doc["counts"].items()} == want
        for sink, events in doc["events"].items():
            assert len(events) <= 5
            order = [(e["conv_id"], e["turn_idx"]) for e in events]
            assert order == sorted(order)  # canonical, deterministic

        status, recs = get("/metrics")
        assert status == 200
        assert sum(r["n_rows"] for r in recs) == len(turns_pdf)

        try:
            get("/nope")
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        srv.stop()
