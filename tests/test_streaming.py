"""Streaming face: the batch transform graph run under readStream must
route identically to the batch oracle, and the watermarked windowed agg
must match batch window counts when nothing is late."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from fluent_server_spark.data.synth import synth_turns_pandas
from fluent_server_spark.oracle.pandas_oracle import oracle_pipeline
from fluent_server_spark.streaming.stream_pipeline import run_stream_once


@pytest.fixture(scope="module")
def stream_src(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    pdf = synth_turns_pandas(1500, n_convs=30)
    # three "arrivals" (files) — micro-batches pick them up incrementally
    for i, chunk in enumerate((pdf[:500], pdf[500:1000], pdf[1000:])):
        spark.createDataFrame(chunk).coalesce(1).write.mode(
            "append"
        ).parquet(str(base / "turns"))
    return str(base / "turns"), pdf, str(base)


def test_stream_routes_like_batch(spark, stream_src):
    src, pdf, base = stream_src
    got = (
        run_stream_once(spark, src, f"{base}/ckpt-rows", queryName="s_rows")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = (
        oracle_pipeline(pdf)[["conv_id", "turn_idx", "text", "sink"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_windowed_counts_match_batch(spark, stream_src):
    src, pdf, base = stream_src
    got = (
        run_stream_once(
            spark,
            src,
            f"{base}/ckpt-agg",
            queryName="s_agg",
            mode="complete",
            aggregated=True,
        )
        .toPandas()
        .sort_values(["win_start", "sink"])
        .reset_index(drop=True)
    )
    routed = oracle_pipeline(pdf)
    routed = routed.assign(win_start=routed.ts.dt.floor("1min"))
    want = (
        routed.groupby(["win_start", "sink"])
        .size()
        .rename("n_turns")
        .reset_index()
        .sort_values(["win_start", "sink"])
        .reset_index(drop=True)
    )
    got2 = got[["win_start", "sink", "n_turns"]]
    pd.testing.assert_frame_equal(got2, want, check_dtype=False)


def test_stream_spool_tail_matches_batch(spark, tmp_path):
    """Tailing a spool directory as a stream must route identically to
    the batch fluent-file path — one decode, one transform graph, two
    execution modes."""
    from fluent_server_spark.sources.fluentfile import write_spool_file
    from fluent_server_spark.sources.registry import load_turns
    from fluent_server_spark.streaming.stream_pipeline import stream_spool_routed
    from fluent_server_spark.functions.parse import parse_turns
    from fluent_server_spark.operators.enrich import enrich_turns
    from fluent_server_spark.operators.route import route_turns, rules_from_rows
    from fluent_server_spark.data.synth import ROUTE_RULE_ROWS, lookup_df

    spool = tmp_path / "spool"
    for f in range(3):
        write_spool_file(
            str(spool / f"agent.chunk{f}.msgpack"),
            [
                (
                    (1_700_000_000 + 100 * f + i, 500),
                    {
                        "conv_id": f"c{f}",
                        "turn_idx": i,
                        "role": "assistant" if i % 2 else "user",
                        "text": f'level=INFO component=planner msg="s{i}" dur_ms={i} tokens=2',
                        "tool": "search" if i % 3 else "none",
                    },
                )
                for i in range(8)
            ],
            compress=(f == 1),
        )

    got = None
    q = (
        stream_spool_routed(spark, str(spool), max_files_per_trigger=1)
        .select("conv_id", "turn_idx", "sink")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("spool_tail")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = (
            spark.sql("SELECT * FROM spool_tail")
            .toPandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
    finally:
        q.stop()

    batch_turns = load_turns(spark, "fluent-file", str(spool))
    batch = route_turns(
        enrich_turns(parse_turns(batch_turns), lookup_df(spark)),
        rules_from_rows(ROUTE_RULE_ROWS),
    ).select("conv_id", "turn_idx", "sink").toPandas().sort_values(
        ["conv_id", "turn_idx"]
    ).reset_index(drop=True)

    import pandas as pd

    assert len(got) == 24
    pd.testing.assert_frame_equal(got, batch)


def test_stream_spool_into_snapshots_wire_to_table(spark, turns_pdf, tmp_path):
    """LIVE WIRE -> SNAPSHOT TABLE: forward-protocol frames land as
    sealed spool segments (hidden_active), the spool tail commits one
    snapshot run per epoch, and read_appended equals batch routing of
    the same turns — with per-epoch time travel intact."""
    import asyncio

    from fluent_server_spark.plans.pipeline import PipelineConfig, TranscriptPipeline
    from fluent_server_spark.sources.forward_server import ForwardClient, ForwardServer
    from fluent_server_spark.streaming.stream_pipeline import (
        stream_spool_into_snapshots,
    )
    from tests.test_forward_server import _forward_frame

    sample = turns_pdf.head(240)
    spool = str(tmp_path / "spool")

    async def feed():
        srv = ForwardServer(spool, hidden_active=True)
        await srv.start()
        try:
            cli = ForwardClient("127.0.0.1", srv.port)
            await cli.connect()
            entries = [
                (
                    int(row.ts.timestamp()),
                    {
                        "conv_id": row.conv_id,
                        "turn_idx": int(row.turn_idx),
                        "role": row.role,
                        "text": row.text,
                        "tool": row.tool,
                    },
                )
                for row in sample.itertuples()
            ]
            half = len(entries) // 2
            await cli.send_raw(
                _forward_frame("transcripts", entries[:half]), await_ack=False
            )
            await asyncio.sleep(0.2)
            srv.rotate()  # sealed + renamed visible
            await cli.send_raw(
                _forward_frame("transcripts", entries[half:]), await_ack=False
            )
            await asyncio.sleep(0.2)
            await cli.close()
        finally:
            await srv.stop()
            srv.rotate()  # seal the tail (the CLI drain story)

    asyncio.run(feed())
    assert not list((tmp_path / "spool").glob("_open_*")), "unsealed tail"

    pipe = TranscriptPipeline(
        spark,
        PipelineConfig(
            sinks_path=str(tmp_path / "snap-sinks"),
            checkpoint_path=str(tmp_path / "snap-ckpt.jsonl"),
            n_buckets=8,
            n_salt=2,
            snapshots=True,
        ),
    )
    q = stream_spool_into_snapshots(
        spark, spool, pipe, str(tmp_path / "sckpt"), recursive=True
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    table = pipe.read_appended()
    assert table.count() == len(sample)
    epochs = [r.run_id for r in pipe.checkpoint.all_committed()]
    assert all(e.startswith("epoch-") for e in epochs)

    batch = TranscriptPipeline(
        spark,
        PipelineConfig(
            sinks_path=str(tmp_path / "bsinks"),
            checkpoint_path=str(tmp_path / "bckpt.jsonl"),
            n_buckets=8,
            n_salt=2,
        ),
    )
    batch.run(spark.createDataFrame(sample))
    want = {
        r["sink"]: r["n"]
        for r in batch.read_sinks().groupBy("sink").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    got = {
        r["sink"]: r["n"]
        for r in table.groupBy("sink").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == want


def test_stream_into_snapshots_appends_epochs(spark, turns_pdf, tmp_path):
    """Streaming ingest commits one snapshot run per micro-batch epoch;
    read_appended unions epochs (append semantics) with per-epoch time
    travel, and restarting the stream processes only NEW files."""
    from fluent_server_spark.plans.pipeline import PipelineConfig, TranscriptPipeline
    from fluent_server_spark.streaming.stream_pipeline import stream_into_snapshots

    import glob as _glob
    import shutil as _shutil

    src = tmp_path / "turns-in"
    src.mkdir()
    half = len(turns_pdf) // 2

    def _drop(pdf, name):
        # the file stream lists FLAT files; write then move the part file
        w = tmp_path / f"w-{name}"
        spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(str(w))
        _shutil.copy(_glob.glob(f"{w}/part-*.parquet")[0], str(src / name))

    _drop(turns_pdf.iloc[:half], "f0.parquet")

    pipe = TranscriptPipeline(
        spark,
        PipelineConfig(
            sinks_path=str(tmp_path / "sinks"),
            checkpoint_path=str(tmp_path / "ckpt.jsonl"),
            n_buckets=8,
            n_salt=2,
            snapshots=True,
        ),
    )
    q = stream_into_snapshots(spark, str(src), pipe, str(tmp_path / "sckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert pipe.read_appended().count() == half
    first_epochs = [r.run_id for r in pipe.checkpoint.all_committed()]
    assert all(e.startswith("epoch-") for e in first_epochs)

    # second wave of files -> restart stream -> ONLY the new file lands
    _drop(turns_pdf.iloc[half:], "f1.parquet")
    q = stream_into_snapshots(spark, str(src), pipe, str(tmp_path / "sckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert pipe.read_appended().count() == len(turns_pdf)
    # per-epoch time travel: as of the FIRST epoch, only the first half
    assert pipe.read_appended(as_of_run=first_epochs[0]).count() == half
    # stream == batch routing equality on the full table
    batch = TranscriptPipeline(
        spark,
        PipelineConfig(
            sinks_path=str(tmp_path / "bsinks"),
            checkpoint_path=str(tmp_path / "bckpt.jsonl"),
            n_buckets=8,
            n_salt=2,
        ),
    )
    batch.run(spark.createDataFrame(turns_pdf))
    a = pipe.read_appended().groupBy("sink").count().collect()
    b = batch.read_sinks().groupBy("sink").count().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_stream_neardup_against_index_matches_batch(spark, tmp_path):
    """Streaming dedup-on-ingest == the batch operator, over the SAME
    persisted corpus index: two ingest epochs of new docs are flagged
    against the stored band table, and the union of epoch outputs equals
    minhash_lsh_pairs_against over all new docs at once (bit for bit).
    The corpus text is never readable by the stream (only the index)."""
    from fluent_server_spark.operators.dedup import (
        minhash_lsh_pairs_against,
        write_minhash_index,
    )
    from fluent_server_spark.streaming.dedup_stream import (
        read_flagged_pairs,
        stream_neardup_against_index,
    )

    base = (
        "the quick brown fox jumps over the lazy dog while the crew ships "
        "a spark pipeline that parses enriches routes and aggregates turns"
    )
    corpus = spark.createDataFrame(
        [(i, base.replace("fox", f"fox{i}")) for i in range(10)]
        + [(i, " ".join(f"c{i}_{j}" for j in range(30))) for i in range(10, 20)],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idx")
    write_minhash_index(corpus, idx)

    src = tmp_path / "incoming"
    src.mkdir()
    batch1 = spark.createDataFrame(
        [(100, base.replace("fox", "fox3").replace("lazy", "sleepy")),
         (101, " ".join(f"n1_{j}" for j in range(30)))],
        "doc_id long, text string",
    )
    batch2 = spark.createDataFrame(
        [(200, base.replace("fox", "fox7")),
         (201, " ".join(f"n2_{j}" for j in range(30)))],
        "doc_id long, text string",
    )
    batch1.coalesce(1).write.parquet(str(src / "b1"))
    batch2.coalesce(1).write.parquet(str(src / "b2"))

    out, ckpt = str(tmp_path / "flagged"), str(tmp_path / "ckpt")
    q = stream_neardup_against_index(
        spark, f"{src}/*", idx, out, ckpt, max_files_per_trigger=1
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    key = lambda r: (r["new_id"], r["corpus_id"], r["jaccard"])  # noqa: E731
    got = sorted(map(key, read_flagged_pairs(spark, out).collect()))
    want = sorted(
        map(
            key,
            minhash_lsh_pairs_against(
                batch1.unionByName(batch2), corpus_index=idx
            ).collect(),
        )
    )
    assert got == want
    assert len(got) >= 2  # both planted near-dups flagged
    assert {r[0] for r in got} >= {100, 200}
