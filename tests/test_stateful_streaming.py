"""Stateful streaming operator: state must accumulate across
micro-batches and converge to the batch ground truth."""

from __future__ import annotations

import pytest

from fluent_server_spark.data.synth import synth_turns_pandas
from fluent_server_spark.streaming.stateful import conversation_progress
from fluent_server_spark.streaming.stream_pipeline import TURNS_DDL


def test_conversation_progress_accumulates(spark, tmp_path):
    pdf = synth_turns_pandas(900, n_convs=15)
    src = str(tmp_path / "turns")
    # three files -> with maxFilesPerTrigger=1, three micro-batches
    for chunk in (pdf[:300], pdf[300:600], pdf[600:]):
        spark.createDataFrame(chunk).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(TURNS_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        conversation_progress(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("conv_progress")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    updates = spark.sql("SELECT * FROM conv_progress").toPandas()
    # multiple micro-batches must have produced interim updates
    assert updates.batches.max() >= 2
    # the LAST update per conversation equals the batch ground truth
    final = (
        updates.sort_values("batches").groupby("conv_id").last().reset_index()
    )
    truth = (
        pdf.groupby("conv_id")
        .agg(n_turns=("turn_idx", "size"), max_turn_idx=("turn_idx", "max"))
        .reset_index()
    )
    merged = final.merge(truth, on="conv_id", suffixes=("", "_want"))
    assert (merged.n_turns == merged.n_turns_want).all()
    assert (merged.max_turn_idx == merged.max_turn_idx_want).all()
    # dense turn_idx fixture -> every conversation completes
    assert merged.complete.all()
