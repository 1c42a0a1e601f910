"""Checkpoint/resume — the ack-chunk semantics test
(reference: session_test.go:124-159 asserts the ack round-trip; here we
assert the batch upgrade: kill after K groups, rerun, identical sinks)."""

from __future__ import annotations

import pandas as pd
import pytest

from fluent_server_spark.plans.pipeline import (
    InjectedFailure,
    PipelineConfig,
    TranscriptPipeline,
)


def _cfg(base, groups=4) -> PipelineConfig:
    return PipelineConfig(
        sinks_path=str(base / "sinks"),
        checkpoint_path=str(base / "checkpoint.jsonl"),
        n_buckets=16,
        n_salt=4,
        checkpoint_groups=groups,
    )


def _sorted_sinks(pipe) -> pd.DataFrame:
    return (
        pipe.read_sinks()
        .select("conv_id", "turn_idx", "text", "sink")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )


def test_kill_and_resume_identical(spark, turns_sdf, tmp_path):
    clean = TranscriptPipeline(spark, _cfg(tmp_path / "clean"))
    clean.run(turns_sdf, run_id="clean")

    pipe = TranscriptPipeline(spark, _cfg(tmp_path / "crashy"))
    with pytest.raises(InjectedFailure):
        pipe.run(turns_sdf, run_id="r1", fail_after_groups=2)
    committed = pipe.checkpoint.committed_groups("r1")
    assert len(committed) == 2  # partial progress acked

    # resume: must skip the 2 committed groups and finish the rest
    pipe.run(turns_sdf, run_id="r1")
    assert len(pipe.checkpoint.committed_groups("r1")) == 4

    pd.testing.assert_frame_equal(_sorted_sinks(pipe), _sorted_sinks(clean))


def test_rerun_is_idempotent(spark, turns_sdf, tmp_path):
    """Replaying an already-complete run (fresh run_id, same output path)
    must not duplicate rows — dynamic overwrite replaces partitions."""
    pipe = TranscriptPipeline(spark, _cfg(tmp_path))
    pipe.run(turns_sdf, run_id="a")
    first = _sorted_sinks(pipe)
    pipe.run(turns_sdf, run_id="b")  # full replay into same sinks
    pd.testing.assert_frame_equal(_sorted_sinks(pipe), first)


def test_resume_with_different_group_count_refuses(spark, turns_sdf, tmp_path):
    """Group ids are only meaningful relative to the pmod(bucket, G)
    partitioning they were committed under — resuming the same run_id
    with a different G must raise, not silently skip wrong bucket sets."""
    pipe = TranscriptPipeline(spark, _cfg(tmp_path))
    with pytest.raises(InjectedFailure):
        pipe.run(turns_sdf, run_id="g4", fail_after_groups=1)

    cfg2 = _cfg(tmp_path)
    cfg2.checkpoint_groups = 8
    pipe2 = TranscriptPipeline(spark, cfg2)
    with pytest.raises(ValueError, match="n_groups"):
        pipe2.run(turns_sdf, run_id="g4")
