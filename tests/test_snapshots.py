"""Snapshot / time-travel sink reads (PipelineConfig(snapshots=True)) —
the Iceberg semantics the sandbox can't load jars for: run-scoped file
layout + checkpoint-log manifest, reads resolved as-of any committed run.
"""

from __future__ import annotations

import pandas as pd
import pytest

from fluent_server_spark.plans.pipeline import (
    InjectedFailure,
    PipelineConfig,
    TranscriptPipeline,
)


def _cfg(root, **kw):
    return PipelineConfig(
        sinks_path=str(root / "sinks"),
        checkpoint_path=str(root / "ckpt.jsonl"),
        n_buckets=8,
        n_salt=2,
        checkpoint_groups=2,
        snapshots=True,
        **kw,
    )


def _sorted(df):
    return (
        df.toPandas()
        .sort_values(["sink", "conv_id", "turn_idx"])
        .reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def snap(spark, turns_pdf, tmp_path_factory):
    """Run A over half the data, run B over all of it, same sink table."""
    root = tmp_path_factory.mktemp("snap")
    pipe = TranscriptPipeline(spark, _cfg(root))
    half = spark.createDataFrame(turns_pdf.iloc[: len(turns_pdf) // 2])
    full = spark.createDataFrame(turns_pdf)
    pipe.run(half, run_id="runA")
    a_state = _sorted(pipe.read_sinks())
    pipe.run(full, run_id="runB")
    return pipe, half, full, a_state


def test_current_read_is_latest_run(spark, snap, turns_pdf):
    pipe, half, full, a_state = snap
    fresh = TranscriptPipeline(
        spark,
        PipelineConfig(
            sinks_path=pipe.config.sinks_path + "-flat",
            checkpoint_path=pipe.config.checkpoint_path + "-flat",
            n_buckets=8,
            n_salt=2,
        ),
    )
    fresh.run(full, run_id="flat")
    pd.testing.assert_frame_equal(_sorted(pipe.read_sinks()), _sorted(fresh.read_sinks()))


def test_time_travel_returns_run_a_bytes(snap):
    pipe, half, full, a_state = snap
    got = _sorted(pipe.read_sinks(as_of_run="runA"))
    pd.testing.assert_frame_equal(got, a_state)
    assert len(a_state) < len(_sorted(pipe.read_sinks()))


def test_unknown_run_raises(snap):
    pipe, *_ = snap
    with pytest.raises(ValueError, match="no committed snapshot"):
        pipe.read_sinks(as_of_run="nope")


def test_flat_layout_rejects_as_of(spark, tmp_path, turns_sdf):
    pipe = TranscriptPipeline(
        spark,
        PipelineConfig(
            sinks_path=str(tmp_path / "s"),
            checkpoint_path=str(tmp_path / "c.jsonl"),
        ),
    )
    with pytest.raises(ValueError, match="snapshots=True"):
        pipe.read_sinks(as_of_run="x")


def test_resume_within_snapshot_run(spark, turns_sdf, tmp_path):
    """Crash mid-run, resume same run_id: the snapshot must equal a clean
    single-shot run (group replay is idempotent inside the run dir)."""
    clean = TranscriptPipeline(spark, _cfg(tmp_path / "clean"))
    clean.run(turns_sdf, run_id="c")
    pipe = TranscriptPipeline(spark, _cfg(tmp_path / "crashy"))
    with pytest.raises(InjectedFailure):
        pipe.run(turns_sdf, run_id="r", fail_after_groups=1)
    pipe.run(turns_sdf, run_id="r")  # resume
    pd.testing.assert_frame_equal(_sorted(pipe.read_sinks()), _sorted(clean.read_sinks()))


def test_vacuum_expires_unreferenced_runs(spark, snap):
    pipe, half, full, a_state = snap
    current = _sorted(pipe.read_sinks())
    removed = pipe.vacuum_snapshots()
    assert "runA" in removed  # fully superseded by runB
    pd.testing.assert_frame_equal(_sorted(pipe.read_sinks()), current)
    with pytest.raises(Exception):
        pipe.read_sinks(as_of_run="runA").collect()  # expired, like Iceberg
