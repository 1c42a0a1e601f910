"""MERGE INTO / DELETE FROM analogues over the snapshot sink layout —
copy-on-write, partition-scoped rewrites with time travel intact."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fluent_server_spark.plans.pipeline import PipelineConfig, TranscriptPipeline


def _cfg(root, **kw):
    return PipelineConfig(
        sinks_path=str(root / "sinks"),
        checkpoint_path=str(root / "ckpt.jsonl"),
        n_buckets=8,
        n_salt=2,
        snapshots=True,
        **kw,
    )


@pytest.fixture()
def pipe(spark, turns_pdf, tmp_path):
    p = TranscriptPipeline(spark, _cfg(tmp_path))
    p.run(spark.createDataFrame(turns_pdf), run_id="base")
    return p


def _key_rows(pipe, conv, idx):
    return (
        pipe.read_sinks()
        .filter((F.col("conv_id") == conv) & (F.col("turn_idx") == idx))
        .collect()
    )


def test_merge_updates_matched_and_inserts_unmatched(spark, pipe, turns_pdf):
    n0 = pipe.read_sinks().count()
    victim = turns_pdf.iloc[0]
    updates = spark.createDataFrame(
        [
            # matched key, corrected text
            (victim.conv_id, int(victim.turn_idx), victim.role,
             "level=INFO component=merge msg=\"corrected\" dur_ms=1 tokens=2",
             victim.tool, victim.ts.to_pydatetime()),
            # brand-new key -> insert
            ("conv-merge-new", 0, victim.role,
             "level=INFO component=merge msg=\"inserted\" dur_ms=1 tokens=2",
             victim.tool, victim.ts.to_pydatetime()),
        ],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp_ntz",
    )
    pipe.merge_upsert(updates, run_id="merge1")

    rows = _key_rows(pipe, victim.conv_id, int(victim.turn_idx))
    assert len(rows) == 1  # replaced, not duplicated
    assert "corrected" in rows[0]["text"]
    assert len(_key_rows(pipe, "conv-merge-new", 0)) == 1
    assert pipe.read_sinks().count() == n0 + 1  # one update + one insert

    # time travel: pre-merge snapshot still shows the original text
    old = (
        pipe.read_sinks(as_of_run="base")
        .filter(
            (F.col("conv_id") == victim.conv_id)
            & (F.col("turn_idx") == int(victim.turn_idx))
        )
        .collect()
    )
    assert len(old) == 1 and old[0]["text"] == victim.text
    assert pipe.read_sinks(as_of_run="base").count() == n0


def test_merge_can_move_a_row_between_sinks(spark, pipe, turns_pdf):
    # pick a non-error row and correct it into an ERROR -> routing moves it
    src = pipe.read_sinks().filter(F.col("sink") != "sink_errors").first()
    updates = spark.createDataFrame(
        [(src["conv_id"], src["turn_idx"], "assistant",
          'level=ERROR component=merge msg="now an error" dur_ms=1 tokens=2',
          src["tool"], src["ts"])],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp_ntz",
    )
    pipe.merge_upsert(updates, run_id="merge-move")
    rows = _key_rows(pipe, src["conv_id"], src["turn_idx"])
    assert len(rows) == 1  # gone from the old sink, present in the new
    assert rows[0]["sink"] == "sink_errors"


def test_delete_where_removes_and_time_travel_restores(spark, pipe):
    n0 = pipe.read_sinks().count()
    n_err = pipe.read_sinks(sink="sink_errors").count()
    assert n_err > 0
    pipe.delete_where(F.col("sink") == "sink_errors", run_id="del1")
    assert pipe.read_sinks(sink="sink_errors").count() == 0  # emptied
    assert pipe.read_sinks().count() == n0 - n_err  # others untouched
    # emptied partitions must NOT resurrect from the pre-delete run
    assert pipe.read_sinks(as_of_run="base", sink="sink_errors").count() == n_err


def test_delete_null_predicate_keeps_row(spark, pipe):
    n0 = pipe.read_sinks().count()
    # dur_ms is NULL on quarantine rows -> NULL predicate must keep them
    pipe.delete_where(F.col("dur_ms") > 10**9, run_id="del-null")
    assert pipe.read_sinks().count() == n0


def test_mutations_require_snapshots(spark, pipe, tmp_path, turns_pdf):
    flat = TranscriptPipeline(
        spark,
        PipelineConfig(
            sinks_path=str(tmp_path / "flat-sinks"),
            checkpoint_path=str(tmp_path / "flat-ckpt.jsonl"),
            n_buckets=8,
            n_salt=2,
        ),
    )
    with pytest.raises(ValueError, match="snapshots"):
        flat.merge_upsert(spark.createDataFrame(turns_pdf.iloc[:1]))
    with pytest.raises(ValueError, match="snapshots"):
        flat.delete_where(F.lit(True))


def test_compact_consolidates_live_snapshot(spark, pipe, turns_pdf):
    victim = turns_pdf.iloc[0]
    updates = spark.createDataFrame(
        [(victim.conv_id, int(victim.turn_idx), victim.role,
          'level=INFO component=c msg="v2" dur_ms=1 tokens=2',
          victim.tool, victim.ts.to_pydatetime())],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp_ntz",
    )
    pipe.merge_upsert(updates, run_id="m1")
    before = (
        pipe.read_sinks().toPandas().sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert len(set(pipe.snapshot_partitions().values())) == 2  # base + m1
    pipe.compact_snapshots(run_id="compact1")
    assert set(pipe.snapshot_partitions().values()) == {"compact1"}
    after = (
        pipe.read_sinks().toPandas().sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    import pandas as pd
    pd.testing.assert_frame_equal(before, after, check_like=True)
    removed = pipe.vacuum_snapshots()
    assert set(removed) == {"base", "m1"}  # everything pre-compaction reclaimed
    after2 = (
        pipe.read_sinks().toPandas().sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(before, after2, check_like=True)


def test_read_appended_refuses_rewritten_table(spark, pipe):
    """Rewrite runs carry copies of rows from earlier runs; unioning them
    as append epochs would double-count — read_appended must raise
    (round-2 advice), pointing at read_sinks()."""
    n0 = pipe.read_sinks().count()
    assert pipe.read_appended().count() == n0  # pre-rewrite: well-defined
    pipe.delete_where(F.col("conv_id") == "conv-00000", run_id="del1")
    with pytest.raises(ValueError, match="rewrite runs"):
        pipe.read_appended()
    # the manifest-resolved read stays correct
    assert pipe.read_sinks().filter(F.col("conv_id") == "conv-00000").count() == 0


def test_read_appended_raises_on_vacuumed_run(spark, turns_pdf, tmp_path):
    """A committed run whose files were vacuumed must raise
    FileNotFoundError from read_appended (mirroring _read_snapshot's
    expired-run contract), not silently vanish from the union."""
    import shutil

    p = TranscriptPipeline(spark, _cfg(tmp_path))
    sdf = spark.createDataFrame(turns_pdf)
    half = turns_pdf.shape[0] // 2
    p.run(spark.createDataFrame(turns_pdf.iloc[:half]), run_id="epoch1")
    p.run(spark.createDataFrame(turns_pdf.iloc[half:]), run_id="epoch2")
    assert p.read_appended().count() == len(turns_pdf)
    shutil.rmtree(f"{p.config.sinks_path}/run_id=epoch1")
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        p.read_appended()
    del sdf
