"""Snapshot / time-travel sink reads (PipelineConfig(snapshots=True)) —
the Iceberg semantics the sandbox can't load jars for: run-scoped file
layout + checkpoint-log manifest, reads resolved as-of any committed run.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

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


# ------------------------------------------------- incremental scan

def test_read_incremental_is_the_appended_delta(spark, turns_pdf, tmp_path):
    """Incremental scan == exactly the rows of the runs in (from, to] —
    the Iceberg change-feed read. Three append epochs, every window
    checked against the per-run truth."""
    pipe = TranscriptPipeline(spark, _cfg(tmp_path))
    third = len(turns_pdf) // 3
    parts = [
        turns_pdf.iloc[:third],
        turns_pdf.iloc[third : 2 * third],
        turns_pdf.iloc[2 * third :],
    ]
    for i, p in enumerate(parts):
        pipe.run(spark.createDataFrame(p), run_id=f"run{i}")

    def n_rows(frm, to=None):
        return pipe.read_incremental(frm, to).count()

    sizes = [len(p) for p in parts]
    assert n_rows("run0", "run1") == sizes[1]
    assert n_rows("run1", "run2") == sizes[2]
    assert n_rows("run0", "run2") == sizes[1] + sizes[2]
    assert n_rows("run0") == sizes[1] + sizes[2]  # to=None -> head
    assert n_rows("run2") == 0  # nothing after head
    # delta CONTENT equals the run's own turns (text round-trips)
    delta = pipe.read_incremental("run1", "run2").toPandas()
    want = parts[2]
    assert sorted(delta["conv_id"] + "#" + delta["turn_idx"].astype(str)) == sorted(
        want["conv_id"] + "#" + want["turn_idx"].astype(str)
    )
    with pytest.raises(ValueError, match="no committed run"):
        pipe.read_incremental("nope")
    with pytest.raises(ValueError, match="commits after"):
        pipe.read_incremental("run2", "run0")


def test_read_incremental_rewrite_and_vacuum_contracts(spark, turns_pdf, tmp_path):
    """A rewrite INSIDE the range poisons the delta (raise); a rewrite
    BEFORE the range does not; a vacuumed in-range run raises."""
    pipe = TranscriptPipeline(spark, _cfg(tmp_path))
    half = spark.createDataFrame(turns_pdf.iloc[: len(turns_pdf) // 2])
    pipe.run(half, run_id="base")
    # rewrite epoch: delete some rows (copy-on-write rewrite run)
    pipe.delete_where(F.col("role") == "tool", run_id="rw")
    pipe.run(spark.createDataFrame(turns_pdf.iloc[len(turns_pdf) // 2 :]),
             run_id="more")
    # rewrite inside (base, more]: not well-defined
    with pytest.raises(ValueError, match="rewrite"):
        pipe.read_incremental("base", "more")
    # rewrite at the range start: fine, only 'more' is read
    assert pipe.read_incremental("rw", "more").count() == len(turns_pdf) - len(
        turns_pdf.iloc[: len(turns_pdf) // 2]
    )


def test_export_incremental_sync_loop(spark, turns_pdf, tmp_path):
    """The CDC-consumer loop: baseline sync, delta sync, no-op when
    nothing new, and crash-replay idempotence (bookmark rolled back ->
    same delta rewritten into the same dir, union unchanged)."""
    import json

    pipe = TranscriptPipeline(spark, _cfg(tmp_path))
    half = len(turns_pdf) // 2
    dest = str(tmp_path / "export")
    state = str(tmp_path / "sync_state.json")

    pipe.run(spark.createDataFrame(turns_pdf.iloc[:half]), run_id="r1")
    s1 = pipe.export_incremental(dest, state)
    assert s1 == {"synced_to": "r1", "n_rows": half, "baseline": True}

    pipe.run(spark.createDataFrame(turns_pdf.iloc[half:]), run_id="r2")
    s2 = pipe.export_incremental(dest, state)
    assert s2["synced_to"] == "r2" and s2["n_rows"] == len(turns_pdf) - half
    assert not s2["baseline"]

    # nothing new -> no-op
    assert pipe.export_incremental(dest, state)["n_rows"] == -1

    # union of sync dirs == append view at head
    exported = spark.read.option("basePath", dest).parquet(f"{dest}/sync=*")
    assert exported.count() == pipe.read_appended().count()

    # crash replay: bookmark rolled back to r1 -> r2 delta rewritten
    # into the SAME dir; union still equals the append view (no dupes)
    with open(state, "w") as f:
        json.dump({"last_run": "r1", "format": 1}, f)
    s2b = pipe.export_incremental(dest, state)
    assert s2b["synced_to"] == "r2" and s2b["n_rows"] == s2["n_rows"]
    exported = spark.read.option("basePath", dest).parquet(f"{dest}/sync=*")
    assert exported.count() == pipe.read_appended().count()

    # foreign bookmark fails loud
    with open(state, "w") as f:
        json.dump({"last_run": "not-a-run", "format": 1}, f)
    with pytest.raises(ValueError, match="bookmark"):
        pipe.export_incremental(dest, state)


def test_export_crash_with_new_commits_no_duplication(spark, turns_pdf, tmp_path):
    """The reviewer's window: sync dir written, bookmark NOT advanced,
    and a new commit lands before the retry. The retry must collect the
    un-bookmarked leftover dir and export one delta covering both runs,
    keeping union(sync dirs) == append view."""
    import json

    pipe = TranscriptPipeline(spark, _cfg(tmp_path))
    third = len(turns_pdf) // 3
    dest = str(tmp_path / "export")
    state = str(tmp_path / "_sync_state.json")

    pipe.run(spark.createDataFrame(turns_pdf.iloc[:third]), run_id="r1")
    pipe.export_incremental(dest, state)
    pipe.run(spark.createDataFrame(turns_pdf.iloc[third : 2 * third]), run_id="r2")
    pipe.export_incremental(dest, state)  # sync=r2 written, bookmark r2
    # simulate the crash: roll the bookmark back to r1 (sync=r2 is now
    # an un-bookmarked leftover), then a NEW commit lands
    with open(state, "w") as f:
        json.dump({"last_run": "r1", "format": 1}, f)
    pipe.run(spark.createDataFrame(turns_pdf.iloc[2 * third :]), run_id="r3")
    s = pipe.export_incremental(dest, state)
    assert s["synced_to"] == "r3"
    assert s["n_rows"] == len(turns_pdf) - third  # (r1, r3] in one delta
    import os

    assert not os.path.isdir(f"{dest}/sync=r2")  # leftover collected
    exported = spark.read.option("basePath", dest).parquet(f"{dest}/sync=*")
    assert exported.count() == pipe.read_appended().count()


def test_export_missing_commit_log_fails_loud(spark, tmp_path):
    pipe = TranscriptPipeline(spark, _cfg(tmp_path))
    with pytest.raises(FileNotFoundError, match="commit log"):
        pipe.export_incremental(str(tmp_path / "export"), str(tmp_path / "s.json"))


def test_export_missing_bookmark_foreign_dirs_refuse_own_dirs_heal(
    spark, turns_pdf, tmp_path
):
    """ADVICE r5 + review: a missing bookmark over sync dirs naming runs
    this table NEVER committed means --sync-state probably points at the
    wrong file — refuse loudly (force_baseline overrides). But a crashed
    FIRST baseline (our own sync dir, bookmark never landed) must keep
    self-healing unattended — its dirs name OUR committed runs."""
    import os

    pipe = TranscriptPipeline(spark, _cfg(tmp_path))
    dest = str(tmp_path / "export")
    state = str(tmp_path / "sync_state.json")
    pipe.run(spark.createDataFrame(turns_pdf), run_id="r1")

    # crashed first baseline: sync=r1 written, bookmark missing -> heals
    os.makedirs(f"{dest}/sync=r1", exist_ok=True)
    s = pipe.export_incremental(dest, state)
    assert s == {"synced_to": "r1", "n_rows": len(turns_pdf), "baseline": True}

    # foreign dir (a run id this table never committed) + missing
    # bookmark -> refuse, delete nothing
    os.makedirs(f"{dest}/sync=other-tables-run")
    wrong_state = str(tmp_path / "typo_state.json")
    with pytest.raises(ValueError, match="force_baseline"):
        pipe.export_incremental(dest, wrong_state)
    assert os.path.isdir(f"{dest}/sync=other-tables-run")
    assert os.path.isdir(f"{dest}/sync=r1")

    # explicit opt-in: wipes and re-baselines exactly like the old heal
    s = pipe.export_incremental(dest, wrong_state, force_baseline=True)
    assert s["baseline"] and s["n_rows"] == len(turns_pdf)
    assert not os.path.isdir(f"{dest}/sync=other-tables-run")
