"""End-to-end pipeline vs the pure-pandas oracle — the north-rule gate:
per-sink routed-row count equality and per-turn text equality under
stable (conv_id, turn_idx) order (BASELINE.json input_hint). Plays the
role of the reference's JS e2e (contrib/js/index.js:28-45: round-trip a
value, grep it out of the mirror)."""

from __future__ import annotations

import pandas as pd
import pytest

from fluent_server_spark.oracle.pandas_oracle import (
    oracle_conversation_stats,
    oracle_pipeline,
    oracle_routed_counts,
    oracle_tool_histogram,
)
from fluent_server_spark.plans.pipeline import PipelineConfig, TranscriptPipeline


@pytest.fixture(scope="module", params=["native", "pandas"])
def ran_pipeline(request, spark, turns_sdf, tmp_path_factory):
    base = tmp_path_factory.mktemp(f"pipe-{request.param}")
    cfg = PipelineConfig(
        sinks_path=str(base / "sinks"),
        checkpoint_path=str(base / "checkpoint.jsonl"),
        parse_impl=request.param,
        n_buckets=16,
        n_salt=4,
        checkpoint_groups=2,
    )
    pipe = TranscriptPipeline(spark, cfg)
    pipe.run(turns_sdf, run_id=f"test-{request.param}")
    return pipe


@pytest.fixture(scope="module")
def oracle_routed(turns_pdf) -> pd.DataFrame:
    return oracle_pipeline(turns_pdf)


def test_routed_counts_exact(ran_pipeline, oracle_routed):
    got = (
        ran_pipeline.aggregates()["routed_counts"]
        .toPandas()
        .sort_values("sink")
        .reset_index(drop=True)
    )
    want = oracle_routed_counts(oracle_routed)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_per_turn_text_equality(ran_pipeline, oracle_routed):
    """Every row in every sink matches the oracle row-for-row, including
    sink assignment, under the canonical (conv_id, turn_idx) order."""
    got = (
        ran_pipeline.read_sinks()
        .select("conv_id", "turn_idx", "text", "sink", "role", "tool")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = (
        oracle_routed[["conv_id", "turn_idx", "text", "sink", "role", "tool"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_tool_histogram(ran_pipeline, oracle_routed):
    got = (
        ran_pipeline.aggregates()["tool_histogram"]
        .toPandas()
        .sort_values(["sink", "tool"])
        .reset_index(drop=True)
    )
    want = oracle_tool_histogram(oracle_routed)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_conversation_stats(ran_pipeline, oracle_routed):
    got = (
        ran_pipeline.aggregates()["conversation_stats"]
        .toPandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    want = oracle_conversation_stats(oracle_routed)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_like=True)


def test_checkpoint_metrics_match_counts(ran_pipeline, oracle_routed):
    """Observation-collected metrics (written during the sink write job)
    must equal the oracle per-sink counts — the integrity-check survival
    of the reference's shared-key digest idea (SURVEY.md A17 mapping)."""
    import json

    m = ran_pipeline.run_metrics().toPandas()
    totals: dict[str, int] = {}
    for sc in m.sink_counts:
        for k, v in json.loads(sc).items():
            totals[k] = totals.get(k, 0) + v
    want = oracle_routed.sink.value_counts().to_dict()
    got = {k: v for k, v in totals.items() if v}
    assert got == want
