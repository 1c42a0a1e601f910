"""Source registry + CLI entry point (the reader-plugin seam, A21)."""

from __future__ import annotations

import json

import pytest

from fluent_server_spark.__main__ import main as cli_main
from fluent_server_spark.sources import load_turns


def test_parquet_roundtrip(spark, turns_pdf, tmp_path):
    p = str(tmp_path / "turns.parquet")
    spark.createDataFrame(turns_pdf).write.parquet(p)
    df = load_turns(spark, "parquet", p)
    assert df.count() == len(turns_pdf)
    assert [f.name for f in df.schema.fields] == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts",
    ]


def test_json_source(spark, tmp_path):
    p = str(tmp_path / "turns.json")
    spark.createDataFrame(
        [("c1", 0, "user", "hello", "none", "2024-01-01 00:00:00")],
        "conv_id string, turn_idx int, role string, text string, tool string, ts string",
    ).write.json(p)
    df = load_turns(spark, "json", p)
    row = df.first()
    assert row.conv_id == "c1" and str(row.ts).startswith("2024-01-01")


def test_synthetic_source(spark):
    assert load_turns(spark, "synthetic", "500:10").count() == 500


def test_missing_column_fails_fast(spark, tmp_path):
    p = str(tmp_path / "bad.parquet")
    spark.range(5).write.parquet(p)
    with pytest.raises(ValueError, match="missing columns"):
        load_turns(spark, "parquet", p)


def test_unknown_source(spark):
    with pytest.raises(ValueError, match="unknown source"):
        load_turns(spark, "msgpack", "x")


def test_iceberg_unavailable_has_actionable_error(spark):
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        load_turns(spark, "iceberg", "db.turns")


def test_cli_end_to_end(spark, tmp_path, capsys):
    rc = cli_main(
        [
            "--source", "synthetic",
            "--input", "2000:50",
            "--sinks", str(tmp_path / "sinks"),
            "--checkpoint", str(tmp_path / "ckpt.jsonl"),
            "--groups", "2",
            "--run-id", "cli-test",
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["run_id"] == "cli-test"
    assert sum(out["routed_counts"].values()) == 2000
