"""Streaming sketch maintenance (streaming/sketch_stream.py): merged
per-epoch sketches must be BIT-EQUAL to batch-building over all data,
and a restart with the same checkpoint must stay exactly-once."""

from __future__ import annotations

from pyspark.sql import functions as F

from fluent_server_spark.operators.sketches import count_min_build, hll_build
from fluent_server_spark.streaming.sketch_stream import (
    TURNS_LIKE_DDL,
    read_merged_cms,
    read_merged_hll,
    stream_sketches,
)


def _rows(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.concat(F.lit("c"), (F.col("id") % 7)).alias("conv_id"),
        F.col("id").cast("int").alias("turn_idx"),
        F.concat(F.lit("t"), (F.col("id") % 13)).alias("event_type"),
    )


def _run_until_drained(q):
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def _cms_rows(df):
    return {(r["d"], r["bucket"], r["cnt"]) for r in df.collect()}


def _hll_rows(df):
    return {(r["register"], r["max_rank"]) for r in df.collect()}


def test_stream_sketches_match_batch_and_survive_restart(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    _rows(spark, 0, 400).write.parquet(f"{src}/part1")
    _rows(spark, 400, 900).write.parquet(f"{src}/part2")

    q = stream_sketches(
        spark, f"{src}/part*", out, ck, "event_type",
        schema=TURNS_LIKE_DDL, max_files_per_trigger=2,
    )
    _run_until_drained(q)

    all_rows = _rows(spark, 0, 900)
    assert _cms_rows(read_merged_cms(spark, out)) == _cms_rows(
        count_min_build(all_rows, "event_type")
    )
    assert _hll_rows(read_merged_hll(spark, out)) == _hll_rows(
        hll_build(all_rows, "event_type")
    )

    # restart with MORE data: same checkpoint, old files not re-counted
    _rows(spark, 900, 1200).write.parquet(f"{src}/part3")
    q2 = stream_sketches(
        spark, f"{src}/part*", out, ck, "event_type",
        schema=TURNS_LIKE_DDL, max_files_per_trigger=2,
    )
    _run_until_drained(q2)

    full = _rows(spark, 0, 1200)
    assert _cms_rows(read_merged_cms(spark, out)) == _cms_rows(
        count_min_build(full, "event_type")
    )
    assert _hll_rows(read_merged_hll(spark, out)) == _hll_rows(
        hll_build(full, "event_type")
    )
