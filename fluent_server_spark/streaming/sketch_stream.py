"""Streaming sketch maintenance — the payoff of the mergeable-sketch
design (operators/sketches.py): because merge == build-on-union is
bit-exact and idempotent, a live stream can maintain corpus-wide
frequency (count-min) and distinct-count (HLL) state as PLAIN PARQUET
per-epoch sketch tables, with exactly-once falling out of the layout:

* each micro-batch writes its OWN epoch's sketches to
  `{out}/cms/epoch=N` and `{out}/hll/epoch=N` with mode=overwrite —
  Structured Streaming's replay of a failed epoch rewrites the same
  dirs instead of double-counting (same contract as dedup_stream /
  stream_into_snapshots);
* the CURRENT corpus-wide sketch is just a read of every epoch dir +
  one merge aggregation — no state store, no checkpointed operator
  state, restartable from the files alone;
* epoch dirs compact by REPLACING many epochs with their merge (the
  merge IS a sketch of the union — proven bit-exact in tests), the
  same rewrite shape as snapshot compaction.

At 10^12 turns this is how per-day dashboards stay O(sketch) instead
of O(stream): the heavy keyed shuffle happens once per epoch over only
that epoch's rows; readers touch depth*width (+ 2^p) counters per
epoch, never the stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from fluent_server_spark.operators.sketches import (
    count_min_build,
    count_min_merge,
    hll_build,
    hll_merge,
)

TURNS_LIKE_DDL = "conv_id string, turn_idx int, event_type string"


def stream_sketches(
    spark: SparkSession,
    source_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    key_col: str,
    schema: str = TURNS_LIKE_DDL,
    depth: int = 5,
    width: int = 1024,
    p: int = 12,
    max_files_per_trigger: int = 4,
    text_col: str | None = None,
    gram_buckets: int = 4096,
):
    """Start the sketch-maintenance stream; returns the StreamingQuery
    (caller stops it). Writes per-epoch CMS + HLL sketch tables of
    `key_col` under output_dir; with `text_col`, additionally writes
    per-epoch gram-bucket distributions (operators/dsir.py featurizer)
    — the drift-monitoring history `adjacent_epoch_drift` consumes, at
    the same exactly-once epoch-dir contract."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    def sketch_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        count_min_build(batch_df, key_col, depth=depth, width=width).write.mode(
            "overwrite"
        ).parquet(f"{output_dir}/cms/epoch={epoch_id}")
        hll_build(batch_df, key_col, p=p).write.mode("overwrite").parquet(
            f"{output_dir}/hll/epoch={epoch_id}"
        )
        if text_col is not None:
            from fluent_server_spark.operators.dsir import gram_bucket_counts

            gram_bucket_counts(
                batch_df, id_col=key_col, text_col=text_col,
                n_buckets=gram_buckets,
            ).write.mode("overwrite").parquet(
                f"{output_dir}/gram/epoch={epoch_id}"
            )

    return (
        stream.writeStream.foreachBatch(sketch_epoch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def read_merged_cms(spark: SparkSession, output_dir: str) -> DataFrame:
    """The corpus-wide count-min sketch: union of every epoch + one
    merge agg. Epoch partition discovery adds an `epoch` column; the
    merge ignores it (counter addition commutes across epochs)."""
    per_epoch = spark.read.parquet(f"{output_dir}/cms").select(
        "d", "bucket", "cnt"
    )
    return count_min_merge(per_epoch)


def read_merged_hll(spark: SparkSession, output_dir: str) -> DataFrame:
    per_epoch = spark.read.parquet(f"{output_dir}/hll").select(
        "register", "max_rank"
    )
    return hll_merge(per_epoch)


def read_epoch_drift(spark: SparkSession, output_dir: str) -> DataFrame:
    """Per-epoch drift alarms off the gram history the stream wrote:
    (epoch, jsd, l1, buckets_gained, buckets_lost) vs the previous
    epoch, one plan over the ≤B-rows-per-epoch history table."""
    from fluent_server_spark.operators.drift import adjacent_epoch_drift

    hist = spark.read.parquet(f"{output_dir}/gram").select(
        "epoch", "bucket", "cnt"
    )
    return adjacent_epoch_drift(hist)
