"""Streaming dedup-on-ingest: every micro-batch of newly arrived
documents is near-dup-checked against the PERSISTED MinHash LSH corpus
index (operators/dedup.py::write_minhash_index) — the production shape
of incremental dedup at 100 TB: the standing corpus is hashed ONCE at
rest; each ingest epoch reads only the stored (id, band, bucket) and
(id, hg) relations, never the corpus text.

Structure mirrors stream_into_snapshots: file stream -> foreachBatch
running the SAME batch operator (minhash_lsh_pairs_against with
corpus_index=...), so stream and batch share one code path — the
stream==batch equality is pinned in tests/test_streaming.py.

Exactly-once: each epoch OVERWRITES its own `epoch=N` output directory,
so Structured Streaming's replay of a failed epoch (same epoch id)
rewrites the same dir instead of appending duplicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCS_DDL = "doc_id long, text string"


def stream_neardup_against_index(
    spark: SparkSession,
    source_dir: str,
    corpus_index: str,
    output_dir: str,
    checkpoint_dir: str,
    schema: str = DOCS_DDL,
    threshold: float = 0.2,
    max_files_per_trigger: int = 4,
):
    """Start the ingest-dedup stream; returns the StreamingQuery
    (caller stops it). Output: parquet under `{output_dir}/epoch=N/`
    with (new_id, corpus_id, jaccard) per flagged pair."""
    from fluent_server_spark.operators.dedup import minhash_lsh_pairs_against

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    def check_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        pairs = minhash_lsh_pairs_against(
            batch_df, corpus_index=corpus_index, threshold=threshold
        )
        (
            pairs.write.mode("overwrite").parquet(
                f"{output_dir}/epoch={epoch_id}"
            )
        )

    return (
        stream.writeStream.foreachBatch(check_epoch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def read_flagged_pairs(spark: SparkSession, output_dir: str) -> DataFrame:
    """All flagged pairs across epochs (epoch dirs are self-overwriting,
    so this union is exactly-once)."""
    return (
        spark.read.option("basePath", output_dir)
        .parquet(f"{output_dir}/epoch=*")
        .drop("epoch")
    )


MEDIA_DDL = "media_id long, modality string, payload binary"


def stream_media_neardup_against_index(
    spark: SparkSession,
    source_dir: str,
    corpus_index: str,
    output_dir: str,
    checkpoint_dir: str,
    schema: str = MEDIA_DDL,
    max_hamming: int = 3,
    max_files_per_trigger: int = 4,
    max_bucket: int | None = None,
):
    """Media twin of stream_neardup_against_index: each ingest epoch
    fingerprints ONLY the newly arrived payloads (map-only Arrow) and
    probes the persisted banded fingerprint index
    (operators/media_dedup.py::write_media_fingerprint_index) — the
    standing corpus is never re-decoded. Same exactly-once contract:
    self-overwriting `epoch=N` dirs, stream == batch pinned in tests.
    Output rows: (new_id, corpus_id, hamming)."""
    from fluent_server_spark.operators.media_dedup import media_neardup_against

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    def check_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        pairs = media_neardup_against(
            batch_df, corpus_index, max_hamming=max_hamming,
            max_bucket=max_bucket,
        )
        (
            pairs.write.mode("overwrite").parquet(
                f"{output_dir}/epoch={epoch_id}"
            )
        )

    return (
        stream.writeStream.foreachBatch(check_epoch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
