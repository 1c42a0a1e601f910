"""Streaming corpus curation — the `--curate` batch chain's dedup and
quality-band stages running on the live edge, epoch by epoch.

Per micro-batch of newly arrived documents:

1. exact dedup WITHIN the batch (`dedup_keep_first`);
2. exact dedup against everything ACCEPTED by earlier epochs — an
   anti-join on the md5 fingerprint against the skinny hash ledger the
   stream itself maintains (`{out}/hashes/epoch=N`, one md5 per
   survivor; column-pruned parquet, so this read stays tiny);
3. near-dup rejection against the PERSISTED corpus LSH index
   (`minhash_lsh_pairs_against` with `corpus_index=` — the standing
   corpus is hashed once at rest, never re-scanned per epoch);
4. perplexity band filter against a FROZEN unigram model table with
   FROZEN band edges (`freeze_curate_model`) — a stateless
   stream-static join + aggregate, the CCNet band rule unchanged.

Exactly-once: every output (docs, hashes, stats) is written by
OVERWRITING its own `epoch=N` directory, the same idempotent-replay
contract as stream_into_snapshots / dedup_stream. Stage 2 stays
deterministic under replay because it reads only epochs STRICTLY BELOW
the current id — those are committed and immutable by the time epoch N
first runs, and Structured Streaming batch ids are monotone across
restarts, so a replayed epoch sees byte-identical inputs.

Scale notes: stages 1/3/4 are bounded per-epoch work (batch-sized
shuffles, index-partition reads, one model join). Stage 2's ledger
grows with the accepted stream — at 100 TB the production move is to
periodically FOLD accepted docs into the corpus index (rebuild or
band-partition append) and truncate the ledger; the ledger is the
between-folds increment, exactly like a LSM memtable over the index.

The whole chain is hash-deterministic, so the stream equals the batch
composition of the same operators over the same files — pinned in
tests/test_curate_stream.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fluent_server_spark.functions.text import md5_fingerprint
from fluent_server_spark.operators.dedup import (
    dedup_keep_first,
    minhash_lsh_pairs_against,
)
from fluent_server_spark.operators.lm_quality import (
    train_unigram,
    unigram_nll_scores,
)

DOCS_DDL = "doc_id long, text string"


def freeze_curate_model(
    corpus: DataFrame,
    lo_quantile: float = 0.1,
    hi_quantile: float = 0.9,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, float, float]:
    """(model, lo, hi): the unigram table trained on the reference
    corpus plus the NLL band edges computed on that same corpus — the
    artifacts a streaming quality filter scores against. Train once per
    corpus snapshot (the model is a plain aggregate table, storable as
    parquet); every epoch then scores against it without any corpus
    access, so the filter is stateless and the band never drifts with
    the stream."""
    model = train_unigram(corpus, id_col, text_col)
    scores = unigram_nll_scores(corpus, model, id_col, text_col)
    qs = scores.filter(F.col("avg_nll").isNotNull()).approxQuantile(
        "avg_nll", [float(lo_quantile), float(hi_quantile)], 0.001
    )
    if not qs:
        raise ValueError("corpus has no scoreable documents (all wordless)")
    return model, float(qs[0]), float(qs[1])


def curate_batch(
    batch_df: DataFrame,
    corpus_index: str,
    model: DataFrame,
    lo: float,
    hi: float,
    prior_hashes: DataFrame | None = None,
    threshold: float = 0.2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, dict[str, int]]:
    """Apply the four curation stages to one batch; returns (survivors,
    per-stage counts). Shared by the stream's foreachBatch and the
    batch oracle in tests — one code path, so stream == batch by
    construction."""
    stages: dict[str, int] = {"input": batch_df.count()}

    b = dedup_keep_first(batch_df, id_col, text_col)
    if prior_hashes is not None:
        b = b.withColumn("_fp", md5_fingerprint(F.col(text_col))).join(
            prior_hashes.select(F.col("fp").alias("_fp")),
            "_fp",
            "left_anti",
        ).drop("_fp")
    stages["exact_dedup"] = b.count()

    flagged = minhash_lsh_pairs_against(
        b, corpus_index=corpus_index, threshold=threshold,
        id_col=id_col, text_col=text_col,
    )
    b = b.join(
        flagged.select(F.col("new_id").alias(id_col)).distinct(),
        id_col,
        "left_anti",
    )
    stages["neardup_vs_corpus"] = b.count()

    scores = unigram_nll_scores(b, model, id_col, text_col)
    keep = scores.filter(
        F.col("avg_nll").between(float(lo), float(hi))
    ).select(id_col)
    b = b.join(keep, id_col, "left_semi")
    stages["quality_band"] = b.count()
    return b, stages


def stream_curate(
    spark: SparkSession,
    source_dir: str,
    corpus_index: str,
    model: DataFrame,
    lo: float,
    hi: float,
    output_dir: str,
    checkpoint_dir: str,
    schema: str = DOCS_DDL,
    threshold: float = 0.2,
    max_files_per_trigger: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Start the curate stream; returns the StreamingQuery (caller
    stops it). Layout under `output_dir`:

    * `docs/epoch=N`   — curated survivors (input schema)
    * `hashes/epoch=N` — (fp) md5 of each survivor, the exact-dedup
      ledger later epochs anti-join against
    * `stats/epoch=N`  — one row of per-stage survivor counts, the
      streaming analogue of the batch curate manifest
    """
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    def curate_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        sp = batch_df.sparkSession
        if int(epoch_id) == 0:
            prior = None  # first epoch: no ledger yet
        else:
            # epochs 0..N-1 committed before N first ran (batch ids are
            # monotone), so the ledger glob is non-empty here
            prior = (
                sp.read.option("basePath", f"{output_dir}/hashes")
                .parquet(f"{output_dir}/hashes/epoch=*")
                .filter(F.col("epoch") < int(epoch_id))
            )
        survivors, stages = curate_batch(
            batch_df, corpus_index, model, lo, hi,
            prior_hashes=prior, threshold=threshold,
            id_col=id_col, text_col=text_col,
        )
        survivors = survivors.persist()
        try:
            survivors.write.mode("overwrite").parquet(
                f"{output_dir}/docs/epoch={epoch_id}"
            )
            survivors.select(
                md5_fingerprint(F.col(text_col)).alias("fp")
            ).write.mode("overwrite").parquet(
                f"{output_dir}/hashes/epoch={epoch_id}"
            )
            sp.createDataFrame(
                [tuple(stages.values())],
                ", ".join(f"{k} long" for k in stages),
            ).write.mode("overwrite").parquet(
                f"{output_dir}/stats/epoch={epoch_id}"
            )
        finally:
            survivors.unpersist()

    return (
        stream.writeStream.foreachBatch(curate_epoch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def read_curated(spark: SparkSession, output_dir: str) -> DataFrame:
    """All curated docs across epochs (epoch dirs self-overwrite, so
    the union is exactly-once)."""
    return (
        spark.read.option("basePath", f"{output_dir}/docs")
        .parquet(f"{output_dir}/docs/epoch=*")
        .drop("epoch")
    )


def read_curate_stats(spark: SparkSession, output_dir: str) -> DataFrame:
    """Per-epoch stage-count rows (epoch column retained)."""
    return spark.read.option("basePath", f"{output_dir}/stats").parquet(
        f"{output_dir}/stats/epoch=*"
    )
