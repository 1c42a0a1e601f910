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
    schema=DOCS_DDL,
    threshold: float = 0.2,
    max_files_per_trigger: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    transform=None,
):
    """Start the curate stream; returns the StreamingQuery (caller
    stops it). Layout under `output_dir`:

    * `docs/epoch=N`   — curated survivors (input schema)
    * `hashes/epoch=N` — (fp) md5 of each survivor, the exact-dedup
      ledger later epochs anti-join against
    * `stats/epoch=N`  — one row of per-stage survivor counts, the
      streaming analogue of the batch curate manifest

    `schema` is a DDL string or a StructType — pass a StructType when
    the source is another job's landed output (e.g. the live edge's
    routed sinks) whose exact schema is known only at run time.
    `transform`, if given, maps each raw micro-batch DataFrame to the
    curate input (adding `id_col`, dropping rows that must not be
    curated, e.g. quarantined turns) BEFORE the stage counters — so
    `stages["input"]` counts curate candidates, not raw stream rows.
    It must be deterministic (a pure column expression / filter):
    replayed epochs re-apply it to byte-identical inputs and must
    reproduce byte-identical survivors for the exactly-once overwrite
    contract to hold.
    """
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    def curate_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        sp = batch_df.sparkSession
        if transform is not None:
            batch_df = transform(batch_df)
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


def fold_ledger_into_index(
    spark: SparkSession,
    output_dir: str,
    corpus_index: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """LSM-style compaction for the curate stream's exact-dedup ledger —
    the maintenance job the module docstring commits to. Run it with the
    stream STOPPED after a drained epoch (the CLI's --fold-on-drain does
    exactly that); it

    1. appends the minhash signatures (band rows + shingle arrays) of
       every not-yet-folded accepted doc into the persisted corpus index
       at `corpus_index`, using the parameters from the index's own
       manifest, and
    2. truncates `{output_dir}/hashes/epoch=*` to one EMPTY
       `epoch=<max_folded>` dir (kept so later epochs' `epoch < N`
       ledger glob stays readable).

    The index FULLY subsumes the folded ledger: `with_shingles` emits at
    least one (possibly partial) word n-gram for every non-NULL text —
    `sequence(0, greatest(size-n, 0))` pads short docs with the
    whole-text gram — so an exact duplicate of any folded survivor has a
    byte-identical shingle set, hence an identical signature, the same
    bucket in every band, and verify jaccard 1.0 >= any threshold <= 1:
    stage 3 rejects it. (NULL-text docs have no fingerprint either — md5
    of NULL is NULL, which the ledger anti-join never matched — and the
    quality band drops them before they can be accepted, so nothing is
    lost by the truncation.)

    The fold deliberately WIDENS dedup semantics for later epochs: a
    non-identical near-dup (jaccard >= threshold) of a folded accepted
    doc is now rejected at stage 3, where pre-fold the stream only
    near-dup-checked against the frozen corpus. That closes the known
    accepted-vs-accepted near-dup gap rather than opening one.

    Fold progress is recorded in `{output_dir}/hashes/_folded.json`
    (`folded_below`: exclusive epoch bound) so re-running is a no-op
    until new epochs land. A crash between the index append and the
    marker update can leave duplicate signature rows in the index on
    re-run — harmless for curation (the candidate join is followed by
    DISTINCT, so duplicates only add redundant verify rows, never wrong
    answers), and the standard fix is an index rebuild, exactly as for
    any LSM compaction torn mid-merge.

    Returns {"folded_docs", "folded_below"}.
    """
    import glob as _glob
    import json
    import os
    import shutil

    from fluent_server_spark.operators.dedup import (
        _band_table,
        _minhash_sig,
        read_minhash_index,
    )

    marker = os.path.join(output_dir, "hashes", "_folded.json")
    folded_below = 0
    if os.path.exists(marker):
        with open(marker) as f:
            folded_below = json.load(f)["folded_below"]

    epoch_dirs = sorted(
        int(d.rsplit("=", 1)[1])
        for d in _glob.glob(os.path.join(output_dir, "docs", "epoch=*"))
    )
    todo = [e for e in epoch_dirs if e >= folded_below]
    if not todo:
        return {"folded_docs": 0, "folded_below": folded_below}
    max_epoch = max(todo)

    _, _, manifest = read_minhash_index(spark, corpus_index)
    if manifest["id_col"] != id_col:
        raise ValueError(
            f"index id_col {manifest['id_col']!r} != fold id_col {id_col!r}"
        )

    docs = (
        spark.read.option("basePath", f"{output_dir}/docs")
        .parquet(f"{output_dir}/docs/epoch=*")
    )
    fresh = docs.filter(
        (F.col("epoch") >= folded_below) & (F.col("epoch") <= max_epoch)
    ).drop("epoch")
    sig = _minhash_sig(
        fresh, id_col, text_col, manifest["n"], manifest["n_perm"],
        manifest["seed"],
    )
    shingled = sig.filter(F.size("hg") > 0)
    _band_table(
        shingled, id_col, manifest["n_perm"], manifest["n_bands"]
    ).write.mode("append").partitionBy("band").parquet(f"{corpus_index}/bands")
    shingled.select(id_col, "hg").write.mode("append").parquet(
        f"{corpus_index}/shingles"
    )
    folded = sig.count()
    sig.unpersist()  # _minhash_sig localCheckpoints; release the blocks

    # truncate the ledger: an empty epoch=<max> dir keeps the
    # `hashes/epoch=*` glob readable for later epochs' `epoch < N` read
    tmp = os.path.join(output_dir, "hashes", "_truncate_tmp")
    spark.createDataFrame([], "fp string").write.mode("overwrite").parquet(tmp)
    for d in _glob.glob(os.path.join(output_dir, "hashes", "epoch=*")):
        shutil.rmtree(d)
    os.rename(tmp, os.path.join(output_dir, "hashes", f"epoch={max_epoch}"))
    with open(marker, "w") as f:
        json.dump({"folded_below": max_epoch + 1}, f)
    return {
        "folded_docs": int(folded),
        "folded_below": max_epoch + 1,
    }


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
