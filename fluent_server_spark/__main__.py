"""spark-submit entry point.

    spark-submit --py-files fluent_server_spark.zip \
        -m fluent_server_spark  # or: python -m fluent_server_spark
        --source parquet --input s3://bucket/turns/ \
        --sinks s3://bucket/sinks --checkpoint /mnt/ckpt/run1.jsonl \
        --groups 256 --buckets 65536 --salt 64 --run-id prod-2026-08-16

On a cluster the config mirrors the reference's env-var config surface
(reference: main.go:21-58) as explicit flags. Re-running with the same
--run-id and --checkpoint resumes from the last acked group.

Edge-daemon mode (no Spark — the reference's main.go server face;
real fluentd/fluent-bit agents point here):

    python -m fluent_server_spark --forward-server /var/spool/fss \
        --port 24224 --shared-key s3cret --heartbeat --rotate-seconds 60

lands per-tag spool segments that the Spark side batch-reads
(sources/fluentfile.py) or stream-tails (stream_spool_routed).
"""

from __future__ import annotations

import argparse
import json
import sys

from fluent_server_spark.plans.pipeline import PipelineConfig, TranscriptPipeline
from fluent_server_spark.session import get_spark
from fluent_server_spark.sources import load_turns


def _run_forward_server(args) -> int:
    """The ingest-edge daemon loop: serve, rotate segments on a timer,
    exit after --max-seconds (0 = run until interrupted)."""
    import asyncio
    import signal

    from fluent_server_spark.sources.forward_server import ForwardServer

    def _sigterm(*_args) -> None:
        raise KeyboardInterrupt

    signal.signal(signal.SIGTERM, _sigterm)

    async def serve() -> None:
        srv = ForwardServer(
            args.forward_server,
            host=args.host,
            port=args.port,
            shared_key=args.shared_key,
            heartbeat=args.heartbeat,
        )
        await srv.start()
        print(
            json.dumps({"forward_server": {"host": args.host, "port": srv.port}}),
            flush=True,
        )
        loop = asyncio.get_running_loop()
        start = last_rotate = loop.time()
        try:
            while True:
                await asyncio.sleep(0.2)
                now = loop.time()
                if now - last_rotate >= args.rotate_seconds:
                    srv.rotate()
                    last_rotate = now
                if args.max_seconds and now - start >= args.max_seconds:
                    break  # bounded-run mode for tests/smoke
        finally:
            await srv.stop()
            print(json.dumps({"stats": srv.stats}), flush=True)

    try:
        asyncio.run(serve())
    except KeyboardInterrupt:
        pass
    return 0


def _run_live_edge(args) -> int:
    """ONE-COMMAND live edge: fluent-forward daemon + streaming spool
    tail + exactly-once parquet sinks in a single process.

        python -m fluent_server_spark --live-edge /var/spool/fss \
            --sinks /data/sinks --checkpoint /data/stream-ck \
            --port 24224 [--shared-key K] [--rotate-seconds 60]

    Dataflow: fluentd/fluent-bit agents -> ForwardServer (asyncio thread,
    `hidden_active` segments) -> rotate timer seals segments (rename to a
    Spark-visible name; files are immutable from then on) -> Structured
    Streaming binaryFile tail -> the SAME parse/enrich/route transform as
    batch -> streaming parquet sink partitioned by sink (exactly-once via
    the file-sink manifest + stream checkpoint; --checkpoint here is the
    STREAM checkpoint dir, not the batch jsonl log).

    Shutdown/drain story (SIGINT/Ctrl-C or --max-seconds): 1) stop the
    TCP listener — agents see a closed connection and retry against
    another edge (unacked chunks are theirs to resend); 2) seal the tail
    segment with a final rotate; 3) q.processAllAvailable() — the stream
    drains every sealed file; 4) stop the query and report sink counts +
    wire stats as JSON. A restart with the same --checkpoint resumes
    exactly-once: already-committed files are skipped by the sink log.
    """
    import asyncio
    import signal
    import threading
    import time

    from fluent_server_spark.sources.forward_server import ForwardServer
    from fluent_server_spark.streaming.stream_pipeline import stream_spool_routed

    # daemons are stopped with SIGTERM; route it into the same drain
    # path as Ctrl-C (KeyboardInterrupt out of the sleep loop below)
    def _sigterm(*_args) -> None:
        raise KeyboardInterrupt

    signal.signal(signal.SIGTERM, _sigterm)

    spool = args.live_edge
    srv = ForwardServer(
        spool,
        host=args.host,
        port=args.port,
        shared_key=args.shared_key,
        heartbeat=args.heartbeat,
        hidden_active=True,
    )
    loop = asyncio.new_event_loop()
    ready = threading.Event()

    def edge() -> None:
        asyncio.set_event_loop(loop)
        loop.run_until_complete(srv.start())
        ready.set()
        loop.run_forever()

    t = threading.Thread(target=edge, daemon=True, name="fss-edge")
    t.start()
    ready.wait()
    print(
        json.dumps(
            {"live_edge": {"host": args.host, "port": srv.port, "spool": spool}}
        ),
        flush=True,
    )

    spark = get_spark("fss-live-edge", cpus=args.cpus)
    pipe = None
    if args.snapshots:
        # full snapshot-table landing: one manifest-committed run per
        # epoch -> read_appended / time travel / MERGE surface on the
        # live table (the batch commit log lives INSIDE the sinks dir as
        # an underscore file, invisible to parquet scans)
        import os as _os

        from fluent_server_spark.plans.pipeline import (
            PipelineConfig,
            TranscriptPipeline,
        )
        from fluent_server_spark.streaming.stream_pipeline import (
            stream_spool_into_snapshots,
        )

        _os.makedirs(args.sinks, exist_ok=True)
        pipe = TranscriptPipeline(
            spark,
            PipelineConfig(
                sinks_path=args.sinks,
                checkpoint_path=_os.path.join(args.sinks, "_batch_commits.jsonl"),
                parse_impl=args.parse_impl,
                n_buckets=args.buckets,
                n_salt=args.salt,
                checkpoint_groups=args.groups,
                snapshots=True,
            ),
        )
        q = stream_spool_into_snapshots(
            spark, spool, pipe, args.checkpoint, recursive=True
        )
    elif args.dedup_index:
        # dedup-on-ingest composition: every micro-batch of routed turns
        # is near-dup-checked against the PERSISTED minhash corpus index
        # (written once from the standing corpus by write_minhash_index;
        # its text is never scanned here) and duplicate turns are
        # DIVERTED to sink=sink_duplicates — edge-side duplicate
        # suppression, the deployment shape of streaming/dedup_stream.py
        # welded onto the live wire. Exactly-once: each epoch overwrites
        # its own epoch=N dir, so Structured Streaming's replay of a
        # failed epoch rewrites instead of appending.
        from pyspark.sql import functions as _F

        from fluent_server_spark.operators.dedup import minhash_lsh_pairs_against

        routed = stream_spool_routed(
            spark, spool, parse_impl=args.parse_impl, recursive=True
        )
        idx, thr, sinks = args.dedup_index, args.dedup_threshold, args.sinks

        def dedup_epoch(batch_df, epoch_id: int) -> None:
            keyed = batch_df.withColumn(
                "_tk", _F.concat_ws("#", "conv_id", "turn_idx")
            )
            dups = (
                minhash_lsh_pairs_against(
                    keyed.select(_F.col("_tk").alias("doc_id"), "text"),
                    corpus_index=idx,
                    threshold=thr,
                )
                .select(_F.col("new_id").alias("_tk"))
                .distinct()
                .withColumn("_dup", _F.lit(True))
            )
            out = (
                keyed.join(dups, "_tk", "left")
                .withColumn(
                    "sink",
                    _F.when(
                        _F.coalesce("_dup", _F.lit(False)),
                        _F.lit("sink_duplicates"),
                    ).otherwise(_F.col("sink")),
                )
                .drop("_tk", "_dup")
            )
            out.write.mode("overwrite").partitionBy("sink").parquet(
                f"{sinks}/epoch={epoch_id}"
            )

        q = (
            routed.writeStream.foreachBatch(dedup_epoch)
            .option("checkpointLocation", args.checkpoint)
            .start()
        )
    else:
        routed = stream_spool_routed(
            spark, spool, parse_impl=args.parse_impl, recursive=True
        )
        q = (
            routed.writeStream.format("parquet")
            .option("path", args.sinks)
            .option("checkpointLocation", args.checkpoint)
            .partitionBy("sink")
            .outputMode("append")
            .start()
        )
    start = last_rotate = time.time()
    try:
        while True:
            time.sleep(0.2)
            now = time.time()
            if now - last_rotate >= args.rotate_seconds:
                loop.call_soon_threadsafe(srv.rotate)
                last_rotate = now
            if args.max_seconds and now - start >= args.max_seconds:
                break  # bounded-run mode for tests/smoke
    except KeyboardInterrupt:
        pass
    # a second SIGTERM arriving mid-drain (an impatient supervisor
    # re-signalling) must not propagate out of the drain block — that
    # would skip srv.stop()/final rotate/processAllAvailable and abandon
    # the tail segment. The first signal got us here; ignore the rest.
    signal.signal(signal.SIGTERM, signal.SIG_IGN)
    # drain: stop intake, seal the tail segment, let the stream catch up
    asyncio.run_coroutine_threadsafe(srv.stop(), loop).result(timeout=30)
    sealed = threading.Event()
    loop.call_soon_threadsafe(lambda: (srv.rotate(), sealed.set()))
    sealed.wait(timeout=30)
    q.processAllAvailable()
    q.stop()
    loop.call_soon_threadsafe(loop.stop)
    from pyspark.sql import functions as F

    compaction = None
    if pipe is not None and args.compact_on_drain:
        # many short epochs -> many tiny run dirs: rewrite the live
        # snapshot into ONE run (byte-equal data) and reclaim the old
        # epoch dirs — the rewrite_data_files + expire_snapshots pass a
        # real table runs after streaming ingest
        try:
            run = pipe.compact_snapshots()
            removed = pipe.vacuum_snapshots()
            compaction = {"compacted_run": run, "vacuumed_dirs": len(removed)}
        except Exception as e:  # an empty table has nothing to compact
            compaction = {"skipped": f"{type(e).__name__}: {e}"}
    try:
        if pipe is None:
            table = spark.read.parquet(args.sinks)
        elif compaction is not None and "compacted_run" in compaction:
            # post-rewrite state resolves through the manifest —
            # read_appended deliberately refuses after a rewrite run
            table = pipe.read_sinks()
        else:
            table = pipe.read_appended()
        counts = {
            r["sink"]: r["n"]
            for r in table.groupBy("sink")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
    except Exception:
        counts = {}  # nothing ever arrived: the sink dir was never created
    out = {"stats": srv.stats, "sink_counts": counts}
    if compaction is not None:
        out["compaction"] = compaction
    if args.curate_stream:
        # ONE-COMMAND wire -> curated parquet: the ingest drain above
        # sealed and landed every acked turn exactly-once; now drain the
        # landed routed sinks through the streaming curate chain (same
        # artifacts-at-rest semantics as --curate-stream). The curate
        # stage keeps its OWN checkpoint under the curate out dir, so a
        # re-run of this same command resumes BOTH stages exactly-once:
        # the ingest sink log skips committed spool files, the curate
        # checkpoint skips committed sink files, and new wire traffic
        # extends both by whole epochs.
        out["curate_stream"] = _curate_landed_sinks(spark, args)
    print(json.dumps(out), flush=True)
    return 0


def _curate_landed_sinks(spark, args) -> dict:
    """Curate the live edge's landed routed-turn sinks: stream the sink
    dir (resolved through the file sink's `_spark_metadata` log, so only
    committed files are listed), map turns -> curate candidates, and run
    the shared curate-drain. Quarantined turns (unparseable off the
    wire) are excluded from curation — they are routed for triage, not
    training. The curate id is `xxhash64(conv_id, turn_idx)` so folded
    signatures stay type-compatible with a documents-built corpus index
    (long ids); at extreme corpus sizes an id-collision-free deployment
    would build the index with the composite string key instead — the
    operators take `id_col` for exactly that."""
    from pyspark.sql import functions as F

    from fluent_server_spark.data.synth import QUARANTINE_SINK

    out_dir = args.curate_stream
    try:
        landed_schema = spark.read.parquet(args.sinks).schema
    except Exception:
        return {"skipped": "no sinks landed"}

    def to_docs(df):
        # A client retrying an acked chunk (the Forward protocol's
        # at-least-once shape) lands byte-identical rows that share the
        # same (conv_id, turn_idx) — so the same doc_id, which the
        # curate chain's min-id exact dedup cannot collapse (its keeper
        # semi-join keeps every row carrying the keeper id). Collapse
        # them by VALUE here: distinct() is deterministic, so replayed
        # epochs still reproduce byte-identical survivors. Key
        # collisions with DIFFERENT payloads stay distinct rows and
        # fall through to the text-level dedup stages like any other
        # duplicate text.
        return (
            df.filter(F.col("sink") != QUARANTINE_SINK)
            .distinct()
            .withColumn("doc_id", F.xxhash64("conv_id", "turn_idx"))
        )

    return _curate_stream_drain(
        spark, args, out_dir, args.sinks, f"{out_dir}/ckpt",
        schema=landed_schema, transform=to_docs,
    )


def _run_curate(args) -> int:
    """One-command corpus curation — the batch composition a training-
    data team actually runs, chaining the operator family end-to-end:

        exact dedup -> near-dup clustering (minhash LSH + connected
        components) -> n-gram decontamination (optional, needs an eval
        set) -> perplexity band quality filter -> DSIR target selection
        (optional) -> deterministic train/val/test split -> partitioned
        parquet + a stage-count manifest [-> --pack-pretrain: BPE train
        on the train split, persist merges, concat-and-chunk to fixed
        seq_len token rows in OUT_DIR/chunks].

    Every stage is hash-deterministic, so two runs over the same input
    produce byte-identical keep sets — the manifest records per-stage
    survivor counts for audit. Usage:

        python -m fluent_server_spark --curate OUT_DIR \
            --input /data/sfX [--curate-eval EVAL.parquet] \
            [--curate-select N] [--curate-target-lang en]
    """
    import os

    from pyspark.sql import functions as F

    from fluent_server_spark.operators.decontaminate import decontaminate
    from fluent_server_spark.operators.dedup import (
        connected_components,
        dedup_keep_first,
        minhash_lsh_pairs,
    )
    from fluent_server_spark.operators.dsir import dsir_select
    from fluent_server_spark.operators.lm_quality import perplexity_band_filter
    from fluent_server_spark.operators.sampling import sample_hash

    spark = get_spark("fss-curate", cpus=args.cpus)
    src = args.input
    if src and os.path.isdir(src) and os.path.exists(f"{src}/documents.parquet"):
        src = f"{src}/documents.parquet"
    docs = spark.read.parquet(src)
    stages: dict[str, int] = {"input": docs.count()}

    docs = dedup_keep_first(docs)
    stages["exact_dedup"] = docs.count()

    pairs = minhash_lsh_pairs(docs, threshold=args.dedup_threshold)
    comp = connected_components(pairs)
    drop = comp.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias("doc_id")
    )
    docs = docs.join(drop, "doc_id", "left_anti")
    stages["neardup_cluster_dedup"] = docs.count()

    if args.curate_eval:
        eval_docs = spark.read.parquet(args.curate_eval)
        flags = decontaminate(docs, eval_docs)
        docs = docs.join(
            flags.filter(~F.col("contaminated")).select("doc_id"),
            "doc_id",
            "left_semi",
        )
        stages["decontaminated"] = docs.count()

    docs = perplexity_band_filter(docs)
    stages["quality_band"] = docs.count()

    if args.curate_select:
        target = docs.filter(F.col("lang") == args.curate_target_lang)
        picked = dsir_select(docs, target, args.curate_select).select("doc_id")
        docs = docs.join(picked, "doc_id", "left_semi")
        stages["dsir_selected"] = docs.count()

    # deterministic split: disjoint exhaustive ranges of one hash
    # (the corpus_splits contract) — reproducible across engines/runs
    h = sample_hash(F.col("doc_id"), "curate-split")
    out = docs.withColumn(
        "split",
        F.when(h < 900_000, "train").when(h < 950_000, "val").otherwise("test"),
    )
    out.write.mode("overwrite").partitionBy("split").parquet(
        f"{args.curate}/documents"
    )
    splits = {
        r["split"]: r["n"]
        for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    manifest = {
        "stages": stages,
        "splits": splits,
        "params": {
            "dedup_threshold": args.dedup_threshold,
            "eval": args.curate_eval,
            "select": args.curate_select,
            "target_lang": args.curate_target_lang,
        },
    }

    if args.pack_pretrain:
        # final stage of a PRETRAINING pipeline: BPE trained on the
        # train split only (no val/test leakage into the vocabulary),
        # merges persisted for reproducible re-tokenization, then the
        # train split concat-and-chunked into fixed seq_len token rows.
        # Tails are KEPT in the parquet (flagged by n_tokens < seq_len)
        # so nothing is silently lost; a dataloader filters them.
        from fluent_server_spark.operators.bpe import bpe_train
        from fluent_server_spark.operators.pretrain_pack import (
            pack_pretrain_chunks,
        )

        train = out.filter(F.col("split") == "train").select("doc_id", "text")
        merges = bpe_train(train, args.pack_merges)
        merges.write.mode("overwrite").parquet(f"{args.curate}/bpe_merges")
        pack_pretrain_chunks(
            train,
            spark.read.parquet(f"{args.curate}/bpe_merges"),
            seq_len=args.pack_pretrain,
            n_shards=args.pack_shards,
            keep_tail=True,
        ).write.mode("overwrite").parquet(f"{args.curate}/chunks")
        row = (
            spark.read.parquet(f"{args.curate}/chunks")
            .agg(
                F.count(F.lit(1)).alias("n_chunks"),
                F.sum(
                    (F.col("n_tokens") == args.pack_pretrain).cast("long")
                ).alias("n_full"),
                F.sum("n_tokens").alias("total_tokens"),
            )
            .collect()[0]
        )
        manifest["pack"] = {
            "seq_len": args.pack_pretrain,
            "n_merges": args.pack_merges,
            "n_shards": args.pack_shards,
            "n_chunks": row["n_chunks"],
            "n_full_chunks": row["n_full"] or 0,
            "total_tokens": row["total_tokens"] or 0,
            "tail_tokens": (row["total_tokens"] or 0)
            - (row["n_full"] or 0) * args.pack_pretrain,
        }

    with open(f"{args.curate}/manifest.json", "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    print(json.dumps({"curate": manifest}))
    return 0


def _run_sft(args) -> int:
    """One-command SFT dataset building over a transcript table — the
    post-training sibling of --curate: structural QC (transcript_qc) ->
    gate -> rendered examples with loss-mask spans (build_sft_examples
    at --sft-max-chars) -> partitioned parquet + manifest.

    The default gate is the RELAXED flag set (ends_with_assistant,
    no_empty_assistant, idx_contiguous): real transcript corpora carry
    tool/system turns, so strict user/assistant alternation is expected
    to fail on them and --sft-strict opts into the full qc_ok
    conjunction instead. The QC verdicts are persisted alongside the
    examples so the gate is auditable row-for-row. With --sft-tokens,
    budgets/masks switch to TOKEN units under a BPE trained on the
    gated transcripts only (merges persisted at OUT_DIR/bpe_merges —
    the --pack-pretrain no-leakage vocabulary contract). Usage:

        python -m fluent_server_spark --sft OUT_DIR --input TURNS \
            [--sft-max-chars 2048 | --sft-tokens SEQ [--pack-merges N]] \
            [--sft-strict]
    """
    from pyspark.sql import functions as F

    from fluent_server_spark.operators.sft import build_sft_examples
    from fluent_server_spark.operators.transcript_qc import transcript_qc

    spark = get_spark("fss-sft", cpus=args.cpus)
    turns = load_turns(spark, args.source, args.input)
    n_turns_in = turns.count()

    transcript_qc(turns).write.mode("overwrite").parquet(f"{args.sft}/qc")
    qc = spark.read.parquet(f"{args.sft}/qc")
    flags = (
        ["qc_ok"]
        if args.sft_strict
        else ["ends_with_assistant", "no_empty_assistant", "idx_contiguous"]
    )
    pred = F.lit(True)
    for f_ in flags:
        pred = pred & F.col(f_)
    keep = qc.filter(pred).select("conv_id")
    gated = turns.join(keep, ["conv_id"], "left_semi")

    if args.sft_tokens:
        # token-budget variant: BPE trained on the GATED transcripts'
        # text only (the same no-leakage contract as --pack-pretrain's
        # train-split-only vocabulary), merges persisted for
        # reproducible re-tokenization, budgets/mask spans in tokens
        from fluent_server_spark.operators.bpe import bpe_train
        from fluent_server_spark.operators.sft import build_sft_examples_tokens

        merges = bpe_train(
            gated.select(F.col("conv_id").alias("doc_id"), "text"),
            args.pack_merges,
        )
        merges.write.mode("overwrite").parquet(f"{args.sft}/bpe_merges")
        build_sft_examples_tokens(
            gated,
            spark.read.parquet(f"{args.sft}/bpe_merges"),
            args.sft_tokens,
        ).write.mode("overwrite").parquet(f"{args.sft}/examples")
        ex = spark.read.parquet(f"{args.sft}/examples")
        row = ex.agg(
            F.count(F.lit(1)).alias("n_examples"),
            F.sum("example_tokens").alias("total_units"),
            F.sum("mask_tokens").alias("mask_units"),
            F.count_distinct("conv_id").alias("n_convs"),
        ).collect()[0]
        unit = "tokens"
    else:
        build_sft_examples(
            gated, args.sft_max_chars, include_text=True
        ).write.mode("overwrite").parquet(f"{args.sft}/examples")
        ex = spark.read.parquet(f"{args.sft}/examples")
        row = ex.agg(
            F.count(F.lit(1)).alias("n_examples"),
            F.sum("example_chars").alias("total_units"),
            F.sum("mask_chars").alias("mask_units"),
            F.count_distinct("conv_id").alias("n_convs"),
        ).collect()[0]
        unit = "chars"
    manifest = {
        "input": {"n_turns": n_turns_in, "n_convs": qc.count()},
        "gate": {"flags": flags, "n_convs_pass": keep.count(),
                 "n_turns_kept": gated.count()},
        "examples": {
            "n_examples": row["n_examples"],
            "n_convs": row["n_convs"],
            "unit": unit,
            f"total_{unit}": row["total_units"] or 0,
            f"mask_{unit}": row["mask_units"] or 0,
        },
        "params": {
            "max_chars": args.sft_max_chars,
            "tokens": args.sft_tokens,
            "n_merges": args.pack_merges if args.sft_tokens else None,
            "strict": args.sft_strict,
        },
    }
    with open(f"{args.sft}/manifest.json", "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    print(json.dumps({"sft": manifest}))
    return 0


def _curate_stream_drain(
    spark, args, out_dir, source, checkpoint, schema=None, transform=None
) -> dict:
    """Shared tail of --curate-stream and --live-edge --curate-stream:
    freeze the corpus artifacts (persisted minhash index + unigram
    model/band), drain `source` through the curate chain, optionally
    fold the ledger, and return the per-stage manifest (also written to
    `{out_dir}/manifest.json`). `schema`/`transform` adapt a non-docs
    source (the live edge's routed-turn sinks) to the curate input."""
    import os

    from pyspark.sql import functions as F

    from fluent_server_spark.operators.dedup import write_minhash_index
    from fluent_server_spark.streaming.curate_stream import (
        DOCS_DDL,
        freeze_curate_model,
        read_curate_stats,
        read_curated,
        stream_curate,
    )

    corpus = spark.read.parquet(args.curate_corpus)
    idx = args.dedup_index or f"{out_dir}/index"
    if not os.path.exists(os.path.join(idx, "index.json")):
        write_minhash_index(corpus, idx)
    model, lo, hi = freeze_curate_model(corpus)

    q = stream_curate(
        spark,
        source,
        idx,
        model,
        lo,
        hi,
        f"{out_dir}/curated",
        checkpoint,
        schema=schema if schema is not None else DOCS_DDL,
        threshold=args.dedup_threshold,
        transform=transform,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    try:
        stats = read_curate_stats(spark, f"{out_dir}/curated")
        agg = stats.agg(
            F.count(F.lit(1)).alias("epochs"),
            *[
                F.sum(c).alias(c)
                for c in stats.columns
                if c != "epoch"
            ],
        ).collect()[0]
        manifest = {
            "epochs": int(agg["epochs"]),
            "stages": {
                k: int(agg[k]) for k in agg.asDict() if k != "epochs"
            },
            "survivors": read_curated(spark, f"{out_dir}/curated").count(),
        }
    except Exception:
        manifest = {"epochs": 0, "stages": {}, "survivors": 0}
    if args.fold_on_drain:
        # LSM compaction while the stream is stopped (drained above):
        # accepted docs' signatures fold into the persisted index, the
        # md5 ledger truncates (the index fully subsumes it)
        from fluent_server_spark.streaming.curate_stream import (
            fold_ledger_into_index,
        )

        manifest["fold"] = fold_ledger_into_index(
            spark, f"{out_dir}/curated", idx
        )
    manifest["params"] = {
        "index": idx,
        "band": [lo, hi],
        "dedup_threshold": args.dedup_threshold,
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def _run_curate_stream(args) -> int:
    """One-command STREAMING curation — the --curate chain's dedup +
    quality-band stages applied per ingest epoch as parquet files land
    (streaming/curate_stream.py). The reference corpus supplies both
    frozen artifacts up front: the persisted minhash index (reused if
    already on disk, else built once here) and the frozen unigram model
    + NLL band edges — so every epoch is bounded work against artifacts
    at rest, never a corpus re-scan. Drain semantics: process every
    currently-available file, stop, and print the per-stage manifest
    (the streaming analogue of the batch curate manifest). Usage:

        python -m fluent_server_spark --curate-stream OUT_DIR \
            --input 'INCOMING_DIR/*' --curate-corpus CORPUS.parquet \
            [--dedup-index IDX] [--dedup-threshold 0.2] \
            [--checkpoint CKPT]

    Re-running with the same checkpoint is exactly-once: already-
    processed files are skipped, replayed epochs overwrite their own
    directories, and new files extend the output by whole epochs.
    """
    out_dir = args.curate_stream
    spark = get_spark("fss-curate-stream", cpus=args.cpus)
    manifest = _curate_stream_drain(
        spark, args, out_dir, args.input,
        args.checkpoint or f"{out_dir}/ckpt",
    )
    print(json.dumps({"curate_stream": manifest}))
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="fluent_server_spark")
    ap.add_argument("--source", default="parquet", help="parquet|csv|json|iceberg|synthetic")
    ap.add_argument("--input", default=None, help="table/dir location, or N[:convs] for synthetic")
    ap.add_argument("--sinks", default=None)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--groups", type=int, default=1)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--salt", type=int, default=8)
    ap.add_argument("--parse-impl", default="native", choices=["native", "pandas"])
    ap.add_argument("--cpus", type=int, default=None, help="local mode only")
    # edge-daemon mode (no Spark)
    ap.add_argument("--forward-server", metavar="SPOOL_DIR", default=None,
                    help="run the fluent-forward TCP edge daemon writing "
                         "spool segments under SPOOL_DIR (no Spark job)")
    ap.add_argument("--live-edge", metavar="SPOOL_DIR", default=None,
                    help="ONE process: forward daemon + streaming spool tail "
                         "+ parquet sinks (requires --sinks and --checkpoint "
                         "= stream checkpoint dir)")
    ap.add_argument("--snapshots", action="store_true",
                    help="land the SNAPSHOT table (manifest commits; "
                         "read_appended/time-travel/MERGE/incremental "
                         "surface) instead of the plain parquet sink — "
                         "batch ingest and live-edge both honor it")
    ap.add_argument("--dedup-index", default=None, metavar="INDEX_DIR",
                    help="live-edge: near-dup-check every ingested turn "
                         "against this persisted minhash index "
                         "(write_minhash_index) and divert duplicates to "
                         "sink_duplicates (not with --snapshots)")
    ap.add_argument("--dedup-threshold", type=float, default=0.2)
    ap.add_argument("--compact-on-drain", action="store_true",
                    help="live-edge --snapshots: after the drain, rewrite the "
                         "live snapshot into one run (small-files compaction; "
                         "rewrite_data_files analogue) and vacuum superseded "
                         "epoch dirs")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=24224)
    ap.add_argument("--shared-key", default=None)
    ap.add_argument("--heartbeat", action="store_true")
    ap.add_argument("--rotate-seconds", type=float, default=60.0)
    ap.add_argument("--max-seconds", type=float, default=0.0,
                    help="edge daemon: exit after this many seconds (0 = forever)")
    ap.add_argument("--curate", metavar="OUT_DIR", default=None,
                    help="one-command corpus curation over --input's documents "
                         "table: exact dedup -> near-dup clusters -> optional "
                         "decontamination -> quality band -> optional DSIR "
                         "selection -> split -> partitioned parquet + manifest")
    ap.add_argument("--curate-eval", default=None, metavar="PARQUET",
                    help="eval-set parquet for the decontamination stage "
                         "(omitted = stage skipped)")
    ap.add_argument("--curate-select", type=int, default=None,
                    help="DSIR: keep this many docs most like the target slice")
    ap.add_argument("--curate-target-lang", default="en",
                    help="DSIR target slice: docs with this lang value")
    ap.add_argument("--pack-pretrain", type=int, default=None,
                    metavar="SEQ_LEN",
                    help="curate: after the split, BPE-train on the train "
                         "split, persist merges, and concat-and-chunk it "
                         "into fixed SEQ_LEN token rows (OUT_DIR/chunks)")
    ap.add_argument("--pack-merges", type=int, default=64,
                    help="pack-pretrain: number of BPE merges to learn")
    ap.add_argument("--pack-shards", type=int, default=64,
                    help="pack-pretrain: independent token streams (bounds "
                         "tail loss at shards*(seq_len-1) tokens)")
    ap.add_argument("--curate-stream", metavar="OUT_DIR", default=None,
                    help="STREAMING curation: watch --input (parquet file "
                         "glob) and run dedup-vs-index + cross-epoch ledger "
                         "+ frozen quality band per epoch; drains available "
                         "files then exits (exactly-once on re-run)")
    ap.add_argument("--curate-corpus", default=None, metavar="PARQUET",
                    help="curate-stream: reference corpus for the frozen "
                         "model/band (and the minhash index when "
                         "--dedup-index is absent)")
    ap.add_argument("--sft", metavar="OUT_DIR", default=None,
                    help="build an SFT example dataset from a transcript "
                         "table: QC gate + rendered examples with loss-mask "
                         "spans + manifest (needs --input)")
    ap.add_argument("--sft-max-chars", type=int, default=2048,
                    help="example budget for --sft (greedy turn-boundary "
                         "packing)")
    ap.add_argument("--sft-tokens", type=int, default=None,
                    help="--sft in TOKEN units: train BPE on the gated "
                         "transcripts (--pack-merges merges, persisted), "
                         "budget/mask examples at this many tokens")
    ap.add_argument("--sft-strict", action="store_true",
                    help="--sft gates on the full qc_ok conjunction "
                         "(incl. strict role alternation and "
                         "starts-with-user) instead of the relaxed set")
    ap.add_argument("--profile", action="store_true",
                    help="print data-card metrics for --input (counts, "
                         "sizes, exact dup rate, role/tool concentration) "
                         "as one JSON line and exit")
    ap.add_argument("--sync-export", metavar="DEST_DIR", default=None,
                    help="CDC consumer loop: export rows appended to the "
                         "snapshot sink table (--sinks/--checkpoint) since "
                         "the last sync into DEST_DIR/sync=<run>, then "
                         "advance the bookmark (exactly-once under crash "
                         "replay; no new commits -> no-op)")
    ap.add_argument("--sync-state", default=None, metavar="JSON",
                    help="bookmark file for --sync-export (default: "
                         "DEST_DIR/_sync_state.json — underscore-prefixed "
                         "so spark.read.parquet(DEST_DIR) ignores it)")
    ap.add_argument("--force-baseline", action="store_true",
                    help="--sync-export: accept wiping existing sync dirs "
                         "when the bookmark file is missing (otherwise that "
                         "state raises — it usually means --sync-state "
                         "points at the wrong file)")
    ap.add_argument("--fold-on-drain", action="store_true",
                    help="curate-stream: after draining, fold accepted "
                         "docs' signatures into the persisted index and "
                         "truncate the exact-dedup ledger (LSM compaction)")
    args = ap.parse_args(argv)

    if args.curate_stream and not args.live_edge:
        if not args.input or not args.curate_corpus:
            ap.error("--curate-stream requires --input and --curate-corpus")
        return _run_curate_stream(args)
    if args.curate_stream and args.live_edge:
        # one-command wire -> routed sinks -> curated parquet
        if not args.curate_corpus:
            ap.error("--live-edge --curate-stream requires --curate-corpus")
        if args.snapshots or args.dedup_index:
            ap.error(
                "--live-edge --curate-stream needs the plain parquet sink "
                "(not --snapshots / --dedup-index: curation already "
                "subsumes the ingest-time duplicate diversion)"
            )
    if args.curate:
        if not args.input:
            ap.error("--curate requires --input")
        return _run_curate(args)
    if args.sft:
        if not args.input:
            ap.error("--sft requires --input")
        return _run_sft(args)
    if args.profile:
        if not args.input:
            ap.error("--profile requires --input")
        from fluent_server_spark.operators.profile import corpus_profile

        spark = get_spark("fluent_server_spark", cpus=args.cpus)
        turns = load_turns(spark, args.source, args.input)
        prof = {
            r["metric"]: r["value"]
            for r in corpus_profile(
                turns, text_col="text", lang_col="role", source_col="tool"
            ).collect()
        }
        # turns-table naming: the concentration keys are role / tool
        prof["top_role_share"] = prof.pop("top_lang_share")
        prof["n_roles"] = prof.pop("n_langs")
        prof["top_tool_share"] = prof.pop("top_source_share")
        prof["n_tools"] = prof.pop("n_sources")
        print(json.dumps({"profile": prof}, sort_keys=True))
        return 0
    if args.sync_export:
        missing = [f for f in ("sinks", "checkpoint") if not getattr(args, f)]
        if missing:
            ap.error(
                "--sync-export also requires: "
                + ", ".join("--" + m for m in missing)
            )
        spark = get_spark("fluent_server_spark", cpus=args.cpus)
        cfg = PipelineConfig(
            sinks_path=args.sinks,
            checkpoint_path=args.checkpoint,
            snapshots=True,
        )
        pipe = TranscriptPipeline(spark, cfg)
        state = args.sync_state or f"{args.sync_export}/_sync_state.json"
        print(json.dumps(pipe.export_incremental(
            args.sync_export, state, force_baseline=args.force_baseline)))
        return 0
    if args.forward_server:
        return _run_forward_server(args)
    if args.live_edge:
        missing = [f for f in ("sinks", "checkpoint") if not getattr(args, f)]
        if missing:
            ap.error(
                "--live-edge also requires: "
                + ", ".join("--" + m for m in missing)
            )
        return _run_live_edge(args)
    missing = [f for f in ("input", "sinks", "checkpoint") if not getattr(args, f)]
    if missing:
        ap.error(f"the following arguments are required: {', '.join('--' + m for m in missing)}")

    spark = get_spark("fluent_server_spark", cpus=args.cpus)
    turns = load_turns(spark, args.source, args.input)
    cfg = PipelineConfig(
        sinks_path=args.sinks,
        checkpoint_path=args.checkpoint,
        parse_impl=args.parse_impl,
        n_buckets=args.buckets,
        n_salt=args.salt,
        checkpoint_groups=args.groups,
        snapshots=args.snapshots,
    )
    pipe = TranscriptPipeline(spark, cfg)
    run_id = pipe.run(turns, run_id=args.run_id)
    counts = {
        r["sink"]: r["n_turns"]
        for r in pipe.aggregates()["routed_counts"].collect()
    }
    print(json.dumps({"run_id": run_id, "routed_counts": counts}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
