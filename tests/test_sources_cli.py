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


def test_orc_roundtrip(spark, turns_pdf, tmp_path):
    p = str(tmp_path / "turns.orc")
    spark.createDataFrame(turns_pdf).write.orc(p)
    df = load_turns(spark, "orc", p)
    assert df.count() == len(turns_pdf)
    assert [f.name for f in df.schema.fields] == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts",
    ]


def test_avro_roundtrip_or_actionable_error(spark, turns_pdf, tmp_path):
    # spark-avro is an external module: with the jar this must round-trip,
    # without it the error must say exactly what to add to the classpath
    p = str(tmp_path / "turns.avro")
    try:
        spark.createDataFrame(turns_pdf).write.format("avro").save(p)
    except Exception:
        with pytest.raises(RuntimeError, match="spark-avro"):
            load_turns(spark, "avro", p)
        return
    assert load_turns(spark, "avro", p).count() == len(turns_pdf)


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


def test_cli_curate_end_to_end(spark, tmp_path, capsys):
    """--curate chains dedup -> near-dup clusters -> decontamination ->
    quality band -> DSIR selection -> split, writes partitioned parquet
    + a manifest with monotone non-increasing stage counts, and is
    deterministic (two runs keep the identical doc set)."""
    eval_pq = str(tmp_path / "eval.parquet")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(
        5
    ).write.mode("overwrite").parquet(eval_pq)
    out_dir = str(tmp_path / "curated")
    rc = cli_main(
        [
            "--curate", out_dir,
            "--input", "/root/testdata/sf0.001",
            "--curate-eval", eval_pq,
            "--curate-select", "40",
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    man = json.loads((tmp_path / "curated" / "manifest.json").read_text())
    assert out["curate"] == man
    st = man["stages"]
    order = [
        "input", "exact_dedup", "neardup_cluster_dedup",
        "decontaminated", "quality_band", "dsir_selected",
    ]
    vals = [st[k] for k in order]
    assert vals == sorted(vals, reverse=True), f"stage counts grew: {st}"
    assert st["input"] > st["decontaminated"]  # planted eval overlap dropped
    assert st["dsir_selected"] == 40
    assert sum(man["splits"].values()) == st["dsir_selected"]
    docs = spark.read.parquet(f"{out_dir}/documents")
    assert docs.count() == 40
    assert set(
        r["split"] for r in docs.select("split").distinct().collect()
    ) <= {"train", "val", "test"}

    out2 = str(tmp_path / "curated2")
    assert cli_main(
        [
            "--curate", out2,
            "--input", "/root/testdata/sf0.001",
            "--curate-eval", eval_pq,
            "--curate-select", "40",
        ]
    ) == 0
    ids1 = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    ids2 = sorted(
        r["doc_id"]
        for r in spark.read.parquet(f"{out2}/documents").select("doc_id").collect()
    )
    assert ids1 == ids2


def test_cli_curate_pack_pretrain(spark, tmp_path, capsys):
    """--pack-pretrain appends the pretraining packing stage: merges
    persisted, OUT_DIR/chunks written, and the manifest's token
    accounting closes — total packed tokens equal an independent
    re-tokenization of the train split under the persisted merges plus
    one separator per document; tail loss is bounded by the docstring
    formula."""
    from pyspark.sql import functions as F

    from fluent_server_spark.operators.bpe import bpe_tokenize, merge_ranks

    out_dir = str(tmp_path / "curated")
    SEQ, SHARDS = 64, 4
    rc = cli_main(
        [
            "--curate", out_dir,
            "--input", "/root/testdata/sf0.001",
            "--pack-pretrain", str(SEQ),
            "--pack-merges", "8",
            "--pack-shards", str(SHARDS),
        ]
    )
    assert rc == 0
    man = json.loads((tmp_path / "curated" / "manifest.json").read_text())
    pack = man["pack"]
    assert pack["seq_len"] == SEQ and pack["n_shards"] == SHARDS

    chunks = spark.read.parquet(f"{out_dir}/chunks")
    assert {"shard", "chunk_idx", "tokens", "n_tokens", "n_docs", "digest"} <= set(
        chunks.columns
    )
    got = chunks.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("n_tokens") == SEQ).cast("long")).alias("full"),
        F.sum("n_tokens").alias("tot"),
    ).collect()[0]
    assert got["n"] == pack["n_chunks"]
    assert got["full"] == pack["n_full_chunks"]
    assert got["tot"] == pack["total_tokens"]
    assert pack["tail_tokens"] == got["tot"] - got["full"] * SEQ
    assert 0 <= pack["tail_tokens"] <= SHARDS * (SEQ - 1)

    # conservation against an independent re-tokenization under the
    # PERSISTED merges (the reproducibility contract of bpe_merges/)
    merges = spark.read.parquet(f"{out_dir}/bpe_merges")
    assert len(merge_ranks(merges)) <= 8
    train = spark.read.parquet(f"{out_dir}/documents").filter(
        F.col("split") == "train"
    )
    retok = bpe_tokenize(train, merges).agg(
        F.sum("n_tokens").alias("t"), F.count(F.lit(1)).alias("d")
    ).collect()[0]
    assert pack["total_tokens"] == retok["t"] + retok["d"]


def test_cli_curate_stream_end_to_end(spark, tmp_path, capsys):
    """--curate-stream drains available files through the streaming
    curate chain (index built from the corpus, frozen band), prints the
    summed per-stage manifest, is exactly-once on re-run, and extends
    by one epoch when a new file lands."""
    # every corpus doc is a distinct permutation of ONE word multiset:
    # identical unigram NLL (the 0.1/0.9 band is a single point every
    # clone hits) but disjoint 3-gram shingles (no near-dup flags)
    import random

    base = [f"w{j}" for j in range(20)] + ["the"] * 3

    def perm(seed):
        ws = list(base)
        random.Random(seed).shuffle(ws)
        return " ".join(ws)

    corpus_rows = [(i, perm(i)) for i in range(15)]
    corpus_pq = str(tmp_path / "corpus.parquet")
    spark.createDataFrame(
        corpus_rows, "doc_id long, text string"
    ).write.parquet(corpus_pq)

    src = tmp_path / "incoming"
    src.mkdir()
    fresh = perm(500)
    spark.createDataFrame(
        [(500, fresh),
         (501, " ".join(f"zzz{j}" for j in range(20)))],  # gibberish: banded out
        "doc_id long, text string",
    ).coalesce(1).write.parquet(str(src / "b1"))

    out_dir = str(tmp_path / "cs")
    argv = [
        "--curate-stream", out_dir,
        "--input", f"{src}/*",
        "--curate-corpus", corpus_pq,
    ]
    assert cli_main(argv) == 0
    man = json.loads(capsys.readouterr().out.strip().splitlines()[-1])[
        "curate_stream"
    ]
    assert man["epochs"] == 1
    assert man["stages"]["input"] == 2
    assert man["survivors"] == 1  # 501 banded out, 500 kept
    disk = json.loads((tmp_path / "cs" / "manifest.json").read_text())
    assert disk == man

    # re-run with nothing new: exactly-once, unchanged
    assert cli_main(argv) == 0
    man2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])[
        "curate_stream"
    ]
    assert man2["epochs"] == 1 and man2["survivors"] == 1

    # a new file with an exact dup of the accepted doc: ledger drops it
    spark.createDataFrame(
        [(600, fresh)], "doc_id long, text string"
    ).coalesce(1).write.parquet(str(src / "b2"))
    assert cli_main(argv) == 0
    man3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])[
        "curate_stream"
    ]
    assert man3["epochs"] == 2
    assert man3["stages"]["input"] == 3
    assert man3["survivors"] == 1  # 600 caught by the cross-epoch ledger

    # --fold-on-drain: LSM-compact the ledger into the index, then land
    # one more dup — now dropped by the INDEX (neardup stage), not the
    # (truncated) ledger, and the survivor set is unchanged
    assert cli_main(argv + ["--fold-on-drain"]) == 0
    man4 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])[
        "curate_stream"
    ]
    assert man4["fold"] == {"folded_docs": 1, "folded_below": 2}
    spark.createDataFrame(
        [(700, fresh)], "doc_id long, text string"
    ).coalesce(1).write.parquet(str(src / "b3"))
    assert cli_main(argv) == 0
    man5 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])[
        "curate_stream"
    ]
    assert man5["epochs"] == 3
    # summed stages: 501 lost at quality (e0), 600 at the ledger (e1),
    # 700 at the folded index's neardup stage (e2)
    assert man5["stages"]["exact_dedup"] == man5["stages"]["input"] - 1
    assert man5["stages"]["neardup_vs_corpus"] == man5["stages"]["exact_dedup"] - 1
    assert man5["survivors"] == 1


def test_cli_sft_end_to_end(spark, tmp_path, capsys):
    """--sft gates transcripts through the structural QC and writes
    rendered examples + an auditable manifest whose counts equal the
    in-process library composition (same gate, same builder)."""
    from pyspark.sql import functions as F

    from fluent_server_spark.data.synth import synth_turns_pandas
    from fluent_server_spark.operators.sft import build_sft_examples
    from fluent_server_spark.operators.transcript_qc import gate_transcripts

    turns_pq = str(tmp_path / "turns.parquet")
    spark.createDataFrame(synth_turns_pandas(3000, n_convs=120)).write.mode(
        "overwrite"
    ).parquet(turns_pq)
    out_dir = str(tmp_path / "sft")
    rc = cli_main(["--sft", out_dir, "--input", turns_pq,
                   "--sft-max-chars", "512"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    man = json.loads((tmp_path / "sft" / "manifest.json").read_text())
    assert out["sft"] == man
    assert man["input"]["n_turns"] == 3000
    assert man["input"]["n_convs"] == 120
    assert 0 < man["gate"]["n_convs_pass"] <= 120
    assert man["examples"]["n_examples"] > 0
    assert 0 < man["examples"]["mask_chars"] < man["examples"]["total_chars"]

    # library parity: the CLI's gate + build equals the same composition
    # done in-process (relaxed flag set, same budget)
    turns = spark.read.parquet(turns_pq)
    gated = gate_transcripts(
        turns,
        flags=["ends_with_assistant", "no_empty_assistant", "idx_contiguous"],
    )
    want = build_sft_examples(gated, 512, include_text=True)
    got = spark.read.parquet(f"{out_dir}/examples")
    assert got.count() == man["examples"]["n_examples"] == want.count()
    w = {r["example_md5"] for r in want.select("example_md5").collect()}
    g = {r["example_md5"] for r in got.select("example_md5").collect()}
    assert w == g
    # QC verdicts persisted, one per conversation
    qc = spark.read.parquet(f"{out_dir}/qc")
    assert qc.count() == 120
    assert qc.filter(F.col("qc_ok").isNull()).count() == 0


def test_cli_sft_tokens_mode(spark, tmp_path, capsys):
    """--sft-tokens switches the budget/mask units to tokens under a
    BPE trained on the gated transcripts, merges persisted; counts
    equal the in-process composition under the SAME persisted merges."""
    from fluent_server_spark.data.synth import synth_turns_pandas
    from fluent_server_spark.operators.sft import build_sft_examples_tokens
    from fluent_server_spark.operators.transcript_qc import gate_transcripts

    turns_pq = str(tmp_path / "turns.parquet")
    spark.createDataFrame(synth_turns_pandas(1500, n_convs=60)).write.mode(
        "overwrite"
    ).parquet(turns_pq)
    out_dir = str(tmp_path / "sft_tok")
    rc = cli_main(["--sft", out_dir, "--input", turns_pq,
                   "--sft-tokens", "128", "--pack-merges", "16"])
    assert rc == 0
    man = json.loads((tmp_path / "sft_tok" / "manifest.json").read_text())
    assert man["examples"]["unit"] == "tokens"
    assert 0 < man["examples"]["mask_tokens"] < man["examples"]["total_tokens"]
    assert man["params"]["tokens"] == 128 and man["params"]["n_merges"] == 16

    gated = gate_transcripts(
        spark.read.parquet(turns_pq),
        flags=["ends_with_assistant", "no_empty_assistant", "idx_contiguous"],
    )
    want = build_sft_examples_tokens(
        gated, spark.read.parquet(f"{out_dir}/bpe_merges"), 128
    )
    got = spark.read.parquet(f"{out_dir}/examples")
    assert got.count() == man["examples"]["n_examples"] == want.count()
    w = {r["example_md5"] for r in want.select("example_md5").collect()}
    g = {r["example_md5"] for r in got.select("example_md5").collect()}
    assert w == g


def test_cli_sft_fully_rejected_corpus(spark, tmp_path, capsys):
    """A corpus where NO conversation passes the gate yields rc 0 and a
    zeroed manifest in both char and token modes (the token mode trains
    BPE on an empty gated set) — never a crash."""
    import datetime

    ts = datetime.datetime(2024, 1, 1)
    rows = [(f"c{i}", 0, "user", "hello", "", ts) for i in range(6)]
    turns_pq = str(tmp_path / "turns.parquet")
    spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    ).write.mode("overwrite").parquet(turns_pq)

    for extra, unit in ([], "chars"), (["--sft-tokens", "64"], "tokens"):
        out_dir = str(tmp_path / f"sft_{unit}")
        rc = cli_main(["--sft", out_dir, "--input", turns_pq] + extra)
        assert rc == 0
        man = json.loads((tmp_path / f"sft_{unit}" / "manifest.json").read_text())
        assert man["gate"]["n_convs_pass"] == 0
        assert man["examples"]["n_examples"] == 0
        assert man["examples"][f"total_{unit}"] == 0
    capsys.readouterr()


def test_cli_sync_export_loop(spark, tmp_path, capsys):
    """--snapshots batch ingest + --sync-export: baseline sync, delta
    sync after a second run, then a no-op — the whole CDC consumer loop
    from the command line."""
    sinks, ckpt = str(tmp_path / "sinks"), str(tmp_path / "ckpt.jsonl")
    dest = str(tmp_path / "export")

    def ingest(run_id, n):
        rc = cli_main([
            "--source", "synthetic", "--input", f"{n}:20",
            "--sinks", sinks, "--checkpoint", ckpt,
            "--snapshots", "--run-id", run_id,
        ])
        assert rc == 0
        capsys.readouterr()

    def sync():
        rc = cli_main([
            "--sync-export", dest, "--sinks", sinks, "--checkpoint", ckpt,
        ])
        assert rc == 0
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    ingest("s1", 1000)
    out1 = sync()
    assert out1 == {"synced_to": "s1", "n_rows": 1000, "baseline": True}
    ingest("s2", 500)
    out2 = sync()
    assert out2 == {"synced_to": "s2", "n_rows": 500, "baseline": False}
    assert sync()["n_rows"] == -1  # nothing new
    # the default bookmark is underscore-prefixed, so the export root
    # reads as ONE parquet table (the natural consumer call)
    assert spark.read.parquet(dest).count() == 1500


def test_cli_profile(spark, tmp_path, capsys):
    rc = cli_main(["--profile", "--source", "synthetic", "--input", "1000:20"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    p = out["profile"]
    assert p["n_docs"] == 1000.0
    assert 0.0 <= p["dup_rate"] <= 1.0
    assert p["n_roles"] >= 2 and 0 < p["top_role_share"] <= 1.0
    assert p["n_tools"] >= 1 and 0 < p["top_tool_share"] <= 1.0
