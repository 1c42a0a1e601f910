"""Streaming curation: the batch curate chain's dedup + quality-band
stages on the live edge — per-epoch exactly-once outputs, a cross-epoch
exact-dedup ledger, and a frozen quality band that never drifts."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from fluent_server_spark.operators.dedup import write_minhash_index
from fluent_server_spark.streaming.curate_stream import (
    curate_batch,
    freeze_curate_model,
    read_curate_stats,
    read_curated,
    stream_curate,
)

WORDS = [f"w{i}" for i in range(40)]


def _corpus_texts():
    """20 docs over a sliding 25-word window of a shared pool, plus
    10x 'the' each (a dominant common word) and (i mod 4) singleton
    rare words — so NLL spreads and the band edges are interior-safe."""
    rng = random.Random(5)
    out = []
    for i in range(20):
        words = (
            [WORDS[(i + j) % 40] for j in range(25)]
            + ["the"] * 10
            + [f"rare{i}_{j}" for j in range(i % 4)]
        )
        rng.shuffle(words)
        out.append(" ".join(words))
    return out


def _shuffled_multiset(text: str, seed: int) -> str:
    words = text.split(" ")
    random.Random(seed).shuffle(words)
    return " ".join(words)


@pytest.fixture(scope="module")
def curated(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("curate_stream")
    texts = _corpus_texts()
    corpus = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    idx = str(base / "idx")
    write_minhash_index(corpus, idx)
    # frozen band = [min, max] corpus NLL: multiset clones of interior
    # corpus docs are in-band; pure-common and pure-unseen docs are out
    model, lo, hi = freeze_curate_model(
        corpus, lo_quantile=0.0, hi_quantile=1.0
    )

    src = base / "incoming"
    src.mkdir()
    accept_a = _shuffled_multiset(texts[5], seed=101)   # doc 5: 1 rare word
    accept_b = _shuffled_multiset(texts[9], seed=201)   # doc 9: 1 rare word
    batch1 = [
        (100, texts[3].replace("w3", "sleepy")),        # near-dup of corpus
        (101, accept_a),                                # survives
        (102, accept_a),                                # exact dup IN batch
        (103, " ".join(f"zzz{j}" for j in range(30))),  # gibberish: NLL > max
        (104, " ".join(["the"] * 20)),                  # degenerate: NLL < min
    ]
    batch2 = [
        (200, accept_a),                                # exact dup of epoch-0 survivor
        (201, accept_b),                                # survives
        (202, texts[6].replace("w6", "sleepy")),        # near-dup of corpus
    ]
    for name, rows in (("b1", batch1), ("b2", batch2)):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.parquet(str(src / name))

    out, ckpt = str(base / "out"), str(base / "ckpt")
    q = stream_curate(
        spark, f"{src}/*", idx, model, lo, hi, out, ckpt,
        max_files_per_trigger=1,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return {
        "base": base, "idx": idx, "model": model, "lo": lo, "hi": hi,
        "src": src, "out": out, "ckpt": ckpt,
        "batch1": batch1, "batch2": batch2,
    }


def test_survivors_and_stage_counts(spark, curated):
    got = {
        r["doc_id"]: r["text"]
        for r in read_curated(spark, curated["out"]).collect()
    }
    want = dict(curated["batch1"] + curated["batch2"])
    assert set(got) == {101, 201}
    assert got[101] == want[101] and got[201] == want[201]

    stats = {
        r["epoch"]: r.asDict()
        for r in read_curate_stats(spark, curated["out"]).collect()
    }
    assert stats[0]["input"] == 5
    assert stats[0]["exact_dedup"] == 4          # 102 deduped in batch
    assert stats[0]["neardup_vs_corpus"] == 3    # 100 flagged vs index
    assert stats[0]["quality_band"] == 1         # 103 high, 104 low
    assert stats[1]["input"] == 3
    assert stats[1]["exact_dedup"] == 2          # 200 caught by the ledger
    assert stats[1]["neardup_vs_corpus"] == 1    # 202 flagged vs index
    assert stats[1]["quality_band"] == 1


def test_stream_equals_batch_composition(spark, curated):
    """Replaying the same files through curate_batch (the shared code
    path) with the ledger threaded between epochs reproduces the stream
    output exactly — stream == batch, same contract as dedup_stream."""
    from fluent_server_spark.functions.text import md5_fingerprint

    b1 = spark.createDataFrame(curated["batch1"], "doc_id long, text string")
    b2 = spark.createDataFrame(curated["batch2"], "doc_id long, text string")
    s1, _ = curate_batch(
        b1, curated["idx"], curated["model"], curated["lo"], curated["hi"]
    )
    ledger = s1.select(md5_fingerprint(F.col("text")).alias("fp"))
    s2, _ = curate_batch(
        b2, curated["idx"], curated["model"], curated["lo"], curated["hi"],
        prior_hashes=ledger,
    )
    want = sorted(
        (r["doc_id"], r["text"])
        for r in s1.unionByName(s2).collect()
    )
    got = sorted(
        (r["doc_id"], r["text"])
        for r in read_curated(spark, curated["out"]).collect()
    )
    assert got == want


def test_restart_is_idempotent(spark, curated):
    """Restarting over the same checkpoint with no new files must not
    change any output (epoch dirs are self-overwriting; the ledger read
    is bounded to strictly-earlier epochs)."""
    before = sorted(
        r["doc_id"] for r in read_curated(spark, curated["out"]).collect()
    )
    q = stream_curate(
        spark,
        f"{curated['src']}/*",
        curated["idx"],
        curated["model"],
        curated["lo"],
        curated["hi"],
        curated["out"],
        curated["ckpt"],
        max_files_per_trigger=1,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    after = sorted(
        r["doc_id"] for r in read_curated(spark, curated["out"]).collect()
    )
    assert after == before == [101, 201]
    assert read_curate_stats(spark, curated["out"]).count() == 2
