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
    fold_ledger_into_index,
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


def test_fold_ledger_into_index(spark, tmp_path):
    """LSM compaction: folding accepted docs into the persisted index
    preserves every dedup decision — exact dups of folded docs move from
    the ledger stage to the index stage (every non-NULL text yields >= 1
    shingle, even below n words, because with_shingles pads short docs
    with the whole-text gram — so identical text => jaccard 1.0 => the
    index catches it), the ledger truncates to an empty dir, and
    re-folding with nothing new is a no-op."""
    import json

    # corpus: one degenerate all-'the' doc (band floor) + varied docs
    # with rare singletons (band ceiling) -> [min,max] band is wide
    texts = [" ".join(["the"] * 30)] + [
        " ".join([f"w{(i + j) % 25}" for j in range(20)] + ["the"] * 5
                 + [f"rare{i}"])
        for i in range(6)
    ]
    corpus = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    idx = str(tmp_path / "idx")
    write_minhash_index(corpus, idx)
    model, lo, hi = freeze_curate_model(corpus, 0.0, 1.0)

    long_doc = _shuffled_multiset(texts[3], seed=7)  # in-band, full 3-grams
    short_doc = "the the"    # in-band; < n words -> ONE padded whole-text gram
    src = tmp_path / "in"
    src.mkdir()
    spark.createDataFrame(
        [(10, long_doc), (11, short_doc)], "doc_id long, text string"
    ).coalesce(1).write.parquet(str(src / "b1"))

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def drain():
        q = stream_curate(
            spark, f"{src}/*", idx, model, lo, hi, out, ckpt,
            max_files_per_trigger=1,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    drain()
    assert sorted(
        r["doc_id"] for r in read_curated(spark, out).collect()
    ) == [10, 11]

    fold = fold_ledger_into_index(spark, out, idx)
    assert fold == {"folded_docs": 2, "folded_below": 1}
    # ledger truncated to ONE empty dir (keeps the epoch=* glob alive)
    ledger = spark.read.option("basePath", f"{out}/hashes").parquet(
        f"{out}/hashes/epoch=*"
    )
    assert ledger.count() == 0
    marker = json.loads((tmp_path / "out" / "hashes" / "_folded.json").read_text())
    assert marker == {"folded_below": 1}

    # epoch 1: exact dups of BOTH folded docs (long and short) are now
    # caught by the index at the neardup stage — identical text means
    # identical shingle set, jaccard 1.0; a fresh permutation survives
    spark.createDataFrame(
        [(20, long_doc), (21, short_doc),
         (22, _shuffled_multiset(texts[5], seed=9))],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(str(src / "b2"))
    drain()
    assert sorted(
        r["doc_id"] for r in read_curated(spark, out).collect()
    ) == [10, 11, 22]
    stats = {
        r["epoch"]: r.asDict()
        for r in read_curate_stats(spark, out).collect()
    }
    assert stats[1]["input"] == 3
    assert stats[1]["exact_dedup"] == 3        # empty ledger: nothing caught
    assert stats[1]["neardup_vs_corpus"] == 1  # 20 AND 21 via folded index
    assert stats[1]["quality_band"] == 1

    # second fold picks up only epoch 1; third fold is a no-op
    fold2 = fold_ledger_into_index(spark, out, idx)
    assert fold2 == {"folded_docs": 1, "folded_below": 2}
    fold3 = fold_ledger_into_index(spark, out, idx)
    assert fold3["folded_docs"] == 0 and fold3["folded_below"] == 2
