"""Corpus drift vs a pure-Python JSD reference, boundary laws
(identical → 0, disjoint → ln 2), and the source-share breakdown."""

from __future__ import annotations

import math

import pytest

from fluent_server_spark.operators.drift import (
    corpus_drift,
    distribution_drift,
    drift_summary,
    source_drift,
)


def _counts(spark, pairs):
    return spark.createDataFrame(pairs, "bucket int, cnt long")


def _ref_jsd(old: dict, new: dict) -> float:
    ot, nt = sum(old.values()), sum(new.values())
    jsd = 0.0
    for b in set(old) | set(new):
        p, q = old.get(b, 0) / ot, new.get(b, 0) / nt
        m = (p + q) / 2
        if p > 0:
            jsd += p * math.log(p / m) / 2
        if q > 0:
            jsd += q * math.log(q / m) / 2
    return jsd


def test_distribution_drift_matches_python(spark):
    old = {1: 10, 2: 30, 3: 60}
    new = {2: 25, 3: 50, 4: 25}
    d = distribution_drift(
        _counts(spark, list(old.items())), _counts(spark, list(new.items()))
    ).collect()
    got = sum(r["js_contrib"] for r in d)
    assert got == pytest.approx(_ref_jsd(old, new), abs=1e-9)
    rows = {r["bucket"]: r for r in d}
    # missing-side buckets present with a zero count, positive contrib
    assert rows[1]["new_cnt"] == 0 and rows[1]["js_contrib"] > 0
    assert rows[4]["old_cnt"] == 0 and rows[4]["js_contrib"] > 0


def test_identical_and_disjoint_bounds(spark):
    same = _counts(spark, [(1, 5), (2, 7)])
    s = drift_summary(same, _counts(spark, [(1, 5), (2, 7)])).collect()[0]
    assert s["jsd"] == pytest.approx(0.0, abs=1e-12)
    assert s["l1"] == pytest.approx(0.0, abs=1e-12)
    assert s["buckets_gained"] == 0 and s["buckets_lost"] == 0
    # scale invariance: 10x the counts is the same distribution
    s2 = drift_summary(same, _counts(spark, [(1, 50), (2, 70)])).collect()[0]
    assert s2["jsd"] == pytest.approx(0.0, abs=1e-12)
    d = drift_summary(
        _counts(spark, [(1, 3)]), _counts(spark, [(2, 9)])
    ).collect()[0]
    assert d["jsd"] == pytest.approx(math.log(2), abs=1e-9)
    assert d["l1"] == pytest.approx(2.0, abs=1e-12)
    assert d["buckets_gained"] == 1 and d["buckets_lost"] == 1


def test_corpus_drift_detects_vocabulary_shift(spark):
    base = [(i, "alpha beta gamma delta") for i in range(50)]
    same = spark.createDataFrame(base, "doc_id long, text string")
    shifted = spark.createDataFrame(
        [(i, "epsilon zeta eta theta") for i in range(50)],
        "doc_id long, text string",
    )
    none = sum(
        r["js_contrib"] for r in corpus_drift(same, same).collect()
    )
    lots = sum(
        r["js_contrib"] for r in corpus_drift(same, shifted).collect()
    )
    assert none == pytest.approx(0.0, abs=1e-12)
    assert lots == pytest.approx(math.log(2), abs=1e-9)  # disjoint vocab
    # a partial shift sits strictly between
    mixed = spark.createDataFrame(
        base[:25] + [(i, "epsilon zeta eta theta") for i in range(25, 50)],
        "doc_id long, text string",
    )
    mid = sum(r["js_contrib"] for r in corpus_drift(same, mixed).collect())
    assert 0.0 < mid < lots


def test_source_drift_shares(spark):
    old = spark.createDataFrame(
        [(i, "a" if i < 80 else "b") for i in range(100)],
        "doc_id long, source string",
    )
    new = spark.createDataFrame(
        [(i, "a" if i < 40 else ("b" if i < 90 else "c")) for i in range(100)],
        "doc_id long, source string",
    )
    rows = {r["stratum"]: r for r in source_drift(old, new).collect()}
    assert rows["a"]["share_delta"] == pytest.approx(-0.4)
    assert rows["b"]["share_delta"] == pytest.approx(0.3)
    assert rows["c"]["old_n"] == 0 and rows["c"]["new_share"] == pytest.approx(0.1)


def test_adjacent_epoch_drift_matches_pairwise_summary(spark):
    """One-plan adjacent-epoch drift equals drift_summary run pairwise,
    and the first epoch (no predecessor) emits no row."""
    hist = [
        # epoch 0
        (0, 1, 10), (0, 2, 30), (0, 3, 60),
        # epoch 1: shifted
        (1, 2, 25), (1, 3, 50), (1, 4, 25),
        # epoch 2: identical to epoch 1 but scaled
        (2, 2, 50), (2, 3, 100), (2, 4, 50),
    ]
    counts = spark.createDataFrame(hist, "epoch int, bucket int, cnt long")
    from fluent_server_spark.operators.drift import adjacent_epoch_drift

    got = {r["epoch"]: r for r in adjacent_epoch_drift(counts).collect()}
    assert set(got) == {1, 2}
    for e in (1, 2):
        old = _counts(spark, [(b, c) for ep, b, c in hist if ep == e - 1])
        new = _counts(spark, [(b, c) for ep, b, c in hist if ep == e])
        want = drift_summary(old, new).collect()[0]
        for f in ("jsd", "l1"):
            assert got[e][f] == pytest.approx(want[f], abs=1e-9), (e, f)
        for f in ("buckets_gained", "buckets_lost"):
            assert got[e][f] == want[f], (e, f)
    assert got[2]["jsd"] == pytest.approx(0.0, abs=1e-12)  # scale-invariant


def test_streaming_epoch_drift(spark, tmp_path):
    """The sketch stream's gram history feeds the drift monitor: three
    single-file epochs -> two drift rows, each equal to the batch
    drift_summary over the same file pair."""
    from pyspark.sql import functions as F

    from fluent_server_spark.operators.dsir import gram_bucket_counts
    from fluent_server_spark.streaming.sketch_stream import (
        read_epoch_drift,
        stream_sketches,
    )

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    texts = [
        "alpha beta gamma delta " * 5,
        "alpha beta epsilon zeta " * 5,
        "eta theta iota kappa " * 5,
    ]
    batches = []
    for i, t in enumerate(texts):
        b = spark.range(20).select(
            F.concat(F.lit(f"c{i}-"), F.col("id")).alias("conv_id"),
            F.col("id").cast("int").alias("turn_idx"),
            F.lit(t).alias("event_type"),
        )
        # one FILE per batch so maxFilesPerTrigger=1 makes one epoch each
        b.coalesce(1).write.parquet(f"{src}/part{i}")
        batches.append(b)

    q = stream_sketches(
        spark, f"{src}/part*", out, ck, "conv_id",
        max_files_per_trigger=1, text_col="event_type", gram_buckets=4096,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    rows = adjacent = read_epoch_drift(spark, out).collect()
    assert len(rows) == 2
    got = sorted((r["jsd"] for r in adjacent))
    # batch twin: pairwise drift over the same gram tables, matched as a
    # SET of jsd values (epoch ids depend on file pickup order)
    def gc(b):
        return gram_bucket_counts(
            b, id_col="conv_id", text_col="event_type", n_buckets=4096
        )

    want = sorted(
        drift_summary(gc(a), gc(b)).collect()[0]["jsd"]
        for a, b in [(batches[0], batches[1]), (batches[1], batches[2])]
    )
    # the two transitions have distinct drifts (partial vs total shift);
    # whatever order the stream picked the files up in, the multiset of
    # adjacent drifts can only match if the order was the written one OR
    # a reversal (symmetric JSD makes reversal equal) — both acceptable
    for g, w in zip(got, want):
        assert g == pytest.approx(w, abs=1e-9)


def test_adjacent_epoch_drift_pairs_across_numbering_gaps(spark):
    """ADVICE r5: a gap in epoch numbering (skipped/failed micro-batch)
    must NOT suppress the alarm row — the epoch after the gap pairs
    with its predecessor BY RANK, and the drift values equal
    drift_summary over that same pair."""
    hist = [
        (0, 1, 10), (0, 2, 30), (0, 3, 60),
        # epoch 1 is MISSING (failed micro-batch)
        (2, 2, 25), (2, 3, 50), (2, 4, 25),
        (5, 2, 50), (5, 3, 100), (5, 4, 50),
    ]
    counts = spark.createDataFrame(hist, "epoch int, bucket int, cnt long")
    from fluent_server_spark.operators.drift import adjacent_epoch_drift

    got = {r["epoch"]: r for r in adjacent_epoch_drift(counts).collect()}
    # rows for 2 (vs 0) and 5 (vs 2) — NOT silently dropped
    assert set(got) == {2, 5}
    old = _counts(spark, [(b, c) for ep, b, c in hist if ep == 0])
    new = _counts(spark, [(b, c) for ep, b, c in hist if ep == 2])
    want = drift_summary(old, new).collect()[0]
    assert got[2]["jsd"] == pytest.approx(want["jsd"], abs=1e-9)
    assert got[2]["buckets_gained"] == want["buckets_gained"]
    assert got[5]["jsd"] == pytest.approx(0.0, abs=1e-12)  # scaled copy of 2
