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
