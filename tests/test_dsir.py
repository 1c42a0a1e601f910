"""DSIR (operators/dsir.py) vs a pure-Python reference of the same
hashed-n-gram importance-weight math; directional behavior (docs like
the target get upweighted), Gumbel resample laws, edge cases."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from fluent_server_spark.operators.dsir import (
    dsir_model,
    dsir_select,
    dsir_weights,
    gram_bucket_counts,
)

B = 64  # tiny bucket count ON PURPOSE: forces hash collisions
SMOOTH = 1.0

RAW = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "spark shuffles partitions across the cluster"),
    (2, "broadcast joins avoid the shuffle entirely"),
    (3, "the lazy dog sleeps all day long"),
    (4, "adaptive query execution re plans at runtime"),
    (5, "fox and dog and fox and dog"),
    (6, ""),
    (7, "catalyst optimizer prunes columns and pushes filters"),
]
TARGET = [
    (100, "spark partitions and shuffle tuning"),
    (101, "broadcast joins and the catalyst optimizer"),
    (102, "query execution plans in spark"),
]


def _py_grams(text: str) -> list[str]:
    ws = [w for w in text.lower().strip().split() if w]
    return ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]


def _py_bucket(gram: str, salt: str = "dsir") -> int:
    return int(hashlib.md5(f"{salt}:{gram}".encode()).hexdigest()[:15], 16) % B


def _py_counts(docs) -> dict[int, int]:
    out: dict[int, int] = {}
    for _, t in docs:
        for g in _py_grams(t):
            b = _py_bucket(g)
            out[b] = out.get(b, 0) + 1
    return out


def _py_weights(raw, target, s=SMOOTH):
    rc, tc = _py_counts(raw), _py_counts(target)
    rt, tt = sum(rc.values()), sum(tc.values())

    def llr(b):
        return round(
            math.log((tc.get(b, 0) + s) / (tt + s * B))
            - math.log((rc.get(b, 0) + s) / (rt + s * B)),
            10,
        )

    out = {}
    for d, t in raw:
        gs = _py_grams(t)
        out[d] = (len(gs), round(sum(llr(_py_bucket(g)) for g in gs), 6))
    return out


@pytest.fixture(scope="module")
def raw_df(spark):
    return spark.createDataFrame(RAW, ["doc_id", "text"])


@pytest.fixture(scope="module")
def target_df(spark):
    return spark.createDataFrame(TARGET, ["doc_id", "text"])


def test_weights_match_python_reference(spark, raw_df, target_df):
    rc = gram_bucket_counts(raw_df, n_buckets=B)
    tc = gram_bucket_counts(target_df, n_buckets=B)
    model, consts = dsir_model(rc, tc, n_buckets=B, smoothing=SMOOTH)
    got = {
        r["doc_id"]: (r["n_grams"], r["log_w"])
        for r in dsir_weights(raw_df, model, consts, n_buckets=B).collect()
    }
    exp = _py_weights(RAW, TARGET)
    assert set(got) == set(exp)
    for d, (ng, lw) in exp.items():
        assert got[d][0] == ng
        assert got[d][1] == pytest.approx(lw, abs=2e-6)


def test_bucket_counts_match_python(spark, raw_df):
    got = {
        r["bucket"]: r["cnt"]
        for r in gram_bucket_counts(raw_df, n_buckets=B).collect()
    }
    assert got == _py_counts(RAW)


def test_target_like_docs_upweighted(spark, raw_df, target_df):
    """Docs sharing vocabulary with the target (spark/joins/query) must
    outweigh the off-topic fox/dog docs."""
    rc = gram_bucket_counts(raw_df, n_buckets=B)
    tc = gram_bucket_counts(target_df, n_buckets=B)
    model, consts = dsir_model(rc, tc, n_buckets=B)
    w = {
        r["doc_id"]: r["log_w"]
        for r in dsir_weights(raw_df, model, consts, n_buckets=B).collect()
    }
    on_topic = min(w[1], w[2], w[4], w[7])
    off_topic = max(w[0], w[3], w[5])
    assert on_topic > off_topic


def test_gramless_doc_scores_zero(spark, raw_df, target_df):
    rc = gram_bucket_counts(raw_df, n_buckets=B)
    tc = gram_bucket_counts(target_df, n_buckets=B)
    model, consts = dsir_model(rc, tc, n_buckets=B)
    row = [
        r
        for r in dsir_weights(raw_df, model, consts, n_buckets=B).collect()
        if r["doc_id"] == 6
    ][0]
    assert row["n_grams"] == 0 and row["log_w"] == 0.0


def test_select_deterministic_and_sized(spark, raw_df, target_df):
    a = {r["doc_id"] for r in dsir_select(raw_df, target_df, 4, n_buckets=B).collect()}
    b = {r["doc_id"] for r in dsir_select(raw_df, target_df, 4, n_buckets=B).collect()}
    assert a == b and len(a) == 4


def test_select_low_temperature_is_argmax(spark, raw_df, target_df):
    """temperature -> 0: the Gumbel noise becomes negligible next to
    log_w/T, so the selected set is exactly the top-n by weight."""
    rc = gram_bucket_counts(raw_df, n_buckets=B)
    tc = gram_bucket_counts(target_df, n_buckets=B)
    model, consts = dsir_model(rc, tc, n_buckets=B)
    w = {
        r["doc_id"]: r["log_w"]
        for r in dsir_weights(raw_df, model, consts, n_buckets=B).collect()
    }
    top3 = {d for d, _ in sorted(w.items(), key=lambda kv: -kv[1])[:3]}
    got = {
        r["doc_id"]
        for r in dsir_select(
            raw_df, target_df, 3, n_buckets=B, temperature=1e-9
        ).collect()
    }
    assert got == top3


def test_select_different_salt_different_sample(spark, raw_df, target_df):
    """The sample is a function of the salt (fresh salt = fresh draw) —
    at temperature high enough for noise to matter."""
    kw = dict(n_buckets=B, temperature=50.0)
    a = {
        r["doc_id"]
        for r in dsir_select(raw_df, target_df, 3, salt="dsir", **kw).collect()
    }
    runs = [
        {
            r["doc_id"]
            for r in dsir_select(raw_df, target_df, 3, salt=f"s{i}", **kw).collect()
        }
        for i in range(4)
    ]
    assert any(s != a for s in runs)


def test_guards(spark, raw_df, target_df):
    rc = gram_bucket_counts(raw_df, n_buckets=B)
    with pytest.raises(ValueError):
        dsir_model(rc, rc, n_buckets=B, smoothing=0.0)
    with pytest.raises(ValueError):
        dsir_select(raw_df, target_df, 2, n_buckets=B, temperature=0.0)
