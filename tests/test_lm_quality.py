"""Unigram-LM quality scoring vs a pure-Python reference, and the
CCNet-style band filter's selection behavior."""

from __future__ import annotations

import math
import re

import pytest

from fluent_server_spark.operators.lm_quality import (
    perplexity_band_filter,
    train_unigram,
    unigram_nll_scores,
)


def _py_scores(docs: dict[int, str], k: float = 1.0) -> dict[int, float | None]:
    def words(t: str) -> list[str]:
        return [w for w in re.split(r"\s+", t.strip().lower()) if w]

    counts: dict[str, int] = {}
    for t in docs.values():
        for w in words(t):
            counts[w] = counts.get(w, 0) + 1
    n_total, vocab = sum(counts.values()), len(counts)
    out: dict[int, float | None] = {}
    for did, t in docs.items():
        ws = words(t)
        if not ws:
            out[did] = None
            continue
        nll = [
            -math.log((counts.get(w, 0) + k) / (n_total + k * (vocab + 1)))
            for w in ws
        ]
        out[did] = round(sum(nll) / len(nll), 6)
    return out


@pytest.fixture(scope="module")
def corpus():
    docs = {0: "the the the the the the the the"}  # degenerate boilerplate
    for i in range(1, 9):  # normal-ish docs sharing vocabulary
        docs[i] = f"the quick brown fox number {i % 3} jumps over the lazy dog"
    docs[9] = "zxqv wvutk pqrmn jklzz qqwwx yyzzv"  # gibberish: all-rare
    docs[10] = "   "  # wordless
    return docs


def test_scores_match_python_reference(spark, corpus):
    sdf = spark.createDataFrame(
        [(i, t) for i, t in corpus.items()], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["avg_nll"] for r in unigram_nll_scores(sdf).collect()
    }
    want = _py_scores(corpus)
    assert set(got) == set(want)
    for did, v in want.items():
        if v is None:
            assert got[did] is None
        else:
            assert got[did] == pytest.approx(v, abs=1e-6)


def test_pretrained_model_reuse(spark, corpus):
    """Scoring an increment against a stored model must equal scoring it
    inside the full corpus... for the model trained on that same corpus
    (train-once semantics)."""
    sdf = spark.createDataFrame(
        [(i, t) for i, t in corpus.items()], "doc_id long, text string"
    )
    model = train_unigram(sdf)
    increment = sdf.filter("doc_id < 3")
    a = {
        r["doc_id"]: r["avg_nll"]
        for r in unigram_nll_scores(increment, model=model).collect()
    }
    b = {
        r["doc_id"]: r["avg_nll"]
        for r in unigram_nll_scores(sdf, model=model).collect()
        if r["doc_id"] < 3
    }
    assert a == b


def test_band_filter_drops_both_tails(spark, corpus):
    sdf = spark.createDataFrame(
        [(i, t) for i, t in corpus.items()], "doc_id long, text string"
    )
    kept = {
        r["doc_id"]
        for r in perplexity_band_filter(sdf, 0.15, 0.85).select("doc_id").collect()
    }
    assert 0 not in kept  # boilerplate tail (lowest NLL)
    assert 9 not in kept  # gibberish tail (highest NLL)
    assert 10 not in kept  # wordless
    assert kept and kept <= set(range(1, 9))  # the normal band survives


def test_band_filter_all_wordless_corpus_returns_empty(spark):
    """Every doc wordless -> every avg_nll NULL -> approxQuantile has no
    values and returns []; the filter must return the (correct) empty
    result instead of raising an opaque unpack ValueError."""
    sdf = spark.createDataFrame(
        [(0, "   "), (1, ""), (2, "\t\n")], "doc_id long, text string"
    )
    out = perplexity_band_filter(sdf)
    assert out.count() == 0
    assert out.columns == sdf.columns


# ------------------------------------------------ interpolated bigram LM


def _py_bigram_scores(
    docs: dict[int, str], lam: float = 0.7, k: float = 1.0
) -> dict[int, float | None]:
    def words(t: str) -> list[str]:
        return [w for w in re.split(r"\s+", t.strip().lower()) if w]

    uni: dict[str, int] = {}
    big: dict[tuple[str, str], int] = {}
    for t in docs.values():
        ws = words(t)
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    n_total, vocab = sum(uni.values()), len(uni)
    out: dict[int, float | None] = {}
    for did, t in docs.items():
        ws = words(t)
        if len(ws) < 2:
            out[did] = None
            continue
        nll = []
        for a, b in zip(ws, ws[1:]):
            p_big = (big.get((a, b), 0) + k) / (uni.get(a, 0) + k * (vocab + 1))
            p_uni = (uni.get(b, 0) + k) / (n_total + k * (vocab + 1))
            nll.append(-math.log(lam * p_big + (1 - lam) * p_uni))
        out[did] = round(sum(nll) / len(nll), 6)
    return out


def test_bigram_scores_match_python_reference(spark, corpus):
    from fluent_server_spark.operators.lm_quality import bigram_nll_scores

    docs = dict(corpus)
    docs[11] = "one"  # single word: no bigram -> NULL
    sdf = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["avg_nll"] for r in bigram_nll_scores(sdf).collect()
    }
    want = _py_bigram_scores(docs)
    assert set(got) == set(want)
    for did, v in want.items():
        if v is None:
            assert got[did] is None, did
        else:
            assert got[did] == pytest.approx(v, abs=1e-6), did


def test_bigram_model_separates_scrambled_text(spark, corpus):
    """Word-order damage is invisible to the unigram model but must
    raise the bigram NLL: a doc with the same words shuffled scores
    worse than its in-order twin."""
    from fluent_server_spark.operators.lm_quality import bigram_nll_scores

    docs = dict(corpus)
    docs[20] = "the quick brown fox jumps over the lazy dog"
    docs[21] = "dog the over quick lazy fox jumps brown the"
    sdf = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["avg_nll"] for r in bigram_nll_scores(sdf).collect()
    }
    assert got[21] > got[20]


def test_band_filter_accepts_external_scores(spark, corpus):
    """The band filter must band on a caller-provided score table (the
    bigram scorer) instead of self-training the unigram."""
    from fluent_server_spark.operators.lm_quality import (
        bigram_nll_scores,
        perplexity_band_filter,
    )

    sdf = spark.createDataFrame(
        [(i, t) for i, t in corpus.items()], "doc_id long, text string"
    )
    scores = bigram_nll_scores(sdf)
    kept = {
        r["doc_id"]
        for r in perplexity_band_filter(sdf, 0.15, 0.85, scores=scores)
        .select("doc_id")
        .collect()
    }
    assert 9 not in kept  # gibberish tail (highest bigram NLL)
    assert 10 not in kept  # wordless: no bigrams -> NULL -> dropped
    # both tails trimmed: the band is a strict subset of the scorable docs
    assert kept and len(kept) < 10 and kept <= set(range(0, 9))


def test_pretrained_bigram_reuse(spark, corpus):
    from fluent_server_spark.operators.lm_quality import (
        bigram_nll_scores,
        train_bigram,
        train_unigram,
    )

    sdf = spark.createDataFrame(
        [(i, t) for i, t in corpus.items()], "doc_id long, text string"
    )
    big, uni = train_bigram(sdf), train_unigram(sdf)
    increment = sdf.filter("doc_id < 3")
    a = {
        r["doc_id"]: r["avg_nll"]
        for r in bigram_nll_scores(increment, big, uni).collect()
    }
    b = {
        r["doc_id"]: r["avg_nll"]
        for r in bigram_nll_scores(sdf, big, uni).collect()
        if r["doc_id"] < 3
    }
    assert a == b
