"""Naive-Bayes quality classifier (operators/nb_classifier.py) vs a
pure-Python NB of the same add-k semantics; separability, OOV handling,
zero-token docs."""

from __future__ import annotations

import math

import pytest

from fluent_server_spark.operators.nb_classifier import nb_score, train_nb

POS = [
    "the measured result replicates under the stated protocol",
    "we report confidence intervals for every estimate",
    "the appendix lists the full experimental configuration",
    "results hold across three independent replications",
]
NEG = [
    "click here to win amazing prizes now now now",
    "buy cheap buy now limited offer click click",
    "winner winner amazing offer click here now",
    "free free free prizes now click here",
]
LABELED = [(t, True) for t in POS] + [(t, False) for t in NEG]


def _py_nb(labeled, score_docs, a=1.0):
    from collections import Counter

    cp, cn = Counter(), Counter()
    dp = dn = 0
    for t, y in labeled:
        toks = t.lower().split()
        if y:
            cp.update(toks)
            dp += 1
        else:
            cn.update(toks)
            dn += 1
    vocab = set(cp) | set(cn)
    npos, nneg, v = sum(cp.values()), sum(cn.values()), len(vocab)

    def llr(t):
        return math.log((cp[t] + a) / (npos + a * v)) - math.log(
            (cn[t] + a) / (nneg + a * v)
        )

    out = {}
    for i, text in score_docs:
        s = math.log(dp) - math.log(dn)
        for t in text.lower().split():
            s += llr(t)  # Counter returns 0 for unseen -> smoothed const
        out[i] = s
    return out


@pytest.fixture(scope="module")
def trained(spark):
    labeled = spark.createDataFrame(LABELED, "text string, label boolean")
    model, consts = train_nb(labeled)
    return model, consts


def test_matches_python_reference(spark, trained):
    model, consts = trained
    score_docs = [
        (0, "the result replicates with confidence"),
        (1, "click now to win free prizes"),
        (2, "completely novel vocabulary here xyzzy"),
        (3, ""),
    ]
    docs = spark.createDataFrame(score_docs, "doc_id int, text string")
    got = {r["doc_id"]: r["score"] for r in nb_score(docs, model, consts).collect()}
    exp = _py_nb(LABELED, score_docs)
    for i, want in exp.items():
        assert abs(got[i] - want) < 1e-4, (i, got[i], want)


def test_separates_and_flags(spark, trained):
    model, consts = trained
    docs = spark.createDataFrame(
        [(0, "the protocol result replicates"), (1, "click click win free now")],
        "doc_id int, text string",
    )
    rows = {r["doc_id"]: r for r in nb_score(docs, model, consts).collect()}
    assert rows[0]["keep"] and rows[0]["score"] > 0
    assert not rows[1]["keep"] and rows[1]["score"] < 0


def test_zero_token_doc_scores_prior(spark, trained):
    model, consts = trained
    prior = consts.first()["log_prior"]
    docs = spark.createDataFrame([(9, "   ")], "doc_id int, text string")
    row = nb_score(docs, model, consts).first()
    assert abs(row["score"] - prior) < 1e-6


def test_model_is_a_table_and_balanced_prior_is_zero(spark, trained):
    model, consts = trained
    # one row per distinct training token; no driver-side state anywhere
    vocab = {t for text, _ in LABELED for t in text.lower().split()}
    assert model.count() == len(vocab)
    assert abs(consts.first()["log_prior"]) < 1e-12  # 4 vs 4 docs
