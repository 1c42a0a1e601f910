"""Hybrid retrieval (operators/fusion.py): RRF math vs a pure-Python
reference, chargram retriever parity + typo robustness, fusion laws
(absence contributes 0, consensus wins), determinism, edge cases."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from fluent_server_spark.operators.fusion import (
    RRF_K,
    chargram_topk,
    hybrid_topk,
    rrf_fuse,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "a quick brown dog outpaces a quick fox"),
    (2, "the lazy dog sleeps all day"),
    (3, "slow green turtle walks under the energetic rabbit"),
    (4, "fox fox fox fox fox"),
    (5, "completely unrelated words about spark and tables"),
]
# query 2 has a typo ("quikc") — BM25 whitespace terms miss it entirely,
# trigrams still overlap; that asymmetry is what the hybrid exists for
QUERIES = [(0, "quick fox"), (1, "lazy dog"), (2, "quikc fox")]


def _grams(text: str, n: int = 3) -> set[str]:
    t = text.lower().strip()
    if len(t) <= n:
        return {t}
    return {t[i : i + n] for i in range(len(t) - n + 1)}


def _py_chargram(docs, queries, n=3, k=10):
    out = {}
    for qid, q in queries:
        qg = {g for g in _grams(q, n) if g != ""}
        scores = {}
        for d, t in docs:
            dg = {g for g in _grams(t, n) if g != ""}
            m = len(qg & dg)
            if m:
                scores[d] = round(m / (len(dg) + len(qg) - m), 6)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out[qid] = ranked
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


@pytest.fixture(scope="module")
def queries_df(spark):
    return spark.createDataFrame(QUERIES, ["query_id", "query"])


def test_chargram_matches_python_reference(spark, corpus, queries_df):
    got = {
        (r["query_id"], r["rk"]): (r["doc_id"], r["score"])
        for r in chargram_topk(corpus, queries_df, n=3, k=10).collect()
    }
    for qid, ranked in _py_chargram(DOCS, QUERIES).items():
        for i, (d, s) in enumerate(ranked, start=1):
            assert got[(qid, i)][0] == d
            assert got[(qid, i)][1] == pytest.approx(s, abs=1e-6)


def test_chargram_survives_typo(spark, corpus, queries_df):
    """'quikc fox' still retrieves the fox docs via trigram overlap."""
    rows = chargram_topk(corpus, queries_df, k=3).filter(
        F.col("query_id") == 2
    ).collect()
    assert {r["doc_id"] for r in rows} & {0, 1, 4}


def test_rrf_matches_python_reference(spark):
    a = spark.createDataFrame(
        [(0, 1, 10), (0, 2, 20), (0, 3, 30)], ["query_id", "rk", "doc_id"]
    )
    b = spark.createDataFrame(
        [(0, 1, 20), (0, 2, 40)], ["query_id", "rk", "doc_id"]
    )
    got = {
        r["doc_id"]: (r["rrf_score"], r["n_lists"], r["rk"])
        for r in rrf_fuse([a, b]).collect()
    }
    exp = {
        10: 1 / (RRF_K + 1),
        20: 1 / (RRF_K + 2) + 1 / (RRF_K + 1),
        30: 1 / (RRF_K + 3),
        40: 1 / (RRF_K + 2),
    }
    for d, s in exp.items():
        assert got[d][0] == pytest.approx(round(s, 10), abs=1e-10)
    # doc 20 is in both lists -> consensus, fused rank 1
    assert got[20][1] == 2 and got[20][2] == 1
    assert got[10][1] == 1
    # absence from a list contributed 0, not a penalty: 10 (rank 1 in a
    # single list) still beats 30 and 40
    assert got[10][2] < got[30][2] and got[10][2] < got[40][2]


def test_rrf_tie_breaks_on_doc_id(spark):
    a = spark.createDataFrame([(0, 1, 7), (0, 2, 3)], ["query_id", "rk", "doc_id"])
    b = spark.createDataFrame([(0, 1, 3), (0, 2, 7)], ["query_id", "rk", "doc_id"])
    rows = {r["doc_id"]: r["rk"] for r in rrf_fuse([a, b]).collect()}
    # identical fused scores -> lower doc_id wins
    assert rows[3] == 1 and rows[7] == 2


def test_hybrid_topk_end_to_end(spark, corpus, queries_df):
    out = hybrid_topk(corpus, queries_df, k=3, depth=6)
    rows = out.collect()
    assert set(out.columns) == {"query_id", "rk", "doc_id", "rrf_score", "n_lists"}
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r["rk"])
    for qid, rks in per_q.items():
        assert sorted(rks) == list(range(1, len(rks) + 1))
    # the typo query still lands a fox doc at rank 1 (trigram side)
    top_typo = [r for r in rows if r["query_id"] == 2 and r["rk"] == 1]
    assert top_typo and top_typo[0]["doc_id"] in {0, 1, 4}
    # deterministic across runs
    again = {
        (r["query_id"], r["rk"]): r["doc_id"]
        for r in hybrid_topk(corpus, queries_df, k=3, depth=6).collect()
    }
    assert again == {(r["query_id"], r["rk"]): r["doc_id"] for r in rows}


def test_rrf_empty_and_single_list(spark):
    with pytest.raises(ValueError):
        rrf_fuse([])
    a = spark.createDataFrame([(0, 1, 10)], ["query_id", "rk", "doc_id"])
    rows = rrf_fuse([a]).collect()
    assert len(rows) == 1 and rows[0]["rk"] == 1


def test_chargram_max_df_drops_stop_grams(spark, corpus, queries_df):
    """max_df=0 keeps no gram (every gram occurs in >0 of the corpus) —
    the insurance dial degrades to an empty result, never an error."""
    assert chargram_topk(corpus, queries_df, max_df=0.0).count() == 0
