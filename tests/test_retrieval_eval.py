"""Retrieval metrics (recall@k, MRR@k) vs a pure-Python reference,
plus the sweep-closure use: scoring LSH top-k against brute force."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from fluent_server_spark.operators.retrieval_eval import (
    ranking_quality,
    ranking_quality_summary,
)
from fluent_server_spark.operators.similarity import (
    brute_force_topk,
    lsh_topk,
)

DIM = 16


def _ref_metrics(ranking, truth, k):
    """ranking/truth: list[(q, doc, score)] → {q: (recall, rr)} with the
    operator's tie rule (score desc, doc asc), truth-driven queries."""

    def topk(rows):
        byq = {}
        for q, d, s in rows:
            byq.setdefault(q, []).append((d, s))
        return {
            q: [d for d, _ in sorted(ds, key=lambda x: (-x[1], x[0]))[:k]]
            for q, ds in byq.items()
        }

    r, t = topk(ranking), topk(truth)
    out = {}
    for q, rel in t.items():
        rel_set = set(rel)
        ranked = r.get(q, [])
        hits = [i + 1 for i, d in enumerate(ranked) if d in rel_set]
        out[q] = (
            len(hits) / len(rel_set),
            1.0 / hits[0] if hits else 0.0,
        )
    return out


def test_hand_computed(spark):
    # truth top-2 for q1 is {a, b}; ranking puts b first, misses a
    ranking = spark.createDataFrame(
        [("q1", "b", 0.9), ("q1", "x", 0.8), ("q1", "a", 0.1),
         ("q2", "z", 0.5)],
        "query_id string, neighbor_id string, cos double",
    )
    truth = spark.createDataFrame(
        [("q1", "a", 1.0), ("q1", "b", 0.9), ("q1", "c", 0.1),
         ("q2", "y", 1.0), ("q2", "w", 0.9),
         ("q3", "m", 1.0)],
        "query_id string, neighbor_id string, cos double",
    )
    got = {
        r["query_id"]: r.asDict()
        for r in ranking_quality(ranking, truth, 2).collect()
    }
    # q1: relevant {a,b}, ranking top-2 [b,x] → recall 1/2, first hit rank 1
    assert got["q1"]["recall_at_k"] == 0.5
    assert got["q1"]["reciprocal_rank"] == 1.0
    # q2: relevant {y,w}, ranking [z] → 0 hits
    assert got["q2"]["recall_at_k"] == 0.0
    assert got["q2"]["reciprocal_rank"] == 0.0
    # q3: in truth but never ranked → scored as 0, not dropped
    assert got["q3"]["recall_at_k"] == 0.0 and got["q3"]["n_relevant"] == 1
    s = ranking_quality_summary(ranking, truth, 2).collect()[0]
    assert s["n_queries"] == 3
    assert s["recall_at_k"] == pytest.approx(0.5 / 3)
    assert s["mrr"] == pytest.approx(1.0 / 3)


def test_matches_python_reference(spark):
    rng = np.random.default_rng(7)
    qs = [f"q{i}" for i in range(20)]
    docs = [f"d{i}" for i in range(50)]
    ranking = [
        (q, d, float(rng.random())) for q in qs for d in rng.choice(docs, 30, replace=False)
    ]
    truth = [
        (q, d, float(rng.random())) for q in qs[:15] for d in rng.choice(docs, 25, replace=False)
    ]
    sr = spark.createDataFrame(
        ranking, "query_id string, neighbor_id string, cos double"
    )
    st = spark.createDataFrame(
        truth, "query_id string, neighbor_id string, cos double"
    )
    for k in (1, 5, 10):
        got = {
            r["query_id"]: (r["recall_at_k"], r["reciprocal_rank"])
            for r in ranking_quality(sr, st, k).collect()
        }
        want = _ref_metrics(ranking, truth, k)
        assert set(got) == set(want)
        for q in want:
            assert got[q][0] == pytest.approx(want[q][0]), (k, q)
            assert got[q][1] == pytest.approx(want[q][1]), (k, q)


def test_truth_against_itself_is_perfect(spark, vec_df):
    exact = brute_force_topk(vec_df, vec_df, k=5)
    s = ranking_quality_summary(exact, exact, 5).collect()[0]
    assert s["recall_at_k"] == 1.0 and s["mrr"] == 1.0
    assert s["n_queries"] == vec_df.count()


def test_scores_lsh_against_brute_force(spark, vec_df):
    """The sweep-closure use: LSH recall vs the exact baseline is a
    proper fraction, and multi-probe must not lower it."""
    exact = brute_force_topk(vec_df, vec_df, k=5)
    r1 = ranking_quality_summary(
        lsh_topk(vec_df, vec_df, DIM, k=5, n_planes=6, probes=1), exact, 5
    ).collect()[0]
    r3 = ranking_quality_summary(
        lsh_topk(vec_df, vec_df, DIM, k=5, n_planes=6, probes=3), exact, 5
    ).collect()[0]
    assert 0.0 < r1["recall_at_k"] <= 1.0
    assert r3["recall_at_k"] >= r1["recall_at_k"]
    assert r3["mrr"] >= r1["mrr"] - 1e-9


def test_two_exchange_plan(spark):
    """The docstring's scale claim: one hash(query) exchange per side;
    the truth-set collapse, the query-key join, the per-query agg and
    the summary all reuse them — no (query, doc) co-partition shuffle."""
    import io
    from contextlib import redirect_stdout

    ranking = spark.range(1000).select(
        (F.col("id") % 50).cast("string").alias("query_id"),
        (F.col("id") % 97).cast("string").alias("neighbor_id"),
        (F.col("id") % 13).cast("double").alias("cos"),
    )
    truth = spark.range(400).select(
        (F.col("id") % 50).cast("string").alias("query_id"),
        (F.col("id") % 89).cast("string").alias("neighbor_id"),
        (F.col("id") % 11).cast("double").alias("cos"),
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        ranking_quality_summary(ranking, truth, 5).explain()
    plan = buf.getvalue()
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "CartesianProduct" not in plan
