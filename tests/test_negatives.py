"""Hard-negative mining: positives excluded, rank order preserved,
bounds enforced, DPR example shape total (empty arrays, never NULL)."""

from __future__ import annotations

import pytest

from fluent_server_spark.operators.negatives import (
    build_retrieval_examples,
    mine_hard_negatives,
)


@pytest.fixture(scope="module")
def ranking(spark):
    # two queries, ranked docs; q2's entire top-3 will be positive
    rows = [
        (1, 1, 10, 0.9), (1, 2, 11, 0.8), (1, 3, 12, 0.7), (1, 4, 13, 0.6),
        (1, 5, 14, 0.5),
        (2, 1, 20, 0.9), (2, 2, 21, 0.8), (2, 3, 22, 0.7),
    ]
    return spark.createDataFrame(
        rows, "query_id long, rk int, doc_id long, score double"
    )


def test_mine_excludes_positives_and_reranks(spark, ranking):
    pos = spark.createDataFrame(
        [(1, 11), (2, 20), (2, 21), (2, 22)], "query_id long, doc_id long"
    )
    got = {
        (r.query_id, r.neg_rank): r.doc_id
        for r in mine_hard_negatives(ranking, pos, n_neg=2).collect()
    }
    # q1: 11 skipped, survivors re-ranked densely in original order
    assert got == {(1, 1): 10, (1, 2): 12}
    # q2 fully positive -> no rows at all (caller's decision)


def test_mine_bounds_and_validation(spark, ranking):
    pos = spark.createDataFrame([(1, 10)], "query_id long, doc_id long")
    out = mine_hard_negatives(ranking, pos, n_neg=100).collect()
    assert len([r for r in out if r.query_id == 1]) == 4  # all non-pos kept
    with pytest.raises(ValueError, match="n_neg"):
        mine_hard_negatives(ranking, pos, n_neg=0)


def test_examples_shape_total(spark, ranking):
    pos = spark.createDataFrame(
        [(1, 11), (2, 20), (2, 21), (2, 22)], "query_id long, doc_id long"
    )
    neg = mine_hard_negatives(ranking, pos, n_neg=3)
    ex = {
        (r.query_id, r.pos_id): list(r.neg_ids)
        for r in build_retrieval_examples(pos, neg).collect()
    }
    assert ex[(1, 11)] == [10, 12, 13]  # rank-ordered
    # q2 mined nothing: empty array, never NULL, one row per positive
    assert ex[(2, 20)] == [] and ex[(2, 21)] == [] and ex[(2, 22)] == []
