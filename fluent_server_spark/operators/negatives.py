"""Hard-negative mining for retrieval training sets.

The DPR / RocketQA recipe (Karpukhin et al. 2020; Qu et al. 2021,
public): train a dense retriever on (query, positive, negatives) where
the negatives are the TOP-RANKED non-positives from a first-stage
ranker (BM25 or a prior model) — random negatives are too easy and the
model never learns the decision boundary.

Design: the miner takes a RANKING relation, not a corpus — any
(query_id, rk, doc_id) top-k output composes unchanged (bm25_topk,
bm25_topk_from_index, hybrid RRF fusion, ivf_topk_from_index,
lsh_topk). That keeps this operator a pure relational layer:

* `mine_hard_negatives`: LEFT ANTI equi-join on (query, doc) against
  the positives, then one window over the already-bounded <= k rows
  per query to re-rank survivors 1..n_neg. No text, no scoring, no
  extra corpus pass — the expensive part already happened in the
  ranker, which is exactly how production mining schedules it.
* `build_retrieval_examples`: one row per (query, positive) with the
  negative ids as a rank-ordered array — the DPR example shape. One
  groupBy on the query key; arrays are sorted by mined rank so output
  is a pure function of the input.

100 TB shape: everything here is bounded by queries x k rows (the
ranking), not by the corpus. The anti-join's right side (positives) is
typically tiny per query; skew is bounded because the ranking itself
is capped at k rows per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def mine_hard_negatives(
    ranking: DataFrame,
    positives: DataFrame,
    n_neg: int = 5,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rk",
) -> DataFrame:
    """(query_id, neg_rank, doc_id, *carried): the n_neg highest-ranked
    docs per query that are NOT known positives. `neg_rank` is dense
    1..n_neg in the original rank order (ties impossible — rank_col is
    already total per query). Queries whose entire top-k is positive
    yield no rows (caller decides whether that query is usable)."""
    if n_neg < 1:
        raise ValueError(f"n_neg={n_neg} must be >= 1")
    neg = ranking.join(
        positives.select(query_id_col, id_col).distinct(),
        [query_id_col, id_col],
        "left_anti",
    )
    w = Window.partitionBy(query_id_col).orderBy(rank_col, id_col)
    return (
        neg.withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= n_neg)
        .drop(rank_col)
    )


def build_retrieval_examples(
    positives: DataFrame,
    negatives: DataFrame,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
) -> DataFrame:
    """(query_id, pos_id, neg_ids): the DPR training-example shape —
    every (query, positive) paired with the query's mined negatives as
    a rank-ordered array. Queries with no mined negatives keep an
    empty array (never NULL), so downstream batching logic can filter
    or backfill explicitly. Cost: one groupBy on the query key + one
    equi-join; both sides are ranking-bounded."""
    neg_lists = negatives.groupBy(query_id_col).agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("neg_rank", F.col(id_col).alias("nid")))
            ),
            lambda s: s["nid"],
        ).alias("neg_ids")
    )
    id_type = dict(negatives.dtypes)[id_col]  # empty array matches the id type
    return (
        positives.select(query_id_col, F.col(id_col).alias("pos_id"))
        .join(neg_lists, query_id_col, "left")
        .select(
            query_id_col,
            "pos_id",
            F.coalesce(F.col("neg_ids"), F.array().cast(f"array<{id_type}>")).alias(
                "neg_ids"
            ),
        )
    )
