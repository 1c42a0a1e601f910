"""Retrieval quality metrics — recall@k and MRR@k of any ranking
DataFrame against an oracle ranking, as a reusable operator.

Closes the loop on the ANN / BM25 / hybrid sweeps: the sweeps measure
wall clock, this measures result quality against the exact baseline
(e.g. `brute_force_topk` as truth for `ann_topk_lsh`), so a
tables/probes operating point can be chosen on a (wall, recall) curve
instead of wall alone.

Definitions (standard IR, both cut at k):

* recall@k   = |topk(ranking) ∩ topk(truth)| / |topk(truth)| per query
* MRR@k      = mean over queries of 1/rank_in_ranking(first relevant),
               0 when no relevant doc appears in the ranking's top k

Scale shape — TWO exchanges total, both on hash(query):

1. each side gets a per-query `row_number` window (one exchange each —
   that's the two), cut to k rows;
2. the truth side then collapses to ONE row per query carrying its
   relevant-doc set as an array of ≤ k ids (`collect_set` reuses the
   window's partitioning), so the sides meet in an equi-join on the
   query key ALONE — `array_contains` replaces the (query, doc) join
   that would otherwise force a third shuffle (Spark co-partitions a
   two-key join only on both keys by default);
3. the per-query aggregate and the summary's global mean reuse the
   join's partitioning (partial+final agg for the latter).

Truth is normally a small evaluation set (queries × k rows); at that
size AQE broadcasts the collapsed truth side and the whole evaluation
is one exchange on the ranking. Ties break deterministically on
(score desc, doc id asc) — same rule as `brute_force_topk` — so the
metrics are pure functions of the inputs and the DuckDB oracle can
replay them row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _topk(
    df: DataFrame, k: int, query_col: str, doc_col: str, score_col: str
) -> DataFrame:
    w = Window.partitionBy("_q").orderBy(F.col("_s").desc(), F.col("_doc"))
    return (
        df.select(
            F.col(query_col).alias("_q"),
            F.col(doc_col).alias("_doc"),
            F.col(score_col).alias("_s"),
        )
        .withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= int(k))
    )


def ranking_quality(
    ranking: DataFrame,
    truth: DataFrame,
    k: int,
    query_col: str = "query_id",
    doc_col: str = "neighbor_id",
    score_col: str = "cos",
    truth_doc_col: str | None = None,
    truth_score_col: str | None = None,
) -> DataFrame:
    """Per-query (query, n_relevant, n_hits, recall_at_k,
    reciprocal_rank, k). Queries are driven from the TRUTH side: a
    query the ranking never returned scores 0, a query absent from
    truth is not scored at all (it has no defined relevant set)."""
    r = _topk(ranking, k, query_col, doc_col, score_col)
    t = _topk(
        truth,
        k,
        query_col,
        truth_doc_col or doc_col,
        truth_score_col or score_col,
    )
    tset = t.groupBy("_q").agg(F.collect_set("_doc").alias("_relevant"))

    hit = F.array_contains(F.col("_relevant"), F.col("_doc"))
    joined = tset.join(r, "_q", "left").select(
        "_q",
        F.size("_relevant").alias("_n_rel"),
        F.when(F.col("_doc").isNotNull() & hit, F.col("_rank")).alias(
            "_hit_rank"
        ),
    )
    return (
        joined.groupBy("_q")
        .agg(
            F.first("_n_rel").alias("n_relevant"),
            F.count("_hit_rank").alias("n_hits"),
            F.min("_hit_rank").alias("_first_hit"),
        )
        .select(
            F.col("_q").alias(query_col),
            "n_relevant",
            "n_hits",
            (F.col("n_hits") / F.col("n_relevant")).alias("recall_at_k"),
            F.coalesce(
                F.lit(1.0) / F.col("_first_hit"), F.lit(0.0)
            ).alias("reciprocal_rank"),
            F.lit(int(k)).alias("k"),
        )
    )


def ranking_quality_summary(
    ranking: DataFrame,
    truth: DataFrame,
    k: int,
    query_col: str = "query_id",
    doc_col: str = "neighbor_id",
    score_col: str = "cos",
    truth_doc_col: str | None = None,
    truth_score_col: str | None = None,
) -> DataFrame:
    """One row: (n_queries, recall_at_k, mrr, k) — means over the
    per-query table (macro-averaged, the standard convention)."""
    pq = ranking_quality(
        ranking,
        truth,
        k,
        query_col,
        doc_col,
        score_col,
        truth_doc_col,
        truth_score_col,
    )
    return pq.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.avg("recall_at_k").alias("recall_at_k"),
        F.avg("reciprocal_rank").alias("mrr"),
        F.first(F.lit(int(k))).alias("k"),
    )
