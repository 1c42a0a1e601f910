"""Similarity-search queries over the driver `embeddings` table.

The cosine kernel is identical Catalyst double math on both sides of the
oracle (explicit zip/transform dot products, no engine-builtin cosine),
so values match to rounding. LSH ANN is rows-only for the driver; its
recall vs brute force is pinned in tests/test_similarity.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fluent_server_spark.operators.similarity import (
    brute_force_topk,
    cosine_neardup_lsh,
    cosine_neardup_pairs,
    l2_norm,
    lsh_topk,
)
from fluent_server_spark.queries import QuerySpec, load_table

NEARDUP_THRESHOLD = 0.4  # driver embeddings are near-orthogonal (max ~0.51)
TOPK_K = 5
N_QUERY_VECS = 8
EMB_DIM = 64

_DOT = (
    "list_sum(list_transform(list_zip({a}, {b}), x -> x[1] * x[2]))"
)
_NORM = "sqrt(list_sum(list_transform({a}, x -> x * x)))"


def q_embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cosine_neardup_pairs(
        load_table(spark, sf_dir, "embeddings"), threshold=NEARDUP_THRESHOLD
    )


SQL_EMBEDDING_NEARDUP_PAIRS = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
p AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         {_DOT.format(a='a.v', b='b.v')}
         / ({_NORM.format(a='a.v')} * {_NORM.format(a='b.v')}) AS cos
  FROM e a JOIN e b ON a.vec_id < b.vec_id
)
SELECT a_id, b_id, round(cos, 6) AS cos FROM p WHERE cos >= {NEARDUP_THRESHOLD}
"""


def q_ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    return brute_force_topk(queries, emb, k=TOPK_K)


SQL_ANN_TOPK_BRUTEFORCE = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_DOT.format(a='q.v', b='c.v')}
         / ({_NORM.format(a='q.v')} * {_NORM.format(a='c.v')}) AS cos
  FROM e q JOIN e c ON q.vec_id != c.vec_id
  WHERE q.vec_id < {N_QUERY_VECS}
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id) AS rk
  FROM scored
)
SELECT query_id, rk, neighbor_id, round(cos, 6) AS cos
FROM ranked WHERE rk <= {TOPK_K}
"""


def q_ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via random-hyperplane buckets (scale path)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    return lsh_topk(queries, emb, dim=EMB_DIM, k=TOPK_K, n_planes=6)


def q_ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (k-means inverted lists, nprobe cells per query) — the
    other scale path beside hyperplane LSH; recall pinned in test_ivf
    (rows-only for the driver: approximate by design)."""
    from fluent_server_spark.operators.ivf import ivf_topk, train_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    centroids = train_centroids(emb, k=8, dim=EMB_DIM)
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    return ivf_topk(queries, emb, centroids, k=TOPK_K, nprobe=3)


def q_label_centroid_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding stats: count + avg L2 norm (agg over vectors)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(F.avg(l2_norm(F.col("embedding"))), 6).alias("avg_norm"),
    )


SQL_LABEL_CENTROID_STATS = f"""
SELECT label, count(*) AS n_vecs,
       round(avg({_NORM.format(a='embedding::DOUBLE[]')}), 6) AS avg_norm
FROM embeddings GROUP BY label
"""


QUERIES: dict[str, QuerySpec] = {
    "embedding_neardup_pairs": QuerySpec(
        q_embedding_neardup_pairs, SQL_EMBEDDING_NEARDUP_PAIRS
    ),
    "ann_topk_bruteforce": QuerySpec(q_ann_topk_bruteforce, SQL_ANN_TOPK_BRUTEFORCE),
    "ann_topk_lsh": QuerySpec(q_ann_topk_lsh, None),
    "ann_topk_ivf": QuerySpec(q_ann_topk_ivf, None),
    "embedding_neardup_lsh": QuerySpec(
        lambda spark, sf_dir: cosine_neardup_lsh(
            load_table(spark, sf_dir, "embeddings"),
            dim=EMB_DIM,
            threshold=NEARDUP_THRESHOLD,
            n_planes=4,
            n_tables=8,
        ),
        None,  # recall-approximate at this low threshold; pinned in pytest
    ),
    "label_centroid_stats": QuerySpec(q_label_centroid_stats, SQL_LABEL_CENTROID_STATS),
}
