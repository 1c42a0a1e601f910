"""Similarity-search queries over the driver `embeddings` table.

The cosine kernel is identical Catalyst double math on both sides of the
oracle (explicit zip/transform dot products, no engine-builtin cosine),
so values match to rounding. The LSH/IVF approximate paths are oracled
HARD as well: their hyperplanes/centroids are deterministic literals, so
the generated SQL replays the identical bucketing + probing + scoring in
DuckDB — approximate-vs-exact recall is additionally pinned in
tests/test_similarity.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fluent_server_spark.operators.similarity import (
    _hyperplanes,
    brute_force_topk,
    cosine_neardup_lsh,
    cosine_neardup_pairs,
    l2_norm,
    lsh_topk,
)
from fluent_server_spark.queries import QuerySpec, load_table, spread

NEARDUP_THRESHOLD = 0.4  # driver embeddings are near-orthogonal (max ~0.51)
TOPK_K = 5
N_QUERY_VECS = 8
EMB_DIM = 64

_DOT = (
    "list_sum(list_transform(list_zip({a}, {b}), x -> x[1] * x[2]))"
)
_NORM = "sqrt(list_sum(list_transform({a}, x -> x * x)))"


def _sql_plane(plane: list[float]) -> str:
    # repr() round-trips doubles exactly; DuckDB parses back the same bits
    return "[" + ", ".join(repr(x) for x in plane) + "]"


def _sql_bucket(vcol: str, planes: list[list[float]]) -> str:
    """The H-bit hyperplane bucket of with_lsh_bucket, as DuckDB SQL over
    the same plane literals — bit b set iff dot(v, plane_b) > 0."""
    bits = [
        f"(CASE WHEN {_DOT.format(a=vcol, b=_sql_plane(p))} > 0"
        f" THEN {1 << bit} ELSE 0 END)"
        for bit, p in enumerate(planes)
    ]
    return "(" + " + ".join(bits) + ")"


EXACT_PAIRS_ANCHOR = 500  # deterministic cap: the exact O(n^2) baseline
# is BOUNDED BY CONSTRUCTION — at any sf the cross join sees at most
# 500 vectors (pushed into the scan), so no unbounded CartesianProduct
# is reachable from queries(). The unbounded scale path is
# embedding_neardup_lsh; exact-vs-LSH recall parity over this same
# anchor slice is pinned in tests/test_similarity.py.


def q_embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < EXACT_PAIRS_ANCHOR
    )
    return cosine_neardup_pairs(emb, threshold=NEARDUP_THRESHOLD)


SQL_EMBEDDING_NEARDUP_PAIRS = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
           WHERE vec_id < {EXACT_PAIRS_ANCHOR}),
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


LSH_TOPK_PLANES = 6
LSH_TOPK_SEED = 42


def q_ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via random-hyperplane buckets (scale path)."""
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    return lsh_topk(
        queries, emb, dim=EMB_DIM, k=TOPK_K, n_planes=LSH_TOPK_PLANES,
        seed=LSH_TOPK_SEED,
    )


def _sql_ann_topk_lsh() -> str:
    planes = _hyperplanes(EMB_DIM, LSH_TOPK_PLANES, LSH_TOPK_SEED)
    bucket = _sql_bucket("v", planes)
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
b AS (SELECT vec_id, v, {bucket} AS bucket FROM e),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_DOT.format(a='q.v', b='c.v')}
         / ({_NORM.format(a='q.v')} * {_NORM.format(a='c.v')}) AS cos
  FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id != c.vec_id
  WHERE q.vec_id < {N_QUERY_VECS}),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id) AS rk
  FROM scored)
SELECT query_id, rk, neighbor_id, round(cos, 6) AS cos
FROM ranked WHERE rk <= {TOPK_K}
"""


SQL_ANN_TOPK_LSH = _sql_ann_topk_lsh()

IVF_K = 8
IVF_SEED_LO = 100  # vec_ids [100, 108) are the deterministic seed centroids
IVF_NPROBE = 3


def q_ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (inverted lists, nprobe cells per query) — the other scale
    path beside hyperplane LSH. The driver variant uses DETERMINISTIC
    seed centroids (the embeddings of vec_ids 100..107) instead of
    k-means so the DuckDB oracle can replay the identical index: the
    'train' step is a bounded 8-row collect (the standard IVF recipe
    trains on a tiny sample either way; the k-means trainer remains in
    operators/ivf.py with its recall pinned in tests/test_ivf.py)."""
    from fluent_server_spark.operators.ivf import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    seeds = (
        emb.filter(F.col("vec_id").between(IVF_SEED_LO, IVF_SEED_LO + IVF_K - 1))
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    )
    centroids = [[float(x) for x in r["embedding"]] for r in seeds]
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    return ivf_topk(queries, emb, centroids, k=TOPK_K, nprobe=IVF_NPROBE)


_SQDIST = "list_sum(list_transform(list_zip({a}, {b}), x -> (x[1] - x[2]) * (x[1] - x[2])))"

SQL_ANN_TOPK_IVF = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cent AS (SELECT CAST(vec_id - {IVF_SEED_LO} AS INTEGER) AS cell, v AS cv
         FROM e WHERE vec_id BETWEEN {IVF_SEED_LO} AND {IVF_SEED_LO + IVF_K - 1}),
d AS (
  SELECT e.vec_id, e.v, c.cell,
         {_SQDIST.format(a='e.v', b='c.cv')} AS d2
  FROM e, cent c),
assigned AS (
  SELECT vec_id, v, cell FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
    FROM d) WHERE rn = 1),
probes AS (
  SELECT vec_id AS query_id, v AS qv, cell FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
    FROM d WHERE vec_id < {N_QUERY_VECS}) WHERE rn <= {IVF_NPROBE}),
scored AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         {_DOT.format(a='p.qv', b='a.v')}
         / ({_NORM.format(a='p.qv')} * {_NORM.format(a='a.v')}) AS cos
  FROM probes p JOIN assigned a ON p.cell = a.cell AND p.query_id != a.vec_id),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id) AS rk
  FROM scored)
SELECT query_id, rk, neighbor_id, round(cos, 6) AS cos
FROM ranked WHERE rk <= {TOPK_K}
"""


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


NEARDUP_LSH_PLANES = 4
NEARDUP_LSH_TABLES = 8
NEARDUP_LSH_SEED = 42


def q_embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup at scale: multi-table hyperplane LSH candidates
    + exact cosine verify — the benched headline (the O(n^2) exact
    cross join survives only as the sf0.01 oracle anchor)."""
    return cosine_neardup_lsh(
        spread(load_table(spark, sf_dir, "embeddings")),
        dim=EMB_DIM,
        threshold=NEARDUP_THRESHOLD,
        n_planes=NEARDUP_LSH_PLANES,
        n_tables=NEARDUP_LSH_TABLES,
        seed=NEARDUP_LSH_SEED,
    )


def _sql_embedding_neardup_lsh() -> str:
    buckets = [
        _sql_bucket(
            "v",
            _hyperplanes(
                EMB_DIM, NEARDUP_LSH_PLANES, NEARDUP_LSH_SEED + 1000 * t
            ),
        )
        for t in range(NEARDUP_LSH_TABLES)
    ]
    bcols = ",\n       ".join(f"{b} AS b{t}" for t, b in enumerate(buckets))
    any_table = " OR ".join(
        f"a.b{t} = b2.b{t}" for t in range(NEARDUP_LSH_TABLES)
    )
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
b AS (SELECT vec_id, v,
       {bcols}
      FROM e),
cand AS (
  SELECT a.vec_id AS a_id, b2.vec_id AS b_id,
         {_DOT.format(a='a.v', b='b2.v')}
         / ({_NORM.format(a='a.v')} * {_NORM.format(a='b2.v')}) AS cos
  FROM b a JOIN b b2
    ON a.vec_id < b2.vec_id AND ({any_table}))
SELECT a_id, b_id, round(cos, 6) AS cos
FROM cand WHERE cos >= {NEARDUP_THRESHOLD}
"""


SQL_EMBEDDING_NEARDUP_LSH = _sql_embedding_neardup_lsh()


SEMDEDUP_K = 8
SEMDEDUP_SEED_LO = 200  # vec_ids [200, 208) are the deterministic seed centroids
SEMDEDUP_EPS = 0.35


def q_semdedup_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (operators/semdedup.py): k-means cells bound the
    within-cluster cosine pruning. Same driver recipe as ann_topk_ivf —
    DETERMINISTIC seed rows as centroids (a bounded 8-row collect) so
    the DuckDB oracle replays the identical cell index; the real
    bounded-sample k-means trainer stays in operators/ivf.py with its
    recall pinned in tests. Output: one row per vector with its cell,
    canonical keep-rank, and the semantic-duplicate flag."""
    from fluent_server_spark.operators.semdedup import semdedup

    emb = load_table(spark, sf_dir, "embeddings")
    seeds = (
        emb.filter(
            F.col("vec_id").between(SEMDEDUP_SEED_LO, SEMDEDUP_SEED_LO + SEMDEDUP_K - 1)
        )
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    )
    centroids = [[float(x) for x in r["embedding"]] for r in seeds]
    return semdedup(emb, centroids, eps=SEMDEDUP_EPS)


SQL_SEMDEDUP_DROP = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cent AS (SELECT CAST(vec_id - {SEMDEDUP_SEED_LO} AS INTEGER) AS cell, v AS cv
         FROM e WHERE vec_id BETWEEN {SEMDEDUP_SEED_LO}
                               AND {SEMDEDUP_SEED_LO + SEMDEDUP_K - 1}),
d AS (
  SELECT e.vec_id, e.v, c.cell,
         {_SQDIST.format(a='e.v', b='c.cv')} AS d2
  FROM e, cent c),
assigned AS (
  SELECT vec_id, v, cell, d2 FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
    FROM d) WHERE rn = 1),
ranked AS (
  -- normalize-then-dot, SAME float ops as the Spark side (which unit-
  -- normalizes once per row so each pair costs a single dot fold):
  -- el / sqrt(sum(squares)) per element, then sum of products
  SELECT vec_id, cell,
         list_transform(v, el -> el / {_NORM.format(a='v')}) AS nv,
         row_number() OVER (PARTITION BY cell
                            ORDER BY d2 DESC, vec_id) AS cell_rank
  FROM assigned),
dropped AS (
  SELECT DISTINCT b.vec_id FROM ranked a JOIN ranked b
    ON a.cell = b.cell AND a.cell_rank < b.cell_rank
   AND {_DOT.format(a='a.nv', b='b.nv')} >= {SEMDEDUP_EPS})
SELECT r.vec_id, r.cell, r.cell_rank,
       (dr.vec_id IS NOT NULL) AS is_semdup
FROM ranked r LEFT JOIN dropped dr ON r.vec_id = dr.vec_id
"""


QUERIES: dict[str, QuerySpec] = {
    "embedding_neardup_pairs": QuerySpec(
        q_embedding_neardup_pairs, SQL_EMBEDDING_NEARDUP_PAIRS
    ),
    "ann_topk_bruteforce": QuerySpec(q_ann_topk_bruteforce, SQL_ANN_TOPK_BRUTEFORCE),
    "ann_topk_lsh": QuerySpec(q_ann_topk_lsh, SQL_ANN_TOPK_LSH),
    "ann_topk_ivf": QuerySpec(q_ann_topk_ivf, SQL_ANN_TOPK_IVF),
    "embedding_neardup_lsh": QuerySpec(
        q_embedding_neardup_lsh, SQL_EMBEDDING_NEARDUP_LSH
    ),
    "label_centroid_stats": QuerySpec(q_label_centroid_stats, SQL_LABEL_CENTROID_STATS),
    # r5: registered out of the slots freed by the doc_profile merge
    "semdedup_drop": QuerySpec(q_semdedup_drop, SQL_SEMDEDUP_DROP),
}
