"""IVF (inverted-file) approximate nearest neighbor — the k-means-bucket
counterpart to the hyperplane LSH in operators/similarity.py.

Shape (mirrors FAISS IVF-Flat, public knowledge):
1. TRAIN: k-means over a sample — Lloyd's iterations expressed as
   DataFrame ops. Centroids are tiny (k x dim); each iteration is one
   broadcast-join assignment + one groupBy mean. The full corpus is never
   shuffled by the training loop (it trains on a driver-bounded sample).
2. INDEX: assign every vector to its nearest centroid (one broadcast
   join, narrow) — `cell` is the inverted-list key; at rest this is the
   partition column of the vector table.
3. SEARCH: probe the `nprobe` nearest cells per query (broadcast the
   query set), score only vectors in probed cells via an equi-join on
   cell, exact cosine on the survivors, window top-k.

Recall/cost dial: nprobe=k is exact (degenerates to brute force);
nprobe=1 scans ~N/k of the corpus per query.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from fluent_server_spark.operators.similarity import cosine


def _sq_dist(a: Column, b: Column) -> Column:
    d = F.zip_with(a, b, lambda x, y: x.cast("double") - y.cast("double"))
    return F.aggregate(d, F.lit(0.0), lambda acc, x: acc + x * x)


def train_centroids(
    vectors: DataFrame,
    k: int,
    dim: int,
    n_iter: int = 8,
    sample_rows: int = 10_000,
    seed: int = 13,
    vec_col: str = "embedding",
    total_rows: int | None = None,
) -> list[list[float]]:
    """Lloyd's k-means on a bounded sample; returns centroid literals.

    Sampling is deterministic and the sample is small enough to iterate
    cheaply; at 10^12 rows you train on ~10^5-10^6 sampled rows, which is
    the standard IVF recipe. Pass `total_rows` (usually known from table
    metadata) to fraction-sample uniformly across the corpus; without it
    the trainer takes a LIMIT — a pushed-down, early-terminating scan —
    rather than paying a full count() job just to derive a fraction."""
    src = vectors.select(vec_col)
    if total_rows is not None:
        frac = min(1.0, (2.0 * sample_rows) / max(total_rows, 1))
        src = src.sample(fraction=frac, seed=seed)
    sample = np.array(
        src.limit(sample_rows).toPandas()[vec_col].tolist(),
        dtype=np.float64,
    )
    rng = np.random.RandomState(seed)
    cent = sample[rng.choice(len(sample), size=min(k, len(sample)), replace=False)]
    for _ in range(n_iter):
        d2 = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for j in range(len(cent)):
            members = sample[assign == j]
            if len(members):
                cent[j] = members.mean(axis=0)
    return [[float(x) for x in c] for c in cent]


def _centroid_df(spark, centroids: list[list[float]]) -> DataFrame:
    return spark.createDataFrame(
        [(i, c) for i, c in enumerate(centroids)],
        "cell int, centroid array<double>",
    )


def assign_cells(
    vectors: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    out: str = "cell",
) -> DataFrame:
    """Nearest-centroid assignment as a PURE NARROW expression: the
    centroids ride the plan as literals, the argmin is
    array_position(d2s, min(d2s)) — no join, no shuffle, no window.
    Ties break to the lowest cell (first position)."""
    cents = F.array(
        *[F.array(*[F.lit(x) for x in c]) for c in centroids]
    )
    d2s = F.transform(
        cents, lambda c: _sq_dist(F.col(vec_col).cast("array<double>"), c)
    )
    cell = (F.array_position(d2s, F.array_min(d2s)) - 1).cast("int")
    return vectors.withColumn(out, cell)


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: list[list[float]],
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search: probe the nprobe nearest cells per query, exact cosine
    within probed cells, top-k per query."""
    spark = queries.sparkSession
    cent = _centroid_df(spark, centroids)

    indexed = assign_cells(corpus, centroids, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"), "cell"
    )
    # nprobe nearest cells per query (query set is the broadcast side)
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    qc = (
        F.broadcast(q)
        .crossJoin(F.broadcast(cent))
        .withColumn("_d2", _sq_dist(F.col("q_vec"), F.col("centroid")))
    )
    wq = Window.partitionBy("query_id").orderBy("_d2", "cell")
    probes = (
        qc.withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", "q_vec", "cell")
    )
    scored = (
        probes.join(indexed, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cosine(F.col("q_vec"), F.col("c_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "rk", "neighbor_id", F.round("cos", 6).alias("cos"))
    )
