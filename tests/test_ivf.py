"""IVF ANN: training converges, assignment is narrow, search recall vs
the brute-force baseline, and nprobe=k degenerates to exact."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fluent_server_spark.operators.ivf import assign_cells, ivf_topk, train_centroids
from fluent_server_spark.operators.similarity import brute_force_topk

DIM = 16
K_CELLS = 6


@pytest.fixture(scope="module")
def centroids(vec_df):
    return train_centroids(vec_df, k=K_CELLS, dim=DIM, n_iter=10)


def test_training_shape(centroids):
    assert len(centroids) == K_CELLS
    assert all(len(c) == DIM for c in centroids)


def test_assign_is_narrow_and_total(spark, vec_df, centroids):
    assigned = assign_cells(vec_df, centroids)
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan
    pdf = assigned.toPandas()
    assert pdf.cell.between(0, K_CELLS - 1).all()
    # clustered fixture (6 clusters) -> every cell non-trivially used
    assert pdf.cell.nunique() >= K_CELLS - 1


def test_ivf_recall(spark, vec_df, centroids):
    queries = vec_df.filter(F.col("vec_id") < 10)
    exact = {(r.query_id, r.neighbor_id) for r in brute_force_topk(queries, vec_df, k=5).collect()}
    approx = {(r.query_id, r.neighbor_id) for r in ivf_topk(queries, vec_df, centroids, k=5, nprobe=2).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"IVF recall too low: {recall}"


def test_nprobe_full_is_exact(spark, vec_df, centroids):
    queries = vec_df.filter(F.col("vec_id") < 5)
    exact = sorted(
        (r.query_id, r.rk, r.neighbor_id)
        for r in brute_force_topk(queries, vec_df, k=3).collect()
    )
    full = sorted(
        (r.query_id, r.rk, r.neighbor_id)
        for r in ivf_topk(queries, vec_df, centroids, k=3, nprobe=K_CELLS).collect()
    )
    assert full == exact
