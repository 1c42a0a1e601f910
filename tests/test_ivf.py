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


# --------------------------------------------- persisted IVF index

from fluent_server_spark.operators.ivf import (  # noqa: E402
    append_to_ivf_index,
    ivf_topk_from_index,
    read_ivf_manifest,
    write_ivf_index,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_index_probe_bit_equal_to_inline(spark, vec_df, centroids, tmp_path):
    path = str(tmp_path / "ivf")
    write_ivf_index(vec_df, path, centroids)
    queries = vec_df.filter(F.col("vec_id") < 8)
    inline = _rows(ivf_topk(queries, vec_df, centroids, k=4, nprobe=2))
    stored = _rows(ivf_topk_from_index(spark, path, queries, k=4, nprobe=2))
    assert stored == inline and len(stored) > 0
    man = read_ivf_manifest(path)
    assert man["k"] == K_CELLS and man["dim"] == DIM


def test_index_probe_prunes_partitions(spark, vec_df, centroids, tmp_path):
    path = str(tmp_path / "ivf")
    write_ivf_index(vec_df, path, centroids)
    queries = vec_df.filter(F.col("vec_id") < 3)
    out = ivf_topk_from_index(spark, path, queries, k=3, nprobe=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the probed-cell literal filter must reach the scan as a PARTITION
    # filter (the whole point of the cell-partitioned layout)
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters", 1)[1][:120]
    assert "cell" in seg, seg


def test_append_epochs_and_idempotent_replay(spark, vec_df, centroids, tmp_path):
    path = str(tmp_path / "ivf")
    base = vec_df.filter(F.col("vec_id") < 80)
    batch = vec_df.filter(F.col("vec_id") >= 80)
    write_ivf_index(base, path, centroids)
    append_to_ivf_index(batch, path, epoch=0)
    # query from BOTH the base clusters and the appended clusters, so
    # the equality is non-vacuous on each side of the epoch boundary
    queries = vec_df.filter(
        (F.col("vec_id") < 3) | (F.col("vec_id").between(100, 102))
    )
    want = _rows(ivf_topk(queries, vec_df, centroids, k=4, nprobe=2))
    got = _rows(ivf_topk_from_index(spark, path, queries, k=4, nprobe=2))
    assert got == want
    # crashed-and-replayed epoch: whole-epoch overwrite, identical result
    append_to_ivf_index(batch, path, epoch=0)
    assert _rows(ivf_topk_from_index(spark, path, queries, k=4, nprobe=2)) == want
    # results must include appended vectors (non-vacuous)
    assert any(nb >= 80 for (_q, _rk, nb, _c) in want)


def test_index_rejects_dim_mismatch(spark, vec_df, centroids, tmp_path):
    path = str(tmp_path / "ivf")
    write_ivf_index(vec_df, path, centroids)
    bad = spark.createDataFrame(
        [(200, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="dimension"):
        append_to_ivf_index(bad, path, epoch=1)
    with pytest.raises(ValueError, match="dimension"):
        write_ivf_index(bad, str(tmp_path / "ivf2"), centroids)


def test_compact_folds_increments_bit_equal(spark, vec_df, centroids, tmp_path):
    """Compaction folds every increment into base, removes the epoch
    dirs, and leaves probe results bit-identical; a second compact is a
    no-op; a simulated crash (marker written, dirs left) double-counts
    nothing and is finished by the next compact call."""
    import json
    import os

    from fluent_server_spark.operators.ivf import (
        compact_ivf_index,
        read_ivf_vectors,
    )

    path = str(tmp_path / "ivf")
    write_ivf_index(vec_df.filter(F.col("vec_id") < 60), path, centroids)
    append_to_ivf_index(vec_df.filter(F.col("vec_id").between(60, 89)), path, epoch=0)
    append_to_ivf_index(vec_df.filter(F.col("vec_id") >= 90), path, epoch=1)
    queries = vec_df.filter(
        (F.col("vec_id") < 3) | (F.col("vec_id").between(100, 102))
    )
    before = _rows(ivf_topk_from_index(spark, path, queries, k=4, nprobe=2))

    assert compact_ivf_index(spark, path) == 2
    assert not os.path.exists(f"{path}/increments/epoch=0")
    assert _rows(ivf_topk_from_index(spark, path, queries, k=4, nprobe=2)) == before
    assert compact_ivf_index(spark, path) == 0  # idempotent no-op

    # crash in the CLEANUP phase: base.json already committed (pointer
    # flipped, epoch in the folded list) but the epoch dir survived
    append_to_ivf_index(vec_df.filter(F.col("vec_id") >= 90), path, epoch=7)
    n_before = read_ivf_vectors(spark, path).count()
    assert compact_ivf_index(spark, path) == 1
    with open(f"{path}/base.json") as f:
        state = json.load(f)
    assert state["folded"] == []  # cleanup completed -> list cleared
    # simulate the crash state: recreate the folded dir and re-point
    # base.json at the same base with epoch=7 marked folded
    append_to_ivf_index(vec_df.filter(F.col("vec_id") >= 90), path, epoch=7)
    with open(f"{path}/base.json", "w") as f:
        json.dump({"dir": state["dir"], "folded": ["epoch=7"]}, f)
    # folded epoch is skipped by reads (no double count)...
    assert read_ivf_vectors(spark, path).count() == n_before
    # ...and the next compact finishes the cleanup
    assert compact_ivf_index(spark, path) == 0
    assert not os.path.exists(f"{path}/increments/epoch=7")
    with open(f"{path}/base.json") as f:
        assert json.load(f)["folded"] == []
    # a crashed STAGING write (orphan new-base dir, pointer not flipped)
    # is collected without touching results (baseline re-taken here:
    # the epoch=7 appends above legitimately duplicated ids >= 90)
    now = _rows(ivf_topk_from_index(spark, path, queries, k=4, nprobe=2))
    os.makedirs(f"{path}/vectors_v99")
    assert compact_ivf_index(spark, path) == 0
    assert not os.path.exists(f"{path}/vectors_v99")
    assert _rows(ivf_topk_from_index(spark, path, queries, k=4, nprobe=2)) == now


def test_compact_retain_old_base_defers_gc(spark, vec_df, centroids, tmp_path):
    """ADVICE r5: retain_old_base=True keeps the superseded base and
    folded epoch dirs on disk after the pointer flip (a full
    compaction interval of reader retention); reads are correct around
    them, and the NEXT compaction's cleanup collects them."""
    import glob
    import os

    from fluent_server_spark.operators.ivf import (
        append_to_ivf_index,
        compact_ivf_index,
        ivf_topk_from_index,
        read_ivf_vectors,
        write_ivf_index,
    )

    path = str(tmp_path / "ivf")
    write_ivf_index(vec_df.filter(F.col("vec_id") < 60), path, centroids)
    append_to_ivf_index(vec_df.filter(F.col("vec_id") >= 60), path, epoch=0)
    n = read_ivf_vectors(spark, path).count()
    queries = vec_df.filter(F.col("vec_id") < 3)
    before = _rows(ivf_topk_from_index(spark, path, queries, k=4, nprobe=2))

    assert compact_ivf_index(spark, path, retain_old_base=True) == 1
    # superseded dirs retained for in-flight readers...
    assert os.path.isdir(f"{path}/increments/epoch=0")
    assert len(glob.glob(f"{path}/vectors*")) == 2
    # ...and reads are already on the new base, folded epoch skipped
    assert read_ivf_vectors(spark, path).count() == n
    assert _rows(ivf_topk_from_index(spark, path, queries, k=4, nprobe=2)) == before

    # the next compaction's cleanup phase collects the retained dirs
    assert compact_ivf_index(spark, path) == 0
    assert not os.path.exists(f"{path}/increments/epoch=0")
    assert len(glob.glob(f"{path}/vectors*")) == 1
    assert _rows(ivf_topk_from_index(spark, path, queries, k=4, nprobe=2)) == before


def test_sq8_append_rejects_nan(spark, vec_df, centroids, tmp_path):
    """ADVICE r5: the BUILD path rejects NaN loudly but quantize_expr
    silently encodes NaN as code 255 — an sq8 APPEND batch with NaN
    must now fail the same loud way instead of corrupting stored codes."""
    import math

    from fluent_server_spark.operators.ivf import write_ivf_index

    path = str(tmp_path / "ivf_sq8")
    dim = len(centroids[0])
    write_ivf_index(
        vec_df.filter(F.col("vec_id") < 80), path, centroids, sq8=True
    )
    bad = spark.createDataFrame(
        [(500, [math.nan] + [0.0] * (dim - 1))],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="NaN"):
        append_to_ivf_index(bad, path, epoch=3)
    # a clean batch still appends fine
    append_to_ivf_index(vec_df.filter(F.col("vec_id") >= 80), path, epoch=3)
