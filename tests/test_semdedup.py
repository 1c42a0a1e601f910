"""SemDeDup (operators/semdedup.py) vs a pure-Python reference of the
same published semantics: cells bound the quadratic, exists-earlier
drop rule, farthest-from-centroid keep order."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from fluent_server_spark.operators.ivf import train_centroids
from fluent_server_spark.operators.semdedup import (
    semdedup,
    semdedup_keep,
    with_cell_and_dist,
)


def _py_semdedup(pts: np.ndarray, cents: np.ndarray, eps: float):
    """Reference: same cell assignment, same (d2 desc, id) order, same
    exists-earlier-ranked drop rule, plain numpy."""
    d2 = ((pts[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    cell = d2.argmin(axis=1)
    own = d2.min(axis=1)
    dropped = set()
    for c in np.unique(cell):
        ids = np.where(cell == c)[0]
        order = sorted(ids, key=lambda i: (-own[i], i))
        for pos, i in enumerate(order):
            for j in order[pos + 1 :]:
                cos = pts[i].dot(pts[j]) / (
                    np.linalg.norm(pts[i]) * np.linalg.norm(pts[j])
                )
                if cos >= eps:
                    dropped.add(j)
    return cell, dropped


@pytest.fixture(scope="module")
def clustered(spark):
    """3 tight clusters + a few singletons: within-cluster cosines are
    high (same-direction noise), cross-cluster low."""
    rng = np.random.RandomState(11)
    centers = rng.randn(3, 8) * 5
    pts = np.vstack(
        [c + rng.randn(12, 8) * 0.3 for c in centers]
        + [rng.randn(4, 8) * 6]  # scattered singletons
    )
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(pts)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    return pts, df


def test_matches_python_reference(spark, clustered):
    pts, df = clustered
    cents_ll = train_centroids(df, k=4, dim=8, seed=3)
    cents = np.array(cents_ll)
    exp_cell, exp_dropped = _py_semdedup(pts, cents, eps=0.9)

    got = semdedup(df, cents_ll, eps=0.9).orderBy("vec_id").collect()
    assert len(got) == len(pts)
    for r in got:
        assert r["cell"] == exp_cell[r["vec_id"]], r
        assert r["is_semdup"] == (r["vec_id"] in exp_dropped), r


def test_rank1_never_dropped_and_keep_is_complement(spark, clustered):
    pts, df = clustered
    cents = train_centroids(df, k=4, dim=8, seed=3)
    flags = semdedup(df, cents, eps=0.9).collect()
    for r in flags:
        if r["cell_rank"] == 1:
            assert not r["is_semdup"]
    kept = semdedup_keep(df, cents, eps=0.9)
    n_dropped = sum(1 for r in flags if r["is_semdup"])
    assert kept.count() == len(pts) - n_dropped


def test_eps_monotone(spark, clustered):
    """Lower eps -> (weakly) more duplicates flagged."""
    pts, df = clustered
    cents = train_centroids(df, k=4, dim=8, seed=3)
    drops = {
        eps: semdedup(df, cents, eps).filter("is_semdup").count()
        for eps in (0.5, 0.9, 0.999)
    }
    assert drops[0.5] >= drops[0.9] >= drops[0.999]
    # tight clusters with same-direction noise: eps=0.9 must fire
    assert drops[0.9] > 0


def test_eps_above_all_sims_drops_nothing(spark, clustered):
    pts, df = clustered
    cents = train_centroids(df, k=4, dim=8, seed=3)
    assert semdedup(df, cents, eps=1.0000001).filter("is_semdup").count() == 0


def test_cell_assignment_ties_and_guard(spark):
    # two identical centroids: tie must break to the LOWER cell
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.1])], "vec_id int, embedding array<double>"
    )
    cents = [[1.0, 0.0], [1.0, 0.0]]
    cells = {r["vec_id"]: r["cell"] for r in with_cell_and_dist(df, cents).collect()}
    assert cells == {0: 0, 1: 0}

    with pytest.raises(ValueError, match="max_cell_pairs"):
        semdedup(df, cents, eps=0.5, max_cell_pairs=0)


def test_exists_earlier_can_exceed_greedy_but_never_misses(spark):
    """A -0.05-apart chain a~b, b~c, a!~c: greedy keeps {a, c}; the
    exists-earlier rule may drop both b and c (documented safe-side
    difference). What it must NEVER do is keep two docs within eps of
    each other where one ranks first in the cell."""
    import numpy as np

    # chain along a slight arc, one cluster
    def unit(theta):
        return [float(np.cos(theta)), float(np.sin(theta)), 0.0]

    rows = [(0, unit(0.0)), (1, unit(0.5)), (2, unit(1.0))]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    cents = [[1.0, 0.2, 0.0]]
    eps = float(np.cos(0.6))  # a~b, b~c in range; a-c (1.0 rad) out
    flags = {r["vec_id"]: r for r in semdedup(df, cents, eps).collect()}
    first = min(flags.values(), key=lambda r: r["cell_rank"])
    # everything within eps of the rank-1 doc must be flagged
    pts = {i: np.array(v) for i, v in rows}
    for i, r in flags.items():
        if i == first["vec_id"]:
            continue
        cos = pts[i].dot(pts[first["vec_id"]])
        if cos >= eps:
            assert r["is_semdup"], (i, cos)


def test_semdedup_against_corpus_wins(spark, clustered):
    """Incremental path: a new vector near a corpus vector (same cell)
    is flagged; a new vector in an empty region is not; and within-batch
    twins are NOT decided here (documented composition)."""
    import numpy as np

    from fluent_server_spark.operators.semdedup import semdedup_against

    pts, df = clustered
    cents = train_centroids(df, k=4, dim=8, seed=3)
    # batch: a near-copy of corpus point 0, a far-away novel point, and
    # two mutual twins that are both novel vs the corpus
    novel = np.full(8, 9.0)
    twin = -novel + np.random.RandomState(5).randn(8) * 0.01
    batch_rows = [
        (1000, [float(x) for x in pts[0] * 1.001]),
        (1001, [float(x) for x in novel]),
        (1002, [float(x) for x in twin]),
        (1003, [float(x) for x in twin * 1.001]),
    ]
    batch = spark.createDataFrame(batch_rows, "vec_id int, embedding array<double>")
    got = {r["vec_id"]: r["is_semdup"] for r in
           semdedup_against(batch, df, cents, eps=0.95).collect()}
    assert got[1000] is True      # duplicates corpus point 0
    assert got[1001] is False     # novel direction
    assert got[1002] is False and got[1003] is False  # within-batch only
    # the documented two-step catches the within-batch twins
    flags = semdedup(batch, cents, eps=0.95)
    assert flags.filter("is_semdup").count() >= 1


def test_semdedup_empty_and_single_input(spark):
    cents = [[1.0, 0.0], [0.0, 1.0]]
    empty = spark.createDataFrame([], "vec_id int, embedding array<double>")
    assert semdedup(empty, cents, eps=0.5).count() == 0
    one = spark.createDataFrame(
        [(7, [1.0, 0.5])], "vec_id int, embedding array<double>"
    )
    rows = semdedup(one, cents, eps=0.5).collect()
    assert len(rows) == 1 and not rows[0]["is_semdup"] and rows[0]["cell_rank"] == 1


def test_semantic_decontamination_wrapper(spark, clustered):
    """decontaminate_semantic == semdedup_against with train/eval roles:
    a train item near an eval item flags; far items pass."""
    from fluent_server_spark.operators.decontaminate import decontaminate_semantic

    pts, df = clustered
    cents = train_centroids(df, k=4, dim=8, seed=3)
    eval_vecs = df.filter("vec_id < 2")  # two eval anchors
    train_vecs = spark.createDataFrame(
        [
            (500, [float(x) for x in pts[0] * 1.002]),  # paraphrase-close to eval 0
            (501, [float(-x) for x in pts[0]]),          # opposite direction
        ],
        "vec_id int, embedding array<double>",
    )
    got = {
        r["vec_id"]: r["contaminated"]
        for r in decontaminate_semantic(
            train_vecs, eval_vecs, cents, eps=0.95
        ).collect()
    }
    assert got[500] is True and got[501] is False
