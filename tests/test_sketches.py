"""Count-min sketch: one-sided error, eps bound, exact mergeability."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fluent_server_spark.operators.sketches import (
    count_min_build,
    count_min_estimate,
    count_min_merge,
)

DEPTH, WIDTH = 5, 256


@pytest.fixture(scope="module")
def stream(spark):
    # zipf-ish skew: key k appears ~ N/(k+1) times
    return spark.range(20_000).select(
        (F.floor(F.sqrt(F.col("id") * 8)) % 200).cast("string").alias("key")
    )


def test_estimates_are_one_sided_and_bounded(spark, stream):
    sketch = count_min_build(stream, "key", depth=DEPTH, width=WIDTH)
    truth = {r["key"]: r["n"] for r in stream.groupBy("key").agg(F.count(F.lit(1)).alias("n")).collect()}
    keys = stream.select("key").distinct()
    est = {
        r["key"]: r["estimate"]
        for r in count_min_estimate(sketch, keys, "key", depth=DEPTH, width=WIDTH).collect()
    }
    n_total = sum(truth.values())
    eps_bound = (2.718 / WIDTH) * n_total  # e/width * N
    assert set(est) == set(truth)
    for k, t in truth.items():
        assert est[k] >= t  # never undercounts
        assert est[k] - t <= 3 * eps_bound  # generous prob slack
    # the heaviest key collides with almost nothing relative to itself
    top = max(truth, key=truth.get)
    assert est[top] - truth[top] <= 0.2 * truth[top]


def test_merge_is_exact(spark, stream):
    a = stream.filter(F.col("key").cast("int") % 2 == 0)
    b = stream.filter(F.col("key").cast("int") % 2 == 1)
    merged = count_min_merge(
        count_min_build(a, "key", depth=DEPTH, width=WIDTH),
        count_min_build(b, "key", depth=DEPTH, width=WIDTH),
    )
    direct = count_min_build(stream, "key", depth=DEPTH, width=WIDTH)
    m = {(r["d"], r["bucket"]): r["cnt"] for r in merged.collect()}
    d = {(r["d"], r["bucket"]): r["cnt"] for r in direct.collect()}
    assert m == d  # counter addition == building from the union


def test_weighted_sketch(spark):
    df = spark.createDataFrame(
        [("a", 10), ("a", 5), ("b", 1)], "key string, bytes long"
    )
    sketch = count_min_build(df, "key", depth=DEPTH, width=WIDTH, weight_col="bytes")
    est = {
        r["key"]: r["estimate"]
        for r in count_min_estimate(
            sketch, df.select("key").distinct(), "key", depth=DEPTH, width=WIDTH
        ).collect()
    }
    assert est["a"] >= 15 and est["b"] >= 1
