"""Deterministic sampling: rate accuracy, reproducibility, salt
independence — the properties a 100 TB corpus mix actually needs."""

from __future__ import annotations

from fluent_server_spark.operators.sampling import (
    deterministic_sample,
    weighted_sample,
)


def _ids(spark, n=20_000):
    return spark.range(n).withColumnRenamed("id", "doc_id")


def test_rate_accuracy_and_determinism(spark):
    df = _ids(spark)
    s1 = deterministic_sample(df, "doc_id", 0.3, salt="a")
    s2 = deterministic_sample(df, "doc_id", 0.3, salt="a")
    n1, n2 = s1.count(), s2.count()
    assert n1 == n2  # pure function of the row — byte-stable re-runs
    assert abs(n1 / 20_000 - 0.3) < 0.02


def test_nested_rates_are_subsets(spark):
    """sample(rate=0.1) is a strict subset of sample(rate=0.5) under the
    same salt — threshold semantics, so rates can be RAISED later without
    resampling everything (append-only corpus growth)."""
    df = _ids(spark)
    small = {r.doc_id for r in deterministic_sample(df, "doc_id", 0.1).collect()}
    big = {r.doc_id for r in deterministic_sample(df, "doc_id", 0.5).collect()}
    assert small < big


def test_salt_independence(spark):
    """Different salts give independent draws: overlap ~ product of
    rates (how train/eval splits stay honestly disjoint)."""
    df = _ids(spark)
    a = {r.doc_id for r in deterministic_sample(df, "doc_id", 0.5, salt="train").collect()}
    b = {r.doc_id for r in deterministic_sample(df, "doc_id", 0.5, salt="eval").collect()}
    overlap = len(a & b) / 20_000
    assert abs(overlap - 0.25) < 0.02


def test_weighted_sample_per_stratum(spark):
    from pyspark.sql import functions as F

    df = _ids(spark).withColumn(
        "src", F.concat(F.lit("s"), (F.col("doc_id") % 2).cast("string"))
    )
    out = weighted_sample(df, "doc_id", "src", {"s0": 0.8, "s1": 0.1})
    rates = {
        r.src: r.n / 10_000
        for r in out.groupBy("src").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert abs(rates["s0"] - 0.8) < 0.03 and abs(rates["s1"] - 0.1) < 0.03
