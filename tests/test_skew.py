"""Skew fixture: one conversation holds ~30% of turns. Salted bucketing
must spread it so no bucket exceeds a sane bound, while keeping the
layout deterministic (resume-safe)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fluent_server_spark.data.synth import HOT_CONV
from fluent_server_spark.operators.skew import salted_bucket, salted_count


def test_salted_bucket_spreads_hot_key(spark, turns_sdf):
    n_buckets, n_salt = 16, 4
    df = turns_sdf.withColumn(
        "bucket", salted_bucket(F.col("conv_id"), F.col("turn_idx"), n_buckets, n_salt)
    )
    total = df.count()
    per_bucket = {r.bucket: r.n for r in df.groupBy("bucket").agg(F.count("*").alias("n")).collect()}
    assert max(per_bucket) < n_buckets and min(per_bucket) >= 0
    # hot conv is 30% of data; without salt its bucket would hold >=30%.
    # With n_salt=4 the worst bucket must be well under that.
    assert max(per_bucket.values()) / total < 0.2
    hot_buckets = (
        df.filter(F.col("conv_id") == HOT_CONV).select("bucket").distinct().count()
    )
    assert hot_buckets == n_salt  # hot key spread over exactly n_salt buckets


def test_salted_bucket_deterministic(spark, turns_sdf):
    expr = salted_bucket(F.col("conv_id"), F.col("turn_idx"), 16, 4)
    a = turns_sdf.withColumn("b", expr).select("conv_id", "turn_idx", "b")
    b = turns_sdf.withColumn("b", expr).select("conv_id", "turn_idx", "b")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_salted_count_matches_plain(spark, turns_sdf):
    plain = {
        r.conv_id: r.n
        for r in turns_sdf.groupBy("conv_id").agg(F.count("*").alias("n")).collect()
    }
    salted = {r.conv_id: r.n for r in salted_count(turns_sdf, "conv_id").collect()}
    assert salted == plain


def test_key_skew_stats_ranks_hot_keys(spark):
    from fluent_server_spark.operators.skew import key_skew_stats

    rows = [(i, "hot") for i in range(60)] + [(100 + i, f"k{i % 5}") for i in range(40)]
    df = spark.createDataFrame(rows, "id long, key string")
    got = key_skew_stats(df, "key", top_n=3).collect()
    assert [r.rank for r in got] == [1, 2, 3]
    assert got[0].key == "hot" and got[0].cnt == 60
    assert got[0].share == 0.6 and got[0].total_rows == 100 and got[0].n_keys == 6
    # TakeOrderedAndProject, not a global sort of all keys
    plan = (
        key_skew_stats(df, "key", top_n=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
