"""Distributed global rank/ntile vs the single-partition Window oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from fluent_server_spark.operators.ranking import with_global_ntile, with_global_rank


@pytest.fixture(scope="module")
def keyed_df(spark):
    # values with heavy ties so tie-breaking and bucket boundaries matter
    rows = [(i, float((i * 7919) % 97)) for i in range(1000)]
    return spark.createDataFrame(rows, "k int, v double")


def test_global_rank_matches_window_row_number(spark, keyed_df):
    order = [F.desc("v"), F.asc("k")]
    got = {
        r["k"]: r["rank"]
        for r in with_global_rank(keyed_df, order, num_partitions=7).collect()
    }
    w = Window.orderBy(F.desc("v"), F.asc("k"))
    want = {
        r["k"]: r["rk"]
        for r in keyed_df.withColumn("rk", F.row_number().over(w)).collect()
    }
    assert got == want


@pytest.mark.parametrize("n,rows", [(10, 1000), (10, 997), (7, 23), (10, 4)])
def test_global_ntile_matches_window_ntile(spark, n, rows):
    df = spark.createDataFrame(
        [(i, float((i * 31) % 13)) for i in range(rows)], "k int, v double"
    )
    order = [F.desc("v"), F.asc("k")]
    got = {
        r["k"]: r["ntile"]
        for r in with_global_ntile(df, n, order, num_partitions=5).collect()
    }
    w = Window.orderBy(F.desc("v"), F.asc("k"))
    want = {
        r["k"]: r["nt"]
        for r in df.withColumn("nt", F.ntile(n).over(w)).collect()
    }
    assert got == want
