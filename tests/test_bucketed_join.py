"""Bucketed co-located joins — the pre-shuffled table layout for
repeated big-to-big joins (brief: "repartition()/bucketing for
co-located joins").

Writing both sides bucketed by the join key into the warehouse lets
EVERY subsequent join on that key skip its exchange: at 100 TB a
fact-to-fact join's shuffle is the dominant cost, and bucketing amortizes
it into the (one-time) write. The test pins the plan property that
matters: the bucketed join has NO Exchange on either side, while the
same join over plain parquet exchanges both.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def warehouse_tables(spark, tmp_path_factory):
    n = 10_000
    facts = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).alias("v"),
    )
    dims = spark.range(n // 2).select(
        F.col("id").alias("k"),
        (F.col("id") % 13).cast("string").alias("grp"),
    )
    for name, df in (("b_facts", facts), ("b_dims", dims)):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.mode("overwrite")
            .bucketBy(8, "k")
            .sortBy("k")
            .format("parquet")
            .saveAsTable(name)
        )
    yield
    for name in ("b_facts", "b_dims"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, warehouse_tables):
    f = spark.table("b_facts")
    d = spark.table("b_dims")
    # force the big-to-big join strategy (without the hint Spark
    # broadcasts the smaller side here, which proves nothing about
    # bucketing; at real scale neither side broadcasts)
    joined = f.join(d.hint("merge"), "k")
    plan = _plan(joined)
    # both sides bucketed on the join key -> co-located, ZERO exchange
    # anywhere in the join plan
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan
    assert plan.count("Bucketed: true") == 2

    # control: the same forced-merge join over non-bucketed relations
    # exchanges both sides
    plan2 = _plan(f.repartition(7).join(d.repartition(7).hint("merge"), "k"))
    assert "SortMergeJoin" in plan2
    assert plan2.count("Exchange") >= 2


def test_bucketed_join_results_match_plain_join(spark, warehouse_tables):
    f = spark.table("b_facts")
    d = spark.table("b_dims")
    got = sorted(map(tuple, f.join(d, "k").groupBy("grp").count().collect()))
    want = sorted(
        map(
            tuple,
            f.repartition(7).join(d.repartition(7), "k").groupBy("grp").count().collect(),
        )
    )
    assert got == want
