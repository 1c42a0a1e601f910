"""As-of join: bucketed-builtins implementation vs pd.merge_asof oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from fluent_server_spark.operators.asof import asof_join_bucketed, asof_join_pandas


@pytest.fixture(scope="module")
def asof_data(spark):
    rng = np.random.RandomState(11)
    base = pd.Timestamp("2024-01-01")
    left_rows = []
    right_rows = []
    for k in range(6):
        key = f"conv-{k}"
        # irregular event times over ~2 days
        ts = base + pd.to_timedelta(np.sort(rng.randint(0, 48 * 3600, 60)), unit="s")
        left_rows += [(key, int(i), t.to_pydatetime()) for i, t in enumerate(ts)]
        # a few policy versions, some before, one between, none after-only
        vts = base + pd.to_timedelta(np.sort(rng.choice(48 * 3600, 4, replace=False)), unit="s")
        right_rows += [(key, t.to_pydatetime(), f"v{k}.{j}") for j, t in enumerate(vts)]
    # one key with no versions at all
    left_rows += [
        ("conv-none", 0, base.to_pydatetime()),
        ("conv-none", 1, (base + pd.Timedelta("1h")).to_pydatetime()),
    ]
    left = spark.createDataFrame(left_rows, "conv_id string, turn_idx int, ts timestamp")
    right = spark.createDataFrame(right_rows, "conv_id string, ts timestamp, version string")
    return left, right, pd.DataFrame(left_rows, columns=["conv_id", "turn_idx", "ts"]), pd.DataFrame(right_rows, columns=["conv_id", "ts", "version"])


def _oracle(lpdf, rpdf):
    out = []
    for key, grp in lpdf.groupby("conv_id"):
        r = rpdf[rpdf.conv_id == key].sort_values("ts")
        g = grp.sort_values("ts")
        if r.empty:
            g = g.assign(version=None)
        else:
            g = pd.merge_asof(g, r, on="ts", by="conv_id", direction="backward")
        out.append(g)
    return (
        pd.concat(out)[["conv_id", "turn_idx", "ts", "version"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )


def _norm_nulls(pdf):
    # Spark's toPandas yields None, merge_asof yields NaN — pandas is
    # deprecating treating those as equal in assert_frame_equal, so pin
    # both representations to None before comparing.
    return pdf.assign(
        version=pdf["version"].astype(object).where(pdf["version"].notna(), None)
    )


def test_bucketed_asof_matches_merge_asof(spark, asof_data):
    left, right, lpdf, rpdf = asof_data
    want = _oracle(lpdf, rpdf)
    got = (
        asof_join_bucketed(left, right, bucket="1 hour")
        .toPandas()[["conv_id", "turn_idx", "ts", "version"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(_norm_nulls(got), _norm_nulls(want), check_dtype=False)


def test_pandas_asof_matches_oracle(spark, asof_data):
    left, right, lpdf, rpdf = asof_data
    want = _oracle(lpdf, rpdf)
    got = (
        asof_join_pandas(left, right)
        .toPandas()[["conv_id", "turn_idx", "ts", "version"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(_norm_nulls(got), _norm_nulls(want), check_dtype=False)

def test_sparse_versions_long_left_span(spark):
    """A version far before the left span must still forward-fill, and a
    version after all left rows must never match — over a multi-month
    left span (the scale-risk case from round 1)."""
    base = pd.Timestamp("2024-06-01")
    left_rows = [
        ("k", 0, (base + pd.Timedelta(days=d)).to_pydatetime()) for d in range(0, 90, 7)
    ]
    right_rows = [
        ("k", pd.Timestamp("2022-01-15 03:30").to_pydatetime(), "ancient"),
        ("k", (base + pd.Timedelta(days=30)).to_pydatetime(), "mid"),
        ("k", (base + pd.Timedelta(days=400)).to_pydatetime(), "future"),
    ]
    left = spark.createDataFrame(left_rows, "conv_id string, turn_idx int, ts timestamp")
    right = spark.createDataFrame(right_rows, "conv_id string, ts timestamp, version string")
    got = (
        asof_join_bucketed(left, right, bucket="1 hour")
        .toPandas()
        .sort_values("turn_idx")
        .reset_index(drop=True)
    )
    want = ["ancient" if d < 30 else "mid" for d in range(0, 90, 7)]
    assert list(got.version) == want


def test_explode_bounded_by_left_bucket_span(spark):
    """The forward-fill explode is clamped to the left's per-key bucket
    span: a version dated YEARS before a 3-hour left span contributes at
    most span-many bucket rows (old behavior: one row per hour since the
    version -> ~17k)."""
    from pyspark.sql import functions as F

    from fluent_server_spark.operators.asof import forward_filled_versions

    base = pd.Timestamp("2024-06-01")
    left_rows = [("k", i, (base + pd.Timedelta(hours=i)).to_pydatetime()) for i in range(3)]
    right_rows = [("k", pd.Timestamp("2022-01-15 03:30").to_pydatetime(), "v0")]
    left = spark.createDataFrame(left_rows, "conv_id string, turn_idx int, ts timestamp")
    right = spark.createDataFrame(right_rows, "conv_id string, ts timestamp, version string")
    lb = left.withColumn("_b", F.window(F.col("ts"), "1 hour")["start"])
    rb = forward_filled_versions(lb, right, "ts", "conv_id", ("version",), "1 hour")
    assert rb.count() <= 3  # left spans 3 hourly buckets


# ------------------------------------------------------- interval join


def test_interval_join_matches_naive_inequality_join(spark):
    """Bucketed interval join == the naive cross-join + filter, including
    overlapping windows, boundary timestamps, and unmatched rows."""
    import datetime as dt

    from fluent_server_spark.operators.rangejoin import interval_join

    t0 = dt.datetime(2024, 1, 1)
    facts = spark.createDataFrame(
        [(i, t0 + dt.timedelta(minutes=37 * i)) for i in range(200)],
        "fact_id long, ts timestamp_ntz",
    )
    ivs = spark.createDataFrame(
        [
            # overlapping pair
            (0, t0 + dt.timedelta(hours=1), t0 + dt.timedelta(hours=4)),
            (1, t0 + dt.timedelta(hours=3), t0 + dt.timedelta(hours=6)),
            # zero-match window far in the future
            (2, t0 + dt.timedelta(days=400), t0 + dt.timedelta(days=401)),
            # window whose end is exactly on a bucket boundary
            (3, t0 + dt.timedelta(hours=10), t0 + dt.timedelta(hours=12)),
        ],
        "w_id int, s timestamp_ntz, e timestamp_ntz",
    )
    got = sorted(
        (r["fact_id"], r["w_id"])
        for r in interval_join(facts, ivs, "ts", "s", "e").collect()
    )
    from pyspark.sql import functions as F

    want = sorted(
        (r["fact_id"], r["w_id"])
        for r in facts.crossJoin(ivs)
        .filter((F.col("ts") >= F.col("s")) & (F.col("ts") < F.col("e")))
        .collect()
    )
    assert got == want and len(got) > 0
    # boundary semantics: ts == start matches, ts == end does not
    b = spark.createDataFrame(
        [(100, t0 + dt.timedelta(hours=1)), (101, t0 + dt.timedelta(hours=4))],
        "fact_id long, ts timestamp_ntz",
    )
    hit = {
        r["fact_id"]
        for r in interval_join(b, ivs.filter("w_id = 0"), "ts", "s", "e").collect()
    }
    assert hit == {100}


def test_bucketed_asof_left_key_matches_keyless(spark, asof_data):
    """The deterministic dedup key paths agree: a real unique left key
    (left_key=) and the keyless collapse+re-explode default produce the
    identical result."""
    left, right, lpdf, rpdf = asof_data
    cols = ["conv_id", "turn_idx", "ts", "version"]
    keyless = (
        asof_join_bucketed(left, right, bucket="1 hour")
        .toPandas()[cols].sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    # turn_idx is unique only per conv here, so build a truly unique key
    left2 = left.selectExpr("conv_id", "turn_idx", "ts",
                            "concat(conv_id, '#', turn_idx) AS uid")
    keyed2 = (
        asof_join_bucketed(left2, right, bucket="1 hour", left_key="uid")
        .drop("uid")
        .toPandas()[cols].sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(keyed2, keyless, check_dtype=False)


def test_bucketed_asof_keyless_preserves_duplicate_left_rows(spark):
    """Byte-identical left rows keep their multiplicity through the
    keyless collapse + re-explode (the round-2 monotonically_increasing_id
    replacement must not dedup the left)."""
    base = pd.Timestamp("2024-01-01")
    left = spark.createDataFrame(
        [("c", base.to_pydatetime())] * 3
        + [("c", (base + pd.Timedelta("2h")).to_pydatetime())] * 2,
        "conv_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("c", (base - pd.Timedelta("1h")).to_pydatetime(), "v0"),
         ("c", (base + pd.Timedelta("1h")).to_pydatetime(), "v1")],
        "conv_id string, ts timestamp, version string",
    )
    got = asof_join_bucketed(left, right, bucket="1 hour").toPandas()
    counts = got.groupby("version").size().to_dict()
    assert len(got) == 5
    assert counts == {"v0": 3, "v1": 2}


def test_interval_join_rejects_shared_column_names(spark):
    from fluent_server_spark.operators.rangejoin import interval_join

    facts = spark.createDataFrame([(1,)], "ts int").selectExpr(
        "CAST('2024-01-01' AS timestamp_ntz) AS ts", "1 AS _b"
    )
    ivs = spark.createDataFrame([(1,)], "x int").selectExpr(
        "CAST('2024-01-01' AS timestamp_ntz) AS s",
        "CAST('2024-01-02' AS timestamp_ntz) AS e",
        "2 AS _b",
    )
    with pytest.raises(ValueError, match="share column names"):
        interval_join(facts, ivs, "ts", "s", "e")
    # non-overlapping _b-bearing sides work: temp col collision-proofed
    got = interval_join(facts.drop("_b"), ivs.withColumnRenamed("_b", "w"), "ts", "s", "e")
    assert got.count() == 1 and set(got.columns) == {"ts", "s", "e", "w"}
