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


def test_bucketed_asof_matches_merge_asof(spark, asof_data):
    left, right, lpdf, rpdf = asof_data
    want = _oracle(lpdf, rpdf)
    got = (
        asof_join_bucketed(left, right, bucket="1 hour")
        .toPandas()[["conv_id", "turn_idx", "ts", "version"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_pandas_asof_matches_oracle(spark, asof_data):
    left, right, lpdf, rpdf = asof_data
    want = _oracle(lpdf, rpdf)
    got = (
        asof_join_pandas(left, right)
        .toPandas()[["conv_id", "turn_idx", "ts", "version"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
