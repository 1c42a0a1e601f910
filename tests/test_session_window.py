"""session_window boundary semantics vs the gaps-and-islands oracle —
the fixture may never produce an exact-gap pair, so pin it on literals."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F


def test_exact_gap_starts_new_session(spark):
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)

    def at(sec):
        return t0 + datetime.timedelta(seconds=sec)

    gap = 1800
    rows = [
        # u1: gaps 10s, EXACTLY 1800s, 1799s -> sessions {a,b},{c,d},... wait
        (1, at(0)), (1, at(10)), (1, at(10 + gap)), (1, at(10 + gap + 1799)),
        # u2: single event
        (2, at(0)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    sess = (
        df.groupBy("user_id", F.session_window("ts", f"{gap} seconds").alias("sw"))
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"), F.sum("n").alias("n_events"))
    )
    got = {r.user_id: (r.n_sessions, r.n_events) for r in sess.collect()}
    # Spark semantics (pinned here because the synthetic fixture never
    # produces an exact-gap pair): a gap of EXACTLY the window size
    # MERGES — u1 is ONE session of 4; only gap > 1800s would split.
    assert got == {1: (1, 4), 2: (1, 1)}

    plus1 = spark.createDataFrame(
        [(3, at(0)), (3, at(gap + 1))], "user_id long, ts timestamp"
    )
    sess2 = plus1.groupBy(
        "user_id", F.session_window("ts", f"{gap} seconds")
    ).count()
    assert sess2.count() == 2  # one microsecond past the gap DOES split
