"""Interval (range) join — match fact rows to the time intervals that
contain them WITHOUT an inequality join.

Spark plans a raw `ts >= start AND ts < end` join as
BroadcastNestedLoopJoin: every fact row probes every interval — O(n·m),
the classic 100 TB killer. The standard fix (same family as the bucketed
as-of join in operators/asof.py): quantize time into fixed buckets,
explode each interval over the buckets it covers, equi-join on the
bucket, then apply the exact bounds as a residual filter. Amplification
is interval_length / bucket_length per interval — bounded by sizing the
bucket to the typical interval, and the interval side is usually tiny
(maintenance windows, campaigns, incidents) so the exploded relation
broadcasts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fluent_server_spark.queries import ntz_micros


def _bucket(ts: Column, bucket_us: int) -> Column:
    return (ntz_micros(ts) / F.lit(bucket_us)).cast("bigint")


def interval_join(
    facts: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
    broadcast_intervals: bool = True,
) -> DataFrame:
    """Inner-join facts to every interval containing them
    (start <= ts < end, intervals may overlap).

    Returns facts' columns + intervals' columns. The only join is an
    equi-join on the time bucket; with `broadcast_intervals` (the common
    shape — few intervals, huge facts) the fact side never shuffles.

    The two sides must not share column names (the residual filter and
    the output would be ambiguous) — checked eagerly; the join-bucket
    temp column is collision-proofed against both sides' columns.
    """
    shared = set(facts.columns) & set(intervals.columns)
    if shared:
        raise ValueError(
            f"facts and intervals share column names {sorted(shared)}; "
            "rename one side before interval_join"
        )
    taken = set(facts.columns) | set(intervals.columns)
    b = "_b"
    while b in taken:
        b += "_"
    bucket_us = bucket_seconds * 1_000_000
    b_start = _bucket(F.col(start_col), bucket_us)
    # end is exclusive, but a bucket boundary end still lands in the
    # previous bucket's explode range; the residual filter is exact
    b_end = _bucket(F.col(end_col), bucket_us)
    iv = intervals.withColumn(
        b, F.explode(F.sequence(b_start, b_end))
    )
    if broadcast_intervals:
        iv = F.broadcast(iv)
    fc = facts.withColumn(b, _bucket(F.col(ts_col), bucket_us))
    joined = fc.join(iv, b).filter(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    )
    return joined.drop(b)
