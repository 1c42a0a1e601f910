"""Per-sink / per-conversation aggregates.

The reference's only aggregate is the mirror's per-tag append list served
as JSON (reference: mirror/mirror.go:16,41-47) — effectively
`GROUP BY tag -> collect_list`. The north_star mandates real aggregates;
all are Spark built-ins with automatic partial (map-side) + final
aggregation, so the shuffle moves one row per (group key, partition), not
per input row — the property that makes these viable at 10^12 rows.

`countDistinct` is exact (test/oracle parity); `approx_count_distinct`
(HLL++) is the scale path — at 10^12 turns an exact distinct of conv_id
is a full shuffle of the key universe, HLL is a constant-size sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def routed_counts(routed: DataFrame, exact_distinct: bool = True) -> DataFrame:
    """Per-sink turn counts + distinct conversations (north-rule equality)."""
    distinct = (
        F.countDistinct("conv_id") if exact_distinct
        else F.approx_count_distinct("conv_id")
    )
    return routed.groupBy("sink").agg(
        F.count(F.lit(1)).alias("n_turns"),
        distinct.alias("n_convs"),
    )


def tool_histogram(routed: DataFrame) -> DataFrame:
    """Per-sink tool-usage histogram."""
    return routed.groupBy("sink", "tool").agg(F.count(F.lit(1)).alias("n"))


def conversation_stats(routed: DataFrame) -> DataFrame:
    """Per-conversation sequence stats over the canonical order.

    Window over (conv_id ORDER BY turn_idx) — the engine's stable order
    (the reference declares a ts sort it never runs, event/event.go:21-33;
    we make (conv_id, turn_idx) the canonical order per the north rule).
    One shuffle on conv_id serves both the lag() and the groupBy.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    # integer-µs gaps: exact, so the avg is bit-identical across engines
    # (a double-seconds gap is only ~0.5µs-precise at 2024 epochs)
    ts_us = F.unix_micros(F.col("ts"))
    gap = ts_us - F.lag(ts_us).over(w)
    with_gap = routed.withColumn("gap_us", gap)
    return with_gap.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.countDistinct("tool").alias("n_tools"),
        F.round(F.avg("gap_us") / 1e6, 6).alias("avg_gap_s"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.sum(F.when(F.col("sink") == "sink_errors", 1).otherwise(0)).alias("n_errors"),
    )


def top_k_per_group(
    df: DataFrame, group_col: str, order_col: str, k: int, tie_col: str
) -> DataFrame:
    """Top-K rows per group via row_number — the standard Spark idiom.

    ``tie_col`` makes ranking total (deterministic under parallelism).
    """
    w = Window.partitionBy(group_col).orderBy(F.col(order_col).desc(), F.col(tie_col))
    return (
        df.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .drop("rk")
    )


def funnel_depth_scan(
    events: DataFrame,
    stages: list[str],
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Single-pass ordered-funnel depth: ONE keyed aggregation
    (collect_list per key — one exchange total), then a greedy scan of
    the time-sorted event array in a Catalyst `aggregate` fold. Greedy is
    exact here: stage i's completion time t_i = min ts of a stage-i event
    strictly after t_{i-1}, and a forward scan meets exactly that event
    first, so the fold reproduces the join-chain semantics of
    :func:`funnel_depth` (cross-checked in tests/test_training_ops.py and
    by the driver's CTE-chain oracle). The per-key state is the user's
    own event list — session-sized, the same working set any
    sessionization holds.

    Why it beats the join-chain at scale: k stages cost k keyed
    joins/aggs there (k exchanges of the filtered event stream, even if
    co-partitioned they are k shuffle materializations); here the event
    stream is shuffled ONCE regardless of k.
    """
    evs = F.array_sort(
        F.collect_list(F.struct(F.col(ts_col).alias("t"), F.col(type_col).alias("y")))
    )
    stage_arr = F.array(*[F.lit(s) for s in stages])
    # fold state: (depth so far, completion time of the last stage);
    # the 1900 sentinel is below any real event time, so stage 0 has no
    # time constraint — and `>` stays strict for every later stage. The
    # sentinel adopts ts_col's exact type (TIMESTAMP vs TIMESTAMP_NTZ
    # must match the fold's declared accumulator type).
    ts_type = {f.name: f.dataType.simpleString() for f in events.schema.fields}[
        ts_col
    ]
    if not ts_type.startswith("timestamp"):
        # a numeric ts_col would turn the sentinel cast into NULL, making
        # the fold condition NULL and every depth silently 0 — fail loud
        raise TypeError(
            f"funnel_depth_scan requires a timestamp ts_col; {ts_col!r} is "
            f"{ts_type} (cast epoch columns with to_timestamp first)"
        )
    init = F.struct(
        F.lit(0).alias("d"),
        F.lit("1900-01-01 00:00:00").cast(ts_type).alias("t"),
    )
    step = lambda acc, e: F.when(  # noqa: E731
        (acc["d"] < len(stages))
        & (e["y"] == F.element_at(stage_arr, acc["d"] + 1))
        & (e["t"] > acc["t"]),
        F.struct((acc["d"] + 1).alias("d"), e["t"].alias("t")),
    ).otherwise(acc)
    depth = F.aggregate(evs, init, step)["d"]
    return events.groupBy(key_col).agg(depth.cast("int").alias("funnel_depth"))


def funnel_depth(
    events: DataFrame,
    stages: list[str],
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel depth per key: how many of ``stages`` the key
    completed IN ORDER, where stage i+1 must occur strictly after the
    key's earliest completion time of stage i (the standard product
    funnel — view -> click -> signup -> purchase).

    Shape: one keyed aggregation per stage plus a keyed join back to the
    previous stage's time — every shuffle is on the same key, so a real
    cluster co-partitions the whole chain (one exchange reused). Depth
    of the funnel is a constant (a handful of stages), never data-sized.
    """
    reached: list[DataFrame] = []
    prev: DataFrame | None = None
    for stage in stages:
        ev_s = events.filter(F.col(type_col) == stage).select(
            key_col, F.col(ts_col).alias("_ts")
        )
        if prev is None:
            cur = ev_s.groupBy(key_col).agg(F.min("_ts").alias("_t"))
        else:
            cur = (
                ev_s.join(prev, key_col)
                .filter(F.col("_ts") > F.col("_t"))
                .groupBy(key_col)
                .agg(F.min("_ts").alias("_t"))
            )
        reached.append(cur)
        prev = cur

    out = events.select(key_col).distinct()
    for i, cur in enumerate(reached):
        out = out.join(
            cur.select(key_col, F.lit(1).alias(f"_s{i}")), key_col, "left"
        )
    depth = F.lit(0)
    for i in range(len(stages)):
        # monotone by construction: stage i+1 reached implies stage i
        depth = F.when(F.col(f"_s{i}").isNull(), depth).otherwise(F.lit(i + 1))
    return out.select(key_col, depth.cast("int").alias("funnel_depth"))
