"""Distributed global ranking — exact ntile/rank over a total order
WITHOUT the single-partition Window that `Window.orderBy(...)` plans
(every row through ONE reducer: the classic scale killer for global
sorts at 10^9+ keys).

Recipe (the standard distributed ranking construction):

1. `repartitionByRange` on the sort key — a range exchange, the same
   shuffle a distributed ORDER BY uses; partition i's rows all sort
   before partition i+1's.
2. Per-partition `row_number` (window partitioned by the partition id —
   each group is one range partition, sorted locally in parallel).
3. Per-partition counts -> cumulative offsets (and the grand total, for
   ntile). This relation has ONE ROW PER PARTITION (thousands, not
   billions), so its prefix-sum window is trivially cheap, and it
   broadcasts back onto the data as a keyed hash join on the partition
   id — no nested-loop join anywhere.
4. global rank = local row_number + partition offset.

Ranks are exact regardless of how the range sampler draws boundaries
(boundaries affect balance only, never order), and deterministic because
the order columns must form a TOTAL order (callers tie-break, e.g. on
the natural key) — pinned in tests/test_ranking.py against the
single-partition Window formulation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _ranked_with_offsets(
    df: DataFrame,
    order_by: list[Column],
    num_partitions: int | None,
    with_total: bool,
) -> DataFrame:
    """df + (_lrn local row number, _off partition offset[, _t total])."""
    sc = df.sparkSession.sparkContext
    n_part = num_partitions or sc.defaultParallelism
    ranged = df.repartitionByRange(n_part, *order_by).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_local = Window.partitionBy("_pid").orderBy(*order_by)
    local = ranged.withColumn("_lrn", F.row_number().over(w_local))
    counts = local.groupBy("_pid").agg(F.max("_lrn").alias("_cnt"))
    # one row per partition: these windows run over ~#partitions rows,
    # so their single-partition plans are a non-issue at any data scale
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid",
        F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias("_off"),
        *(
            [
                F.sum("_cnt")
                .over(
                    Window.orderBy("_pid").rowsBetween(
                        Window.unboundedPreceding, Window.unboundedFollowing
                    )
                )
                .alias("_t")
            ]
            if with_total
            else []
        ),
    )
    return local.join(F.broadcast(offsets), "_pid")


def with_global_rank(
    df: DataFrame,
    order_by: list[Column],
    out: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add 1-based global row numbers in the total order given by
    `order_by` (callers MUST include a tie-breaker). No global window:
    one range exchange + one per-partition window + a broadcast of the
    per-partition offsets."""
    ranked = _ranked_with_offsets(df, order_by, num_partitions, with_total=False)
    return (
        ranked.withColumn(out, (F.col("_lrn") + F.col("_off")).cast("bigint"))
        .drop("_pid", "_lrn", "_off")
    )


def with_global_ntile(
    df: DataFrame,
    n: int,
    order_by: list[Column],
    out: str = "ntile",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact `ntile(n) OVER (ORDER BY ...)` semantics, distributed.

    SQL ntile puts the first (T mod n) buckets one row over T//n: with
    global rank r, q = T//n, rem = T mod n, the first rem*(q+1) ranks map
    to buckets of size q+1 and the rest to buckets of size q. The total
    count T rides the same broadcast offsets relation the rank join
    already uses (keyed on the partition id) — never a driver action,
    never an extra join."""
    ranked = _ranked_with_offsets(df, order_by, num_partitions, with_total=True)
    r = F.col("_lrn") + F.col("_off")
    q = (F.col("_t") / n).cast("bigint")
    rem = F.col("_t") % n
    thresh = rem * (q + 1)
    # greatest(q,1): when T < n every rank satisfies r <= thresh, so the
    # otherwise-branch is dead — but ANSI mode must never see a /0 even
    # in an unevaluated expression tree under codegen fusion
    tile = F.when(r <= thresh, ((r - 1) / (q + 1)).cast("bigint") + 1).otherwise(
        rem + ((r - 1 - thresh) / F.greatest(q, F.lit(1))).cast("bigint") + 1
    )
    return ranked.withColumn(out, tile.cast("int")).drop("_pid", "_lrn", "_off", "_t")
