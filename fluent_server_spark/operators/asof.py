"""As-of (nearest-earlier) join — a standard timeseries operator Spark
lacks natively (listed in the public PySpark guide's OLAP patterns).

Use case here: attach the most recent config/model snapshot to each
transcript turn ("which policy version was live when this turn ran").

Two implementations:

* :func:`asof_join_bucketed` — pure DataFrame composition (the scale
  path): bucketize time, equi-join on (key, bucket) with the right side
  exploded into every bucket from its effective time to the next
  version's bucket, then keep the max ts_right <= ts_left via window.
  For bounded version tables (the common case: few versions per key)
  the explode is tiny and everything is a hash join — no cross join.
* :func:`asof_join_pandas` — `pd.merge_asof` per key group via
  applyInPandas: exact same semantics, used as the oracle in tests and
  the fallback for unbounded right sides.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "conv_id",
    value_cols: tuple[str, ...] = ("version",),
) -> DataFrame:
    """merge_asof (backward) per `by` group. Arrow-batched; one shuffle
    on `by` for both sides (cogroup)."""
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in left.schema.fields]
        + [
            f"`{c}` {dict((f.name, f.dataType.simpleString()) for f in right.schema.fields)[c]}"
            for c in value_cols
        ]
    )
    on_, by_, vals = on, by, list(value_cols)

    def merge(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        l = l.sort_values(on_)
        r = r.sort_values(on_)[[on_, by_, *vals]]
        if r.empty:
            for c in vals:
                l[c] = None
            return l
        return pd.merge_asof(l, r, on=on_, by=by_, direction="backward")

    return left.groupBy(by).cogroup(right.groupBy(by)).applyInPandas(
        lambda l, r: merge(l, r), schema=out_schema
    )


def forward_filled_versions(
    lb: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: tuple[str, ...],
    bucket: str,
) -> DataFrame:
    """The right side of the bucketed as-of join: each version exploded
    over the time buckets it covers, ready for an equi-join on (by, _b).

    The per-key LEFT bucket span [lmin, lmax] is derived inside the plan
    (no driver-side action, no extra job) and joined to the right side.
    Each version's coverage interval [start, end] — end being the next
    version's bucket or the key's lmax — is clamped to [lmin, lmax]:
    versions whose whole interval lies before lmin are superseded by a
    later version before any left row exists (dropped); versions after
    lmax can never be a backward match (dropped); a version straddling
    lmin starts its coverage at lmin. The per-key explode is therefore
    bounded by the LEFT's own bucket span — a version table sparse over
    a long range cannot amplify past it (pinned in tests/test_asof.py).
    All bucket arithmetic stays in the `on` column's type domain
    (TIMESTAMP_NTZ for naive parquet timestamps) — no LTZ literal, so
    results cannot shift with the session timezone near DST transitions.
    """
    dur = F.expr(f"INTERVAL {bucket}")
    lspan = lb.groupBy(by).agg(
        F.min("_b").alias("_lmin"), F.max("_b").alias("_lmax")
    )
    w_next = Window.partitionBy(by).orderBy(on)
    rb = (
        right.withColumn("_start", F.window(F.col(on), bucket)["start"])
        .withColumn("_next", F.lead("_start").over(w_next))
        .join(lspan, by, "inner")
    )
    rb = (
        rb.withColumn("_cstart", F.greatest(F.col("_start"), F.col("_lmin")))
        .withColumn(
            "_end",
            F.least(F.coalesce(F.col("_next"), F.col("_lmax")), F.col("_lmax")),
        )
        .filter(F.col("_end") >= F.col("_cstart"))
    )
    rb = rb.withColumn(
        "_b", F.explode(F.sequence(F.col("_cstart"), F.col("_end"), dur))
    )
    return rb.select(
        F.col(by).alias("_rby"),
        F.col("_b"),
        F.col(on).alias("_rts"),
        *[F.col(c) for c in value_cols],
    )


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "conv_id",
    value_cols: tuple[str, ...] = ("version",),
    bucket: str = "1 hour",
    left_key: str | None = None,
) -> DataFrame:
    """Composition-of-builtins as-of join.

    Right rows are forward-filled across time buckets (each version is
    valid from its bucket until the next version's bucket), then a plain
    equi-join on (by, bucket) + a per-left-row max-ts<=ts filter gives
    nearest-earlier semantics. Shuffles: one per side on (by, bucket) —
    the same cost as any co-partitioned join; no window over the fact
    table beyond the final dedup, no cross join.

    The per-left-row dedup key is DETERMINISTIC (repo standard, same as
    operators/skew.py's row-hash salt — never monotonically_increasing_id,
    whose values can differ across stage retries): pass `left_key` (a
    column unique per left row — the common case, e.g. an event id) and
    the pick window partitions on it directly; without one, identical
    left rows are collapsed with an exact multiplicity count before the
    join and re-exploded after the pick (bonus: duplicate left rows ride
    the join shuffle once).
    """
    if left_key is not None:
        lb = left.withColumn("_b", F.window(F.col(on), bucket)["start"])
        pick_cols = [lb[left_key]]
        mult = None
    else:
        lb = left.groupBy(*[F.col(c) for c in left.columns]).agg(
            F.count(F.lit(1)).alias("_ln")
        )
        lb = lb.withColumn("_b", F.window(F.col(on), bucket)["start"])
        pick_cols = [lb[c] for c in left.columns]
        mult = "_ln"
    r_named = forward_filled_versions(lb, right, on, by, value_cols, bucket)
    joined = lb.join(
        r_named,
        (lb[by] == r_named["_rby"]) & (lb["_b"] == r_named["_b"]),
        "left",
    )
    # a version later in the same bucket is not a match — mark invalid
    # rather than filter (filtering would drop left rows whose only
    # bucket-mates are later versions)
    valid = F.col("_rts") <= F.col(on)
    joined = joined.withColumn(
        "_rts_valid", F.when(valid, F.col("_rts"))
    )
    # keep the latest VALID right row per (unique) left row
    w_pick = Window.partitionBy(*pick_cols).orderBy(
        F.col("_rts_valid").desc_nulls_last()
    )
    picked = (
        joined.withColumn("_rn", F.row_number().over(w_pick))
        .filter(F.col("_rn") == 1)
    )
    out = picked.select(
        *[lb[c] for c in left.columns],
        *[
            F.when(F.col("_rts_valid").isNotNull(), F.col(c)).alias(c)
            for c in value_cols
        ],
        *([F.col(mult)] if mult else []),
    )
    if mult:
        out = out.withColumn(
            "_exp", F.explode(F.sequence(F.lit(1), F.col(mult)))
        ).drop(mult, "_exp")
    return out
