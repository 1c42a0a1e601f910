"""Mergeable frequency sketches as plain DataFrames.

Count-min (Cormode & Muthukrishnan '05) expressed Spark-first: the
sketch IS a (depth x width)-row DataFrame of bucket counters, built by
one map-side-combined aggregation over the stream and merged with any
other sketch by union + sum — the associative/commutative shape Spark
aggregates natively. No opaque binary blobs: the sketch table is
queryable, unionable, storable as parquet, and the bucket hash is the
repo's standard portable md5 construction, so any engine (or the DuckDB
oracle style) re-derives identical buckets.

Why not exact counts? At 10^12 rows an exact per-key count is a full
shuffle of the key universe (operators/aggregates.py makes the same
point for HLL); the sketch is CONSTANT size (depth*width counters)
regardless of cardinality, while guaranteeing
  true <= estimate <= true + eps*N  with prob 1 - delta,
  eps = e/width, delta = exp(-depth).
The exact salted two-phase aggregation (queries/events.py::heavy_users)
remains the precise path; this is the streaming/mergeable one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MOD = 1_000_000_000


def _bucket(key, d: int, width: int, salt: str):
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}-{d}:"), key.cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    return (h % width).cast("int")


def count_min_build(
    df: DataFrame,
    key_col: str,
    depth: int = 5,
    width: int = 1024,
    salt: str = "cms",
    weight_col: str | None = None,
) -> DataFrame:
    """(d, bucket, cnt): the sketch table. One explode to depth rows per
    input row, one aggregation (partial map-side combine makes the
    shuffle depth*width counters per partition, not per row). Pass
    `weight_col` to sketch a weighted frequency (e.g. bytes per key)."""
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _bucket(F.col(key_col), d, width, salt).alias("bucket"),
                        w.alias("w"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("r")
    ).select("r.d", "r.bucket", "r.w")
    return rows.groupBy("d", "bucket").agg(F.sum("w").alias("cnt"))


def count_min_merge(*sketches: DataFrame) -> DataFrame:
    """Union + sum: sketches built with the SAME (depth, width, salt)
    merge exactly (counter addition commutes with building from the
    concatenated input — pinned in tests)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("d", "bucket").agg(F.sum("cnt").alias("cnt"))


def count_min_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 5,
    width: int = 1024,
    salt: str = "cms",
) -> DataFrame:
    """Point estimates for a DataFrame of keys: min over the depth rows
    each key hashes to — a broadcast-size join against the constant-size
    sketch, never a scan of the original stream."""
    probes = keys.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _bucket(F.col(key_col), d, width, salt).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("p"),
    ).select(key_col, "p.d", "p.bucket")
    joined = probes.join(F.broadcast(sketch), ["d", "bucket"], "left").select(
        key_col, F.coalesce("cnt", F.lit(0)).alias("cnt")
    )
    return joined.groupBy(key_col).agg(F.min("cnt").alias("estimate"))
