"""Multi-dimensional data layout — Z-ORDER clustering for file pruning.

A 100 TB table sorted on one column prunes scans on THAT column only; a
query restricting a second dimension still touches every file. Z-order
(Morton order — the curve behind Databricks OPTIMIZE ZORDER and an
Iceberg sort-order strategy; public knowledge) interleaves the bits of
the bucketed dimensions so that range-partitioning on the single
z-value yields files that are TILES in N-dim space: each file's per-
column min/max footer stats cover a narrow range in EVERY clustered
column, and ordinary parquet min/max pruning (or Iceberg manifest
pruning) skips files for predicates on any of them.

Everything is built-in expression work: width_bucket per column (bounds
from one bounded agg), bit interleave as a shift/or chain, then
repartitionByRange + sortWithinPartitions — the exact shuffle shape a
sorted write costs anyway. The pruning win is demonstrated empirically
in tests/test_layout.py by reading the parquet footers of a z-ordered
vs a linearly-sorted layout and counting files a box predicate can
skip.

Equal-width bucketing is the default (bounds = one min/max agg); pass
`boundaries` (e.g. from approxQuantile) for skew-robust equal-depth
buckets per column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucketize(
    col: Column,
    lo: float,
    hi: float,
    bits: int,
    boundaries: list[float] | None,
) -> Column:
    n = 1 << bits
    if boundaries is not None:
        # equal-depth: count boundaries passed (fold over the literal
        # boundary array; len(boundaries) == n - 1)
        barr = F.array(*[F.lit(float(b)) for b in boundaries])
        b = F.aggregate(
            barr,
            F.lit(0),
            lambda acc, x: acc + (col.cast("double") >= x).cast("int"),
        )
    elif lo is None or hi is None or hi <= lo:
        # constant (or all-null) column: one bucket — it contributes no
        # discrimination, but the z-value must stay well-defined
        b = F.lit(0)
    else:
        b = F.width_bucket(col.cast("double"), F.lit(lo), F.lit(hi), F.lit(n)) - 1
    # NULL values (and any width_bucket null) land in bucket 0 rather
    # than nulling the whole interleaved z-value
    return F.greatest(
        F.lit(0), F.least(F.lit(n - 1), F.coalesce(b.cast("int"), F.lit(0)))
    )


def with_zvalue(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    out: str = "zvalue",
    boundaries: dict[str, list[float]] | None = None,
) -> DataFrame:
    """Add the Morton code of the given columns (bits per dimension).

    Bounds for equal-width bucketing come from ONE min/max aggregation
    (bounded driver collect — the same cost any OPTIMIZE pass pays);
    `boundaries[col]` (length 2^bits - 1, e.g. approxQuantile output)
    switches that column to equal-depth buckets with no extra scan."""
    aggs = []
    need_bounds = [c for c in cols if not (boundaries and c in boundaries)]
    for c in need_bounds:
        aggs += [
            F.min(F.col(c).cast("double")).alias(f"_lo_{c}"),
            F.max(F.col(c).cast("double")).alias(f"_hi_{c}"),
        ]
    bounds = df.agg(*aggs).collect()[0] if aggs else {}
    z = F.lit(0).cast("long")
    for ci, c in enumerate(cols):
        bnd = boundaries.get(c) if boundaries else None
        lo = bounds[f"_lo_{c}"] if bnd is None else 0.0
        hi = bounds[f"_hi_{c}"] if bnd is None else 0.0
        bucket = _bucketize(F.col(c), lo, hi, bits, bnd)
        for bit in range(bits):
            bit_set = F.shiftrightunsigned(bucket.cast("long"), bit).bitwiseAND(1)
            z = z + F.shiftleft(bit_set, bit * len(cols) + ci)
    return df.withColumn(out, z)


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    n_files: int,
    bits: int = 8,
    boundaries: dict[str, list[float]] | None = None,
) -> DataFrame:
    """Cluster `df` for multi-column pruning: range-partition on the
    z-value into `n_files` output tasks and sort within each — write
    the result with a plain `.write.parquet` and every file's footer
    min/max is tight in EVERY clustered column. Drop the helper column
    at write time; the layout, not the value, is the product."""
    z = with_zvalue(df, cols, bits, boundaries=boundaries)
    return (
        z.repartitionByRange(n_files, "zvalue")
        .sortWithinPartitions("zvalue")
        .drop("zvalue")
    )
