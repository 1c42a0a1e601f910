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


# --------------------------------------------------------------- HyperLogLog


def _hll_hash(key, salt: str):
    """60 portable bits from the repo's standard md5 construction (same
    contract as _bucket: any engine re-derives identical values)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + ":"), key.cast("string"))), 1, 15),
        16,
        10,
    ).cast("bigint")


def hll_build(
    df: DataFrame, key_col: str, p: int = 12, salt: str = "hll"
) -> DataFrame:
    """(register, max_rank): sparse HyperLogLog registers (Flajolet,
    Fuchs, Gandouet & Meunier, AofA 2007) — the DISTINCT-count companion
    to the count-min frequency sketch above, same design stance: the
    sketch IS a DataFrame (only registers that ever fired are rows), so
    it is queryable, parquet-storable, and merged by union + max — the
    idempotent/commutative shape that makes merge == build-on-union
    EXACT (pinned bit-equal in tests), unlike the engine's built-in
    `approx_count_distinct`, whose HLL++ state lives inside an opaque
    aggregation buffer you cannot persist per-epoch as a table.

    At 10^12 rows an exact COUNT(DISTINCT key) shuffles the key
    universe; this is one map-side-combined aggregation into at most
    2^p rows (p=12 -> 4096 registers, ~1.04/sqrt(m) ~= 1.6% standard
    error) and per-epoch sketches merge without touching the stream
    again. Rank arithmetic is integer-exact: bit length via base-2
    string conversion, never floating log2 (whose boundary rounding
    would corrupt ranks)."""
    m = 1 << p
    nbits = 60 - p
    h = _hll_hash(F.col(key_col), salt)
    rest = F.shiftrightunsigned(h, p)
    bit_len = F.length(F.conv(rest.cast("string"), 10, 2))
    rank = (
        F.when(rest == 0, F.lit(nbits + 1))
        .otherwise(F.lit(nbits + 1) - bit_len)
        .cast("int")
    )
    return (
        df.select((h % m).cast("int").alias("register"), rank.alias("rank"))
        .groupBy("register")
        .agg(F.max("rank").alias("max_rank"))
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Union + max: sketches built with the SAME (p, salt) merge
    exactly (register max commutes with building from the concatenated
    input)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("register").agg(F.max("max_rank").alias("max_rank"))


def hll_estimate(sketch: DataFrame, p: int = 12) -> DataFrame:
    """One-row DataFrame (n_registers_set, estimate): the bias-corrected
    harmonic-mean estimator with the small-range linear-counting
    correction (empty registers contribute 2^0 to the harmonic sum and
    drive the linear-counting branch when estimates are small)."""
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    agg = sketch.agg(
        F.count(F.lit(1)).alias("nz"),
        F.sum(F.pow(F.lit(2.0), -F.col("max_rank"))).alias("hsum"),
    )
    raw = F.lit(alpha * m * m) / (F.col("hsum") + (F.lit(m) - F.col("nz")))
    v = F.lit(m) - F.col("nz")
    est = F.when(
        (raw <= 2.5 * m) & (v > 0), F.lit(float(m)) * F.log(F.lit(float(m)) / v)
    ).otherwise(raw)
    return agg.select(
        F.col("nz").alias("n_registers_set"),
        F.round(est).cast("long").alias("estimate"),
    )


# -------------------------------------------------------------- Bloom filter


def _bloom_positions(key, n_hashes: int, m_bits: int, salt: str):
    """Array of the key's n_hashes bit positions (portable md5 family,
    same contract as _bucket/_hll_hash)."""
    return F.array(
        *[
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(f"{salt}~{i}:"), key.cast("string"))),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("bigint")
                % m_bits
            ).cast("int")
            for i in range(n_hashes)
        ]
    )


def bloom_build(
    df: DataFrame,
    key_col: str,
    m_bits: int = 1 << 20,
    n_hashes: int = 5,
    salt: str = "bloom",
) -> DataFrame:
    """Bloom filter (Bloom 1970) as a one-column DataFrame of SET bit
    positions — the membership companion to count-min (frequency) and
    HLL (cardinality) above, same stance: the sketch IS a table.
    Sparse representation: at most min(m_bits, n*k) rows regardless of
    key width, so a billion 2 KB eval n-grams compress to <= m_bits
    ints. Build is one explode + distinct (map-side combine); merge is
    union + distinct (idempotent, so merge == build-on-union exactly).

    Guarantees: NO false negatives ever; false-positive rate
    ~ (1 - exp(-k*n/m))^k — size m_bits for the build cardinality.
    """
    return (
        df.select(
            F.explode(
                _bloom_positions(F.col(key_col), n_hashes, m_bits, salt)
            ).alias("pos")
        )
        .distinct()
    )


def bloom_merge(*sketches: DataFrame) -> DataFrame:
    """Union + distinct: filters built with the SAME (m_bits, n_hashes,
    salt) merge exactly (bit-OR commutes with building from the
    concatenated input)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.distinct()


def bloom_contains(
    keys: DataFrame,
    sketch: DataFrame,
    key_col: str,
    m_bits: int = 1 << 20,
    n_hashes: int = 5,
    salt: str = "bloom",
) -> DataFrame:
    """Adds `maybe_present`: true iff ALL of the key's bit positions are
    set. The sketch side is bounded by m_bits rows -> broadcast join on
    the int position; the probe side never shuffles (the per-key
    all-positions-hit check keys on the probe's own rows).

    Distinct-position bookkeeping matters: two of a key's k hashes can
    collide on one position, so the required hit count is the key's
    DISTINCT position count, not k."""
    probes = keys.withColumn(
        "_bpos",
        F.array_distinct(_bloom_positions(F.col(key_col), n_hashes, m_bits, salt)),
    )
    exploded = probes.select(
        key_col, F.size("_bpos").alias("_need"), F.explode("_bpos").alias("pos")
    )
    hits = (
        exploded.join(
            F.broadcast(sketch.withColumn("_hit", F.lit(1))), "pos", "left"
        )
        .groupBy(key_col, "_need")
        .agg(F.sum(F.coalesce("_hit", F.lit(0))).alias("_got"))
        .select(
            key_col, (F.col("_got") == F.col("_need")).alias("maybe_present")
        )
    )
    return keys.join(hits, key_col, "left").fillna({"maybe_present": False})


# ------------------------------------------------- bottom-k sample (KMV)


def bottomk_build(
    df: DataFrame,
    value_col: str,
    key_col: str | None = None,
    k: int = 1024,
    salt: str = "kmv",
) -> DataFrame:
    """Bottom-k (k-minimum-values) sample sketch (Cohen & Kaplan 2007) —
    the QUANTILE/SAMPLE companion to count-min (frequency), HLL
    (cardinality) and Bloom (membership) above: a uniform-without-
    replacement sample of k rows, chosen as the k smallest values of a
    deterministic hash over the row key. Because the hash is a pure
    function of the row (not an RNG), the same rows win everywhere:
    merge == build-on-union BIT-EXACTLY (pinned in tests), re-runs are
    idempotent, and any engine re-derives the identical sample — the
    same determinism stance as operators/sampling.py.

    Returns (hkey, value): at most k rows, orderable by hkey. Sampling
    is per-KEY: the distinct-key step (one map-side-combined
    aggregation — the same cost class as the other sketch builds here)
    runs BEFORE the bottom-k, so a key appearing a million times weighs
    the same as one appearing once, and build-on-union stays exactly
    equal to merge even when inputs overlap. The bottom-k itself is
    TakeOrdered: per-partition k minima + a k-row merge, no full sort.

    `key_col` defaults to the value itself; pass a row id to quantile
    over rows rather than distinct values. (An md5 collision between
    two DIFFERENT keys would keep an arbitrary one's value — at 60
    hash bits that is negligible and the standard KMV trade.)
    """
    key = F.col(key_col) if key_col else F.col(value_col)
    h = F.md5(F.concat(F.lit(salt + ":"), key.cast("string")))
    return (
        df.select(h.alias("hkey"), F.col(value_col).alias("value"))
        .dropDuplicates(["hkey"])
        .orderBy("hkey")
        .limit(k)
    )


def bottomk_merge(*sketches: DataFrame, k: int = 1024) -> DataFrame:
    """Union + re-take the k smallest hashes. The k minima of a union
    are a subset of the union of per-part k minima, so merging loses
    nothing — the defining KMV property."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    # a key present in several sketches keeps one copy (same hash, same
    # value row) — distinct on hkey guards double-counted overlap
    return out.dropDuplicates(["hkey"]).orderBy("hkey").limit(k)


def bottomk_quantiles(
    sketch: DataFrame, qs: list[float]
) -> DataFrame:
    """Quantile estimates from the sample: one row per requested q with
    the nearest-rank sample value. The sketch is <= k rows, so this is
    driver-trivial compute expressed as a plan (window over k rows);
    error vs the true quantile is the standard sampling error
    O(1/sqrt(k)) in rank space."""
    from pyspark.sql import Window

    n = sketch.count()
    w = Window.orderBy("value")
    ranked = sketch.withColumn("_rn", F.row_number().over(w))
    conds = [
        (F.lit(float(q)), F.greatest(F.least(
            F.round(F.lit(q) * n + 0.5).cast("int"), F.lit(n)), F.lit(1)))
        for q in qs
    ]
    out = None
    for qlit, target in conds:
        row = ranked.filter(F.col("_rn") == target).select(
            qlit.alias("q"), F.col("value").alias("estimate")
        )
        out = row if out is None else out.unionByName(row)
    return out
