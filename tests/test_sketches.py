"""Count-min sketch: one-sided error, eps bound, exact mergeability."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fluent_server_spark.operators.sketches import (
    count_min_build,
    count_min_estimate,
    count_min_merge,
)

DEPTH, WIDTH = 5, 256


@pytest.fixture(scope="module")
def stream(spark):
    # zipf-ish skew: key k appears ~ N/(k+1) times
    return spark.range(20_000).select(
        (F.floor(F.sqrt(F.col("id") * 8)) % 200).cast("string").alias("key")
    )


def test_estimates_are_one_sided_and_bounded(spark, stream):
    sketch = count_min_build(stream, "key", depth=DEPTH, width=WIDTH)
    truth = {r["key"]: r["n"] for r in stream.groupBy("key").agg(F.count(F.lit(1)).alias("n")).collect()}
    keys = stream.select("key").distinct()
    est = {
        r["key"]: r["estimate"]
        for r in count_min_estimate(sketch, keys, "key", depth=DEPTH, width=WIDTH).collect()
    }
    n_total = sum(truth.values())
    eps_bound = (2.718 / WIDTH) * n_total  # e/width * N
    assert set(est) == set(truth)
    for k, t in truth.items():
        assert est[k] >= t  # never undercounts
        assert est[k] - t <= 3 * eps_bound  # generous prob slack
    # the heaviest key collides with almost nothing relative to itself
    top = max(truth, key=truth.get)
    assert est[top] - truth[top] <= 0.2 * truth[top]


def test_merge_is_exact(spark, stream):
    a = stream.filter(F.col("key").cast("int") % 2 == 0)
    b = stream.filter(F.col("key").cast("int") % 2 == 1)
    merged = count_min_merge(
        count_min_build(a, "key", depth=DEPTH, width=WIDTH),
        count_min_build(b, "key", depth=DEPTH, width=WIDTH),
    )
    direct = count_min_build(stream, "key", depth=DEPTH, width=WIDTH)
    m = {(r["d"], r["bucket"]): r["cnt"] for r in merged.collect()}
    d = {(r["d"], r["bucket"]): r["cnt"] for r in direct.collect()}
    assert m == d  # counter addition == building from the union


def test_weighted_sketch(spark):
    df = spark.createDataFrame(
        [("a", 10), ("a", 5), ("b", 1)], "key string, bytes long"
    )
    sketch = count_min_build(df, "key", depth=DEPTH, width=WIDTH, weight_col="bytes")
    est = {
        r["key"]: r["estimate"]
        for r in count_min_estimate(
            sketch, df.select("key").distinct(), "key", depth=DEPTH, width=WIDTH
        ).collect()
    }
    assert est["a"] >= 15 and est["b"] >= 1


def test_hll_estimate_within_error_bound(spark):
    """p=12 -> 4096 registers -> ~1.6% standard error; the estimate on
    30k distinct keys must land within a generous 3-sigma (5%), and the
    duplicate-heavy stream must estimate its DISTINCT count, not its
    row count."""
    from fluent_server_spark.operators.sketches import hll_build, hll_estimate

    n_distinct = 30_000
    dupes = spark.range(n_distinct * 3).select(
        (F.col("id") % n_distinct).cast("string").alias("key")
    )
    est = hll_estimate(hll_build(dupes, "key", p=12), p=12).collect()[0]
    assert abs(est["estimate"] - n_distinct) <= 0.05 * n_distinct
    assert est["n_registers_set"] <= 4096


def test_hll_small_range_linear_counting(spark):
    """Tiny cardinalities go through the linear-counting branch and
    come out near-exact (a raw harmonic estimate would be biased)."""
    from fluent_server_spark.operators.sketches import hll_build, hll_estimate

    df = spark.range(50).select(F.col("id").cast("string").alias("key"))
    est = hll_estimate(hll_build(df, "key", p=12), p=12).collect()[0]
    assert abs(est["estimate"] - 50) <= 2


def test_hll_merge_is_exact_and_idempotent(spark):
    """merge(A, B) must be BIT-EQUAL to build(A union B) (register max
    commutes with building from the concatenated input), and merging a
    sketch with itself must change nothing (max is idempotent) — the
    property that makes epoch re-ingest safe."""
    from fluent_server_spark.operators.sketches import hll_build, hll_merge

    base = spark.range(10_000).select(F.col("id").cast("string").alias("key"))
    a = base.filter(F.col("id") % 2 == 0)
    b = base.filter(F.col("id") % 2 == 1)

    def rows(df):
        return {(r["register"], r["max_rank"]) for r in df.collect()}

    sa, sb = hll_build(a, "key"), hll_build(b, "key")
    assert rows(hll_merge(sa, sb)) == rows(hll_build(base, "key"))
    assert rows(hll_merge(sa, sa)) == rows(sa)


def test_hll_rank_arithmetic_is_integer_exact(spark):
    """The rank must be (60-p)+1 - bit_length(suffix) computed via
    base-2 string length — pin a few hand-computed hashes end-to-end so
    a refactor to floating log2 (boundary-rounding hazard) fails."""
    import hashlib

    from fluent_server_spark.operators.sketches import hll_build

    p, salt = 12, "hll"
    keys = ["a", "b", "c", "xyz", "42"]
    want = {}
    for k in keys:
        h = int(hashlib.md5(f"{salt}:{k}".encode()).hexdigest()[:15], 16)
        reg, rest = h % (1 << p), h >> p
        rank = (60 - p) + 1 - rest.bit_length() if rest else (60 - p) + 1
        want[reg] = max(want.get(reg, 0), rank)
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    got = {
        r["register"]: r["max_rank"] for r in hll_build(df, "key", p=p).collect()
    }
    assert got == want


# -------------------------------------------------------------- Bloom filter


def test_bloom_no_false_negatives_and_fp_bounded(spark):
    from fluent_server_spark.operators.sketches import bloom_build, bloom_contains

    members = spark.range(0, 2000).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k")
    )
    probes_in = members
    probes_out = spark.range(0, 5000).select(
        F.concat(F.lit("other-"), F.col("id")).alias("k")
    )
    m, k = 1 << 16, 5
    sk = bloom_build(members, "k", m_bits=m, n_hashes=k)
    assert sk.count() <= min(m, 2000 * k)
    # zero false negatives
    got = bloom_contains(probes_in, sk, "k", m_bits=m, n_hashes=k)
    assert got.filter("NOT maybe_present").count() == 0
    # FP rate near (1 - e^{-kn/m})^k ~ 0.0005 at n=2000; allow 10x slack
    fp = bloom_contains(probes_out, sk, "k", m_bits=m, n_hashes=k)
    assert fp.filter("maybe_present").count() <= 25


def test_bloom_merge_equals_build_on_union(spark):
    from fluent_server_spark.operators.sketches import bloom_build, bloom_merge

    a = spark.range(0, 500).select(F.col("id").cast("string").alias("k"))
    b = spark.range(400, 900).select(F.col("id").cast("string").alias("k"))
    m, k = 1 << 14, 4
    merged = bloom_merge(
        bloom_build(a, "k", m, k), bloom_build(b, "k", m, k)
    )
    direct = bloom_build(a.unionByName(b), "k", m, k)
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0
    # idempotent: merging with itself changes nothing
    twice = bloom_merge(merged, merged)
    assert twice.count() == merged.count()


def test_bloom_hash_collision_bookkeeping(spark):
    """With m tiny, a key's k hashes collide on fewer distinct positions;
    membership must still require exactly the distinct set (a key whose
    positions are all set by OTHERS reads maybe_present — that is the
    false positive by design — but a key never fails on its own
    collision)."""
    from fluent_server_spark.operators.sketches import bloom_build, bloom_contains

    keys = spark.createDataFrame([("x",), ("y",), ("z",)], "k string")
    sk = bloom_build(keys, "k", m_bits=7, n_hashes=6)
    got = bloom_contains(keys, sk, "k", m_bits=7, n_hashes=6)
    assert got.filter("NOT maybe_present").count() == 0


def test_decontaminate_bloom_superset_of_exact(spark):
    """Bloom decontamination must flag EVERY doc the exact operator
    flags (no false negatives); over-flagging is allowed and rate-bounded
    by the filter size."""
    from fluent_server_spark.operators.decontaminate import (
        decontaminate,
        decontaminate_bloom,
        eval_gram_set,
    )
    from fluent_server_spark.operators.sketches import bloom_build

    train = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta eta theta"),
            (1, "one two three four five six seven eight nine"),
            (2, "totally clean document with no overlap at all here"),
            (3, "alpha beta gamma delta epsilon again padded words x"),
        ],
        "doc_id int, text string",
    )
    eval_docs = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon held out")],
        "doc_id int, text string",
    )
    n = 5
    exact = {
        r["doc_id"]: r["contaminated"]
        for r in decontaminate(train, eval_docs, n=n).collect()
    }
    m, k, salt = 1 << 14, 5, "decon-test"
    bloom = bloom_build(
        eval_gram_set(eval_docs, n=n), "g", m_bits=m, n_hashes=k, salt=salt
    )
    approx = {
        r["doc_id"]: r["contaminated"]
        for r in decontaminate_bloom(
            train, bloom, n=n, m_bits=m, n_hashes=k, salt=salt
        ).collect()
    }
    assert set(exact) == set(approx) == {0, 1, 2, 3}
    for d, c in exact.items():
        if c:
            assert approx[d], f"bloom missed contaminated doc {d}"
    # at this filter size there should be no false positives either
    assert approx == exact


# ------------------------------------------------- bottom-k sample (KMV)


def test_bottomk_merge_equals_build_on_union_bitexact(spark):
    from fluent_server_spark.operators.sketches import bottomk_build, bottomk_merge

    a = spark.range(0, 3000).select(F.col("id").alias("v"))
    b = spark.range(2000, 6000).select(F.col("id").alias("v"))  # overlap
    k = 256
    merged = bottomk_merge(
        bottomk_build(a, "v", k=k), bottomk_build(b, "v", k=k), k=k
    )
    direct = bottomk_build(a.unionByName(b), "v", k=k)
    # set compare via collect (exceptAll over TakeOrdered+dedup plans
    # trips INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND in Spark 4.1's planner)
    mrows = {(r["hkey"], r["value"]) for r in merged.collect()}
    drows = {(r["hkey"], r["value"]) for r in direct.collect()}
    assert len(mrows) == k and len(drows) == k
    assert mrows == drows


def test_bottomk_sample_is_uniform_enough_for_quantiles(spark):
    from fluent_server_spark.operators.sketches import (
        bottomk_build,
        bottomk_quantiles,
    )

    n = 20000
    df = spark.range(0, n).select(F.col("id").cast("double").alias("v"))
    sk = bottomk_build(df, "v", k=1024)
    got = {r["q"]: r["estimate"] for r in bottomk_quantiles(sk, [0.1, 0.5, 0.9]).collect()}
    # rank-space error ~ O(1/sqrt(k)) ~ 3%; allow 6% of the range
    for q, est in got.items():
        assert abs(est - q * n) < 0.06 * n, (q, est)


def test_bottomk_idempotent_and_bounded(spark):
    from fluent_server_spark.operators.sketches import bottomk_build, bottomk_merge

    df = spark.range(0, 500).select(F.col("id").alias("v"))
    sk = bottomk_build(df, "v", k=64)
    assert sk.count() == 64
    twice = bottomk_merge(sk, sk, k=64)
    assert twice.count() == 64
    assert {(r["hkey"], r["value"]) for r in twice.collect()} == {
        (r["hkey"], r["value"]) for r in sk.collect()
    }
    # fewer rows than k: the sketch IS the (keyed) input
    small = bottomk_build(df.limit(10), "v", k=64)
    assert small.count() == 10
