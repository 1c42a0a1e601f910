"""Deterministic sampling: rate accuracy, reproducibility, salt
independence — the properties a 100 TB corpus mix actually needs."""

from __future__ import annotations

from fluent_server_spark.operators.sampling import (
    deterministic_sample,
    weighted_sample,
)


def _ids(spark, n=20_000):
    return spark.range(n).withColumnRenamed("id", "doc_id")


def test_rate_accuracy_and_determinism(spark):
    df = _ids(spark)
    s1 = deterministic_sample(df, "doc_id", 0.3, salt="a")
    s2 = deterministic_sample(df, "doc_id", 0.3, salt="a")
    n1, n2 = s1.count(), s2.count()
    assert n1 == n2  # pure function of the row — byte-stable re-runs
    assert abs(n1 / 20_000 - 0.3) < 0.02


def test_nested_rates_are_subsets(spark):
    """sample(rate=0.1) is a strict subset of sample(rate=0.5) under the
    same salt — threshold semantics, so rates can be RAISED later without
    resampling everything (append-only corpus growth)."""
    df = _ids(spark)
    small = {r.doc_id for r in deterministic_sample(df, "doc_id", 0.1).collect()}
    big = {r.doc_id for r in deterministic_sample(df, "doc_id", 0.5).collect()}
    assert small < big


def test_salt_independence(spark):
    """Different salts give independent draws: overlap ~ product of
    rates (how train/eval splits stay honestly disjoint)."""
    df = _ids(spark)
    a = {r.doc_id for r in deterministic_sample(df, "doc_id", 0.5, salt="train").collect()}
    b = {r.doc_id for r in deterministic_sample(df, "doc_id", 0.5, salt="eval").collect()}
    overlap = len(a & b) / 20_000
    assert abs(overlap - 0.25) < 0.02


def test_weighted_sample_per_stratum(spark):
    from pyspark.sql import functions as F

    df = _ids(spark).withColumn(
        "src", F.concat(F.lit("s"), (F.col("doc_id") % 2).cast("string"))
    )
    out = weighted_sample(df, "doc_id", "src", {"s0": 0.8, "s1": 0.1})
    rates = {
        r.src: r.n / 10_000
        for r in out.groupBy("src").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert abs(rates["s0"] - 0.8) < 0.03 and abs(rates["s1"] - 0.1) < 0.03


def test_epoch_shuffle_reproducible_and_epoch_independent(spark):
    from pyspark.sql import functions as F

    from fluent_server_spark.operators.sampling import epoch_shuffle

    df = spark.range(500).select(F.col("id").alias("doc_id"))
    e0a = [r["doc_id"] for r in epoch_shuffle(df, "doc_id", epoch=0).collect()]
    e0b = [r["doc_id"] for r in epoch_shuffle(df, "doc_id", epoch=0).collect()]
    e1 = [r["doc_id"] for r in epoch_shuffle(df, "doc_id", epoch=1).collect()]
    assert e0a == e0b  # pure function of (key, epoch): re-run identical
    assert sorted(e0a) == list(range(500))  # a permutation, nothing lost
    assert e0a != e1  # epochs are independent permutations
    assert e0a != list(range(500))  # and actually shuffled
    # agreement with an engine-independent reference of the same formula
    import hashlib

    def ref_key(k, epoch):
        return int(hashlib.md5(f"epoch-{epoch}{k}".encode()).hexdigest()[:15], 16) % 1_000_000

    want = sorted(range(500), key=lambda k: (ref_key(k, 0), k))
    assert e0a == want


def test_epoch_shuffle_sharded_matches_global_order(spark):
    from pyspark.sql import functions as F

    from fluent_server_spark.operators.sampling import epoch_shuffle

    df = spark.range(500).select(F.col("id").alias("doc_id"))
    flat = [r["doc_id"] for r in epoch_shuffle(df, "doc_id", epoch=3).collect()]
    sharded = epoch_shuffle(df, "doc_id", epoch=3, partitions=8)
    # range partitioning keeps the GLOBAL order when shards are read in
    # partition order (what a sequential shard consumer does)
    per_part = sharded.select(
        "doc_id", F.spark_partition_id().alias("pid")
    ).collect()
    order = [r["doc_id"] for r in per_part]  # collect preserves partition order
    assert order == flat
    pids = [r["pid"] for r in per_part]
    assert pids == sorted(pids) and len(set(pids)) > 1


def test_temperature_mix_rates_math():
    import pytest

    from fluent_server_spark.operators.sampling import temperature_mix_rates

    counts = {"a": 900, "b": 90, "c": 10}
    # alpha=1 with a budget: natural proportions -> one uniform rate
    assert temperature_mix_rates(counts, 1.0, 100) == pytest.approx(
        {"a": 0.1, "b": 0.1, "c": 0.1}
    )
    # alpha=0: uniform target; max feasible budget is 3x the smallest
    # stratum (it hits rate 1.0), others downsample to match its size
    r0 = temperature_mix_rates(counts, 0.0)
    assert r0["c"] == 1.0
    assert r0["a"] == pytest.approx(10 / 900)
    assert r0["b"] == pytest.approx(10 / 90)
    # infeasible budget clamps instead of emitting rates > 1
    r = temperature_mix_rates(counts, 0.5, 10**9)
    assert max(r.values()) == 1.0 and all(0 < v <= 1.0 for v in r.values())
    # zero-count and empty strata never divide by zero
    assert temperature_mix_rates({"a": 0}, 0.5) == {"a": 0.0}
    with pytest.raises(ValueError):
        temperature_mix_rates(counts, -0.1)


def test_temperature_mix_on_dataframe(spark):
    from pyspark.sql import functions as F

    from fluent_server_spark.operators.sampling import temperature_mix

    df = (
        _ids(spark, 30_000)
        .withColumn(
            "source",
            F.when(F.col("doc_id") < 27_000, "big").otherwise("small"),
        )
    )
    # alpha=0 -> equal expected contributions from both strata
    out = temperature_mix(df, "doc_id", "source", alpha=0.0)
    by = {r["source"]: r["n"] for r in out.groupBy("source").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert by["small"] == 3000  # rate 1.0 — kept whole
    assert abs(by["big"] - 3000) / 3000 < 0.1  # hash-rate tolerance
    # determinism: re-running yields the identical sample
    ids1 = {r["doc_id"] for r in out.collect()}
    ids2 = {r["doc_id"] for r in temperature_mix(
        df, "doc_id", "source", alpha=0.0).collect()}
    assert ids1 == ids2


def test_cluster_safe_splits(spark):
    import pytest
    from pyspark.sql import functions as F

    from fluent_server_spark.operators.dedup import connected_components
    from fluent_server_spark.operators.sampling import cluster_safe_splits

    docs = _ids(spark, 5000)
    # chain duplicates: every doc_id < 300 pairs with doc_id+100 (three
    # overlapping chains -> clusters of size up to 4)
    pairs = (
        spark.range(300)
        .select(F.col("id").alias("a_id"), (F.col("id") + 100).alias("b_id"))
    )
    clusters = connected_components(pairs).select(
        F.col("id").alias("doc_id"), F.col("component").alias("cluster_id")
    )
    out = cluster_safe_splits(
        docs, clusters, "doc_id", {"train": 0.8, "eval": 0.2}
    )
    rows = out.collect()
    assert len(rows) == 5000
    # every cluster wholly in one split (the leakage-safety claim)
    by_key: dict = {}
    for r in rows:
        by_key.setdefault(r["split_key"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_key.values())
    # the chained ids 0..399 collapse onto 100 clusters, each atomic
    chained = [r for r in rows if r["doc_id"] < 400]
    assert len({r["split_key"] for r in chained}) == 100
    # proportions near the weights; deterministic under re-run
    n_eval = sum(1 for r in rows if r["split"] == "eval")
    assert abs(n_eval / 5000 - 0.2) < 0.03
    again = {
        (r["doc_id"], r["split"])
        for r in cluster_safe_splits(
            docs, clusters, "doc_id", {"train": 0.8, "eval": 0.2}
        ).collect()
    }
    assert again == {(r["doc_id"], r["split"]) for r in rows}
    # monotone re-weighting: growing eval only ever PULLS keys from
    # train (eval is a superset of the smaller-eval assignment)
    bigger = cluster_safe_splits(
        docs, clusters, "doc_id", {"train": 0.6, "eval": 0.4}
    ).collect()
    eval_small = {r["doc_id"] for r in rows if r["split"] == "eval"}
    eval_big = {r["doc_id"] for r in bigger if r["split"] == "eval"}
    assert eval_small <= eval_big
    with pytest.raises(ValueError):
        cluster_safe_splits(docs, clusters, "doc_id", {"train": 0.0})


# ------------------------------------------------- per-key cap

def test_cap_per_key_basic_and_invariant(spark):
    from fluent_server_spark.operators.sampling import cap_per_key

    rows = [(i, f"src{i % 3}") for i in range(40)] + [(100 + i, "viral") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = cap_per_key(df, "source", cap=5, id_col="doc_id")
    pdf = kept.toPandas()
    # cap respected everywhere, small keys keep everything they have
    assert pdf.groupby("source").size().le(5).all()
    assert set(pdf.groupby("source").size().index) == {"src0", "src1", "src2", "viral"}
    assert (pdf.key_rank >= 1).all() and (pdf.key_rank <= 5).all()
    # kept set is a pure function of the input: partitioning-invariant
    kept2 = cap_per_key(df.repartition(13), "source", cap=5, id_col="doc_id")
    assert sorted(map(tuple, pdf[["doc_id", "key_rank"]].values.tolist())) == sorted(
        map(tuple, kept2.toPandas()[["doc_id", "key_rank"]].values.tolist())
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="cap"):
        cap_per_key(df, "source", cap=0)


def test_corpus_profile_values(spark):
    from fluent_server_spark.operators.profile import corpus_profile

    rows = [
        (0, "aaa", "en", "s1"), (1, "aaa", "en", "s1"),
        (2, "bbbb", "fr", "s2"), (3, None, "en", "s2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    got = {r.metric: r.value for r in corpus_profile(df).collect()}
    assert got["n_docs"] == 4.0
    assert got["total_chars"] == 10.0  # 3 + 3 + 4 + 0 (NULL counts as '')
    assert got["distinct_texts"] == 3.0  # 'aaa', 'bbbb', ''
    assert got["dup_rate"] == 0.25
    assert got["n_langs"] == 2.0 and got["top_lang_share"] == 0.75
    assert got["n_sources"] == 2.0 and got["top_source_share"] == 0.5
