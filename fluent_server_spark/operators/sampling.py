"""Deterministic, reproducible corpus sampling — the mixing step of a
training-data pipeline (sample source A at 80%, source B at 15%, ...).

`rand()`-based sampling is NOT reproducible across retries, partitions,
or engines; at 100 TB a corpus mix must be a PURE FUNCTION of the row so
re-runs, resumes, and audits see the identical sample. Here the keep
decision is `md5(salt || key) mod 10^6 < rate * 10^6` — portable
arithmetic (same construction as the dedup shingle hash), so the DuckDB
oracle replays the exact sample, and ANY engine can re-derive membership.

This is also how you carve held-out sets that stay disjoint forever:
different salts give independent hashes, so `sample(salt='train')` and
`sample(salt='eval')` overlap at exactly the product rate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_MOD = 1_000_000


def sample_hash(key: Column, salt: str) -> Column:
    """Uniform [0, 1e6) bucket: first 15 md5 hex chars of salt||key.
    DuckDB twin: CAST('0x' || substr(md5('<salt>' || CAST(key AS
    VARCHAR)), 1, 15) AS BIGINT) % 1000000."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 15), 16, 10
    ).cast("bigint")
    return h % _MOD


def deterministic_sample(
    df: DataFrame, key_col: str, rate: float, salt: str = "sample"
) -> DataFrame:
    """Keep ~rate of rows, decided per-key by hash — reproducible, narrow
    (no shuffle, no RNG state), and pushdown-friendly (a plain filter)."""
    return df.filter(sample_hash(F.col(key_col), salt) < int(rate * _MOD))


def weighted_sample_pred(
    key_col: str,
    rate_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "mix",
) -> Column:
    """The membership DECISION of :func:`weighted_sample` as a boolean
    Column — usable as a filter (sampling) or as a flag (auditing the
    mix without dropping rows). Rates ride the plan as a literal CASE —
    no join, no shuffle."""
    expr = None
    for value, rate in sorted(rates.items()):
        cond = F.col(rate_col) == value
        thresh = F.lit(int(rate * _MOD))
        expr = F.when(cond, thresh) if expr is None else expr.when(cond, thresh)
    expr = (
        expr.otherwise(F.lit(int(default_rate * _MOD)))
        if expr is not None
        else F.lit(int(default_rate * _MOD))
    )
    return sample_hash(F.col(key_col), salt) < expr


def weighted_sample(
    df: DataFrame,
    key_col: str,
    rate_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "mix",
) -> DataFrame:
    """Per-stratum rates (e.g. per `source`): the corpus-mixing primitive."""
    return df.filter(
        weighted_sample_pred(key_col, rate_col, rates, default_rate, salt)
    )


def epoch_shuffle(
    df: DataFrame,
    key_col: str,
    epoch: int,
    salt: str = "epoch",
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic per-epoch training order: a GLOBAL pseudo-random
    permutation that is a pure function of (key, epoch) — the same
    reproducibility contract as the samplers above, applied to ORDER.
    `orderBy(rand())` is neither reproducible across retries nor stable
    under partition changes; here the sort key is the portable
    `sample_hash(salt-epoch || key)`, so every engine, resume, and audit
    derives the identical order, and epoch k+1 is a fresh independent
    permutation of epoch k (different salt input -> independent hash).

    Scale shape: one range-partitioned sort (repartitionByRange on the
    hash, then a per-partition sort) — exactly what writing a shuffled
    training shard layout costs anyway; downstream sequence packing
    reads the shards in order. Ties (hash collisions at 1e-6 density)
    break deterministically on the key itself."""
    h = sample_hash(F.col(key_col), f"{salt}-{epoch}")
    out = df.withColumn("_shuffle_key", h)
    if partitions is not None:
        # shard layout: globally ordered ACROSS shards (range partition)
        # and within each (local sort) — no single-reducer global sort
        out = out.repartitionByRange(partitions, "_shuffle_key", key_col)
        return out.sortWithinPartitions("_shuffle_key", key_col).drop(
            "_shuffle_key"
        )
    return out.orderBy("_shuffle_key", key_col).drop("_shuffle_key")


def temperature_mix_rates(
    counts: dict[str, int],
    alpha: float,
    budget: int | None = None,
) -> dict[str, float]:
    """Temperature-scaled mixture rates — the published multilingual /
    multi-domain reweighting rule (multilingual BERT, XLM-R: sample
    domain i with probability p_i ∝ q_i^alpha where q_i is its corpus
    share; alpha=1 is natural proportions, alpha→0 is uniform).

    Given per-stratum row counts, returns per-stratum KEEP RATES for
    :func:`weighted_sample` such that the expected sample follows the
    temperature distribution. `budget` is the target total row count;
    when omitted, the largest feasible budget is used (the one that
    drives the tightest stratum to rate 1.0 — pure downsampling, never
    an impossible rate > 1).

    Driver-side math over a dict of counts (one row per stratum — the
    same bounded-collect contract as the IVF seeds and z-order bounds);
    the heavy lifting stays in the weighted_sample hash predicate.
    """
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    pos = {k: v for k, v in counts.items() if v > 0}
    if not pos:
        return {k: 0.0 for k in counts}
    total = sum(pos.values())
    weights = {k: (v / total) ** alpha for k, v in pos.items()}
    wsum = sum(weights.values())
    probs = {k: w / wsum for k, w in weights.items()}
    # feasibility: budget * p_k <= count_k for every stratum
    max_budget = min(c / probs[k] for k, c in pos.items())
    b = max_budget if budget is None else min(float(budget), max_budget)
    rates = {k: min(1.0, b * probs[k] / c) for k, c in pos.items()}
    return {k: rates.get(k, 0.0) for k in counts}


def temperature_mix(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    alpha: float,
    budget: int | None = None,
    salt: str = "tmix",
) -> DataFrame:
    """One-call temperature mixing: count strata (one agg, bounded rows),
    derive rates, filter via the portable hash predicate. The counts
    collect is bounded by the number of strata (sources/languages —
    thousands at most), never by corpus size."""
    counts = {
        r["k"]: r["n"]
        for r in df.groupBy(F.col(stratum_col).alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    rates = temperature_mix_rates(counts, alpha, budget)
    return weighted_sample(df, key_col, stratum_col, rates, salt=salt)


def cluster_safe_splits(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str,
    split_weights: dict[str, float],
    salt: str = "split",
    cluster_id_col: str = "cluster_id",
) -> DataFrame:
    """Leakage-safe train/eval splitting: assign near-dup CLUSTERS to
    splits, not documents, so no near-duplicate pair ever straddles a
    split boundary (the contamination mode Lee et al. 2022 measure:
    eval examples with a near-dup in train overstate model quality).

    `clusters` is the (id, cluster_id) output of connected components
    over any near-dup relation in this repo (minhash, simhash,
    embedding LSH, SemDeDup). Documents absent from it are singletons
    and use their own id as the split key — a LEFT join + coalesce, so
    the cluster table only needs rows for docs that HAVE a duplicate.

    The split is the portable hash bucket of the CLUSTER key cut at the
    cumulative weights (split names in sorted order), which makes every
    member of a cluster land in the same split by construction, keeps
    membership a pure function of (cluster, salt), and — because the
    thresholds are cumulative — keeps re-weighting monotone: growing a
    split's weight only MOVES keys in from its sorted successors, never
    reshuffles the whole corpus.

    Scale: one keyed equi-join (docs x cluster map; the map is one row
    per clustered doc, usually a small fraction of the corpus) + a
    narrow hash predicate. No window, no collect.
    """
    total = sum(split_weights.values())
    if total <= 0 or any(w < 0 for w in split_weights.values()):
        raise ValueError(f"split weights must be >= 0 with a positive sum: {split_weights}")
    cmap = clusters.select(
        F.col(id_col).alias("_sid"), F.col(cluster_id_col).alias("_cluster")
    )
    joined = docs.join(cmap, docs[id_col] == cmap["_sid"], "left").drop("_sid")
    key = F.coalesce(F.col("_cluster"), F.col(id_col))
    h = sample_hash(key, salt)
    cum = 0.0
    expr = None
    for name, w in sorted(split_weights.items()):
        cum += w / total
        cond = h < int(cum * _MOD)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    # float-rounding tail: the last split absorbs hash values at the
    # boundary (cum ends at 1.0 up to fp error)
    last = sorted(split_weights)[-1]
    expr = expr.otherwise(F.lit(last))
    return joined.withColumn("split_key", key).withColumn("split", expr).drop(
        "_cluster"
    )


def cap_per_key(
    df: DataFrame,
    key_col: str,
    cap: int,
    id_col: str = "doc_id",
    salt: str = "cap",
) -> DataFrame:
    """Per-key document cap — the RefinedWeb/C4-style per-domain limit
    that stops one source from dominating the corpus mix. Keeps at most
    `cap` rows per key; survivors are chosen by the portable
    `sample_hash(salt || id)` order (ties break on the id), so the kept
    set is a pure function of the input — engine-, partitioning-, and
    retry-invariant, and NOT biased toward ingest order the way a
    naive LIMIT per file would be. Output: input rows + `key_rank`
    (1-based within key), filtered to key_rank <= cap.

    Scale shape: ONE window over hash(key) — the same single exchange
    any per-key top-k costs (no join, no second pass). A viral key
    costs one linear scan of its rows, never a quadratic candidate
    set; if one key alone exceeds an executor's sort budget, the
    standard salt-split applies upstream. DuckDB replay: ROW_NUMBER()
    OVER (PARTITION BY key ORDER BY the md5 construction in
    sample_hash's docstring, id) — pinned in the registry guard via
    the pre-staged `source_cap` oracle pair."""
    if cap < 1:
        raise ValueError(f"cap={cap} must be >= 1 (0 would drop every key)")
    w = Window.partitionBy(key_col).orderBy(
        sample_hash(F.col(id_col), salt), F.col(id_col)
    )
    return df.withColumn("key_rank", F.row_number().over(w)).filter(
        F.col("key_rank") <= cap
    )
