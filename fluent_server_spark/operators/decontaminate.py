"""Benchmark decontamination — flag training documents that share word
n-grams with a held-out evaluation set.

The standard LLM-corpus hygiene pass (per the GPT-3/PaLM appendices:
"remove any training document sharing an N-gram with the eval set").
Shape at 100 TB:

* the eval set is SMALL (thousands of documents) — its distinct hashed
  gram set fits in memory, so the overlap join is a **broadcast** hash
  join: the 100 TB train side never shuffles, the whole pass is one
  narrow scan + map-side join + one aggregation keyed on doc_id.
* grams stay RAW STRINGS: hashing would cost one md5 per train gram
  (the dominant CPU at 100 TB — measured 2x of this operator's wall at
  sf0.1) and buys nothing, since the broadcast side is bounded by the
  eval set either way and string equality replays exactly in the DuckDB
  oracle. The dedup family hashes its shingles because they flow through
  SHUFFLES (key width matters there); this join's build side is a
  broadcast, so width is a one-time driver cost.

Reference analogue: none (the reference routes events, it has no corpus
semantics) — this is part of the mandated training-data operator family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fluent_server_spark.operators.dedup import with_shingles


def eval_gram_set(
    eval_docs: DataFrame, text_col: str = "text", n: int = 5, impl: str = "fold"
) -> DataFrame:
    """Distinct n-grams of the eval set — the (small) broadcast side."""
    return (
        with_shingles(eval_docs, text_col, n, out="hg", impl=impl)
        .select(F.explode("hg").alias("g"))
        .distinct()
    )


def _gram_impl(side: DataFrame, impl: str) -> str:
    """Resolve impl='auto' PER SIDE: the batched Arrow gram kernel wins
    once that side is big enough to amortize its fixed Python-stage costs
    (measured: -0.8 s at sf1.0, +0.2 s at sf0.1 on local[32]); below
    the threshold the Catalyst chain is the faster AND the r5 shape, so
    small inputs keep the round-5 plan exactly. Unknown input size
    (non-file source) chooses Arrow (the at-scale default). Both paths
    are pinned element-order-equal in tests/test_dedup.py, so the
    choice is pure physical planning."""
    if impl != "auto":
        return impl
    from fluent_server_spark.queries import input_bytes

    b = input_bytes(side)
    return "arrow" if b is None or b >= (3 << 20) else "fold"


def decontaminate(
    train: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    impl: str = "auto",
) -> DataFrame:
    """Per train doc: how many of its distinct n-grams appear anywhere in
    the eval set, and the resulting contamination flag.

    Returns (id_col, n_hits, contaminated) for EVERY train doc — callers
    filter `~contaminated` to get the clean corpus, or keep the counts
    for an audit table. The eval gram set is broadcast: the train side
    stays un-shuffled except the final per-doc count (keyed on id_col,
    combine-heavy, uniform).
    """
    # each side resolves its own impl from its own size (review r6: a
    # big train slice must not force the Arrow kernel's fixed Python-
    # stage cost onto a tiny eval set — the usual shape at scale)
    grams = with_shingles(
        train, text_col, n, out="hg", impl=_gram_impl(train, impl)
    ).select(id_col, F.explode("hg").alias("g"))
    hits = (
        grams.join(
            F.broadcast(
                eval_gram_set(eval_docs, text_col, n, _gram_impl(eval_docs, impl))
            ),
            "g",
        )
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        train.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def decontaminate_bloom(
    train: DataFrame,
    eval_bloom: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    m_bits: int = 1 << 20,
    n_hashes: int = 5,
    salt: str = "decon",
) -> DataFrame:
    """The SCALE PATH of :func:`decontaminate` for when the eval gram
    set outgrows a raw-string broadcast (a multi-benchmark eval suite
    can reach 10^8+ distinct grams x ~50 bytes — too big to ship to
    every executor as strings). `eval_bloom` is
    ``sketches.bloom_build(eval_gram_set(...), "g", m_bits, ...)`` —
    at most m_bits int rows no matter how wide or many the grams, built
    once, parquet-storable, and mergeable across eval suites by
    bloom_merge (union + distinct).

    Guarantee direction is the SAFE one for hygiene: a Bloom filter has
    no false negatives, so every truly contaminated doc is flagged here
    too (pinned against the exact operator in tests); false positives
    over-flag at the ~(1-exp(-kn/m))^k rate — size m_bits accordingly.

    Returns (id_col, n_maybe_hits, contaminated) for every train doc —
    the same contract as :func:`decontaminate`, with the count renamed
    to say "maybe": at 100 TB you either accept the tiny over-drop or
    route flagged docs through the exact broadcast check as a second,
    now-small pass (classic bloom two-phase).
    """
    from fluent_server_spark.operators.sketches import bloom_contains

    grams = with_shingles(
        train, text_col, n, out="hg", impl=_gram_impl(train, "auto")
    ).select(
        id_col, F.explode("hg").alias("g")
    )
    # membership is a pure function of the gram -> probe each DISTINCT
    # gram once (the dedup the exact path gets for free from broadcast)
    flagged = bloom_contains(
        grams.select("g").distinct(), eval_bloom, "g", m_bits, n_hashes, salt
    ).filter("maybe_present").select("g")
    hits = (
        grams.join(flagged, "g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_maybe_hits"))
    )
    return (
        train.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_maybe_hits", F.lit(0)).cast("bigint").alias("n_maybe_hits"),
            (F.coalesce("n_maybe_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def decontaminate_semantic(
    train_vectors: DataFrame,
    eval_vectors: DataFrame,
    centroids: list[list[float]],
    eps: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SEMANTIC decontamination — flag training items whose EMBEDDING is
    within eps cosine of any held-out eval item. The n-gram operators
    above catch verbatim and near-verbatim leakage; this catches
    paraphrased eval contamination (the published concern behind
    embedding-based decontamination in recent model cards), and it IS
    :func:`fluent_server_spark.operators.semdedup.semdedup_against`
    with the roles cast as batch=train, corpus=eval: cell-pruned
    equi-join, never train x eval all-pairs, eval side tiny.

    Returns (id_col, cell, contaminated) per train item.
    """
    from fluent_server_spark.operators.semdedup import semdedup_against

    flags = semdedup_against(
        train_vectors, eval_vectors, centroids, eps, id_col, vec_col
    )
    return flags.select(
        id_col, "cell", F.col("is_semdup").alias("contaminated")
    )
