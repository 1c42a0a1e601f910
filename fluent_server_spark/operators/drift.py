"""Corpus drift monitoring — distribution shift between two corpus
snapshots (epochs, crawls, pipeline versions).

Production training-data pipelines watch for silent input shift: a
crawler change, an upstream filter regression, or a source going dark
moves the corpus distribution long before anyone reads samples. The
standard detector is a divergence between the old and new term
distributions; Jensen–Shannon divergence is the published choice
(symmetric, bounded — ln 2 in nats — and defined when supports differ,
unlike KL; it is also the similarity measure the Pile analysis and
DSIR's own corpus comparisons use).

Representation reuses the DSIR featurization (operators/dsir.py):
a corpus IS a hashed gram-bucket distribution — a ≤B-row mergeable
(bucket, cnt) DataFrame built by one explode + one map-side-combined
agg. Drift between two corpora is then a full-outer join of two tiny
tables plus per-bucket arithmetic: essentially free next to the scans
that built the counts, and the counts themselves are the same
artifacts a DSIR/epoch pipeline already maintains.

Outputs:
- :func:`distribution_drift` — per-bucket JS contributions (pure
  row-level functions of integer counts, so the DuckDB oracle replays
  them exactly; the pre-staged pair is queries/sketch_oracles.py::
  corpus_drift);
- :func:`drift_summary` — the scalar JSD/L1/support deltas (float SUMS
  over buckets — order-dependent at the last bit, so the summary is
  for humans and thresholds, not for byte-exact oracles);
- :func:`source_drift` — per-stratum share deltas (which SOURCE moved),
  the first question after the alarm fires.

Scale: the corpus-sized work is the two gram_bucket_counts scans
(linear, no joins); everything here joins ≤B-row tables. At 10^12
docs you'd keep per-epoch bucket counts as tables (they merge by
union + re-sum) and diff any two epochs in milliseconds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fluent_server_spark.operators.dsir import DSIR_BUCKETS, gram_bucket_counts


def distribution_drift(
    old_counts: DataFrame,
    new_counts: DataFrame,
) -> DataFrame:
    """Per-bucket Jensen–Shannon contributions between two (bucket, cnt)
    distributions: p = old share, q = new share, m = (p+q)/2,
    js_contrib = (p·ln(p/m) + q·ln(q/m)) / 2 (0 where the side is 0).
    Sum of js_contrib over buckets = JSD in nats, ∈ [0, ln 2].

    Contributions are rounded to 10 decimals (the dsir llr convention)
    so each ROW is an engine-portable pure function of the two integer
    count tables."""
    o = old_counts.select("bucket", F.col("cnt").alias("_oc"))
    n = new_counts.select("bucket", F.col("cnt").alias("_nc"))
    joined = o.join(n, ["bucket"], "full_outer").select(
        "bucket",
        F.coalesce("_oc", F.lit(0)).alias("old_cnt"),
        F.coalesce("_nc", F.lit(0)).alias("new_cnt"),
    )
    totals = joined.agg(
        F.sum("old_cnt").alias("_ot"), F.sum("new_cnt").alias("_nt")
    )
    j = joined.crossJoin(F.broadcast(totals))
    p = F.col("old_cnt") / F.col("_ot")
    q = F.col("new_cnt") / F.col("_nt")
    m = (p + q) / 2
    term = lambda x: F.when(x > 0, x * F.log(x / m)).otherwise(F.lit(0.0))  # noqa: E731
    return j.select(
        "bucket",
        "old_cnt",
        "new_cnt",
        F.round((term(p) + term(q)) / 2, 10).alias("js_contrib"),
    )


def drift_summary(
    old_counts: DataFrame,
    new_counts: DataFrame,
) -> DataFrame:
    """One row: jsd (nats, 0 = identical, ln 2 ≈ 0.6931 = disjoint),
    l1 distance (∈ [0, 2]), and support gained/lost bucket counts.
    Float sums — threshold material, not oracle material."""
    d = distribution_drift(old_counts, new_counts)
    tot = d.agg(
        F.sum("old_cnt").alias("_ot"), F.sum("new_cnt").alias("_nt")
    )
    return (
        d.crossJoin(F.broadcast(tot))
        .agg(
            F.sum("js_contrib").alias("jsd"),
            F.sum(
                F.abs(
                    F.col("old_cnt") / F.col("_ot")
                    - F.col("new_cnt") / F.col("_nt")
                )
            ).alias("l1"),
            F.sum(
                ((F.col("old_cnt") == 0) & (F.col("new_cnt") > 0)).cast("long")
            ).alias("buckets_gained"),
            F.sum(
                ((F.col("old_cnt") > 0) & (F.col("new_cnt") == 0)).cast("long")
            ).alias("buckets_lost"),
        )
    )


def corpus_drift(
    old_docs: DataFrame,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
    salt: str = "dsir",
) -> DataFrame:
    """End-to-end: featurize both corpora (the only corpus-sized work)
    and return the per-bucket drift table."""
    return distribution_drift(
        gram_bucket_counts(old_docs, id_col, text_col, n_buckets, salt),
        gram_bucket_counts(new_docs, id_col, text_col, n_buckets, salt),
    )


def source_drift(
    old_docs: DataFrame,
    new_docs: DataFrame,
    stratum_col: str = "source",
) -> DataFrame:
    """Per-stratum corpus shares old vs new and the share delta —
    which source moved. Two keyed aggs + a bounded full-outer join;
    shares are exact ratios of integer counts (oracle-portable)."""
    o = old_docs.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("_oc")
    )
    n = new_docs.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("_nc")
    )
    j = o.join(n, ["stratum"], "full_outer").select(
        "stratum",
        F.coalesce("_oc", F.lit(0)).alias("old_n"),
        F.coalesce("_nc", F.lit(0)).alias("new_n"),
    )
    tot = j.agg(F.sum("old_n").alias("_ot"), F.sum("new_n").alias("_nt"))
    return j.crossJoin(F.broadcast(tot)).select(
        "stratum",
        "old_n",
        "new_n",
        F.round(F.col("old_n") / F.col("_ot"), 10).alias("old_share"),
        F.round(F.col("new_n") / F.col("_nt"), 10).alias("new_share"),
        F.round(
            F.col("new_n") / F.col("_nt") - F.col("old_n") / F.col("_ot"), 10
        ).alias("share_delta"),
    )


def adjacent_epoch_drift(
    counts: DataFrame,
    epoch_col: str = "epoch",
) -> DataFrame:
    """Per-epoch drift alarms over a (epoch, bucket, cnt) history — the
    table the streaming sketch maintenance writes one partition of per
    micro-batch (streaming/sketch_stream.py, gram tables): each epoch's
    distribution vs the PREVIOUS epoch's, all pairs in ONE plan (no
    driver loop over epochs): shift the old side by +1 epoch, full-outer
    join on (epoch, bucket), restrict to epochs where both sides exist,
    normalize by per-epoch totals, aggregate JS/L1/support deltas.

    Output: one row per epoch from the second onward —
    (epoch, jsd, l1, buckets_gained, buckets_lost) against its
    PREDECESSOR EPOCH BY RANK (ADVICE r5: the r5 shape paired with the
    literal e-1, so a numbering gap — a skipped/failed micro-batch —
    silently produced NO drift row for the epoch after the gap, which a
    monitoring consumer reads as "no drift"; rank pairing emits the
    alarm row across the gap instead. Gapless histories are
    unchanged — the rank predecessor IS e-1 there).
    Floats are sums over buckets: monitoring material (threshold and
    alert), same caveat as :func:`drift_summary`; the row-level
    contributions underneath are exact per the same argument as
    :func:`distribution_drift`.

    Scale: the history table has ≤B rows per epoch; everything here is
    joins/aggs over it, never over the corpus."""
    e = F.col(epoch_col).cast("bigint")
    # predecessor-by-rank map over the DISTINCT epochs (<= one row per
    # epoch — the single-partition window is over a handful of rows,
    # never the history table, let alone the corpus)
    from pyspark.sql import Window as _W

    prev_map = (
        counts.select(e.alias("_e")).distinct()
        .withColumn("_prev", F.lag("_e").over(_W.orderBy("_e")))
        .filter(F.col("_prev").isNotNull())
    )
    o = (
        counts.select(e.alias("_prev"), "bucket", F.col("cnt").alias("_oc"))
        .join(F.broadcast(prev_map), ["_prev"])
        .select("_e", "bucket", "_oc")
    )
    n = counts.select(e.alias("_e"), "bucket", F.col("cnt").alias("_nc")).join(
        F.broadcast(prev_map.select("_e")), ["_e"], "left_semi"
    )
    j = (
        o.join(n, ["_e", "bucket"], "full_outer")
        .select(
            "_e",
            "bucket",
            F.coalesce("_oc", F.lit(0)).alias("old_cnt"),
            F.coalesce("_nc", F.lit(0)).alias("new_cnt"),
        )
    )
    totals = j.groupBy("_e").agg(
        F.sum("old_cnt").alias("_ot"), F.sum("new_cnt").alias("_nt")
    )
    jt = j.join(F.broadcast(totals), ["_e"])
    p = F.col("old_cnt") / F.col("_ot")
    q = F.col("new_cnt") / F.col("_nt")
    m = (p + q) / 2
    term = lambda x: F.when(x > 0, x * F.log(x / m)).otherwise(F.lit(0.0))  # noqa: E731
    return (
        jt.withColumn("_js", (term(p) + term(q)) / 2)
        .groupBy(F.col("_e").alias(epoch_col))
        .agg(
            F.sum("_js").alias("jsd"),
            F.sum(F.abs(p - q)).alias("l1"),
            F.sum(
                ((F.col("old_cnt") == 0) & (F.col("new_cnt") > 0)).cast("long")
            ).alias("buckets_gained"),
            F.sum(
                ((F.col("old_cnt") > 0) & (F.col("new_cnt") == 0)).cast("long")
            ).alias("buckets_lost"),
        )
    )
