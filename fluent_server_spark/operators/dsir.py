"""DSIR — Data Selection via Importance Resampling (Xie et al.,
NeurIPS 2023, public): pick raw pretraining documents that LOOK LIKE a
small high-quality target set. The published recipe:

1. featurize every document as a bag of hashed word n-grams
   (unigrams + bigrams -> B buckets);
2. fit two bucket distributions — p_target over the target set,
   p_raw over the raw pool — with add-k smoothing;
3. per-doc log importance weight = sum over gram OCCURRENCES of
   log(p_target(bucket) / p_raw(bucket));
4. sample without replacement proportionally to the weights — here the
   Gumbel top-k trick (Vieira 2014 / Kool et al. ICML 2019, public):
   taking the n largest of (log_w/temperature + Gumbel noise) IS a
   weighted sample without replacement.

Spark shape — every step is a join or an aggregation:

* a bucket DISTRIBUTION is a (bucket, cnt) DataFrame: one explode +
  one map-side-combined hash agg, same contract as the sketch family
  (operators/sketches.py) — constant-size (<= B rows) regardless of
  corpus size, mergeable across epochs by union + re-sum.
* the MODEL is a (bucket, llr) table from a full-outer join of the two
  distributions plus a one-row constants table (llr for buckets unseen
  in both) — the NB-classifier pattern (operators/nb_classifier.py):
  nothing vocabulary-sized ever reaches the driver. B rows broadcast
  at the default 2^16 buckets (~1 MB); at larger B the left join
  degrades gracefully to a shuffle join on the bucket key.
* scoring = explode doc grams -> LEFT equi-join on bucket -> one keyed
  agg back to docs. Identical cost shape to the perplexity filter
  (operators/lm_quality.py) which this complements: perplexity filters
  against a NORM, DSIR steers toward a TARGET.
* resampling = a narrow deterministic-Gumbel key (portable md5, the
  operators/sampling.py contract — reproducible across engines,
  retries, and partitionings) + global top-n, which compiles to
  TakeOrderedAndProject (per-partition n minima, n-row driver merge —
  no full sort exchange). For n beyond driver comfort, cut at a
  key-threshold from approxQuantile instead (documented escape hatch).

Hashing is the repo's portable md5 construction, so bucket ids — and
therefore weights — replay exactly in DuckDB: the pre-staged driver
pair (queries/sketch_oracles.py::dsir_weights) oracles the whole
featurize->fit->score path, and the Gumbel keys themselves are
hash-derived, making even the SAMPLE deterministic and auditable.

Reference analogue: none (the reference routes events) — this is part
of the training-data pipeline operator family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DSIR_BUCKETS = 1 << 16
_MOD = 1_000_000


def _grams(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, gram): word unigrams + bigrams, one row per OCCURRENCE
    (bag semantics, per the paper). Narrow: split + two transforms +
    explode, no shuffle."""
    words = F.filter(
        F.split(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+"),
        lambda t: t != "",
    )
    bigrams = F.when(
        F.size(words) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - 2),
            lambda i: F.concat(
                F.element_at(words, i + 1), F.lit(" "), F.element_at(words, i + 2)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return docs.select(
        id_col, F.explode(F.concat(words, bigrams)).alias("gram")
    )


def _bucket(gram, n_buckets: int, salt: str):
    """Portable md5 bucket — DuckDB twin:
    CAST('0x' || substr(md5('<salt>:' || gram), 1, 15) AS BIGINT) % B."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}:"), gram)), 1, 15), 16, 10
    ).cast("bigint")
    return (h % n_buckets).cast("int")


def gram_bucket_counts(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
    salt: str = "dsir",
) -> DataFrame:
    """(bucket, cnt): a hashed-n-gram bucket distribution — <= B rows,
    mergeable across epochs by union + groupBy re-sum (associative,
    same contract as count_min_merge)."""
    g = _grams(docs, id_col, text_col)
    return g.select(_bucket(F.col("gram"), n_buckets, salt).alias("bucket")).groupBy(
        "bucket"
    ).agg(F.count(F.lit(1)).alias("cnt"))


def dsir_model(
    raw_counts: DataFrame,
    target_counts: DataFrame,
    n_buckets: int = DSIR_BUCKETS,
    smoothing: float = 1.0,
    materialize: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """(model, consts): model = (bucket, llr) for buckets seen in either
    distribution; consts = one row (llr_unseen) for buckets seen in
    neither. llr(b) = ln p_target(b) - ln p_raw(b) with add-k smoothing
    over all B buckets: p(b) = (cnt(b) + k) / (total + k*B).

    The two totals come from the SAME full-outer join the model reads
    (sum ignores the nulls the join introduces), and `materialize`
    persists that bounded (<= 2B-row) table — without it, lineage
    re-execution would re-explode the corpus once for the totals and
    once for the model (measured 5 corpus passes instead of 3 for the
    full weights path). In a production pipeline the distributions are
    WRITTEN tables (the mergeable-sketch contract) and this is moot;
    materialize=False keeps pure lineage for plan-shape audits.

    llr values are rounded to 10 decimals so the model table is a pure
    function of the inputs (the totals are single-row aggregates; no
    float accumulation order can leak into the stored model)."""
    if smoothing <= 0:
        raise ValueError("smoothing must be > 0 (unseen buckets need mass)")
    s = float(smoothing)
    counts = target_counts.withColumnRenamed("cnt", "t_cnt").join(
        raw_counts.withColumnRenamed("cnt", "r_cnt"), "bucket", "full"
    )
    if materialize:
        counts = counts.persist()
    totals = counts.agg(
        F.sum("t_cnt").alias("_tt"), F.sum("r_cnt").alias("_rt")
    )  # one row
    joined = counts.crossJoin(F.broadcast(totals))
    llr = F.round(
        F.log(
            (F.coalesce(F.col("t_cnt"), F.lit(0)) + F.lit(s))
            / (F.col("_tt") + F.lit(s) * n_buckets)
        )
        - F.log(
            (F.coalesce(F.col("r_cnt"), F.lit(0)) + F.lit(s))
            / (F.col("_rt") + F.lit(s) * n_buckets)
        ),
        10,
    )
    model = joined.select("bucket", llr.alias("llr"))
    consts = totals.select(
        F.round(
            F.log(F.lit(s) / (F.col("_tt") + F.lit(s) * n_buckets))
            - F.log(F.lit(s) / (F.col("_rt") + F.lit(s) * n_buckets)),
            10,
        ).alias("llr_unseen")
    )
    return model, consts


def dsir_weights(
    docs: DataFrame,
    model: DataFrame,
    consts: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
    salt: str = "dsir",
) -> DataFrame:
    """(id, n_grams, log_w): per-doc log importance weight = sum over
    gram occurrences of the bucket's llr. One LEFT equi-join on bucket
    + one keyed agg; gramless docs keep log_w = 0 (empty sum — they
    carry no evidence either way)."""
    g = _grams(docs, id_col, text_col).select(
        id_col, _bucket(F.col("gram"), n_buckets, salt).alias("bucket")
    )
    contrib = (
        g.join(model, "bucket", "left")
        .crossJoin(F.broadcast(consts))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.round(F.sum(F.coalesce(F.col("llr"), F.col("llr_unseen"))), 6).alias(
                "log_w"
            ),
        )
    )
    return (
        docs.select(id_col)
        .join(contrib, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("log_w", F.lit(0.0)).alias("log_w"),
        )
    )


def dsir_select(
    docs: DataFrame,
    target: DataFrame,
    n: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
    smoothing: float = 1.0,
    temperature: float = 1.0,
    salt: str = "dsir",
) -> DataFrame:
    """The full DSIR pass: fit p_target (over `target`) and p_raw (over
    `docs`), weight every raw doc, Gumbel-top-n resample. Returns the
    selected (id, n_grams, log_w, sample_key) rows, n of them.

    Gumbel key: g = -ln(-ln(u)) with u = (md5-hash(salt||id) + 0.5)/M —
    a pure function of the doc id, so the selected SET is reproducible
    across runs, engines, retries and partitionings (the
    operators/sampling.py determinism contract). temperature -> 0
    degenerates to plain top-n by weight; temperature 1 is the paper's
    proportional sampling."""
    if temperature <= 0:
        raise ValueError("temperature must be > 0 (use a small value for ~argmax)")
    raw_counts = gram_bucket_counts(docs, id_col, text_col, n_buckets, salt)
    tgt_counts = gram_bucket_counts(target, id_col, text_col, n_buckets, salt)
    model, consts = dsir_model(raw_counts, tgt_counts, n_buckets, smoothing)
    weights = dsir_weights(docs, model, consts, id_col, text_col, n_buckets, salt)
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}-gumbel:"), F.col(id_col).cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint") % _MOD
    u = (h + F.lit(0.5)) / F.lit(float(_MOD))
    gumbel = -F.log(-F.log(u))
    key = F.col("log_w") / F.lit(float(temperature)) + gumbel
    return (
        weights.withColumn("sample_key", F.round(key, 10))
        .orderBy(F.desc("sample_key"), F.col(id_col))
        .limit(n)
    )
