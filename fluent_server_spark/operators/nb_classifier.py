"""Trainable Naive-Bayes quality classifier — the supervised companion
to the unsupervised unigram-perplexity filter (operators/lm_quality.py),
and the Spark-native form of the classifier-based corpus filtering step
every large LLM corpus describes publicly (GPT-3's LR quality filter,
CCNet's fastText step): label a small seed set (curated = positive,
raw/crawl = negative), train, score the whole corpus, keep the high end.

Design stance matches lm_quality: the MODEL IS A TABLE. Training is ONE
aggregation over the labeled tokens (per-token class counts -> smoothed
log-likelihood ratios); the "model" is a (token, llr) DataFrame plus a
3-row constants table (prior, unseen-token llr, vocab size) — nothing
ever reduces to the driver, so a 10^9-token vocabulary trains exactly
like a 10^4 one. Scoring is one equi-join + one keyed agg:

    score(d) = log P(pos)/P(neg)
             + sum over token occurrences t in d of
                 log P(t|pos) - log P(t|neg)

with add-k smoothing P(t|y) = (c(t,y)+k) / (N_y + k*V); tokens never
seen in training contribute the smoothed constant llr_unseen (a LEFT
join + coalesce — an inner join would silently skip them and inflate
scores of out-of-vocabulary junk, the exact documents a quality filter
exists to catch). classify = score > 0; callers threshold differently
for precision/recall trades.

Everything is Catalyst (no UDFs) and md5-free exact arithmetic, so the
whole train+score path replays in ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fluent_server_spark.operators.bm25 import _tokens


def train_nb(
    labeled: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    smoothing: float = 1.0,
) -> tuple[DataFrame, DataFrame]:
    """(model, consts): model = (token, llr); consts = ONE row
    (log_prior, llr_unseen). `label_col` is boolean (true = keep-class).

    One explode + one two-class pivot aggregation; N_y, V and the doc
    priors are tiny aggregates joined as broadcast one-rows.
    """
    toks = labeled.select(
        F.col(label_col).cast("boolean").alias("_y"),
        F.explode(_tokens(F.col(text_col))).alias("token"),
    )
    counts = toks.groupBy("token").agg(
        F.sum(F.when(F.col("_y"), 1).otherwise(0)).alias("c_pos"),
        F.sum(F.when(F.col("_y"), 0).otherwise(1)).alias("c_neg"),
    )
    totals = counts.agg(
        F.sum("c_pos").alias("n_pos"),
        F.sum("c_neg").alias("n_neg"),
        F.count(F.lit(1)).alias("v"),
    )
    docs = labeled.agg(
        F.sum(F.when(F.col(label_col).cast("boolean"), 1).otherwise(0)).alias(
            "d_pos"
        ),
        F.sum(F.when(F.col(label_col).cast("boolean"), 0).otherwise(1)).alias(
            "d_neg"
        ),
    )
    a = float(smoothing)
    lp = F.log((F.col("c_pos") + a) / (F.col("n_pos") + a * F.col("v")))
    ln = F.log((F.col("c_neg") + a) / (F.col("n_neg") + a * F.col("v")))
    model = (
        counts.join(F.broadcast(totals), F.lit(True))
        .select("token", F.round(lp - ln, 10).alias("llr"))
    )
    lp0 = F.log(a / (F.col("n_pos") + a * F.col("v")))
    ln0 = F.log(a / (F.col("n_neg") + a * F.col("v")))
    consts = (
        totals.join(F.broadcast(docs), F.lit(True))
        .select(
            F.round(
                F.log(F.col("d_pos") + 0.0) - F.log(F.col("d_neg") + 0.0), 10
            ).alias("log_prior"),
            F.round(lp0 - ln0, 10).alias("llr_unseen"),
            "v",
        )
    )
    return model, consts


def nb_score(
    docs: DataFrame,
    model: DataFrame,
    consts: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc (id_col, score, keep): one explode, one LEFT equi-join on
    token (the model is a TABLE — at 10^12 tokens it shuffles alongside
    the corpus tokens like any fact-fact join; for bounded vocabularies
    Spark's planner broadcasts it on its own), one keyed agg. Docs with
    ZERO tokens score exactly the prior (no token evidence)."""
    toks = docs.select(id_col, F.explode(_tokens(F.col(text_col))).alias("token"))
    contrib = (
        toks.join(model, "token", "left")
        .join(F.broadcast(consts), F.lit(True))
        .groupBy(id_col)
        .agg(
            F.round(
                F.first("log_prior")
                + F.sum(F.coalesce("llr", F.col("llr_unseen"))),
                6,
            ).alias("score")
        )
    )
    return (
        docs.select(id_col)
        .join(contrib, id_col, "left")
        .join(F.broadcast(consts.select("log_prior")), F.lit(True))
        .select(
            id_col,
            F.coalesce("score", F.round(F.col("log_prior"), 6)).alias("score"),
        )
        .withColumn("keep", F.col("score") > 0)
    )
