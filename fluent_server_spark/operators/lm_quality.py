"""Language-model quality scoring — the CCNet-style perplexity filter
(Wenzek et al. 2020, "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data") with the LM the pipeline can actually
train ON THE CLUSTER: a corpus unigram model with add-k smoothing.
Documents whose average negative log-likelihood is far from the corpus
norm are either gibberish (high NLL — rare/unseen tokens throughout) or
degenerate boilerplate (low NLL — nothing but stopwords); production
filters keep the middle band, exactly how CCNet buckets by perplexity.

Shape: training IS one word-count aggregation over the corpus (the
model is the frequency table); scoring is an equi-join of the exploded
(doc, word) stream against it plus one keyed aggregation back to docs.
Nothing is collected to the driver — at 100 TB the vocabulary is a
table, not a broadcast — and every step is built-in (no UDFs). For a
frozen external LM you would broadcast its table instead; the join
shape is identical.

NLL convention (pinned against a pure-Python reference in
tests/test_lm_quality.py): p(w) = (count(w) + k) / (N + k*(V+1)) with
one shared unseen bucket, avg_nll = mean over the doc's word
OCCURRENCES of -ln p(w); docs with no words score NULL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _words(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return docs.select(
        id_col,
        F.explode(
            F.split(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+")
        ).alias("w"),
    ).filter(F.col("w") != "")


def train_unigram(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(w, n): the unigram model — a plain aggregate table, storable as
    parquet and reusable across scoring runs (train once per corpus
    snapshot, score every increment against it)."""
    return _words(docs, id_col, text_col).groupBy("w").agg(
        F.count(F.lit(1)).alias("n")
    )


def unigram_nll_scores(
    docs: DataFrame,
    model: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: float = 1.0,
) -> DataFrame:
    """(id, n_words, avg_nll): per-doc average negative log-likelihood
    under the (given or self-trained) unigram model. One join on the
    word, one aggregation on the doc id; the model's normalization
    constants come from a bounded two-row aggregate of the model table,
    carried as literals via crossJoin-of-one-row (broadcast, no shuffle
    of the scored stream)."""
    if model is None:
        model = train_unigram(docs, id_col, text_col)
    totals = model.agg(
        F.sum("n").alias("_N"), F.count(F.lit(1)).alias("_V")
    )
    w = _words(docs, id_col, text_col)
    scored = (
        w.join(model, "w", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            id_col,
            (
                -F.log(
                    (F.coalesce(F.col("n"), F.lit(0)) + F.lit(float(k)))
                    / (F.col("_N") + F.lit(float(k)) * (F.col("_V") + 1))
                )
            ).alias("nll"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_words"),
        F.round(F.avg("nll"), 6).alias("avg_nll"),
    )
    return docs.select(id_col).join(per_doc, id_col, "left")


def train_bigram(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(w1, w2, n): the bigram model — like the unigram, a plain
    aggregate table. Pairs come from the narrow array zip in
    `_word_pairs`, so training is explode + ONE map-side-combined
    shuffle on the pair key, exactly the unigram shape."""
    return (
        _word_pairs(docs, id_col, text_col)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _word_pairs(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2): the consecutive-pair stream, built NARROWLY from
    the split array (zip_with over two adjacent slices, all inside
    codegen) — no window, so pair construction adds zero shuffles; the
    stream arrives at the model joins with the scan's partitioning
    intact. Two formulations were measured and REJECTED at sf0.1
    (isolated best-of-3 on the self-trained bigram_nll query):
    lead()-over-window at 3.40s (doc-key exchange + sort) and
    transform-with-element_at(ws, i+1) at 8.33s — the latter
    re-evaluates the split expression per ELEMENT (Catalyst does not
    CSE the array into the lambda), turning pairing O(n^2) per doc.
    zip_with evaluates the split a constant number of times per row:
    2.51s, 1.36x over the window."""
    ws = F.filter(
        F.split(
            F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+"
        ),
        lambda x: x != "",
    )
    n = F.greatest(F.size(ws) - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice(ws, 1, n),
        F.slice(ws, 2, n),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    return docs.select(id_col, F.explode(pairs).alias("_p")).select(
        id_col, F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2")
    )


def bigram_nll_scores(
    docs: DataFrame,
    bigram_model: DataFrame | None = None,
    unigram_model: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.7,
    k: float = 1.0,
) -> DataFrame:
    """(id, n_bigrams, avg_nll): per-doc average NLL under the
    interpolated bigram model — the next step up the CCNet ladder from
    the unigram filter (a KenLM-style n-gram model with interpolation
    smoothing, Jelinek–Mercer form):

        p(w2|w1) = lam * (c(w1,w2)+k)/(c(w1)+k*(V+1))
                 + (1-lam) * (c(w2)+k)/(N+k*(V+1))

    Same model-is-a-table contract as the unigram scorer: two keyed
    LEFT joins (pair counts on (w1,w2); unigram counts on w1 and w2)
    plus the one-row totals broadcast, then one aggregation back to the
    doc id. Docs with fewer than two words score NULL. Convention
    pinned against a pure-Python reference in tests/test_lm_quality.py
    and replayed exactly by the pre-staged DuckDB oracle."""
    if unigram_model is None:
        unigram_model = train_unigram(docs, id_col, text_col)
    if bigram_model is None:
        bigram_model = train_bigram(docs, id_col, text_col)
    totals = unigram_model.agg(
        F.sum("n").alias("_N"), F.count(F.lit(1)).alias("_V")
    )
    pairs = _word_pairs(docs, id_col, text_col)
    kf = F.lit(float(k))
    scored = (
        pairs.join(
            bigram_model.select("w1", "w2", F.col("n").alias("_n12")),
            ["w1", "w2"],
            "left",
        )
        .join(
            unigram_model.select(F.col("w").alias("w1"), F.col("n").alias("_n1")),
            "w1",
            "left",
        )
        .join(
            unigram_model.select(F.col("w").alias("w2"), F.col("n").alias("_n2")),
            "w2",
            "left",
        )
        .crossJoin(F.broadcast(totals))
        .select(
            id_col,
            (
                -F.log(
                    F.lit(float(lam))
                    * (F.coalesce(F.col("_n12"), F.lit(0)) + kf)
                    / (
                        F.coalesce(F.col("_n1"), F.lit(0))
                        + kf * (F.col("_V") + 1)
                    )
                    + F.lit(1.0 - float(lam))
                    * (F.coalesce(F.col("_n2"), F.lit(0)) + kf)
                    / (F.col("_N") + kf * (F.col("_V") + 1))
                )
            ).alias("nll"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("nll"), 6).alias("avg_nll"),
    )
    return docs.select(id_col).join(per_doc, id_col, "left")


def perplexity_band_filter(
    docs: DataFrame,
    lo_quantile: float = 0.1,
    hi_quantile: float = 0.9,
    id_col: str = "doc_id",
    text_col: str = "text",
    model: DataFrame | None = None,
    scores: DataFrame | None = None,
) -> DataFrame:
    """Keep the middle perplexity band (CCNet's head/middle split
    generalized): drop the lowest-NLL tail (degenerate/boilerplate) and
    the highest-NLL tail (gibberish). Band edges come from approximate
    quantiles of the score table (bounded driver values); wordless docs
    are dropped with the gibberish tail. Pass `scores` (any table with
    (id, avg_nll), e.g. from bigram_nll_scores) to band-filter on a
    different scorer; default is the self-trained unigram."""
    if scores is None:
        scores = unigram_nll_scores(docs, model, id_col, text_col)
    qs = scores.filter(F.col("avg_nll").isNotNull()).approxQuantile(
        "avg_nll", [lo_quantile, hi_quantile], 0.001
    )
    if not qs:
        # every doc wordless -> all avg_nll NULL -> approxQuantile
        # returns [] and there is no band; the correct result is empty,
        # not an unpack ValueError
        return docs.limit(0)
    lo, hi = qs
    keep = scores.filter(F.col("avg_nll").between(lo, hi)).select(id_col)
    return docs.join(keep, id_col, "left_semi")
