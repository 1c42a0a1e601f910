"""Corpus text-statistics operators: repetition filters and TF-IDF.

Repetition stats are the Gopher-style quality signals (Rae et al. 2021
§A1.1: fraction of the document covered by the most frequent word /
duplicate n-grams) — the standard cheap filter that catches boilerplate
and degenerate generations before any model-based scoring.

TF-IDF is the classic two-aggregation pipeline: term frequency keyed on
(doc, term), document frequency keyed on term, corpus size broadcast as
a 1-row literal. Everything is integer counts until the final per-row
idf multiply, so the DuckDB oracle reproduces values exactly (identical
IEEE doubles from identical integer inputs, rounded at emit).

Scale shape (100 TB corpus):
* one explode (narrow) + one shuffle on (doc, term) + one shuffle on
  term for df — both partial-aggregated map-side; no joins bigger than
  term-keyed df (tiny vs the corpus) and the broadcast N.
* top-k per doc via window over (doc_id) — same WindowGroupLimit
  pushdown Spark applies to the other top-k queries (rank predicate
  evaluated before full sort materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _words(text_col: str) -> F.Column:
    return F.split(F.lower(F.trim(F.col(text_col))), r"\s+")


def repetition_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per doc: total/distinct word counts, the most-frequent word's
    share, and the duplicate-word fraction.

    One explode + one two-level aggregation — (doc, word) partial counts
    combine map-side, then collapse to per-doc extremes. No window, no
    join; scales as a plain agg.
    """
    words = docs.select(
        F.col(id_col), F.explode(_words(text_col)).alias("w")
    ).filter(F.col("w") != "")
    per_word = words.groupBy(id_col, "w").agg(F.count(F.lit(1)).alias("c"))
    return per_word.groupBy(id_col).agg(
        F.sum("c").alias("n_words"),
        F.count(F.lit(1)).alias("n_distinct_words"),
        F.round(
            F.max("c").cast("double") / F.sum("c").cast("double"), 6
        ).alias("top_word_frac"),
        F.round(
            F.lit(1.0) - F.count(F.lit(1)).cast("double") / F.sum("c").cast("double"),
            6,
        ).alias("dup_word_frac"),
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k terms per document by tf·idf, idf = ln(N / df).

    tf counts repeated words (not distinct), df counts documents
    containing the term, N is the corpus size carried as a broadcast
    1-row relation (never a driver-side action). Ties break on the term
    string so the result is total-order deterministic for the oracle.
    """
    words = docs.select(
        F.col(id_col), F.explode(_words(text_col)).alias("term")
    ).filter(F.col("term") != "")
    tf = words.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(
        F.count(F.lit(1)).cast("double").alias("n_corpus")
    )
    scored = (
        tf.join(df_, "term")
        .join(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf").cast("double")
                * F.log(F.col("n_corpus") / F.col("df").cast("double")),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", "term", "tf", "df", "tfidf")
    )
