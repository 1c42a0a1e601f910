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

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_WORD_STATS_TYPE = T.StructType(
    [
        T.StructField("n_words", T.LongType()),
        T.StructField("n_distinct", T.LongType()),
        T.StructField("max_c", T.LongType()),
    ]
)


@F.pandas_udf(_WORD_STATS_TYPE)
def _word_count_stats(tokens: pd.Series) -> pd.DataFrame:
    """Per-doc word-count primitives from the (Catalyst-tokenized) word
    array: total occurrences, distinct words, and the max single-word
    count — the INTEGER inputs of the Gopher repetition fractions. The
    divisions/rounding stay in Catalyst so values are bit-identical to
    the explode+groupBy formulation (pinned in tests/test_textstats.py).
    Tokenization stays in Catalyst too (same split/lower semantics as
    every other text operator); Python only counts."""
    from collections import Counter

    n_words, n_distinct, max_c = [], [], []
    for toks in tokens:
        c = Counter(toks)
        n_words.append(len(toks))
        n_distinct.append(len(c))
        max_c.append(max(c.values()) if c else 0)
    return pd.DataFrame(
        {"n_words": n_words, "n_distinct": n_distinct, "max_c": max_c},
        index=tokens.index,
    )


def repetition_stats_narrow_cols(text_col: str = "text") -> dict[str, F.Column]:
    """The repetition_stats output columns as NARROW expressions over
    one row — no explode, no exchange, no join (r6: doc_profile's
    explode + two-level aggregation + join-back was ~40% of its wall;
    one scan now carries every per-doc profile column). Callers must
    filter out word-less docs themselves (the aggregation formulation
    drops them via its inner join): word-less <=> trim(text) == '' or
    NULL, a pure narrow predicate — keep it OFF the UDF output so the
    optimizer cannot duplicate the Python eval under a pushed filter
    (guide §4.4)."""
    words = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda x: x != ""
    )
    s = _word_count_stats(words)
    n_words = s["n_words"]
    n_distinct = s["n_distinct"]
    return {
        "n_words": n_words.alias("n_words"),
        "n_distinct_words": n_distinct.alias("n_distinct_words"),
        "top_word_frac": F.round(
            s["max_c"].cast("double") / n_words.cast("double"), 6
        ).alias("top_word_frac"),
        "dup_word_frac": F.round(
            F.lit(1.0) - n_distinct.cast("double") / n_words.cast("double"), 6
        ).alias("dup_word_frac"),
    }


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
    # tf feeds TWO consumers (the df aggregation and the scoring join):
    # materialize it once — un-materialized, the explode+agg chain ran
    # twice (r6, measured ~0.7 s off the query at sf1.0)
    tf = (
        words.groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)
    )
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
