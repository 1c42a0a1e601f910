"""Corpus profiling — the "data card" numbers a pipeline records before
and after curation (counts, size distribution, duplication rate,
language/source concentration). One scan plus two tiny keyed aggs; the
output is a tall (metric, value) relation so it diffs trivially across
corpus versions and replays exactly in SQL (pre-staged `corpus_profile`
oracle pair).

Scale shape: the doc-level agg is map-side partial; the lang/source
concentration numbers come from groupBy aggregations whose outputs are
bounded by the label cardinality, then fold in as broadcast one-row
joins. `countDistinct(md5(text))` is the exact dup-rate anchor — at
100 TB swap in `approx_count_distinct` (one line, documented) if the
exact distinct's shuffle is not worth it for a monitoring metric.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corpus_profile(
    docs: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    source_col: str = "source",
) -> DataFrame:
    """(metric, value) rows: n_docs, total_chars, avg_chars,
    distinct_texts (exact, md5), dup_rate, n_langs, top_lang_share,
    n_sources, top_source_share. Values are doubles rounded to 6 so
    the relation is engine-portable; NULL text counts as length 0 and
    hashes as the empty string (one md5 bucket, matching exact_dedup's
    normalization)."""
    txt = F.coalesce(F.col(text_col), F.lit(""))
    base = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length(txt)).alias("total_chars"),
        F.avg(F.length(txt)).alias("avg_chars"),
        F.countDistinct(F.md5(txt)).alias("distinct_texts"),
    )
    lang = (
        docs.groupBy(lang_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(
            F.count(F.lit(1)).alias("n_langs"),
            F.max("cnt").alias("top_lang_cnt"),
        )
    )
    src = (
        docs.groupBy(source_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(
            F.count(F.lit(1)).alias("n_sources"),
            F.max("cnt").alias("top_source_cnt"),
        )
    )
    wide = base.crossJoin(F.broadcast(lang)).crossJoin(F.broadcast(src))
    metrics = [
        ("n_docs", F.col("n_docs")),
        ("total_chars", F.col("total_chars")),
        ("avg_chars", F.col("avg_chars")),
        ("distinct_texts", F.col("distinct_texts")),
        ("dup_rate", F.lit(1.0) - F.col("distinct_texts") / F.col("n_docs")),
        ("n_langs", F.col("n_langs")),
        ("top_lang_share", F.col("top_lang_cnt") / F.col("n_docs")),
        ("n_sources", F.col("n_sources")),
        ("top_source_share", F.col("top_source_cnt") / F.col("n_docs")),
    ]
    stacked = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(name).alias("metric"),
                    F.round(expr.cast("double"), 6).alias("value"),
                )
                for name, expr in metrics
            ]
        )
    ).alias("m")
    return wide.select(stacked).select("m.metric", "m.value")
