"""Pre-staged UN-MERGE of the round-3 query consolidation.

The driver records CORRECTNESS rows for only the first 50 registered
queries, so round 3 merged six near-twin pairs (COVERAGE.md §"50-query
surface"). If that cap ever lifts, the original per-operator queries
come back by deriving each parent as a VIEW over its merged query — the
merged implementation stays the single source of truth (no forked
logic), and each split's oracle wraps the merged oracle identically, so
the split pairs are driver-checkable the moment they are registered.

Toggle: ``all_queries(unmerged=True)`` or env ``SPARK_GRAFT_UNMERGED=1``
registers these IN ADDITION to the 50 (the 50-cap guard is waived under
the flag). Default registration is unchanged: exactly 50.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fluent_server_spark.queries import QuerySpec

# name -> (merged parent, spark view over the parent's DataFrame,
#          SQL template over the parent's oracle text)
_SPLITS: dict[str, tuple[str, object, str]] = {
    # routed_event_counts carries both grouping-set grains; the histogram
    # parent is the per-(sink, event_type) grain
    "event_type_histogram": (
        "routed_event_counts",
        lambda df: df.filter(F.col("event_type") != "ALL"),
        "SELECT * FROM ({sql}) WHERE event_type <> 'ALL'",
    ),
    # user_session_stats carries lag-cumsum AND native session_window
    # columns; the native parent is the sw_* projection
    "session_window_stats": (
        "user_session_stats",
        lambda df: df.select("user_id", "sw_n_sessions", "dwell_us"),
        "SELECT user_id, sw_n_sessions, dwell_us FROM ({sql})",
    ),
    # hourly_event_rollup carries tumbling + trailing-3h RANGE frame; the
    # rolling parent is the RANGE-frame projection
    "rolling_event_rollup": (
        "hourly_event_rollup",
        lambda df: df.select("event_type", "hour_idx", "rolling_n"),
        "SELECT event_type, hour_idx, rolling_n FROM ({sql})",
    ),
    "event_value_quantiles": (
        "event_value_dispersion",
        lambda df: df.select("event_type", "n", "p50", "p95", "p99"),
        "SELECT event_type, n, p50, p95, p99 FROM ({sql})",
    ),
    "event_value_mad": (
        "event_value_dispersion",
        lambda df: df.select("event_type", "mad_value"),
        "SELECT event_type, mad_value FROM ({sql})",
    ),
    # r5 merge: doc_profile absorbed doc_text_stats, doc_lang_id and
    # doc_fingerprints (all per-doc grain, one scan); the r3 splits of
    # doc_text_stats re-parent onto doc_profile transitively
    "doc_text_stats": (
        "doc_profile",
        lambda df: df.select(
            "doc_id", "n_tokens", "n_stopwords", "n_punct", "quality",
            "n_words", "n_distinct_words", "top_word_frac", "dup_word_frac",
        ),
        "SELECT doc_id, n_tokens, n_stopwords, n_punct, quality, n_words, "
        "n_distinct_words, top_word_frac, dup_word_frac FROM ({sql})",
    ),
    "doc_lang_id": (
        "doc_profile",
        lambda df: df.select("doc_id", "lang_guess"),
        "SELECT doc_id, lang_guess FROM ({sql})",
    ),
    "doc_fingerprints": (
        "doc_profile",
        lambda df: df.select("doc_id", "winnow_fp"),
        "SELECT doc_id, winnow_fp FROM ({sql})",
    ),
    "doc_token_stats": (
        "doc_profile",
        lambda df: df.select(
            "doc_id", "n_tokens", "n_stopwords", "n_punct", "quality"
        ),
        "SELECT doc_id, n_tokens, n_stopwords, n_punct, quality FROM ({sql})",
    ),
    "doc_repetition_stats": (
        "doc_profile",
        lambda df: df.select(
            "doc_id", "n_words", "n_distinct_words", "top_word_frac",
            "dup_word_frac",
        ),
        "SELECT doc_id, n_words, n_distinct_words, top_word_frac, "
        "dup_word_frac FROM ({sql})",
    ),
    "corpus_sample_mix": (
        "corpus_splits",
        lambda df: df.select("split", "source", "n_mix", "mix_chars"),
        "SELECT split, source, n_mix, mix_chars FROM ({sql})",
    ),
    # r5 merge: user_journey absorbed the funnel and the salted
    # heavy-hitter count (all per-user grain)
    "event_funnel_depth": (
        "user_journey",
        lambda df: df.select("user_id", "funnel_depth"),
        "SELECT user_id, funnel_depth FROM ({sql})",
    ),
    "heavy_users": (
        "user_journey",
        lambda df: df.filter(F.col("is_heavy")).select(
            "user_id", F.col("n_events").alias("n")
        ),
        "SELECT user_id, n_events AS n FROM ({sql}) WHERE is_heavy",
    ),
}


def split_queries(merged: dict[str, QuerySpec]) -> dict[str, QuerySpec]:
    """The un-merged parent queries, derived from the merged registry."""
    out: dict[str, QuerySpec] = {}
    for name, (parent, view, sql_tpl) in _SPLITS.items():
        spec = merged[parent]

        def fn(spark: SparkSession, sf_dir: str, _spec=spec, _view=view) -> DataFrame:
            return _view(_spec.fn(spark, sf_dir))

        out[name] = QuerySpec(fn, sql_tpl.format(sql=spec.sql))
    return out
