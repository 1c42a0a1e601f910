"""Training-data queries over the driver `documents` table: dedup family
+ text analysis. SQL oracles where ANSI-expressible; MinHash/SimHash/
lang-id are rows-only for the driver (their semantics are pinned by
pytest against exact baselines instead — tests/test_dedup.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fluent_server_spark.functions.text import (
    lang_id_udf,
    quality_score,
    stopword_count,
    punct_count,
    token_count,
    winnow_fingerprint,
    STOPWORDS,
)
from fluent_server_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from fluent_server_spark.queries import QuerySpec, load_table

_NORM_SQL = "md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))"


def q_exact_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup(load_table(spark, sf_dir, "documents"))


SQL_EXACT_DEDUP_DOCS = f"""
SELECT {_NORM_SQL} AS fp, min(doc_id) AS keep_id, count(*) AS n_dups
FROM documents GROUP BY 1
"""


def q_doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    text = F.col("text")
    return docs.select(
        "doc_id",
        token_count(text).alias("n_tokens"),
        stopword_count(text).alias("n_stopwords"),
        punct_count(text).alias("n_punct"),
        quality_score(text, F.col("n_chars")).alias("quality"),
    )


_STOP_IN = ", ".join(f"'{w}'" for w in STOPWORDS)
SQL_DOC_TOKEN_STATS = f"""
SELECT doc_id,
       len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
       len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                       x -> x IN ({_STOP_IN}))) AS n_stopwords,
       length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct,
       round(0.3 * least(CAST(n_chars AS DOUBLE), 2000.0) / 2000.0
           + 0.4 * (1.0 - CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
                          / greatest(CAST(n_chars AS DOUBLE), 1.0))
           + 0.3 * CAST(len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                        x -> x IN ({_STOP_IN}))) AS DOUBLE)
                   / greatest(CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE), 1.0),
           6) AS quality
FROM documents
"""


def q_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", winnow_fingerprint(F.col("text")).alias("winnow_fp")
    )


SQL_DOC_FINGERPRINTS = """
SELECT doc_id,
       list_aggregate(
         list_transform(range(1, greatest(length(text) - 7, 1) + 1),
                        i -> md5(substr(text, i, 8))),
         'min') AS winnow_fp
FROM documents
"""


def q_lang_source_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.avg(token_count(F.col("text"))), 4).alias("avg_tokens"),
    )


SQL_LANG_SOURCE_ROLLUP = """
SELECT lang, source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
       round(avg(len(regexp_split_to_array(trim(text), '\\s+'))), 4) AS avg_tokens
FROM documents GROUP BY lang, source
"""

JACCARD_THRESHOLD = 0.2


def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs (crossJoin baseline)."""
    return ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), threshold=JACCARD_THRESHOLD
    )


SQL_NGRAM_JACCARD_PAIRS = f"""
WITH sh AS (
  SELECT doc_id,
         -- list_slice clamps at the list end, matching Spark's
         -- F.slice/concat_ws partial shingle for docs with < n words
         -- (w[i+2] indexing would yield NULL grams there and diverge)
         list_distinct(list_transform(
           range(1, greatest(len(w) - 2, 1) + 1),
           i -> array_to_string(list_slice(w, i, i + 2), ' '))) AS grams
  FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS w
        FROM documents)
)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
             / CAST(len(list_distinct(list_concat(a.grams, b.grams))) AS DOUBLE),
             6) AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
      / CAST(len(list_distinct(list_concat(a.grams, b.grams))) AS DOUBLE)
      >= {JACCARD_THRESHOLD}
"""


def q_minhash_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dups (scale path; rows-only driver check —
    recall vs the exact baseline is pinned in tests/test_dedup.py)."""
    return minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"), threshold=JACCARD_THRESHOLD
    )


def q_simhash_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_pairs(load_table(spark, sf_dir, "documents"), max_hamming=6)


def q_doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", lang_id_udf(F.col("text")).alias("lang_guess"))


QUALITY_MIN = 0.5
TOKENS_MIN, TOKENS_MAX = 20, 1000


def q_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data cleaning pass: exact-dedup (keep min
    doc_id per normalized text) + token-length band + quality threshold.
    One window + narrow filters — the shape of a real corpus-prep job."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    text = F.col("text")
    scored = docs.select(
        "doc_id",
        "lang",
        token_count(text).alias("n_tokens"),
        quality_score(text, F.col("n_chars")).alias("quality"),
        F.md5(
            F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
        ).alias("fp"),
    )
    w = Window.partitionBy("fp").orderBy("doc_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(
            (F.col("rn") == 1)
            & (F.col("n_tokens").between(TOKENS_MIN, TOKENS_MAX))
            & (F.col("quality") >= QUALITY_MIN)
        )
        .select("doc_id", "lang", "n_tokens", "quality")
    )


SQL_CLEAN_CORPUS = f"""
WITH scored AS (
  SELECT doc_id, lang,
         len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
         round(0.3 * least(CAST(n_chars AS DOUBLE), 2000.0) / 2000.0
             + 0.4 * (1.0 - CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
                            / greatest(CAST(n_chars AS DOUBLE), 1.0))
             + 0.3 * CAST(len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                          x -> x IN ({_STOP_IN}))) AS DOUBLE)
                     / greatest(CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE), 1.0),
             6) AS quality,
         {_NORM_SQL} AS fp,
         row_number() OVER (PARTITION BY {_NORM_SQL} ORDER BY doc_id) AS rn
  FROM documents
)
SELECT doc_id, lang, n_tokens, quality
FROM scored
WHERE rn = 1 AND n_tokens BETWEEN {TOKENS_MIN} AND {TOKENS_MAX}
  AND quality >= {QUALITY_MIN}
"""


QUERIES: dict[str, QuerySpec] = {
    "exact_dedup_docs": QuerySpec(q_exact_dedup_docs, SQL_EXACT_DEDUP_DOCS),
    "clean_corpus": QuerySpec(q_clean_corpus, SQL_CLEAN_CORPUS),
    "doc_token_stats": QuerySpec(q_doc_token_stats, SQL_DOC_TOKEN_STATS),
    "doc_fingerprints": QuerySpec(q_doc_fingerprints, SQL_DOC_FINGERPRINTS),
    "lang_source_rollup": QuerySpec(q_lang_source_rollup, SQL_LANG_SOURCE_ROLLUP),
    "ngram_jaccard_pairs": QuerySpec(q_ngram_jaccard_pairs, SQL_NGRAM_JACCARD_PAIRS),
    "minhash_neardup_pairs": QuerySpec(q_minhash_neardup_pairs, None),
    "simhash_neardup_pairs": QuerySpec(q_simhash_neardup_pairs, None),
    "doc_lang_id": QuerySpec(q_doc_lang_id, None),
}
