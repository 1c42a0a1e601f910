"""Pre-staged driver queries for the sketch family (cap-lift readiness,
SURVEY §8 r5 lever: "bloom/KMV/CMS/HLL builds are SQL-replayable —
pre-stage oracles so they become driver rows immediately").

The 50-query driver cap is full, so these register ONLY under the
un-merge toggle (all_queries(unmerged=True) / SPARK_GRAFT_UNMERGED=1),
AFTER the canonical 50 — same contract as queries/unmerged.py. The
registry-guard pytest validates each against its DuckDB oracle at
sf0.001, so the pairs are proven now and promotable by moving one line.

Every sketch uses the repo's portable md5 constructions, so the oracle
replays the EXACT state (not an approximation of it): bucket ids,
registers, ranks, bit positions, and sample membership are all pure
functions of the input."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from fluent_server_spark.queries import QuerySpec, load_table

_H15 = "CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"

CMS_DEPTH, CMS_WIDTH = 5, 1024
HLL_P = 12
BLOOM_M, BLOOM_K = 4096, 3
KMV_K = 64


def q_cms_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluent_server_spark.operators.sketches import count_min_build

    docs = load_table(spark, sf_dir, "documents")
    return count_min_build(docs, "source", depth=CMS_DEPTH, width=CMS_WIDTH)


SQL_CMS_SKETCH = f"""
WITH ds AS (SELECT unnest(range({CMS_DEPTH})) AS d),
probes AS (
  SELECT CAST(ds.d AS INTEGER) AS d,
         CAST({_H15.format(expr="'cms-' || ds.d || ':' || CAST(source AS VARCHAR)")}
              % {CMS_WIDTH} AS INTEGER) AS bucket
  FROM documents, ds)
SELECT d, bucket, count(*) AS cnt FROM probes GROUP BY d, bucket
"""


def q_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluent_server_spark.operators.sketches import hll_build

    docs = load_table(spark, sf_dir, "documents")
    return hll_build(docs, "doc_id", p=HLL_P)


_HLL_H = _H15.format(expr="'hll:' || CAST(doc_id AS VARCHAR)")
_HLL_NB = 60 - HLL_P

SQL_HLL_SKETCH = f"""
WITH h AS (SELECT {_HLL_H} AS hv FROM documents),
r AS (
  SELECT CAST(hv % {1 << HLL_P} AS INTEGER) AS register,
         CASE WHEN (hv >> {HLL_P}) = 0 THEN {_HLL_NB + 1}
              ELSE {_HLL_NB + 1} - length(bin(hv >> {HLL_P}))
         END AS rank
  FROM h)
SELECT register, CAST(max(rank) AS INTEGER) AS max_rank
FROM r GROUP BY register
"""


def q_bloom_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluent_server_spark.operators.sketches import bloom_build

    docs = load_table(spark, sf_dir, "documents")
    return bloom_build(docs, "doc_id", m_bits=BLOOM_M, n_hashes=BLOOM_K)


SQL_BLOOM_SKETCH = f"""
WITH ks AS (SELECT unnest(range({BLOOM_K})) AS i),
probes AS (
  SELECT CAST({_H15.format(expr="'bloom~' || ks.i || ':' || CAST(doc_id AS VARCHAR)")}
              % {BLOOM_M} AS INTEGER) AS pos
  FROM documents, ks)
SELECT DISTINCT pos FROM probes
"""


def q_kmv_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluent_server_spark.operators.sketches import bottomk_build

    docs = load_table(spark, sf_dir, "documents")
    return bottomk_build(docs, "n_chars", key_col="doc_id", k=KMV_K)


SQL_KMV_SKETCH = f"""
SELECT md5('kmv:' || CAST(doc_id AS VARCHAR)) AS hkey, n_chars AS value
FROM documents
ORDER BY hkey LIMIT {KMV_K}
"""


SKETCH_QUERIES: dict[str, QuerySpec] = {
    "cms_sketch": QuerySpec(q_cms_sketch, SQL_CMS_SKETCH),
    "hll_sketch": QuerySpec(q_hll_sketch, SQL_HLL_SKETCH),
    "bloom_sketch": QuerySpec(q_bloom_sketch, SQL_BLOOM_SKETCH),
    "kmv_sketch": QuerySpec(q_kmv_sketch, SQL_KMV_SKETCH),
}


# --------------------------------------------- NB classifier (train+score)

NB_SMOOTH = 1.0


def q_nb_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weak-label demo of the supervised corpus filter: train on
    lang=='en' as the keep-class, score every doc. BOTH halves (train
    and score) are joins + aggregations, so the whole path — token
    class counts, smoothing, OOV constant, prior — replays in SQL."""
    from pyspark.sql import functions as F

    from fluent_server_spark.operators.nb_classifier import nb_score, train_nb

    docs = load_table(spark, sf_dir, "documents")
    labeled = docs.select("text", (F.col("lang") == "en").alias("label"))
    model, consts = train_nb(labeled, smoothing=NB_SMOOTH)
    return nb_score(docs, model, consts)


SQL_NB_QUALITY = f"""
WITH labeled AS (
  SELECT text, (lang = 'en') AS y FROM documents),
toks AS (
  SELECT y, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token
  FROM labeled),
toks2 AS (SELECT * FROM toks WHERE token <> ''),
counts AS (
  SELECT token,
         sum(CASE WHEN y THEN 1 ELSE 0 END) AS c_pos,
         sum(CASE WHEN y THEN 0 ELSE 1 END) AS c_neg
  FROM toks2 GROUP BY token),
totals AS (
  SELECT sum(c_pos) AS n_pos, sum(c_neg) AS n_neg, count(*) AS v FROM counts),
dc AS (
  SELECT sum(CASE WHEN y THEN 1 ELSE 0 END) AS d_pos,
         sum(CASE WHEN y THEN 0 ELSE 1 END) AS d_neg
  FROM labeled),
model AS (
  SELECT token,
         round(ln((c_pos + {NB_SMOOTH}) / (n_pos + {NB_SMOOTH} * v))
             - ln((c_neg + {NB_SMOOTH}) / (n_neg + {NB_SMOOTH} * v)), 10) AS llr
  FROM counts, totals),
consts AS (
  SELECT round(ln(CAST(d_pos AS DOUBLE)) - ln(CAST(d_neg AS DOUBLE)), 10) AS log_prior,
         round(ln({NB_SMOOTH} / (n_pos + {NB_SMOOTH} * v))
             - ln({NB_SMOOTH} / (n_neg + {NB_SMOOTH} * v)), 10) AS llr_unseen
  FROM totals, dc),
dtoks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token
  FROM documents),
dtoks2 AS (SELECT * FROM dtoks WHERE token <> ''),
contrib AS (
  SELECT d.doc_id,
         round(any_value(c.log_prior)
               + sum(coalesce(m.llr, c.llr_unseen)), 6) AS score
  FROM dtoks2 d LEFT JOIN model m USING (token), consts c
  GROUP BY d.doc_id)
SELECT docs.doc_id,
       coalesce(contrib.score, round(c.log_prior, 6)) AS score,
       coalesce(contrib.score, round(c.log_prior, 6)) > 0 AS keep
FROM documents docs LEFT JOIN contrib ON docs.doc_id = contrib.doc_id, consts c
"""


SKETCH_QUERIES["nb_quality"] = QuerySpec(q_nb_quality, SQL_NB_QUALITY)


# --------------------------------------------- hybrid retrieval (RRF)

HYBRID_DEPTH, HYBRID_K, HYBRID_NGRAM = 20, 10, 3


def q_hybrid_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 + character-trigram retrieval fused by Reciprocal Rank
    Fusion (operators/fusion.py) — same literal query set as bm25_topk,
    per-retriever depth 20, fused top-10. The whole path (both
    retrievers + fusion) replays in SQL."""
    from fluent_server_spark.operators.fusion import hybrid_topk
    from fluent_server_spark.queries import spread
    from fluent_server_spark.queries.docs import BM25_QUERY_SET

    docs = load_table(spark, sf_dir, "documents")
    values = ", ".join(f"({i}, '{q}')" for i, q in BM25_QUERY_SET)
    qs = spark.sql(f"SELECT * FROM (VALUES {values}) AS t(query_id, query)")
    return hybrid_topk(
        spread(docs), qs, k=HYBRID_K, depth=HYBRID_DEPTH, ngram=HYBRID_NGRAM
    )


def _sql_hybrid_topk() -> str:
    from fluent_server_spark.operators.fusion import RRF_K
    from fluent_server_spark.queries.docs import BM25_QUERY_SET

    values = ", ".join(f"({i}, '{q}')" for i, q in BM25_QUERY_SET)
    n = HYBRID_NGRAM
    return f"""
WITH q(query_id, query) AS (VALUES {values}),
-- ------------------------------------------------ BM25 side (depth {HYBRID_DEPTH})
toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS term
  FROM documents),
postings AS (
  SELECT doc_id, term, count(*) AS tf FROM toks WHERE term <> ''
  GROUP BY doc_id, term),
doclen AS (SELECT doc_id, sum(tf) AS dl FROM postings GROUP BY doc_id),
stats AS (SELECT term, count(*) AS df FROM postings GROUP BY term),
corpus AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM doclen),
qterms AS (
  SELECT DISTINCT query_id, term FROM (
    SELECT query_id,
           unnest(regexp_split_to_array(lower(trim(query)), '\\s+')) AS term
    FROM q) WHERE term <> ''),
bm_scored AS (
  SELECT qt.query_id, p.doc_id,
         round(sum(
           ln((c.n_docs - s.df + 0.5) / (s.df + 0.5) + 1.0)
           * p.tf * (1.2 + 1)
           / (p.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / c.avgdl))
         ), 6) AS score
  FROM postings p
  JOIN qterms qt USING (term)
  JOIN stats s USING (term)
  JOIN doclen d USING (doc_id), corpus c
  GROUP BY qt.query_id, p.doc_id),
bm_ranked AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id) AS rk
  FROM bm_scored),
-- ------------------------------------------- trigram side (depth {HYBRID_DEPTH})
dgrams AS (
  SELECT DISTINCT doc_id, gram FROM (
    SELECT doc_id,
           unnest(list_transform(
             range(1, greatest(length(lower(trim(text))) - {n - 1}, 1) + 1),
             i -> substr(lower(trim(text)), CAST(i AS INT), {n}))) AS gram
    FROM documents) WHERE gram <> ''),
dlen AS (SELECT doc_id, count(*) AS dlen FROM dgrams GROUP BY doc_id),
qgrams AS (
  SELECT DISTINCT query_id, gram FROM (
    SELECT query_id,
           unnest(list_transform(
             range(1, greatest(length(lower(trim(query))) - {n - 1}, 1) + 1),
             i -> substr(lower(trim(query)), CAST(i AS INT), {n}))) AS gram
    FROM q) WHERE gram <> ''),
qlen AS (SELECT query_id, count(*) AS qlen FROM qgrams GROUP BY query_id),
cg_scored AS (
  SELECT i.query_id, i.doc_id,
         round(i.m / (d.dlen + ql.qlen - i.m), 6) AS score
  FROM (SELECT qg.query_id, dg.doc_id, count(*) AS m
        FROM dgrams dg JOIN qgrams qg USING (gram)
        GROUP BY qg.query_id, dg.doc_id) i
  JOIN dlen d USING (doc_id)
  JOIN qlen ql USING (query_id)),
cg_ranked AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id) AS rk
  FROM cg_scored),
-- ------------------------------------------------------------ RRF fusion
unioned AS (
  SELECT query_id, doc_id, rk FROM bm_ranked WHERE rk <= {HYBRID_DEPTH}
  UNION ALL
  SELECT query_id, doc_id, rk FROM cg_ranked WHERE rk <= {HYBRID_DEPTH}),
fused AS (
  SELECT query_id, doc_id,
         round(sum(1.0 / ({RRF_K} + rk)), 10) AS rrf_score,
         count(*) AS n_lists
  FROM unioned GROUP BY query_id, doc_id),
final AS (
  SELECT query_id, doc_id, rrf_score, n_lists,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY rrf_score DESC, doc_id) AS rk
  FROM fused)
SELECT query_id, rk, doc_id, rrf_score, n_lists
FROM final WHERE rk <= {HYBRID_K}
"""


SKETCH_QUERIES["hybrid_topk"] = QuerySpec(q_hybrid_topk, _sql_hybrid_topk())


# ------------------------------------- DSIR importance weights (Xie '23)

DSIR_B, DSIR_SMOOTH = 1 << 16, 1.0


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR (operators/dsir.py) log importance weights of every doc
    toward the lang='en' slice as the target set — the featurize ->
    fit -> score path end-to-end. Hashed buckets are portable md5, so
    the weights replay exactly in SQL (the Gumbel resample is hash-
    deterministic too; tests pin it, the oracle pins the weights)."""
    from pyspark.sql import functions as F

    from fluent_server_spark.operators.dsir import (
        dsir_model,
        dsir_weights,
        gram_bucket_counts,
    )
    from fluent_server_spark.queries import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    target = docs.filter(F.col("lang") == "en")
    rc = gram_bucket_counts(docs, n_buckets=DSIR_B)
    tc = gram_bucket_counts(target, n_buckets=DSIR_B)
    model, consts = dsir_model(rc, tc, n_buckets=DSIR_B, smoothing=DSIR_SMOOTH)
    return dsir_weights(docs, model, consts, n_buckets=DSIR_B)


SQL_DSIR_WEIGHTS = f"""
WITH ws_tbl AS (
  SELECT doc_id, lang,
         list_filter(regexp_split_to_array(lower(trim(coalesce(text, ''))), '\\s+'),
                     w -> w <> '') AS ws
  FROM documents),
grams AS (
  SELECT doc_id, lang,
         unnest(ws || CASE WHEN len(ws) >= 2
           THEN list_transform(range(1, len(ws)),
                               i -> ws[CAST(i AS INT)] || ' ' || ws[CAST(i AS INT) + 1])
           ELSE CAST([] AS VARCHAR[]) END) AS gram
  FROM ws_tbl),
gb AS (
  SELECT doc_id, lang,
         CAST(CAST('0x' || substr(md5('dsir:' || gram), 1, 15) AS BIGINT)
              % {DSIR_B} AS INTEGER) AS bucket
  FROM grams),
rcounts AS (SELECT bucket, count(*) AS r_cnt FROM gb GROUP BY bucket),
tcounts AS (SELECT bucket, count(*) AS t_cnt FROM gb WHERE lang = 'en'
            GROUP BY bucket),
totals AS (
  SELECT (SELECT sum(r_cnt) FROM rcounts) AS rt,
         (SELECT coalesce(sum(t_cnt), 0) FROM tcounts) AS tt),
model AS (
  SELECT coalesce(t.bucket, r.bucket) AS bucket,
         round(ln((coalesce(t.t_cnt, 0) + {DSIR_SMOOTH}) / (tt + {DSIR_SMOOTH} * {DSIR_B}))
             - ln((coalesce(r.r_cnt, 0) + {DSIR_SMOOTH}) / (rt + {DSIR_SMOOTH} * {DSIR_B})),
               10) AS llr
  FROM tcounts t FULL JOIN rcounts r ON t.bucket = r.bucket, totals),
scored AS (
  SELECT gb.doc_id, count(*) AS n_grams, round(sum(m.llr), 6) AS log_w
  FROM gb JOIN model m USING (bucket)
  GROUP BY gb.doc_id)
SELECT d.doc_id,
       coalesce(s.n_grams, 0) AS n_grams,
       coalesce(s.log_w, 0.0) AS log_w
FROM documents d LEFT JOIN scored s USING (doc_id)
"""


SKETCH_QUERIES["dsir_weights"] = QuerySpec(q_dsir_weights, SQL_DSIR_WEIGHTS)

# --------------------------------------------- SFT example builder (r5)

SFT_MAX_CHARS = 2000
SFT_TARGET = ("error", "purchase")


def q_sft_examples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/sft.py over the driver events table mapped onto the
    transcript shape the way FIXTURES.md §5 maps the pipeline: user_id
    as conv_id, event_type as role, props as the turn text, (ts,
    event_id) the total turn order. Every output — example assignment,
    mask-span offsets, rendered-example digest — is a pure function of
    the input, so the oracle replays it byte-for-byte."""
    from pyspark.sql import functions as F

    from fluent_server_spark.operators.sft import build_sft_examples

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.col("event_type").alias("role"),
        F.coalesce("props", F.lit("")).alias("text"),
    )
    return build_sft_examples(
        ev,
        SFT_MAX_CHARS,
        key_col="user_id",
        order_cols=("ts", "event_id"),
        target_roles=SFT_TARGET,
    )


_SFT_IS_TGT = "role IN ('error', 'purchase')"

SQL_SFT_EXAMPLES = f"""
WITH t AS (
  SELECT user_id, ts, event_id, event_type AS role,
         coalesce(props, '') AS text,
         '<|' || event_type || '|>' || chr(10) || coalesce(props, '')
           || '<|end|>' || chr(10) AS rendered,
         CAST(length(event_type) + 5 + length(coalesce(props, '')) + 8
              AS BIGINT) AS rlen
  FROM events),
c AS (
  SELECT *, coalesce(sum(rlen) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM t),
e AS (SELECT *, CAST(cum_before // {SFT_MAX_CHARS} AS BIGINT) AS example_idx
      FROM c),
o AS (
  SELECT *, cum_before
            - min(cum_before) OVER (PARTITION BY user_id, example_idx) AS off
  FROM e)
SELECT user_id, example_idx,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(sum(rlen) AS BIGINT) AS example_chars,
       CAST(sum(CASE WHEN {_SFT_IS_TGT} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_target_turns,
       CAST(sum(CASE WHEN {_SFT_IS_TGT} THEN length(text) ELSE 0 END)
            AS BIGINT) AS mask_chars,
       coalesce(string_agg(
         CASE WHEN {_SFT_IS_TGT}
              THEN CAST(off + length(role) + 5 AS VARCHAR) || '-'
                   || CAST(off + length(role) + 5 + length(text) AS VARCHAR)
         END, ';' ORDER BY ts, event_id), '') AS mask_spans,
       md5(string_agg(rendered, '' ORDER BY ts, event_id)) AS example_md5
FROM o GROUP BY user_id, example_idx
"""


SKETCH_QUERIES["sft_examples"] = QuerySpec(q_sft_examples, SQL_SFT_EXAMPLES)

# ------------------------------------------ interpolated bigram LM (r5)

BIGRAM_LAM = 0.7
BIGRAM_K = 1.0


def q_bigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/lm_quality.bigram_nll_scores self-trained on the
    documents table — the Jelinek–Mercer interpolated bigram NLL. Both
    count tables and every join replay in SQL; the float expression is
    written identically on both sides, so the rounded scores match."""
    from fluent_server_spark.operators.lm_quality import bigram_nll_scores
    from fluent_server_spark.queries import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    return bigram_nll_scores(docs, lam=BIGRAM_LAM, k=BIGRAM_K)


SQL_BIGRAM_NLL = f"""
WITH ws_tbl AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(trim(coalesce(text, ''))),
                                           '\\s+'), w -> w <> '') AS ws
  FROM documents),
ucnt AS (
  SELECT w, count(*) AS n
  FROM (SELECT unnest(ws) AS w FROM ws_tbl) GROUP BY w),
tot AS (
  SELECT (SELECT sum(n) FROM ucnt) AS N_tot,
         (SELECT count(*) FROM ucnt) AS V),
pairs AS (
  SELECT doc_id,
         unnest(ws[1:len(ws) - 1]) AS w1,
         unnest(ws[2:len(ws)]) AS w2
  FROM ws_tbl WHERE len(ws) >= 2),
bcnt AS (SELECT w1, w2, count(*) AS n12 FROM pairs GROUP BY w1, w2),
scored AS (
  SELECT p.doc_id,
         -ln({BIGRAM_LAM} * (coalesce(b.n12, 0) + {BIGRAM_K})
               / (coalesce(u1.n, 0) + {BIGRAM_K} * (V + 1))
             + {1.0 - BIGRAM_LAM} * (coalesce(u2.n, 0) + {BIGRAM_K})
               / (N_tot + {BIGRAM_K} * (V + 1))) AS nll
  FROM pairs p
  LEFT JOIN bcnt b ON p.w1 = b.w1 AND p.w2 = b.w2
  LEFT JOIN ucnt u1 ON p.w1 = u1.w
  LEFT JOIN ucnt u2 ON p.w2 = u2.w, tot),
per AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         round(avg(nll), 6) AS avg_nll
  FROM scored GROUP BY doc_id)
SELECT d.doc_id, per.n_bigrams, per.avg_nll
FROM documents d LEFT JOIN per USING (doc_id)
"""


SKETCH_QUERIES["bigram_nll"] = QuerySpec(q_bigram_nll, SQL_BIGRAM_NLL)


# ------------------------------------------- retrieval quality metrics

def q_lsh_recall_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query recall@k / MRR@k of the LSH top-k against the exact
    brute-force baseline — the sweep-closure evaluator
    (operators/retrieval_eval.py) run at the driver operating point.
    Both ranking inputs are the registered driver queries themselves,
    so the oracle replays their SQL verbatim and layers the metric
    join + window on top."""
    from fluent_server_spark.operators.retrieval_eval import ranking_quality
    from fluent_server_spark.queries.vectors import (
        TOPK_K,
        q_ann_topk_bruteforce,
        q_ann_topk_lsh,
    )

    return ranking_quality(
        q_ann_topk_lsh(spark, sf_dir),
        q_ann_topk_bruteforce(spark, sf_dir),
        TOPK_K,
    )


def _sql_lsh_recall_mrr() -> str:
    from fluent_server_spark.queries.vectors import (
        SQL_ANN_TOPK_BRUTEFORCE,
        SQL_ANN_TOPK_LSH,
        TOPK_K,
    )

    # both inputs arrive rank-cut at k with the same (cos DESC, id)
    # tie rule, so the metric layer is one left join + one group-by
    return f"""
WITH lsh AS (SELECT * FROM ({SQL_ANN_TOPK_LSH})),
bf AS (SELECT * FROM ({SQL_ANN_TOPK_BRUTEFORCE})),
met AS (
  SELECT t.query_id,
         CAST(count(*) AS INTEGER) AS n_relevant,
         count(r.rk) AS n_hits,
         min(r.rk) AS first_hit
  FROM bf t LEFT JOIN lsh r
    ON t.query_id = r.query_id AND t.neighbor_id = r.neighbor_id
  GROUP BY t.query_id)
SELECT query_id, n_relevant, n_hits,
       CAST(n_hits AS DOUBLE) / n_relevant AS recall_at_k,
       coalesce(CAST(1 AS DOUBLE) / first_hit, CAST(0 AS DOUBLE))
         AS reciprocal_rank,
       CAST({TOPK_K} AS INTEGER) AS k
FROM met
"""


SKETCH_QUERIES["lsh_recall_mrr"] = QuerySpec(
    q_lsh_recall_mrr, _sql_lsh_recall_mrr()
)


# ------------------------------------------ preference pairs / BoN (r5)

PREF_K = 2


def q_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DPO-style (prompt, chosen, rejected) pairs over the events table:
    prompt = (user_id, event_type), candidates = that group's events,
    score = value (operators/preference.py; top-2 x bottom-2, margin 0)."""
    from pyspark.sql import functions as F  # noqa: F401 (parity w/ siblings)

    from fluent_server_spark.operators.preference import build_preference_pairs

    ev = load_table(spark, sf_dir, "events")
    return build_preference_pairs(
        ev, ["user_id", "event_type"], "event_id", "value", k=PREF_K
    )


SQL_PREFERENCE_PAIRS = f"""
WITH r AS (
  SELECT user_id, event_type, event_id, value,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY value DESC, event_id ASC) AS rnk,
         count(*) OVER (PARTITION BY user_id, event_type) AS n
  FROM events WHERE value IS NOT NULL)
SELECT c.user_id, c.event_type,
       c.event_id AS chosen_id, c.value AS chosen_score,
       x.event_id AS rejected_id, x.value AS rejected_score,
       c.value - x.value AS score_gap
FROM r c JOIN r x
  ON c.user_id = x.user_id AND c.event_type = x.event_type
WHERE c.rnk <= {PREF_K} AND x.rnk > x.n - {PREF_K}
  AND c.rnk < x.rnk AND c.value - x.value > 0
"""


SKETCH_QUERIES["preference_pairs"] = QuerySpec(
    q_preference_pairs, SQL_PREFERENCE_PAIRS
)


def q_best_of_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rejection-sampling selection: the top-valued event per
    (user_id, event_type) prompt among groups with >= 2 candidates."""
    from fluent_server_spark.operators.preference import best_of_n

    ev = load_table(spark, sf_dir, "events")
    return best_of_n(
        ev, ["user_id", "event_type"], "event_id", "value", min_candidates=2
    )


SQL_BEST_OF_N = """
WITH r AS (
  SELECT user_id, event_type, event_id, value,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY value DESC, event_id ASC) AS rnk,
         count(*) OVER (PARTITION BY user_id, event_type) AS n
  FROM events WHERE value IS NOT NULL)
SELECT user_id, event_type, event_id AS best_id, value AS best_score,
       n AS n_candidates
FROM r WHERE rnk = 1 AND n >= 2
"""


SKETCH_QUERIES["best_of_n"] = QuerySpec(q_best_of_n, SQL_BEST_OF_N)


# ------------------------------------------ transcript structural QC (r5)

QC_USER, QC_ASST = "view", "purchase"


def q_transcript_qc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversation-shape gating (operators/transcript_qc.py) mapped
    onto the events table the same way the SFT pair is: user_id as
    conv_id, (ts, event_id) as the order, event_type as role, props as
    text; 'view' plays user and 'purchase' plays assistant. idx_col is
    None (events carry no per-conversation index; the contiguity
    conjunct is pinned by pytest instead)."""
    from pyspark.sql import functions as F

    from fluent_server_spark.operators.transcript_qc import transcript_qc

    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id"),
        "ts",
        "event_id",
        F.col("event_type").alias("role"),
        F.col("props").alias("text"),
    )
    return transcript_qc(
        ev,
        key_col="user_id",
        order_cols=("ts", "event_id"),
        user_role=QC_USER,
        assistant_role=QC_ASST,
        idx_col=None,
    )


_QC_FULL = (
    "OVER (PARTITION BY user_id ORDER BY ts, event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"
)

SQL_TRANSCRIPT_QC = f"""
WITH t AS (
  SELECT user_id, ts, event_id,
         coalesce(event_type, '') AS role,
         length(trim(coalesce(props, ''))) = 0 AS blank
  FROM events),
w AS (
  SELECT *,
         role = lag(role) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS same_prev,
         first_value(role) {_QC_FULL} AS first_role,
         last_value(role) {_QC_FULL} AS last_role
  FROM t),
g AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS n_turns,
         CAST(sum(CASE WHEN role = '{QC_USER}' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_user_turns,
         CAST(sum(CASE WHEN role = '{QC_ASST}' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_assistant_turns,
         min(first_role) = '{QC_USER}' AS starts_with_user,
         min(last_role) = '{QC_ASST}' AS ends_with_assistant,
         sum(CASE WHEN coalesce(same_prev, false) THEN 1 ELSE 0 END) = 0
           AS alternation_ok,
         sum(CASE WHEN role = '{QC_ASST}' AND blank THEN 1 ELSE 0 END) = 0
           AS no_empty_assistant
  FROM w GROUP BY user_id)
SELECT *,
       starts_with_user AND ends_with_assistant AND alternation_ok
         AND no_empty_assistant AND n_assistant_turns > 0 AS qc_ok
FROM g
"""


SKETCH_QUERIES["transcript_qc"] = QuerySpec(q_transcript_qc, SQL_TRANSCRIPT_QC)


# ------------------------------------------ leakage-safe splits (r5)

CSPLIT_WEIGHTS = {"train": 0.9, "eval": 0.1}


def q_cluster_safe_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-aware split assignment over the driver minhash clusters:
    the registered neardup_clusters query feeds
    operators/sampling.cluster_safe_splits, so the oracle replays the
    cluster SQL verbatim and layers the LEFT join + hash cut on top."""
    from fluent_server_spark.operators.sampling import cluster_safe_splits
    from fluent_server_spark.queries.docs import q_neardup_clusters

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    clusters = q_neardup_clusters(spark, sf_dir).select("doc_id", "cluster_id")
    return cluster_safe_splits(
        docs, clusters, "doc_id", CSPLIT_WEIGHTS, salt="csplit"
    )


def _sql_cluster_safe_splits() -> str:
    from fluent_server_spark.queries.docs import SQL_NEARDUP_CLUSTERS

    # same cut points as the operator: sorted names, cumulative * 1e6
    return f"""
WITH j AS (
  SELECT d.doc_id, d.source,
         coalesce(c.cluster_id, d.doc_id) AS split_key
  FROM (SELECT doc_id, source FROM documents) d
  LEFT JOIN (SELECT doc_id, cluster_id FROM ({SQL_NEARDUP_CLUSTERS})) c
    ON d.doc_id = c.doc_id),
h AS (
  SELECT *,
         CAST('0x' || substr(md5('csplit' || CAST(split_key AS VARCHAR)), 1, 15)
              AS BIGINT) % 1000000 AS hv
  FROM j)
SELECT doc_id, source, split_key,
       CASE WHEN hv < 100000 THEN 'eval' ELSE 'train' END AS split
FROM h
"""


SKETCH_QUERIES["cluster_safe_splits"] = QuerySpec(
    q_cluster_safe_splits, _sql_cluster_safe_splits()
)


# ------------------------------------------------ corpus drift (r5)


def q_corpus_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-bucket JS drift between the even- and odd-doc_id halves of
    the documents table (operators/drift.py over the DSIR featurizer);
    every row is a pure function of two integer count tables, so the
    whole featurize -> join -> divergence path replays in DuckDB."""
    from pyspark.sql import functions as F

    from fluent_server_spark.operators.drift import corpus_drift
    from fluent_server_spark.queries import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    return corpus_drift(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
        n_buckets=DSIR_B,
    )


SQL_CORPUS_DRIFT = f"""
WITH ws_tbl AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(trim(coalesce(text, ''))), '\\s+'),
                     w -> w <> '') AS ws
  FROM documents),
grams AS (
  SELECT doc_id,
         unnest(ws || CASE WHEN len(ws) >= 2
           THEN list_transform(range(1, len(ws)),
                               i -> ws[CAST(i AS INT)] || ' ' || ws[CAST(i AS INT) + 1])
           ELSE CAST([] AS VARCHAR[]) END) AS gram
  FROM ws_tbl),
gb AS (
  SELECT doc_id,
         CAST(CAST('0x' || substr(md5('dsir:' || gram), 1, 15) AS BIGINT)
              % {DSIR_B} AS INTEGER) AS bucket
  FROM grams),
oc AS (SELECT bucket, count(*) AS cnt FROM gb WHERE doc_id % 2 = 0 GROUP BY bucket),
nc AS (SELECT bucket, count(*) AS cnt FROM gb WHERE doc_id % 2 = 1 GROUP BY bucket),
j AS (
  SELECT coalesce(o.bucket, n.bucket) AS bucket,
         CAST(coalesce(o.cnt, 0) AS BIGINT) AS old_cnt,
         CAST(coalesce(n.cnt, 0) AS BIGINT) AS new_cnt
  FROM oc o FULL JOIN nc n ON o.bucket = n.bucket),
tot AS (SELECT CAST(sum(old_cnt) AS DOUBLE) AS ot,
               CAST(sum(new_cnt) AS DOUBLE) AS nt FROM j)
SELECT bucket, old_cnt, new_cnt,
       round((CASE WHEN old_cnt > 0
                THEN (old_cnt / ot) * ln((old_cnt / ot)
                     / (((old_cnt / ot) + (new_cnt / nt)) / 2))
                ELSE 0 END
            + CASE WHEN new_cnt > 0
                THEN (new_cnt / nt) * ln((new_cnt / nt)
                     / (((old_cnt / ot) + (new_cnt / nt)) / 2))
                ELSE 0 END) / 2, 10) AS js_contrib
FROM j, tot
"""


SKETCH_QUERIES["corpus_drift"] = QuerySpec(q_corpus_drift, SQL_CORPUS_DRIFT)


# --------------------------------------------- per-source cap

SOURCE_CAP = 10


def q_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RefinedWeb-style per-source document cap: keep <= SOURCE_CAP docs
    per source, survivors chosen by the portable md5 order (pure
    function of the input — ingest-order-free). One window exchange."""
    from fluent_server_spark.operators.sampling import cap_per_key

    docs = load_table(spark, sf_dir, "documents")
    return cap_per_key(docs, "source", cap=SOURCE_CAP).select(
        "doc_id", "source", "key_rank"
    )


SQL_SOURCE_CAP = f"""
SELECT doc_id, source, key_rank FROM (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY {_H15.format(expr="'cap' || CAST(doc_id AS VARCHAR)")} % 1000000,
                    doc_id
         ) AS key_rank
  FROM documents)
WHERE key_rank <= {SOURCE_CAP}
"""
SKETCH_QUERIES["source_cap"] = QuerySpec(q_source_cap, SQL_SOURCE_CAP)


# --------------------------------------------- hard-negative mining

HARDNEG_POS_RANKS = (1, 3)  # deterministic stand-in gold set
HARDNEG_N = 4


def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DPR-style hard negatives over the registered BM25 ranking: the
    positives are the rank-1/rank-3 docs (a deterministic stand-in for
    a gold set), negatives are the top non-positives re-ranked. The
    miner itself is a pure relational layer over ANY ranking
    (operators/negatives.py)."""
    from pyspark.sql import functions as F

    from fluent_server_spark.operators.negatives import mine_hard_negatives
    from fluent_server_spark.queries.docs import q_bm25_topk

    ranking = q_bm25_topk(spark, sf_dir)
    positives = ranking.filter(F.col("rk").isin(*HARDNEG_POS_RANKS)).select(
        "query_id", "doc_id"
    )
    return mine_hard_negatives(ranking, positives, n_neg=HARDNEG_N).select(
        "query_id", "neg_rank", "doc_id", "score"
    )


def _sql_hard_negatives() -> str:
    from fluent_server_spark.queries.docs import SQL_BM25_TOPK

    ranks = ", ".join(str(r) for r in HARDNEG_POS_RANKS)
    return f"""
WITH ranking AS ({SQL_BM25_TOPK}),
pos AS (SELECT query_id, doc_id FROM ranking WHERE rk IN ({ranks})),
neg AS (
  SELECT r.query_id, r.rk, r.doc_id, r.score
  FROM ranking r
  WHERE NOT EXISTS (SELECT 1 FROM pos p
                    WHERE p.query_id = r.query_id AND p.doc_id = r.doc_id)),
reranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY rk, doc_id)
           AS neg_rank
  FROM neg)
SELECT query_id, neg_rank, doc_id, score
FROM reranked WHERE neg_rank <= {HARDNEG_N}
"""


SKETCH_QUERIES["hard_negatives"] = QuerySpec(
    q_hard_negatives, _sql_hard_negatives()
)


# --------------------------------------------- key-skew diagnostics

SKEW_TOP_N = 10


def q_event_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 heaviest event keys with corpus shares — the measurement
    that decides whether salting / AQE skew split is needed before a
    user_id groupBy (operators/skew.py::key_skew_stats)."""
    from fluent_server_spark.operators.skew import key_skew_stats

    events = load_table(spark, sf_dir, "events")
    return key_skew_stats(events, "user_id", top_n=SKEW_TOP_N)


SQL_EVENT_KEY_SKEW = f"""
WITH counts AS (
  SELECT user_id AS key, count(*) AS cnt FROM events GROUP BY user_id),
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total_rows,
               count(*) AS n_keys FROM counts),
top AS (
  SELECT key, cnt,
         row_number() OVER (ORDER BY cnt DESC, key) AS rank
  FROM counts)
SELECT rank, key, cnt,
       round(CAST(cnt AS DOUBLE) / total_rows, 6) AS share,
       n_keys, total_rows
FROM top, tot WHERE rank <= {SKEW_TOP_N}
"""
SKETCH_QUERIES["event_key_skew"] = QuerySpec(q_event_key_skew, SQL_EVENT_KEY_SKEW)


# --------------------------------------------- corpus profile

def q_corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-card metrics over the documents table in one pass
    (operators/profile.py) — tall (metric, value) so corpus versions
    diff row-wise."""
    from fluent_server_spark.operators.profile import corpus_profile

    return corpus_profile(load_table(spark, sf_dir, "documents"))


SQL_CORPUS_PROFILE = """
WITH base AS (
  SELECT count(*) AS n_docs,
         sum(length(coalesce(text, ''))) AS total_chars,
         avg(length(coalesce(text, ''))) AS avg_chars,
         count(DISTINCT md5(coalesce(text, ''))) AS distinct_texts
  FROM documents),
lang AS (
  SELECT count(*) AS n_langs, max(cnt) AS top_lang_cnt
  FROM (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang)),
src AS (
  SELECT count(*) AS n_sources, max(cnt) AS top_source_cnt
  FROM (SELECT source, count(*) AS cnt FROM documents GROUP BY source)),
wide AS (SELECT * FROM base, lang, src)
SELECT m.metric, round(CAST(m.value AS DOUBLE), 6) AS value
FROM wide, LATERAL (VALUES
  ('n_docs', CAST(n_docs AS DOUBLE)),
  ('total_chars', CAST(total_chars AS DOUBLE)),
  ('avg_chars', CAST(avg_chars AS DOUBLE)),
  ('distinct_texts', CAST(distinct_texts AS DOUBLE)),
  ('dup_rate', 1.0 - CAST(distinct_texts AS DOUBLE) / n_docs),
  ('n_langs', CAST(n_langs AS DOUBLE)),
  ('top_lang_share', CAST(top_lang_cnt AS DOUBLE) / n_docs),
  ('n_sources', CAST(n_sources AS DOUBLE)),
  ('top_source_share', CAST(top_source_cnt AS DOUBLE) / n_docs)
) AS m(metric, value)
"""
SKETCH_QUERIES["corpus_profile"] = QuerySpec(q_corpus_profile, SQL_CORPUS_PROFILE)
