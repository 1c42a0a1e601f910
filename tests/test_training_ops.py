"""Decontamination, sequence packing, repetition stats, TF-IDF — the
round-2 training-data operators, pinned on planted fixtures (the driver
additionally hash-checks each against its DuckDB oracle)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from fluent_server_spark.operators.decontaminate import decontaminate
from fluent_server_spark.operators.packing import pack_sequences
from fluent_server_spark.operators.textstats import repetition_stats, tfidf_top_terms

_EVAL = "alpha beta gamma delta epsilon zeta eta theta"  # 8 words -> 4 5-grams


@pytest.fixture(scope="module")
def train(spark):
    rows = [
        # 0: contains a full eval 5-gram span ("beta gamma delta epsilon zeta")
        (0, "prefix beta gamma delta epsilon zeta suffix words here"),
        # 1: shares words but never 5 consecutive -> clean
        (1, "alpha beta gamma other delta epsilon zeta other eta theta"),
        # 2: totally unrelated
        (2, "one two three four five six seven eight nine ten"),
        # 3: the eval text verbatim (worst case) -> all grams hit
        (3, _EVAL),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontaminate_flags_planted_overlap(spark, train):
    eval_docs = spark.createDataFrame([(100, _EVAL)], "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_hits"], r["contaminated"])
        for r in decontaminate(train, eval_docs, n=5).collect()
    }
    assert got[0] == (1, True)  # exactly one shared 5-gram
    assert got[1] == (0, False)
    assert got[2] == (0, False)
    assert got[3] == (4, True)  # all 4 eval grams
    assert len(got) == 4  # every train doc present, zero-hit included


def test_decontaminate_eval_side_never_flags_itself(spark, train):
    """Train and eval are disjoint inputs by contract — a doc in both
    roles is the caller's split bug; here we just pin that the output
    ids are exactly the train ids."""
    eval_docs = spark.createDataFrame([(100, _EVAL)], "doc_id long, text string")
    out_ids = {r["doc_id"] for r in decontaminate(train, eval_docs).collect()}
    assert out_ids == {0, 1, 2, 3}


def test_pack_sequences_chunk_invariants(spark):
    # one key, 10 rows of 100 tokens, budget 256 -> chunks of sizes
    # ceil-boundary pattern: cum_before 0,100,200 -> chunk 0; 300..500 ->
    # chunk 1 (floor(300/256)=1), 600,700 -> 2, 800..900 -> 3
    rows = [("c1", i, 100) for i in range(10)]
    df = spark.createDataFrame(rows, "conv string, idx int, tok int")
    got = {
        r["chunk_id"]: (r["n_rows"], r["chunk_tokens"])
        for r in pack_sequences(
            df, "conv", ["idx"], F.col("tok"), max_tokens=256
        ).collect()
    }
    # chunk_id = floor(100*i / 256): i=0,1,2 -> 0; 3,4,5 -> 1; 6,7 -> 2; 8,9 -> 3
    assert got == {0: (3, 300), 1: (3, 300), 2: (2, 200), 3: (2, 200)}


def test_pack_sequences_keys_independent_and_total(spark):
    rows = [("a", 0, 50), ("a", 1, 50), ("b", 0, 999), ("b", 1, 1)]
    df = spark.createDataFrame(rows, "conv string, idx int, tok int")
    out = pack_sequences(df, "conv", ["idx"], F.col("tok"), max_tokens=100).collect()
    total = sum(r["chunk_tokens"] for r in out)
    n = sum(r["n_rows"] for r in out)
    assert (total, n) == (1100, 4)  # packing never drops or duplicates rows
    b = {r["chunk_id"] for r in out if r["conv"] == "b"}
    assert b == {0, 9}  # 999 tokens before row 1 -> floor(999/100) = 9


def test_repetition_stats_planted(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),  # 1 distinct of 4
            (2, "a b c d"),  # all distinct
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in repetition_stats(df).collect()}
    assert got[1]["n_words"] == 4 and got[1]["n_distinct_words"] == 1
    assert got[1]["top_word_frac"] == 1.0 and got[1]["dup_word_frac"] == 0.75
    assert got[2]["top_word_frac"] == 0.25 and got[2]["dup_word_frac"] == 0.0


def test_tfidf_ranks_rare_term_first(spark):
    # "rare" appears once in one doc; "common" in all docs
    df = spark.createDataFrame(
        [
            (1, "common common rare"),
            (2, "common common common"),
            (3, "common filler filler"),
        ],
        "doc_id long, text string",
    )
    top = {
        (r["doc_id"], r["rank"]): r
        for r in tfidf_top_terms(df, k=2).collect()
    }
    assert top[(1, 1)]["term"] == "rare"
    assert top[(1, 1)]["tfidf"] == round(1.0 * math.log(3.0 / 1.0), 6)
    # idf(common)=ln(3/3)=0 -> score 0 everywhere
    assert top[(2, 1)]["tfidf"] == 0.0
    assert top[(3, 1)]["term"] == "filler"


def test_scrub_pii_planted_literals(spark):
    from fluent_server_spark.functions.text import pii_counts, scrub_pii

    df = spark.createDataFrame(
        [(1, "mail a.b+c@x.io ssn 123-45-6789 ph 415-555-0123 ip 10.0.3.1 end")],
        "id long, text string",
    )
    counts = pii_counts(F.col("text"))
    row = df.select(
        scrub_pii(F.col("text")).alias("s"), *[c.alias(k) for k, c in counts.items()]
    ).first()
    assert row["s"] == "mail <EMAIL> ssn <SSN> ph <PHONE> ip <IP> end"
    assert (row["n_email"], row["n_ssn"], row["n_phone"], row["n_ipv4"]) == (1, 1, 1, 1)


def test_scrub_pii_ssn_not_double_counted_as_phone(spark):
    from fluent_server_spark.functions.text import pii_counts

    df = spark.createDataFrame([(1, "123-45-6789 only")], "id long, text string")
    row = df.select(
        *[c.alias(k) for k, c in pii_counts(F.col("text")).items()]
    ).first()
    assert row["n_ssn"] == 1 and row["n_phone"] == 0


def test_chunk_documents_boundaries(spark):
    from fluent_server_spark.operators.packing import chunk_documents

    df = spark.createDataFrame(
        [(1, "a" * 250), (2, "b" * 100), (3, "c")], "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["chunk_idx"]): r["chunk_len"]
        for r in chunk_documents(df, chunk_chars=120, overlap=20).collect()
    }
    # step=100: doc1 len 250 -> starts 0,100,200 -> lens 120,120,50
    assert {k: v for k, v in got.items() if k[0] == 1} == {
        (1, 0): 120, (1, 1): 120, (1, 2): 50
    }
    # doc2 len 100 -> one chunk of 100; doc3 len 1 -> one chunk of 1
    assert got[(2, 0)] == 100 and (2, 1) not in got
    assert got[(3, 0)] == 1


def test_chunk_documents_overlap_covers_everything(spark):
    from fluent_server_spark.operators.packing import chunk_documents

    text = "x" * 333
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = chunk_documents(df, chunk_chars=50, overlap=10).collect()
    step = 40
    # last chunk start must be < len; union of [start, start+len) covers [0, 333)
    starts = sorted(r["chunk_idx"] * step for r in rows)
    ends = [s + r["chunk_len"] for s, r in zip(starts, sorted(rows, key=lambda r: r["chunk_idx"]))]
    assert starts[0] == 0 and ends[-1] == 333
    assert all(starts[i + 1] <= ends[i] for i in range(len(rows) - 1))  # no gaps


def test_funnel_depth_order_matters(spark):
    from fluent_server_spark.operators.aggregates import funnel_depth
    import datetime as dt

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    rows = [
        # u1 completes all 3 in order
        (1, t(1), "view"), (1, t(2), "click"), (1, t(3), "buy"),
        # u2 has click BEFORE its first view -> depth 1 (view only)
        (2, t(5), "click"), (2, t(6), "view"),
        # u3 never views -> depth 0
        (3, t(1), "click"), (3, t(2), "buy"),
        # u4 view then buy (skips click) -> depth 1
        (4, t(1), "view"), (4, t(2), "buy"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {
        r["user_id"]: r["funnel_depth"]
        for r in funnel_depth(ev, ["view", "click", "buy"]).collect()
    }
    assert got == {1: 3, 2: 1, 3: 0, 4: 1}


def test_funnel_depth_strictly_after(spark):
    from fluent_server_spark.operators.aggregates import funnel_depth
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    # click at the SAME instant as view does not count (strict >)
    ev = spark.createDataFrame(
        [(1, t0, "view"), (1, t0, "click")],
        "user_id long, ts timestamp, event_type string",
    )
    got = funnel_depth(ev, ["view", "click"]).first()
    assert got["funnel_depth"] == 1


def test_funnel_scan_matches_join_chain(spark, turns_sdf):
    """The single-pass greedy-fold funnel must equal the k-join chain on
    a real event stream (both also replayed by the driver's CTE oracle)."""
    from fluent_server_spark.operators.aggregates import funnel_depth, funnel_depth_scan

    ev = turns_sdf.selectExpr(
        "conv_id AS user_id", "ts", "role AS event_type"
    )
    stages = ["user", "assistant", "tool"]
    chain = {r["user_id"]: r["funnel_depth"] for r in funnel_depth(ev, stages).collect()}
    scan = {r["user_id"]: r["funnel_depth"] for r in funnel_depth_scan(ev, stages).collect()}
    assert scan == chain


def test_funnel_scan_same_timestamp_not_double_counted(spark):
    """A later stage at EXACTLY the previous stage's completion time does
    not count (strictly-after semantics on both formulations)."""
    from fluent_server_spark.operators.aggregates import funnel_depth, funnel_depth_scan

    ev = spark.createDataFrame(
        [("u", "2024-01-01 00:00:00", "view"),
         ("u", "2024-01-01 00:00:00", "click"),
         ("u", "2024-01-01 00:00:05", "click")],
        "user_id string, ts_s string, event_type string",
    ).selectExpr("user_id", "CAST(ts_s AS timestamp_ntz) AS ts", "event_type")
    got = funnel_depth_scan(ev, ["view", "click"]).first()["funnel_depth"]
    want = funnel_depth(ev, ["view", "click"]).first()["funnel_depth"]
    assert got == want == 2  # the 00:00:05 click counts, the 00:00:00 one doesn't


def test_funnel_scan_rejects_numeric_ts(spark):
    """A numeric ts column would NULL the sentinel cast and silently make
    every depth 0 — the operator must fail loud instead."""
    import pytest as _pytest

    from fluent_server_spark.operators.aggregates import funnel_depth_scan

    ev = spark.createDataFrame(
        [("u", 1_700_000_000, "view")], "user_id string, ts long, event_type string"
    )
    with _pytest.raises(TypeError, match="timestamp"):
        funnel_depth_scan(ev, ["view", "click"])
