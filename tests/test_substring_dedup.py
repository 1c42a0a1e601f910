"""Substring-level dedup (Lee et al. 2022 shape) vs a pure-Python
reference implementing the identical k-gram-marking semantics."""

from __future__ import annotations

import random

import pytest

from fluent_server_spark.operators.substring_dedup import (
    dedup_substrings,
    duplicate_spans,
)


def _py_reference(docs: dict[int, str], k: int) -> dict[int, str]:
    occ: dict[str, list[tuple[int, int]]] = {}
    for did in sorted(docs):
        t = docs[did]
        for i in range(len(t) - k + 1):
            occ.setdefault(t[i : i + k], []).append((did, i + 1))
    marks: dict[int, set[int]] = {did: set() for did in docs}
    for lst in occ.values():
        if len(lst) > 1:
            canon = min(lst)
            for o in lst:
                if o != canon:
                    marks[o[0]].add(o[1])
    out = {}
    for did, t in docs.items():
        spans: list[list[int]] = []
        for p in sorted(marks[did]):
            if spans and p <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], p + k)
            else:
                spans.append([p, p + k])
        parts, cur = [], 1
        for s, e in spans:
            parts.append(t[cur - 1 : s - 1])
            cur = e
        parts.append(t[cur - 1 :])
        out[did] = "".join(parts)
    return out


def _run(spark, docs: dict[int, str], k: int) -> dict[int, str]:
    sdf = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "doc_id long, text string"
    )
    return {
        r["doc_id"]: r["text_dedup"]
        for r in dedup_substrings(sdf, k=k).collect()
    }


def test_shared_paragraph_removed_from_later_doc(spark):
    boiler = "all rights reserved contact us at example dot com for details"
    docs = {
        0: "first page content. " + boiler + " and something unique here",
        1: "second page intro. " + boiler + " plus its own distinct tail",
        2: "totally unrelated document with no shared content at all",
    }
    got = _run(spark, docs, k=20)
    want = _py_reference(docs, 20)
    assert got == want
    assert boiler in got[0]  # canonical first occurrence kept
    assert boiler not in got[1]  # later copy cut
    assert got[2] == docs[2]  # untouched doc byte-identical


def test_within_doc_repetition_dedups(spark):
    rep = "the same sentence repeated verbatim inside one document"
    docs = {0: rep + " -- middle filler text -- " + rep}
    got = _run(spark, docs, k=20)
    want = _py_reference(docs, 20)
    assert got == want
    assert got[0].count(rep) == 1


def test_short_and_unique_docs_pass_through(spark):
    docs = {0: "tiny", 1: "x" * 19, 2: "a perfectly unique sentence nothing shares"}
    sdf = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in dedup_substrings(sdf, k=20).collect()}
    for i, t in docs.items():
        assert rows[i]["text_dedup"] == t
        assert rows[i]["n_removed_chars"] == 0


def test_spans_merge_overlapping_marks(spark):
    # a 60-char duplicated block -> its 41 overlapping 20-gram marks in
    # the copy must merge into ONE [pos, pos+60) span
    block = "0123456789" * 6
    docs = {0: "A" + block + "B", 1: "C" + block + "D"}
    spans = {
        (r["doc_id"], r["start"], r["end"])
        for r in duplicate_spans(
            spark.createDataFrame(
                [(i, t) for i, t in docs.items()], "doc_id long, text string"
            ),
            k=20,
        ).collect()
    }
    # within-block self-repetition also duplicates grams INSIDE doc 0,
    # so doc 0 gets marks too; the copy in doc 1 must be one whole span
    assert (1, 2, 62) in spans


def test_randomized_against_reference(spark):
    rng = random.Random(7)
    words = ["alpha", "beta", "gamma", "delta", "epsi", "zeta", "eta", "theta"]
    shared = " ".join(rng.choice(words) for _ in range(12))
    docs = {}
    for i in range(12):
        body = " ".join(rng.choice(words) for _ in range(rng.randint(5, 30)))
        if i % 3 == 0:
            body = body + " " + shared
        if i % 4 == 0:
            body = shared + " " + body
        docs[i] = body
    for k in (12, 25):
        assert _run(spark, docs, k) == _py_reference(docs, k)
