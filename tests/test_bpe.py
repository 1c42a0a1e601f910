"""BPE training/application vs an independent pure-Python reference
(naive recount-every-iteration trainer + recompute-every-step encoder),
plus the detokenization round-trip and edge cases."""

from __future__ import annotations

import re
from collections import defaultdict

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from fluent_server_spark.operators.bpe import (
    bpe_learn_merges,
    bpe_tokenize,
    bpe_train,
    bpe_word_counts,
    encode_words,
    merge_ranks,
    pretokenize,
)

_PAT = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


# ------------------------------------------------------------------ naive ref
def _ref_symbols(word: str) -> tuple[str, ...]:
    syms = list(word)
    syms[-1] += "</w>"
    return tuple(syms)


def _ref_merge_all(seq: tuple[str, ...], pair) -> tuple[str, ...]:
    out, j = [], 0
    while j < len(seq):
        if j + 1 < len(seq) and (seq[j], seq[j + 1]) == pair:
            out.append(seq[j] + seq[j + 1])
            j += 2
        else:
            out.append(seq[j])
            j += 1
    return tuple(out)


def _ref_train(texts: list[str], num_merges: int, min_pair_count: int = 2):
    counts: dict[str, int] = {}
    for t in texts:
        for w in re.findall(_PAT, t):
            counts[w] = counts.get(w, 0) + 1
    seqs = {w: _ref_symbols(w) for w in counts}
    merges = []
    for rank in range(num_merges):
        pairs: dict[tuple[str, str], int] = defaultdict(int)
        for w, c in counts.items():
            s = seqs[w]
            for a, b in zip(s, s[1:]):
                pairs[(a, b)] += c
        cands = [(n, p) for p, n in pairs.items() if n >= min_pair_count]
        if not cands:
            break
        best = min(cands, key=lambda np: (-np[0], np[1]))[1]
        merges.append((rank, best[0], best[1], pairs[best]))
        seqs = {w: _ref_merge_all(s, best) for w, s in seqs.items()}
    return merges


def _ref_encode(text: str, merges) -> list[str]:
    ranks = {(l, r): k for k, l, r, _ in merges}
    out = []
    for w in re.findall(_PAT, text):
        seq = list(_ref_symbols(w))
        while len(seq) > 1:
            ranked = [
                (ranks[(a, b)], j)
                for j, (a, b) in enumerate(zip(seq, seq[1:]))
                if (a, b) in ranks
            ]
            if not ranked:
                break
            _, j = min(ranked)
            seq = list(_ref_merge_all(tuple(seq), (seq[j], seq[j + 1])))
        out.extend(seq)
    return out


# --------------------------------------------------------------------- corpus
@pytest.fixture(scope="module")
def corpus():
    base = [
        "the lower the newer, the lowest the newest",
        "low lower lowest; new newer newest!",
        "a widow's word, lowered anew 42 times",
        "newlines are not new lines (lower now)",
        "",
    ]
    return {i: t for i, t in enumerate(base * 2, start=0)}


def test_merges_match_reference(spark, corpus):
    sdf = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string"
    )
    merges = bpe_train(sdf, num_merges=30).collect()
    got = [(r["rank"], r["left"], r["right"], r["pair_count"]) for r in merges]
    assert got == _ref_train(list(corpus.values()), 30)


def test_tokens_match_reference(spark, corpus):
    sdf = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string"
    )
    merges_df = bpe_train(sdf, num_merges=25)
    ref_merges = _ref_train(list(corpus.values()), 25)
    got = {
        r["doc_id"]: list(r["tokens"])
        for r in bpe_tokenize(sdf, merges_df).collect()
    }
    for did, text in corpus.items():
        assert got[did] == _ref_encode(text, ref_merges), did


def test_detokenization_roundtrip(spark, corpus):
    """Concatenated tokens split on the </w> marker reconstruct the
    pre-tokenized word stream exactly."""
    sdf = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string"
    )
    rows = bpe_tokenize(sdf, bpe_train(sdf, num_merges=40)).collect()
    for r in rows:
        joined = "".join(r["tokens"])
        words = joined.split("</w>")
        assert words[-1] == ""
        assert words[:-1] == pretokenize(corpus[r["doc_id"]])
        assert r["n_tokens"] == len(r["tokens"])


def test_unseen_characters_fall_back_to_symbols(spark, corpus):
    """A pretrained merge table applied to text with characters never
    seen in training still tokenizes (char + marker symbols)."""
    sdf = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string"
    )
    merges = bpe_train(sdf, num_merges=20)
    new = spark.createDataFrame([(99, "zzzqqq über αβ")], "doc_id long, text string")
    (row,) = bpe_tokenize(new, merges).collect()
    joined = "".join(row["tokens"])
    assert joined.split("</w>")[:-1] == pretokenize("zzzqqq über αβ")


def test_min_pair_count_stops_early(spark):
    """All-unique single-occurrence words -> every pair count is 1 ->
    zero merges at the default min_pair_count=2."""
    sdf = spark.createDataFrame(
        [(0, "abc defg hij"), (1, "klmn opq rst")], "doc_id long, text string"
    )
    assert bpe_train(sdf, num_merges=10).count() == 0


def test_vocab_cap_is_deterministic(spark, corpus):
    """Capping the word table must take the most-frequent words with a
    lexicographic tiebreak — the same cap twice gives identical merges."""
    sdf = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string"
    )
    wc = bpe_word_counts(sdf)
    a = bpe_learn_merges(wc, 15, max_vocab_words=10).collect()
    b = bpe_learn_merges(wc, 15, max_vocab_words=10).collect()
    assert a == b
    assert len(a) > 0


def test_null_and_empty_text(spark):
    sdf = spark.createDataFrame(
        [(0, None), (1, ""), (2, "ok ok ok")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["n_tokens"]
        for r in bpe_tokenize(sdf, bpe_train(sdf, 5)).collect()
    }
    assert got[0] == 0 and got[1] == 0 and got[2] > 0


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet="ab c.x!", min_size=0, max_size=30
        ),
        min_size=1,
        max_size=6,
    )
)
def test_python_twin_matches_reference(texts):
    """Spark-free property check: the package's incremental trainer +
    cached greedy encoder (the exact code the UDF runs) agree with the
    naive reference on arbitrary corpora."""
    from fluent_server_spark.operators.bpe import _learn

    counts: dict[str, int] = {}
    for t in texts:
        for w in pretokenize(t):
            counts[w] = counts.get(w, 0) + 1
    words = sorted(counts.items())
    got = _learn(words, num_merges=12, min_pair_count=2)
    assert got == _ref_train(texts, 12)
    ranks = {(l, r): k for k, l, r, _ in got}
    for t in texts:
        assert encode_words(pretokenize(t), ranks) == _ref_encode(
            t, got
        )


# ------------------------------------------- tokenizer evaluation

from fluent_server_spark.operators.bpe import (  # noqa: E402
    corpus_tokenizer_stats,
    tokenizer_stats,
    vocab_usage,
)


def test_tokenizer_stats_match_python(spark, corpus):
    sdf = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    merges_df = bpe_train(sdf, num_merges=25)
    ranks = merge_ranks(merges_df)
    got = {r["doc_id"]: r for r in tokenizer_stats(sdf, merges_df).collect()}
    for did, text in corpus.items():
        toks = encode_words(pretokenize(text), ranks)
        words = [w for w in re.split(r"\s+", text) if w != ""]
        row = got[did]
        assert row["n_tokens"] == len(toks), did
        assert row["n_chars"] == len(text), did
        assert row["n_words"] == len(words), did
        if words:
            assert row["fertility"] == round(len(toks) / len(words), 6)
        else:
            assert row["fertility"] is None
        if toks:
            assert row["chars_per_token"] == round(len(text) / len(toks), 6)
        else:
            assert row["chars_per_token"] is None


def test_corpus_stats_micro_averages(spark, corpus):
    sdf = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    merges_df = bpe_train(sdf, num_merges=25)
    stats = tokenizer_stats(sdf, merges_df)
    row = corpus_tokenizer_stats(stats).collect()[0]
    pdf = stats.toPandas()
    assert row["n_docs"] == len(corpus)
    assert row["total_tokens"] == pdf.n_tokens.sum()
    assert row["micro_fertility"] == round(
        float(pdf.n_tokens.sum()) / float(pdf.n_words.sum()), 6
    )
    assert row["micro_chars_per_token"] == round(
        float(pdf.n_chars.sum()) / float(pdf.n_tokens.sum()), 6
    )


def test_vocab_usage_flags_dead_merges(spark, corpus):
    train = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    merges_df = bpe_train(train, num_merges=25)
    # a shifted corpus that exercises only part of the learned vocab
    shifted = spark.createDataFrame(
        [(0, "the the the"), (1, "zzz qqq")], "doc_id long, text string"
    )
    usage = vocab_usage(shifted, merges_df).collect()
    by_token = {}
    for r in usage:
        by_token.setdefault(r["token"], []).append(r)
    # every emitted token is accounted for with its true count
    ranks = merge_ranks(merges_df)
    emitted = {}
    for t in ["the the the", "zzz qqq"]:
        for tok in encode_words(pretokenize(t), ranks):
            emitted[tok] = emitted.get(tok, 0) + 1
    for tok, n in emitted.items():
        assert any(r["uses"] == n for r in by_token[tok]), tok
    # dead merges exist on the shifted corpus and read uses=0
    dead = [r for r in usage if r["is_merge"] and r["uses"] == 0]
    assert dead
    # single-symbol tokens carry no rank
    singles = [r for r in usage if not r["is_merge"]]
    assert singles and all(r["rank"] is None for r in singles)
