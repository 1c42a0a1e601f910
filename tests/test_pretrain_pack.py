"""Pretraining concat-and-chunk packing vs a pure-Python reference.

The oracle reads the deterministic (shard, order) keys from Spark's
own xxhash64 (the one primitive not worth re-implementing), then does
the packing — concatenate each shard's token stream in (hash, id)
order with a separator after every document, cut into seq_len windows
— entirely in Python, and compares tokens/n_tokens/n_docs/digest per
chunk. Also pins the invariants the docstring promises: exact chunk
lengths, bounded tail loss, partitioning invariance, and the
two-exchange plan."""

from __future__ import annotations

import hashlib
import io
from contextlib import redirect_stdout

import pytest

from fluent_server_spark.operators.bpe import encode_words, pretokenize
from fluent_server_spark.operators.pretrain_pack import (
    DOC_SEP,
    pack_pretrain_chunks,
)

SEQ = 16
SHARDS = 4


@pytest.fixture(scope="module")
def corpus():
    docs = [
        ("empty", ""),
        ("nulltext", None),
        ("tiny", "a"),
        ("oversize", " ".join(f"w{i}" for i in range(120))),
    ]
    for i in range(30):
        docs.append((f"doc{i:03d}", f"the quick brown fox {i} " * (1 + i % 7)))
    return docs


@pytest.fixture(scope="module")
def packed(spark, corpus):
    sdf = spark.createDataFrame(corpus, "doc_id string, text string")
    out = pack_pretrain_chunks(
        sdf, {}, seq_len=SEQ, n_shards=SHARDS, keep_tail=True
    )
    return {(r["shard"], r["chunk_idx"]): r for r in out.collect()}


def _ref_pack(spark, corpus, seq_len, n_shards, keep_tail):
    """Pure-Python packing over Spark-provided (shard, ord) keys."""
    sdf = spark.createDataFrame(corpus, "doc_id string, text string")
    keys = {
        r["doc_id"]: (r["shard"], r["o"])
        for r in sdf.selectExpr(
            "doc_id",
            f"pmod(xxhash64(doc_id), {n_shards}) as shard",
            "xxhash64(doc_id) as o",
        ).collect()
    }
    streams: dict[int, list[tuple]] = {}
    for doc_id, text in corpus:
        shard, o = keys[doc_id]
        toks = encode_words(pretokenize(text or ""), {}) + [DOC_SEP]
        streams.setdefault(shard, []).append((o, doc_id, toks))
    chunks = {}
    for shard, docs in streams.items():
        docs.sort(key=lambda x: (x[0], x[1]))
        stream: list[str] = []
        contrib: list[int] = []  # parallel doc ordinal per token
        for n, (_, _, toks) in enumerate(docs):
            stream.extend(toks)
            contrib.extend([n] * len(toks))
        for ci in range(0, (len(stream) + seq_len - 1) // seq_len):
            piece = stream[ci * seq_len : (ci + 1) * seq_len]
            if not keep_tail and len(piece) < seq_len:
                continue
            window = contrib[ci * seq_len : (ci + 1) * seq_len]
            spans, start = [], 0
            for j in range(1, len(window) + 1):
                if j == len(window) or window[j] != window[start]:
                    spans.append(f"{start}-{j}")
                    start = j
            chunks[(shard, ci)] = {
                "tokens": piece,
                "n_tokens": len(piece),
                "n_docs": len(set(window)),
                "doc_spans": ";".join(spans),
                "digest": hashlib.md5(" ".join(piece).encode()).hexdigest(),
            }
    return chunks


def test_chunks_match_python_reference(spark, corpus, packed):
    ref = _ref_pack(spark, corpus, SEQ, SHARDS, keep_tail=True)
    assert set(packed) == set(ref)
    for key, want in ref.items():
        got = packed[key]
        assert list(got["tokens"]) == want["tokens"], key
        assert got["n_tokens"] == want["n_tokens"], key
        assert got["n_docs"] == want["n_docs"], key
        assert got["doc_spans"] == want["doc_spans"], key
        assert got["digest"] == want["digest"], key


def test_doc_spans_tile_each_chunk(packed):
    """Spans are contiguous, non-overlapping, in stream order, and
    cover [0, n_tokens) exactly — a trainer can build the
    block-diagonal attention mask from them without re-scanning."""
    for key, r in packed.items():
        spans = [tuple(map(int, s.split("-"))) for s in r["doc_spans"].split(";")]
        assert spans[0][0] == 0 and spans[-1][1] == r["n_tokens"], key
        for (a, b), (c, d) in zip(spans, spans[1:]):
            assert b == c and a < b and c < d, key
        assert len(spans) == r["n_docs"], key


def test_all_full_chunks_exactly_seq_len(packed):
    tails = 0
    for (shard, ci), r in packed.items():
        last = max(c for s, c in packed if s == shard)
        if ci < last:
            assert r["n_tokens"] == SEQ
        else:
            tails += r["n_tokens"] < SEQ
    assert tails <= SHARDS  # at most one short tail per shard


def test_drop_tail_filters_only_short_chunks(spark, corpus, packed):
    sdf = spark.createDataFrame(corpus, "doc_id string, text string")
    out = pack_pretrain_chunks(sdf, {}, seq_len=SEQ, n_shards=SHARDS)
    rows = {(r["shard"], r["chunk_idx"]): r for r in out.collect()}
    assert all(r["n_tokens"] == SEQ for r in rows.values())
    assert set(rows) == {k for k, r in packed.items() if r["n_tokens"] == SEQ}


def test_partitioning_invariance(spark, corpus, packed):
    """Output is a pure function of the input: a differently
    partitioned, differently ordered input yields identical chunks."""
    sdf = (
        spark.createDataFrame(list(reversed(corpus)), "doc_id string, text string")
        .repartition(13)
    )
    out = pack_pretrain_chunks(sdf, {}, seq_len=SEQ, n_shards=SHARDS, keep_tail=True)
    rows = {(r["shard"], r["chunk_idx"]): r for r in out.collect()}
    assert set(rows) == set(packed)
    for k, r in rows.items():
        assert r["digest"] == packed[k]["digest"]


def test_every_token_packed_once(spark, corpus, packed):
    """Conservation: total packed tokens == corpus tokens + one
    separator per document (keep_tail keeps everything)."""
    want = sum(
        len(encode_words(pretokenize(t or ""), {})) + 1 for _, t in corpus
    )
    assert sum(r["n_tokens"] for r in packed.values()) == want


def test_separator_unforgeable(spark):
    """Payload text containing the literal separator cannot emit it as
    a single token — it pre-tokenizes into pieces."""
    assert DOC_SEP not in encode_words(pretokenize(f"x {DOC_SEP} y"), {})
    sdf = spark.createDataFrame(
        [("a", f"pay {DOC_SEP} load")], "doc_id string, text string"
    )
    rows = pack_pretrain_chunks(
        sdf, {}, seq_len=64, n_shards=1, keep_tail=True
    ).collect()
    assert sum(list(r["tokens"]).count(DOC_SEP) for r in rows) == 1


def test_seq_len_one(spark):
    sdf = spark.createDataFrame([("a", "hi")], "doc_id string, text string")
    rows = pack_pretrain_chunks(
        sdf, {}, seq_len=1, n_shards=1, keep_tail=True
    ).collect()
    assert all(r["n_tokens"] == 1 for r in rows)
    assert sorted(r["chunk_idx"] for r in rows) == list(range(len(rows)))


def test_rejects_bad_args(spark):
    sdf = spark.createDataFrame([("a", "x")], "doc_id string, text string")
    with pytest.raises(ValueError):
        pack_pretrain_chunks(sdf, {}, seq_len=0)
    with pytest.raises(ValueError):
        pack_pretrain_chunks(sdf, {}, seq_len=8, n_shards=0)


def test_single_exchange_plan(spark, corpus):
    """ONE exchange total: the prefix-sum window shuffles on `shard`,
    and Catalyst reuses that hash(shard) partitioning for the
    (shard, chunk) assembly groupBy (HashPartitioning(shard) satisfies
    ClusteredDistribution(shard, chunk_idx)). Tokenize is map-only."""
    sdf = spark.createDataFrame(corpus, "doc_id string, text string")
    buf = io.StringIO()
    with redirect_stdout(buf):
        pack_pretrain_chunks(sdf, {}, seq_len=SEQ, n_shards=SHARDS).explain()
    plan = buf.getvalue()
    assert plan.count("Exchange") == 1, plan
