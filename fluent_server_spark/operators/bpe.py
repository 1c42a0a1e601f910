"""BPE tokenizer training and application — the tokenizer step of a
training-data pipeline, run as a Spark job (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units"; the same
byte-pair-merge scheme GPT-2 popularized, Radford et al. 2019).

The published algorithm never touches the raw corpus after one pass:
training operates on the WORD-FREQUENCY table (subword-nmt learns from
a `word -> count` dict), because pair statistics are a pure function of
it. That split is exactly the Spark-friendly shape:

* `bpe_word_counts` — the corpus-scale part. One pre-tokenize +
  explode + count aggregation (map-side combine, one shuffle on the
  word). At 10^12 turns this is the only pass over the data.
* `bpe_learn_merges` — the merge loop, on the frequency table capped
  at `max_vocab_words` most-frequent words (a BOUNDED driver collect,
  same contract as the min/max collect in operators/layout.py: the cap
  is explicit, deterministic, and the standard practice — the
  frequency tail contributes negligible pair mass, and every published
  BPE trainer runs this loop in memory over the dict). Incremental
  pair-statistics updates (only words containing the merged pair are
  re-scanned) keep the loop O(merges * affected-words), not
  O(merges * vocab).
* `bpe_tokenize` — application back at corpus scale: the learned merge
  ranks (a few thousand entries) broadcast into an Arrow pandas UDF
  that greedily applies lowest-rank merges per word, with a per-batch
  word cache (Zipf makes the hit rate high). Map-only: no shuffle,
  output partitioning inherited from the scan.

Determinism contract: pre-tokenization, pair tie-breaking (count desc,
then lexicographic pair), and greedy merge application are all pure
functions of the corpus, so two runs — or the pure-Python reference in
tests/test_bpe.py — produce identical merges and identical tokens.

End-of-word convention: the final symbol of every word carries the
`</w>` marker, so detokenization (strip markers, join) reconstructs the
pre-tokenized word stream exactly — property-tested.
"""

from __future__ import annotations

import re
from collections import defaultdict
from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

# letters | digits | punctuation runs — the "BPE-ish" pre-tokenizer;
# identical pattern on the JVM (regexp_extract_all) and in Python (re)
_PRETOKEN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"
_EOW = "</w>"


def pretokenize(text: str) -> list[str]:
    """Python twin of the JVM pre-tokenizer (shared by train + apply)."""
    return re.findall(_PRETOKEN, text or "")


def bpe_word_counts(
    docs: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """(word, n): the corpus word-frequency table — the only pass over
    the raw text. `regexp_extract_all` + explode stays JVM-side; the
    count aggregate combines map-side before its one shuffle."""
    return (
        docs.select(
            F.explode(
                F.regexp_extract_all(
                    F.coalesce(F.col(text_col), F.lit("")), F.lit(_PRETOKEN), 0
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _word_symbols(word: str) -> tuple[str, ...]:
    syms = list(word)
    syms[-1] += _EOW
    return tuple(syms)


def _learn(words: list[tuple[str, int]], num_merges: int, min_pair_count: int):
    """The Sennrich merge loop with incremental pair statistics: a pair
    index maps each pair to the words containing it; a merge re-scans
    only those words, decrementing their old pairs and incrementing the
    new ones. Tie-break is (count desc, lexicographic pair asc)."""
    seqs: list[tuple[str, ...]] = [_word_symbols(w) for w, _ in words]
    counts = [n for _, n in words]
    pair_n: dict[tuple[str, str], int] = defaultdict(int)
    pair_words: dict[tuple[str, str], set[int]] = defaultdict(set)
    for i, seq in enumerate(seqs):
        for a, b in zip(seq, seq[1:]):
            pair_n[(a, b)] += counts[i]
            pair_words[(a, b)].add(i)

    def merge_seq(seq: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
        out: list[str] = []
        j = 0
        while j < len(seq):
            if j + 1 < len(seq) and (seq[j], seq[j + 1]) == pair:
                out.append(seq[j] + seq[j + 1])
                j += 2
            else:
                out.append(seq[j])
                j += 1
        return tuple(out)

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(num_merges):
        best = None
        for p, n in pair_n.items():
            if n >= min_pair_count and (
                best is None or (-n, p) < (-pair_n[best], best)
            ):
                best = p
        if best is None:
            break
        merges.append((rank, best[0], best[1], pair_n[best]))
        for i in sorted(pair_words[best]):
            old = seqs[i]
            new = merge_seq(old, best)
            for a, b in zip(old, old[1:]):
                pair_n[(a, b)] -= counts[i]
                if pair_n[(a, b)] <= 0:
                    del pair_n[(a, b)]
                pw = pair_words[(a, b)]
                pw.discard(i)
                if not pw:
                    del pair_words[(a, b)]
            for a, b in zip(new, new[1:]):
                pair_n[(a, b)] += counts[i]
                pair_words[(a, b)].add(i)
            seqs[i] = new
    return merges


def bpe_learn_merges(
    word_counts: DataFrame,
    num_merges: int,
    max_vocab_words: int = 1_000_000,
    min_pair_count: int = 2,
) -> DataFrame:
    """(rank, left, right, pair_count): the learned merge table.

    The driver collect is bounded by `max_vocab_words` (deterministic
    cap: count desc, word asc) — the dict every published BPE trainer
    loops over. Stops early when no pair reaches `min_pair_count`."""
    spark = word_counts.sparkSession
    capped = (
        word_counts.orderBy(F.col("n").desc(), F.col("word"))
        .limit(int(max_vocab_words))
        .collect()
    )
    merges = _learn(
        [(r["word"], r["n"]) for r in capped], num_merges, min_pair_count
    )
    return spark.createDataFrame(
        merges, "rank int, left string, right string, pair_count long"
    )


def _apply_merges(
    word: str, ranks: dict[tuple[str, str], int]
) -> tuple[str, ...]:
    """Greedy lowest-rank-first merge application (the GPT-2 rule)."""
    seq = list(_word_symbols(word))
    while len(seq) > 1:
        best_rank, best_j = None, -1
        for j in range(len(seq) - 1):
            r = ranks.get((seq[j], seq[j + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_j = r, j
        if best_rank is None:
            break
        pair = (seq[best_j], seq[best_j + 1])
        out: list[str] = []
        j = 0
        while j < len(seq):
            if j + 1 < len(seq) and (seq[j], seq[j + 1]) == pair:
                out.append(seq[j] + seq[j + 1])
                j += 2
            else:
                out.append(seq[j])
                j += 1
        seq = out
    return tuple(seq)


def encode_words(
    words: Iterable[str], ranks: dict[tuple[str, str], int]
) -> list[str]:
    """Python twin of the tokenize UDF body (shared with the tests)."""
    cache: dict[str, tuple[str, ...]] = {}
    out: list[str] = []
    for w in words:
        toks = cache.get(w)
        if toks is None:
            toks = _apply_merges(w, ranks)
            cache[w] = toks
        out.extend(toks)
    return out


def merge_ranks(merges: DataFrame) -> dict[tuple[str, str], int]:
    """Collect the (small) merge table into the rank dict the tokenizer
    closes over — bounded by num_merges."""
    return {
        (r["left"], r["right"]): r["rank"]
        for r in merges.select("rank", "left", "right").collect()
    }


def bpe_tokenize(
    docs: DataFrame,
    merges: DataFrame | dict[tuple[str, str], int],
    id_col: str = "doc_id",
    text_col: str = "text",
    extra_cols: Iterable[str] = (),
) -> DataFrame:
    """(id, *extra_cols, tokens, n_tokens): corpus tokenized under the
    learned merges. Arrow pandas UDF (never per-row Python), map-only;
    the rank dict rides the closure (size = num_merges). The per-batch
    word cache exploits Zipf — most occurrences hit it. `extra_cols`
    ride through untouched (token-budget SFT packing needs the turn's
    role/order keys next to its tokens)."""
    ranks = merges if isinstance(merges, dict) else merge_ranks(merges)

    @F.pandas_udf(ArrayType(StringType()))
    def _tok(texts: pd.Series) -> pd.Series:
        cache: dict[str, tuple[str, ...]] = {}
        out = []
        for t in texts:
            toks: list[str] = []
            for w in pretokenize(t or ""):
                got = cache.get(w)
                if got is None:
                    got = _apply_merges(w, ranks)
                    cache[w] = got
                toks.extend(got)
            out.append(toks)
        return pd.Series(out)

    return docs.select(
        id_col,
        *extra_cols,
        _tok(F.col(text_col)).alias("tokens"),
    ).withColumn("n_tokens", F.size("tokens"))


def bpe_train(
    docs: DataFrame,
    num_merges: int,
    text_col: str = "text",
    max_vocab_words: int = 1_000_000,
    min_pair_count: int = 2,
) -> DataFrame:
    """Convenience: word counts + merge learning in one call."""
    return bpe_learn_merges(
        bpe_word_counts(docs, text_col),
        num_merges,
        max_vocab_words,
        min_pair_count,
    )


# ------------------------------------------- tokenizer evaluation

def tokenizer_stats(
    docs: DataFrame,
    merges: DataFrame | dict[tuple[str, str], int],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc tokenizer evaluation: (id, n_tokens, n_chars, n_words,
    fertility, chars_per_token) — the numbers that decide between two
    merge configs before committing a corpus-wide re-tokenization.
    `fertility` is tokens per WHITESPACE word (the denominator is
    deliberately independent of the tokenizer's own pretokenizer, so
    two tokenizers are comparable on the same corpus);
    `chars_per_token` is the compression ratio. Empty-word/token
    denominators yield NULL, never a division error. Cost: the one
    tokenize pass (map-only Arrow) with the char/word counters
    computed natively alongside it."""
    base = docs.select(
        id_col,
        text_col,
        F.length(F.coalesce(F.col(text_col), F.lit(""))).alias("n_chars"),
        F.size(
            F.filter(
                F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"),
                lambda w: w != "",
            )
        ).alias("n_words"),
    )
    tok = bpe_tokenize(base, merges, id_col, text_col, extra_cols=("n_chars", "n_words"))
    return tok.select(
        id_col,
        "n_tokens",
        "n_chars",
        "n_words",
        F.when(
            F.col("n_words") > 0,
            F.round(F.col("n_tokens") / F.col("n_words"), 6),
        ).alias("fertility"),
        F.when(
            F.col("n_tokens") > 0,
            F.round(F.col("n_chars") / F.col("n_tokens"), 6),
        ).alias("chars_per_token"),
    )


def corpus_tokenizer_stats(stats: DataFrame) -> DataFrame:
    """One-row corpus rollup of tokenizer_stats: micro-averaged
    fertility and compression (sums first, ratio second — the number
    that matters for the training-token budget, robust to doc-length
    mix), plus totals. One bounded aggregation."""
    return stats.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
        F.sum("n_words").alias("total_words"),
        F.round(F.sum("n_tokens") / F.sum("n_words"), 6).alias("micro_fertility"),
        F.round(F.sum("n_chars") / F.sum("n_tokens"), 6).alias(
            "micro_chars_per_token"
        ),
    )


def vocab_usage(
    docs: DataFrame,
    merges: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(token, rank, uses, is_merge): how often each vocab entry is
    actually emitted over `docs` — merges with uses=0 are dead weight
    (vocabulary utilization, the standard argument for resizing or
    retraining a tokenizer on a shifted corpus). Single-symbol tokens
    appear with rank NULL / is_merge false. A token reachable from two
    different merge pairs keeps one row per rank (attribution, not
    dedup). Cost: one tokenize pass + one count agg + an equi-join
    against the bounded merge table."""
    toks = bpe_tokenize(docs, merges, id_col, text_col)
    uses = (
        toks.select(F.explode("tokens").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("uses"))
    )
    mtok = merges.select(
        F.concat(F.col("left"), F.col("right")).alias("token"), "rank"
    )
    return (
        mtok.join(uses, "token", "full_outer")
        .select(
            "token",
            "rank",
            F.coalesce(F.col("uses"), F.lit(0).cast("long")).alias("uses"),
            F.col("rank").isNotNull().alias("is_merge"),
        )
    )
