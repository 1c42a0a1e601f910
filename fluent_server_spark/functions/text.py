"""Text-analysis functions for training-data pipelines over `documents`.

All hot-path functions are native Catalyst column expressions (JVM,
whole-stage codegen — the engine's rule: Python only off the hot path).
Language-ID and SimHash are Arrow pandas UDFs (set lookups / bit math
that Catalyst can't express cleanly).

Capabilities (first-class per the build brief, beyond the reference):
token counting, quality scoring, language ID, document fingerprinting
(md5 + rolling min-shingle winnowing), SimHash.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

TOKEN_SPLIT = r"\s+"
STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "it")
PUNCT_CLASS = "[^.,;:!?]"


def token_count(col: Column) -> Column:
    """Whitespace token count ('' counts as 1 — same in the DuckDB oracle)."""
    return F.size(F.split(F.trim(col), TOKEN_SPLIT))


def bpeish_token_count(col: Column) -> Column:
    """BPE-ish subword proxy: word pieces + digit runs + punctuation marks.

    A cheap, deterministic stand-in for tokenizer counts when budgeting
    LLM training data: splits on transitions rather than whitespace only.
    """
    pieces = F.split(
        F.trim(col), r"(?<=[a-z])(?=[A-Z])|\s+|(?<=\D)(?=\d)|(?<=\d)(?=\D)"
    )
    return F.size(F.filter(pieces, lambda x: x != F.lit("")))


def punct_count(col: Column) -> Column:
    return F.length(F.regexp_replace(col, PUNCT_CLASS, ""))


def stopword_count(col: Column) -> Column:
    words = F.split(F.lower(col), TOKEN_SPLIT)
    return F.size(F.filter(words, lambda x: x.isin(*STOPWORDS)))


def quality_score(text: Column, n_chars: Column) -> Column:
    """Length/punct/stopword quality heuristic in [0,1], rounded to 6dp.

    Mirrors the shape of public web-corpus quality filters (length band,
    symbol ratio, stopword presence) with exactly reproducible math.
    """
    tok = token_count(text).cast("double")
    length_part = F.least(n_chars.cast("double"), F.lit(2000.0)) / 2000.0
    punct_ratio = punct_count(text).cast("double") / F.greatest(
        n_chars.cast("double"), F.lit(1.0)
    )
    stop_ratio = stopword_count(text).cast("double") / F.greatest(tok, F.lit(1.0))
    score = 0.3 * length_part + 0.4 * (1.0 - punct_ratio) + 0.3 * stop_ratio
    return F.round(score, 6)


def md5_fingerprint(col: Column) -> Column:
    """Exact-dup key: md5 of whitespace-normalized lowercase text."""
    return F.md5(F.regexp_replace(F.lower(F.trim(col)), TOKEN_SPLIT, " "))


SHINGLE_LEN = 8


def winnow_fingerprint(col: Column) -> Column:
    """Rolling-hash document fingerprint: min md5 over all 8-char shingles.

    The winnowing idea (Schleimer et al., SIGMOD'03) reduced to its
    min-hash core; stable under small edits away from the min shingle.
    Pure Catalyst. r6: expressed as a RUNNING-MIN FOLD instead of
    transform + array_min — min is order-free so the value is
    identical, but the fold never materializes the n-element array of
    32-char md5 strings per row (one md5 per position either way; the
    array allocation was pure churn at ~300 positions/doc). The "f"*32
    init compares greater-or-equal to every lowercase-hex digest, so
    the fold's first real hash always replaces it.
    """
    n = F.greatest(F.length(col) - (SHINGLE_LEN - 1), F.lit(1))
    offsets = F.sequence(F.lit(1), n)
    return F.aggregate(
        offsets,
        F.lit("f" * 32),
        lambda acc, i: F.least(acc, F.md5(col.substr(i, F.lit(SHINGLE_LEN)))),
    )


# ------------------------------------------------------------- language ID
# marker-stopword sets per language (public-knowledge function words)
LANG_MARKERS: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to in is it that for with".split()),
    "fr": frozenset("le la les des et est dans pour que une".split()),
    "de": frozenset("der die das und ist nicht mit für ein zu".split()),
    "es": frozenset("el la los las es y en que por una".split()),
    "zh": frozenset("的 是 了 在 我 有 和 不 这 人".split()),
}
_LANG_ORDER = sorted(LANG_MARKERS)  # deterministic tie-break


@F.pandas_udf(T.StringType())
def lang_id_udf(text: pd.Series) -> pd.Series:
    """Marker-word language guess; 'und' when no marker hits.

    Semantics: argmax over per-language counts of whitespace tokens that
    are marker words (ties break by language code order) — deliberately
    defined over TOKEN MEMBERSHIP, not a regex, so the DuckDB oracle can
    reproduce it exactly with split + list_filter IN (RE2 has no
    lookahead, so the round-1 boundary-regex formulation was
    un-oracle-able). Vectorized: one split + explode over the Arrow
    batch, one isin pass per language, numpy argmax — no per-row Python.
    """
    import numpy as np

    low = text.fillna("").str.lower()
    exploded = low.str.split().explode().dropna()
    counts = np.zeros((len(_LANG_ORDER), len(text)), dtype=np.int64)
    if not exploded.empty:
        pos = text.index.get_indexer(exploded.index)
        for li, lang in enumerate(_LANG_ORDER):
            m = exploded.isin(LANG_MARKERS[lang]).to_numpy()
            np.add.at(counts[li], pos[m], 1)
    best = counts.argmax(axis=0)
    hit = counts.max(axis=0) > 0
    langs = np.asarray(_LANG_ORDER)[best]
    return pd.Series(np.where(hit, langs, "und"), index=text.index)


# ----------------------------------------------------------------- SimHash
SIMHASH_BITS = 64


def _word_hash64(word: str) -> int:
    return int.from_bytes(hashlib.md5(word.encode()).digest()[:8], "big")


def simhash64(s: str) -> int:
    """Charikar SimHash over whitespace words (signed 64-bit result)."""
    if not s:
        return 0
    acc = [0] * SIMHASH_BITS
    for w in s.lower().split():
        h = _word_hash64(w)
        for b in range(SIMHASH_BITS):
            acc[b] += 1 if (h >> b) & 1 else -1
    out = 0
    for b in range(SIMHASH_BITS):
        if acc[b] > 0:
            out |= 1 << b
    return out - (1 << SIMHASH_BITS) if out >= 1 << (SIMHASH_BITS - 1) else out


@F.pandas_udf(T.LongType())
def simhash_udf(text: pd.Series) -> pd.Series:
    """Vectorized SimHash over the Arrow batch.

    Python touches each UNIQUE word once (vocabulary-bounded md5); the
    per-document work — bit expansion, +-1 accumulation, sign — is numpy
    over the exploded (doc, word) table. Matches simhash64 exactly.
    """
    import numpy as np

    words = text.fillna("").str.lower().str.split()
    exploded = words.explode().dropna()
    if exploded.empty:
        return pd.Series(0, index=text.index, dtype="int64")
    vocab = pd.unique(exploded)
    h = np.fromiter(
        (_word_hash64(w) for w in vocab), dtype=np.uint64, count=len(vocab)
    )
    word_bits = (
        (h[:, None] >> np.arange(SIMHASH_BITS, dtype=np.uint64)) & np.uint64(1)
    ).astype(np.int64) * 2 - 1  # (vocab, 64) in {-1, +1}
    word_idx = pd.Series(np.arange(len(vocab)), index=vocab)
    doc_pos = exploded.index.to_numpy()  # original row label per word
    contrib = word_bits[word_idx[exploded.to_numpy()].to_numpy()]
    acc = pd.DataFrame(contrib, index=doc_pos).groupby(level=0).sum()
    sig_u = (
        ((acc.to_numpy() > 0).astype(np.uint64))
        << np.arange(SIMHASH_BITS, dtype=np.uint64)
    ).sum(axis=1, dtype=np.uint64)
    out_np = np.zeros(len(text), dtype=np.int64)
    pos = text.index.get_indexer(acc.index)
    out_np[pos] = sig_u.view(np.int64)  # reinterpret: two's-complement wrap
    return pd.Series(out_np, index=text.index)


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit signed columns (bit_count(xor))."""
    return F.bit_count(a.bitwiseXOR(b))


# ------------------------------------------------------------- PII scrub

# Patterns restricted to syntax Java regex (Spark) and RE2 (DuckDB)
# evaluate identically: character classes, bounded repetition, \b. No
# lookaround, no backrefs (RE2 has neither).
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "phone": (r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
}

# Order matters: ssn/phone share shapes with ipv4 digits — apply the
# most specific first and pin the order as part of the contract.
PII_ORDER = ("email", "ssn", "phone", "ipv4")


def scrub_pii(col: Column) -> Column:
    """Replace every PII match with its typed placeholder — a chain of
    native regexp_replace (JVM, codegen): the 100 TB scrub pass is pure
    narrow map work, no Python."""
    out = col
    for kind in PII_ORDER:
        pat, repl = PII_PATTERNS[kind]
        out = F.regexp_replace(out, pat, repl)
    return out


_PII_SCRUB_TYPE = T.StructType(
    [T.StructField(f"n_{kind}", T.LongType()) for kind in PII_ORDER]
    + [T.StructField("scrub_md5", T.StringType())]
)


@F.pandas_udf(_PII_SCRUB_TYPE)
def pii_scrub_udf(text: pd.Series) -> pd.DataFrame:
    """Arrow twin of pii_counts + md5(scrub_pii) in ONE pass (r6): the
    IDENTICAL sequential chain — per kind in PII_ORDER, count matches on
    the so-far-scrubbed text, then replace — executed by Python `re`
    with re.ASCII so \\d/\\w/\\b mean exactly what Java regex defaults
    mean. The chain must stay sequential (a replacement can create a
    word boundary that enables a later pattern), so this is 8 C-level
    regex passes per doc instead of 12 interpreted Catalyst regexp
    nodes; measured 4.2 s -> ~0.6 s at sf1.0. Parity with the Catalyst
    chain is pinned per-row in tests/test_text_functions.py (the
    patterns were already restricted to the Java ∩ RE2 ∩ ASCII-`re`
    common subset for the DuckDB oracle)."""
    import hashlib
    import re as _re

    pats = [
        (kind, _re.compile(PII_PATTERNS[kind][0], _re.ASCII), PII_PATTERNS[kind][1])
        for kind in PII_ORDER
    ]
    cols: dict[str, list] = {f"n_{kind}": [] for kind in PII_ORDER}
    md5s: list[str] = []
    for s in text:
        if s is None:  # NULL in, NULL out — same as the Catalyst chain
            for kind in PII_ORDER:
                cols[f"n_{kind}"].append(None)
            md5s.append(None)
            continue
        for kind, pat, repl in pats:
            n = 0
            out = []
            last = 0
            for mt in pat.finditer(s):
                n += 1
                out.append(s[last : mt.start()])
                out.append(repl)
                last = mt.end()
            if n:
                out.append(s[last:])
                s = "".join(out)
            cols[f"n_{kind}"].append(n)
        md5s.append(hashlib.md5(s.encode("utf-8")).hexdigest())
    cols["scrub_md5"] = md5s
    return pd.DataFrame(cols, index=text.index)


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-kind match counts (audit columns), same order contract."""
    counts: dict[str, Column] = {}
    scanned = col
    for kind in PII_ORDER:
        pat, _ = PII_PATTERNS[kind]
        counts[f"n_{kind}"] = F.regexp_count(scanned, F.lit(pat))
        # count on the already-scrubbed text so overlapping kinds (ssn
        # vs phone digit shapes) are attributed once, first-match-wins
        scanned = F.regexp_replace(scanned, pat, PII_PATTERNS[kind][1])
    return counts
