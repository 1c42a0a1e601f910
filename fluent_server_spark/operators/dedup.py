"""Deduplication operators for training-data pipelines.

Exact (hash-groupBy), MinHash+LSH, SimHash, n-gram Jaccard, and
embedding-cosine near-dup. All are compositions of built-in DataFrame
ops; the only Python is the SimHash UDF (bit math).

Scale notes (the whole point of each design):
* exact: one shuffle on a 32-hex key; min(doc_id) keeps the canonical
  copy — works at any scale.
* MinHash+LSH: candidate generation is shingle->minhash (narrow, per-row)
  then an equi-join on (band, band_hash) — the only shuffle is on band
  buckets, never the O(n^2) cross join. Exact-Jaccard verification runs
  only on candidates. This is the standard near-dup shape used for web
  corpora (Broder '97 resemblance + banding).
* SimHash: per-row 64-bit signature; candidate pairs via banded chunks
  of the signature (4x16-bit bands) -> equi-join, verify hamming<=k.
* n-gram Jaccard: exact pairwise, crossJoin-bounded — the verifier /
  small-N baseline, not the scale path (kept for oracle parity).
* embedding cosine: see operators/similarity.py (shared kernels).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fluent_server_spark.functions.text import md5_fingerprint, simhash_udf, hamming64

# ------------------------------------------------------------------ exact


def exact_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Groups of byte-equal (normalized) texts; keep_id = min id."""
    return (
        docs.withColumn("fp", md5_fingerprint(F.col(text_col)))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def dedup_keep_first(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Return the deduplicated corpus (one row per distinct text, min id).

    Window-free formulation: semi-join against the keeper ids — two
    shuffles on small keys, no per-group sort.
    """
    keep = exact_dedup(docs, id_col, text_col).select(
        F.col("keep_id").alias(id_col)
    )
    return docs.join(keep, id_col, "left_semi")


# ------------------------------------------------------------ word shingles


def with_shingles(
    docs: DataFrame, text_col: str = "text", n: int = 3, out: str = "shingles"
) -> DataFrame:
    """Distinct word n-gram shingles as an array column (narrow op)."""
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    idx = F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0)))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)))
    return docs.withColumn(out, F.array_distinct(grams))


# ---------------------------------------------------------- n-gram Jaccard


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """EXACT pairwise n-gram Jaccard (the small-N / verification baseline).

    O(n^2) crossJoin — bounded inputs only; the scale path is
    minhash_lsh_pairs below, which this verifies in tests.
    """
    sh = with_shingles(docs, text_col, n).select(
        F.col(id_col).alias("a_id"), F.col("shingles").alias("a_sh")
    )
    sh2 = sh.select(F.col("a_id").alias("b_id"), F.col("a_sh").alias("b_sh"))
    pairs = sh.crossJoin(sh2).filter(F.col("a_id") < F.col("b_id"))
    inter = F.size(F.array_intersect("a_sh", "b_sh")).cast("double")
    union = F.size(F.array_union("a_sh", "b_sh")).cast("double")
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return (
        pairs.withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )


# ------------------------------------------------------------- MinHash LSH

_MERSENNE = (1 << 31) - 1  # 31-bit field: a*h + b stays < 2^62, so the
# arithmetic can never overflow int64 — safe under ANSI mode (the driver's
# verify session may have ANSI on; 2^61-1 coefficients would throw there)


def minhash_signature(
    shingles: F.Column, n_perm: int = 64, seed: int = 1337
) -> F.Column:
    """n_perm minhash values via (a*h + b) mod p over xxhash64 shingles.

    Universal-hash permutation approximation (Broder '97). Everything is
    a Catalyst array expression — no Python, no shuffle.
    """
    # deterministic odd coefficients derived from the seed
    coeffs = [
        (
            (seed * 2654435761 + i * 40503) % _MERSENNE | 1,
            (seed * 97 + i * 1299709) % _MERSENNE,
        )
        for i in range(n_perm)
    ]
    # pmod (not abs%) — abs(Long.MIN_VALUE) overflows under ANSI
    h = F.transform(shingles, lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE)))
    mins = [
        F.array_min(
            F.transform(h, lambda x: (x * F.lit(a) + F.lit(b)) % _MERSENNE)
        )
        for (a, b) in coeffs
    ]
    return F.array(*mins)


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    n_perm: int = 64,
    n_bands: int = 16,
    threshold: float = 0.2,
) -> DataFrame:
    """Near-dup pairs at scale: minhash -> band -> bucket equi-join ->
    exact-Jaccard verify on the candidates only.

    With n_perm=64, n_bands=16 (rows/band=4) the LSH S-curve crosses ~50%
    candidate probability at jaccard ~ (1/16)^(1/4) ~ 0.5; pairs above
    `threshold` are then confirmed exactly, so precision is exact and
    recall is the only approximation (tested against the O(n^2) baseline).
    """
    rows_per_band = n_perm // n_bands
    sig = with_shingles(docs, text_col, n).withColumn(
        "sig", minhash_signature(F.col("shingles"), n_perm)
    )
    sig = sig.filter(F.size("shingles") > 0).select(id_col, "shingles", "sig")

    bands = sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.hash(
                            *[
                                F.col("sig")[i]
                                for i in range(
                                    b * rows_per_band, (b + 1) * rows_per_band
                                )
                            ]
                        ).alias("bucket"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")

    left = bands.select(
        F.col(id_col).alias("a_id"), "band", "bucket"
    )
    right = bands.select(F.col(id_col).alias("b_id"), "band", "bucket")
    cand = (
        left.join(right, ["band", "bucket"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )

    sh = sig.select(F.col(id_col).alias("a_id"), F.col("shingles").alias("a_sh"))
    sh2 = sig.select(F.col(id_col).alias("b_id"), F.col("shingles").alias("b_sh"))
    verified = cand.join(sh, "a_id").join(sh2, "b_id")
    inter = F.size(F.array_intersect("a_sh", "b_sh")).cast("double")
    union = F.size(F.array_union("a_sh", "b_sh")).cast("double")
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return (
        verified.withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )


# ----------------------------------------------------------------- SimHash


def simhash_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs: 4x16-bit banded signature join, verify
    hamming <= max_hamming. By pigeonhole, any pair within hamming<=3 of
    a 64-bit signature agrees exactly on at least one of 4 bands, so the
    banded equi-join has 100% recall at the signature level."""
    sig = docs.select(
        F.col(id_col), simhash_udf(F.col(text_col)).alias("sim")
    )
    bands = sig.select(
        id_col,
        "sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("sim"), b * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("chunk"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "sim", "bb.band", "bb.chunk")
    left = bands.select(
        F.col(id_col).alias("a_id"), F.col("sim").alias("a_sim"), "band", "chunk"
    )
    right = bands.select(
        F.col(id_col).alias("b_id"), F.col("sim").alias("b_sim"), "band", "chunk"
    )
    return (
        left.join(right, ["band", "chunk"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", hamming64(F.col("a_sim"), F.col("b_sim")).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
