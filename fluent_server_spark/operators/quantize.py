"""Scalar quantization (SQ8) for embedding columns — the FAISS-style
storage dial (public knowledge: faiss ScalarQuantizer QT_8bit): each
float64 dimension maps to a byte-RANGE code (0..255) against
per-dimension [min, max] bounds learned from the corpus, at a bounded
reconstruction error of (max-min)/255/2 per dimension
(round-then-midpoint decode). Codes are stored as array<smallint>
(tinyint is signed and cannot hold 0..255), so the at-rest shrink
comes from Parquet's dictionary/bit-packing of the 256-value domain —
in practice ~1 byte/dim + page overhead, a large multiple smaller than
8-byte doubles, but not a fixed 8x guarantee.

Everything is native Catalyst, no Python anywhere:

* trainer: ONE aggregation with 2*dim min/max accumulators over
  element_at projections — no explode, no row blowup, partial+final
  agg like any min/max (the same shape as SimHash's 64 SUM(CASE)
  accumulators); the result is a single dim-length row (bounded
  driver collect, same budget as the IVF centroid literals).
* encode / decode: map-only zip_with expressions with the bounds
  riding the plan as literal arrays.

Composes with the ANN family: quantize the corpus at rest, dequantize
inside the probe's cosine — SQ8 recall loss on cosine top-k is
negligible (pinned in tests against the exact ranking). Degenerate
dimensions (max == min) encode to 0 and decode exactly to that
constant.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bounds_agg(
    vectors: DataFrame, dim: int, vec_col: str = "embedding"
) -> DataFrame:
    """The one-row bounds aggregation (exposed so tests assert the
    PRODUCTION plan has no Generate/Python): 2*dim min/max accumulators
    over element_at projections, plus two corruption counters — rows
    with NaN anywhere (a single NaN would otherwise poison its whole
    dimension for EVERY vector: max() propagates it into the stored
    range and dequantize reconstructs NaN index-wide) and rows whose
    size differs from `dim`."""
    aggs = []
    for i in range(dim):
        e = F.element_at(F.col(vec_col), i + 1)
        aggs.append(F.min(e).alias(f"mn{i}"))
        aggs.append(F.max(e).alias(f"mx{i}"))
    aggs.append(_nan_agg(vec_col).alias("n_nan"))
    aggs.append(
        F.sum((F.size(F.col(vec_col)) != dim).cast("long")).alias("n_badsize")
    )
    return vectors.agg(*aggs)


def _nan_agg(vec_col: str) -> Column:
    """THE NaN-vector-count aggregate expression — single source for the
    sq8 BUILD gate (bounds_agg) and the sq8 APPEND gate
    (append_to_ivf_index via nan_vector_count), so the two cannot drift
    apart (ADVICE r5)."""
    return F.sum(F.exists(F.col(vec_col), lambda x: F.isnan(x)).cast("long"))


def nan_vector_count(vectors: DataFrame, vec_col: str = "embedding") -> int:
    """Number of vectors containing any NaN element (one aggregate pass,
    no shuffle) — see _nan_agg."""
    return vectors.agg(_nan_agg(vec_col).alias("n")).collect()[0]["n"] or 0


def embedding_bounds(
    vectors: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    check_dim: bool = False,
) -> tuple[list[float], list[float]]:
    """Per-dimension (mins, maxs) in ONE shuffle-free-until-final
    aggregation (see bounds_agg). Fails loud on the inputs that would
    silently corrupt the quantizer: an empty/all-NULL corpus (no bounds
    to learn) and NaN elements (dimension-wide poison). `check_dim=True`
    additionally rejects ragged sizes in the SAME pass — callers that
    already need that validation (the sq8 index build) fold it in here
    instead of paying a second corpus scan."""
    row = bounds_agg(vectors, dim, vec_col).collect()[0]
    if row["n_nan"]:
        raise ValueError(
            f"{row['n_nan']} vector(s) contain NaN — a single NaN poisons "
            "its whole dimension for every stored vector (max() propagates "
            "into the learned range); drop or repair them first"
        )
    if check_dim and row["n_badsize"]:
        raise ValueError(
            f"{row['n_badsize']} vector(s) have size != {dim} — refusing to "
            "learn bounds that would silently mis-quantize them"
        )
    if row["mn0"] is None:
        raise ValueError(
            "cannot learn quantization bounds from an empty corpus (or an "
            "all-NULL vector column)"
        )
    mins = [float(row[f"mn{i}"]) for i in range(dim)]
    maxs = [float(row[f"mx{i}"]) for i in range(dim)]
    return mins, maxs


def _lit_array(xs: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in xs])


def quantize_expr(
    vec: Column, mins: list[float], maxs: list[float]
) -> Column:
    """array<smallint> SQ8 codes: q_i = round((x_i - min_i) * 255 /
    (max_i - min_i)), clamped to [0, 255]; degenerate dims -> 0.
    Values outside the trained bounds (a later batch drifting past the
    corpus min/max) clamp rather than wrap — the standard SQ behavior.
    """
    ranges = [mx - mn for mn, mx in zip(mins, maxs)]
    centered = F.zip_with(vec, _lit_array(mins), lambda x, m: x - m)
    q = F.zip_with(
        centered,
        _lit_array(ranges),
        lambda c, r: F.when(r == 0, F.lit(0.0)).otherwise(
            F.least(F.lit(255.0), F.greatest(F.lit(0.0), F.round(c * 255.0 / r)))
        ),
    )
    return F.transform(q, lambda x: x.cast("smallint"))


def dequantize_expr(
    q: Column, mins: list[float], maxs: list[float]
) -> Column:
    """array<double> reconstruction: x̂_i = min_i + q_i * range_i / 255
    — max error range_i / 255 / 2 per dimension under the round() in
    quantize_expr; degenerate dims decode exactly to their constant."""
    ranges = [mx - mn for mn, mx in zip(mins, maxs)]
    scaled = F.zip_with(
        q, _lit_array(ranges), lambda qq, r: qq.cast("double") * r / 255.0
    )
    return F.zip_with(scaled, _lit_array(mins), lambda s, m: s + m)


def quantize_embeddings(
    vectors: DataFrame,
    mins: list[float],
    maxs: list[float],
    vec_col: str = "embedding",
    out_col: str = "q_embedding",
) -> DataFrame:
    """Map-only encode: the input columns plus the SQ8 code array
    (drop the float column yourself when writing the at-rest table —
    keeping both defeats the 8x)."""
    return vectors.withColumn(out_col, quantize_expr(F.col(vec_col), mins, maxs))


def dequantize_embeddings(
    vectors: DataFrame,
    mins: list[float],
    maxs: list[float],
    q_col: str = "q_embedding",
    out_col: str = "embedding",
) -> DataFrame:
    """Map-only decode back to array<double> for scoring."""
    return vectors.withColumn(out_col, dequantize_expr(F.col(q_col), mins, maxs))


# ------------------------------------------------- product quantization

def train_pq_codebooks(
    vectors: DataFrame,
    dim: int,
    m: int = 8,
    n_codes: int = 256,
    vec_col: str = "embedding",
    sample_rows: int = 10_000,
    n_iter: int = 8,
    seed: int = 29,
) -> list[list[list[float]]]:
    """PQ codebooks (Jégou et al. 2011, public: the FAISS PQ shape):
    the vector splits into `m` contiguous sub-vectors of dim/m; each
    sub-space gets its own k-means codebook of `n_codes` centroids
    trained on a bounded sample (same driver-side Lloyd's recipe and
    budget as train_centroids — at 10^12 rows you train on ~10^5-10^6
    sampled rows, the standard recipe). Returns m codebooks, each
    n_codes x (dim/m). Encoded vectors carry m byte-range codes
    (n_codes <= 256; stored as smallint — see the module header's
    at-rest caveat) against dim 8-byte floats: ~64x less information
    at dim=64, m=8, with the on-disk ratio set by Parquet's encoding
    of the narrow domain."""
    import numpy as np

    if dim % m != 0:
        raise ValueError(f"m={m} must divide dim={dim}")
    if n_codes > 256:
        raise ValueError("n_codes > 256 no longer fits one byte per block")
    sub = dim // m
    raw = vectors.select(vec_col).limit(sample_rows).toPandas()[vec_col].tolist()
    if not raw:
        raise ValueError("cannot train PQ codebooks on an empty corpus")
    bad = [i for i, v in enumerate(raw) if v is None or len(v) != dim]
    if bad:
        raise ValueError(
            f"{len(bad)} sampled vector(s) have size != {dim} (first at "
            f"sample index {bad[0]}) — refusing to train on ragged input"
        )
    sample = np.array(raw, dtype=np.float64)
    if np.isnan(sample).any():
        raise ValueError(
            "sampled vectors contain NaN — k-means means would propagate "
            "it into the codebooks; drop or repair them first"
        )
    rng = np.random.RandomState(seed)
    books: list[list[list[float]]] = []
    for b in range(m):
        block = sample[:, b * sub : (b + 1) * sub]
        k = min(n_codes, len(block))
        cent = block[rng.choice(len(block), size=k, replace=False)]
        for _ in range(n_iter):
            d2 = ((block[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for j in range(len(cent)):
                members = block[assign == j]
                if len(members):
                    cent[j] = members.mean(axis=0)
        books.append([[float(x) for x in c] for c in cent])
    return books


def _block_slice(vec: Column, start: int, length: int) -> Column:
    return F.slice(vec, start + 1, length)


def pq_encode_expr(vec: Column, codebooks: list[list[list[float]]]) -> Column:
    """array<smallint> of m code ids: per block, argmin squared
    distance to that block's codebook — the same narrow literal-argmin
    expression as IVF's assign_cells, once per block. Map-only; the
    codebooks ride the plan as literals (m * n_codes * dim/m doubles —
    the same budget class as the LSH plane tables)."""
    sub = len(codebooks[0][0])
    codes = []
    for b, book in enumerate(codebooks):
        blk = _block_slice(vec, b * sub, sub)
        cents = F.array(*[F.array(*[F.lit(x) for x in c]) for c in book])
        d2s = F.transform(
            cents,
            lambda c: F.aggregate(
                F.zip_with(blk, c, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, z: acc + z,
            ),
        )
        codes.append(
            (F.array_position(d2s, F.array_min(d2s)) - 1).cast("smallint")
        )
    return F.array(*codes)


def pq_decode_expr(codes: Column, codebooks: list[list[list[float]]]) -> Column:
    """array<double> reconstruction: concatenate each block's centroid
    — the ADC-style approximate vector used for scoring."""
    parts = []
    for b, book in enumerate(codebooks):
        cents = F.array(*[F.array(*[F.lit(x) for x in c]) for c in book])
        parts.append(F.element_at(cents, F.element_at(codes, b + 1).cast("int") + 1))
    out = parts[0]
    for p in parts[1:]:
        out = F.concat(out, p)
    return out


def pq_encode(
    vectors: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    out_col: str = "pq_codes",
) -> DataFrame:
    return vectors.withColumn(out_col, pq_encode_expr(F.col(vec_col), codebooks))


def pq_decode(
    vectors: DataFrame,
    codebooks: list[list[list[float]]],
    codes_col: str = "pq_codes",
    out_col: str = "embedding",
) -> DataFrame:
    return vectors.withColumn(out_col, pq_decode_expr(F.col(codes_col), codebooks))
