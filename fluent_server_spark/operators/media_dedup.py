"""Perceptual near-duplicate detection for media columns.

The text side of the pipeline has exact/minhash/simhash/embedding
near-dup; this is the MEDIA analogue — the multimodal-dedup stage a
training-data pipeline runs over image/audio corpora (the same role
pHash-style hashing plays in web-image corpus prep, e.g. the
LAION-style dedup passes; average hash is the classical baseline from
the pHash family). The reference (`/root/reference/`, a log-ingest
server) has no media operators; this belongs to the mandated
training-data family alongside operators/dedup.py.

Two perceptual fingerprints, both 64-bit and both PURE functions of
the payload bytes (pinned against an in-test pure-Python re-derivation
— the Spark path and the reference path share the same kernel, so the
pin is that the Arrow plumbing, null handling, and signed-long
assembly are faithful):

* image aHash (BMP): decode → ITU-R BT.601 luma → 8×8 block-mean
  resize (integer bin edges; degenerate bins sample the boundary row,
  so any size ≥1×1 is well-defined) → bit k set when cell k is
  strictly brighter than the global cell mean.
* audio energy hash (WAV): decode → 64 equal sample windows (same
  integer bin edges; short clips leave trailing windows at energy 0)
  → bit k set when window k's mean |amplitude| is strictly above the
  median window energy.

Near-dup pairs reuse the SimHash banded-hamming kernel
(operators/dedup.py::banded_hamming_pairs) with `modality` as a
segment key so WAV never pairs with BMP. 100 TB shape: the signature
stage is a map-only Arrow pandas_udf over the binary column (no
shuffle, no driver traffic); the pair stage is the shared (band,
chunk) equi-join — never a cross join — and hamming<=k recall is
guaranteed by pigeonhole for k < n_bands. Degenerate constant
payloads (all-black frames, silence) all hash to 0 and form one hot
bucket; at scale pre-filter those with the decode stats
(operators/multimodal.py::decode_media_real) before pairing.

Not SQL-expressible (the oracle would need a binary image/audio
decoder), so correctness is pinned pytest-side like substring dedup:
tests/test_media_dedup.py derives the full expected pair set with the
pure-Python kernel and asserts set equality, plus perturbed-copy
recall and cross-modality isolation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fluent_server_spark.operators.dedup import banded_hamming_pairs
from fluent_server_spark.operators.multimodal import bmp_pixels, wav_samples

_TWO63 = 1 << 63
_TWO64 = 1 << 64


def _signed64(unsigned: int) -> int:
    """Reinterpret an unsigned 64-bit int as Spark's signed long."""
    return unsigned - _TWO64 if unsigned >= _TWO63 else unsigned


def _box_means(a: np.ndarray, n: int) -> np.ndarray:
    """Block means along axis 0 with integer bin edges (n boxes).

    Degenerate bins (input shorter than n) sample the clamped boundary
    row so the result is total and deterministic for any length >= 1.
    """
    edges = (np.arange(n + 1) * a.shape[0]) // n
    out = []
    for i in range(n):
        lo, hi = int(edges[i]), int(edges[i + 1])
        if hi <= lo:
            lo = min(lo, a.shape[0] - 1)
            hi = lo + 1
        out.append(a[lo:hi].mean(axis=0))
    return np.stack(out)


def image_ahash(payload: bytes) -> int | None:
    """64-bit average hash of a BMP payload (signed long), or None if
    the payload does not decode. Pure function — doubles as the test
    reference."""
    px = bmp_pixels(payload)
    if px is None:
        return None
    h, w3 = px.shape
    bgr = px.reshape(h, w3 // 3, 3).astype(np.float64)
    gray = 0.114 * bgr[:, :, 0] + 0.587 * bgr[:, :, 1] + 0.299 * bgr[:, :, 2]
    cells = _box_means(_box_means(gray, 8).T, 8).T  # (8, 8) block means
    mean = cells.mean()
    bits = (cells.reshape(-1) > mean).astype(np.uint64)
    unsigned = int(sum(int(b) << k for k, b in enumerate(bits)))
    return _signed64(unsigned)


def audio_fingerprint(payload: bytes) -> int | None:
    """64-bit energy fingerprint of a WAV payload (signed long), or
    None if the payload does not decode. Pure function — doubles as
    the test reference."""
    parsed = wav_samples(payload)
    if parsed is None:
        return None
    _rate, samples = parsed
    if len(samples) == 0:
        return 0
    amp = np.abs(samples.astype(np.float64))
    edges = (np.arange(65) * len(amp)) // 64
    energies = np.array(
        [
            amp[edges[k] : edges[k + 1]].mean() if edges[k + 1] > edges[k] else 0.0
            for k in range(64)
        ]
    )
    med = float(np.median(energies))
    unsigned = int(sum(1 << k for k in range(64) if energies[k] > med))
    return _signed64(unsigned)


def _fingerprint_one(payload, modality) -> int | None:
    if payload is None:
        return None
    if modality == "bmp":
        return image_ahash(bytes(payload))
    if modality == "wav":
        return audio_fingerprint(bytes(payload))
    return None  # unknown modality -> quarantine, never crash


@F.pandas_udf(T.LongType())
def media_fingerprint_udf(payload: pd.Series, modality: pd.Series) -> pd.Series:
    """Arrow-batched perceptual fingerprint: the per-payload loop runs
    inside the Arrow batch (payloads are opaque variable-size binaries
    — the same shape as decode_media_real's codec loop); transfer and
    scheduling stay vectorized."""
    return pd.Series(
        [_fingerprint_one(p, m) for p, m in zip(payload, modality)],
        dtype="object",
    ).astype("Int64")


def fingerprint_media(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    modality_col: str = "modality",
) -> DataFrame:
    """(id, modality, sig): map-only perceptual signature stage.

    sig is NULL for payloads that do not decode (or unknown
    modalities) — the quarantine-not-crash contract of the decode
    stage (multimodal.py) carried through."""
    return media.select(
        F.col(id_col),
        F.col(modality_col).alias("modality"),
        media_fingerprint_udf(F.col(payload_col), F.col(modality_col)).alias("sig"),
    )


def media_neardup_pairs(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    modality_col: str = "modality",
    max_hamming: int = 3,
    n_bands: int = 4,
    max_bucket: int | None = None,
) -> DataFrame:
    """(a_id, b_id, hamming) perceptual near-dup pairs, same-modality
    only. Undecodable payloads are excluded (NULL sig). Raise n_bands
    to 8 to cover hamming <= 7 (pigeonhole guarantee is
    max_hamming < n_bands — enforced in banded_hamming_pairs). At
    scale, set `max_bucket` (the LSH hot-bucket cap) so a degenerate
    signature cluster — byte-identical frames, silence, the measured
    majority-loud collapse in BENCH/BASELINE.md — cannot drive the
    self-join quadratic."""
    sig = fingerprint_media(media, id_col, payload_col, modality_col).filter(
        F.col("sig").isNotNull()
    )
    # two consumers (left/right of the banded self-join): materialize
    # the skinny (id, modality, sig) relation so payloads decode once
    sig = sig.localCheckpoint(eager=True)
    return banded_hamming_pairs(
        sig,
        id_col=id_col,
        sig_col="sig",
        max_hamming=max_hamming,
        n_bands=n_bands,
        segment_cols=("modality",),
        max_bucket=max_bucket,
    )


# ------------------------------------- persisted fingerprint index

def write_media_fingerprint_index(
    media: DataFrame,
    path: str,
    id_col: str = "media_id",
    payload_col: str = "payload",
    modality_col: str = "modality",
    n_bands: int = 4,
) -> None:
    """Persist the corpus's banded fingerprint relation — the media
    counterpart of write_minhash_index: ingest-time dedup probes it
    without ever re-decoding the corpus. `{path}/bands` is
    (id, sig, modality, band, chunk) PARTITIONED BY band, so an
    increment's candidate join reads only band files; `{path}/index.json`
    pins n_bands and column names so an index banded differently can
    never silently join. Build cost is one decode pass + the
    partitioned write."""
    import json
    import os

    from fluent_server_spark.operators.dedup import signature_bands

    sig = fingerprint_media(media, id_col, payload_col, modality_col).filter(
        F.col("sig").isNotNull()
    )
    bands = signature_bands(sig, id_col, "sig", n_bands, ("modality",))
    bands.write.mode("overwrite").partitionBy("band").parquet(f"{path}/bands")
    manifest = {"n_bands": n_bands, "id_col": id_col, "format": 1}
    with open(os.path.join(path, "index.json"), "w") as f:
        json.dump(manifest, f)


def media_neardup_against(
    new_media: DataFrame,
    index_path: str,
    id_col: str = "media_id",
    payload_col: str = "payload",
    modality_col: str = "modality",
    max_hamming: int = 3,
    max_bucket: int | None = None,
) -> DataFrame:
    """INCREMENTAL media dedup: today's batch vs the stored corpus
    fingerprint index — (new_id, corpus_id, hamming), same-modality
    only. Only the new batch is decoded and banded; the corpus side is
    the at-rest band relation. Banding parameters come from the index
    manifest (never caller-supplied, so a mismatch is impossible).
    max_hamming must stay under the stored n_bands for the pigeonhole
    recall guarantee — enforced in banded_hamming_join. `max_bucket`
    (ADVICE r5) caps degenerate signature clusters in the STORED index
    (silence/black frames — the r5 sweep measured a 46%-collapsed
    corpus) so one collapsed bucket cannot fan every matching new row
    out over the whole cluster; None (default) preserves full recall,
    matching banded_hamming_pairs' cap semantics."""
    import json
    import os

    from fluent_server_spark.operators.dedup import banded_hamming_join

    with open(os.path.join(index_path, "index.json")) as f:
        man = json.load(f)
    spark = new_media.sparkSession
    corpus_bands = spark.read.parquet(f"{index_path}/bands").withColumnRenamed(
        man["id_col"], id_col
    )
    new_sig = fingerprint_media(new_media, id_col, payload_col, modality_col).filter(
        F.col("sig").isNotNull()
    )
    return banded_hamming_join(
        new_sig,
        corpus_bands,
        id_col=id_col,
        sig_col="sig",
        max_hamming=max_hamming,
        n_bands=man["n_bands"],
        segment_cols=("modality",),
        max_bucket=max_bucket,
    )
