"""Multimodal query surface. Two corpora through the SAME mapInPandas
plumbing, aggregated per modality into one result:

* the deterministic fake-wire table (n=240, seeded payloads) through the
  fake codec — modalities image/audio/video, whose real libraries this
  container lacks;
* a REAL-format table (n=80, alternating WAV/BMP standard files built
  byte-by-byte from pure formulas) through the stdlib codecs
  (operators/multimodal.py::decode_real) — round-3: the repo's last
  stub retired for the formats stdlib can carry.

The oracle is a pinned GOLDEN result: fake-codec rows as committed
literals, real-codec rows REGENERATED INDEPENDENTLY from the synthesis
spec (the sample/pixel formulas and header-size arithmetic — never the
encoded bytes, the encoder, or the decoder), so a bug in either the
encoder or the decoder flips the hash. Per-payload decode semantics are
additionally pinned in tests/test_multimodal.py."""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fluent_server_spark.operators.multimodal import (
    N_FEATURES,
    bmp_pixel_byte,
    bmp_spec,
    decode_media,
    decode_media_real,
    synth_media_df,
    synth_real_media_df,
    wav_sample,
    wav_spec,
)
from fluent_server_spark.queries import QuerySpec

N_FAKE, N_REAL = 240, 80


def q_media_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode 240 fake-wire + 80 real WAV/BMP payloads via mapInPandas,
    aggregate per modality: counts, decode success, mean first-feature,
    mean payload size."""
    fake = decode_media(synth_media_df(spark, N_FAKE).repartition(8))
    real = decode_media_real(synth_real_media_df(spark, N_REAL).repartition(4))
    return (
        fake.unionByName(real)
        .groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("decode_ok").cast("int")).alias("n_ok"),
            F.round(F.avg(F.col("feat")[0]), 4).alias("avg_f0"),
            F.round(F.avg("n_bytes"), 2).alias("avg_bytes"),
        )
    )


def _golden_real_rows() -> list[tuple[str, int, int, float, float]]:
    """Expected (modality, n, n_ok, avg_f0, avg_bytes) for the WAV/BMP
    rows, computed straight from the synthesis FORMULAS: sample/pixel
    values from wav_sample/bmp_pixel_byte, payload sizes from the
    format's header arithmetic — no encoder, no decoder, no bytes."""

    def f0(arr: np.ndarray) -> float:
        # first stripe mean, rounded like _stripe_means
        return round(float(np.array_split(arr.astype(np.float64), N_FEATURES)[0].mean()), 6)

    wav_f0, wav_bytes, bmp_f0, bmp_bytes = [], [], [], []
    for i in range(N_REAL):
        if i % 2 == 0:
            _rate, n = wav_spec(i)
            samples = np.array([wav_sample(i, j) for j in range(n)])
            wav_f0.append(f0(samples))
            # RIFF(12) + fmt(8+16) + JUNK(8+4) + data hdr(8) + 2n
            wav_bytes.append(56 + 2 * n)
        else:
            w, h = bmp_spec(i)
            px = np.array(
                [
                    bmp_pixel_byte(i, y, x, c)
                    for y in range(h)
                    for x in range(w)
                    for c in range(3)
                ]
            )
            bmp_f0.append(f0(px))
            bmp_bytes.append(14 + 40 + ((w * 3 + 3) & ~3) * h)
    rows = []
    for name, f0s, sizes in (("wav", wav_f0, wav_bytes), ("bmp", bmp_f0, bmp_bytes)):
        rows.append(
            (
                name,
                len(f0s),
                len(f0s),
                round(float(np.mean(f0s)), 4),
                round(float(np.mean(sizes)), 2),
            )
        )
    return rows


def _golden_sql() -> str:
    # fake-codec rows: committed literals (seed=42, n=240), rounded
    # inside the query (4dp/2dp) so the float compare is robust to
    # partition-merge summation order; real-codec rows: regenerated from
    # the spec at import
    fake = [
        ("audio", 80, 80, 127.0908, 169.5),
        ("image", 80, 80, 130.0, 174.5),
        ("video", 80, 80, 124.3869, 171.7),
    ]
    values = ",\n  ".join(
        f"('{m}', {n}, {ok}, {f0!r}, {nb!r})"
        for m, n, ok, f0, nb in fake + _golden_real_rows()
    )
    return f"""
SELECT modality, CAST(n AS BIGINT) AS n, CAST(n_ok AS BIGINT) AS n_ok,
       CAST(avg_f0 AS DOUBLE) AS avg_f0, CAST(avg_bytes AS DOUBLE) AS avg_bytes
FROM (VALUES
  {values}
) AS golden(modality, n, n_ok, avg_f0, avg_bytes)
"""


SQL_MEDIA_DECODE_STATS = _golden_sql()

QUERIES: dict[str, QuerySpec] = {
    "media_decode_stats": QuerySpec(q_media_decode_stats, SQL_MEDIA_DECODE_STATS),
}
