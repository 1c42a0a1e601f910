"""Corpus-size sweep for the perceptual media near-dup operator.

Claim under test (operators/media_dedup.py docstring): the signature
stage is map-only (wall ~ linear in corpus bytes) and the pair stage is
a banded equi-join whose cost tracks bucket collisions, not corpus².

Synthesis is DISTRIBUTED (mapInPandas over spark.range — payload bytes
are built on executors, never the driver) and structured so signatures
are diverse: each payload's 64 windows/cells are driven by the bits of
md5(id), giving ~distinct fingerprints by construction. Uniform-noise
media would be the documented pathological case (near-constant energy
profiles collapse to a handful of signatures and the equal-sig buckets
go quadratic — the docstring's pre-filter warning), which is a
different experiment. 1% of ids additionally emit a near-copy with one
window/cell flipped (hamming 1..2), so the expected pair count grows
linearly and non-vacuously with the corpus.

Usage: python scripts/media_dedup_bench.py [sizes...]  (default
10000 40000 160000). One JSON line per size to stdout; aggregate JSON
written to BENCH/media_dedup_sweep_r5.json by the caller redirect.
"""

from __future__ import annotations

import hashlib
import json
import struct
import sys
import time

import numpy as np
import pandas as pd


def _bits64(i: int) -> np.ndarray:
    h = int.from_bytes(hashlib.md5(str(i).encode()).digest()[:8], "big")
    return np.array([(h >> k) & 1 for k in range(64)], dtype=np.int64)


def _bytes64(i: int) -> np.ndarray:
    """64 pseudo-random bytes for id i (4 chained md5 blocks)."""
    out = b"".join(
        hashlib.md5(f"{i}:{blk}".encode()).digest() for blk in range(4)
    )
    return np.frombuffer(out, dtype=np.uint8).astype(np.int64)


def sweep_wav_bytes(i: int, flip: int = -1) -> bytes:
    """512-sample WAV with CONTINUOUS per-window amplitudes (64 distinct
    md5-derived levels): the energy fingerprint's median threshold then
    yields ~32 diverse bits per signal. Binary loud/quiet amplitudes are
    the operator's documented degenerate case (majority-loud signals all
    hash to 0 under a strict-> median) — that collapse is a different,
    pathological experiment, not this sweep. `flip` boosts one window
    far above the range (a hamming-1..2 near-copy: the boosted bit flips
    and the shifted median may flip one borderline neighbor)."""
    levels = 100 + _bytes64(i) * 120  # 64 distinct-ish amplitudes <= 30700
    if flip >= 0:
        levels = levels.copy()
        levels[flip] = 31500  # above every normal level, inside int16
    # 8 samples per window; alternate sign so means stay ~0 but |amp| high
    amp = levels.repeat(8)
    sgn = np.where(np.arange(512) % 2 == 0, 1, -1)
    samples = (amp * sgn).astype("<i2")
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def sweep_bmp_bytes(i: int, flip: int = -1) -> bytes:
    """16x16 BMP: 2x2 block (r,c) bright iff bit 8r+c of md5(i)."""
    bits = _bits64(i)
    if flip >= 0:
        bits[flip] ^= 1
    grid = bits.reshape(8, 8)
    px = np.where(grid == 1, 220, 30).astype(np.uint8)
    px = px.repeat(2, axis=0).repeat(2, axis=1)  # 16x16
    bgr = np.stack([px, px, px], axis=2)
    h, w = 16, 16
    row_bytes = (w * 3 + 3) & ~3
    rows = []
    for y in range(h - 1, -1, -1):
        row = bytearray(row_bytes)
        row[: w * 3] = bgr[y].reshape(-1).tobytes()
        rows.append(bytes(row))
    body = b"".join(rows)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    off = 14 + 40
    hdr = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    return hdr + info + body


def synth_sweep_media(spark, n: int):
    """Distributed corpus: id i -> wav (even) / bmp (odd); every 100th
    id also emits a flipped near-copy with media_id = i + 10**9."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                mod = "wav" if i % 2 == 0 else "bmp"
                fn = sweep_wav_bytes if i % 2 == 0 else sweep_bmp_bytes
                rows.append((i, mod, fn(i)))
                if i % 100 == 0:
                    rows.append((i + 10**9, mod, fn(i, flip=i % 64)))
            yield pd.DataFrame(rows, columns=["media_id", "modality", "payload"])

    return (
        spark.range(n)
        .repartition(32)
        .mapInPandas(gen, "media_id long, modality string, payload binary")
    )


def main() -> int:
    sys.path.insert(0, "/root/repo")
    from fluent_server_spark.operators.media_dedup import (
        fingerprint_media,
        media_neardup_pairs,
    )
    from fluent_server_spark.session import get_spark

    sizes = [int(s) for s in sys.argv[1:]] or [10_000, 40_000, 160_000]
    spark = get_spark("media-dedup-bench", cpus=32)
    out = {"sweep": [], "sf": None, "planted_rate": 0.01}
    for n in sizes:
        media = synth_sweep_media(spark, n)
        media = media.localCheckpoint(eager=True)  # exclude synth cost
        t0 = time.monotonic()
        n_sigs = (
            fingerprint_media(media)
            .agg({"sig": "count"})
            .collect()[0][0]
        )
        sig_wall = time.monotonic() - t0
        t0 = time.monotonic()
        n_pairs = media_neardup_pairs(media, max_hamming=2).count()
        pair_wall = time.monotonic() - t0
        rec = {
            "n_media": n,
            "n_sigs": int(n_sigs),
            "n_pairs": int(n_pairs),
            "sig_wall_s": round(sig_wall, 3),
            "pair_wall_s": round(pair_wall, 3),
        }
        out["sweep"].append(rec)
        print(json.dumps(rec), flush=True)
    print(json.dumps(out), flush=True)
    with open("/root/repo/BENCH/media_dedup_sweep_r5.json", "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
