"""Perceptual media near-dup: aHash (BMP) / energy hash (WAV) parity
with the pure-Python kernel, full expected-pair-set equality, banded
recall guarantees, and quarantine of undecodable payloads.

Not SQL-expressible (the oracle would need a binary media decoder), so
the pin is pytest-side like substring dedup: the pure-Python kernel
derives the complete expected pair set and the Spark plan must match
it exactly.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from fluent_server_spark.operators.dedup import banded_hamming_pairs
from fluent_server_spark.operators.media_dedup import (
    audio_fingerprint,
    fingerprint_media,
    image_ahash,
    media_neardup_pairs,
)
from fluent_server_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    bmp_spec,
    synth_bmp_bytes,
    synth_real_media_pandas,
    synth_wav_bytes,
    wav_spec,
)


def _bmp_from_pixels(px: np.ndarray) -> bytes:
    """Pack a top-down (h, w, 3) BGR uint8 array as a 24-bit BMP
    (bottom-up storage, 4-byte row padding) — same layout the synth
    generator and the decoder agree on."""
    h, w, _ = px.shape
    row_bytes = (w * 3 + 3) & ~3
    rows = []
    for y in range(h - 1, -1, -1):  # stored bottom-up
        row = bytearray(row_bytes)
        row[: w * 3] = px[y].reshape(-1).tobytes()
        rows.append(bytes(row))
    body = b"".join(rows)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    off = 14 + 40
    hdr = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    return hdr + info + body


def _decode_bmp_px(payload: bytes) -> np.ndarray:
    from fluent_server_spark.operators.multimodal import bmp_pixels

    px = bmp_pixels(payload)
    h, w3 = px.shape
    return px.reshape(h, w3 // 3, 3).copy()


def _corpus_pandas():
    """Real-format corpus + perturbed near-copies, fully deterministic."""
    base = synth_real_media_pandas(24)
    rows = base.to_dict("records")
    nid = len(rows)
    # near-copy BMPs: invert one pixel of image 1 / brighten one of 3
    for src_i, tweak in [(1, "invert"), (3, "plus1")]:
        px = _decode_bmp_px(synth_bmp_bytes(src_i))
        if tweak == "invert":
            px[0, 0] = 255 - px[0, 0]
        else:
            px[1, 1] = np.minimum(px[1, 1].astype(int) + 1, 255).astype(np.uint8)
        payload = _bmp_from_pixels(px)
        w, h = bmp_spec(src_i)
        rows.append(
            {
                "media_id": nid,
                "doc_id": 0,
                "modality": "bmp",
                "payload": payload,
                "meta": {"a": w, "b": h, "n_bytes": len(payload)},
            }
        )
        nid += 1
    # near-copy WAV: source 0 with a handful of samples nudged
    wav = bytearray(synth_wav_bytes(0))
    wav[-2] = (wav[-2] + 3) % 256
    rate, n = wav_spec(0)
    rows.append(
        {
            "media_id": nid,
            "doc_id": 0,
            "modality": "wav",
            "payload": bytes(wav),
            "meta": {"a": rate, "b": n, "n_bytes": len(wav)},
        }
    )
    nid += 1
    # undecodable payload + unknown modality: must quarantine, not pair
    rows.append(
        {
            "media_id": nid,
            "doc_id": 0,
            "modality": "bmp",
            "payload": b"not-a-bmp",
            "meta": {"a": 0, "b": 0, "n_bytes": 9},
        }
    )
    rows.append(
        {
            "media_id": nid + 1,
            "doc_id": 0,
            "modality": "mp4",
            "payload": b"\x00\x01\x02",
            "meta": {"a": 0, "b": 0, "n_bytes": 3},
        }
    )
    import pandas as pd

    return pd.DataFrame(rows)


def _python_sig(row):
    if row["modality"] == "bmp":
        return image_ahash(bytes(row["payload"]))
    if row["modality"] == "wav":
        return audio_fingerprint(bytes(row["payload"]))
    return None


def _expected_pairs(pdf, max_hamming=3):
    sigs = {
        r["media_id"]: (_python_sig(r), r["modality"])
        for r in pdf.to_dict("records")
    }
    out = set()
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            sa, ma = sigs[a]
            sb, mb = sigs[b]
            if sa is None or sb is None or ma != mb:
                continue
            d = bin((sa & 0xFFFFFFFFFFFFFFFF) ^ (sb & 0xFFFFFFFFFFFFFFFF)).count("1")
            if d <= max_hamming:
                out.add((a, b, d))
    return out


@pytest.fixture(scope="module")
def media(spark):
    return spark.createDataFrame(_corpus_pandas(), schema=MEDIA_SCHEMA).repartition(4)


def test_fingerprint_parity_and_quarantine(spark, media):
    pdf = _corpus_pandas()
    # collect(), not toPandas(): nullable longs become float64 in pandas
    # and 64-bit signatures do not survive the 53-bit mantissa
    got = {r["media_id"]: r["sig"] for r in fingerprint_media(media).collect()}
    for r in pdf.to_dict("records"):
        want = _python_sig(r)
        assert got[r["media_id"]] == want, r["media_id"]


def test_pair_set_equals_python_reference(spark, media):
    want = _expected_pairs(_corpus_pandas())
    got = {
        (r.a_id, r.b_id, r.hamming)
        for r in media_neardup_pairs(media).collect()
    }
    assert got == want
    pairs = {(a, b) for (a, b, _h) in got}
    # non-vacuous, pinned against the deterministic kernel:
    assert (3, 25) in pairs  # +1-on-one-channel copy is a near-dup (hamming 0)
    assert (0, 26) in pairs  # sample-nudged wav is a near-dup (hamming 0)
    # a MATERIALLY changed image (inverted pixel, kernel hamming 10) is
    # correctly rejected at max_hamming=3 — discrimination, not just recall
    assert (1, 24) not in pairs
    # and no pair ever crosses modality (wav ids even<24; bmp odd<24)
    mods = {r["media_id"]: r["modality"] for r in _corpus_pandas().to_dict("records")}
    assert all(mods[a] == mods[b] for (a, b, _h) in got)


def test_wider_bands_cover_larger_hamming(spark):
    # literal signatures at hamming 5: invisible to 4 bands' guarantee,
    # required to be found by 8 bands (pigeonhole covers hamming <= 7)
    a, b = 0b11111, 0
    sig = spark.createDataFrame([(1, a), (2, b)], "id long, sig long")
    got = banded_hamming_pairs(
        sig, id_col="id", sig_col="sig", max_hamming=7, n_bands=8
    ).collect()
    assert [(r.a_id, r.b_id, r.hamming) for r in got] == [(1, 2, 5)]
    with pytest.raises(ValueError, match="pigeonhole"):
        banded_hamming_pairs(sig, id_col="id", sig_col="sig", max_hamming=5, n_bands=4)
    with pytest.raises(ValueError, match="divide"):
        banded_hamming_pairs(sig, id_col="id", sig_col="sig", max_hamming=2, n_bands=3)


def test_fingerprint_stage_is_narrow(spark):
    flat = spark.createDataFrame(_corpus_pandas(), schema=MEDIA_SCHEMA)
    plan = (
        fingerprint_media(flat)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # signature stage must not shuffle


def test_degenerate_sizes_well_defined():
    # 1x1 image: single cell, never strictly above the mean -> sig 0
    one = _bmp_from_pixels(np.full((1, 1, 3), 200, dtype=np.uint8))
    assert image_ahash(one) == 0
    # 3x2: smaller than the 8x8 grid on both axes, still total
    tiny = _bmp_from_pixels(
        (np.arange(3 * 2 * 3, dtype=np.uint8) * 40 % 256).reshape(3, 2, 3)
    )
    assert image_ahash(tiny) is not None
    # zero-sample wav: fingerprint defined as 0
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", 0)
    empty_wav = b"RIFF" + struct.pack("<I", len(body)) + body
    assert audio_fingerprint(empty_wav) == 0


# ------------------------------------- persisted fingerprint index

from fluent_server_spark.operators.media_dedup import (  # noqa: E402
    media_neardup_against,
    write_media_fingerprint_index,
)


def test_incremental_against_index(spark, media, tmp_path):
    """Batch-vs-corpus equals the self-join restricted to cross-set
    pairs — the same equivalence contract the minhash incremental path
    pins — and the corpus is never re-decoded (index files only)."""
    pdf = _corpus_pandas()
    corpus_pdf = pdf[pdf.media_id < 24]
    batch_pdf = pdf[pdf.media_id >= 24]
    corpus = spark.createDataFrame(corpus_pdf, schema=MEDIA_SCHEMA)
    batch = spark.createDataFrame(batch_pdf, schema=MEDIA_SCHEMA)
    path = str(tmp_path / "media_idx")
    write_media_fingerprint_index(corpus, path)

    got = {
        (r.new_id, r.corpus_id, r.hamming)
        for r in media_neardup_against(batch, path).collect()
    }
    want = {
        (b, a, h)
        for (a, b, h) in _expected_pairs(pdf)
        if a < 24 <= b  # cross-set only, self-join orders a < b
    }
    assert got == want and len(got) > 0


def test_incremental_max_hamming_guard(spark, media, tmp_path):
    path = str(tmp_path / "media_idx")
    write_media_fingerprint_index(
        spark.createDataFrame(_corpus_pandas(), schema=MEDIA_SCHEMA), path
    )
    with pytest.raises(ValueError, match="pigeonhole"):
        media_neardup_against(
            spark.createDataFrame(_corpus_pandas(), schema=MEDIA_SCHEMA),
            path,
            max_hamming=7,  # stored index has n_bands=4
        ).collect()


def test_stream_media_dedup_matches_batch(spark, tmp_path):
    """Streaming media dedup-on-ingest == the batch operator over the
    SAME persisted fingerprint index; epoch outputs union exactly-once
    and the corpus payloads are never readable by the stream."""
    from fluent_server_spark.streaming.dedup_stream import (
        read_flagged_pairs,
        stream_media_neardup_against_index,
    )
    from fluent_server_spark.operators.media_dedup import (
        write_media_fingerprint_index,
        media_neardup_against,
    )

    pdf = _corpus_pandas()
    corpus = spark.createDataFrame(pdf[pdf.media_id < 24], schema=MEDIA_SCHEMA)
    idx = str(tmp_path / "midx")
    write_media_fingerprint_index(corpus, idx)

    batch_pdf = pdf[pdf.media_id >= 24][["media_id", "modality", "payload"]]
    src = tmp_path / "incoming"
    src.mkdir()
    ddl = "media_id long, modality string, payload binary"
    spark.createDataFrame(batch_pdf.iloc[:2], ddl).coalesce(1).write.parquet(
        str(src / "b1")
    )
    spark.createDataFrame(batch_pdf.iloc[2:], ddl).coalesce(1).write.parquet(
        str(src / "b2")
    )

    out, ckpt = str(tmp_path / "flagged"), str(tmp_path / "ckpt")
    q = stream_media_neardup_against_index(
        spark, f"{src}/*", idx, out, ckpt, max_files_per_trigger=1
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    key = lambda r: (r["new_id"], r["corpus_id"], r["hamming"])  # noqa: E731
    got = sorted(map(key, read_flagged_pairs(spark, out).collect()))
    want = sorted(
        map(
            key,
            media_neardup_against(
                spark.createDataFrame(batch_pdf, ddl), idx
            ).collect(),
        )
    )
    assert got == want
    assert len(got) >= 2  # planted near-copies flagged across epochs


def test_hot_bucket_cap_sheds_degenerate_cluster(spark):
    """The LSH bucket cap: a degenerate equal-signature cluster (every
    band hot) is shed, while genuine near-dups in small buckets
    survive — the measured-quadratic case from BENCH/BASELINE.md made
    un-explosive."""
    from fluent_server_spark.operators.multimodal import synth_wav_bytes

    same = synth_wav_bytes(0)
    rows = [(i, "wav", same) for i in range(50)]  # degenerate cluster
    rows += [(100, "bmp", synth_bmp_bytes(3)), (101, "bmp", synth_bmp_bytes(3))]
    df = spark.createDataFrame(
        rows, "media_id long, modality string, payload binary"
    )
    uncapped = media_neardup_pairs(df).count()
    assert uncapped == 50 * 49 // 2 + 1  # quadratic cluster + the bmp pair
    capped = media_neardup_pairs(df, max_bucket=10).collect()
    assert {(r.a_id, r.b_id) for r in capped} == {(100, 101)}


def test_incremental_max_bucket_caps_collapsed_corpus(spark, media, tmp_path):
    """ADVICE r5: the cross-set kernel now accepts the same hot-bucket
    cap as the self-join — a degenerate signature cluster in the STORED
    index must stop fanning every matching new row over the whole
    cluster. Cap=None keeps full recall (unchanged); a cap below the
    cluster size suppresses exactly the collapsed bucket's pairs."""
    pdf = _corpus_pandas()
    corpus_pdf = pdf[pdf.media_id < 24]
    batch_pdf = pdf[pdf.media_id >= 24]
    corpus = spark.createDataFrame(corpus_pdf, schema=MEDIA_SCHEMA)
    batch = spark.createDataFrame(batch_pdf, schema=MEDIA_SCHEMA)
    path = str(tmp_path / "media_idx_cap")
    write_media_fingerprint_index(corpus, path)

    uncapped = {
        (r.new_id, r.corpus_id, r.hamming)
        for r in media_neardup_against(batch, path).collect()
    }
    # a cap generous enough for every real bucket changes nothing
    roomy = {
        (r.new_id, r.corpus_id, r.hamming)
        for r in media_neardup_against(batch, path, max_bucket=10_000).collect()
    }
    assert roomy == uncapped and len(uncapped) > 0
    # cap of zero drops every corpus band row -> no pairs survive (the
    # degenerate-bucket limit case), proving the cap binds on the
    # corpus side of the cross-set join
    none_left = media_neardup_against(batch, path, max_bucket=0).count()
    assert none_left == 0
