"""Multimodal plumbing: binary transport, mapInPandas decode, frame
sampling. The codec itself is a deterministic fake (no image/audio libs
in this container — decode_real raises NotImplementedError by design)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fluent_server_spark.operators.multimodal import (
    N_FEATURES,
    decode_media,
    decode_real,
    frame_sample,
    synth_media_df,
    synth_media_pandas,
    _decode_one,
)


@pytest.fixture(scope="module")
def media(spark):
    return synth_media_df(spark, 60).repartition(4)


def test_decode_roundtrip(spark, media):
    out = decode_media(media).toPandas().set_index("media_id").sort_index()
    src = synth_media_pandas(60).set_index("media_id").sort_index()
    assert len(out) == 60
    assert out.decode_ok.all()
    # header fields survive Arrow binary transport exactly
    assert (out.a == src.meta.map(lambda m: m["a"])).all()
    assert (out.b == src.meta.map(lambda m: m["b"])).all()
    assert (out.n_bytes == src.meta.map(lambda m: m["n_bytes"])).all()
    assert out.feat.map(len).eq(N_FEATURES).all()
    # features match a driver-side decode of the same payload
    mid = 7
    want = _decode_one(bytes(src.loc[mid, "payload"]))[4]
    assert list(out.loc[mid, "feat"]) == want


def test_bad_payload_quarantined(spark):
    rows = [(0, 0, "image", b"not-a-media-file", {"a": 0, "b": 0, "n_bytes": 16}),
            (1, 0, "image", None, {"a": 0, "b": 0, "n_bytes": 0})]
    df = spark.createDataFrame(
        rows,
        "media_id long, doc_id long, modality string, payload binary, "
        "meta struct<a:int,b:int,n_bytes:int>",
    )
    out = decode_media(df).toPandas()
    assert not out.decode_ok.any()  # quarantine, no crash


def test_decode_is_narrow_plan(spark):
    flat = synth_media_df(spark, 8)  # no repartition: plan must add no Exchange
    plan = decode_media(flat)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # mapInPandas must not shuffle


def test_frame_sample(spark, media):
    out = frame_sample(media, every_k=16).toPandas()
    src = synth_media_pandas(60)
    vids = src[src.modality == "video"]
    want = sum(len(range(0, m["a"], 16)) for m in vids.meta)
    assert len(out) == want
    assert (out.frame_idx % 16 == 0).all()


def test_real_codec_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_real(b"...", "image")


# ------------------------------------------------- real stdlib codecs


def test_wav_decode_roundtrip_exact():
    """The RIFF/PCM parser recovers rate, sample count, and the exact
    int16 samples written by the synthesizer (incl. walking past the
    JUNK chunk before data)."""
    import numpy as np

    from fluent_server_spark.operators.multimodal import (
        _decode_wav,
        synth_wav_bytes,
        wav_sample,
        wav_spec,
    )

    for i in (0, 2, 14):
        rate, n = wav_spec(i)
        a, b, n_bytes, ok, feat = _decode_wav(synth_wav_bytes(i))
        assert (a, b, ok) == (rate, n, True)
        want = np.array([wav_sample(i, j) for j in range(n)], dtype=np.float64)
        got_mean = feat[0]
        assert got_mean == round(float(np.array_split(want, 8)[0].mean()), 6)


def test_bmp_decode_roundtrip_exact():
    """The BMP parser recovers dimensions and the exact top-down pixel
    bytes (stored bottom-up with 4-byte row padding)."""
    import numpy as np

    from fluent_server_spark.operators.multimodal import (
        _decode_bmp,
        bmp_pixel_byte,
        bmp_spec,
        synth_bmp_bytes,
    )

    for i in (1, 3, 9):
        w, h = bmp_spec(i)
        a, b, n_bytes, ok, feat = _decode_bmp(synth_bmp_bytes(i))
        assert (a, b, ok) == (w, h, True)
        px = np.array(
            [bmp_pixel_byte(i, y, x, c) for y in range(h) for x in range(w) for c in range(3)],
            dtype=np.float64,
        )
        assert feat == [round(float(s.mean()), 6) for s in np.array_split(px, 8)]


def test_real_codecs_quarantine_not_crash(spark):
    """Truncated/garbage/unsupported payloads flow through
    decode_media_real as decode_ok=false rows."""
    import pandas as pd

    from fluent_server_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_media_real,
        synth_wav_bytes,
    )

    rows = pd.DataFrame(
        [
            {"media_id": 0, "doc_id": 0, "modality": "wav",
             "payload": synth_wav_bytes(0)[:20], "meta": {"a": 0, "b": 0, "n_bytes": 20}},
            {"media_id": 1, "doc_id": 0, "modality": "bmp",
             "payload": b"not a bmp", "meta": {"a": 0, "b": 0, "n_bytes": 9}},
            {"media_id": 2, "doc_id": 0, "modality": "jpeg",
             "payload": b"\xff\xd8\xff", "meta": {"a": 0, "b": 0, "n_bytes": 3}},
            {"media_id": 3, "doc_id": 0, "modality": "wav",
             "payload": synth_wav_bytes(4), "meta": {"a": 0, "b": 0, "n_bytes": 0}},
        ]
    )
    df = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    got = {r["media_id"]: r["decode_ok"] for r in decode_media_real(df).collect()}
    assert got == {0: False, 1: False, 2: False, 3: True}
