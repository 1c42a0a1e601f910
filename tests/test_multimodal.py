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
