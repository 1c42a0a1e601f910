"""Text-analysis functions vs literal expectations and python oracles."""

from __future__ import annotations

from pyspark.sql import functions as F

from fluent_server_spark.functions.text import (
    hamming64,
    lang_id_udf,
    md5_fingerprint,
    quality_score,
    simhash64,
    simhash_udf,
    token_count,
    bpeish_token_count,
    winnow_fingerprint,
)


def _one(spark, text, col):
    return spark.createDataFrame([(text,)], "text string").select(
        col.alias("v")
    ).first().v


def test_token_counts(spark):
    assert _one(spark, "a b  c", token_count(F.col("text"))) == 3
    assert _one(spark, "  hello world ", token_count(F.col("text"))) == 2
    assert _one(spark, "x", token_count(F.col("text"))) == 1
    # BPE-ish: camelCase + digit boundaries split
    assert _one(spark, "fooBar 123abc", bpeish_token_count(F.col("text"))) == 4


def test_quality_score_range(spark, turns_sdf):
    scored = turns_sdf.select(
        quality_score(F.col("text"), F.length("text")).alias("q")
    )
    mn, mx = scored.agg(F.min("q"), F.max("q")).first()
    assert 0.0 <= mn <= mx <= 1.0


def test_lang_id_markers(spark):
    cases = {
        "the cat sat on the mat and it is happy": "en",
        "le chat est dans la maison pour une nuit": "fr",
        "der hund ist nicht mit der katze und das haus": "de",
        "el perro es grande y la casa es azul": "es",
        "": "und",
        "zzz qqq xxx": "und",
    }
    df = spark.createDataFrame([(t,) for t in cases], "text string")
    got = {r.text: r.lang for r in df.select("text", lang_id_udf("text").alias("lang")).collect()}
    assert got == cases


def test_fingerprints_stability(spark):
    base = "abcdefghijklmnopqrstuvwxyz0123456789"
    fp = lambda t, c: _one(spark, t, c)
    # md5 fingerprint: whitespace-normalization invariance
    assert fp("a  b\tc", md5_fingerprint(F.col("text"))) == fp(
        "a b c", md5_fingerprint(F.col("text"))
    )
    # winnow: appending text far from the min shingle usually keeps the fp
    a = fp(base, winnow_fingerprint(F.col("text")))
    b = fp(base + "zzz", winnow_fingerprint(F.col("text")))
    assert a == b
    assert fp("completely different", winnow_fingerprint(F.col("text"))) != a


def test_simhash_properties(spark):
    a = "the quick brown fox jumps over the lazy dog again and again today"
    b = a.replace("lazy", "sleepy")
    c = "entirely unrelated words about spark shuffles and parquet row groups"
    df = spark.createDataFrame([(0, a), (1, b), (2, c)], "i long, text string")
    sh = {r.i: r.s for r in df.select("i", simhash_udf("text").alias("s")).collect()}
    # python oracle agreement
    assert sh[0] == simhash64(a)
    d_ab = bin((sh[0] ^ sh[1]) & (2**64 - 1)).count("1")
    d_ac = bin((sh[0] ^ sh[2]) & (2**64 - 1)).count("1")
    assert d_ab < d_ac
    # hamming64 column matches python popcount
    got = (
        df.filter(F.col("i") < 2)
        .agg(F.min(simhash_udf("text")).alias("x"), F.max(simhash_udf("text")).alias("y"))
        .select(hamming64(F.col("x"), F.col("y")).alias("h"))
        .first()
        .h
    )
    assert got == bin((sh[0] ^ sh[1]) & (2**64 - 1)).count("1")
