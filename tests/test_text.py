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


def test_pii_scrub_udf_matches_catalyst_chain(spark):
    """r6: the Arrow one-pass scrub kernel must replicate the Catalyst
    regexp chain bit-for-bit — including the sequential-semantics edge
    where an earlier replacement creates a word boundary that enables a
    later pattern, and NULL propagation."""
    from fluent_server_spark.functions.text import (
        PII_ORDER,
        pii_counts,
        pii_scrub_udf,
        scrub_pii,
    )

    rows = [
        ("mail a.b-c%d@ex.ample.co and ssn 123-45-6789",),
        ("phone 415-555-0000 ip 10.0.0.1 end",),
        ("overlap 123-45-6789@x.co tail",),
        # replacement-created boundary: "...co678-90-1234" has no \b
        # before the digits until the email is scrubbed to "<EMAIL>"
        ("edge a@b.co678-55-1234 x",),
        ("",),
        (None,),
        ("nothing to see here",),
    ]
    df = spark.createDataFrame(rows, "text string")
    counts = pii_counts(F.col("text"))
    old = df.select(
        *[c.cast("bigint").alias(n) for n, c in counts.items()],
        F.md5(scrub_pii(F.col("text"))).alias("scrub_md5"),
    ).collect()
    s = pii_scrub_udf(F.col("text")).alias("_s")
    new = df.select(s).select(
        *[F.col(f"_s.n_{k}").alias(f"n_{k}") for k in PII_ORDER],
        F.col("_s.scrub_md5").alias("scrub_md5"),
    ).collect()
    assert [tuple(r) for r in old] == [tuple(r) for r in new]


def test_repetition_narrow_matches_aggregation(spark):
    """r6: the narrow per-row counter columns equal the explode+groupBy
    repetition_stats on every doc that has words."""
    from fluent_server_spark.operators.textstats import (
        repetition_stats,
        repetition_stats_narrow_cols,
    )

    rows = [
        (0, "the the the fox"),
        (1, "a b c d"),
        (2, "x"),
        (3, "  padded   spacing  words the the  "),
        (4, ""),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    agg = sorted(map(tuple, repetition_stats(df).collect()))
    rep = repetition_stats_narrow_cols("text")
    nar = sorted(
        map(
            tuple,
            df.filter(F.trim(F.col("text")) != "")
            .select(
                "doc_id",
                rep["n_words"],
                rep["n_distinct_words"],
                rep["top_word_frac"],
                rep["dup_word_frac"],
            )
            .collect(),
        )
    )
    assert agg == nar
