"""Multimodal query surface (rows-only: the corpus is generated
binary payloads; semantics pinned in tests/test_multimodal.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fluent_server_spark.operators.multimodal import decode_media, synth_media_df
from fluent_server_spark.queries import QuerySpec


def q_media_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode 240 synthetic media payloads via mapInPandas, aggregate
    per modality: counts, decode success, mean first-feature."""
    media = synth_media_df(spark, 240).repartition(8)
    decoded = decode_media(media)
    return decoded.groupBy("modality").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("decode_ok").cast("int")).alias("n_ok"),
        F.round(F.avg(F.col("feat")[0]), 4).alias("avg_f0"),
        F.round(F.avg("n_bytes"), 2).alias("avg_bytes"),
    )


QUERIES: dict[str, QuerySpec] = {
    "media_decode_stats": QuerySpec(q_media_decode_stats, None),
}
