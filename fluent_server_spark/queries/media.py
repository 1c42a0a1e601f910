"""Multimodal query surface. The corpus is the deterministic synthetic
media table (fixed n=240, seeded payloads — independent of sf), so the
oracle is a pinned GOLDEN result: the literal 3-row aggregate the fake
codec must produce. Changing the codec, the wire format, the batch
plumbing, or the aggregate silently would flip the hash. Per-payload
decode semantics are additionally pinned in tests/test_multimodal.py."""

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


# Golden result of the deterministic fake-codec decode (seed=42, n=240).
# avg_f0 is rounded to 4dp / avg_bytes to 2dp inside the query, so the
# float compare is robust to partition-merge summation order.
SQL_MEDIA_DECODE_STATS = """
SELECT modality, CAST(n AS BIGINT) AS n, CAST(n_ok AS BIGINT) AS n_ok,
       CAST(avg_f0 AS DOUBLE) AS avg_f0, CAST(avg_bytes AS DOUBLE) AS avg_bytes
FROM (VALUES
  ('audio', 80, 80, 127.0908, 169.5),
  ('image', 80, 80, 130.0,    174.5),
  ('video', 80, 80, 124.3869, 171.7)
) AS golden(modality, n, n_ok, avg_f0, avg_bytes)
"""

QUERIES: dict[str, QuerySpec] = {
    "media_decode_stats": QuerySpec(q_media_decode_stats, SQL_MEDIA_DECODE_STATS),
}
