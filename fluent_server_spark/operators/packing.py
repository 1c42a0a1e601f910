"""Sequence packing — assign ordered per-conversation rows to
fixed-budget training chunks.

The pre-tokenization packing step of an LLM data pipeline: a
conversation's turns, in order, are split into chunks of at most
``max_tokens`` (greedy by cumulative token count — the chunk index is
``floor(tokens_before / max_tokens)``, the standard streaming-packing
rule that needs only a prefix sum, not bin packing).

Scale shape: ONE shuffle on the conversation key (window partition),
then a per-key linear scan — exactly how a 10^12-turn table packs on a
real cluster, since conversations are small relative to partitions and
the key space is uniform (hot conversations are bounded by the same
salting math as the pipeline sinks). The prefix sum is a running
aggregate inside the window — no self-join, no iteration.

The chunking decision is a pure function of (key, order, token counts),
so re-runs and the DuckDB oracle reproduce identical chunk ids — the
same determinism contract as operators/sampling.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    rows: DataFrame,
    key_col: str,
    order_cols: list[str],
    tokens_col: Column,
    max_tokens: int,
) -> DataFrame:
    """Per (key, chunk): row count and token total.

    ``tokens_col`` is an integer Column (a token-count proxy computed
    from the row); ``order_cols`` must be a total order within the key
    (include a unique tiebreaker) or the prefix sum is nondeterministic.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    chunked = rows.select(
        F.col(key_col),
        *[F.col(c) for c in order_cols],
        tokens_col.cast("bigint").alias("_tok"),
    ).withColumn(
        "chunk_id",
        (
            F.coalesce(F.sum("_tok").over(w), F.lit(0)) / F.lit(max_tokens)
        ).cast("bigint"),
    )
    return chunked.groupBy(key_col, "chunk_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("_tok").alias("chunk_tokens"),
    )
