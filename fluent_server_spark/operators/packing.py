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


def chunk_documents(
    docs: DataFrame,
    chunk_chars: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into fixed-width character chunks with optional
    overlap — the RAG/context-window splitting step.

    Chunk i covers [i*step, i*step + chunk_chars) with
    step = chunk_chars - overlap; every chunk start < len(text) emits.
    Entirely narrow (sequence + explode + substring in codegen): at
    100 TB this is a map-only pass, output partitioning inherited from
    the scan. Emits (id, chunk_idx, chunk_len, chunk_md5) — the md5
    stands in for the chunk body in audit tables so the output stays
    narrow; callers wanting the text substitute substring for md5.
    """
    if overlap >= chunk_chars:
        raise ValueError("overlap must be < chunk_chars")
    step = chunk_chars - overlap
    n_chunks = (F.greatest(F.length(text_col), F.lit(1)) - 1) / F.lit(step)
    idx = F.explode(
        F.sequence(F.lit(0), n_chunks.cast("bigint"))
    ).alias("chunk_idx")
    chunk = F.col(text_col).substr(
        F.col("chunk_idx").cast("int") * step + 1, F.lit(chunk_chars)
    )
    return (
        docs.select(F.col(id_col), F.col(text_col), idx)
        .select(
            id_col,
            F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
            F.length(chunk).cast("bigint").alias("chunk_len"),
            F.md5(chunk).alias("chunk_md5"),
        )
    )
