"""Pretraining concat-and-chunk packing — turn a tokenized document
corpus into fixed-length training chunks of EXACTLY ``seq_len`` tokens,
splitting documents across chunk boundaries.

This is the last transformation of a PRETRAINING data pipeline, the
complement of operators/sft.py (which packs at turn boundaries for
post-training): a pretraining dataloader consumes a continuous token
stream cut into equal windows, with an atomic ``<|doc|>`` separator
between documents and no padding — document boundaries are crossed, a
long document spans as many chunks as it needs, and only the stream's
tail is ever shorter than the budget (GPT-2/3, T5 "concat and chunk";
the packing every published pretraining corpus ships in).

Scale shape — shard-local streams, all in Catalyst:

* A truly global token stream needs a global prefix sum; at 10^12
  documents the published mitigation (and what real pipelines do) is
  to shard the corpus and concatenate per shard: ``shard =
  pmod(xxhash64(id), n_shards)``, stream order within a shard =
  ``(xxhash64(id), id)``. Each shard loses at most ``seq_len - 1``
  tail tokens (kept and flagged with ``keep_tail=True``), a bounded,
  documented cost — n_shards * (seq_len-1) tokens total, vanishing at
  corpus scale.
* Because sharding and ordering hash the DOCUMENT ID, the output is a
  pure function of the input — invariant to cluster size, partition
  count, and task order (per-partition "local" packing would not be),
  so re-runs, resumes, and the pure-Python test oracle reproduce
  byte-identical chunks.
* Cost: one map-only Arrow tokenize stage (operators/bpe.bpe_tokenize;
  the merge-rank dict rides the closure), ONE exchange on ``shard``
  for the prefix-sum window, then an explode of each document into the
  chunks it straddles (rows proportional to ceil(len/seq_len) — total
  work linear in corpus tokens) and a chunk-assembly groupBy that
  Catalyst runs WITHOUT a second exchange: hash(shard) partitioning
  from the window already satisfies the (shard, chunk) clustered
  distribution (asserted in tests/test_pretrain_pack.py). One shuffle
  total — each token crosses the wire once; no join, no iteration, no
  row-at-a-time Python.

Separator atomicity: the pre-tokenizer (operators/bpe.pretokenize)
can never EMIT the literal ``<|doc|>`` as one token — payload text
containing it splits into punctuation/word runs — so the separator
token is unforgeable in the stream, exactly like the SFT role specials.

Determinism contract: document ids must be unique (the stream order
tiebreaks on the id itself, so a hash collision is still totally
ordered). NULL text tokenizes to [] and contributes just its separator
token — the document's presence survives into the stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fluent_server_spark.operators.bpe import bpe_tokenize

DOC_SEP = "<|doc|>"


def pack_pretrain_chunks(
    docs: DataFrame,
    merges: DataFrame | dict[tuple[str, str], int],
    seq_len: int,
    n_shards: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = DOC_SEP,
    keep_tail: bool = False,
) -> DataFrame:
    """(shard, chunk_idx, tokens, n_tokens, n_docs, doc_spans, digest):
    the corpus as fixed-length pretraining chunks.

    Every chunk has exactly ``seq_len`` tokens except each shard's tail
    (dropped unless ``keep_tail=True``; tails are the rows with
    ``n_tokens < seq_len``). ``n_docs`` counts the documents that
    contributed at least one token (or separator) to the chunk;
    ``doc_spans`` is the per-document piece offsets within the chunk
    ("start-end;start-end", end exclusive, stream order) — the
    block-diagonal attention-mask metadata, covering [0, n_tokens)
    exactly; ``digest`` is md5 of the space-joined token stream (safe:
    the pre-tokenizer emits no whitespace inside a token).
    """
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    L = int(seq_len)

    tok = bpe_tokenize(docs, merges, id_col=id_col, text_col=text_col)
    t = tok.select(
        F.pmod(F.xxhash64(id_col), F.lit(int(n_shards))).alias("shard"),
        F.xxhash64(id_col).alias("_ord"),
        F.col(id_col).alias("_id"),
        F.concat(F.col("tokens"), F.array(F.lit(sep))).alias("_rtokens"),
        (F.col("n_tokens") + F.lit(1)).cast("bigint").alias("_rlen"),
    )

    # stream offset of each document within its shard: prefix sum over
    # the deterministic (hash, id) order — the one exchange on `shard`
    w = (
        Window.partitionBy("shard")
        .orderBy("_ord", "_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = t.withColumn(
        "_start", F.coalesce(F.sum("_rlen").over(w), F.lit(0))
    ).withColumn("_end", F.col("_start") + F.col("_rlen"))

    # explode each document into the chunks it straddles and slice its
    # token piece for each — work proportional to ceil(len/seq_len)
    t = t.withColumn(
        "chunk_idx",
        F.explode(
            F.sequence(
                F.expr(f"_start div {L}"), F.expr(f"(_end - 1) div {L}")
            )
        ),
    )
    lo = F.greatest(F.col("_start"), F.col("chunk_idx") * L)
    hi = F.least(F.col("_end"), (F.col("chunk_idx") + 1) * L)
    t = t.select(
        "shard",
        "chunk_idx",
        F.col("_start"),
        F.slice(
            "_rtokens",
            (lo - F.col("_start") + 1).cast("int"),
            (hi - lo).cast("int"),
        ).alias("_piece"),
        (hi - lo).alias("_plen"),
        (lo - F.col("chunk_idx") * L).alias("_off"),
    )

    # assemble: pieces ordered by their stream offset — the one
    # exchange on (shard, chunk)
    tokens = F.flatten(
        F.transform(
            F.array_sort(F.collect_list(F.struct("_start", "_piece"))),
            lambda x: x["_piece"],
        )
    )
    # per-document piece spans WITHIN the chunk ("start-end", end
    # exclusive, stream order) — the block-diagonal attention-mask
    # metadata (Llama 3 masks self-attention across document boundaries
    # inside a packed sequence; a trainer rebuilds that mask from these
    # offsets without re-scanning the tokens for separators)
    spans = F.concat_ws(
        ";",
        F.transform(
            F.array_sort(F.collect_list(F.struct("_start", "_off", "_plen"))),
            lambda x: F.concat_ws(
                "-", x["_off"], (x["_off"] + x["_plen"]).cast("bigint")
            ),
        ),
    )
    out = (
        t.groupBy("shard", "chunk_idx")
        .agg(
            tokens.alias("tokens"),
            F.sum("_plen").cast("bigint").alias("n_tokens"),
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            spans.alias("doc_spans"),
        )
        .withColumn("digest", F.md5(F.concat_ws(" ", F.col("tokens"))))
    )
    if not keep_tail:
        out = out.filter(F.col("n_tokens") == L)
    return out
