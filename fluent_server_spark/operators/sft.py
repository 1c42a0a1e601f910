"""SFT example building — turn multi-turn transcripts into rendered
training examples with loss-mask spans, entirely in Catalyst.

The last transformation of a post-training data pipeline: each turn is
rendered with a role template (``<|role|>\\n`` + text + ``<|end|>\\n``),
a conversation's rendered turns are concatenated in order, long
conversations split into examples of at most ``max_chars`` at TURN
boundaries (the same greedy prefix-sum rule as
operators/packing.pack_sequences — example index is
``cum_chars_before div max_chars``), and the character spans of the
turns whose roles are trained on (the loss mask) are emitted per
example as ``start-end`` offsets into the rendered example text.

Scale shape — ONE shuffle on the conversation key: the ordered prefix
sum, the per-(conv, example) offset window, and the final group-by all
cluster on `conv_id` (Spark accepts hash(conv_id) for the finer
(conv_id, example_idx) clusterings — partitioning on a subset of the
grouping keys satisfies ClusteredDistribution), so at 10^12 turns the
whole build is a single exchange plus per-key linear scans, the same
cost as the pipeline's sessionization. No UDFs anywhere: rendering,
offsets, mask spans, and the example digest are all built-in
expressions inside codegen.

Determinism contract: ``order_cols`` must totally order turns within a
conversation; every output (example assignment, span offsets, digest)
is then a pure function of the input, replayable row-for-row by the
DuckDB oracle (queries/sketch_oracles.py pre-stages the pair over the
driver `events` table mapped as FIXTURES.md §5 maps it onto the
pipeline: user_id as conv_id, event_type as role, props as text).

Oversize turns: a single turn longer than ``max_chars`` yields an
example larger than the budget (the greedy rule never splits inside a
turn); downstream token-level truncation is the standard handling, and
such examples are detectable as ``example_chars > max_chars``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fluent_server_spark.operators.bpe import bpe_tokenize

# "<|" + role + "|>\n"  and  "<|end|>\n"
_HEADER_EXTRA = 5
_FOOTER_LEN = 8


def build_sft_examples(
    turns: DataFrame,
    max_chars: int,
    key_col: str = "conv_id",
    order_cols: Sequence[str] = ("turn_idx",),
    role_col: str = "role",
    text_col: str = "text",
    target_roles: Sequence[str] = ("assistant",),
    include_text: bool = False,
) -> DataFrame:
    """Per (conversation, example): turn/char totals, loss-mask spans,
    and the md5 of the rendered example text (``include_text=True``
    additionally emits the text itself — the audit default stays
    narrow, same convention as chunk_documents)."""
    order = [F.col(c) for c in order_cols]
    text = F.coalesce(F.col(text_col), F.lit(""))
    role = F.coalesce(F.col(role_col), F.lit(""))
    rendered = F.concat(
        F.lit("<|"), role, F.lit("|>\n"), text, F.lit("<|end|>\n")
    )
    rlen = (
        F.length(role) + F.lit(_HEADER_EXTRA) + F.length(text) + F.lit(_FOOTER_LEN)
    ).cast("bigint")

    w_order = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = turns.select(
        key_col,
        *order_cols,
        role.alias("_role"),
        F.length(text).cast("bigint").alias("_tlen"),
        rendered.alias("_rendered"),
        rlen.alias("_rlen"),
    ).withColumn(
        "_cum_before", F.coalesce(F.sum("_rlen").over(w_order), F.lit(0))
    ).withColumn(
        "example_idx", F.expr(f"_cum_before div {int(max_chars)}")
    )

    # offset of the turn inside its example: cum chars before it minus
    # the example's first turn's cum — an unordered window whose
    # (conv, example) clustering the existing hash(conv) exchange already
    # satisfies (no second shuffle)
    w_ex = Window.partitionBy(key_col, "example_idx")
    is_target = F.col("_role").isin(*[str(r) for r in target_roles])
    t = (
        t.withColumn(
            "_off", F.col("_cum_before") - F.min("_cum_before").over(w_ex)
        )
        .withColumn(
            "_span_start",
            F.col("_off") + F.length("_role") + F.lit(_HEADER_EXTRA),
        )
        .withColumn(
            "_mask",
            F.when(
                is_target,
                F.struct(
                    *order,
                    F.concat_ws(
                        "-",
                        F.col("_span_start"),
                        F.col("_span_start") + F.col("_tlen"),
                    ).alias("span"),
                ),
            ),
        )
    )

    ordered_rendered = F.transform(
        F.array_sort(F.collect_list(F.struct(*order, F.col("_rendered")))),
        lambda x: x["_rendered"],
    )
    example_text = F.concat_ws("", ordered_rendered)
    out = t.groupBy(key_col, "example_idx").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum("_rlen").alias("example_chars"),
        F.sum(is_target.cast("bigint")).alias("n_target_turns"),
        F.sum(F.when(is_target, F.col("_tlen")).otherwise(0)).alias("mask_chars"),
        F.concat_ws(
            ";",
            F.transform(
                F.array_sort(F.collect_list("_mask")), lambda x: x["span"]
            ),
        ).alias("mask_spans"),
        F.md5(example_text).alias("example_md5"),
        *([example_text.alias("example_text")] if include_text else []),
    )
    return out


def build_sft_examples_tokens(
    turns: DataFrame,
    merges: DataFrame | dict[tuple[str, str], int],
    max_tokens: int,
    key_col: str = "conv_id",
    order_cols: Sequence[str] = ("turn_idx",),
    role_col: str = "role",
    text_col: str = "text",
    target_roles: Sequence[str] = ("assistant",),
    include_tokens: bool = False,
) -> DataFrame:
    """Token-budget SFT packing: `build_sft_examples` with the budget,
    loss-mask spans, and digest all in TOKEN units under a learned BPE
    merge table — the shape real trainers consume (packing cuts at the
    model's sequence budget, not a character proxy).

    Each turn renders as ``<|role|>`` + text-tokens + ``<|end|>`` where
    the header/footer are ATOMIC special tokens (the standard tokenizer
    convention — special tokens never merge with payload text), so a
    turn's rendered token length is ``n_text_tokens + 2`` exactly and
    the mask span ``[offset+1, offset+1+n_text_tokens)`` covers the
    payload tokens precisely, with no merge bleeding across the
    template boundary.

    Scale shape — identical to the char variant plus one map-only stage:
    the Arrow tokenize UDF (operators/bpe.bpe_tokenize, rank dict in the
    closure) adds NO exchange, and the prefix sum, per-example offset
    window, and final group-by reuse the ONE hash(conv_id) shuffle
    (asserted against the plan in tests). At 10^12 turns this is the
    same single-exchange cost as sessionization, with the tokenizer's
    per-batch Zipf cache amortizing merge application.

    The digest is md5 of the space-joined example token stream — safe
    because the pre-tokenizer emits no whitespace inside a token and
    role names are identifiers. Oversize handling matches the char
    variant: one turn over the budget yields ``example_tokens >
    max_tokens``, detectable downstream.
    """
    order = [F.col(c) for c in order_cols]
    role = F.coalesce(F.col(role_col), F.lit(""))
    tok = bpe_tokenize(
        turns.select(
            key_col, *order_cols, role.alias("_role"), F.col(text_col)
        ),
        merges,
        id_col=key_col,
        text_col=text_col,
        extra_cols=(*order_cols, "_role"),
    )
    header = F.concat(F.lit("<|"), F.col("_role"), F.lit("|>"))
    t = tok.select(
        key_col,
        *order_cols,
        "_role",
        F.col("n_tokens").alias("_ttok"),
        F.concat(
            F.array(header), F.col("tokens"), F.array(F.lit("<|end|>"))
        ).alias("_rtokens"),
        (F.col("n_tokens") + F.lit(2)).cast("bigint").alias("_rlen"),
    )

    w_order = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = t.withColumn(
        "_cum_before", F.coalesce(F.sum("_rlen").over(w_order), F.lit(0))
    ).withColumn("example_idx", F.expr(f"_cum_before div {int(max_tokens)}"))

    w_ex = Window.partitionBy(key_col, "example_idx")
    is_target = F.col("_role").isin(*[str(r) for r in target_roles])
    t = t.withColumn(
        "_off", F.col("_cum_before") - F.min("_cum_before").over(w_ex)
    ).withColumn(
        "_mask",
        F.when(
            is_target,
            F.struct(
                *order,
                F.concat_ws(
                    "-",
                    F.col("_off") + F.lit(1),
                    F.col("_off") + F.lit(1) + F.col("_ttok"),
                ).alias("span"),
            ),
        ),
    )

    example_tokens = F.flatten(
        F.transform(
            F.array_sort(F.collect_list(F.struct(*order, F.col("_rtokens")))),
            lambda x: x["_rtokens"],
        )
    )
    out = t.groupBy(key_col, "example_idx").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum("_rlen").alias("example_tokens"),
        F.sum(is_target.cast("bigint")).alias("n_target_turns"),
        F.sum(F.when(is_target, F.col("_ttok")).otherwise(0)).alias(
            "mask_tokens"
        ),
        F.concat_ws(
            ";",
            F.transform(
                F.array_sort(F.collect_list("_mask")), lambda x: x["span"]
            ),
        ).alias("mask_spans"),
        F.md5(F.concat_ws(" ", example_tokens)).alias("example_md5"),
        *([example_tokens.alias("tokens")] if include_tokens else []),
    )
    return out
