"""Transcript structural QC — conversation-shape gating for SFT data.

Published SFT pipelines gate conversations on STRUCTURE before any
content filter: OpenAssistant enforces strict prompter/assistant
alternation in its message trees (Köpf et al. 2023), and chat-template
trainers reject conversations that do not end on an assistant turn
(nothing to compute loss on) or contain empty assistant messages.
This operator computes those flags per conversation over the repo's
canonical turns shape (SURVEY §1.3: conv_id, turn_idx, role, text) so
`--curate`-style chains and the SFT builder (operators/sft.py) can
gate on `qc_ok` instead of silently training on malformed transcripts.

Per-conversation output:
- ``n_turns`` / ``n_user_turns`` / ``n_assistant_turns``
- ``starts_with_user`` / ``ends_with_assistant`` — template-shape flags
- ``alternation_ok`` — no two consecutive turns share a role
- ``no_empty_assistant`` — every assistant turn has non-blank text
- ``idx_contiguous`` (when ``idx_col`` is given) — the order index is
  gap-free and duplicate-free (min..max covers exactly n distinct
  values), catching truncated exports and double-ingested turns
- ``qc_ok`` — the conjunction, the gate bit

Everything is windows + one keyed aggregation clustering on the
conversation key — the same single hash(conv_id) exchange as
sessionization (asserted in tests); no UDFs, so the DuckDB oracle
replays it exactly (queries/sketch_oracles.py pre-stages the pair).

Scale: at 10^12 turns this is one exchange + per-key linear scans;
`gate_transcripts` adds a semi-join of the full table against the
per-conversation verdicts (a keyed shuffle both sides — the verdict
side is one row per conversation, and AQE turns it into a broadcast
when the surviving conversation set is small).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def transcript_qc(
    turns: DataFrame,
    key_col: str = "conv_id",
    order_cols: Sequence[str] = ("turn_idx",),
    role_col: str = "role",
    text_col: str = "text",
    user_role: str = "user",
    assistant_role: str = "assistant",
    idx_col: str | None = "turn_idx",
) -> DataFrame:
    """One row per conversation with the structural flags above."""
    order = [F.col(c) for c in order_cols]
    role = F.coalesce(F.col(role_col), F.lit(""))
    blank = F.length(F.trim(F.coalesce(F.col(text_col), F.lit("")))) == 0

    w = Window.partitionBy(key_col).orderBy(*order)
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t = turns.select(
        key_col,
        *order_cols,
        role.alias("_role"),
        blank.alias("_blank"),
        *([F.col(idx_col).cast("bigint").alias("_idx")] if idx_col else []),
    ).select(
        "*",
        (F.col("_role") == F.lag("_role").over(w)).alias("_same_as_prev"),
        F.first("_role").over(w_full).alias("_first_role"),
        F.last("_role").over(w_full).alias("_last_role"),
    )

    is_user = F.col("_role") == user_role
    is_asst = F.col("_role") == assistant_role
    aggs = [
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(is_user.cast("bigint")).alias("n_user_turns"),
        F.sum(is_asst.cast("bigint")).alias("n_assistant_turns"),
        (F.min("_first_role") == user_role).alias("starts_with_user"),
        (F.min("_last_role") == assistant_role).alias("ends_with_assistant"),
        (
            F.sum(F.coalesce(F.col("_same_as_prev"), F.lit(False)).cast("bigint"))
            == 0
        ).alias("alternation_ok"),
        (F.sum((is_asst & F.col("_blank")).cast("bigint")) == 0).alias(
            "no_empty_assistant"
        ),
    ]
    if idx_col:
        aggs.append(
            (
                (F.max("_idx") - F.min("_idx") + 1 == F.count(F.lit(1)))
                & (F.count_distinct(F.col("_idx")) == F.count(F.lit(1)))
            ).alias("idx_contiguous")
        )
    out = t.groupBy(key_col).agg(*aggs)
    ok = (
        F.col("starts_with_user")
        & F.col("ends_with_assistant")
        & F.col("alternation_ok")
        & F.col("no_empty_assistant")
        & (F.col("n_assistant_turns") > 0)
    )
    if idx_col:
        ok = ok & F.col("idx_contiguous")
    return out.withColumn("qc_ok", ok)


def gate_transcripts(
    turns: DataFrame,
    key_col: str = "conv_id",
    flags: Sequence[str] | None = None,
    **qc_kwargs,
) -> DataFrame:
    """Keep only the turns of conversations that pass the gate — the
    filter form, composable ahead of build_sft_examples. By default the
    gate is ``qc_ok`` (every flag); pass ``flags`` to require a subset
    (e.g. a tool-using corpus where strict alternation is expected to
    fail but blank assistant turns are still fatal)."""
    verdicts = transcript_qc(turns, key_col=key_col, **qc_kwargs)
    if flags is None:
        pred = F.col("qc_ok")
    else:
        missing = [f for f in flags if f not in verdicts.columns]
        if missing:
            raise ValueError(f"unknown QC flags: {missing}")
        pred = F.lit(True)
        for f_ in flags:
            pred = pred & F.col(f_)
    keep = verdicts.filter(pred).select(key_col)
    return turns.join(keep, [key_col], "left_semi")


def render_conversations(
    turns: DataFrame,
    key_col: str = "conv_id",
    order_cols: Sequence[str] = ("turn_idx",),
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """Fold each conversation to one (key, text) row under the SFT
    template (``<|role|>\\n`` text ``<|end|>\\n``, turns in order) — the
    canonical rendering shared by the SFT builder and the prompt-prefix
    preference pairing, exposed so DOCUMENT-level operators (minhash
    near-dup, exact dedup, quality scores, drift) apply unchanged to
    whole transcripts. One hash(conv) exchange, no UDFs."""
    order = [F.col(c) for c in order_cols]
    text = F.coalesce(F.col(text_col), F.lit(""))
    role = F.coalesce(F.col(role_col), F.lit(""))
    rendered = F.concat(
        F.lit("<|"), role, F.lit("|>\n"), text, F.lit("<|end|>\n")
    )
    t = turns.select(key_col, *order_cols, rendered.alias("_rendered"))
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct(*order, F.col("_rendered")))),
        lambda x: x["_rendered"],
    )
    return t.groupBy(key_col).agg(
        F.concat_ws("", ordered).alias("text")
    )


def conversation_neardup_pairs(
    turns: DataFrame,
    key_col: str = "conv_id",
    order_cols: Sequence[str] = ("turn_idx",),
    role_col: str = "role",
    text_col: str = "text",
    threshold: float = 0.5,
    **minhash_kwargs,
) -> DataFrame:
    """Conversation-level near-duplicates: render each transcript to one
    document (role markers included, so the same words under different
    roles do NOT collide) and run the standard minhash-LSH pair join
    (operators/dedup.py) over the rendered corpus — the dedup a
    sampled-transcript SFT corpus needs before training (near-identical
    conversations re-sampled from the same prompt inflate effective
    epochs exactly like near-dup documents do).

    Scale: one conv-key fold + the banded LSH equi-join; never
    conversations × conversations."""
    from fluent_server_spark.operators.dedup import minhash_lsh_pairs

    rendered = render_conversations(
        turns, key_col, order_cols, role_col, text_col
    )
    return minhash_lsh_pairs(
        rendered, id_col=key_col, text_col="text",
        threshold=threshold, **minhash_kwargs,
    )
