"""Preference-pair construction — the RLHF/DPO data-prep stage.

The post-training arc in this repo runs raw corpus → curation → SFT
examples (operators/sft.py) → pretraining packing
(operators/pretrain_pack.py); the remaining published stage is
preference data: (prompt, chosen, rejected) triples built from scored
candidate responses, the input format of DPO (Rafailov et al. 2023)
and of RLHF reward-model training (Ouyang et al. 2022 collect ranked
comparisons per prompt and train on every pair). `best_of_n` is the
companion rejection-sampling selector (Llama 2, Touvron et al. 2023
§3.2.2: keep the top-scored sample per prompt).

Input shape: one row per candidate response — a prompt key (one or
more columns), a response id, and a scalar score (reward-model score,
human rating, or any of this repo's quality scores: NB classifier LLR,
negated perplexity, retrieval rank). Everything downstream is a pure
function of (prompt, id, score), so the DuckDB oracle replays it
row-for-row (queries/sketch_oracles.py pre-stages the pair).

Determinism: responses are totally ordered within a prompt by
(score DESC, id ASC) — ties on score break on the id, so ranks, pair
membership, and gaps never depend on partitioning or visit order.
Because the order is total, the worst-first rank is derivable from the
best-first rank (`n + 1 - rank`): ONE window sort yields both ends.

Scale shape — one hash(prompt) exchange, bounded output:
- the rank window and the pair self-join cluster on the same prompt
  key, so the join consumes the window's partitioning (no second
  shuffle of the big side; asserted against the plan in tests);
- candidates are cut to the top-k / bottom-k PER PROMPT before the
  join, so pair output is ≤ k² rows per prompt no matter how many
  candidates a prompt has — a viral prompt with 10^6 responses costs
  one linear per-key sort, never a 10^12-row pair blowup;
- skew: a single hot prompt serializes only its own window scan (the
  standard window-skew bound); at 10^12 rows the heavy prompts are
  still bounded by responses-per-prompt, not corpus size.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _ranked(
    responses: DataFrame,
    prompt_cols: Sequence[str],
    id_col: str,
    score_col: str,
) -> DataFrame:
    """Best-first rank (1 = highest score, ties → smaller id) and the
    per-prompt candidate count, in one window pass."""
    w = Window.partitionBy(*prompt_cols).orderBy(
        F.col("_score").desc(), F.col("_id").asc()
    )
    w_all = Window.partitionBy(*prompt_cols)
    # a NULL-scored candidate can never form a pair (its gap is NULL and
    # fails any margin test) but WOULD consume a top/bottom-k slot and
    # mask real pairs — unscored rows are not candidates at all
    return responses.filter(F.col(score_col).isNotNull()).select(
        *prompt_cols,
        F.col(id_col).alias("_id"),
        F.col(score_col).alias("_score"),
    ).select(
        "*",
        F.row_number().over(w).alias("_rank"),
        F.count(F.lit(1)).over(w_all).alias("_n"),
    )


def build_preference_pairs(
    responses: DataFrame,
    prompt_cols: Sequence[str],
    id_col: str,
    score_col: str,
    k: int = 1,
    margin: float = 0.0,
) -> DataFrame:
    """(prompt, chosen, rejected) pairs: each of the top-`k` responses
    per prompt against each of the bottom-`k`, kept when the score gap
    exceeds `margin` (strict — a zero gap is never a preference).

    `k=1` is the classic best-vs-worst single pair per prompt; larger
    `k` yields up to k² pairs per prompt, the InstructGPT convention of
    training on every pair from a ranked set, restricted to the
    confident extremes. `chosen_rank < rejected_rank` keeps the pair
    orientation sound when the two windows overlap (n < 2k) and makes
    self-pairing impossible.

    Output: prompt cols + chosen_id/chosen_score/rejected_id/
    rejected_score/score_gap, one row per kept pair.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    r = _ranked(responses, prompt_cols, id_col, score_col)
    chosen = r.filter(F.col("_rank") <= k).select(
        *prompt_cols,
        F.col("_id").alias("chosen_id"),
        F.col("_score").alias("chosen_score"),
        F.col("_rank").alias("_c_rank"),
    )
    rejected = r.filter(F.col("_rank") > F.col("_n") - k).select(
        *prompt_cols,
        F.col("_id").alias("rejected_id"),
        F.col("_score").alias("rejected_score"),
        F.col("_rank").alias("_r_rank"),
    )
    pairs = chosen.join(rejected, list(prompt_cols), "inner").filter(
        (F.col("_c_rank") < F.col("_r_rank"))
        & (F.col("chosen_score") - F.col("rejected_score") > F.lit(margin))
    )
    return pairs.select(
        *prompt_cols,
        "chosen_id",
        "chosen_score",
        "rejected_id",
        "rejected_score",
        (F.col("chosen_score") - F.col("rejected_score")).alias("score_gap"),
    )


def best_of_n(
    responses: DataFrame,
    prompt_cols: Sequence[str],
    id_col: str,
    score_col: str,
    min_candidates: int = 1,
) -> DataFrame:
    """Rejection sampling / Best-of-N: the top-scored response per
    prompt (ties → smaller id), optionally only for prompts that had at
    least `min_candidates` candidates (a BoN selection from one sample
    is no selection at all — callers building distillation sets
    typically require n ≥ 2).

    Same one-exchange shape as the pair builder; output is exactly one
    row per qualifying prompt."""
    r = _ranked(responses, prompt_cols, id_col, score_col)
    return r.filter(
        (F.col("_rank") == 1) & (F.col("_n") >= min_candidates)
    ).select(
        *prompt_cols,
        F.col("_id").alias("best_id"),
        F.col("_score").alias("best_score"),
        F.col("_n").alias("n_candidates"),
    )


def conversation_preference_pairs(
    turns: DataFrame,
    scores: DataFrame,
    k: int = 1,
    margin: float = 0.0,
    key_col: str = "conv_id",
    order_cols: Sequence[str] = ("turn_idx",),
    role_col: str = "role",
    text_col: str = "text",
    response_role: str = "assistant",
    score_col: str = "score",
) -> DataFrame:
    """Transcript-native preference pairs: conversations that share the
    SAME prompt context (identical rendered prefix up to the final
    response turn) are candidate sets — exactly how sampled-N-times
    RLHF data arrives, one conversation per sample of the same prompt —
    and their final ``response_role`` turns are paired by a
    per-conversation score (``scores``: one row per ``key_col``).

    Rendering reuses the SFT template (``<|role|>\\n`` text
    ``<|end|>\\n``, operators/sft.py) so prompt identity means
    byte-identical context including roles, not just equal user text.
    The prompt key is the md5 of the rendered prefix; conversations
    whose LAST turn is not a ``response_role`` turn have nothing to
    pair and are dropped (the same "ends with assistant" contract
    transcript_qc gates on).

    Scale shape — one hash(conv) exchange to fold each conversation to
    a (prompt_md5, response) row (the SFT builder's aggregation shape),
    one keyed join against the scores table, then build_preference_pairs'
    single-exchange rank/pair machinery on hash(prompt_md5). Output
    carries prompt_md5 + chosen/rejected conv ids, scores, and response
    digests, bounded at k² per prompt like the base builder.
    """
    order = [F.col(c) for c in order_cols]
    text = F.coalesce(F.col(text_col), F.lit(""))
    role = F.coalesce(F.col(role_col), F.lit(""))
    rendered = F.concat(
        F.lit("<|"), role, F.lit("|>\n"), text, F.lit("<|end|>\n")
    )

    w_all = Window.partitionBy(key_col)
    t = (
        turns.select(
            key_col,
            *order_cols,
            role.alias("_role"),
            rendered.alias("_rendered"),
        )
        .withColumn(
            "_last",
            F.max(F.struct(*order)).over(w_all),
        )
        .withColumn("_is_last", F.struct(*order) == F.col("_last"))
    )
    ordered = F.array_sort(
        F.collect_list(
            F.when(
                ~F.col("_is_last"),
                F.struct(*order, F.col("_rendered")),
            )
        )
    )
    conv = t.groupBy(key_col).agg(
        F.md5(
            F.concat_ws("", F.transform(ordered, lambda x: x["_rendered"]))
        ).alias("prompt_md5"),
        F.max(F.when(F.col("_is_last"), F.col("_role"))).alias("_last_role"),
        F.md5(F.max(F.when(F.col("_is_last"), F.col("_rendered")))).alias(
            "response_md5"
        ),
    ).filter(F.col("_last_role") == response_role)

    cand = conv.join(
        scores.select(
            F.col(key_col).alias("_skey"), F.col(score_col).alias("_score")
        ),
        conv[key_col] == F.col("_skey"),
        "inner",
    ).select(key_col, "prompt_md5", "response_md5", "_score")

    pairs = build_preference_pairs(
        cand, ["prompt_md5"], key_col, "_score", k=k, margin=margin
    )
    # re-attach the response digests for both sides (equi-joins on the
    # conv key against the same bounded conv table)
    c_d = cand.select(
        F.col(key_col).alias("chosen_id"),
        F.col("response_md5").alias("chosen_response_md5"),
    )
    r_d = cand.select(
        F.col(key_col).alias("rejected_id"),
        F.col("response_md5").alias("rejected_response_md5"),
    )
    return pairs.join(c_d, ["chosen_id"]).join(r_d, ["rejected_id"]).select(
        "prompt_md5",
        "chosen_id",
        "chosen_score",
        "chosen_response_md5",
        "rejected_id",
        "rejected_score",
        "rejected_response_md5",
        "score_gap",
    )
