"""Transcript structural QC vs a pure-Python reference, one failure
mode per fixture conversation, plus the single-exchange plan claim."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from fluent_server_spark.operators.transcript_qc import (
    gate_transcripts,
    transcript_qc,
)

# (conv_id, turn_idx, role, text) — one conversation per failure mode
TURNS = [
    # c_ok: the clean template shape
    ("c_ok", 0, "user", "hi"), ("c_ok", 1, "assistant", "hello"),
    ("c_ok", 2, "user", "thanks"), ("c_ok", 3, "assistant", "bye"),
    # c_alt: two consecutive assistant turns
    ("c_alt", 0, "user", "q"), ("c_alt", 1, "assistant", "a1"),
    ("c_alt", 2, "assistant", "a2"),
    # c_start: starts with assistant
    ("c_start", 0, "assistant", "unprompted"), ("c_start", 1, "user", "??"),
    ("c_start", 2, "assistant", "ok"),
    # c_end: ends on a user turn
    ("c_end", 0, "user", "q"), ("c_end", 1, "assistant", "a"),
    ("c_end", 2, "user", "follow-up"),
    # c_empty: assistant turn with blank text
    ("c_empty", 0, "user", "q"), ("c_empty", 1, "assistant", "   "),
    # c_gap: turn_idx 0 then 2 (truncated export)
    ("c_gap", 0, "user", "q"), ("c_gap", 2, "assistant", "a"),
    # c_dup: duplicated turn_idx (double ingest); also breaks alternation
    ("c_dup", 0, "user", "q"), ("c_dup", 1, "assistant", "a"),
    ("c_dup", 1, "assistant", "a again"),
    # c_noasst: user only
    ("c_noasst", 0, "user", "anyone?"),
]

EXPECT_OK = {"c_ok"}


@pytest.fixture(scope="module")
def tdf(spark):
    return spark.createDataFrame(
        TURNS, "conv_id string, turn_idx int, role string, text string"
    )


def test_flags_per_failure_mode(spark, tdf):
    rows = {r["conv_id"]: r for r in transcript_qc(tdf).collect()}
    assert {c for c, r in rows.items() if r["qc_ok"]} == EXPECT_OK
    ok = rows["c_ok"]
    assert (ok["n_turns"], ok["n_user_turns"], ok["n_assistant_turns"]) == (4, 2, 2)
    assert not rows["c_alt"]["alternation_ok"] and rows["c_alt"]["starts_with_user"]
    assert not rows["c_start"]["starts_with_user"]
    assert not rows["c_end"]["ends_with_assistant"] and rows["c_end"]["alternation_ok"]
    assert not rows["c_empty"]["no_empty_assistant"]
    assert not rows["c_gap"]["idx_contiguous"] and rows["c_gap"]["alternation_ok"]
    assert not rows["c_dup"]["idx_contiguous"]
    assert rows["c_noasst"]["n_assistant_turns"] == 0 and not rows["c_noasst"]["qc_ok"]


def test_gap_vs_dup_are_distinguished(spark, tdf):
    """max-min+1 == n alone would pass a conversation with one gap and
    one duplicate; the distinct-count conjunct catches it."""
    rows = {r["conv_id"]: r for r in transcript_qc(tdf).collect()}
    # c_dup: idx {0,1,1} -> max-min+1 = 2 != 3 AND distinct 2 != 3
    assert not rows["c_dup"]["idx_contiguous"]
    extra = spark.createDataFrame(
        [("c_gapdup", 0, "user", "q"), ("c_gapdup", 2, "assistant", "a"),
         ("c_gapdup", 2, "assistant", "b")],
        "conv_id string, turn_idx int, role string, text string",
    )
    r = transcript_qc(extra).collect()[0]
    assert not r["idx_contiguous"]


def test_idx_col_optional(spark, tdf):
    cols = set(transcript_qc(tdf, idx_col=None).columns)
    assert "idx_contiguous" not in cols
    rows = {r["conv_id"]: r for r in transcript_qc(tdf, idx_col=None).collect()}
    # without the contiguity check, c_gap's only defect disappears
    assert rows["c_gap"]["qc_ok"]


def test_gate_keeps_only_clean_conversations(spark, tdf):
    kept = gate_transcripts(tdf).collect()
    assert {r["conv_id"] for r in kept} == EXPECT_OK
    assert len(kept) == 4  # all of c_ok's turns, untouched


def test_single_exchange_plan(spark, tdf):
    qc = transcript_qc(tdf)
    buf = io.StringIO()
    with redirect_stdout(buf):
        qc.explain("formatted")
    plan = buf.getvalue()
    n_exchange = plan.count("Exchange hashpartitioning")
    n_reused = plan.count("ReusedExchange")
    assert n_exchange - n_reused <= 1, plan
    # no UDF stage, no join (createDataFrame's scan node mentions
    # "PythonRDD", so match the eval operators specifically)
    assert "EvalPython" not in plan and "Join" not in plan, plan


def test_gate_flag_subset_and_validation(spark, tdf):
    import pytest

    # relaxed gate: drop the alternation/starts requirements -> c_alt and
    # c_start pass (they end on assistant, have no blanks, contiguous idx)
    kept = {
        r["conv_id"]
        for r in gate_transcripts(
            tdf,
            flags=["ends_with_assistant", "no_empty_assistant",
                   "idx_contiguous"],
        ).select("conv_id").distinct().collect()
    }
    assert kept == {"c_ok", "c_alt", "c_start"}
    with pytest.raises(ValueError):
        gate_transcripts(tdf, flags=["no_such_flag"]).collect()


def test_render_conversations_matches_sft_template(spark, tdf):
    from fluent_server_spark.operators.transcript_qc import render_conversations

    rows = {r["conv_id"]: r["text"] for r in render_conversations(tdf).collect()}
    assert rows["c_ok"] == (
        "<|user|>\nhi<|end|>\n<|assistant|>\nhello<|end|>\n"
        "<|user|>\nthanks<|end|>\n<|assistant|>\nbye<|end|>\n"
    )
    # single-turn conversation renders its one turn
    assert rows["c_noasst"] == "<|user|>\nanyone?<|end|>\n"


def test_conversation_neardup_pairs(spark):
    """Near-identical sampled transcripts pair; a same-words
    conversation with different ROLES does not collide with them."""
    from fluent_server_spark.operators.transcript_qc import (
        conversation_neardup_pairs,
    )

    base = "please summarize the quarterly report for the board meeting"
    resp = "here is the summary of the quarterly report you asked for"
    turns = []
    for cid, tail in [("s1", "thanks"), ("s2", "thank you"), ("s3", "thanks")]:
        turns += [
            (cid, 0, "user", base),
            (cid, 1, "assistant", resp),
            (cid, 2, "user", tail),
        ]
    # same words, roles swapped -> different shingles via role markers
    turns += [
        ("swap", 0, "assistant", base),
        ("swap", 1, "user", resp),
        ("swap", 2, "assistant", "thanks"),
    ]
    # unrelated conversation
    turns += [("z", 0, "user", "completely different topic entirely"),
              ("z", 1, "assistant", "indeed a different matter")]
    tdf = spark.createDataFrame(
        turns, "conv_id string, turn_idx int, role string, text string"
    )
    pairs = {
        tuple(sorted((r["a_id"], r["b_id"])))
        for r in conversation_neardup_pairs(tdf, threshold=0.5).collect()
    }
    assert ("s1", "s3") in pairs  # identical transcripts
    assert all("z" not in p for p in pairs)
    assert all("swap" not in p for p in pairs)  # role swap separates
