"""SFT example building vs a pure-Python reference (rendering, greedy
turn-boundary splitting, loss-mask offsets, digest), plus the
single-exchange plan claim."""

from __future__ import annotations

import hashlib
import io
from contextlib import redirect_stdout

import pytest

from fluent_server_spark.operators.sft import build_sft_examples


def _ref(convs, max_chars, target):
    out = {}
    for cid, turns in convs.items():
        cum = 0
        examples: dict[int, list] = {}
        for idx, role, text in sorted(turns):
            text = text or ""
            r = f"<|{role}|>\n{text}<|end|>\n"
            examples.setdefault(cum // max_chars, []).append(
                (idx, role, text, r, cum)
            )
            cum += len(r)
        for ex, items in examples.items():
            base = items[0][4]
            spans, n_t, mask_chars = [], 0, 0
            for idx, role, text, r, c in items:
                if role in target:
                    s = c - base + len(role) + 5
                    spans.append(f"{s}-{s + len(text)}")
                    n_t += 1
                    mask_chars += len(text)
            cat = "".join(r for _, _, _, r, _ in items)
            out[(cid, ex)] = {
                "n_turns": len(items),
                "example_chars": sum(len(r) for _, _, _, r, _ in items),
                "n_target_turns": n_t,
                "mask_chars": mask_chars,
                "mask_spans": ";".join(spans),
                "example_md5": hashlib.md5(cat.encode("utf-8")).hexdigest(),
            }
    return out


@pytest.fixture(scope="module")
def convs():
    c = {}
    # a long conversation that must split across several examples
    c["long"] = [
        (i, "user" if i % 2 == 0 else "assistant", f"turn {i} " + "x" * (20 + i))
        for i in range(40)
    ]
    # short one-example conversation
    c["short"] = [(0, "system", "be helpful"), (1, "user", "hi"),
                  (2, "assistant", "hello there")]
    # empty / missing text turns
    c["edges"] = [(0, "user", ""), (1, "assistant", None), (2, "tool", "{}")]
    # a conversation with no target-role turns at all
    c["untargeted"] = [(0, "user", "a"), (1, "tool", "b"), (2, "user", "c")]
    # one oversize turn bigger than the budget
    c["oversize"] = [(0, "user", "y" * 900), (1, "assistant", "ok")]
    return c


MAX = 256
TARGET = ("assistant",)


def test_examples_match_python_reference(spark, convs):
    rows = [
        (cid, idx, role, text)
        for cid, turns in convs.items()
        for idx, role, text in turns
    ]
    sdf = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    got = {
        (r["conv_id"], r["example_idx"]): r.asDict()
        for r in build_sft_examples(sdf, MAX, target_roles=TARGET).collect()
    }
    want = _ref(
        {c: [(i, r, t) for i, r, t in ts] for c, ts in convs.items()},
        MAX,
        set(TARGET),
    )
    assert set(got) == set(want)
    for k, w in want.items():
        g = got[k]
        for col, v in w.items():
            assert g[col] == v, (k, col, g[col], v)


def test_hand_computed_spans(spark):
    """Offsets worked out by hand on one conversation: the mask span
    must cover exactly the text payload inside the rendered turn."""
    sdf = spark.createDataFrame(
        [("c", 0, "user", "hi"), ("c", 1, "assistant", "yo!")],
        "conv_id string, turn_idx int, role string, text string",
    )
    (row,) = build_sft_examples(sdf, 1000, include_text=True).collect()
    # turn 0 renders to '<|user|>\nhi<|end|>\n' (19 chars); the
    # assistant payload starts after that plus '<|assistant|>\n' (14)
    assert row["example_text"] == "<|user|>\nhi<|end|>\n<|assistant|>\nyo!<|end|>\n"
    assert row["mask_spans"] == "33-36"
    assert row["example_text"][33:36] == "yo!"
    assert row["mask_chars"] == 3 and row["n_target_turns"] == 1


def test_oversize_turn_is_detectable(spark):
    sdf = spark.createDataFrame(
        [("c", 0, "user", "y" * 900), ("c", 1, "assistant", "ok")],
        "conv_id string, turn_idx int, role string, text string",
    )
    rows = build_sft_examples(sdf, MAX).collect()
    assert any(r["example_chars"] > MAX for r in rows)


def test_single_exchange_plan(spark, convs):
    """The 100 TB claim in the docstring: prefix sum, per-example
    offset window, and final group-by all reuse ONE hash(conv_id)
    exchange — the formatted plan must contain exactly one Exchange."""
    rows = [
        (cid, idx, role, text)
        for cid, turns in convs.items()
        for idx, role, text in turns
    ]
    sdf = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        # simple mode: one line per physical node ("formatted" would
        # list every node twice — tree plus details section)
        build_sft_examples(sdf, MAX).explain()
    plan = buf.getvalue()
    assert plan.count("Exchange") == 1, plan
    # and both window specs plus the final aggregate reuse that one
    # partitioning (no AQE re-shuffle hidden behind it)
    assert plan.count("Window") == 2 and "ObjectHashAggregate" in plan
