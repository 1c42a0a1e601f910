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


# ---------------------------------------------------------------- tokens


def _ref_tokens(convs, ranks, max_tokens, target):
    """Pure-Python twin of build_sft_examples_tokens: render each turn
    as [header special] + BPE tokens + [footer special], pack greedily
    on token counts, emit token-offset mask spans."""
    from fluent_server_spark.operators.bpe import encode_words, pretokenize

    out = {}
    for cid, turns in convs.items():
        cum = 0
        examples: dict[int, list] = {}
        for idx, role, text in sorted(turns):
            role = role or ""
            toks = (
                [f"<|{role}|>"]
                + encode_words(pretokenize(text or ""), ranks)
                + ["<|end|>"]
            )
            examples.setdefault(cum // max_tokens, []).append(
                (idx, role, toks, cum)
            )
            cum += len(toks)
        for ex, items in examples.items():
            base = items[0][3]
            spans, n_t, mask_tokens, stream = [], 0, 0, []
            for idx, role, toks, c in items:
                stream.extend(toks)
                if role in target:
                    s = c - base + 1
                    spans.append(f"{s}-{s + len(toks) - 2}")
                    n_t += 1
                    mask_tokens += len(toks) - 2
            out[(cid, ex)] = {
                "n_turns": len(items),
                "example_tokens": sum(len(t) for _, _, t, _ in items),
                "n_target_turns": n_t,
                "mask_tokens": mask_tokens,
                "mask_spans": ";".join(spans),
                "example_md5": hashlib.md5(
                    " ".join(stream).encode("utf-8")
                ).hexdigest(),
            }
    return out


MAX_TOK = 64


def test_token_examples_match_python_reference(spark, convs):
    """Train real merges on the fixture corpus, then the Spark build
    must match the Python twin row-for-row (spans, counts, digest)."""
    from fluent_server_spark.operators.bpe import bpe_train, merge_ranks
    from fluent_server_spark.operators.sft import build_sft_examples_tokens

    rows = [
        (cid, idx, role, text)
        for cid, turns in convs.items()
        for idx, role, text in turns
    ]
    sdf = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    ranks = merge_ranks(bpe_train(sdf, num_merges=30))
    got = {
        (r["conv_id"], r["example_idx"]): r.asDict()
        for r in build_sft_examples_tokens(
            sdf, ranks, MAX_TOK, target_roles=TARGET
        ).collect()
    }
    want = _ref_tokens(convs, ranks, MAX_TOK, set(TARGET))
    assert set(got) == set(want)
    for k, w in want.items():
        g = got[k]
        for col, v in w.items():
            assert g[col] == v, (k, col, g[col], v)


def test_token_hand_computed_spans(spark):
    """No merges: every character is its own symbol, so the offsets are
    countable by hand. The mask span must select exactly the assistant
    payload tokens, skipping the atomic header/footer specials."""
    from fluent_server_spark.operators.sft import build_sft_examples_tokens

    sdf = spark.createDataFrame(
        [("c", 0, "user", "hi"), ("c", 1, "assistant", "yo!")],
        "conv_id string, turn_idx int, role string, text string",
    )
    (row,) = build_sft_examples_tokens(
        sdf, {}, 1000, include_tokens=True
    ).collect()
    # turn 0: <|user|> h i</w> <|end|>  (4 tokens)
    # turn 1: <|assistant|> y o</w> !</w> <|end|>  (5 tokens)
    assert row["tokens"] == [
        "<|user|>", "h", "i</w>", "<|end|>",
        "<|assistant|>", "y", "o</w>", "!</w>", "<|end|>",
    ]
    assert row["mask_spans"] == "5-8"
    assert row["tokens"][5:8] == ["y", "o</w>", "!</w>"]
    assert row["mask_tokens"] == 3 and row["n_target_turns"] == 1
    assert row["example_tokens"] == 9


def test_token_oversize_turn_is_detectable(spark):
    from fluent_server_spark.operators.sft import build_sft_examples_tokens

    sdf = spark.createDataFrame(
        [("c", 0, "user", " ".join("y" * 3 for _ in range(40))),
         ("c", 1, "assistant", "ok")],
        "conv_id string, turn_idx int, role string, text string",
    )
    rows = build_sft_examples_tokens(sdf, {}, 16).collect()
    assert any(r["example_tokens"] > 16 for r in rows)


def test_token_single_exchange_plan(spark, convs):
    """The tokenize UDF is map-only (ArrowEvalPython, no exchange of
    its own); the windows and the final aggregate still share ONE
    hash(conv_id) shuffle."""
    from fluent_server_spark.operators.sft import build_sft_examples_tokens

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
        build_sft_examples_tokens(sdf, {}, MAX_TOK).explain()
    plan = buf.getvalue()
    assert plan.count("Exchange") == 1, plan
    assert "ArrowEvalPython" in plan, plan
    assert plan.count("Window") == 2 and "ObjectHashAggregate" in plan
