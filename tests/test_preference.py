"""Preference-pair building vs a pure-Python reference (ranking,
top-k × bottom-k pairing, margin, tie-breaks), plus the one-exchange
plan claim."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from fluent_server_spark.operators.preference import (
    best_of_n,
    build_preference_pairs,
)

# (prompt, id, score): covers a 5-candidate prompt with a score tie,
# a 2-candidate prompt, a singleton (no pair possible), and a prompt
# whose scores are all equal (no pair survives any margin > -inf).
ROWS = [
    ("p1", 1, 0.9), ("p1", 2, 0.9), ("p1", 3, 0.5), ("p1", 4, 0.1),
    ("p1", 5, 0.3),
    ("p2", 10, 1.0), ("p2", 11, 2.0),
    ("p3", 20, 7.0),
    ("p4", 30, 4.0), ("p4", 31, 4.0), ("p4", 32, 4.0),
]


def _ref_pairs(rows, k, margin):
    by_prompt: dict[str, list] = {}
    for p, i, s in rows:
        by_prompt.setdefault(p, []).append((i, s))
    out = set()
    for p, cands in by_prompt.items():
        ranked = sorted(cands, key=lambda x: (-x[1], x[0]))
        n = len(ranked)
        for ci in range(min(k, n)):
            for ri in range(max(n - k, 0), n):
                if ci < ri and ranked[ci][1] - ranked[ri][1] > margin:
                    out.add((p, ranked[ci][0], ranked[ri][0]))
    return out


@pytest.fixture(scope="module")
def resp(spark):
    return spark.createDataFrame(ROWS, "prompt string, rid int, score double")


@pytest.mark.parametrize("k,margin", [(1, 0.0), (2, 0.0), (2, 0.3), (5, 0.0)])
def test_pairs_match_reference(spark, resp, k, margin):
    got = {
        (r["prompt"], r["chosen_id"], r["rejected_id"])
        for r in build_preference_pairs(
            resp, ["prompt"], "rid", "score", k=k, margin=margin
        ).collect()
    }
    assert got == _ref_pairs(ROWS, k, margin)


def test_pair_fields_and_orientation(spark, resp):
    rows = build_preference_pairs(resp, ["prompt"], "rid", "score").collect()
    by_prompt = {r["prompt"]: r for r in rows}
    # p1: best = id1 (tie with id2 broken by smaller id), worst = id4
    p1 = by_prompt["p1"]
    assert (p1["chosen_id"], p1["rejected_id"]) == (1, 4)
    assert p1["chosen_score"] == 0.9 and p1["rejected_score"] == 0.1
    assert p1["score_gap"] == pytest.approx(0.8)
    # singleton prompt yields no pair; all-tied prompt yields no pair at
    # margin 0 (strict gap)
    assert "p3" not in by_prompt and "p4" not in by_prompt
    # every emitted pair is strictly oriented
    assert all(r["chosen_score"] > r["rejected_score"] for r in rows)


def test_best_of_n(spark, resp):
    rows = {r["prompt"]: r for r in best_of_n(resp, ["prompt"], "rid", "score").collect()}
    assert rows["p1"]["best_id"] == 1 and rows["p1"]["n_candidates"] == 5
    assert rows["p2"]["best_id"] == 11
    assert rows["p3"]["best_id"] == 20
    assert rows["p4"]["best_id"] == 30  # all tied -> smallest id
    gated = {
        r["prompt"]
        for r in best_of_n(
            resp, ["prompt"], "rid", "score", min_candidates=2
        ).collect()
    }
    assert gated == {"p1", "p2", "p4"}


def test_k_validation(resp):
    with pytest.raises(ValueError):
        build_preference_pairs(resp, ["prompt"], "rid", "score", k=0)


def test_one_exchange_plan(spark, resp):
    """The rank window and the pair self-join share one hash(prompt)
    exchange: the second side reuses it (ReusedExchange), and no
    exchange on any other key appears."""
    pairs = build_preference_pairs(resp, ["prompt"], "rid", "score", k=2)
    buf = io.StringIO()
    with redirect_stdout(buf):
        pairs.explain("formatted")
    plan = buf.getvalue()
    n_exchange = plan.count("Exchange hashpartitioning")
    n_reused = plan.count("ReusedExchange")
    assert n_exchange - n_reused <= 1, plan
    # the join must be an equi-join on the prompt key, never a cross join
    assert "CartesianProduct" not in plan, plan


def test_conversation_preference_pairs(spark):
    """Conversations sharing a rendered prompt prefix pair their final
    assistant responses by per-conversation score; prefix identity is
    byte-level (roles included), last-turn-not-assistant convs drop."""
    from fluent_server_spark.operators.preference import (
        conversation_preference_pairs,
    )

    turns = []
    # group A: three samples of the same 2-turn prompt, different answers
    for cid, answer in [("a1", "red"), ("a2", "blue"), ("a3", "green")]:
        turns += [
            (cid, 0, "user", "what color?"),
            (cid, 1, "assistant", "hmm"),
            (cid, 2, "user", "pick one"),
            (cid, 3, "assistant", answer),
        ]
    # group B: same USER texts as A but a different role in the prefix ->
    # different prompt key (byte-level identity)
    for cid, answer in [("b1", "seven"), ("b2", "nine")]:
        turns += [
            (cid, 0, "user", "what color?"),
            (cid, 1, "system", "hmm"),
            (cid, 2, "user", "pick one"),
            (cid, 3, "assistant", answer),
        ]
    # ends on a user turn -> dropped; unique prefix -> singleton, no pair
    turns += [("c1", 0, "user", "q"), ("c1", 1, "user", "??")]
    turns += [("d1", 0, "user", "solo"), ("d1", 1, "assistant", "ok")]

    tdf = spark.createDataFrame(
        turns, "conv_id string, turn_idx int, role string, text string"
    )
    scores = spark.createDataFrame(
        [("a1", 3.0), ("a2", 2.0), ("a3", 1.0), ("b1", 5.0), ("b2", 6.0),
         ("c1", 9.0), ("d1", 9.0)],
        "conv_id string, score double",
    )
    rows = conversation_preference_pairs(tdf, scores, k=1).collect()
    got = {(r["chosen_id"], r["rejected_id"]) for r in rows}
    assert got == {("a1", "a3"), ("b2", "b1")}
    by_chosen = {r["chosen_id"]: r for r in rows}
    # groups A and B have DIFFERENT prompt keys despite equal user text
    assert by_chosen["a1"]["prompt_md5"] != by_chosen["b2"]["prompt_md5"]
    assert by_chosen["a1"]["score_gap"] == pytest.approx(2.0)
    # response digests differ within a pair (different final answers)
    for r in rows:
        assert r["chosen_response_md5"] != r["rejected_response_md5"]
    # k=2 on group A adds the middle pairings with positive gaps
    got2 = {
        (r["chosen_id"], r["rejected_id"])
        for r in conversation_preference_pairs(tdf, scores, k=2).collect()
    }
    assert got2 == {("a1", "a3"), ("a1", "a2"), ("a2", "a3"), ("b2", "b1")}


def test_null_scores_are_not_candidates(spark):
    """A NULL-scored row must not consume a top/bottom-k slot: with
    NULLs ranked, ('p', 1, 2) would be masked by the NULL row sitting
    in the bottom-1 position."""
    df = spark.createDataFrame(
        [("p", 1, 5.0), ("p", 2, 1.0), ("p", 3, None)],
        "prompt string, rid int, score double",
    )
    got = {
        (r["chosen_id"], r["rejected_id"])
        for r in build_preference_pairs(df, ["prompt"], "rid", "score").collect()
    }
    assert got == {(1, 2)}
    bon = best_of_n(df, ["prompt"], "rid", "score").collect()[0]
    assert bon["best_id"] == 1 and bon["n_candidates"] == 2
