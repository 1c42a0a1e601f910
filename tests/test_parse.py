"""Parse stage unit tests — the entry_test analogue
(reference: message/entry_test.go:12-35 pins literal payload decode)."""

from __future__ import annotations

import pandas as pd

from fluent_server_spark.functions.parse import parse_turns


LITERALS = [
    ('level=INFO component=planner msg="step completed" dur_ms=12 tokens=34', True),
    ('level=ERROR component=critic msg="" dur_ms=0 tokens=0', True),
    ("?garbled 42", False),
    ("", False),
    ('level=INFO component=planner msg="no tokens" dur_ms=5', False),  # arity reject
    ('LEVEL=INFO component=x msg="a" dur_ms=1 tokens=1', False),  # case-sensitive key
    ("level=A level=B", False),  # duplicate keys must quarantine, not crash
]


def _parse_literals(spark, impl):
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(LITERALS)], ["i", "text"]
    )
    out = parse_turns(df, impl=impl).select("i", "text", "parsed.*")
    return out.toPandas().sort_values("i").reset_index(drop=True)


def test_literal_cases_native(spark):
    out = _parse_literals(spark, "native")
    assert list(out.parse_ok) == [ok for _, ok in LITERALS]
    r0 = out.iloc[0]
    assert (r0.level, r0.component, r0.msg, r0.dur_ms, r0.tokens) == (
        "INFO", "planner", "step completed", 12, 34,
    )
    assert out.iloc[2].level is None or pd.isna(out.iloc[2].level)


def test_all_impls_agree(spark, turns_sdf):
    """All three parser implementations produce identical structs."""

    def run(impl):
        return (
            parse_turns(turns_sdf, impl=impl)
            .select("conv_id", "turn_idx", "parsed.*")
            .toPandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )

    a, b, c = run("native"), run("pandas"), run("regexp")
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    pd.testing.assert_frame_equal(a, c, check_dtype=False)
    assert a.parse_ok.sum() > 0 and (~a.parse_ok).sum() > 0


ADVERSARIAL_MSG = [
    # GROK-valid rows whose quoted msg contains ' key=' material — a
    # naive delimiter split would truncate msg or produce duplicate map
    # keys (DUPLICATE_MAP_KEY under the default EXCEPTION dedup policy)
    'level=INFO component=planner msg="retry with level=2" dur_ms=1 tokens=2',
    'level=WARN component=x msg="a dur_ms= b tokens=9 end" dur_ms=3 tokens=4',
    'level=INFO component=y msg="msg= nested msg=deep" dur_ms=5 tokens=6',
]


def test_adversarial_msg_all_impls_agree(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(ADVERSARIAL_MSG)], ["i", "text"]
    )

    def run(impl):
        return (
            parse_turns(df, impl=impl)
            .select("i", "parsed.*")
            .toPandas()
            .sort_values("i")
            .reset_index(drop=True)
        )

    native, pandas_, regexp = run("native"), run("pandas"), run("regexp")
    assert list(native.parse_ok) == [True, True, True]
    assert native.msg[0] == "retry with level=2"
    assert native.msg[1] == "a dur_ms= b tokens=9 end"
    assert (native.dur_ms.tolist(), native.tokens.tolist()) == ([1, 3, 5], [2, 4, 6])
    pd.testing.assert_frame_equal(native, pandas_, check_dtype=False)
    pd.testing.assert_frame_equal(native, regexp, check_dtype=False)
