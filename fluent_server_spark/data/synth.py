"""Deterministic synthetic `turns` table + side tables.

Schema (BASELINE.json input_hint):
    turns(conv_id: string, turn_idx: int32, role: string, text: string,
          tool: string, ts: timestamp)

Two generators produce IDENTICAL data for a given ``n_turns``/``n_convs``:

* :func:`synth_turns_pandas` — numpy int64 arithmetic, feeds the in-repo
  pure-pandas oracle (the role the reference's mockup wire + literal
  payloads play in its tests, message/session_test.go:139-150).
* :func:`synth_turns_spark` — the same arithmetic as Catalyst column
  expressions over ``spark.range(n)``: fully distributed, no driver-side
  data, no RNG state — this is how the 10^12-turn bench input would be
  materialized on a cluster (each task generates its id-range locally).

Determinism comes from multiplicative mixing, not an RNG, so both sides
agree exactly. All products stay < 2^63 for id < 3.4e9 (no overflow even
under ANSI mode).

Fixture properties (FIXTURES.md §1):
* ONE hot conversation holds ~30% of all turns (skew fixture).
* ~2% of texts are malformed (parse-quarantine fixture — the analogue of
  the reference's arity rejects at message/entry.go:23-25).
* ts is monotone within a conversation, epoch base 2024-01-01.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------- mixing
# mix_k(i) = ((i + SALT_k) * MULT_k) % 100_000 — a cheap deterministic
# "hash" identical in numpy int64 and Spark LongType arithmetic.
_MULTS = {
    "role": 2654435761,
    "tool": 2246822519,
    "level": 3266489917,
    "component": 668265263,
    "msg": 374761393,
    "dur": 2654435789,
    "tokens": 1103515245,
    "malformed": 2166136261,
    "jitter": 1779033703,
}
_SALTS = {
    "role": 101,
    "tool": 223,
    "level": 317,
    "component": 419,
    "msg": 523,
    "dur": 607,
    "tokens": 701,
    "malformed": 809,
    "jitter": 907,
}
_MOD = 100_000

ROLES = ["user", "assistant", "system", "tool"]
# cumulative per-mille thresholds over mix % 1000
_ROLE_CUTS = [400, 800, 850, 1000]  # user 40%, assistant 40%, system 5%, tool 15%
TOOLS = ["bash", "search", "read", "write", "none"]
_TOOL_CUTS = [200, 400, 550, 700, 1000]
LEVELS = ["INFO", "WARN", "ERROR", "DEBUG"]
_LEVEL_CUTS = [700, 850, 950, 1000]
COMPONENTS = ["planner", "executor", "memory", "router", "critic"]
_COMPONENT_CUTS = [300, 550, 750, 900, 1000]
MESSAGES = [
    "step completed",
    "retrying after transient failure",
    "cache hit for prompt prefix",
    "tool output truncated",
    "schema validated",
    "context window compacted",
    "handoff to subagent",
    "rate limit backoff",
    "checkpoint written",
    "partition rebalanced",
    "lookup miss fell back to default",
    "stream flushed",
]
MALFORMED_PERMILLE = 20  # 2%
HOT_FRACTION = 0.30
HOT_CONV = "conv-00000000"
EPOCH_BASE = pd.Timestamp("2024-01-01 00:00:00")
EPOCH_BASE_UNIX = 1_704_067_200  # 2024-01-01T00:00:00Z


def _cuts_case_np(mix1000: np.ndarray, cuts: list[int], values: list[str]) -> np.ndarray:
    conds = []
    prev = 0
    for c in cuts:
        conds.append((mix1000 >= prev) & (mix1000 < c))
        prev = c
    return np.select(conds, values, default=values[-1])


def _mix_np(i: np.ndarray, key: str) -> np.ndarray:
    return ((i + _SALTS[key]) * _MULTS[key]) % _MOD


def synth_turns_pandas(n_turns: int, n_convs: int = 100) -> pd.DataFrame:
    """Generate `turns` as a pandas DataFrame (oracle-side twin)."""
    i = np.arange(n_turns, dtype=np.int64)
    n_hot = int(n_turns * HOT_FRACTION)
    n_rest_convs = max(n_convs - 1, 1)

    is_hot = i < n_hot
    rest = i - n_hot
    conv_num = np.where(is_hot, 0, 1 + rest % n_rest_convs)
    turn_idx = np.where(is_hot, i, rest // n_rest_convs).astype(np.int32)
    conv_id = np.char.add("conv-", np.char.zfill(conv_num.astype("U8"), 8))

    role = _cuts_case_np(_mix_np(i, "role") % 1000, _ROLE_CUTS, ROLES)
    tool_raw = _cuts_case_np(_mix_np(i, "tool") % 1000, _TOOL_CUTS, TOOLS)
    tool = np.where(np.isin(role, ["user", "system"]), "none", tool_raw)
    level = _cuts_case_np(_mix_np(i, "level") % 1000, _LEVEL_CUTS, LEVELS)
    component = _cuts_case_np(
        _mix_np(i, "component") % 1000, _COMPONENT_CUTS, COMPONENTS
    )
    msg = np.asarray(MESSAGES)[_mix_np(i, "msg") % len(MESSAGES)]
    dur_ms = _mix_np(i, "dur") % 5000
    tokens = _mix_np(i, "tokens") % 800
    malformed = (_mix_np(i, "malformed") % 1000) < MALFORMED_PERMILLE

    text_ok = (
        "level=" + pd.Series(level)
        + " component=" + pd.Series(component)
        + ' msg="' + pd.Series(msg) + '"'
        + " dur_ms=" + pd.Series(dur_ms).astype(str)
        + " tokens=" + pd.Series(tokens).astype(str)
    ).to_numpy()
    text_bad = np.char.add("?garbled ", i.astype("U"))
    text = np.where(malformed, text_bad, text_ok)

    # monotone-in-conversation ts: per-conv base minute + turn-second + jitter<1s
    ts_sec = conv_num * 60 + turn_idx.astype(np.int64) * 2
    ts_us = ts_sec * 1_000_000 + _mix_np(i, "jitter") % 1_000_000
    ts = EPOCH_BASE + pd.to_timedelta(ts_us, unit="us")

    return pd.DataFrame(
        {
            "conv_id": conv_id,
            "turn_idx": pd.array(turn_idx, dtype="int32"),
            "role": role,
            "text": text,
            "tool": tool,
            "ts": ts,
        }
    )


# ------------------------------------------------------------ spark twin
def _mix_sql(i: F.Column, key: str) -> F.Column:
    return ((i + F.lit(_SALTS[key])) * F.lit(_MULTS[key])) % F.lit(_MOD)


def _cuts_case_sql(mix1000: F.Column, cuts: list[int], values: list[str]) -> F.Column:
    expr = F
    out = None
    prev = 0
    for c, v in zip(cuts, values):
        cond = (mix1000 >= F.lit(prev)) & (mix1000 < F.lit(c))
        out = expr.when(cond, v) if out is None else out.when(cond, v)
        prev = c
    return out.otherwise(values[-1])


def synth_turns_spark(
    spark: SparkSession, n_turns: int, n_convs: int = 100, partitions: int | None = None
) -> DataFrame:
    """Generate `turns` distributedly — same values as the pandas twin.

    ``spark.range`` gives each task an id slice; every column is a pure
    function of id, so generation is shuffle-free and scales linearly
    (the 10^12-row path: one narrow stage, then write).
    """
    partitions = partitions or spark.sparkContext.defaultParallelism
    n_hot = int(n_turns * HOT_FRACTION)
    n_rest_convs = max(n_convs - 1, 1)

    df = spark.range(0, n_turns, 1, partitions).withColumnRenamed("id", "i")
    i = F.col("i")
    is_hot = i < F.lit(n_hot)
    rest = i - F.lit(n_hot)
    conv_num = F.when(is_hot, F.lit(0)).otherwise(
        F.lit(1) + rest % F.lit(n_rest_convs)
    )
    turn_idx = F.when(is_hot, i).otherwise(
        F.floor(rest / F.lit(n_rest_convs))
    ).cast("int")

    role = _cuts_case_sql(_mix_sql(i, "role") % 1000, _ROLE_CUTS, ROLES)
    tool_raw = _cuts_case_sql(_mix_sql(i, "tool") % 1000, _TOOL_CUTS, TOOLS)
    level = _cuts_case_sql(_mix_sql(i, "level") % 1000, _LEVEL_CUTS, LEVELS)
    component = _cuts_case_sql(
        _mix_sql(i, "component") % 1000, _COMPONENT_CUTS, COMPONENTS
    )
    msg_arr = F.array([F.lit(m) for m in MESSAGES])
    msg = F.element_at(msg_arr, (_mix_sql(i, "msg") % len(MESSAGES) + 1).cast("int"))
    dur_ms = _mix_sql(i, "dur") % 5000
    tokens = _mix_sql(i, "tokens") % 800
    malformed = (_mix_sql(i, "malformed") % 1000) < MALFORMED_PERMILLE

    df = df.select(
        F.concat(F.lit("conv-"), F.lpad(conv_num.cast("string"), 8, "0")).alias(
            "conv_id"
        ),
        turn_idx.alias("turn_idx"),
        role.alias("role"),
        F.when(
            malformed, F.concat(F.lit("?garbled "), i.cast("string"))
        )
        .otherwise(
            F.concat(
                F.lit("level="), level,
                F.lit(" component="), component,
                F.lit(' msg="'), msg, F.lit('"'),
                F.lit(" dur_ms="), dur_ms.cast("string"),
                F.lit(" tokens="), tokens.cast("string"),
            )
        )
        .alias("text"),
        F.when(role.isin("user", "system"), "none").otherwise(tool_raw).alias("tool"),
        F.timestamp_micros(
            (conv_num * 60 + turn_idx.cast("long") * 2) * F.lit(1_000_000)
            + _mix_sql(i, "jitter") % 1_000_000
            + F.lit(EPOCH_BASE_UNIX * 1_000_000)
        ).alias("ts"),
    )
    return df


# ------------------------------------------------------------ side tables
# FIXTURES.md §2 — role/tool lookup, always broadcast (left join keeps all
# turns: the reference's handler drops nothing, mirror/mirror.go:30-37).
ROLE_TOOL_LOOKUP_ROWS: list[tuple[str, str, str, str]] = [
    ("assistant", "bash", "shell", "high"),
    ("assistant", "search", "retrieval", "low"),
    ("assistant", "read", "io", "low"),
    ("assistant", "write", "io", "medium"),
    ("assistant", "none", "none", "low"),
    ("tool", "bash", "shell", "high"),
    ("tool", "search", "retrieval", "low"),
    ("tool", "read", "io", "low"),
    ("tool", "write", "io", "medium"),
    ("tool", "none", "none", "low"),
    ("user", "none", "none", "low"),
    ("system", "none", "none", "low"),
]
LOOKUP_COLUMNS = ["role", "tool", "tool_family", "risk_tier"]

# FIXTURES.md §3 — fluentd-style ordered match rules, first-match-wins
# (cf. `Match *` in reference contrib/config/A.cfg). Patterns: literal,
# prefix `x*`, or `*`. level_pattern matches the PARSED level field.
ROUTE_RULE_ROWS: list[tuple[int, str, str, str, str]] = [
    (0, "*", "*", "ERROR", "sink_errors"),
    (1, "tool", "*", "*", "sink_tool_calls"),
    (2, "*", "ba*", "*", "sink_tool_calls"),
    (3, "assistant", "sea*", "*", "sink_tool_calls"),
    (4, "user", "*", "*", "sink_user"),
    (5, "*", "*", "*", "sink_default"),
]
ROUTE_RULE_COLUMNS = ["rule_idx", "role_pattern", "tool_pattern", "level_pattern", "sink"]
QUARANTINE_SINK = "sink_quarantine"


def lookup_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(ROLE_TOOL_LOOKUP_ROWS, LOOKUP_COLUMNS)


def route_rules_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(ROUTE_RULE_ROWS, ROUTE_RULE_COLUMNS)
