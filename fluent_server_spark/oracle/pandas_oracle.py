"""Pure-pandas oracle for the transcript pipeline — NO Spark imports.

Plays the role the mirror plays in the reference's e2e tests: the JS
client greps its round-tripped value out of the mirror JSON
(reference: contrib/js/index.js:28-45); our pytest compares Spark sink
contents and aggregates against this independent implementation of the
same semantics (parse -> enrich -> first-match route -> aggregates).

Intentionally implemented with a DIFFERENT engine (pandas groupby/merge,
Python `re`) so agreement is evidence of semantics, not shared code.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from fluent_server_spark.data.synth import (
    LOOKUP_COLUMNS,
    QUARANTINE_SINK,
    ROLE_TOOL_LOOKUP_ROWS,
    ROUTE_RULE_COLUMNS,
    ROUTE_RULE_ROWS,
)
from fluent_server_spark.functions.parse import GROK_PATTERN

_GROK_RE = re.compile(GROK_PATTERN)


def oracle_parse(turns: pd.DataFrame) -> pd.DataFrame:
    ext = turns["text"].str.extract(_GROK_RE)
    ext.columns = ["level", "component", "msg", "dur_ms", "tokens"]
    out = turns.copy()
    out["level"] = ext["level"]
    out["component"] = ext["component"]
    out["msg"] = ext["msg"]
    out["dur_ms"] = pd.to_numeric(ext["dur_ms"], errors="coerce").astype("Int32")
    out["tokens"] = pd.to_numeric(ext["tokens"], errors="coerce").astype("Int32")
    out["parse_ok"] = ext["level"].notna()
    return out


def oracle_enrich(parsed: pd.DataFrame) -> pd.DataFrame:
    lookup = pd.DataFrame(ROLE_TOOL_LOOKUP_ROWS, columns=LOOKUP_COLUMNS)
    return parsed.merge(lookup, on=["role", "tool"], how="left")


def _match(values: pd.Series, pattern: str) -> pd.Series:
    if pattern == "*":
        return pd.Series(True, index=values.index)
    if pattern.endswith("*"):
        return values.fillna("").str.startswith(pattern[:-1])
    return values == pattern


def oracle_route(enriched: pd.DataFrame) -> pd.DataFrame:
    rules = pd.DataFrame(ROUTE_RULE_ROWS, columns=ROUTE_RULE_COLUMNS)
    conds = [~enriched["parse_ok"]]
    sinks = [QUARANTINE_SINK]
    for r in rules.sort_values("rule_idx").itertuples():
        conds.append(
            _match(enriched["role"], r.role_pattern)
            & _match(enriched["tool"], r.tool_pattern)
            & _match(enriched["level"], r.level_pattern)
        )
        sinks.append(r.sink)
    out = enriched.copy()
    out["sink"] = np.select(conds, sinks, default="sink_default")
    return out


def oracle_pipeline(turns: pd.DataFrame) -> pd.DataFrame:
    return oracle_route(oracle_enrich(oracle_parse(turns)))


def oracle_routed_counts(routed: pd.DataFrame) -> pd.DataFrame:
    g = (
        routed.groupby("sink")
        .agg(n_turns=("conv_id", "size"), n_convs=("conv_id", "nunique"))
        .reset_index()
    )
    return g.sort_values("sink").reset_index(drop=True)


def oracle_tool_histogram(routed: pd.DataFrame) -> pd.DataFrame:
    g = routed.groupby(["sink", "tool"]).size().rename("n").reset_index()
    return g.sort_values(["sink", "tool"]).reset_index(drop=True)


def oracle_conversation_stats(routed: pd.DataFrame) -> pd.DataFrame:
    df = routed.sort_values(["conv_id", "turn_idx"]).copy()
    ts_us = df["ts"].astype("int64") // 1000
    df["gap_us"] = ts_us.groupby(df["conv_id"]).diff()
    g = (
        df.groupby("conv_id")
        .agg(
            n_turns=("turn_idx", "size"),
            n_tools=("tool", "nunique"),
            avg_gap_s=("gap_us", "mean"),
            first_ts=("ts", "min"),
            last_ts=("ts", "max"),
            n_errors=("sink", lambda s: (s == "sink_errors").sum()),
        )
        .reset_index()
    )
    g["avg_gap_s"] = (g["avg_gap_s"] / 1e6).round(6)
    return g.sort_values("conv_id").reset_index(drop=True)
