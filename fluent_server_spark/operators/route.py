"""Tag-style match/route: fan rows out to sinks, first-match-wins.

The reference's only routing structure is the mirror's per-tag append map
(reference: mirror/mirror.go:26-39) fed by fluentd ``<match>`` patterns
on the client side (``Match *`` in reference contrib/config/A.cfg). Here
routing is first-class: an ORDERED rule table over (role_pattern,
tool_pattern, level_pattern) compiles into a single ``F.when`` chain —
one narrow projection, no joins, no shuffles, whole-stage codegen. At
10^12 rows the route decision costs the same scan that computes it.

Pattern language (FIXTURES.md §3): ``*`` (any), prefix ``x*``, literal.
Rows that failed the parse stage short-circuit to the quarantine sink
before any rule runs (the batch replacement for the reference closing
the connection on a decode error, message/session.go:73-74).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fluent_server_spark.data.synth import QUARANTINE_SINK


@dataclass(frozen=True)
class RouteRule:
    rule_idx: int
    role_pattern: str
    tool_pattern: str
    level_pattern: str
    sink: str


DEFAULT_SINK = "sink_default"


def _match_pattern(col: Column, pattern: str) -> Column:
    if pattern == "*":
        return F.lit(True)
    if pattern.endswith("*"):
        return col.startswith(pattern[:-1])
    return col == F.lit(pattern)


def compile_routes(
    rules: list[RouteRule],
    role_col: str = "role",
    tool_col: str = "tool",
    level_col: str = "parsed.level",
    parse_ok_col: str = "parsed.parse_ok",
) -> Column:
    """Compile ordered rules into one first-match-wins CASE expression."""
    expr = F.when(~F.col(parse_ok_col), F.lit(QUARANTINE_SINK))
    for r in sorted(rules, key=lambda r: r.rule_idx):
        cond = (
            _match_pattern(F.col(role_col), r.role_pattern)
            & _match_pattern(F.col(tool_col), r.tool_pattern)
            & _match_pattern(F.col(level_col), r.level_pattern)
        )
        expr = expr.when(cond, F.lit(r.sink))
    return expr.otherwise(F.lit(DEFAULT_SINK))


def route_turns(df: DataFrame, rules: list[RouteRule], **cols: str) -> DataFrame:
    """Add a `sink` column; every row gets exactly one sink (nothing drops)."""
    return df.withColumn("sink", compile_routes(rules, **cols))


def rules_from_rows(rows: list[tuple[int, str, str, str, str]]) -> list[RouteRule]:
    return [RouteRule(*r) for r in rows]
