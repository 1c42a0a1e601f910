"""Tag-style match/route: fan rows out to sinks, first-match-wins.

The reference's only routing structure is the mirror's per-tag append map
(reference: mirror/mirror.go:26-39) fed by fluentd ``<match>`` patterns
on the client side (``Match *`` in reference contrib/config/A.cfg). Here
routing is first-class: an ORDERED rule table over (role_pattern,
tool_pattern, level_pattern) compiles into a single ``F.when`` chain —
one narrow projection, no joins, no shuffles, whole-stage codegen. At
10^12 rows the route decision costs the same scan that computes it.

Pattern language (FIXTURES.md §3): ``*`` (any), prefix ``x*``, literal —
plus fluentd-style dot-segment tag patterns for dotted values (the
grammar a fluentd ``<match>`` user reaches for; reference tags are
dot-composed, contrib/js/index.js:4,22 ``tag_prefix.my_tag``, and the
mirror keys on the full tag, mirror/mirror.go:30-37):

* ``a.*``  — exactly ONE more segment (``a.b`` yes, ``a`` / ``a.b.c`` no)
* ``a.**`` — the base tag or ANY deeper suffix (``a``, ``a.b``, ``a.b.c``)
* ``*`` inside a dotted pattern matches one whole segment; ``x*`` inside
  a segment is a per-segment prefix (``web.ap*.logs``)

Rows that failed the parse stage short-circuit to the quarantine sink
before any rule runs (the batch replacement for the reference closing
the connection on a decode error, message/session.go:73-74).
"""

from __future__ import annotations

import re
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


def tag_pattern_regex(pattern: str) -> str:
    """Compile a dotted fluentd-style tag pattern to an anchored regex.

    Segments: ``**`` (final segment only) absorbs zero or more trailing
    segments; ``*`` is exactly one segment; ``x*`` is a segment prefix;
    anything else is a literal segment. Mirrors fluentd's documented
    ``<match>`` glob semantics (public fluentd docs)."""
    parts = pattern.split(".")
    deep = parts[-1] == "**"
    if deep:
        parts = parts[:-1]

    def seg(p: str) -> str:
        if p == "*":
            return r"[^.]+"
        if p.endswith("*"):
            return re.escape(p[:-1]) + r"[^.]*"
        return re.escape(p)

    body = r"\.".join(seg(p) for p in parts)
    if deep:
        body = (body + r"(?:\.[^.]+)*") if body else r"[^.]+(?:\.[^.]+)*"
    return "^" + body + "$"


def _match_pattern(col: Column, pattern: str) -> Column:
    if pattern == "*":
        return F.lit(True)
    if "." in pattern or pattern == "**":
        # dotted tag pattern -> ONE anchored rlike; still a narrow,
        # codegen'd predicate inside the same first-match CASE chain
        return col.rlike(tag_pattern_regex(pattern))
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


def compile_tag_routes(
    tag_col: Column, rules: list[tuple[str, str]], default: str = DEFAULT_SINK
) -> Column:
    """First-match-wins route over a single dotted-tag column — the
    direct analogue of an ordered fluentd <match> list. Same narrow CASE
    compilation as compile_routes; patterns may use the dot-segment
    grammar (`a.*`, `a.**`) or the plain `*`/prefix/literal forms."""
    expr = None
    for pat, sink in rules:
        cond = _match_pattern(tag_col, pat)
        expr = F.when(cond, F.lit(sink)) if expr is None else expr.when(
            cond, F.lit(sink)
        )
    return expr.otherwise(F.lit(default)) if expr is not None else F.lit(default)


def route_turns(df: DataFrame, rules: list[RouteRule], **cols: str) -> DataFrame:
    """Add a `sink` column; every row gets exactly one sink (nothing drops)."""
    return df.withColumn("sink", compile_routes(rules, **cols))


def rules_from_rows(rows: list[tuple[int, str, str, str, str]]) -> list[RouteRule]:
    return [RouteRule(*r) for r in rows]
