"""Route stage unit tests — the mode-demux/reader_test analogue
(reference: defaultreader/reader_test.go:17-106 pins dispatch per mode;
here we pin first-match-wins + pattern semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fluent_server_spark.operators.route import RouteRule, compile_routes


RULES = [
    RouteRule(0, "*", "*", "ERROR", "sink_errors"),
    RouteRule(1, "tool", "*", "*", "sink_tool_calls"),
    RouteRule(2, "*", "ba*", "*", "sink_tool_calls"),
    RouteRule(3, "assistant", "sea*", "*", "sink_tool_calls"),
    RouteRule(4, "user", "*", "*", "sink_user"),
    RouteRule(5, "*", "*", "*", "sink_default"),
]

CASES = [
    # (role, tool, level, parse_ok) -> expected sink
    (("tool", "bash", "INFO", True), "sink_tool_calls"),
    (("tool", "bash", "ERROR", True), "sink_errors"),  # rule 0 wins (order)
    (("assistant", "bash", "INFO", True), "sink_tool_calls"),  # prefix ba*
    (("assistant", "search", "INFO", True), "sink_tool_calls"),  # prefix sea*
    (("user", "none", "INFO", True), "sink_user"),
    (("assistant", "none", "INFO", True), "sink_default"),  # falls through
    (("system", "none", "WARN", True), "sink_default"),
    (("user", "none", None, False), "sink_quarantine"),  # parse failure first
    (("tool", "bash", None, False), "sink_quarantine"),
]


def test_first_match_wins_and_patterns(spark):
    rows = [
        (i, r, t, lvl, ok, expected)
        for i, ((r, t, lvl, ok), expected) in enumerate(CASES)
    ]
    df = spark.createDataFrame(
        rows, "i int, role string, tool string, level string, parse_ok boolean, expected string"
    )
    out = (
        df.withColumn(
            "sink",
            compile_routes(RULES, level_col="level", parse_ok_col="parse_ok"),
        )
        .select("i", "expected", "sink")
        .collect()
    )
    for row in out:
        assert row.sink == row.expected, f"case {row.i}: {row.sink} != {row.expected}"


def test_route_is_single_projection(spark):
    """The compiled route must not add joins/shuffles — it's one CASE expr."""
    df = spark.createDataFrame(
        [("tool", "bash", "INFO", True)], "role string, tool string, level string, parse_ok boolean"
    )
    routed = df.withColumn(
        "sink", compile_routes(RULES, level_col="level", parse_ok_col="parse_ok")
    )
    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan


def test_tag_pattern_regex_literals():
    """Fluentd dot-segment semantics pinned on literals
    (contrib/js/index.js:4,22 composes dotted tags; mirror/mirror.go:30-37
    keys on the full tag)."""
    import re

    from fluent_server_spark.operators.route import tag_pattern_regex

    cases = [
        ("a.*", {"a.b": True, "a": False, "a.b.c": False, "x.b": False}),
        ("a.**", {"a": True, "a.b": True, "a.b.c": True, "ab": False, "b.a": False}),
        ("**", {"a": True, "a.b.c": True, "": False}),
        ("web.ap*.logs", {"web.app.logs": True, "web.ap.logs": True,
                          "web.xpp.logs": False, "web.app.logs.x": False}),
        ("*.err", {"db.err": True, "err": False, "a.b.err": False}),
    ]
    for pat, checks in cases:
        rx = re.compile(tag_pattern_regex(pat))
        for value, want in checks.items():
            assert bool(rx.match(value)) == want, (pat, value)
