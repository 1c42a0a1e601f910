"""Pipeline queries over the driver `events` table.

FIXTURES.md §5 maps events onto the transcript pipeline for the DuckDB
oracle checks: event_type plays the routing tag (the reference routes
purely on tag, mirror/mirror.go:30-37), props the parseable text
(<-> DecodeEntry, message/entry.go:11-35), user_id the group key. Same
operators as plans/pipeline.py: vectorized parse, broadcast enrich,
first-match route, per-sink aggregates, window stats.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fluent_server_spark.queries import QuerySpec, load_table, ntz_micros, spread

# ---------------------------------------------------------------- routing
# ordered, first-match-wins — tag-literal or '*' (cf. contrib/config/A.cfg)
EVENT_ROUTES: list[tuple[str, str]] = [
    ("error", "sink_errors"),
    ("purchase", "sink_conversions"),
    ("signup", "sink_conversions"),
    ("click", "sink_traffic"),
    ("view", "sink_traffic"),
    ("*", "sink_default"),
]

# broadcast-enrich lookup (tag -> category/weight); inline VALUES in SQL
EVENT_LOOKUP: list[tuple[str, str, int]] = [
    ("error", "ops", 3),
    ("purchase", "revenue", 10),
    ("signup", "growth", 8),
    ("click", "engagement", 1),
    ("view", "engagement", 1),
]

_K_PATTERN = r'"k":\s*(\d+)'


def _sink_case_sql(qual: str = "") -> str:
    col = f"{qual}event_type"
    lines = ["CASE"]
    for tag, sink in EVENT_ROUTES:
        if tag == "*":
            lines.append(f"  ELSE '{sink}'")
        else:
            lines.append(f"  WHEN {col} = '{tag}' THEN '{sink}'")
    lines.append("END")
    return "\n".join(lines)


def _lookup_values_sql() -> str:
    rows = ", ".join(f"('{t}', '{c}', {w})" for t, c, w in EVENT_LOOKUP)
    return f"(VALUES {rows}) AS lkp(event_type, category, weight)"


def _routed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parse (props -> k) + enrich (broadcast lookup) + route (CASE chain)."""
    events = load_table(spark, sf_dir, "events")
    lookup = spark.createDataFrame(EVENT_LOOKUP, ["event_type", "category", "weight"])
    sink = F
    out = None
    for tag, s in EVENT_ROUTES:
        cond = F.lit(True) if tag == "*" else (F.col("event_type") == tag)
        out = sink.when(cond, s) if out is None else out.when(cond, s)
    return (
        events.withColumn(
            "k",
            # try_cast: '' on no-match must quarantine to NULL, not blow up
            # under the driver session's ANSI mode
            F.regexp_extract(F.col("props"), _K_PATTERN, 1).try_cast("int"),
        )
        .join(F.broadcast(lookup), "event_type", "left")
        .withColumn("sink", out)
    )


def q_route_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _routed(spark, sf_dir).select(
        "event_id", "event_type", "sink", "k", "category",
        F.coalesce("weight", F.lit(0)).alias("weight"),
    )


SQL_ROUTE_EVENTS = f"""
SELECT e.event_id, e.event_type,
       {_sink_case_sql('e.')} AS sink,
       TRY_CAST(regexp_extract(e.props, '{_K_PATTERN}', 1) AS INT) AS k,
       lkp.category,
       COALESCE(lkp.weight, 0) AS weight
FROM events e
LEFT JOIN {_lookup_values_sql()} ON e.event_type = lkp.event_type
"""


def q_routed_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-sink counts AND the per-(sink, event_type) histogram in one
    pass via GROUPING SETS ((sink), (sink, event_type)) — the grouping
    expansion is map-side, so both grains cost one shuffle. Sink-level
    rows carry event_type='ALL'."""
    return (
        _routed(spark, sf_dir)
        .groupingSets([["sink"], ["sink", "event_type"]], "sink", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.sum("k").alias("sum_k"),
        )
        .select(
            "sink",
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            "n_events",
            "n_users",
            "sum_value",
            "sum_k",
        )
    )


SQL_ROUTED_EVENT_COUNTS = f"""
SELECT sink, coalesce(event_type, 'ALL') AS event_type,
       count(*) AS n_events, count(DISTINCT user_id) AS n_users,
       round(sum(value), 2) AS sum_value, CAST(sum(k) AS BIGINT) AS sum_k
FROM (
  SELECT *, {_sink_case_sql()} AS sink,
         TRY_CAST(regexp_extract(props, '{_K_PATTERN}', 1) AS INT) AS k
  FROM events
) GROUP BY GROUPING SETS ((sink), (sink, event_type))
"""

SESSION_GAP_S = 1800


def q_user_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization BOTH ways, cross-validated in one result: the lag +
    cumsum idiom (gap>30min starts a new session; one window on (user_id
    ORDER BY ts, event_id) whose shuffle also serves the final groupBy)
    AND Spark's NATIVE session_window primitive, joined per user. The two
    session counts must agree — the driver hash check IS the agreement
    proof — and session_window additionally contributes per-session dwell
    time. Boundary semantics (pinned in tests/test_session_window.py): a
    gap of EXACTLY the window size still MERGES (Spark session windows
    are closed at the merge boundary), so both the lag idiom and the SQL
    oracle's gaps-and-islands cumsum start a new session only on gap
    STRICTLY greater."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_us = ntz_micros(F.col("ts"))  # tz-independent (driver session != UTC)
    gap = ts_us - F.lag(ts_us).over(w)
    lagged = (
        events.withColumn(
            "new_sess",
            F.when(gap.isNull() | (gap > SESSION_GAP_S * 1_000_000), 1).otherwise(0),
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("new_sess").alias("n_sessions"),
            ntz_micros(F.min("ts")).alias("first_ts_us"),
            ntz_micros(F.max("ts")).alias("last_ts_us"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )
    sess = events.groupBy(
        "user_id", F.session_window("ts", f"{SESSION_GAP_S} seconds").alias("sw")
    ).agg(F.min("ts").alias("t0"), F.max("ts").alias("t1"))
    dwell = ntz_micros(F.col("t1")) - ntz_micros(F.col("t0"))
    native = sess.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("sw_n_sessions"),
        F.sum(dwell).alias("dwell_us"),
    )
    return lagged.join(native, "user_id")


SQL_USER_SESSION_STATS = f"""
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN gap_us IS NULL OR gap_us > {SESSION_GAP_S} * 1000000
              THEN 1 ELSE 0 END AS new_sess
  FROM (
    SELECT *, epoch_us(ts) - lag(epoch_us(ts))
                OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
    FROM events
  )),
sid AS (
  SELECT user_id, ts, value, new_sess,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS s
  FROM marked),
sess AS (
  SELECT user_id, s, epoch_us(max(ts)) - epoch_us(min(ts)) AS dwell_us
  FROM sid GROUP BY user_id, s),
native AS (
  SELECT user_id, count(*) AS sw_n_sessions,
         CAST(sum(dwell_us) AS BIGINT) AS dwell_us
  FROM sess GROUP BY user_id),
lagged AS (
  SELECT user_id, count(*) AS n_events,
         CAST(sum(new_sess) AS BIGINT) AS n_sessions,
         epoch_us(min(ts)) AS first_ts_us, epoch_us(max(ts)) AS last_ts_us,
         round(sum(value), 2) AS sum_value
  FROM sid GROUP BY user_id)
SELECT l.user_id, l.n_events, l.n_sessions, l.first_ts_us, l.last_ts_us,
       l.sum_value, n.sw_n_sessions, n.dwell_us
FROM lagged l JOIN native n ON l.user_id = n.user_id
"""

ROLLING_HOURS = 3


def q_top3_events_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").desc(), F.col("event_id")
    )
    return (
        events.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("event_type", "rk", "event_id", "value")
    )


SQL_TOP3_EVENTS_PER_TYPE = """
SELECT event_type, rk, event_id, value
FROM (
  SELECT event_type, event_id, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value DESC, event_id) AS rk
  FROM events
) WHERE rk <= 3
"""


def q_hourly_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-windowed rollup, tumbling AND sliding in one result: the
    per-(event_type, hour) tumbling aggregate (the batch face of a
    streaming windowed agg) plus the trailing-3h rolling count — a RANGE
    frame over event-time, computed over the tiny hourly aggregate so the
    frame scan never touches raw events (the window's partition key is
    the groupBy key: one shuffle serves both)."""
    events = load_table(spark, sf_dir, "events")
    hour_us = (ntz_micros(F.col("ts")) / 3_600_000_000).cast("bigint")
    hourly = events.groupBy("event_type", hour_us.alias("hour_idx")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("value"), 4).alias("avg_value"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_idx")
        .rangeBetween(-(ROLLING_HOURS - 1), 0)
    )
    return hourly.select(
        "event_type",
        "hour_idx",
        "n",
        "avg_value",
        F.sum("n").over(w).alias("rolling_n"),
    )


SQL_HOURLY_EVENT_ROLLUP = f"""
WITH hourly AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS hour_idx, count(*) AS n,
         round(avg(value), 4) AS avg_value
  FROM events GROUP BY 1, 2)
SELECT event_type, hour_idx, n, avg_value,
       CAST(sum(n) OVER (PARTITION BY event_type ORDER BY hour_idx
                         RANGE BETWEEN {ROLLING_HOURS - 1} PRECEDING
                               AND CURRENT ROW) AS BIGINT) AS rolling_n
FROM hourly
"""


def q_event_value_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dispersion profile per event_type: exact percentiles (Spark
    `percentile` == SQL quantile_cont, linear interpolation; the scale
    path swaps in percentile_approx/t-digest, approximate by design, so
    the exact variant is the oracle-checked one) PLUS the median absolute
    deviation via a GROUPED-AGG pandas UDF — the custom-UDAF surface
    (Arrow batch in, scalar out). MAD = median(|x - median(x)|): a rank
    statistic Catalyst has no builtin for, outlier-robust unlike stddev.
    Oracled against DuckDB's native mad() — both sides sort-and-midpoint
    in float64, so values match bit-for-bit. Spark disallows mixing a
    grouped-agg pandas UDF with native aggregates in one agg(); the MAD
    rides a separate agg joined back on the (few-row) group key."""
    events = load_table(spark, sf_dir, "events")

    @F.pandas_udf("double")
    def mad_udf(v: pd.Series) -> float:
        med = v.median()
        return float((v - med).abs().median())

    base = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95"),
        F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
    )
    mad = events.groupBy("event_type").agg(
        F.round(mad_udf("value"), 6).alias("mad_value")
    )
    return base.join(mad, "event_type")


SQL_EVENT_VALUE_DISPERSION = """
SELECT event_type, count(*) AS n,
       round(quantile_cont(value, 0.5), 4) AS p50,
       round(quantile_cont(value, 0.95), 4) AS p95,
       round(quantile_cont(value, 0.99), 4) AS p99,
       round(mad(value), 6) AS mad_value
FROM events GROUP BY event_type
"""


def q_dedup_events_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window dedup: first event per (user_id, event_type, day) by ts —
    the keep-first idiom over a composite business key."""
    events = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))  # NTZ in, NTZ out: tz-independent
    w = Window.partitionBy("user_id", "event_type", day.alias("day")).orderBy(
        "ts", "event_id"
    )
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type")
    )


SQL_DEDUP_EVENTS_WINDOW = """
SELECT event_id, user_id, event_type
FROM (
  SELECT event_id, user_id, event_type,
         row_number() OVER (PARTITION BY user_id, event_type, date_trunc('day', ts)
                            ORDER BY ts, event_id) AS rn
  FROM events
) WHERE rn = 1
"""


def q_event_type_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations: (user, day) pairs with a purchase but no error that
    day — EXCEPT via left-anti join, the formulation that scales (anti
    join on the grouped keys instead of materializing both distinct sets
    through a union-based EXCEPT)."""
    events = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).alias("day")
    buyers = (
        events.filter(F.col("event_type") == "purchase")
        .select("user_id", day)
        .distinct()
    )
    erroring = (
        events.filter(F.col("event_type") == "error")
        .select("user_id", day)
        .distinct()
    )
    return buyers.join(erroring, ["user_id", "day"], "left_anti").select(
        "user_id", ntz_micros(F.col("day")).alias("day_us")
    )


SQL_EVENT_TYPE_SET_OPS = """
SELECT user_id, epoch_us(day) AS day_us FROM (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day
  FROM events WHERE event_type = 'purchase'
  EXCEPT
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day
  FROM events WHERE event_type = 'error'
)
"""


def q_asof_last_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every event, the timestamp of the user's most
    recent error at-or-before it (operators/asof.py bucketed-builtins
    implementation, checked against DuckDB's native ASOF JOIN)."""
    from fluent_server_spark.operators.asof import asof_join_bucketed

    events = load_table(spark, sf_dir, "events")
    errors = (
        events.filter(F.col("event_type") == "error")
        .select("user_id", "ts")
        .withColumn("last_error_us", ntz_micros(F.col("ts")))
    )
    left = events.select("event_id", "user_id", "ts")
    joined = asof_join_bucketed(
        left, errors, on="ts", by="user_id",
        value_cols=("last_error_us",), bucket="1 hour",
        left_key="event_id",
    )
    return joined.select("event_id", "user_id", "last_error_us")


SQL_ASOF_LAST_ERROR = """
SELECT e.event_id, e.user_id, epoch_us(err.ts) AS last_error_us
FROM events e
ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'error') err
  ON e.user_id = err.user_id AND e.ts >= err.ts
"""


def q_user_journey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user profile — the ROUND-5 MERGE of three per-user-grain
    queries (freeing driver slots for substring_dedup/perplexity_band;
    COVERAGE.md §"50-query surface"), all claims kept live:

    * ordered event reconstruction (the mirror's per-tag append list,
      reference mirror/mirror.go:16): array_sort(collect_list) joined to
      one string — `journey`;
    * heavy-hitter counting via the two-phase SALTED aggregation
      (operators/skew.py::salted_count — the formulation that survives a
      single key holding 30% of 10^12 rows): `n_events` IS the salted
      count, `is_heavy` the HAVING-threshold flag;
    * single-pass ordered-funnel depth (operators/aggregates.py::
      funnel_depth_scan, one keyed exchange + greedy array fold):
      `funnel_depth`.

    All three aggregate on user_id, so the joins are co-partitioned on
    the key they already shuffled on (no extra exchange pattern at
    scale). The un-merge toggle (queries/unmerged.py) re-exposes
    heavy_users and event_funnel_depth as views over this query."""
    from fluent_server_spark.operators.aggregates import funnel_depth_scan
    from fluent_server_spark.operators.skew import salted_count

    events = load_table(spark, sf_dir, "events")
    seq = F.array_sort(
        F.collect_list(F.struct("ts", "event_id", "event_type"))
    )
    journey = events.groupBy("user_id").agg(
        F.array_join(
            F.transform(seq, lambda x: x["event_type"]), "|"
        ).alias("journey"),
    )
    counts = salted_count(events, "user_id", n_salt=16)
    funnel = funnel_depth_scan(events, FUNNEL_STAGES)
    return (
        journey.join(counts, "user_id")
        .join(funnel, "user_id")
        .select(
            "user_id",
            "journey",
            F.col("n").alias("n_events"),
            (F.col("n") >= HEAVY_USER_MIN).alias("is_heavy"),
            "funnel_depth",
        )
    )


# SQL_USER_JOURNEY is built after SQL_EVENT_FUNNEL_DEPTH below (its
# oracle embeds the funnel CTE chain)

HEAVY_USER_MIN = 50


def q_heavy_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter detection via the two-phase SALTED aggregation
    (operators/skew.py): partial count on (key, salt) then final on key —
    the formulation that survives a single key holding 30% of 10^12 rows.
    Oracle: the plain GROUP BY (same result, skew-fragile formulation)."""
    from fluent_server_spark.operators.skew import salted_count

    events = load_table(spark, sf_dir, "events")
    return salted_count(events, "user_id", n_salt=16).filter(
        F.col("n") >= HEAVY_USER_MIN
    )


SQL_HEAVY_USERS = f"""
SELECT user_id, count(*) AS n FROM events
GROUP BY user_id HAVING count(*) >= {HEAVY_USER_MIN}
"""


TAG_ROUTE_RULES: list[tuple[str, str]] = [
    # fluentd-style dotted <match> patterns, first-match-wins
    ("svc.error.**", "sink_err"),
    ("svc.*.0", "sink_zero"),
    ("svc.click.*", "sink_click"),
    ("svc.vi*.2", "sink_view2"),
    ("**", "sink_other"),
]


def q_tagged_route_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Route on COMPOSED DOTTED TAGS (the reference's tag world:
    contrib/js/index.js:4,22 builds `tag_prefix.my_tag`, the mirror keys
    on the full tag, mirror/mirror.go:30-37) with fluentd dot-segment
    wildcards — `a.*` one segment, `a.**` any suffix — compiled into the
    same narrow first-match CASE chain as the main router."""
    from fluent_server_spark.operators.route import compile_tag_routes

    ev = load_table(spark, sf_dir, "events")
    tag = F.concat_ws(
        ".", F.lit("svc"), F.col("event_type"), (F.col("user_id") % 3).cast("string")
    )
    routed = ev.withColumn("sink", compile_tag_routes(tag, TAG_ROUTE_RULES))
    return routed.groupBy("sink").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


def _sql_tagged_route_counts() -> str:
    from fluent_server_spark.operators.route import tag_pattern_regex

    whens = " ".join(
        f"WHEN regexp_matches(tag, '{tag_pattern_regex(pat)}') THEN '{sink}'"
        for pat, sink in TAG_ROUTE_RULES
    )
    return f"""
WITH t AS (
  SELECT concat('svc.', event_type, '.', CAST(user_id % 3 AS VARCHAR)) AS tag,
         user_id
  FROM events),
r AS (SELECT user_id, CASE {whens} END AS sink FROM t)
SELECT sink, count(*) AS n_events, count(DISTINCT user_id) AS n_users
FROM r GROUP BY sink
"""


SQL_TAGGED_ROUTE_COUNTS = _sql_tagged_route_counts()


MAX_CHUNK_TOKENS = 256


def q_packed_training_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: each user's event stream (a conversation's
    turns, in order) split into training chunks of ≤256 token-proxy
    units by prefix sum — chunk = floor(tokens_before / budget). One
    shuffle on the conversation key, a pure function of the input
    (operators/packing.py), so the oracle reproduces identical chunks."""
    from fluent_server_spark.operators.packing import pack_sequences

    ev = load_table(spark, sf_dir, "events")
    tokens = F.length("props") + F.length("event_type")
    return pack_sequences(
        ev,
        key_col="user_id",
        order_cols=["ts", "event_id"],
        tokens_col=tokens,
        max_tokens=MAX_CHUNK_TOKENS,
    )


SQL_PACKED_TRAINING_CHUNKS = f"""
WITH t AS (
  SELECT user_id, ts, event_id,
         length(props) + length(event_type) AS tok
  FROM events),
c AS (
  SELECT user_id, tok,
         CAST(floor(coalesce(sum(tok) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               / {MAX_CHUNK_TOKENS}) AS BIGINT) AS chunk_id
  FROM t)
SELECT user_id, chunk_id, count(*) AS n_rows,
       CAST(sum(tok) AS BIGINT) AS chunk_tokens
FROM c GROUP BY user_id, chunk_id
"""


FUNNEL_STAGES = ["view", "click", "signup", "purchase"]


def q_event_funnel_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel depth per user (view -> click -> signup ->
    purchase, each stage strictly after the earliest completion of the
    previous) — the SINGLE-PASS formulation (one keyed exchange + a
    greedy array fold, operators/aggregates.py::funnel_depth_scan). The
    k-join chain (funnel_depth) survives as the pytest cross-check, and
    the driver oracle replays it as the CTE chain below — three
    independent formulations pinned equal."""
    from fluent_server_spark.operators.aggregates import funnel_depth_scan

    return funnel_depth_scan(load_table(spark, sf_dir, "events"), FUNNEL_STAGES)


def _sql_event_funnel_depth(stages: list[str] = FUNNEL_STAGES) -> str:
    ctes = [
        f"s0 AS (SELECT user_id, min(ts) AS t FROM events "
        f"WHERE event_type = '{stages[0]}' GROUP BY user_id)"
    ]
    for i in range(1, len(stages)):
        ctes.append(
            f"s{i} AS (SELECT e.user_id, min(e.ts) AS t FROM events e "
            f"JOIN s{i - 1} p USING (user_id) "
            f"WHERE e.event_type = '{stages[i]}' AND e.ts > p.t GROUP BY e.user_id)"
        )
    case = "CASE "
    for i in range(len(stages)):
        case += f"WHEN s{i}.user_id IS NULL THEN {i} "
    case += f"ELSE {len(stages)} END"
    joins = " ".join(f"LEFT JOIN s{i} USING (user_id)" for i in range(len(stages)))
    return f"""
WITH {', '.join(ctes)}
SELECT k.user_id, CAST({case} AS INT) AS funnel_depth
FROM (SELECT DISTINCT user_id FROM events) k {joins}
"""


SQL_EVENT_FUNNEL_DEPTH = _sql_event_funnel_depth()

SQL_USER_JOURNEY = f"""
WITH j AS (
  SELECT user_id,
         string_agg(event_type, '|' ORDER BY ts, event_id) AS journey,
         count(*) AS n_events
  FROM events GROUP BY user_id),
f AS ({SQL_EVENT_FUNNEL_DEPTH})
SELECT j.user_id, j.journey, j.n_events,
       j.n_events >= {HEAVY_USER_MIN} AS is_heavy, f.funnel_depth
FROM j JOIN f USING (user_id)
"""


def q_event_cube_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping-sets over (event_type, hour-of-day): all four
    grouping combinations in one pass — partial+final hash aggregation,
    the grouping expansion is map-side."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "hod", F.hour("ts").cast("string")
    )
    return (
        ev.cube("event_type", "hod")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            F.coalesce("hod", F.lit("ALL")).alias("hod"),
            "n",
            "sum_value",
        )
    )


SQL_EVENT_CUBE_STATS = """
SELECT coalesce(event_type, 'ALL') AS event_type,
       coalesce(CAST(hour(ts) AS VARCHAR), 'ALL') AS hod,
       count(*) AS n, round(sum(value), 2) AS sum_value
FROM events GROUP BY CUBE (event_type, CAST(hour(ts) AS VARCHAR))
"""


N_DECILES = 10


def q_user_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User segmentation: ntile deciles by total event value (ties broken
    on user_id so the tiling is a total order), then per-decile size and
    value mass — the cohort/LTV-banding shape. The tiling is the
    DISTRIBUTED exact-ntile (operators/ranking.py: range exchange +
    per-partition row_number + broadcast offsets) — identical semantics
    to `ntile(10) OVER (ORDER BY ...)` with no single-partition global
    sort anywhere in the plan."""
    from fluent_server_spark.operators.ranking import with_global_ntile

    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.round(F.sum("value"), 2).alias("total_value")
    )
    tiled = with_global_ntile(
        per_user, N_DECILES, [F.desc("total_value"), F.asc("user_id")], out="decile"
    )
    return tiled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.round(F.sum("total_value"), 2).alias("decile_value"),
    )


SQL_USER_VALUE_DECILES = f"""
WITH pu AS (SELECT user_id, round(sum(value), 2) AS total_value
            FROM events GROUP BY user_id),
d AS (SELECT ntile({N_DECILES}) OVER (ORDER BY total_value DESC, user_id ASC) AS decile,
             total_value
      FROM pu)
SELECT decile, count(*) AS n_users, round(sum(total_value), 2) AS decile_value
FROM d GROUP BY decile
"""


N_WINDOWS, WINDOW_STRIDE_H, WINDOW_LEN_H = 60, 5, 7  # overlapping by 2h


def q_event_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) join: per overlapping 7h window (stride 5h — an
    event can match two windows), the count and value mass of events
    inside it. A raw ts>=start AND ts<end join would plan as
    BroadcastNestedLoopJoin (O(n·m)); operators/rangejoin.py turns it
    into a bucket equi-join with a residual filter — the plan audit pins
    BroadcastHashJoin and forbids the nested loop."""
    from fluent_server_spark.operators.rangejoin import interval_join

    ev = load_table(spark, sf_dir, "events")
    t0 = F.lit("2024-01-01 00:00:00").cast("timestamp_ntz")
    windows = spark.range(N_WINDOWS).select(
        F.col("id").cast("int").alias("w_id"),
        F.timestamp_add("HOUR", (F.col("id") * WINDOW_STRIDE_H).cast("int"), t0).alias(
            "w_start"
        ),
        F.timestamp_add(
            "HOUR", (F.col("id") * WINDOW_STRIDE_H + WINDOW_LEN_H).cast("int"), t0
        ).alias("w_end"),
    )
    return (
        interval_join(ev, windows, "ts", "w_start", "w_end")
        .groupBy("w_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


SQL_EVENT_WINDOW_STATS = f"""
WITH w AS (
  SELECT CAST(r AS INT) AS w_id,
         TIMESTAMP '2024-01-01 00:00:00' + r * INTERVAL {WINDOW_STRIDE_H} HOUR AS s,
         TIMESTAMP '2024-01-01 00:00:00' + r * INTERVAL {WINDOW_STRIDE_H} HOUR
           + INTERVAL {WINDOW_LEN_H} HOUR AS e
  FROM range({N_WINDOWS}) t(r))
SELECT w_id, count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM w JOIN events ON ts >= s AND ts < e
GROUP BY w_id
"""


def q_event_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: pull `k` out of the props JSON column
    (the reference's schemaless record map, message/entry.go:30-33, as a
    typed column) and aggregate — JSON path evaluation is native Catalyst
    (get_json_object), narrow, codegen. spread() (r6): the JSON parse is
    the whole cost and a single-row-group events file runs it on ONE
    task (measured 2.4 s -> 1.4 s at sf1.0/local[32]); every aggregate
    here is integer-exact (count/min/max/countDistinct/avg over int), so
    partitioning cannot perturb the values. min_bytes gates the
    exchange to inputs where the serial parse actually dominates
    (below ~8 MB the exchange costs more than it buys — measured
    +0.27 s at sf0.1)."""
    ev = spread(load_table(spark, sf_dir, "events"), min_bytes=8 << 20)
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.countDistinct("k").alias("n_distinct_k"),
        F.round(F.avg("k"), 4).alias("avg_k"),
    )


SQL_EVENT_PROPS_STATS = """
SELECT event_type, count(*) AS n,
       min(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
       max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k,
       count(DISTINCT CAST(json_extract_string(props, '$.k') AS INT)) AS n_distinct_k,
       round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 4) AS avg_k
FROM events GROUP BY event_type
"""


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-sequence transition matrix: counts of (previous
    event_type -> event_type) over each user's ts-ordered stream — the
    Markov/session-flow analytic. One window (lag) over the per-user
    order + one aggregation; the first event of each user has no
    predecessor and is excluded on both engines."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


SQL_EVENT_TRANSITIONS = """
WITH t AS (
  SELECT event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events)
SELECT prev_type, event_type, count(*) AS n
FROM t WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type
"""


QUERIES: dict[str, QuerySpec] = {
    "route_events": QuerySpec(q_route_events, SQL_ROUTE_EVENTS),
    "event_window_stats": QuerySpec(q_event_window_stats, SQL_EVENT_WINDOW_STATS),
    "event_props_stats": QuerySpec(q_event_props_stats, SQL_EVENT_PROPS_STATS),
    "event_transitions": QuerySpec(q_event_transitions, SQL_EVENT_TRANSITIONS),
    "event_cube_stats": QuerySpec(q_event_cube_stats, SQL_EVENT_CUBE_STATS),
    "user_value_deciles": QuerySpec(q_user_value_deciles, SQL_USER_VALUE_DECILES),
    "packed_training_chunks": QuerySpec(
        q_packed_training_chunks, SQL_PACKED_TRAINING_CHUNKS
    ),
    # event_funnel_depth and heavy_users merged into user_journey in r5
    # (their functions remain as pytest cross-checks; the un-merge
    # toggle re-exposes them as driver-checkable views)
    "tagged_route_counts": QuerySpec(q_tagged_route_counts, SQL_TAGGED_ROUTE_COUNTS),
    "asof_last_error": QuerySpec(q_asof_last_error, SQL_ASOF_LAST_ERROR),
    "user_journey": QuerySpec(q_user_journey, SQL_USER_JOURNEY),
    "event_value_dispersion": QuerySpec(
        q_event_value_dispersion, SQL_EVENT_VALUE_DISPERSION
    ),
    "dedup_events_window": QuerySpec(q_dedup_events_window, SQL_DEDUP_EVENTS_WINDOW),
    "event_type_set_ops": QuerySpec(q_event_type_set_ops, SQL_EVENT_TYPE_SET_OPS),
    "routed_event_counts": QuerySpec(q_routed_event_counts, SQL_ROUTED_EVENT_COUNTS),
    "user_session_stats": QuerySpec(q_user_session_stats, SQL_USER_SESSION_STATS),
    "top3_events_per_type": QuerySpec(q_top3_events_per_type, SQL_TOP3_EVENTS_PER_TYPE),
    "hourly_event_rollup": QuerySpec(q_hourly_event_rollup, SQL_HOURLY_EVENT_ROLLUP),
}
