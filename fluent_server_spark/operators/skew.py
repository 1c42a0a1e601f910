"""Skew handling for hot conversations.

The fixture (and real transcript corpora) have hot keys: one conversation
holding ~30% of turns. A plain hash(conv_id) partitioning puts 30% of the
table in one task. Two mitigations, composable:

* AQE skew-join/partition splitting (`spark.sql.adaptive.*`, on in our
  session) — runtime, free.
* Explicit salting (this module) — for deterministic layout at write
  time and for groupBys AQE can't split (single hot group): a two-phase
  aggregate over a salted key, then re-aggregate.

`salted_bucket` is also the sink partitioning column: files are laid out
by pmod(hash(conv_id), B) with hot keys spread across salts, which keeps
every output file bounded at 10^12-turn scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_bucket(
    conv_col: Column, turn_col: Column, n_buckets: int, n_salt: int = 8
) -> Column:
    """pmod(hash(conv_id), B) with the salt folding in turn_idx.

    Salt = pmod(hash(conv_id, turn_idx), n_salt): rows of a hot
    conversation spread over n_salt buckets; cold conversations still
    co-locate (salt is a deterministic function of the row, so re-runs
    write identical layouts — required for idempotent resume).
    """
    base = F.pmod(F.hash(conv_col), F.lit(n_buckets // n_salt or 1))
    salt = F.pmod(F.hash(conv_col, turn_col), F.lit(n_salt))
    return (base * n_salt + salt).cast("int")


def salted_count(
    df: DataFrame, key: str, n_salt: int = 16, count_alias: str = "n"
) -> DataFrame:
    """Two-phase count for skewed keys: partial agg on (key, salt) — the
    hot key becomes n_salt map-side groups — then final agg on key.
    Shuffle rows: n_keys * n_salt, independent of input size.

    Salt = row hash over ALL columns: deterministic per row, so a
    partial-stage task retry re-produces byte-identical partial counts
    (monotonically_increasing_id would not — it varies across retries;
    the final re-aggregation made that correct but not byte-stable)."""
    salt = F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salt))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    return partial.groupBy(key).agg(F.sum("_partial").alias(count_alias))


def key_skew_stats(
    df: DataFrame,
    key_col: str,
    top_n: int = 10,
) -> DataFrame:
    """Shuffle-key skew diagnostics: the measurement that decides
    WHETHER the salting above (or AQE skew split) is needed before a
    groupBy/join on `key_col`. Returns the top_n heaviest keys as
    (rank, key, cnt, share, n_keys, total_rows) — `share` is the
    fraction of all rows on that key, the number you compare against
    1/parallelism to see if one task will straggle.

    Scale shape: one keyed count aggregation (map-side partial), a
    one-row total (broadcast), and a top-N via orderBy().limit() —
    Catalyst plans that as TakeOrderedAndProject, never a global sort.
    The rank window runs over the already-collected top_n rows (tiny).
    Fully SQL-replayable (pre-staged `event_key_skew` oracle pair)."""
    from pyspark.sql import Window

    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    total = counts.agg(
        F.sum("cnt").alias("total_rows"), F.count(F.lit(1)).alias("n_keys")
    )
    top = counts.orderBy(F.col("cnt").desc(), F.col("key")).limit(top_n)
    w = Window.orderBy(F.col("cnt").desc(), F.col("key"))  # top_n rows only
    return (
        top.crossJoin(F.broadcast(total))
        .withColumn("rank", F.row_number().over(w))
        .select(
            "rank",
            "key",
            "cnt",
            F.round(F.col("cnt") / F.col("total_rows"), 6).alias("share"),
            "n_keys",
            "total_rows",
        )
    )
