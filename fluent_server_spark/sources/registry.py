"""Source-format strategy — the reader-plugin surface.

The reference makes the whole decode strategy swappable via a
MessagesReader factory (reference: options/options.go:29-35, default impl
defaultreader/reader.go:24-36, dummy test impl session_test.go:72-122).
Here the same seam is the source registry: each source turns a location
string into the canonical `turns` DataFrame; the pipeline is agnostic.

All sources apply the fixed input schema (BASELINE.json input_hint) so a
schema drift fails at the boundary, not mid-pipeline — the batch
equivalent of the wire decoder owning the format.

`iceberg` needs the runtime jars on the classpath (not in this sandbox);
it is registered behind an import/config probe and raises a clear error
otherwise. Parquet-dir layout is bit-compatible with what the pipeline's
sink writer produces, so engine output can feed engine input.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TURNS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)
_COLS = [f.name for f in TURNS_SCHEMA.fields]


def _cast(df: DataFrame) -> DataFrame:
    missing = set(_COLS) - set(df.columns)
    if missing:
        raise ValueError(f"turns source missing columns: {sorted(missing)}")
    from pyspark.sql import functions as F

    return df.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in TURNS_SCHEMA.fields]
    )


def src_parquet(spark: SparkSession, location: str) -> DataFrame:
    return _cast(spark.read.parquet(location))


def src_csv(spark: SparkSession, location: str) -> DataFrame:
    # explicit schema — never inferSchema in a production scan
    return _cast(
        spark.read.schema(TURNS_SCHEMA).option("header", "true").csv(location)
    )


def src_json(spark: SparkSession, location: str) -> DataFrame:
    return _cast(spark.read.schema(TURNS_SCHEMA).json(location))


def src_orc(spark: SparkSession, location: str) -> DataFrame:
    """ORC dir — the other columnar format Spark ships natively; same
    pushdown/pruning story as parquet (predicate pushdown into ORC
    stripe/row-group indexes)."""
    return _cast(spark.read.orc(location))


def src_avro(spark: SparkSession, location: str) -> DataFrame:
    """Avro dir — the row format log shippers commonly hand off.
    Requires the external spark-avro module; fails with an actionable
    message when the jar is absent (same contract as iceberg)."""
    try:
        return _cast(spark.read.format("avro").load(location))
    except Exception as e:
        # only rewrap the MISSING-MODULE failure; a bad path / corrupt
        # file must keep its own error, not a misleading packaging hint
        msg = str(e)
        if "Failed to find data source" in msg or (
            "avro" in msg.lower() and "ClassNotFound" in msg
        ):
            raise RuntimeError(
                "avro source needs the spark-avro module on the classpath "
                "(spark-submit --packages org.apache.spark:spark-avro_2.13:"
                "<spark-version>); use source=parquet or orc in-sandbox"
            ) from e
        raise


def src_iceberg(spark: SparkSession, location: str) -> DataFrame:
    """Iceberg table (catalog.db.table). Requires iceberg-spark-runtime
    jars; the design target (hidden partitioning, snapshot isolation,
    incremental scan) — parquet-dir stands in locally."""
    try:
        return _cast(spark.read.format("iceberg").load(location))
    except Exception as e:  # jar missing -> actionable message
        raise RuntimeError(
            "iceberg source needs iceberg-spark-runtime on the classpath "
            "(spark-submit --packages org.apache.iceberg:iceberg-spark-"
            "runtime-4.0_2.13:<version>); use source=parquet in-sandbox"
        ) from e


def src_synthetic(spark: SparkSession, location: str) -> DataFrame:
    """location = '<n_rows>[:<n_convs>]' — deterministic generator."""
    parts = location.split(":")
    n_rows = int(parts[0])
    n_convs = int(parts[1]) if len(parts) > 1 else max(n_rows // 100, 1)
    from fluent_server_spark.data.synth import synth_turns_spark

    return synth_turns_spark(spark, n_rows, n_convs=n_convs)


def src_fluent_file(spark: SparkSession, location: str) -> DataFrame:
    """Fluent-forward spool files (the reference's wire format at rest:
    concatenated msgpack [time, record] entries, EventTime ext(0),
    optional gzip — defaultreader/reader.go:51-77, message/time.go:31-53).
    Entry records carry the turn fields; the entry time is `ts`."""
    from pyspark.sql import functions as F

    from fluent_server_spark.sources.fluentfile import read_spool_files

    raw = read_spool_files(spark, location)
    return _cast(
        raw.select(
            F.col("record")["conv_id"].alias("conv_id"),
            F.col("record")["turn_idx"].alias("turn_idx"),
            F.col("record")["role"].alias("role"),
            F.col("record")["text"].alias("text"),
            F.col("record")["tool"].alias("tool"),
            F.col("ts").alias("ts"),
        )
    )


SOURCES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "parquet": src_parquet,
    "csv": src_csv,
    "json": src_json,
    "orc": src_orc,
    "avro": src_avro,
    "iceberg": src_iceberg,
    "synthetic": src_synthetic,
    "fluent-file": src_fluent_file,
}


def load_turns(spark: SparkSession, source: str, location: str) -> DataFrame:
    if source not in SOURCES:
        raise ValueError(f"unknown source {source!r}; have {sorted(SOURCES)}")
    return SOURCES[source](spark, location)
