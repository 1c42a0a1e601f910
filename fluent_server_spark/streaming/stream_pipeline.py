"""Structured Streaming face of the pipeline.

The reference IS a streaming system (TCP sessions feeding a handler,
reference: server/server.go:97-115, message/session.go:65-77); our north
rule makes batch-over-Iceberg primary, but the same transform graph runs
unchanged under readStream — this module proves it:

* source: file stream over a turns directory (new parquet files play the
  role of new fluent-forward connections; on a real deployment this is
  Kafka or an Iceberg streaming read);
* transform: the IDENTICAL parse -> enrich -> route used in batch
  (plans/pipeline.py transform is reused verbatim — one code path, two
  execution modes);
* sinks: foreachBatch writing the same partitioned layout (exactly-once
  per micro-batch via the batch writer's dynamic overwrite + epoch id),
  or a memory sink for tests;
* late data: watermark on ts + windowed per-sink counts — the aggregate
  the mirror served over HTTP (mirror/mirror.go:41-47), continuously
  maintained.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fluent_server_spark.data.synth import ROUTE_RULE_ROWS, lookup_df
from fluent_server_spark.functions.parse import parse_turns
from fluent_server_spark.operators.enrich import enrich_turns
from fluent_server_spark.operators.route import route_turns, rules_from_rows

TURNS_DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def stream_routed(
    spark: SparkSession,
    source_dir: str,
    parse_impl: str = "native",
    max_files_per_trigger: int = 4,
) -> DataFrame:
    """readStream over a turns dir -> the same routed DataFrame as batch."""
    stream = (
        spark.readStream.schema(TURNS_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    parsed = parse_turns(stream, impl=parse_impl)
    enriched = enrich_turns(parsed, lookup_df(spark))
    return route_turns(enriched, rules_from_rows(ROUTE_RULE_ROWS))


def stream_spool_routed(
    spark: SparkSession,
    spool_dir: str,
    parse_impl: str = "native",
    max_files_per_trigger: int = 4,
    recursive: bool = False,
) -> DataFrame:
    """Tail a LIVE fluentd spool directory as a stream: each new spool
    file (a rotated per-tag chunk of concatenated msgpack entries — the
    reference's PackedForward blob at rest, defaultreader/reader.go:51-77)
    plays the role of a new forward connection. binaryFile file-stream ->
    the same Arrow-batched msgpack decode as batch (sources/fluentfile.py)
    -> the IDENTICAL parse/enrich/route transform. This is the closest a
    batch-first engine gets to the reference's accept loop: at-least-once
    per file, upgraded to exactly-once per micro-batch by the sink writer.

    `recursive=True` loads `spool_dir` ITSELF with recursiveFileLookup —
    required when tailing a LIVE spool written with
    ForwardServer(hidden_active=True): underscore-prefixed active-segment
    dirs are then filtered as hidden CHILDREN of the listing root,
    whereas a glob like `spool/*` expands them into listing ROOTS, which
    bypass Spark's hidden-path filter — the stream would list a file the
    seal-rename then deletes (FAILED_READ.FILE_NOT_EXIST, found in the
    live-edge e2e test).
    """
    turns = stream_spool_turns(spark, spool_dir, max_files_per_trigger, recursive)
    parsed = parse_turns(turns, impl=parse_impl)
    enriched = enrich_turns(parsed, lookup_df(spark))
    return route_turns(enriched, rules_from_rows(ROUTE_RULE_ROWS))


def stream_spool_turns(
    spark: SparkSession,
    spool_dir: str,
    max_files_per_trigger: int = 4,
    recursive: bool = False,
) -> DataFrame:
    """The decoded TURNS stream of a spool tail (the shared front half of
    stream_spool_routed): binaryFile file-stream -> Arrow-batched msgpack
    decode -> the canonical turns schema. Feed it to any batch transform
    via foreachBatch (see stream_spool_into_snapshots)."""
    src = (
        spark.readStream.format("binaryFile")
        # binaryFile's schema is fixed, but a STREAMING source requires
        # it stated explicitly (no inference on unbounded input)
        .schema(
            "path string, modificationTime timestamp, length long, content binary"
        )
        .option("maxFilesPerTrigger", max_files_per_trigger)
    )
    if recursive:
        src = src.option("recursiveFileLookup", "true")
    files = src.load(spool_dir).select("path", "content")
    from fluent_server_spark.sources.fluentfile import decode_files_df

    decoded = decode_files_df(files)
    return decoded.select(
        F.col("record")["conv_id"].alias("conv_id"),
        F.col("record")["turn_idx"].cast("int").alias("turn_idx"),
        F.col("record")["role"].alias("role"),
        F.col("record")["text"].alias("text"),
        F.col("record")["tool"].alias("tool"),
        F.col("ts").cast("timestamp").alias("ts"),
    )


def stream_spool_into_snapshots(
    spark: SparkSession,
    spool_dir: str,
    pipeline,
    checkpoint_dir: str,
    max_files_per_trigger: int = 4,
    recursive: bool = False,
):
    """LIVE WIRE -> SNAPSHOT TABLE: tail a forward-daemon spool and run
    the FULL batch pipeline (parse -> enrich -> route -> partitioned
    write + manifest commit) per micro-batch epoch, run_id = the epoch
    id — the spool-source twin of stream_into_snapshots with the same
    exactly-once story (a replayed epoch re-runs under the SAME run_id,
    and the batch writer skips acked groups). The landed table has the
    full snapshot surface: read_appended() union-of-epochs, per-epoch
    time travel, MERGE/DELETE/compaction.

    Returns the started StreamingQuery (caller drains and stops — the
    live-edge CLI's drain story applies: stop intake, seal the tail
    segment, processAllAvailable, stop)."""
    if not pipeline.config.snapshots:
        raise ValueError(
            "stream_spool_into_snapshots requires PipelineConfig("
            "snapshots=True): appended epochs need run-scoped dirs"
        )
    turns = stream_spool_turns(spark, spool_dir, max_files_per_trigger, recursive)

    def write_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        pipeline.run(batch_df, run_id=f"epoch-{epoch_id:06d}")

    return (
        turns.writeStream.foreachBatch(write_epoch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def windowed_sink_counts(
    routed: DataFrame, window: str = "1 minute", watermark: str = "2 minutes"
) -> DataFrame:
    """Watermarked per-(window, sink) counts — late rows beyond the
    watermark are dropped from the aggregate, the streaming analogue of
    the mirror's always-growing per-tag counters."""
    return (
        routed.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "sink")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.approx_count_distinct("conv_id").alias("n_convs_approx"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "sink",
            "n_turns",
            "n_convs_approx",
        )
    )


def run_stream_once(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    queryName: str = "fss_stream",
    mode: str = "append",
    aggregated: bool = False,
) -> DataFrame:
    """Drive the stream to completion over currently-available files
    (processAllAvailable) into a memory sink; returns the result table.

    Test harness — production would writeStream.foreachBatch into the
    partitioned sink layout with the batch writer."""
    routed = stream_routed(spark, source_dir)
    out = (
        windowed_sink_counts(routed)
        if aggregated
        else routed.select("conv_id", "turn_idx", "text", "sink")
    )
    q = (
        out.writeStream.outputMode(mode)
        .format("memory")
        .queryName(queryName)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {queryName}")


def stream_into_snapshots(
    spark: SparkSession,
    source_dir: str,
    pipeline,
    checkpoint_dir: str,
    max_files_per_trigger: int = 4,
):
    """Streaming ingest INTO the snapshot table: every micro-batch runs
    the full batch pipeline (parse -> enrich -> route -> partitioned
    write + manifest commit) as its own run, run_id = the epoch id.

    Exactly-once end-to-end: Structured Streaming's checkpoint replays a
    failed epoch with the SAME epoch id, and the batch writer skips
    groups already acked under that run_id — the replay is a no-op, not
    a duplicate. Read the table with `pipeline.read_appended()` (each
    epoch is an immutable increment; `as_of_run="epoch-..."` gives
    per-epoch time travel).

    Returns the started StreamingQuery (caller stops it).
    """
    if not pipeline.config.snapshots:
        raise ValueError(
            "stream_into_snapshots requires PipelineConfig(snapshots=True): "
            "appended epochs need run-scoped dirs"
        )
    stream = (
        spark.readStream.schema(TURNS_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    def write_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        pipeline.run(batch_df, run_id=f"epoch-{epoch_id:06d}")

    return (
        stream.writeStream.foreachBatch(write_epoch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
