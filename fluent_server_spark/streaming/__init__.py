from fluent_server_spark.streaming.stream_pipeline import (  # noqa: F401
    run_stream_once,
    stream_routed,
    windowed_sink_counts,
)
