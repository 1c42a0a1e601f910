from fluent_server_spark.sources.registry import SOURCES, load_turns  # noqa: F401
