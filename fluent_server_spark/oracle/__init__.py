from fluent_server_spark.oracle.pandas_oracle import (  # noqa: F401
    oracle_conversation_stats,
    oracle_pipeline,
    oracle_routed_counts,
    oracle_tool_histogram,
)
