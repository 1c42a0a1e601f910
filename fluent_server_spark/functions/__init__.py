from fluent_server_spark.functions.parse import (  # noqa: F401
    GROK_PATTERN,
    PARSED_SCHEMA,
    parse_turns,
    parse_turns_native,
    parse_turns_pandas,
)
