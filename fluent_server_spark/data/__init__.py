from fluent_server_spark.data.synth import (  # noqa: F401
    ROLE_TOOL_LOOKUP_ROWS,
    ROUTE_RULE_ROWS,
    lookup_df,
    route_rules_df,
    synth_turns_pandas,
    synth_turns_spark,
)
