from fluent_server_spark.operators.enrich import enrich_turns  # noqa: F401
from fluent_server_spark.operators.route import RouteRule, compile_routes, route_turns  # noqa: F401
