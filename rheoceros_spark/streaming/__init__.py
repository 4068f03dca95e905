from rheoceros_spark.streaming.routing import Route, RoutingTable, RuntimeLinkNode  # noqa: F401
