from rheoceros_spark.streaming.routing import Route, RoutingTable, RuntimeLinkNode  # noqa: F401
from rheoceros_spark.streaming.stream import (  # noqa: F401
    partition_overwrite_sink,
    sessionize,
    stream_audio_dedup_gate,
    stream_bloom_gate,
    stream_image_dedup_gate,
    stream_dedup,
    stream_html_extract,
    stream_intradoc_line_dedup,
    stream_robots_gate,
    stream_source,
    windowed_aggregate,
)
