from fmx.streaming.ops import (  # noqa: F401
    read_events_stream,
    sessionize_stream,
    stream_dedup,
    stream_kmv_state,
    stream_tumbling_agg,
    user_running_totals,
)
