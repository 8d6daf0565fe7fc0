from .events import (  # noqa: F401
    interval_join,
    load_events_stream,
    run_stream_to_memory,
    session_window_agg,
    sessionize_batch,
    sessionize_stateful,
    stream_dedup,
    stream_static_enrich,
    windowed_event_agg,
)
