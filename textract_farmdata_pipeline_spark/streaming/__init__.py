from .census import stream_census_pipeline  # noqa: F401
from .stateful import dedup_stream, user_running_totals_stream  # noqa: F401
from .events import (  # noqa: F401
    hourly_windows,
    read_events_stream,
    session_windows,
    sliding_windows,
)
