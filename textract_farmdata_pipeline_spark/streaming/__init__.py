from .census import stream_census_pipeline  # noqa: F401
from .events import (  # noqa: F401
    hourly_windows,
    read_events_stream,
    session_windows,
    sliding_windows,
)
