from .census import stream_census_pipeline  # noqa: F401
from .ingest import (  # noqa: F401
    bloom_ingest_stream,
    dedup_ingest_stream,
    replay_bloom_batches,
    replay_ingest_batches,
    replay_split_batches,
    split_ingest_stream,
)
from .sketches import cms_stream, hll_stream, ivf_ingest_stream  # noqa: F401
from .stateful import (  # noqa: F401
    dedup_stream,
    dedup_stream_tws,
    user_running_totals_stream,
    user_running_totals_tws,
)
from .events import (  # noqa: F401
    correlate_streams,
    enrich_stream,
    hourly_windows,
    read_events_stream,
    session_windows,
    sliding_windows,
)
