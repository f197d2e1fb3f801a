from .ingest import incremental_ingest_stream  # noqa: F401
from .sessions import (  # noqa: F401
    stateful_sessionize_stream,
    windowed_event_counts,
)
from .joins import stream_click_view_join  # noqa: F401
