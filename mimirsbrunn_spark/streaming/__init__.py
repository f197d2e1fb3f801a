from .ingest import (  # noqa: F401
    deduped_event_ingest_stream,
    incremental_ingest_stream,
)
from .sessions import (  # noqa: F401
    stateful_sessionize_stream,
    windowed_event_counts,
)
from .joins import stream_click_view_join  # noqa: F401
from .serving import reverse_geocode_stream  # noqa: F401
