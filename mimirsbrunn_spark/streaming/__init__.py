from .ingest import incremental_ingest_stream  # noqa: F401
