from .micro_batch import stream_etl, streaming_event_counts  # noqa: F401
