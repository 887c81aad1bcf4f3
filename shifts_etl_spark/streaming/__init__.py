from .drift import streaming_value_psi  # noqa: F401
from .micro_batch import stream_etl, streaming_event_counts  # noqa: F401
from .stateful import run_streaming_sessionize, streaming_sessionize  # noqa: F401
