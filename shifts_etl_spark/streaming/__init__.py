from .drift import streaming_value_psi  # noqa: F401
from .micro_batch import (  # noqa: F401
    stream_etl,
    streaming_blocklist_scrub,
    streaming_event_counts,
)
from .stateful import run_streaming_sessionize, streaming_sessionize  # noqa: F401
