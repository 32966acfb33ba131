"""Streaming-shaped operators.

The reference is batch-only (SURVEY.md §2.12) — no watermarks or stateful
streaming anywhere in nama. This module provides the event-time operators a
pipeline at this scale still needs, written so the SAME transformation runs in
both batch and Structured Streaming (the functions take any DataFrame;
``readStream`` + ``writeStream`` wire-up is the caller's five lines).
"""

from nama_spark.streaming.dedup import (  # noqa: F401
    load_band_index,
    streaming_dedup_corpus,
)
from nama_spark.streaming.er import (  # noqa: F401
    load_state,
    streaming_unite_names,
)
from nama_spark.streaming.stateful import (  # noqa: F401
    sessionize_capped,
    sessionize_capped_sql,
    streaming_sessionize_capped,
)
from nama_spark.streaming.windows import (  # noqa: F401
    event_time_aggregate,
    sessionize,
    sessionize_window,
    streaming_dedup_key,
    streaming_event_time_aggregate,
    streaming_sessionize,
)
