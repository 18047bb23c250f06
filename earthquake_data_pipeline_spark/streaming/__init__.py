from .incremental import (
    foreach_batch_merge,
    streaming_dedup,
    windowed_event_counts,
)

__all__ = ["foreach_batch_merge", "streaming_dedup", "windowed_event_counts"]
