"""Streaming layer.

The reference's "streaming" is whole-snapshot replacement per push with
an all-sources barrier + FIFO buffering (SURVEY.md §2.A4-A6) — we model
that as ordered snapshot-batch processing (snapshots.py). True
event-stream processing (Kafka-style) is Structured Streaming
(windows.py).
"""

from .dedup import content_keyed, streaming_exact_dedup  # noqa: F401
from .microbatch import MicroBatchMappingRunner  # noqa: F401
from .snapshots import SnapshotRunner  # noqa: F401
