"""Structured Streaming wrappers for the KG-construction pipeline."""

from .stateful import first_seen_pages
from .stream import (
    PAGES_SCHEMA,
    stream_pages_to_triples,
    streaming_dedup_pages,
    windowed_crawl_stats,
)

__all__ = [
    "PAGES_SCHEMA",
    "first_seen_pages",
    "stream_pages_to_triples",
    "streaming_dedup_pages",
    "windowed_crawl_stats",
]
