"""Structured Streaming wrappers for the KG-construction pipeline."""

from .stream import (
    PAGES_SCHEMA,
    stream_pages_to_triples,
    streaming_dedup_pages,
    windowed_crawl_stats,
)

__all__ = [
    "PAGES_SCHEMA",
    "stream_pages_to_triples",
    "streaming_dedup_pages",
    "windowed_crawl_stats",
]
