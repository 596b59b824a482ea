"""Structured Streaming wrappers for the KG-construction pipeline, plus
the bounded-memory per-document streaming reader (SURVEY §2.9)."""

from .reader import make_streaming_pages_to_triples, stream_doc_quads
from .stateful import first_seen_pages, streaming_near_dup_pages
from .stream import (
    PAGES_SCHEMA,
    stream_pages_to_triples,
    streaming_dedup_pages,
    windowed_crawl_stats,
)

__all__ = [
    "PAGES_SCHEMA",
    "first_seen_pages",
    "make_streaming_pages_to_triples",
    "stream_doc_quads",
    "stream_pages_to_triples",
    "streaming_dedup_pages",
    "streaming_near_dup_pages",
    "windowed_crawl_stats",
]
