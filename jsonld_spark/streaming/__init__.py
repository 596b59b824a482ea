"""Structured Streaming wrappers for the KG-construction pipeline."""

from .stream import (
    PAGES_SCHEMA,
    stream_pages_to_triples,
    streaming_dedup_pages,
)

__all__ = ["PAGES_SCHEMA", "stream_pages_to_triples", "streaming_dedup_pages"]
