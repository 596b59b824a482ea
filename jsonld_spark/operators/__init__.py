"""Relational operators over the triples DataFrame."""
