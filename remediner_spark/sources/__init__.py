"""Corpus generation and table readers."""
