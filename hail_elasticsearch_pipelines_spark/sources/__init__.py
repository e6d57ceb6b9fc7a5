"""Corpus sources: synthetic generator + table readers."""
