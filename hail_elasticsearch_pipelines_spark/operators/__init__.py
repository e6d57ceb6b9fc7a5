"""Distributed operators: index build/merge, BM25 query, dedup, ANN."""
