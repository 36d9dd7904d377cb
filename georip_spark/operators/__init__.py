"""Spark operators: tiling, spatial joins, kNN, dedup, text, similarity."""
