"""Composite operators (upsert, fuzzy join, dedup, similarity, text)."""
