"""Registered query definitions — one module per SURVEY.md §2 family."""
