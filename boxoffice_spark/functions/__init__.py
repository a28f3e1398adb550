"""Scalar expression library (SURVEY.md §2.8).

All JVM-side Column expressions — no Python UDFs in this package. Each
helper mirrors a reference semantic (cited in its docstring) as a
composable Catalyst expression.
"""

from boxoffice_spark.functions.cleaning import (
    bucketize,
    coercive_cast,
    normalize_title,
    snake_case,
    strip_brackets,
    truncate_ellipsis,
)
from boxoffice_spark.functions.numeric import dsum, dsum_sql

__all__ = [
    "bucketize",
    "coercive_cast",
    "normalize_title",
    "snake_case",
    "strip_brackets",
    "truncate_ellipsis",
    "dsum",
    "dsum_sql",
]
