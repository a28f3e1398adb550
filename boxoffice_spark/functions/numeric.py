"""Deterministic numeric aggregation helpers.

Floating-point sums depend on accumulation order, and Spark's partial
aggregation order is nondeterministic across partitionings — so a plain
``sum(double)`` is not reproducible bit-for-bit, which breaks value-hash
comparison against any oracle. The fix: sum in fixed-point decimal (exact,
order-independent) and cast the final result back to double. Overhead is a
per-row cast; the aggregation stays JVM-side and partial (map-side combine
still applies).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# precision 27 + 10 digits of headroom Spark adds for sum() keeps us inside
# decimal(38,_) even at 100 TB row counts (1e12 rows x 1e9 magnitude).
_PREC = 27


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Order-independent sum of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({_PREC},{scale})")).cast("double")


def dsum_sql(expr: str, scale: int = 2) -> str:
    """The DuckDB-equivalent SQL text of :func:`dsum` (for oracle strings)."""
    return f"cast(sum(cast(({expr}) as decimal({_PREC},{scale}))) as double)"


def davg(col: Column | str, scale: int = 6) -> Column:
    """Order-independent mean: exact decimal sum divided by count, in double."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale) / F.count(c)


def davg_sql(expr: str, scale: int = 6) -> str:
    return f"({dsum_sql(expr, scale)} / count({expr}))"
