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


# ---------------------------------------------------------------------------
# Engine-build-proof final projections (COVERAGE.md parity rule 4).
#
# ``round(double, k)`` is NOT a single IEEE-754 operation: engines implement
# it as scaled-multiply, string formatting, or BigDecimal arithmetic, and the
# implementations disagree by one ulp across builds of the SAME engine — the
# round-7 driver reds were exactly this class. Two rule-based replacements,
# both pinned to constructs whose cross-build semantics never vary:


def dec6(col: Column) -> Column:
    """Final-cell rounding for IRRATIONAL double chains (sqrt / z-score):
    one cast to DECIMAL(27,6). Both Spark (BigDecimal HALF_UP) and DuckDB
    (half away from zero) round a double to the NEAREST scale-6 decimal, and
    ties need an exact dyadic 6dp midpoint (j/2^7-shaped values) that a
    full-mantissa sqrt output hits with probability ~2^-45. The hash then
    compares exact decimals, immune to one-ulp build drift in round()."""
    return col.cast("decimal(27,6)")


def dec6_sql(expr: str) -> str:
    """DuckDB twin of :func:`dec6`."""
    return f"CAST(({expr}) AS DECIMAL(27,6))"


def ratio6(num: str, den: str) -> Column:
    """Final-cell rounding for INTEGER-RATIO cells (rates, p-values), where
    exact 6dp grid midpoints ARE reachable (denominator 2^7*5^m) and a
    nearest-cast's tie rule would decide the cell. HALF_UP entirely in
    BIGINT: micro = (2*num*1e6 + den) div (2*den), then ONE correctly-rounded
    IEEE division back to double — bit-identical on every engine build.
    ``num``/``den`` are COLUMN NAMES already in scope (num >= 0, den > 0;
    exact while 2e6*num fits BIGINT, i.e. num < 4.6e12 — per-group counts,
    not corpus rows)."""
    return F.expr(
        f"CAST(((2 * CAST(({num}) AS BIGINT) * 1000000"
        f" + CAST(({den}) AS BIGINT))"
        f" div (2 * CAST(({den}) AS BIGINT)))"
        f" AS DOUBLE) / 1000000.0"
    )


def ratio6_sql(num: str, den: str) -> str:
    """DuckDB twin of :func:`ratio6` (``//`` == Spark's ``div`` for
    nonnegative integers)."""
    return (
        f"(CAST(((2 * CAST(({num}) AS BIGINT) * 1000000"
        f" + CAST(({den}) AS BIGINT))"
        f" // (2 * CAST(({den}) AS BIGINT)))"
        f" AS DOUBLE) / 1000000.0)"
    )
