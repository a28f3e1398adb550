"""String/row cleaning expressions (reference §2.8 F1-F11, F20-F25).

Each function returns a Catalyst Column (JVM-side, codegen'd) — the
reference implements these as row-at-a-time pandas lambdas; here they ride
whole-stage codegen.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, functions as F


def snake_case(name: str) -> str:
    """camelCase -> snake_case column rename (reference utils.py:4-9, F1).

    Applied to column *names* driver-side (cheap); use with
    ``df.toDF(*[snake_case(c) for c in df.columns])``.
    """
    return re.sub(r"(?<=[a-z0-9])([A-Z])", r"_\1", name).lower()


def rename_snake_case(df):
    """Rename every column of ``df`` to snake_case (F1)."""
    return df.toDF(*[snake_case(c) for c in df.columns])


def coercive_cast(col: Column | str, target: str = "double", default=0) -> Column:
    """Cast-with-zero-fill (reference utils.py:27-39, F20/F22).

    The reference's ``pd.to_numeric(errors='coerce').fillna(0)`` maps failed
    casts to 0 — NOT null. ``coalesce(try_cast(x), 0)`` preserves that
    exactly; plain ``cast`` would yield null and diverge.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c.try_cast(target), F.lit(default).cast(target))


def strip_brackets(col: Column | str) -> Column:
    """Remove ``[...]`` / ``<...>`` spans and trim (reference F3,
    movie_events_scraper.py:282,422,590)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.regexp_replace(c, r"\[.*?\]", ""), r"<[^<>]+>", ""))


def extract_bracketed(col: Column | str) -> Column:
    """Extract the first ``[...]``/``<...>`` payload (reference F2,
    movie_events_scraper.py:260-262) — the 'movie title inside the event
    title' pattern."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract(c, r"[<\[](.*?)[>\]]", 1)


def normalize_title(col: Column | str) -> Column:
    """Title canonicalization for fuzzy matching (reference F4/F5,
    movie_events_scraper.py:57-62,86,91): strip everything but letters,
    digits and Hangul, collapse whitespace, drop spaces/colons, lowercase."""
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.regexp_replace(c, r"[^가-힣a-zA-Z0-9\s]", "")
    collapsed = F.regexp_replace(cleaned, r"\s+", " ")
    return F.lower(F.regexp_replace(F.trim(collapsed), r"[ :_]", ""))


def truncate_ellipsis(col: Column | str, max_len: int = 31) -> Column:
    """Truncate long strings with a trailing ellipsis (reference F10,
    dashboard.py:304-306)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        F.length(c) > max_len, F.concat(F.substring(c, 1, max_len), F.lit("..."))
    ).otherwise(c)


def bucketize(col: Column | str, thresholds: list[tuple[float, str]], default: str) -> Column:
    """Threshold CASE bucketing (reference F21, stock-status thresholds
    movie_events_scraper.py:490-502): first matching ``value > t`` wins."""
    c = F.col(col) if isinstance(col, str) else col
    expr = None
    for t, label in thresholds:
        cond = c > F.lit(t)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    return expr.otherwise(default) if expr is not None else F.lit(default)


# The reference's exact stock-status thresholds (movie_events_scraper.py:490-502).
STOCK_THRESHOLDS = [(40.0, "보유"), (10.0, "소진중"), (0.0, "소량보유")]
STOCK_DEFAULT = "소진"


def stock_status(col: Column | str) -> Column:
    """quantity -> status label with the reference's thresholds (F21)."""
    return bucketize(col, STOCK_THRESHOLDS, STOCK_DEFAULT)


# PII redaction patterns — written in the common Java-regex/RE2 subset so
# the Spark expression and the DuckDB oracle compile the SAME pattern.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_RE = "\\+?[0-9][0-9 -]{7,13}[0-9]"


def redact_pii(col: Column | str) -> Column:
    """Mask emails then phone-like digit runs (curation-standard PII scrub;
    order matters — the email pattern would otherwise leave digit runs the
    phone pattern then half-masks). Pure codegen `regexp_replace` chain:
    a full-corpus scrub stays JVM-side with zero shuffles."""
    c = F.col(col) if isinstance(col, str) else col
    masked = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(masked, PHONE_RE, "<PHONE>")


def redact_pii_sql(col: str) -> str:
    """DuckDB twin of :func:`redact_pii` (plain concat — the regexes contain
    ``{2,}`` which str.format would eat)."""
    return (
        "regexp_replace(regexp_replace(" + col + ", '" + EMAIL_RE + "', '<EMAIL>', 'g'), "
        "'" + PHONE_RE + "', '<PHONE>', 'g')"
    )
