"""Declarative data-quality constraint checking (the validation stage of a
training-data pipeline; generalizes the reference's scattered ad-hoc guards:
dropna on dates kobisdata_extractor.py:137-138, NaN scrubbing
supabase_connector.py:42-43, empty-page checks kobisdata_extractor.py:63-66).

``check_constraints`` evaluates every rule in ONE pass over the data (a
single aggregate of conditional counts — no per-rule scans), returning one
row per rule: (rule, n_violations, n_rows, pass). At 100 TB this is the
difference between a constraint suite that costs one scan and one that
costs |rules| scans.

Uniqueness is the exception — it needs its own groupBy shuffle — and is
provided separately (``check_unique``) so the cheap single-pass suite stays
single-pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def check_constraints(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Evaluate named boolean rules (True = row passes) in one aggregate
    pass. Null rule results count as violations (SQL three-valued logic
    would otherwise let null-valued rows pass silently). Rule names are
    arbitrary strings — they are backtick/quote-escaped into the unpivot,
    so 'non-empty text' or names with quotes work; the internal row-count
    column uses a collision-proof name."""
    if not rules:
        raise ValueError("check_constraints: at least one rule is required")
    aggs = []
    for name, cond in rules.items():
        bad = F.sum(F.when(F.coalesce(cond, F.lit(False)), 0).otherwise(1))
        aggs.append(bad.cast("long").alias(name))
    total = "__check_constraints_n__"
    counted = df.agg(F.count(F.lit(1)).alias(total), *aggs)

    def _lit(s: str) -> str:  # SQL string literal
        return "'" + s.replace("'", "''") + "'"

    def _ident(s: str) -> str:  # backticked identifier
        return "`" + s.replace("`", "``") + "`"

    # one row per rule via stack (unpivot) — still a single scan
    pairs = ", ".join(f"{_lit(name)}, {_ident(name)}" for name in rules)
    return counted.selectExpr(
        _ident(total), f"stack({len(rules)}, {pairs}) AS (rule, n_violations)"
    ).select(
        "rule",
        "n_violations",
        F.col(total).alias("n_rows"),
        (F.col("n_violations") == 0).alias("pass"),
    )


def check_unique(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Key-uniqueness audit: one row per duplicated key with its multiplicity
    (empty result = constraint holds). Shuffles once on the key."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n_copies"))
        .filter(F.col("n_copies") > 1)
    )
