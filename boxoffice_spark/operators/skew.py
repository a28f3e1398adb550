"""Skew mitigation operators (100 TB design point).

AQE's skew-join splitting (enabled in session.py) handles sort-merge joins
whose *partitions* are detectably oversized at runtime. Two skew shapes it
does not cover, provided here as explicit operators:

- ``salted_join``: a shuffle join on a pathologically hot key (the
  low-cardinality dimension key: event_type, language, status). Salting
  fans each hot key over ``salt`` reducers by replicating the SMALL side
  ``salt`` times and giving the big side a uniform pseudo-random salt; the
  join key becomes (key, salt), so no single reducer owns a hot key.
- ``salted_distinct_count``: exact COUNT(DISTINCT v) per hot key without
  funneling each key's whole value set through one reducer. Stage 1
  deduplicates within (key, hash(v) % salt) sub-universes — disjoint value
  sets, so the per-salt distinct counts are exactly summable in stage 2.

Both are pure Catalyst (oracle-checkable); salts derive from xxhash64, not
rand(), so results are deterministic and retries/speculative tasks agree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _salt_of(cols: list[Column], salt: int) -> Column:
    return F.pmod(F.xxhash64(*cols), F.lit(salt)).cast("int")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 16,
    salt_source: list[str] | None = None,
) -> DataFrame:
    """Equi-join ``big ⋈ small on key`` with the hot-key shuffle spread over
    ``salt`` reducers.

    ``salt_source`` names big-side columns whose hash spreads rows of one
    key across salts (default: all non-key columns). The small side is
    replicated ``salt``x — it must actually be small; for a big-big skewed
    join, split hot keys out by frequency and union the two joins instead.
    """
    src = salt_source or [c for c in big.columns if c != on]
    if not src:
        # a bare keys table has nothing to derive a spreading hash from —
        # xxhash64() with zero args would die with an opaque AnalysisException.
        # monotonically_increasing_id is fine HERE: the salt only spreads
        # rows, so retry/partitioning nondeterminism cannot change the join
        # RESULT, merely which reducer handled a row.
        b = big.withColumn(
            "_salt", _salt_of([F.monotonically_increasing_id()], salt)
        )
    else:
        b = big.withColumn("_salt", _salt_of([F.col(c) for c in src], salt))
    s = small.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    return b.join(s, [on, "_salt"]).drop("_salt")


def salted_distinct_count(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    salt: int = 16,
) -> DataFrame:
    """Exact per-key COUNT(DISTINCT value) in two bounded stages.

    Plain count_distinct shuffles every (key, value) pair to the key's one
    reducer — the hot key's full value universe lands on one task. Here
    stage 1 groups by (key, hash(value) % salt): each sub-universe holds
    only values hashing to that salt, so sub-counts are disjoint and stage
    2's sum is exact, with the hot key's work spread over ``salt`` tasks.
    """
    partial = (
        df.groupBy(*key_cols, _salt_of([F.col(value_col)], salt).alias("_salt"))
        .agg(F.count_distinct(F.col(value_col)).alias("_partial"))
    )
    return partial.groupBy(*key_cols).agg(F.sum("_partial").cast("long").alias("n_distinct"))


def salted_group_topk(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    tiebreak_cols: list[str],
    salt: int = 16,
) -> DataFrame:
    """Exact per-group top-k on a HOT grouping key, in two bounded window
    stages.

    The plain plan — ``row_number() OVER (PARTITION BY group ORDER BY
    ...)`` — shuffles every row of a group to one task and sorts the
    whole group there: with a low-cardinality key (status, language,
    event_type) that is a handful of tasks sorting the entire table. Here
    stage 1 ranks within (group, hash % salt) sub-partitions — each holds
    ~1/salt of the group — and keeps k rows per sub-partition; stage 2
    ranks only the surviving ``salt * k`` rows per group. Any global
    top-k row is top-k within its own sub-partition (the sub-partition is
    a subset of the group), so stage 1 never discards a winner and the
    result equals the single-window plan row-for-row.

    ``order_cols`` are the ranking expressions (pass F.desc(...) etc.);
    ``tiebreak_cols`` must make the total order unique per group so the
    result is deterministic — they are appended ascending. The salt
    derives from xxhash64 over the tiebreak columns (not rand()), so
    retries and speculative tasks agree.
    """
    from pyspark.sql import Window as W

    order = [*order_cols, *[F.asc(c) for c in tiebreak_cols]]
    salted = df.withColumn(
        "_salt", _salt_of([F.col(c) for c in tiebreak_cols], salt)
    )
    w1 = W.partitionBy(*group_cols, "_salt").orderBy(*order)
    survivors = (
        salted.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .drop("_salt", "_r1")
    )
    w2 = W.partitionBy(*group_cols).orderBy(*order)
    return (
        survivors.withColumn("rnk", F.row_number().over(w2))
        .filter(F.col("rnk") <= k)
    )
