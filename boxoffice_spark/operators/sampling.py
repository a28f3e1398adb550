"""Deterministic hash-based sampling for training-data pipelines.

``df.sample()`` / ``rand()`` are the WRONG tool at 100 TB: Spark re-executes
failed/speculated tasks, and RNG-based sampling re-draws on re-execution —
the same job can emit different samples mid-run, and no two runs agree.
Hash sampling decides membership from the ROW CONTENT: keep a row iff a
salted md5 of its key falls under the rate threshold. Deterministic under
retries, reproducible across runs and engines, and changing the salt yields
a fresh independent sample. Pure codegen expressions — the decision happens
inside the parquet scan's filter, no shuffle at all.

The threshold compare is done on the hex string itself (md5 prefix <
8-hex-digit threshold, lexicographic) — portable to any engine with md5()
and string compare, no 64-bit hex parsing required.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _threshold_hex(rate: float) -> str:
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    if rate >= 1.0:
        # 'g…' sorts after every hex bucket, so strict '<' keeps ALL rows —
        # capping at 'ffffffff' would drop rows whose bucket equals the cap
        # (~1 in 2^32: guaranteed misses on a 100 TB corpus)
        return "g0000000"
    # min() guards float rounding at the top of the range (0.999..9 * 2^32
    # can round to exactly 2^32, which would format to 9 digits)
    return format(min(int(rate * 2**32), 2**32 - 1), "08x")


def hash_bucket(key: Column | str, salt: str = "") -> Column:
    """Uniform [0,1)-ish bucket as the first 8 hex chars of a salted md5."""
    c = F.col(key) if isinstance(key, str) else key
    return F.substring(F.md5(F.concat(F.lit(salt), c)), 1, 8)


HASH_BUCKET_SQL = "substr(md5('{salt}' || {key}), 1, 8)"


def hash_sample(df: DataFrame, key: str, rate: float, salt: str = "s1") -> DataFrame:
    """Deterministic Bernoulli sample: keep each row iff its salted content
    hash falls under ``rate``. Same rows every run, every retry."""
    return df.filter(hash_bucket(key, salt) < F.lit(_threshold_hex(rate)))


def hash_sample_sql(key: str, rate: float, salt: str = "s1") -> str:
    """DuckDB twin of the :func:`hash_sample` predicate (WHERE clause)."""
    return f"{HASH_BUCKET_SQL.format(salt=salt, key=key)} < '{_threshold_hex(rate)}'"


def stratified_hash_sample(
    df: DataFrame, key: str, stratum: str, rates: dict[str, float],
    default_rate: float = 0.0, salt: str = "s1",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. keep 50% of English docs,
    10% of everything else — the standard language/source rebalancing pass
    in corpus curation). One codegen CASE for the threshold; still zero
    shuffle."""
    thr: Column = F.lit(_threshold_hex(default_rate))
    for value, rate in sorted(rates.items()):
        thr = F.when(F.col(stratum) == value, F.lit(_threshold_hex(rate))).otherwise(thr)
    return df.filter(hash_bucket(key, salt) < thr)


def stratified_hash_sample_sql(
    key: str, stratum: str, rates: dict[str, float],
    default_rate: float = 0.0, salt: str = "s1",
) -> str:
    """DuckDB twin of :func:`stratified_hash_sample` (WHERE clause)."""
    whens = " ".join(
        "WHEN {s} = '{v}' THEN '{t}'".format(
            s=stratum, v=v.replace("'", "''"), t=_threshold_hex(r)
        )
        for v, r in sorted(rates.items())
    )
    case = f"CASE {whens} ELSE '{_threshold_hex(default_rate)}' END"
    return f"{HASH_BUCKET_SQL.format(salt=salt, key=key)} < {case}"


def fixed_size_sample(
    df: DataFrame,
    key: str,
    stratum: str,
    k: int,
    tie_col: str | None = None,
    salt: str = "s1",
    prefilter_rate: float | None = None,
) -> DataFrame:
    """EXACTLY-k-per-stratum deterministic sample ("give me 10k eval docs
    per language"): rank rows inside each stratum by their salted content
    hash (a content-derived uniform order) and keep the first ``k``.
    Deterministic under retries and across runs/engines like the rate
    samplers; ``tie_col`` breaks exact-duplicate-content ties.

    Scale shape: one shuffle on ``stratum`` for the window rank. The sort
    is O(stratum size) — when k << stratum, pass ``prefilter_rate``
    (e.g. 3x k/|stratum|) to discard rows above that hash threshold
    SCAN-SIDE first, so the window sorts ~3k rows per stratum instead of
    all of them; the hash order makes the prefilter sound (it can only
    remove rows that would rank > k) as long as the rate is not
    underestimated — guard with a count if |stratum| is unknown.
    """
    from pyspark.sql import Window

    if prefilter_rate is not None:
        df = df.filter(hash_bucket(key, salt) < F.lit(_threshold_hex(prefilter_rate)))
    order = [hash_bucket(key, salt).asc()]
    order.append(F.col(tie_col if tie_col is not None else key).asc())
    w = Window.partitionBy(stratum).orderBy(*order)
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def fixed_size_sample_sql(
    key: str, stratum: str, k: int, tie_col: str, salt: str = "s1"
) -> str:
    """DuckDB twin of :func:`fixed_size_sample` as a QUALIFY clause body."""
    h = HASH_BUCKET_SQL.format(salt=salt, key=key)
    return (
        f"row_number() OVER (PARTITION BY {stratum} "
        f"ORDER BY {h}, {tie_col}) <= {k}"
    )


def train_val_test_split(
    df: DataFrame,
    key: str,
    val_rate: float = 0.05,
    test_rate: float = 0.05,
    salt: str = "split1",
) -> DataFrame:
    """Deterministic 3-way split by content hash: adds a ``split`` column
    ('train' | 'val' | 'test') with DISJOINT-by-construction membership —
    every row lands in exactly one band of the same hash, so no row can
    leak across splits on retry, re-run, or re-partitioning (the property
    rand()-based splitting silently lacks), and appending new data later
    never reassigns an existing row. Zero shuffle: the decision is a
    scan-side codegen expression over the salted md5 bucket.
    """
    b = hash_bucket(key, salt)
    t_test = F.lit(_threshold_hex(test_rate))
    t_val = F.lit(_threshold_hex(test_rate + val_rate))
    split = (
        F.when(b < t_test, "test").when(b < t_val, "val").otherwise("train")
    )
    return df.withColumn("split", split)


def train_val_test_split_sql(key: str, val_rate: float = 0.05,
                             test_rate: float = 0.05, salt: str = "split1") -> str:
    """DuckDB twin of the :func:`train_val_test_split` split expression."""
    b = HASH_BUCKET_SQL.format(salt=salt, key=key)
    return (
        f"CASE WHEN {b} < '{_threshold_hex(test_rate)}' THEN 'test' "
        f"WHEN {b} < '{_threshold_hex(test_rate + val_rate)}' THEN 'val' "
        "ELSE 'train' END"
    )
