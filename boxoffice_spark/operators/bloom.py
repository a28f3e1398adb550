"""Bloom filters as DataFrame algebra — the membership-prefilter primitive
for big-probe/small-build joins (decontamination, incremental dedup,
blocklist scrubbing).

Spark's own runtime row-level filtering (`spark.sql.optimizer.runtime.
bloomFilter.enabled`) injects exactly this shape into shuffle joins, but its
`bloom_filter_agg` / `might_contain` expressions are internal-only (not on
the SQL function search path in 4.x), and the optimizer only fires on its
own cost heuristics. This module makes the pattern an explicit, reusable
operator:

- ``bloom_build(values, col, num_bits, n_hashes)`` packs the filter into a
  one-row-per-64-bit-word table ``(word_idx int, bits bigint)`` via a
  single ``bit_or`` aggregate — ~num_bits/64 rows regardless of input size,
  built with one narrow shuffle (positions partial-aggregate map-side).
- ``bloom_keep_maybe(df, col, words, ...)`` drops every row whose ``col``
  is DEFINITELY not in the built set, as ``n_hashes`` consecutive BROADCAST
  hash joins on ``word_idx`` + bit tests — map-side only, NO shuffle of
  ``df``, no Python. False positives pass (callers re-check exactly);
  false negatives are impossible, so composing with an exact join
  preserves exact semantics.

Why this matters at 100 TB: a LEFT SEMI probe of a small eval set against
billions of distinct train shingles shuffles the train side on the key. A
Bloom filter over the SMALL side (1-2 bytes/element) broadcast against the
big side's scan discards ~99.9% of train rows before that shuffle — the
Dolma-style decontamination run then shuffles megabytes, not terabytes.
Size the filter at ~10 bits and 5-7 hashes per element for ~1% fpp; a
100k-element eval set costs 125 KB of broadcast.

Hash family: ``xxhash64(col, seed_j)`` per probe ``j`` — the same 64-bit
mixer the engine uses for shuffle hashing, seeded per hash function, so
build and probe agree deterministically across the cluster with no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _probe_cols(col: str, num_bits: int, n_hashes: int) -> list[F.Column]:
    """Bit positions for the n_hashes probes of ``col``."""
    return [
        F.pmod(F.xxhash64(F.col(col), F.lit(j)), F.lit(num_bits)).cast("long")
        for j in range(n_hashes)
    ]


def bloom_build(
    values: DataFrame, col: str, num_bits: int = 1 << 20, n_hashes: int = 5
) -> DataFrame:
    """Build the packed word table for a Bloom filter over ``values.col``.

    Output: ``(word_idx int, bits bigint)``, one row per 64-bit word with at
    least one bit set (absent word_idx == all-zero word). The aggregate is a
    plain groupBy ``bit_or`` — partial-aggregated map-side, shuffling at
    most ``num_bits / 64`` rows.
    """
    pos = F.explode(F.array(*_probe_cols(col, num_bits, n_hashes))).alias("_pos")
    return (
        values.select(pos)
        .groupBy((F.col("_pos") / 64).cast("int").alias("word_idx"))
        .agg(
            # F.shiftleft only accepts a literal bit count — expr() for the
            # column-valued shift
            F.bit_or(
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_pos % 64 AS INT))")
            ).alias("bits")
        )
    )


def bloom_keep_maybe(
    df: DataFrame,
    col: str,
    words: DataFrame,
    num_bits: int = 1 << 20,
    n_hashes: int = 5,
) -> DataFrame:
    """Rows of ``df`` whose ``col`` MIGHT be in the set ``words`` encodes
    (same ``num_bits`` / ``n_hashes`` as the build, or results are
    undefined). Probe ``j`` survives iff its word exists and its bit is
    set; an inner broadcast join drops missing words for free (a word with
    no row has no bits set). n_hashes broadcast joins, zero shuffles of
    ``df``, zero Python — the probe stays inside whole-stage codegen.
    """
    out = df
    for j, probe in enumerate(_probe_cols(col, num_bits, n_hashes)):
        w = words.select(
            F.col("word_idx").alias(f"_w{j}"), F.col("bits").alias(f"_b{j}")
        )
        out = (
            out.withColumn(f"_p{j}", probe)
            .join(
                F.broadcast(w),
                (F.col(f"_p{j}") / 64).cast("int") == F.col(f"_w{j}"),
                "inner",
            )
            .filter(
                F.expr(
                    f"(shiftright(_b{j}, CAST(_p{j} % 64 AS INT)) & 1) = 1"
                )
            )
            .drop(f"_p{j}", f"_w{j}", f"_b{j}")
        )
    return out
