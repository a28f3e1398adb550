"""Z-order (Morton-curve) multi-column clustering for at-rest layout.

``write_sorted`` (io.py) makes parquet min/max stats an index for ONE key;
a second predicate column gets no skipping. Z-ordering interleaves the bits
of several columns' rank codes into one sort key, so files cover compact
hyper-rectangles of the combined key space and min/max footer stats prune
scans on EVERY participating column — the Delta/Iceberg ``OPTIMIZE
ZORDER BY`` layout, here as plain Catalyst expressions (shiftright/%/* —
whole-stage codegen, no UDF).

Encoding: each column is linearly scaled to a ``bits``-wide integer code
using its global min/max (one tiny agg pass, broadcast back — at 100 TB
this is a metadata-grade aggregate), then codes are bit-interleaved
column-round-robin into a single long. Linear scaling (not exact rank)
keeps the pass count at 1; skew within a dimension costs some balance but
never correctness, and heavy skew can be pre-handled with a log/bucket
transform in the caller's projection.

Used by :func:`write_zordered`; both-dimension file skipping is asserted
in tests/test_etl_write.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _interleave(codes: list[Column], bits: int) -> Column:
    """Bit-interleave ``bits``-wide integer codes, round-robin from the
    lowest bit: output bit (i * n_cols + c) = bit i of codes[c]."""
    n = len(codes)
    out = F.lit(0).cast("long")
    for i in range(bits):
        for c, code in enumerate(codes):
            bit = F.shiftright(code, i).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(F.shiftleft(bit, i * n + c))
    return out


def zorder_key(df: DataFrame, cols: list[str], bits: int = 16) -> DataFrame:
    """Attach ``_zkey``: the Morton interleave of each column's scaled
    ``bits``-wide code. Numeric and date/timestamp columns supported
    (dates order by day number, timestamps by micros)."""
    if not 1 <= len(cols) * bits <= 63:
        raise ValueError("cols x bits must fit a signed long")
    nums = []
    for c in cols:
        dt = df.schema[c].dataType.simpleString()
        col = F.col(c)
        if dt == "date":
            col = F.datediff(col, F.lit("1970-01-01"))
        elif dt.startswith("timestamp"):
            col = F.unix_micros(col.cast("timestamp"))
        nums.append(col.cast("double"))

    stats = df.agg(
        *[F.min(n).alias(f"_lo{i}") for i, n in enumerate(nums)],
        *[F.max(n).alias(f"_hi{i}") for i, n in enumerate(nums)],
    )
    top = (1 << bits) - 1
    with_stats = df.crossJoin(F.broadcast(stats))
    codes = []
    for i, n in enumerate(nums):
        lo, hi = F.col(f"_lo{i}"), F.col(f"_hi{i}")
        span = F.when(hi > lo, hi - lo).otherwise(F.lit(1.0))
        codes.append(
            F.least(F.floor((n - lo) / span * (top + 1)), F.lit(top)).cast("long")
        )
    return with_stats.withColumn("_zkey", _interleave(codes, bits)).drop(
        *[f"_lo{i}" for i in range(len(nums))], *[f"_hi{i}" for i in range(len(nums))]
    )


def write_zordered(
    df: DataFrame, path: str, cols: list[str], partitions: int | None = None, bits: int = 16
) -> None:
    """Z-order-clustered parquet write: range-partition + sort on the
    Morton key, drop the key from the stored schema. Every output file then
    covers a compact region in all ``cols`` simultaneously, so footer
    min/max stats prune point/range scans on any of them."""
    from boxoffice_spark.io import write_sorted

    keyed = zorder_key(df, cols, bits)
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    (
        keyed.repartitionByRange(n, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
