"""Sources and sinks (SURVEY.md §2.1).

The reference's storage surface: append (S8), keyed upsert (S9/S10 — see
operators/upsert.py for the logical form), CSV debug dump (S11), and
idempotent date-range overwrite (S12). Here the at-rest format is
date-partitioned parquet; the S12 physical path is a *dynamic* partition
overwrite (only partitions present in the incoming frame rewrite), enabled
globally in session.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def append(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """S8: append sink (reference sqlite_connector.py:73-74 to_sql append)."""
    w = df.write.mode("append")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def overwrite_partitions(df: DataFrame, path: str, partition_by: list[str]) -> None:
    """S12: idempotent backfill — dynamic partition overwrite (reference
    backfill_boxoffice.py:27-47 DELETE range + re-insert). Requires
    ``spark.sql.sources.partitionOverwriteMode=dynamic`` (session.py):
    only the date partitions present in ``df`` are replaced; re-running the
    same backfill is a no-op on final state."""
    df.write.mode("overwrite").partitionBy(*partition_by).parquet(path)


def write_csv(df: DataFrame, path: str) -> None:
    """S11: CSV debug dump (reference movie_events_scraper.py:304)."""
    df.write.mode("overwrite").option("header", True).csv(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    keys: list[str],
    buckets: int = 8,
    sort_by: list[str] | None = None,
) -> None:
    """Bucketed managed table: pre-shuffle the data ONCE at write time so
    every later join/aggregation on ``keys`` is co-located and plans with
    no Exchange at all (add ``sort_by=keys`` to also pre-sort and drop the
    SortMergeJoin's per-query sort).

    This is the 100 TB answer to the reference's repeated fact-dim joins on
    movie_cd (dashboard.py:287 runs per dashboard hit): amortize the
    shuffle across every query that ever joins on the key. Both sides must
    use the same bucket count. Verified shuffle-free in
    tests/test_bucketed.py.
    """
    w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, *keys)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.saveAsTable(table_name)


def with_day_partition(df: DataFrame, ts_col: str, part_col: str = "dt") -> DataFrame:
    """Derive the date partition column for a fact table (the reference's
    boxoffice table is keyed/partitioned by target_dt)."""
    return df.withColumn(part_col, F.to_date(ts_col))
