"""Keyed merge-upsert and idempotent backfill (reference S9/S10/S12).

The reference upserts with ``INSERT ... ON CONFLICT(key) DO UPDATE``
(sqlite_connector.py:76-114) and backfills idempotently by delete-then-
reinsert over a date range (backfill_boxoffice.py:27-47). On Spark without a
transactional table format, both are expressible as pure DataFrame algebra:

- upsert  = union(old, new) -> row_number over key ordered by source
  priority -> keep rn=1 ("last writer wins"; explicit priority column per
  SURVEY §7 hard part (d)).
- backfill = anti-filter the partition range, union the replacement slice.

At scale the real sink is a transactional format (Delta/Iceberg
``MERGE INTO`` / ``replaceWhere``) — same logical semantics, and the
physical write becomes a dynamic partition overwrite
(``spark.sql.sources.partitionOverwriteMode=dynamic``, set in session.py)
so only touched partitions rewrite. The io.write helpers below do that for
parquet.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def merge_upsert(old: DataFrame, new: DataFrame, keys: list[str]) -> DataFrame:
    """Last-writer-wins keyed merge: rows in ``new`` replace same-keyed rows
    in ``old``; unmatched rows from both survive.

    Requires key-uniqueness within each input (the reference's tables all
    have primary keys). One shuffle on the key columns.
    """
    tagged = old.withColumn("_src", F.lit(0)).unionByName(new.withColumn("_src", F.lit(1)))
    w = W.partitionBy(*keys).orderBy(F.desc("_src"))
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_src", "_rn")
    )


def idempotent_backfill(
    current: DataFrame, replacement: DataFrame, predicate: Column
) -> DataFrame:
    """Delete-then-reinsert semantics: drop ``current`` rows matching
    ``predicate`` (the backfill range), append ``replacement``.

    With a date-partitioned sink this is exactly a dynamic partition
    overwrite — re-running the same backfill is a no-op on the final state
    (the reference's idempotency contract, backfill_boxoffice.py:27-47).
    """
    return current.filter(~predicate).unionByName(replacement)
