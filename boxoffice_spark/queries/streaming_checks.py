"""Rows-only registry entries for the Structured Streaming jobs.

Not SQL-expressible (stateful incremental execution), so per the driver
contract they carry no oracle — the batch twins in queries/incremental.py
are the oracle-checked semantics, and tests/test_streaming.py asserts
stream == batch equality locally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from boxoffice_spark.registry import register
from boxoffice_spark.streaming.jobs import (
    streaming_dedup_first_per_key,
    tumbling_window_stream,
)


@register("s_stream_tumbling_window", oracle=None, tags=("streaming",))
def s_stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 streaming: watermarked tumbling-window aggregation driven to
    completion with availableNow (result equals i_tumbling_window)."""
    return tumbling_window_stream(spark, sf_dir)


@register("s_stream_dedup", oracle=None, tags=("streaming",))
def s_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3 streaming: watermarked dropDuplicatesWithinWatermark per
    (user_id, event_type) — bounded-state streaming dedup."""
    return streaming_dedup_first_per_key(spark, sf_dir)
