"""Streaming jobs vs their batch twins: the tumbling-window stream must
produce exactly the batch aggregation (same logical plan, incremental
execution); streaming dedup must keep one row per key."""

from __future__ import annotations

from boxoffice_spark.queries.incremental import i_tumbling_window
from boxoffice_spark.streaming.jobs import (
    streaming_dedup_first_per_key,
    tumbling_window_stream,
)


def _sorted_rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_tumbling_stream_equals_batch(spark, sf_dir):
    streamed = tumbling_window_stream(spark, sf_dir)
    batch = i_tumbling_window(spark, sf_dir)
    assert _sorted_rows(streamed) == _sorted_rows(batch)


def test_streaming_dedup_one_row_per_key(spark, sf_dir):
    out = streaming_dedup_first_per_key(spark, sf_dir)
    total = out.count()
    distinct_keys = out.select("user_id", "event_type").distinct().count()
    assert total == distinct_keys > 0
