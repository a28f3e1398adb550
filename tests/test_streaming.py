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


def test_sessionize_stream_equals_batch(spark, sf_dir):
    """session_window is both a streaming and a batch function: run the
    identical groupBy in batch mode and assert the incremental execution
    produced the same sessions. Also ties the per-user session partition
    to i_sessionize's semantics: every batch-window session must contain
    a positive number of events and sessions per user must not overlap."""
    from pyspark.sql import functions as F

    from boxoffice_spark.functions.numeric import dsum
    from boxoffice_spark.streaming.jobs import sessionize_stream
    from boxoffice_spark.tables import table

    streamed = sessionize_stream(spark, sf_dir)
    batch = (
        table(spark, sf_dir, "events")
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), dsum("value").alias("value_sum"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            (F.col("w.end") - F.expr("INTERVAL 30 minutes")).alias("session_end"),
            "n_events",
            "value_sum",
        )
    )
    assert _sorted_rows(streamed) == _sorted_rows(batch)

    rows = sorted(batch.collect(), key=lambda r: (r.user_id, r.session_start))
    assert all(r.n_events > 0 and r.session_start <= r.session_end for r in rows)
    for prev, cur in zip(rows, rows[1:]):
        if prev.user_id == cur.user_id:
            assert cur.session_start > prev.session_end


def test_streaming_dedup_one_row_per_key(spark, sf_dir):
    """Equality evidence against the batch semantics: exactly one row per
    key, the key set is identical to the batch distinct-key set, and every
    emitted row is a genuine source row (dropDuplicatesWithinWatermark may
    keep any one arrival per key, so the kept ROW is nondeterministic but
    the key set and row provenance are not)."""
    from boxoffice_spark.tables import table

    out = streaming_dedup_first_per_key(spark, sf_dir)
    rows = out.collect()
    keys = {(r.user_id, r.event_type) for r in rows}
    assert len(rows) == len(keys) > 0

    ev = table(spark, sf_dir, "events")
    batch_keys = {
        (r.user_id, r.event_type)
        for r in ev.select("user_id", "event_type").distinct().collect()
    }
    assert keys == batch_keys

    source = {
        (r.user_id, r.event_type, r.ts, r.value)
        for r in ev.select("user_id", "event_type", "ts", "value").collect()
    }
    assert all((r.user_id, r.event_type, r.ts, r.value) in source for r in rows)


def test_stream_stream_join_equals_batch_pairs(spark, sf_dir):
    """The watermarked stream-stream attribution join must produce exactly
    the batch interval-join pair set (same logical condition, incremental
    execution with bounded state)."""
    from pyspark.sql import functions as F

    from boxoffice_spark.streaming.jobs import stream_stream_attribution_join
    from boxoffice_spark.tables import table

    streamed = {
        (r.purchase_id, r.click_id)
        for r in stream_stream_attribution_join(spark, sf_dir).collect()
    }

    ev = table(spark, sf_dir, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("click_ts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    batch = {
        (r.purchase_id, r.click_id)
        for r in c.join(
            p,
            (F.col("user_id") == F.col("p_user_id"))
            & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("click_ts") < F.col("purchase_ts")),
        ).collect()
    }
    assert streamed == batch and len(batch) > 0


def test_stream_static_enrich_equals_batch(spark, sf_dir):
    """The availableNow-drained stream-static join must emit exactly the
    rows the identical batch join produces."""
    from pyspark.sql import functions as F

    from boxoffice_spark.streaming.jobs import stream_static_enrich
    from boxoffice_spark.tables import table

    got = sorted(
        map(tuple, stream_static_enrich(spark, sf_dir).collect())
    )
    ev = table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    dim = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_nationkey").alias("nation_key"),
    )
    want = sorted(
        map(
            tuple,
            ev.join(F.broadcast(dim), "user_id", "left")
            .select("event_id", "user_id", "ts", "value", "segment", "nation_key")
            .collect(),
        )
    )
    assert got == want and len(got) > 0


def test_stream_corpus_gate_equals_batch_fingerprints(spark, sf_dir):
    """The streaming ingest gate must admit exactly the fingerprint set
    the batch incremental-dedup query admits (keepers may differ: batch
    keeps min doc_id, the stream keeps first arrival)."""
    from boxoffice_spark.queries.text_pipeline import t_incremental_dedup
    from boxoffice_spark.streaming.jobs import stream_corpus_gate

    got = stream_corpus_gate(spark, sf_dir)
    got_fps = {r.fingerprint for r in got.collect()}
    want_fps = {r.fingerprint for r in t_incremental_dedup(spark, sf_dir).collect()}
    assert got_fps == want_fps and len(got_fps) > 0


def test_stream_drift_monitor_equals_batch(spark, sf_dir):
    """After the availableNow drain, the foreachBatch PSI table must equal
    dq_distribution_drift's batch output exactly."""
    from boxoffice_spark.queries.quality import dq_distribution_drift
    from boxoffice_spark.streaming.jobs import stream_drift_monitor

    got = sorted(map(tuple, stream_drift_monitor(spark, sf_dir).collect()))
    want = sorted(map(tuple, dq_distribution_drift(spark, sf_dir).collect()))
    assert got == want and len(got) > 0
