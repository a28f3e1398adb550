"""Incremental / event-time semantics, batch form (SURVEY.md §2.9).

T1 watermark-resume, T3 latest-state view, and the tumbling/session window
generalizations of the reference's 10-minute poll. The true streaming forms
live in boxoffice_spark/streaming/ (rows-only checks); these batch forms are
the oracle-verifiable semantics — by design they are the SAME logical plans
Structured Streaming runs incrementally.

All oracles route events through a microsecond-truncating CTE (see
windows.py note on nanosecond parquet).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from boxoffice_spark.functions.numeric import dsum, dsum_sql
from boxoffice_spark.registry import register
from boxoffice_spark.tables import EVENTS_US_SQL as _EVENTS_US, table


@register(
    "i_watermark_resume",
    oracle=f"""
    WITH ev AS ({_EVENTS_US}),
    existing AS (
        SELECT * FROM ev
        WHERE ts <= (SELECT min(ts) + INTERVAL 14 DAY FROM ev)
    ),
    increment AS (
        SELECT * FROM ev WHERE ts > (SELECT max(ts) FROM existing)
    )
    SELECT CAST(ts AS DATE) AS event_day, count(*) AS n_events, {dsum_sql('value')} AS value_sum
    FROM increment
    GROUP BY 1
    """,
    tags=("incremental", "watermark"),
)
def i_watermark_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1: low-watermark incremental catch-up (reference
    kobis_pipeline.py:15-46: read MAX(target_dt), fetch from max+1 through
    yesterday, append). 'Existing' is the first 14 days of the log; the
    increment is everything past its max — aggregated per day exactly like
    the daily batch would append it. The watermark read is a 1-row
    broadcast, not a driver collect."""
    ev = table(spark, sf_dir, "events")
    cutoff = ev.agg((F.min("ts") + F.expr("INTERVAL 14 DAYS")).alias("cutoff"))
    existing = ev.join(F.broadcast(cutoff)).filter(F.col("ts") <= F.col("cutoff"))
    watermark = existing.agg(F.max("ts").alias("wm"))
    increment = ev.join(F.broadcast(watermark)).filter(F.col("ts") > F.col("wm"))
    return increment.groupBy(F.to_date("ts").alias("event_day")).agg(
        F.count("*").alias("n_events"), dsum("value").alias("value_sum")
    )


@register(
    "i_latest_state_view",
    oracle=f"""
    WITH ev AS ({_EVENTS_US}),
    ranked AS (
        SELECT user_id, event_type, ts, value,
            ROW_NUMBER() OVER (
                PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC
            ) AS rn
        FROM ev
    )
    SELECT user_id, event_type, ts AS last_ts, value AS last_value
    FROM ranked WHERE rn = 1
    """,
    tags=("incremental", "latest"),
)
def i_latest_state_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3: latest-state-per-key view over an append-only log (reference
    dashboard.py:105-118 current-stock CTE) keyed by the composite
    (user_id, event_type) — the goods_stock (event_id, theater_name) analog.
    Batch form of streaming state; same window as W1, via the shared
    operators/temporal.latest_per_key (also the stateful stream's fold —
    tests/test_streaming.py proves stream == this exact code path)."""
    from boxoffice_spark.operators.temporal import latest_per_key

    ev = table(spark, sf_dir, "events")
    return latest_per_key(
        ev, ["user_id", "event_type"], [F.desc("ts"), F.desc("event_id")]
    ).select(
        "user_id",
        "event_type",
        F.col("ts").alias("last_ts"),
        F.col("value").alias("last_value"),
    )


@register(
    "i_tumbling_window",
    oracle=f"""
    WITH ev AS ({_EVENTS_US})
    SELECT
        time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
        event_type,
        count(*) AS n_events,
        {dsum_sql('value')} AS value_sum
    FROM ev
    GROUP BY 1, 2
    """,
    bench=True,
    tags=("incremental", "window"),
)
def i_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 generalized: tumbling event-time window aggregation (the Spark
    form of the reference's 10-minute stock poll cadence,
    goods_stock_pipeline.py:135-139). Identical logical plan to the
    streaming job in streaming/jobs.py — verified equal in
    tests/test_streaming.py."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("value_sum"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )


@register(
    "i_sessionize",
    oracle=f"""
    WITH ev AS ({_EVENTS_US}),
    gaps AS (
        SELECT user_id, event_id, ts, value,
            CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                      > INTERVAL 30 MINUTE
                 THEN 1 ELSE 0 END AS is_new_session
        FROM ev
    ),
    sess AS (
        SELECT *,
            SUM(is_new_session) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) AS session_id
        FROM gaps
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           count(*) AS n_events, min(ts) AS session_start, max(ts) AS session_end
    FROM sess
    GROUP BY user_id, session_id
    """,
    tags=("incremental", "session"),
)
def i_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (SURVEY §2.11): 30-minute-gap sessions via
    lag + cumulative-sum — the batch twin of streaming
    ``session_window``. Two windows over the same (user_id, ts)
    partitioning: Catalyst reuses one sort+exchange for both."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond arithmetic: cast-to-long would truncate to seconds and
    # disagree with the oracle's exact interval comparison at the boundary
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    with_sess = (
        ev.withColumn("is_new_session", F.when(gap > 30 * 60 * 1_000_000, 1).otherwise(0))
        .withColumn(
            "session_id",
            F.sum("is_new_session").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
        )
    )
    return with_sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@register(
    "i_sliding_window",
    oracle=f"""
    WITH ev AS ({_EVENTS_US}),
    expanded AS (
        SELECT time_bucket(INTERVAL 30 MINUTE, ts) - k * INTERVAL 30 MINUTE AS window_start,
               event_type, value
        FROM ev CROSS JOIN (VALUES (0), (1)) AS t(k)
    )
    SELECT window_start, event_type, count(*) AS n_events, {dsum_sql('value')} AS value_sum
    FROM expanded
    GROUP BY 1, 2
    """,
    tags=("incremental", "window"),
)
def i_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows (1h size / 30min slide): each event lands
    in size/slide = 2 overlapping windows — the moving-average shape the
    reference's 10-minute poll dashboard implies. Spark expands the windows
    natively in F.window; the oracle expands them with an explicit 2-row
    cross join on the same 30-minute grid (epoch-aligned in both engines).
    """
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("value_sum"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "value_sum")
    )


@register(
    "i_hierarchical_rollup",
    oracle=f"""
    WITH ev AS ({_EVENTS_US}),
    hourly AS (
        SELECT date_trunc('hour', ts) AS bucket_start, event_type,
               count(*) AS n_events, sum(CAST(value AS DECIMAL(27,4))) AS vdec
        FROM ev GROUP BY 1, 2
    ),
    daily AS (
        SELECT date_trunc('day', bucket_start) AS bucket_start, event_type,
               sum(n_events) AS n_events, sum(vdec) AS vdec
        FROM hourly GROUP BY 1, 2
    )
    SELECT 'hour' AS grain, bucket_start, event_type,
           CAST(n_events AS BIGINT) AS n_events, CAST(vdec AS DOUBLE) AS value_sum
    FROM hourly
    UNION ALL
    SELECT 'day' AS grain, bucket_start, event_type,
           CAST(n_events AS BIGINT) AS n_events, CAST(vdec AS DOUBLE) AS value_sum
    FROM daily
    """,
    tags=("incremental", "rollup", "hypertable"),
)
def i_hierarchical_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: the DAILY level is computed
    FROM the hourly aggregate, not from raw events — counts and decimal
    sums are algebraic, so coarser grains re-aggregate O(24) hourly rows
    per key instead of rescanning the fact table. At 100 TB this is the
    difference between a dashboard query over a few thousand rollup rows
    and a full fact scan; the decimal stays un-cast until the final
    projection so the two-level sum is exact (no double re-accumulation).
    Events are scanned ONCE: the union's two branches share the hourly
    aggregate subplan (ReusedExchange, asserted in tests/test_plans.py).
    """
    ev = table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("bucket_start"), "event_type"
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(27,4)")).alias("vdec"),
    )
    daily = hourly.groupBy(
        F.date_trunc("day", "bucket_start").alias("bucket_start"), "event_type"
    ).agg(F.sum("n_events").alias("n_events"), F.sum("vdec").alias("vdec"))

    def finish(df: DataFrame, grain: str) -> DataFrame:
        return df.select(
            F.lit(grain).alias("grain"),
            "bucket_start",
            "event_type",
            "n_events",
            F.col("vdec").cast("double").alias("value_sum"),
        )

    return finish(hourly, "hour").unionByName(finish(daily, "day"))
