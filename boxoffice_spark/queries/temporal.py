"""Temporal join queries: as-of and interval (range) joins.

The reference's only temporal join shape is implicit — "latest stock per
theater" (reference dashboard.py:131-140) is an as-of to *now*. These
queries make the general operators explicit (operators/temporal.py) over the
events fixture: last-purchase attachment, attribution windows, and a
keyless sliding-window count. Each is a shape a naive SQL engine executes
as a per-key cross join; the point of the operator layer is that none of
these do (see the strategy notes in operators/temporal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from boxoffice_spark.functions.numeric import dsum, dsum_sql
from boxoffice_spark.operators.temporal import asof_join, interval_join
from boxoffice_spark.registry import register
from boxoffice_spark.tables import EVENTS_US_SQL as _EVENTS_US, table


@register(
    "j_asof_last_purchase",
    oracle=f"""
    WITH ev AS ({_EVENTS_US}),
         l AS (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'click'),
         r AS (SELECT user_id, ts, event_id, value FROM ev WHERE event_type = 'purchase'),
         pairs AS (
             SELECT l.event_id,
                    r.event_id AS purchase_id, r.ts AS purchase_ts,
                    r.value AS purchase_value,
                    row_number() OVER (
                        PARTITION BY l.event_id
                        ORDER BY r.ts DESC, r.event_id DESC
                    ) AS rn
             FROM l JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
         )
    SELECT
        l.event_id, l.user_id, l.ts,
        s.purchase_id, s.purchase_ts, s.purchase_value,
        (epoch_us(l.ts) - epoch_us(s.purchase_ts)) // 1000000 AS secs_since_purchase
    FROM l LEFT JOIN (SELECT * FROM pairs WHERE rn = 1) s ON s.event_id = l.event_id
    """,
    bench=True,
    tags=("join", "asof", "temporal"),
)
def j_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: attach to every click the same user's most recent
    purchase at or before the click (null if none yet). Executed with the
    union+running-window trick — one shuffle per side on user_id, no
    per-key cross product (operators/temporal.asof_join). The oracle is an
    explicit windowed formulation rather than DuckDB's native ASOF JOIN:
    ASOF cannot express the (ts DESC, event_id DESC) tie-break the
    operator guarantees, so with two purchases in the same microsecond the
    native form would pick an arbitrary one and the cell-exact compare
    would flap. Events route through the shared microsecond-truncation
    CTE so a TIMESTAMP(NANOS) fixture compares at Spark's precision."""
    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    out = asof_join(
        clicks, purchases, on=["user_id"], left_ts="ts", right_ts="ts", tie_col="event_id"
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("r_event_id").alias("purchase_id"),
        F.col("r_ts").alias("purchase_ts"),
        F.col("r_value").alias("purchase_value"),
        F.expr("(unix_micros(ts) - unix_micros(r_ts)) div 1000000").alias(
            "secs_since_purchase"
        ),
    )


@register(
    "j_attribution_window",
    oracle=f"""
    WITH ev AS ({_EVENTS_US}),
         p AS (SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
               FROM ev WHERE event_type = 'purchase'),
         e AS (SELECT user_id, ts, event_type
               FROM ev WHERE event_type IN ('click', 'view'))
    SELECT
        p.purchase_id, p.user_id, p.purchase_ts,
        count(CASE WHEN e.event_type = 'click' THEN 1 END) AS clicks_1h,
        count(CASE WHEN e.event_type = 'view' THEN 1 END) AS views_1h
    FROM p LEFT JOIN e
      ON p.user_id = e.user_id
     AND e.ts >= p.purchase_ts - INTERVAL 1 HOUR
     AND e.ts < p.purchase_ts
    GROUP BY 1, 2, 3
    """,
    tags=("join", "range", "temporal"),
)
def j_attribution_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join with equi keys: per purchase, how many clicks/views
    the same user produced in the hour before it (attribution window).
    Sort-merge on user_id with the range predicate as a residual filter —
    one shuffle per side; every purchase is kept (left semantics), zero
    counts included."""
    ev = table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        (F.col("ts") - F.expr("INTERVAL 1 HOUR")).alias("win_start"),
        F.col("ts").alias("win_end"),
    )
    e = ev.filter(F.col("event_type").isin("click", "view")).select(
        "user_id", "ts", "event_type"
    )
    hits = interval_join(e, p, point_ts="ts", start_col="win_start", end_col="win_end", on=["user_id"])
    counts = hits.groupBy("purchase_id").agg(
        F.count(F.when(F.col("event_type") == "click", 1)).alias("clicks_1h"),
        F.count(F.when(F.col("event_type") == "view", 1)).alias("views_1h"),
    )
    return (
        p.select("purchase_id", "user_id", "purchase_ts")
        .join(counts, "purchase_id", "left")
        .select(
            "purchase_id",
            "user_id",
            "purchase_ts",
            F.coalesce("clicks_1h", F.lit(0)).alias("clicks_1h"),
            F.coalesce("views_1h", F.lit(0)).alias("views_1h"),
        )
    )


@register(
    "j_sliding_interval_count",
    bench=True,
    oracle=f"""
    WITH ev AS ({_EVENTS_US}),
    w AS (
        SELECT ts AS win_start, ts + INTERVAL 7 DAY AS win_end
        FROM (SELECT unnest(generate_series(TIMESTAMP '2024-01-01',
                                            TIMESTAMP '2024-01-29',
                                            INTERVAL 2 DAY)) AS ts)
    )
    SELECT w.win_start, count(*) AS n_events,
           {dsum_sql('e.value', 4)} AS total_value
    FROM w JOIN ev e ON e.ts >= w.win_start AND e.ts < w.win_end
    GROUP BY 1
    """,
    tags=("join", "range", "temporal", "binned"),
)
def j_sliding_interval_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyless interval join, binned: overlapping 7-day windows sliding
    every 2 days, counting events per window. With no equi key a naive
    plan is windows x events cross join; the operator discretizes time
    into 1-day bins so the join is an equi-join on bin id (each event
    replicated once, each window ~8x) and the containment filter is exact
    (operators/temporal.interval_join)."""
    wins = spark.sql(
        """
        SELECT win_start, win_start + INTERVAL 7 DAY AS win_end
        FROM (SELECT explode(sequence(to_timestamp('2024-01-01'),
                                      to_timestamp('2024-01-29'),
                                      INTERVAL 2 DAY)) AS win_start)
        """
    )
    ev = table(spark, sf_dir, "events").select("ts", "value")
    hits = interval_join(
        ev, wins, point_ts="ts", start_col="win_start", end_col="win_end", bin_secs=86400
    )
    return hits.groupBy("win_start").agg(
        F.count("*").alias("n_events"),
        dsum(F.col("value"), scale=4).alias("total_value"),
    )


@register(
    "j_interval_overlap_promo",
    oracle=f"""
    WITH promo AS (
        SELECT ts AS promo_start, ts + INTERVAL 7 DAY AS promo_end
        FROM (SELECT unnest(generate_series(TIMESTAMP '1995-01-02',
                                            TIMESTAMP '1998-08-01',
                                            INTERVAL 28 DAY)) AS ts)
    ), fulfil AS (
        SELECT o_orderkey, o_totalprice,
               o_orderdate AS f_start, o_orderdate + INTERVAL 14 DAY AS f_end
        FROM orders
    )
    SELECT p.promo_start, count(*) AS n_orders,
           {dsum_sql('f.o_totalprice', 4)} AS revenue
    FROM promo p JOIN fulfil f
      ON f.f_start < p.promo_end AND p.promo_start < f.f_end
    GROUP BY 1
    """,
    tags=("join", "range", "temporal", "interval-overlap"),
)
def j_interval_overlap_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyless interval x interval OVERLAP join
    (operators/temporal.interval_overlap_join): 14-day order-fulfillment
    windows against a 7-day-every-4-weeks promo calendar — 'which orders
    were in flight during each promo'. A naive plan is a cross join with
    a range residual (BroadcastNestedLoop at scale); the operator
    discretizes both interval sets into week bins, equi-joins on the bin,
    and keeps each pair only in its canonical first overlapping bin — so
    there is no pair-dedup shuffle and no nested-loop anywhere."""
    from boxoffice_spark.operators.temporal import interval_overlap_join

    promo = spark.sql(
        """
        SELECT promo_start, promo_start + INTERVAL 7 DAY AS promo_end
        FROM (SELECT explode(sequence(to_timestamp('1995-01-02'),
                                      to_timestamp('1998-08-01'),
                                      INTERVAL 28 DAY)) AS promo_start)
        """
    )
    fulfil = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        # o_orderdate reads as timestamp_ntz; bin arithmetic needs an epoch,
        # so pin it to the session-UTC timeline first (same instant either way)
        F.col("o_orderdate").cast("timestamp").alias("f_start"),
        (F.col("o_orderdate").cast("timestamp") + F.expr("INTERVAL 14 DAY")).alias("f_end"),
    )
    hits = interval_overlap_join(
        fulfil, promo, "f_start", "f_end", "promo_start", "promo_end",
        bin_secs=7 * 86400,
    )
    return hits.groupBy("promo_start").agg(
        F.count("*").alias("n_orders"),
        dsum(F.col("o_totalprice"), scale=4).alias("revenue"),
    )


@register(
    "j_asof_next_error",
    oracle=f"""
    WITH ev AS ({_EVENTS_US}),
         l AS (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'view'),
         r AS (SELECT user_id, ts, event_id, value FROM ev WHERE event_type = 'error'),
         pairs AS (
             SELECT l.event_id,
                    r.event_id AS error_id, r.ts AS error_ts,
                    r.value AS error_value,
                    row_number() OVER (
                        PARTITION BY l.event_id
                        ORDER BY r.ts ASC, r.event_id DESC
                    ) AS rn
             FROM l JOIN r ON l.user_id = r.user_id AND r.ts >= l.ts
         )
    SELECT
        l.event_id, l.user_id, l.ts,
        s.error_id, s.error_ts, s.error_value,
        (epoch_us(s.error_ts) - epoch_us(l.ts)) // 1000000 AS secs_to_error
    FROM l LEFT JOIN (SELECT * FROM pairs WHERE rn = 1) s ON s.event_id = l.event_id
    """,
    tags=("join", "asof", "temporal"),
)
def j_asof_next_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: attach to every view the same user's next
    error event at or after it (null if the user never errors again) —
    the time-to-next-failure / exposure-to-incident attachment, the
    mirror of j_asof_last_purchase's backward scan and the second half
    of the as-of contract (operators/temporal.asof_join
    direction=\"forward\"). Same single-shuffle union+running-window
    plan, just scanned in descending event time; among same-microsecond
    errors the max event_id wins (the operator's documented tie rule,
    spelled out in the oracle's window since native ASOF JOIN cannot
    express it)."""
    ev = table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "event_id", "value"
    )
    out = asof_join(
        views,
        errors,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        direction="forward",
        tie_col="event_id",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("r_event_id").alias("error_id"),
        F.col("r_ts").alias("error_ts"),
        F.col("r_value").alias("error_value"),
        F.expr("(unix_micros(r_ts) - unix_micros(ts)) div 1000000").alias(
            "secs_to_error"
        ),
    )


@register(
    "j_scd2_effective_dated",
    oracle=f"""
    WITH ev AS ({_EVENTS_US}),
    hist AS (
        SELECT user_id, value AS attr_value, ts AS valid_from,
            lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                AS valid_to
        FROM ev WHERE event_type = 'signup'
    ),
    facts AS (
        SELECT event_id AS purchase_id, user_id, ts AS purchase_ts, value
        FROM ev WHERE event_type = 'purchase'
    )
    SELECT f.purchase_id, f.user_id, f.purchase_ts, f.value,
        h.attr_value AS segment_at_purchase, h.valid_from
    FROM facts f
    LEFT JOIN hist h ON h.user_id = f.user_id
        AND f.purchase_ts >= h.valid_from
        AND (h.valid_to IS NULL OR f.purchase_ts < h.valid_to)
    """,
    tags=("join", "scd2", "temporal"),
)
def j_scd2_effective_dated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective-dated dimension join — the CONSUMPTION side of SCD2
    (e_scd2_history builds the intervals, e_scd2_asof_read probes one
    instant; this joins EVERY fact to the dimension version in force at
    its own timestamp, the bread-and-butter warehouse pattern "price /
    segment as of the order date"). Facts before a user's first version
    keep a null attribute (left semantics).

    The logical form is the interval BETWEEN probe the oracle writes —
    but executed that way it is a band join (per-key cross product +
    residual). The engine instead runs the as-of union+window plan
    (operators/temporal.asof_join): intervals from an append-only
    change log mean "version in force at ts" == "latest valid_from at
    or before ts", so the interval probe collapses to one shuffle on
    user_id, a per-key sort, and a running last_value — no pair
    blowup, and zero-width versions (two changes in the same
    microsecond) resolve to the later event_id exactly as the interval
    form's empty [from, to) does. At 100 TB this is the difference
    between a shuffle and a per-user quadratic."""
    ev = table(spark, sf_dir, "events")
    facts = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id",
        F.col("ts").alias("purchase_ts"), "value",
    )
    versions = ev.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", "event_id", F.col("value").alias("attr_value")
    )
    out = asof_join(
        facts, versions, on=["user_id"], left_ts="purchase_ts",
        right_ts="ts", tie_col="event_id",
    )
    return out.select(
        "purchase_id", "user_id", "purchase_ts", "value",
        F.col("r_attr_value").alias("segment_at_purchase"),
        F.col("r_ts").alias("valid_from"),
    )


@register(
    "j_asof_nearest",
    oracle=f"""
    WITH ev AS ({_EVENTS_US}),
         l AS (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'view'),
         r AS (SELECT user_id, ts, event_id FROM ev WHERE event_type = 'error'),
         pairs AS (
             SELECT l.event_id,
                    r.event_id AS error_id, r.ts AS error_ts,
                    row_number() OVER (
                        PARTITION BY l.event_id
                        ORDER BY abs(epoch_us(r.ts) - epoch_us(l.ts)) ASC,
                                 (r.ts <= l.ts) DESC,
                                 r.event_id DESC
                    ) AS rn
             FROM l JOIN r ON l.user_id = r.user_id
         )
    SELECT
        l.event_id, l.user_id, l.ts,
        s.error_id AS nearest_error_id, s.error_ts AS nearest_error_ts,
        -- toward-zero truncation spelled via NONNEGATIVE // only: the
        -- sign of negative-operand integer division is build-surface
        -- (floor vs truncate) — parity rule 6 keeps it out of oracles
        CASE WHEN s.error_ts IS NULL THEN NULL
             WHEN epoch_us(s.error_ts) >= epoch_us(l.ts)
             THEN (epoch_us(s.error_ts) - epoch_us(l.ts)) // 1000000
             ELSE -((epoch_us(l.ts) - epoch_us(s.error_ts)) // 1000000)
        END AS gap_secs
    FROM l LEFT JOIN (SELECT * FROM pairs WHERE rn = 1) s
        ON s.event_id = l.event_id
    """,
    tags=("join", "asof", "temporal"),
)
def j_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join — the third member of the as-of contract
    (backward = j_asof_last_purchase, forward = j_asof_next_error):
    attach to every view the same user's closest error in EITHER
    direction, signed gap_secs telling which side it fell on (the
    'what incident is this page view associated with' attachment when
    causality could run either way). NOT a pair join: the engine runs
    the backward and forward single-shuffle as-of scans and combines
    their two one-row-per-view answers — min |gap| wins, exact ties
    prefer the backward (already-observed) event, matching the
    oracle's explicit (abs gap, backward-first, max event_id) pick
    over the naive pair enumeration. Two union+running-window passes +
    one event-keyed join of two view-grain frames — never |views| x
    |errors|."""
    ev = table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "event_id"
    )
    back = asof_join(
        views, errors, on=["user_id"], left_ts="ts", right_ts="ts",
        direction="backward", tie_col="event_id",
    ).select(
        "event_id",
        "user_id",
        "ts",
        F.col("r_event_id").alias("b_id"),
        F.col("r_ts").alias("b_ts"),
    )
    fwd = asof_join(
        views, errors, on=["user_id"], left_ts="ts", right_ts="ts",
        direction="forward", tie_col="event_id",
    ).select(
        F.col("event_id").alias("f_event_id"),
        F.col("r_event_id").alias("f_id"),
        F.col("r_ts").alias("f_ts"),
    )
    j = back.join(fwd, back.event_id == fwd.f_event_id, "left")
    gap_b = F.unix_micros(F.col("ts")) - F.unix_micros(F.col("b_ts"))
    gap_f = F.unix_micros(F.col("f_ts")) - F.unix_micros(F.col("ts"))
    take_back = F.col("b_id").isNotNull() & (
        F.col("f_id").isNull() | (gap_b <= gap_f)
    )
    nid = F.when(take_back, F.col("b_id")).otherwise(F.col("f_id"))
    nts = F.when(take_back, F.col("b_ts")).otherwise(F.col("f_ts"))
    return j.select(
        "event_id",
        "user_id",
        "ts",
        nid.alias("nearest_error_id"),
        nts.alias("nearest_error_ts"),
        # gap can be NEGATIVE (error before the view); whole seconds
        # truncate TOWARD ZERO on both sides — DuckDB's integer // is
        # truncating (verified: -140145.3 -> -140145), and the double
        # division + long cast here truncates identically
        (
            (F.unix_micros(nts) - F.unix_micros(F.col("ts")))
            / F.lit(1000000)
        )
        .cast("long")
        .alias("gap_secs"),
    )
