"""Window-function operators (SURVEY.md §2.5).

The reference stores API-precomputed deltas/ranks (rank_inten, audi_inten,
sales_acc — sqlite_connector.py:27-31); here each is derived natively with
a window, which is the correct posture at scale: the engine owns the
derivation instead of trusting an upstream feed.

Oracle note: ``events.ts`` is nanosecond-precision in parquet; Spark reads
it truncated to microseconds (see tables.py). Every oracle over events goes
through the ``_EVENTS_US`` CTE so both engines window over identical values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from boxoffice_spark.functions.numeric import (
    davg,
    davg_sql,
    dsum,
    dsum_sql,
    ratio6,
    ratio6_sql,
)
from boxoffice_spark.registry import register
from boxoffice_spark.tables import EVENTS_US_SQL as _EVENTS_US, table


@register(
    "w_latest_per_key",
    oracle=f"""
    WITH ev AS ({_EVENTS_US}),
    ranked AS (
        SELECT *,
            ROW_NUMBER() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC
            ) AS rn
        FROM ev
    )
    SELECT event_id, ts, user_id, event_type, value
    FROM ranked WHERE rn = 1
    """,
    bench=True,
    tags=("window", "latest"),
)
def w_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1/T3: latest-row-per-group (reference dashboard.py:105-118
    ROW_NUMBER ... PARTITION BY event_id, theater_name ORDER BY scraped_at
    DESC, rn=1 — the 'current stock' view over the append-only log).
    event_id breaks same-microsecond ties deterministically."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "ts", "user_id", "event_type", "value")
    )


@register(
    "w_lag_delta",
    oracle="""
    SELECT
        o_custkey,
        o_orderkey,
        o_orderdate,
        o_totalprice,
        o_totalprice - LAG(o_totalprice) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ) AS price_delta
    FROM orders
    """,
    tags=("window", "lag"),
)
def w_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: day-over-day delta via lag (reference's rank_inten/audi_inten
    columns, recomputed natively — SURVEY §2.5 W2). First row per key yields
    null, matching the reference's NEW-entry semantics."""
    o = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
        (F.col("o_totalprice") - F.lag("o_totalprice").over(w)).alias("price_delta"),
    )


@register(
    "w_cumulative_sum",
    oracle="""
    SELECT
        o_custkey,
        o_orderkey,
        o_orderdate,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2))) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS DOUBLE) AS spend_acc
    FROM orders
    """,
    tags=("window", "cumulative"),
)
def w_cumulative_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative accumulation (the reference's sales_acc/audi_acc columns,
    API-provided — recomputed as a running-frame window, SURVEY §2.5 note).
    Decimal accumulator: window-sum association order differs between
    engines (segment trees vs streaming), so double would drift."""
    o = table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(27,2)")).over(w).cast("double").alias("spend_acc"),
    )


@register(
    "w_datediff_derived",
    oracle=f"""
    SELECT
        o.o_orderpriority,
        {davg_sql("date_diff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE))")} AS avg_ship_delay,
        count(*) AS n_lines
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
    tags=("window", "datediff"),
)
def w_datediff_derived(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: datediff derived column (reference kobisdata_extractor.py:144-149
    elapsed_dt = target_dt - open_dt in days), aggregated into average
    ship delay per order priority."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    delay = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(davg(delay).alias("avg_ship_delay"), F.count("*").alias("n_lines"))
    )


@register(
    "w_rank_derive",
    oracle="""
    SELECT
        o_orderkey,
        o_orderdate,
        o_totalprice,
        CAST(RANK() OVER (PARTITION BY o_orderdate ORDER BY o_totalprice DESC) AS INT) AS rnk,
        CAST(DENSE_RANK() OVER (PARTITION BY o_orderdate ORDER BY o_totalprice DESC) AS INT) AS drnk
    FROM orders
    WHERE o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1995-06-30'
    """,
    tags=("window", "rank"),
)
def w_rank_derive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4: derive the daily rank natively rather than trusting the source's
    rank column (reference dashboard.py:84 consumes a stored rank; SURVEY
    §2.5 W4 mandates recomputation). rank/dense_rank are tie-stable: equal
    prices get equal ranks, so no artificial tie-break is needed."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderdate").between("1995-01-01", "1995-06-30"))
    w = W.partitionBy("o_orderdate").orderBy(F.desc("o_totalprice"))
    return o.select(
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@register(
    "w_trailing_range_sum",
    oracle=f"""
    WITH ev AS ({_EVENTS_US})
    SELECT event_id, user_id, ts,
           round(CAST(sum(CAST(value AS DECIMAL(27,4))) OVER (
               PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
           ) AS DOUBLE), 4) AS value_1h,
           CAST(count(*) OVER (
               PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_1h
    FROM ev
    """,
    tags=("window", "range-frame", "temporal"),
)
def w_trailing_range_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing one-hour rolling sum/count per user — a RANGE frame over
    event time, not a ROWS frame: the frame holds every event within the
    last hour regardless of how many there are. The per-key velocity /
    rate-limit signal. One shuffle on user_id; the frame scan is a single
    ordered pass per partition (no self-join, no interval explode).

    Spark's RANGE frame needs a numeric ordering column; ordering by
    unix_micros(ts) with a 3.6e9-microsecond preceding bound is the exact
    event-time window, and ties (same-microsecond events) are handled
    identically in both engines because RANGE frames include ALL peers of
    the current value. The frame sum goes through DECIMAL like every other
    double aggregate here: engines associate sliding-frame sums
    differently (re-scan vs segment tree), so a raw double frame sum is
    not bit-reproducible across engines — the repo-wide decimal rule
    applies to window frames too."""
    ev = table(spark, sf_dir, "events")
    hour_us = 3_600_000_000
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-hour_us, W.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.round(
            F.sum(F.col("value").cast("decimal(27,4)")).over(w).cast("double"), 4
        ).alias("value_1h"),
        F.count("*").over(w).alias("n_1h"),
    )


@register(
    "w_ntile_quartiles",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           CAST(ntile(4) OVER (ORDER BY o_totalprice DESC, o_orderkey) AS INT)
               AS price_quartile,
           round(percent_rank() OVER (ORDER BY o_totalprice DESC, o_orderkey), 6)
               AS price_pct_rank
    FROM orders
    WHERE o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1997-02-01'
    """,
    tags=("window", "ntile"),
)
def w_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile + percentile-rank assignment over one month of orders —
    the score-binning shape (spend tiers, quality percentiles). A global
    ORDER BY window is inherently single-partition, so the month filter
    (pushed to the parquet scan) bounds what flows into it; unbounded
    percentile assignment at corpus scale belongs to approx_percentile
    bucketing (a_approx_stats) instead — the deliberate contrast is the
    point of this query's docstring."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-02-01")
    )
    w = W.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.ntile(4).over(w).alias("price_quartile"),
        F.round(F.percent_rank().over(w), 6).alias("price_pct_rank"),
    )


@register(
    "w_gap_fill_locf",
    oracle="""
    WITH sparse AS (
        SELECT o_orderstatus AS status, CAST(o_orderdate AS DATE) AS day,
               cast(sum(cast(o_totalprice as decimal(27,2))) as double) AS revenue
        FROM orders
        WHERE o_orderkey % 97 = 0
          AND o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1995-06-30'
        GROUP BY 1, 2
    ), days AS (
        SELECT unnest(generate_series(DATE '1995-01-01', DATE '1995-06-30',
                                      INTERVAL 1 DAY))::DATE AS day
    ), scaffold AS (
        SELECT s.status, d.day
        FROM (SELECT DISTINCT status FROM sparse) s CROSS JOIN days d
    )
    SELECT sc.status, sc.day,
           sp.revenue AS revenue_raw,
           last_value(sp.revenue IGNORE NULLS) OVER (
               PARTITION BY sc.status ORDER BY sc.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS revenue_filled,
           sp.revenue IS NULL AS is_gap
    FROM scaffold sc LEFT JOIN sparse sp
      ON sp.status = sc.status AND sp.day = sc.day
    """,
    tags=("window", "timeseries", "gap-fill"),
)
def w_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series regularization: a complete (status x day) scaffold over
    a sparse daily-revenue series, filled by last-observation-carried-
    forward — the resample/ffill step every downstream chart or model
    expects, as a window over the scaffolded left join (ignoreNulls last()
    over an unbounded-preceding frame). The scaffold is generated
    in-plan (sequence + explode x the distinct group dim) so no calendar
    table needs to exist; at scale the scaffold is |groups| x |days| —
    tiny next to the fact table, and the join shuffles the SPARSE side
    only (the scaffold broadcasts)."""
    from boxoffice_spark.functions.numeric import dsum

    o = table(spark, sf_dir, "orders")
    sparse = (
        o.filter(
            (F.col("o_orderkey") % 97 == 0)
            & F.col("o_orderdate").between("1995-01-01", "1995-06-30")
        )
        .groupBy(
            F.col("o_orderstatus").alias("status"),
            F.to_date("o_orderdate").alias("day"),
        )
        .agg(dsum("o_totalprice", scale=2).alias("revenue"))
    )
    days = spark.sql(
        "SELECT explode(sequence(DATE'1995-01-01', DATE'1995-06-30', interval 1 day)) AS day"
    )
    scaffold = sparse.select("status").distinct().crossJoin(F.broadcast(days))
    w = W.partitionBy("status").orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    return (
        scaffold.join(sparse, ["status", "day"], "left")
        .select(
            "status",
            "day",
            F.col("revenue").alias("revenue_raw"),
            F.last("revenue", ignorenulls=True).over(w).alias("revenue_filled"),
            F.col("revenue").isNull().alias("is_gap"),
        )
    )


@register(
    "w_ewma_daily_revenue",
    oracle=f"""
    WITH daily AS (
        SELECT o_orderstatus AS status, CAST(o_orderdate AS DATE) AS day,
               {dsum_sql('o_totalprice', 2)} AS revenue
        FROM orders
        WHERE o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1995-06-30'
        GROUP BY 1, 2
    ), series AS (
        SELECT status,
               list(day ORDER BY day) AS days,
               list(revenue ORDER BY day) AS revs
        FROM daily GROUP BY status
    )
    SELECT status, unnest(days) AS day, unnest(revs) AS revenue,
           unnest(list_transform(range(1, len(revs)+1),
               i -> round(list_reduce(revs[1:i], (acc, x) -> 0.3*x + 0.7*acc), 6)))
               AS ewma
    FROM series
    """,
    tags=("window", "timeseries", "pandas-op"),
)
def w_ewma_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-status EWMA (alpha=0.3) of daily revenue — the anomaly-baseline
    smoother, via the canonical groupBy().applyInPandas per-key ordered
    recursion (operators/temporal.ewma_by_key): EWMA's y_t = a*x_t +
    (1-a)*y_{t-1} recursion is not expressible as a SQL window FRAME —
    but it IS expressible as a per-key list fold, which is exactly what
    the DuckDB oracle does (list_reduce prefix folds per row, identical
    IEEE recursion, 6dp-rounded on both sides), upgrading this from
    rows-only to a cell-exact oracle row. tests/test_temporal.py
    additionally asserts partitioning-independence."""
    from boxoffice_spark.functions.numeric import dsum
    from boxoffice_spark.operators.temporal import ewma_by_key

    o = table(spark, sf_dir, "orders")
    daily = (
        o.filter(F.col("o_orderdate").between("1995-01-01", "1995-06-30"))
        .groupBy(
            F.col("o_orderstatus").alias("status"),
            F.to_date("o_orderdate").alias("day"),
        )
        .agg(dsum("o_totalprice", scale=2).alias("revenue"))
    )
    return ewma_by_key(daily, ["status"], "day", "revenue", alpha=0.3)


@register(
    "w_event_funnel",
    oracle=f"""
    WITH ev AS (
        SELECT * FROM ({_EVENTS_US}) WHERE event_id % 7 = 0
    ),
    per_user AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'view' THEN ts END) AS view_ts
        FROM ev GROUP BY 1
    ),
    clicked AS (
        SELECT p.user_id, p.view_ts, min(e.ts) AS click_ts
        FROM per_user p
        LEFT JOIN ev e
          ON e.user_id = p.user_id AND e.event_type = 'click'
         AND e.ts >= p.view_ts
        GROUP BY 1, 2
    ),
    purchased AS (
        SELECT c.user_id, c.view_ts, c.click_ts, min(e.ts) AS purchase_ts
        FROM clicked c
        LEFT JOIN ev e
          ON e.user_id = c.user_id AND e.event_type = 'purchase'
         AND e.ts >= c.click_ts
        GROUP BY 1, 2, 3
    )
    SELECT count(*) AS n_users,
           count(view_ts) AS n_viewed,
           count(click_ts) AS n_clicked,
           count(purchase_ts) AS n_purchased,
           round(CAST(count(click_ts) AS DOUBLE)
                 / nullif(count(view_ts), 0), 6) AS view_to_click,
           round(CAST(count(purchase_ts) AS DOUBLE)
                 / nullif(count(click_ts), 0), 6) AS click_to_purchase
    FROM purchased
    """,
    tags=("window", "funnel", "sequence"),
)
def w_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view -> click -> purchase: for each user,
    the first view, the first click AT OR AFTER that view, and the first
    purchase at or after that click — strict event-ORDER matching, not
    mere per-type existence (a purchase before any view does not count).

    Shape at 100 TB: ONE shuffle on user_id; the three stage timestamps
    are chained conditional-min window aggregates over that single
    partitioning (WindowExec chain reuses the exchange — no self-joins,
    no per-user collects), then a single-row global rollup. The oracle
    spells the same semantics as left-join chains, which is how a naive
    engine would execute it (per-stage self-joins); the window form reads
    the event log exactly once. The deterministic ``event_id % 7``
    campaign slice keeps the funnel non-trivial at every SF (without it
    the dense fixture completes all stages for all users)."""
    ev = table(spark, sf_dir, "events").filter(F.col("event_id") % 7 == 0)
    w = W.partitionBy("user_id")
    staged = (
        ev.withColumn(
            "view_ts", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
        )
        .withColumn(
            "click_ts",
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts") >= F.col("view_ts")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "purchase_ts",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") >= F.col("click_ts")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.first("view_ts").alias("view_ts"),
        F.first("click_ts").alias("click_ts"),
        F.first("purchase_ts").alias("purchase_ts"),
    )
    return per_user.agg(
        F.count("*").alias("n_users"),
        F.count("view_ts").alias("n_viewed"),
        F.count("click_ts").alias("n_clicked"),
        F.count("purchase_ts").alias("n_purchased"),
        F.round(
            F.count("click_ts").cast("double")
            / F.nullif(F.count("view_ts"), F.lit(0)),
            6,
        ).alias("view_to_click"),
        F.round(
            F.count("purchase_ts").cast("double")
            / F.nullif(F.count("click_ts"), F.lit(0)),
            6,
        ).alias("click_to_purchase"),
    )


@register(
    "w_cohort_retention",
    oracle=f"""
    WITH ev AS (
        SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
        FROM ({_EVENTS_US})
    ),
    firsts AS (
        SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY 1
    ),
    activity AS (
        SELECT DISTINCT e.user_id, f.cohort_day,
               datediff('day', f.cohort_day, e.day) AS day_offset
        FROM ev e JOIN firsts f USING (user_id)
    ),
    sizes AS (
        SELECT cohort_day, count(*) AS cohort_size FROM firsts GROUP BY 1
    )
    SELECT a.cohort_day, CAST(a.day_offset AS BIGINT) AS day_offset,
           count(*) AS n_active, s.cohort_size,
           round(CAST(count(*) AS DOUBLE) / s.cohort_size, 6) AS retention
    FROM activity a JOIN sizes s USING (cohort_day)
    WHERE a.day_offset <= 7
    GROUP BY 1, 2, s.cohort_size
    """,
    tags=("window", "cohort", "retention"),
)
def w_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by FIRST-activity day, tracked by
    day offset — the day-N retention triangle (offsets 0..7) every
    product-analytics stack computes. retention = distinct active users
    at offset / cohort size.

    Shape at 100 TB: one shuffle on user_id computes each user's cohort
    day as a window min (no self-join back to the event log — the window
    reuses the exchange), a distinct per (user, offset) on the same
    partitioning, then a small (cohorts x offsets) aggregate; cohort
    sizes join broadcast. The offset cap bounds output to a triangle."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    w = W.partitionBy("user_id")
    acts = (
        ev.withColumn("cohort_day", F.min("day").over(w))
        .withColumn("day_offset", F.datediff("day", F.col("cohort_day")))
        .filter(F.col("day_offset") <= 7)
        .select("user_id", "cohort_day", "day_offset")
        .distinct()
    )
    sizes = (
        ev.groupBy("user_id")
        .agg(F.min("day").alias("cohort_day"))
        .groupBy("cohort_day")
        .agg(F.count("*").alias("cohort_size"))
    )
    return (
        acts.groupBy("cohort_day", F.col("day_offset").cast("long").alias("day_offset"))
        .agg(F.count("*").alias("n_active"))
        .join(F.broadcast(sizes), "cohort_day")
        .select(
            "cohort_day",
            "day_offset",
            "n_active",
            "cohort_size",
            F.round(
                F.col("n_active").cast("double") / F.col("cohort_size"), 6
            ).alias("retention"),
        )
    )


@register(
    "w_anomaly_zscore",
    oracle="""
    WITH daily AS (
        SELECT o_orderstatus AS status, CAST(o_orderdate AS DATE) AS day,
               sum(CAST(o_totalprice AS DECIMAL(27,2))) AS rev_dec
        FROM orders GROUP BY 1, 2
    ),
    base AS (
        SELECT status, day, rev_dec, CAST(rev_dec AS DOUBLE) AS rev_d,
               CAST(CAST(rev_dec AS DOUBLE) * CAST(rev_dec AS DOUBLE)
                    AS DECIMAL(38,4)) AS rev2_dec
        FROM daily
    ),
    win AS (
        SELECT status, day, rev_d,
            CAST(sum(rev_dec) OVER w AS DOUBLE) AS s1,
            CAST(sum(rev2_dec) OVER w AS DOUBLE) AS s2,
            count(*) OVER w AS n_obs
        FROM base
        WINDOW w AS (PARTITION BY status ORDER BY day
                     ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    ),
    scored AS (
        SELECT status, day, rev_d, n_obs,
            s1 / n_obs AS mean_raw,
            CASE WHEN n_obs >= 2 THEN
                sqrt(greatest((s2 - s1 * s1 / n_obs) / (n_obs - 1),
                              CAST(0 AS DOUBLE)))
            END AS std_raw
        FROM win
    )
    SELECT status, day, round(rev_d, 2) AS revenue,
        CAST(n_obs AS BIGINT) AS n_obs,
        round(mean_raw, 6) AS mean_7d,
        -- std at 2dp, not 6: the second-moment window sum is a
        -- DECIMAL(38,4) in the 1e14 range, and its decimal->double
        -- conversion can differ by 1 ulp between engines (~5e-9 in the
        -- sqrt) — harmless to zscore (relative 1e-15) but enough to flip
        -- a 6dp rounding boundary a few times per 10k rows at sf0.1
        round(std_raw, 2) AS std_7d,
        round(CASE WHEN std_raw > 0 THEN (rev_d - mean_raw) / std_raw END, 6)
            AS zscore,
        coalesce(CASE WHEN std_raw > 0
                      THEN abs((rev_d - mean_raw) / std_raw) > 2.5 END,
                 FALSE) AS is_anomaly
    FROM scored
    ORDER BY status, day
    """,
    tags=("window", "timeseries", "anomaly"),
)
def w_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window z-score anomaly flags on daily revenue per order
    status: each day scored against the mean/std of its previous seven
    days, |z| > 2.5 flagged — the ops-monitoring gate that catches a feed
    double-posting or dropping a day (the EWMA query smooths; this one
    alarms).

    Determinism is the whole trick: a windowed stddev over doubles is
    accumulation-order-dependent, so mean and variance are derived from
    DECIMAL window sums (sum and sum-of-squares, exact, order-free) cast
    to double only for the final IEEE divisions/sqrt — bit-identical in
    both engines, hence a cell-exact oracle (the same posture as
    functions/numeric.dsum, extended to second moments).

    Scale: one shuffle to the per-(status, day) aggregate, then windows
    over the post-aggregation frame (≤ days × statuses rows — bounded,
    partitioned by status, never the fact table)."""
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderstatus").alias("status"),
        F.to_date("o_orderdate").alias("day"),
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(27,2)")).alias("rev_dec"))
    base = daily.select(
        "status",
        "day",
        "rev_dec",
        F.col("rev_dec").cast("double").alias("rev_d"),
    ).withColumn(
        "rev2_dec", (F.col("rev_d") * F.col("rev_d")).cast("decimal(38,4)")
    )
    w = W.partitionBy("status").orderBy("day").rowsBetween(-7, -1)
    win = base.select(
        "status",
        "day",
        "rev_d",
        F.sum("rev_dec").over(w).cast("double").alias("s1"),
        F.sum("rev2_dec").over(w).cast("double").alias("s2"),
        F.count("*").over(w).alias("n_obs"),
    )
    mean_raw = F.col("s1") / F.col("n_obs")
    std_raw = F.when(
        F.col("n_obs") >= 2,
        F.sqrt(
            F.greatest(
                (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n_obs"))
                / (F.col("n_obs") - 1),
                F.lit(0.0),
            )
        ),
    )
    scored = win.select(
        "status",
        "day",
        "rev_d",
        "n_obs",
        mean_raw.alias("mean_raw"),
        std_raw.alias("std_raw"),
    )
    z = F.when(
        F.col("std_raw") > 0, (F.col("rev_d") - F.col("mean_raw")) / F.col("std_raw")
    )
    return scored.select(
        "status",
        "day",
        F.round("rev_d", 2).alias("revenue"),
        F.col("n_obs").cast("long").alias("n_obs"),
        F.round("mean_raw", 6).alias("mean_7d"),
        F.round("std_raw", 2).alias("std_7d"),
        F.round(z, 6).alias("zscore"),
        F.coalesce(
            F.when(
                F.col("std_raw") > 0,
                F.abs((F.col("rev_d") - F.col("mean_raw")) / F.col("std_raw")) > 2.5,
            ),
            F.lit(False),
        ).alias("is_anomaly"),
    ).orderBy("status", "day")


@register(
    "w_rolling_hll_distinct",
    oracle=None,
    tags=("window", "sketch", "approx"),
)
def w_rolling_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users per day, via DataSketches HLL
    union over a window — the sliding-MAU/WAU counter. Spark has no
    COUNT(DISTINCT) window function (it would need per-user state in
    every frame); the mergeable-sketch formulation is the idiomatic
    answer: ONE per-day sketch aggregate, then hll_union_agg over a
    7-row trailing window unions 7 tiny sketches per output row — the
    raw log is scanned once, never re-joined per window frame.

    Rows-only (estimates are engine-specific); the 5%-vs-exact contract
    and the union-vs-direct consistency are asserted in
    tests/test_round5_ops.py against the exact interval self-join, which
    is precisely the expensive plan this query exists to replace.

    At 100 TB: daily sketches are KBs; the window runs over ~days rows.
    The same standing sketch table serves ANY trailing grain (7/28/91
    days) without touching the log again."""
    ev = table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    daily = ev.groupBy("day").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("n_users_1d"),
    )
    w = W.orderBy("day").rowsBetween(-6, 0)
    # the window input is the per-day aggregate (~days rows, bounded) —
    # the same post-aggregation posture as w_anomaly_zscore; a production
    # deployment partitions by (year) or tenant if days grow unbounded
    return daily.select(
        "day",
        "n_users_1d",
        F.hll_sketch_estimate(F.hll_union_agg("sk").over(w)).alias(
            "n_users_7d_approx"
        ),
        F.count("*").over(w).cast("long").alias("n_days_in_window"),
    ).orderBy("day")


@register(
    "w_rfm_segments",
    oracle=f"""
    WITH rfm AS (
        SELECT o_custkey,
            datediff('day', CAST(max(o_orderdate) AS DATE), DATE '1998-08-02')
                AS recency_days,
            count(*) AS frequency,
            {dsum_sql('o_totalprice')} AS monetary
        FROM orders GROUP BY 1
    ),
    q AS (
        SELECT
            quantile_cont(recency_days, 0.25) AS r25,
            quantile_cont(recency_days, 0.50) AS r50,
            quantile_cont(recency_days, 0.75) AS r75,
            quantile_cont(frequency, 0.25) AS f25,
            quantile_cont(frequency, 0.50) AS f50,
            quantile_cont(frequency, 0.75) AS f75,
            quantile_cont(monetary, 0.25) AS m25,
            quantile_cont(monetary, 0.50) AS m50,
            quantile_cont(monetary, 0.75) AS m75
        FROM rfm
    ),
    scored AS (
        SELECT o_custkey, recency_days, frequency, monetary,
            1 + CAST(recency_days < r75 AS INT) + CAST(recency_days < r50 AS INT)
              + CAST(recency_days < r25 AS INT) AS r_score,
            1 + CAST(frequency > f25 AS INT) + CAST(frequency > f50 AS INT)
              + CAST(frequency > f75 AS INT) AS f_score,
            1 + CAST(monetary > m25 AS INT) + CAST(monetary > m50 AS INT)
              + CAST(monetary > m75 AS INT) AS m_score
        FROM rfm CROSS JOIN q
    )
    SELECT o_custkey, recency_days, frequency,
        round(monetary, 2) AS monetary, r_score, f_score, m_score,
        CASE
            WHEN r_score >= 3 AND f_score >= 3 AND m_score >= 3 THEN 'champion'
            WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk_loyal'
            WHEN r_score >= 3 AND f_score <= 2 THEN 'recent_light'
            ELSE 'other'
        END AS segment
    FROM scored
    ORDER BY o_custkey
    """,
    tags=("window", "rfm", "segmentation"),
)
def w_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — recency / frequency / monetary
    quartile scores (1..4, 4 best) and a named segment per customer, the
    canonical CRM cut. Scored against exact interpolated quartile
    THRESHOLDS from a one-row aggregate (F.percentile <-> quantile_cont,
    the a_exact_median pairing) rather than a global ntile window: a
    global ntile is a single-partition sort (plan-gated in this repo),
    while threshold scoring broadcasts 9 doubles and keeps the scan
    embarrassingly parallel — the only wide exchange is the per-customer
    aggregate. Strict </> comparisons put boundary ties in the lower
    tile identically in both engines; at 100 TB the thresholds swap to
    the sketch path (percentile_approx) with the same scoring plan."""
    o = table(spark, sf_dir, "orders")
    rfm = o.groupBy("o_custkey").agg(
        F.datediff(
            F.lit("1998-08-02").cast("date"), F.to_date(F.max("o_orderdate"))
        ).alias("recency_days"),
        F.count("*").alias("frequency"),
        dsum("o_totalprice").alias("monetary"),
    )
    q = rfm.agg(
        *[
            F.percentile(c, F.lit(p)).alias(f"{c[0]}{int(p * 100)}")
            for c in ("recency_days", "frequency", "monetary")
            for p in (0.25, 0.50, 0.75)
        ]
    )
    lo = lambda c, t: (F.col(c) < F.col(t)).cast("int")  # noqa: E731
    hi = lambda c, t: (F.col(c) > F.col(t)).cast("int")  # noqa: E731
    scored = rfm.crossJoin(F.broadcast(q)).select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary",
        (1 + lo("recency_days", "r75") + lo("recency_days", "r50")
         + lo("recency_days", "r25")).alias("r_score"),
        (1 + hi("frequency", "f25") + hi("frequency", "f50")
         + hi("frequency", "f75")).alias("f_score"),
        (1 + hi("monetary", "m25") + hi("monetary", "m50")
         + hi("monetary", "m75")).alias("m_score"),
    )
    seg = (
        F.when(
            (F.col("r_score") >= 3) & (F.col("f_score") >= 3) & (F.col("m_score") >= 3),
            "champion",
        )
        .when((F.col("r_score") <= 2) & (F.col("f_score") >= 3), "at_risk_loyal")
        .when((F.col("r_score") >= 3) & (F.col("f_score") <= 2), "recent_light")
        .otherwise("other")
    )
    return scored.select(
        "o_custkey",
        "recency_days",
        "frequency",
        F.round("monetary", 2).alias("monetary"),
        "r_score",
        "f_score",
        "m_score",
        seg.alias("segment"),
    ).orderBy("o_custkey")


@register(
    "w_event_transitions",
    oracle=f"""
    WITH ev AS ({_EVENTS_US}),
    nxt AS (
        SELECT event_type AS from_type,
            LEAD(event_type) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
            ) AS to_type
        FROM ev
    ),
    t AS (
        SELECT from_type, to_type, count(*) AS n_transitions
        FROM nxt WHERE to_type IS NOT NULL
        GROUP BY 1, 2
    )
    SELECT from_type, to_type, n_transitions,
        round(
            CAST(n_transitions AS DOUBLE)
            / sum(n_transitions) OVER (PARTITION BY from_type), 6
        ) AS p_transition
    FROM t
    ORDER BY from_type, to_type
    """,
    tags=("window", "markov", "sequence"),
)
def w_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over the event stream: for
    each user's time-ordered sequence, count (from_type -> to_type)
    steps and normalize per source state — the session-flow statistic
    behind "what do users do after X" product questions and behavioral
    anomaly baselines (an improbable transition chain is a bot
    signature). LEAD over one user_id shuffle builds the steps; the
    matrix itself is |event_types|^2 rows, so the normalizing window
    runs on a bounded aggregate partitioned by from_type (never global,
    never over raw events). Ties in ts break on event_id in both
    engines. The same two-exchange plan holds at any corpus size —
    state count, not row count, bounds the output."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    t = nxt.groupBy("from_type", "to_type").agg(F.count("*").alias("n_transitions"))
    norm = W.partitionBy("from_type")
    return t.select(
        "from_type",
        "to_type",
        "n_transitions",
        F.round(
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(norm),
            6,
        ).alias("p_transition"),
    ).orderBy("from_type", "to_type")


@register(
    "w_seasonality_indices",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
            {dsum_sql('o_totalprice')} AS rev
        FROM orders GROUP BY 1
    ),
    tot AS (
        SELECT {dsum_sql('rev')} AS rev_all, count(*) AS days_all FROM daily
    ),
    dow AS (
        SELECT dayname(d) AS day_name, {dsum_sql('rev')} AS rev_dow,
            count(*) AS n_days
        FROM daily GROUP BY 1
    )
    SELECT day_name, n_days,
        round(rev_dow / n_days, 2) AS avg_daily_revenue,
        round((rev_dow / n_days) / (rev_all / days_all), 6) AS seasonal_index
    FROM dow CROSS JOIN tot
    ORDER BY day_name
    """,
    tags=("window", "seasonality", "timeseries"),
)
def w_seasonality_indices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality indices of order revenue: mean daily
    revenue per weekday divided by the overall mean daily revenue — the
    ratio-to-overall-average decomposition that normalizes a forecast or
    flags a "weekends run 20% light" pattern before anyone trusts a
    day-over-day delta. Two-level aggregation (date grain, then weekday
    grain) so a heavy single day can't smear across the week; revenue
    sums ride the decimal path at both levels (daily rev is exact at
    2dp, so the second-level decimal sum is exact too) and the index is
    mirrored IEEE division. One shuffle to dates, one 7-row aggregate,
    one broadcast one-row total — scan-bound at any scale."""
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        dsum("o_totalprice").alias("rev")
    )
    tot = daily.agg(dsum("rev").alias("rev_all"), F.count("*").alias("days_all"))
    dow = daily.groupBy(F.date_format("d", "EEEE").alias("day_name")).agg(
        dsum("rev").alias("rev_dow"), F.count("*").alias("n_days")
    )
    return (
        dow.crossJoin(F.broadcast(tot))
        .select(
            "day_name",
            "n_days",
            F.round(F.col("rev_dow") / F.col("n_days"), 2).alias(
                "avg_daily_revenue"
            ),
            F.round(
                (F.col("rev_dow") / F.col("n_days"))
                / (F.col("rev_all") / F.col("days_all")),
                6,
            ).alias("seasonal_index"),
        )
        .orderBy("day_name")
    )


@register(
    "w_cusum_changepoint",
    oracle=f"""
    WITH daily AS (
        SELECT o_orderstatus AS status, CAST(o_orderdate AS DATE) AS d,
            {dsum_sql('o_totalprice')} AS rev
        FROM orders GROUP BY 1, 2
    ),
    stats AS (
        SELECT status, count(*) AS n, {dsum_sql('rev')} AS s1,
            {dsum_sql('rev * rev', 4)} AS s2
        FROM daily GROUP BY 1
    ),
    walk AS (
        SELECT status, d,
            CAST(SUM(CAST(rev AS DECIMAL(38,2))) OVER (
                PARTITION BY status ORDER BY d
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) AS DOUBLE) AS cum,
            ROW_NUMBER() OVER (PARTITION BY status ORDER BY d) AS t
        FROM daily
    ),
    scored AS (
        SELECT w.status, w.d,
            abs(w.cum - w.t * (s.s1 / s.n)) AS stat,
            s.n, s.s1, s.s2,
            ROW_NUMBER() OVER (
                PARTITION BY w.status
                ORDER BY abs(w.cum - w.t * (s.s1 / s.n)) DESC, w.d
            ) AS rn
        FROM walk w JOIN stats s ON s.status = w.status
    )
    SELECT status, n AS n_days, d AS changepoint_date,
        round(stat, 4) AS max_abs_cusum,
        round(stat / sqrt(((s2 - s1 * s1 / n) / (n - 1)) * n), 6)
            AS norm_stat
    FROM scored WHERE rn = 1
    ORDER BY status
    """,
    tags=("window", "changepoint", "timeseries"),
)
def w_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM mean-shift change-point estimate per order status: the day
    t maximizing |sum(rev_1..t) - t*mean| — where the cumulative walk of
    deviations from the series mean turns around, i.e. the classic
    cumulative-sum estimator of WHEN a level shift happened (the
    follow-up question to w_anomaly_zscore's "something is off today").
    Reports the argmax date, the max |CUSUM|, and the normalized
    statistic max|S_t| / sqrt(var*n) (the Brownian-bridge scaling used
    for significance lookup).

    Determinism: the cumulative revenue rides a DECIMAL running window
    (exact at 2dp — the w_cumulative_sum rule), the mean enters once as
    cum - t*(s1/n) in mirrored IEEE, variance comes from exact first and
    second decimal moments. Scale: one shuffle to (status, day) grain;
    all windows partition by status over the bounded daily aggregate —
    never over raw orders; per-status stats broadcast."""
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderstatus").alias("status"), F.to_date("o_orderdate").alias("d")
    ).agg(dsum("o_totalprice").alias("rev"))
    stats = daily.groupBy("status").agg(
        F.count("*").alias("n"),
        dsum("rev").alias("s1"),
        dsum(F.col("rev") * F.col("rev"), scale=4).alias("s2"),
    )
    wcum = (
        W.partitionBy("status")
        .orderBy("d")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    walk = daily.select(
        "status",
        "d",
        F.sum(F.col("rev").cast("decimal(38,2)")).over(wcum).cast("double").alias(
            "cum"
        ),
        F.row_number().over(W.partitionBy("status").orderBy("d")).alias("t"),
    )
    stat = F.abs(F.col("cum") - F.col("t") * (F.col("s1") / F.col("n")))
    scored = walk.join(F.broadcast(stats), "status").withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("status").orderBy(
                F.abs(
                    F.col("cum") - F.col("t") * (F.col("s1") / F.col("n"))
                ).desc(),
                "d",
            )
        ),
    )
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)
    return (
        scored.filter(F.col("rn") == 1)
        .select(
            "status",
            F.col("n").alias("n_days"),
            F.col("d").alias("changepoint_date"),
            F.round(stat, 4).alias("max_abs_cusum"),
            F.round(stat / F.sqrt(var * F.col("n")), 6).alias("norm_stat"),
        )
        .orderBy("status")
    )


@register(
    "w_purchase_gaps_survival",
    oracle=f"""
    WITH gaps AS (
        SELECT c.c_mktsegment AS segment,
            date_diff('day',
                LAG(CAST(o.o_orderdate AS DATE)) OVER (
                    PARTITION BY o.o_custkey
                    ORDER BY o.o_orderdate, o.o_orderkey
                ),
                CAST(o.o_orderdate AS DATE)) AS gap_days
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    )
    SELECT segment, count(*) AS n_gaps,
        {davg_sql('gap_days')} AS avg_gap_days,
        round(quantile_cont(gap_days, 0.5), 4) AS median_gap_days,
        round(CAST(sum(CASE WHEN gap_days > 30 THEN 1 ELSE 0 END) AS DOUBLE)
              / count(*), 6) AS surv_30d,
        round(CAST(sum(CASE WHEN gap_days > 90 THEN 1 ELSE 0 END) AS DOUBLE)
              / count(*), 6) AS surv_90d,
        round(CAST(sum(CASE WHEN gap_days > 365 THEN 1 ELSE 0 END) AS DOUBLE)
              / count(*), 6) AS surv_365d
    FROM gaps WHERE gap_days IS NOT NULL
    GROUP BY segment
    ORDER BY segment
    """,
    tags=("window", "survival", "retention"),
)
def w_purchase_gaps_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase-interval survival per market segment: the
    distribution of days between a customer's consecutive orders —
    mean, exact median, and the empirical survival fractions S(30)/
    S(90)/S(365) (share of gaps longer than t) — the repurchase-cycle /
    churn-horizon statistic that calibrates "customer is lapsed after N
    days" rules, which w_cohort_retention's fixed day-offsets can't
    express. LAG over one per-customer window builds the gaps; the
    survival readout is a single grouped aggregate over them.

    Cell-exact: gaps are exact integer day counts, the mean rides
    davg's decimal path, the median is the F.percentile <->
    quantile_cont pairing, and survival shares are integer-count IEEE
    divisions. Scale: one customer-key window over orders, one
    |segments|-row aggregate — no self-join, no per-customer collect."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    wlag = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.datediff(
                F.to_date("o_orderdate"),
                F.lag(F.to_date("o_orderdate")).over(wlag),
            ).alias("gap_days"),
        )
        .filter(F.col("gap_days").isNotNull())
    )
    surv = lambda t: F.round(  # noqa: E731
        F.sum(F.when(F.col("gap_days") > t, 1).otherwise(0)).cast("double")
        / F.count("*"),
        6,
    )
    return (
        gaps.groupBy("segment")
        .agg(
            F.count("*").alias("n_gaps"),
            davg("gap_days").alias("avg_gap_days"),
            F.round(F.percentile("gap_days", F.lit(0.5)), 4).alias(
                "median_gap_days"
            ),
            surv(30).alias("surv_30d"),
            surv(90).alias("surv_90d"),
            surv(365).alias("surv_365d"),
        )
        .orderBy("segment")
    )


@register(
    "w_holt_trend",
    oracle=None,
    tags=("window", "timeseries", "pandas-op"),
)
def w_holt_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-status Holt double-exponential smoothing of daily revenue
    (level + trend + one-step forecast) — what the EWMA baseline can't
    give: an explicit trend state, so a sustained ramp forecasts ahead
    instead of lagging behind (operators/temporal.holt_by_key). Rows-only
    by construction: the coupled two-state recursion is neither a SQL
    window frame nor a scalar list fold; numpy-reference equality,
    repartition invariance, and constant/linear fixed points are pinned
    in tests/test_temporal.py. Same applyInPandas scale contract as
    w_ewma_daily_revenue: one (status) group's daily series in worker
    memory at a time — the series length is calendar-bounded."""
    from boxoffice_spark.functions.numeric import dsum
    from boxoffice_spark.operators.temporal import holt_by_key

    o = table(spark, sf_dir, "orders")
    daily = (
        o.filter(F.col("o_orderdate").between("1995-01-01", "1995-06-30"))
        .groupBy(
            F.col("o_orderstatus").alias("status"),
            F.to_date("o_orderdate").alias("day"),
        )
        .agg(dsum("o_totalprice", scale=2).alias("revenue"))
    )
    return holt_by_key(daily, ["status"], "day", "revenue", alpha=0.5, beta=0.3)


@register(
    "w_funnel_latency",
    oracle=f"""
    WITH ev AS (
        SELECT * FROM ({_EVENTS_US}) WHERE event_id % 7 = 0
    ),
    per_user AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'view' THEN ts END) AS view_ts
        FROM ev GROUP BY 1
    ),
    clicked AS (
        SELECT p.user_id, p.view_ts, min(e.ts) AS click_ts
        FROM per_user p
        LEFT JOIN ev e
          ON e.user_id = p.user_id AND e.event_type = 'click'
         AND e.ts >= p.view_ts
        GROUP BY 1, 2
    ),
    purchased AS (
        SELECT c.user_id, c.view_ts, c.click_ts, min(e.ts) AS purchase_ts
        FROM clicked c
        LEFT JOIN ev e
          ON e.user_id = c.user_id AND e.event_type = 'purchase'
         AND e.ts >= c.click_ts
        GROUP BY 1, 2, 3
    ),
    lat AS (
        SELECT
            CAST(epoch_us(click_ts) - epoch_us(view_ts) AS DOUBLE) / 1000000
                AS vc_secs,
            CAST(epoch_us(purchase_ts) - epoch_us(click_ts) AS DOUBLE) / 1000000
                AS cp_secs
        FROM purchased
    )
    SELECT count(vc_secs) AS n_vc,
        round(quantile_cont(vc_secs, 0.5), 4) AS p50_vc_secs,
        round(quantile_cont(vc_secs, 0.9), 4) AS p90_vc_secs,
        count(cp_secs) AS n_cp,
        round(quantile_cont(cp_secs, 0.5), 4) AS p50_cp_secs,
        round(quantile_cont(cp_secs, 0.9), 4) AS p90_cp_secs
    FROM lat
    """,
    tags=("window", "funnel", "latency"),
)
def w_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert percentiles for the ordered view->click->purchase
    funnel — w_event_funnel answers HOW MANY users convert, this answers
    HOW LONG each hop takes (p50/p90 seconds), which is what an SLA or a
    campaign-attribution window is calibrated against. Same single
    user_id window chain as the funnel (one shuffle, no self-joins);
    latencies are exact microsecond-integer differences widened to
    seconds in one mirrored expression, percentiles via the
    F.percentile <-> quantile_cont pairing. Cell-exact."""
    ev = table(spark, sf_dir, "events").filter(F.col("event_id") % 7 == 0)
    w = W.partitionBy("user_id")
    staged = (
        ev.withColumn(
            "view_ts",
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
        )
        .withColumn(
            "click_ts",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts") >= F.col("view_ts")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "purchase_ts",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") >= F.col("click_ts")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.first("view_ts").alias("view_ts"),
        F.first("click_ts").alias("click_ts"),
        F.first("purchase_ts").alias("purchase_ts"),
    )
    vc = (
        (F.unix_micros("click_ts") - F.unix_micros("view_ts")).cast("double")
        / 1000000
    ).alias("vc_secs")
    cp = (
        (F.unix_micros("purchase_ts") - F.unix_micros("click_ts")).cast("double")
        / 1000000
    ).alias("cp_secs")
    lat = per_user.select(vc, cp)
    return lat.agg(
        F.count("vc_secs").alias("n_vc"),
        F.round(F.percentile("vc_secs", F.lit(0.5)), 4).alias("p50_vc_secs"),
        F.round(F.percentile("vc_secs", F.lit(0.9)), 4).alias("p90_vc_secs"),
        F.count("cp_secs").alias("n_cp"),
        F.round(F.percentile("cp_secs", F.lit(0.5)), 4).alias("p50_cp_secs"),
        F.round(F.percentile("cp_secs", F.lit(0.9)), 4).alias("p90_cp_secs"),
    )


@register(
    "w_max_concurrency",
    oracle=f"""
    WITH ev AS ({_EVENTS_US}),
    gaps AS (
        SELECT user_id, event_id, ts,
            CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                      > INTERVAL 30 MINUTE
                 THEN 1 ELSE 0 END AS is_new_session
        FROM ev
    ),
    sess AS (
        SELECT user_id,
            SUM(is_new_session) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) AS session_id,
            ts
        FROM gaps
    ),
    intervals AS (
        SELECT user_id, session_id,
            min(ts) AS s_start, max(ts) AS s_end
        FROM sess GROUP BY 1, 2
    ),
    bounds AS (
        SELECT s_start AS ts, 1 AS plus, 0 AS minus FROM intervals
        UNION ALL
        SELECT s_end, 0, 1 FROM intervals
    ),
    per_ts AS (
        SELECT ts, CAST(sum(plus) AS BIGINT) AS plus,
            CAST(sum(minus) AS BIGINT) AS minus
        FROM bounds GROUP BY 1
    ),
    walk AS (
        SELECT ts, plus,
            SUM(plus - minus) OVER (
                ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) - (plus - minus) + plus AS peak_at_ts
        FROM per_ts
    )
    SELECT (SELECT count(*) FROM intervals) AS n_sessions,
        CAST(max(peak_at_ts) AS BIGINT) AS peak_concurrency,
        min(CASE WHEN peak_at_ts = (SELECT max(peak_at_ts) FROM walk)
                 THEN ts END) AS peak_ts
    FROM walk
    """,
    tags=("window", "sweepline", "concurrency"),
)
def w_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions and when it happened — the sweep-line
    question behind capacity planning ("how many simultaneous users must
    we serve") that pairwise interval joins can't answer: sessions (the
    i_sessionize 30-min-gap derivation) become +1/-1 boundary events on
    one timeline, aggregated per distinct timestamp so the peak is
    order-independent inside a tie group (after all of a timestamp's
    starts and before its ends, concurrency = running_net_before + plus
    — closed intervals, so a session ending at t overlaps one starting
    at t). Cell-exact: all integer arithmetic.

    Scale shape — a DISTRIBUTED PREFIX SUM, not one global sort of raw
    boundaries: the within-hour running net is a window PARTITIONED by
    the hour bucket; each bucket's exclusive starting offset is a
    cumulative sum over the per-bucket totals, a window over the
    BOUNDED |hours| aggregate (allowlisted in the plan gate on that
    argument — the calendar bounds it, not the event volume). Raw
    events are touched by exactly the sessionize windows; everything
    after runs on per-timestamp then per-bucket aggregates."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    sess = (
        ev.withColumn(
            "is_new_session", F.when(gap > 30 * 60 * 1_000_000, 1).otherwise(0)
        )
        .withColumn(
            "session_id",
            F.sum("is_new_session").over(
                w.rowsBetween(W.unboundedPreceding, W.currentRow)
            ),
        )
        .groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("s_start"), F.max("ts").alias("s_end"))
    )
    from boxoffice_spark.functions.caching import scoped_persist

    sess = scoped_persist(sess, "w_max_concurrency.sessions")
    bounds = sess.select(
        F.col("s_start").alias("ts"), F.lit(1).alias("plus"), F.lit(0).alias("minus")
    ).unionAll(
        sess.select(F.col("s_end").alias("ts"), F.lit(0), F.lit(1))
    )
    per_ts = bounds.groupBy("ts").agg(
        F.sum("plus").cast("long").alias("plus"),
        F.sum("minus").cast("long").alias("minus"),
    )
    # distributed prefix sum: hour-partitioned running net + exclusive
    # per-bucket offsets from the bounded bucket aggregate
    per_ts = per_ts.withColumn("bucket", F.date_trunc("hour", F.col("ts")))
    wb = (
        W.partitionBy("bucket")
        .orderBy("ts")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    in_bucket = per_ts.withColumn(
        "run_in_bucket", F.sum(F.col("plus") - F.col("minus")).over(wb)
    )
    bucket_tot = per_ts.groupBy("bucket").agg(
        F.sum(F.col("plus") - F.col("minus")).alias("net")
    )
    wo = (
        W.orderBy("bucket").rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    offsets = bucket_tot.select(
        "bucket", (F.sum("net").over(wo) - F.col("net")).alias("offset")
    )
    walk = in_bucket.join(F.broadcast(offsets), "bucket").select(
        "ts",
        (
            F.col("offset")
            + F.col("run_in_bucket")
            - (F.col("plus") - F.col("minus"))
            + F.col("plus")
        ).alias("peak_at_ts"),
    )
    n_sessions = sess.agg(F.count("*").alias("n")).select("n")
    peak = walk.agg(F.max("peak_at_ts").alias("m"))
    return (
        walk.crossJoin(F.broadcast(peak))
        .crossJoin(F.broadcast(n_sessions))
        .agg(
            F.first("n").alias("n_sessions"),
            F.first("m").cast("long").alias("peak_concurrency"),
            F.min(F.when(F.col("peak_at_ts") == F.col("m"), F.col("ts"))).alias(
                "peak_ts"
            ),
        )
    )


@register(
    "w_yoy_growth",
    oracle=f"""
    WITH monthly AS (
        SELECT o_orderstatus AS status,
            CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE)
                AS month,
            {dsum_sql('o_totalprice')} AS revenue
        FROM orders GROUP BY 1, 2
    )
    SELECT m.status, m.month, round(m.revenue, 2) AS revenue,
        round((m.revenue - p1.revenue) / p1.revenue, 6) AS mom_growth,
        round((m.revenue - p12.revenue) / p12.revenue, 6) AS yoy_growth
    FROM monthly m
    LEFT JOIN monthly p1 ON p1.status = m.status
        AND p1.month = m.month - INTERVAL 1 MONTH
    LEFT JOIN monthly p12 ON p12.status = m.status
        AND p12.month = m.month - INTERVAL 12 MONTH
    ORDER BY m.status, m.month
    """,
    tags=("window", "growth", "bi"),
)
def w_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month and year-over-year revenue growth per order
    status — the two deltas on every BI dashboard. The prior month and
    prior year are looked up by CALENDAR arithmetic (self-join on
    month - 1 / month - 12), not lag(k) over the row sequence: lag(12)
    silently compares against the wrong month whenever a status skips a
    month, while the explicit join yields null growth for genuinely
    missing comparison months. YoY is the seasonality-immune comparison
    (w_seasonality_indices quantifies why MoM alone misleads); first
    year rows carry null YoY by construction. Monthly revenue is
    decimal-summed (exact 2dp), growth is one mirrored IEEE division
    rounded at 6dp. The joins run over the bounded (status, month)
    aggregate — a few hundred rows regardless of order volume, so both
    sides broadcast at 100 TB."""
    o = table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.col("o_orderstatus").alias("status"),
        F.to_date(F.date_trunc("month", F.to_date("o_orderdate"))).alias("month"),
    ).agg(dsum("o_totalprice").alias("revenue"))
    rev = F.col("revenue")
    p1 = monthly.select(
        F.col("status").alias("s1"),
        F.col("month").alias("m1"),
        F.col("revenue").alias("rev_m1"),
    )
    p12 = monthly.select(
        F.col("status").alias("s12"),
        F.col("month").alias("m12"),
        F.col("revenue").alias("rev_m12"),
    )
    return (
        monthly.join(
            F.broadcast(p1),
            (F.col("status") == F.col("s1"))
            & (F.add_months(F.col("month"), -1) == F.col("m1")),
            "left",
        )
        .join(
            F.broadcast(p12),
            (F.col("status") == F.col("s12"))
            & (F.add_months(F.col("month"), -12) == F.col("m12")),
            "left",
        )
        .select(
            "status",
            "month",
            F.round(rev, 2).alias("revenue"),
            F.round((rev - F.col("rev_m1")) / F.col("rev_m1"), 6).alias(
                "mom_growth"
            ),
            F.round((rev - F.col("rev_m12")) / F.col("rev_m12"), 6).alias(
                "yoy_growth"
            ),
        )
        .orderBy("status", "month")
    )


@register(
    "w_cohort_ltv",
    oracle=f"""
    WITH firsts AS (
        SELECT o_custkey,
            min(year(CAST(o_orderdate AS DATE)) * 12
                + month(CAST(o_orderdate AS DATE))) AS cohort_idx
        FROM orders GROUP BY 1
    ),
    sizes AS (
        SELECT cohort_idx, count(*) AS cohort_size FROM firsts GROUP BY 1
    ),
    spend AS (
        SELECT f.cohort_idx,
            (year(CAST(o.o_orderdate AS DATE)) * 12
             + month(CAST(o.o_orderdate AS DATE))) - f.cohort_idx
                AS months_since,
            {dsum_sql('o.o_totalprice')} AS rev
        FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
        GROUP BY 1, 2
    ),
    walk AS (
        SELECT cohort_idx, months_since,
            CAST(SUM(CAST(rev AS DECIMAL(27,2))) OVER (
                PARTITION BY cohort_idx ORDER BY months_since
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) AS DOUBLE) AS cum_rev
        FROM spend
    )
    SELECT CAST(make_date(cohort_idx // 12, 1 + cohort_idx % 12, 1)
                - INTERVAL 1 MONTH AS DATE) AS cohort_month,
        CAST(months_since AS INT) AS months_since,
        sizes.cohort_size,
        round(cum_rev, 2) AS cum_revenue,
        round(cum_rev / sizes.cohort_size, 6) AS ltv_per_customer
    FROM walk JOIN sizes USING (cohort_idx)
    WHERE months_since <= 24
    ORDER BY cohort_month, months_since
    """,
    tags=("window", "cohort", "ltv"),
)
def w_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: customers grouped by
    first-purchase month, cumulative revenue per cohort member at each
    month offset (0..24) — the LTV trajectory that payback-period and
    acquisition-spend decisions read, and the longitudinal complement
    of w_cohort_retention's activity triangle. Month arithmetic is
    pure-integer (year*12+month) so offsets agree across engines;
    cumulative revenue rides a DECIMAL running window partitioned by
    cohort; LTV is one mirrored IEEE division. Cell-exact.

    Shape: one per-customer min-aggregate (the cohort map, broadcast
    back), one (cohort, offset) aggregate, running windows over that
    BOUNDED grid (|cohorts| x |offsets|, calendar-bounded regardless of
    order volume)."""
    o = table(spark, sf_dir, "orders")
    midx = F.year(F.to_date("o_orderdate")) * 12 + F.month(F.to_date("o_orderdate"))
    firsts = o.groupBy("o_custkey").agg(F.min(midx).alias("cohort_idx"))
    sizes = firsts.groupBy("cohort_idx").agg(F.count("*").alias("cohort_size"))
    spend = (
        o.join(firsts, "o_custkey")
        .groupBy(
            "cohort_idx",
            (midx - F.col("cohort_idx")).alias("months_since"),
        )
        .agg(dsum("o_totalprice").alias("rev"))
    )
    wcum = (
        W.partitionBy("cohort_idx")
        .orderBy("months_since")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    walk = spend.select(
        "cohort_idx",
        "months_since",
        F.sum(F.col("rev").cast("decimal(27,2)"))
        .over(wcum)
        .cast("double")
        .alias("cum_rev"),
    )
    cohort_month = F.add_months(
        F.make_date(F.floor(F.col("cohort_idx") / 12).cast("int"), (F.col("cohort_idx") % 12 + 1).cast("int"), F.lit(1)),
        -1,
    )
    return (
        walk.join(F.broadcast(sizes), "cohort_idx")
        .filter(F.col("months_since") <= 24)
        .select(
            cohort_month.alias("cohort_month"),
            F.col("months_since").cast("int").alias("months_since"),
            "cohort_size",
            F.round("cum_rev", 2).alias("cum_revenue"),
            # 6dp, the repo's division-rounding convention: cum/size is
            # an exact rational that often terminates at 3 decimals, so a
            # 2dp round sits ON .xx5 ties where the engines' round
            # implementations disagree about the same double
            F.round(F.col("cum_rev") / F.col("cohort_size"), 6).alias(
                "ltv_per_customer"
            ),
        )
        .orderBy("cohort_month", "months_since")
    )


@register(
    "w_acf_daily",
    oracle=f"""
    WITH daily AS (
        SELECT o_orderstatus AS status,
            date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
                AS x,
            {dsum_sql('o_totalprice')} AS rev
        FROM orders GROUP BY 1, 2
    ),
    m AS (
        SELECT status, {davg_sql('rev', 2)} AS mean, count(*) AS n_days
        FROM daily GROUP BY 1
    ),
    cent AS (
        SELECT d.status, x, rev - m.mean AS c, n_days
        FROM daily d JOIN m ON m.status = d.status
    ),
    den AS (
        SELECT status, n_days, {dsum_sql('round(c * c, 4)', 4)} AS denom
        FROM cent GROUP BY 1, 2
    ),
    lags AS (SELECT CAST(range AS INT) AS lag_k FROM range(1, 8)),
    num AS (
        SELECT a.status, lag_k, {dsum_sql('round(a.c * b.c, 4)', 4)} AS num,
            count(*) AS n_pairs
        FROM cent a CROSS JOIN lags
        JOIN cent b ON b.status = a.status AND b.x = a.x + lag_k
        GROUP BY 1, 2
    )
    SELECT num.status, lag_k, den.n_days, n_pairs,
        CASE WHEN denom > 0 THEN round(num / denom, 6) END AS acf
    FROM num JOIN den ON den.status = num.status
    ORDER BY num.status, lag_k
    """,
    tags=("window", "timeseries", "stats"),
)
def w_acf_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of daily revenue at calendar lags 1..7 days, per
    order status — the weekly-seasonality fingerprint that says whether
    w_seasonality_indices / w_ewma_daily_revenue should model a 7-day
    cycle at all (a spike at lag 7 is the signature).

    Calendar-exact: lag pairs come from an equi-join on (status,
    x + lag_k) over the day-index spine, so a MISSING day drops its
    pairs instead of silently shifting the comparison to the wrong day
    (the standard missing-data ACF estimator; same gap-safety call as
    the calendar-join YoY). Numerators and the variance denominator are
    4dp-rounded products decimal-summed (order-independent); the 7-lag
    spine is a 7-row broadcast cross join, not a window, so both
    engines share the identical join semantics. Statuses whose series
    is shorter than a lag simply have no row at that lag.

    At 100 TB: the only corpus-sized work is the groupBy to the daily
    grain; the lag join runs over the calendar-bounded centered table
    (|days| x 7 rows) and the readout is |status| x 7 rows."""
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderstatus").alias("status"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1992-01-01")).alias("x"),
    ).agg(dsum("o_totalprice").alias("rev"))
    m = daily.groupBy("status").agg(
        davg("rev", scale=2).alias("mean"), F.count("*").alias("n_days")
    )
    cent = daily.join(F.broadcast(m), "status").select(
        "status", "x", (F.col("rev") - F.col("mean")).alias("c"), "n_days"
    )
    den = cent.groupBy("status", "n_days").agg(
        dsum(F.round(F.col("c") * F.col("c"), 4), scale=4).alias("denom")
    )
    lags = spark.range(1, 8).select(F.col("id").cast("int").alias("lag_k"))
    a = cent.select("status", "x", F.col("c").alias("ca")).crossJoin(
        F.broadcast(lags)
    )
    b = cent.select(
        "status", F.col("x").alias("xb"), F.col("c").alias("cb")
    )
    num = (
        a.join(
            b,
            (a["status"] == b["status"]) & (b["xb"] == a["x"] + a["lag_k"]),
        )
        .select(a["status"], "lag_k", F.round(F.col("ca") * F.col("cb"), 4).alias("prod"))
        .groupBy("status", "lag_k")
        .agg(dsum("prod", scale=4).alias("num"), F.count("*").alias("n_pairs"))
    )
    return (
        num.join(F.broadcast(den), "status")
        .select(
            "status",
            "lag_k",
            "n_days",
            "n_pairs",
            F.when(
                F.col("denom") > 0, F.round(F.col("num") / F.col("denom"), 6)
            ).alias("acf"),
        )
        .orderBy("status", "lag_k")
    )


@register(
    "w_gaps_islands",
    oracle=f"""
    WITH ev AS ({_EVENTS_US}),
    days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM ev
    ),
    seq AS (
        SELECT user_id, d,
            date_diff('day', DATE '1992-01-01', d)
            - row_number() OVER (PARTITION BY user_id ORDER BY d) AS grp
        FROM days
    ),
    streaks AS (
        SELECT user_id, min(d) AS streak_start, max(d) AS streak_end,
            count(*) AS streak_days
        FROM seq GROUP BY user_id, grp
    ),
    best AS (
        SELECT *,
            row_number() OVER (
                PARTITION BY user_id
                ORDER BY streak_days DESC, streak_start
            ) AS rn,
            count(*) OVER (PARTITION BY user_id) AS n_streaks
        FROM streaks
    )
    SELECT user_id, n_streaks, streak_days AS longest_streak_days,
        streak_start AS longest_streak_start,
        streak_end AS longest_streak_end
    FROM best WHERE rn = 1
    ORDER BY user_id
    """,
    tags=("window", "sessionize"),
)
def w_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands over per-user activity days: contiguous
    consecutive-day streaks via the classic day-index-minus-row-number
    grouping key (consecutive days share a constant difference), then
    each user's longest streak (earliest-start tie-break) and streak
    count — the engagement-streak readout behind retention features,
    and the canonical islands idiom i_sessionize's timestamp-gap
    sessionizer doesn't cover (calendar-day grain, exact-consecutive
    semantics).

    Everything is partitioned by user_id: the distinct-day dedup, the
    row_number, the streak aggregate, and the longest-streak pick all
    share one hash partitioning on user — Catalyst reuses the exchange,
    so the whole plan is ONE shuffle wide. At 100 TB the per-user state
    is bounded by the calendar (a user has at most |days| rows)."""
    ev = table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.to_date("ts").alias("d")
    ).distinct()
    seq = days.select(
        "user_id",
        "d",
        (
            F.datediff(F.col("d"), F.lit("1992-01-01"))
            - F.row_number().over(W.partitionBy("user_id").orderBy("d"))
        ).alias("grp"),
    )
    streaks = seq.groupBy("user_id", "grp").agg(
        F.min("d").alias("streak_start"),
        F.max("d").alias("streak_end"),
        F.count("*").alias("streak_days"),
    )
    best = streaks.select(
        "*",
        F.row_number()
        .over(
            W.partitionBy("user_id").orderBy(
                F.desc("streak_days"), F.asc("streak_start")
            )
        )
        .alias("rn"),
        F.count("*").over(W.partitionBy("user_id")).alias("n_streaks"),
    )
    return (
        best.filter(F.col("rn") == 1)
        .select(
            "user_id",
            "n_streaks",
            F.col("streak_days").alias("longest_streak_days"),
            F.col("streak_start").alias("longest_streak_start"),
            F.col("streak_end").alias("longest_streak_end"),
        )
        .orderBy("user_id")
    )


@register(
    "w_bollinger_breakout",
    oracle=f"""
    WITH daily AS (
        SELECT o_orderstatus AS status, CAST(o_orderdate AS DATE) AS d,
            {dsum_sql('o_totalprice')} AS rev
        FROM orders GROUP BY 1, 2
    ),
    roll AS (
        SELECT status, d, rev,
            count(*) OVER w AS n_win,
            cast(sum(cast(rev as decimal(27,2))) OVER w as double) AS s1,
            cast(sum(cast(round(rev * rev, 2) as decimal(27,2))) OVER w
                 as double) AS s2
        FROM daily
        WINDOW w AS (PARTITION BY status ORDER BY d
                     ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    ),
    bands AS (
        SELECT status, d, rev, n_win,
            round(s1 / 20.0, 4) AS mid,
            round(sqrt(greatest((s2 - s1 * s1 / 20.0) / 19.0, 0.0)), 4)
                AS sd
        FROM roll WHERE n_win = 20
    )
    SELECT status, d, rev, mid, sd,
        round(mid + 2 * sd, 4) AS upper_band,
        round(mid - 2 * sd, 4) AS lower_band,
        CASE WHEN rev > mid + 2 * sd THEN 'up' ELSE 'down' END AS breakout
    FROM bands
    WHERE rev > mid + 2 * sd OR rev < mid - 2 * sd
    ORDER BY status, d
    """,
    tags=("window", "timeseries", "bands"),
)
def w_bollinger_breakout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger-band breakout days: daily revenue per status against a
    20-day trailing mean +/- 2 trailing stddevs — the self-calibrating
    volatility envelope (w_anomaly_zscore fixes its mean/std over a
    static era; this one re-centers every day, so a slow drift never
    saturates the alarm). Only complete 20-day windows emit (count
    guard), matching the estimator's definition. Both moment sums ride
    decimal INSIDE the window frame (rev exact at 2dp, rev^2 rounded to
    2dp first — identical doubles on both engines), so the windowed
    sums are order-independent even if an engine's frame accumulator
    reorders (segment trees); sample variance over n-1 with a zero
    floor for ulp-negative results. One shuffle to the daily grain,
    windows over the calendar-bounded per-status series. Cell-exact."""
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderstatus").alias("status"),
        F.to_date("o_orderdate").alias("d"),
    ).agg(dsum("o_totalprice").alias("rev"))
    w20 = (
        W.partitionBy("status")
        .orderBy("d")
        .rowsBetween(-19, W.currentRow)
    )
    roll = daily.select(
        "status",
        "d",
        "rev",
        F.count("*").over(w20).alias("n_win"),
        F.sum(F.col("rev").cast("decimal(27,2)")).over(w20).cast("double").alias("s1"),
        F.sum(F.round(F.col("rev") * F.col("rev"), 2).cast("decimal(27,2)"))
        .over(w20)
        .cast("double")
        .alias("s2"),
    )
    bands = roll.filter(F.col("n_win") == 20).select(
        "status",
        "d",
        "rev",
        "n_win",
        F.round(F.col("s1") / 20.0, 4).alias("mid"),
        F.round(
            F.sqrt(
                F.greatest(
                    (F.col("s2") - F.col("s1") * F.col("s1") / 20.0) / 19.0,
                    F.lit(0.0),
                )
            ),
            4,
        ).alias("sd"),
    )
    up = F.col("mid") + 2 * F.col("sd")
    lo = F.col("mid") - 2 * F.col("sd")
    return (
        bands.filter((F.col("rev") > up) | (F.col("rev") < lo))
        .select(
            "status",
            "d",
            "rev",
            "mid",
            "sd",
            F.round(up, 4).alias("upper_band"),
            F.round(lo, 4).alias("lower_band"),
            F.when(F.col("rev") > up, "up").otherwise("down").alias("breakout"),
        )
        .orderBy("status", "d")
    )


@register(
    "w_holt_backtest",
    oracle=None,
    tags=("window", "timeseries", "backtest", "pandas-op"),
)
def w_holt_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin backtest of the Holt forecaster (w_holt_trend):
    every day's one-step-ahead forecast is scored against the NEXT day's
    actual, per status — MAE, MAPE, and the skill score
    1 - MAE_holt/MAE_naive against the naive carry-forward forecast
    (yesterday's value). Skill > 0 is the go/no-go gate for shipping the
    smoother: a forecaster that can't beat 'same as yesterday' has no
    business feeding a capacity plan. Rows-only (the Holt recursion is a
    pandas op); the scoring itself is a lag window + one aggregate over
    the calendar-bounded daily series — properties (perfect skill on
    linear series, skill <= 1, alignment) pinned in
    tests/test_temporal.py. Same applyInPandas scale contract as
    w_holt_trend: one status group's bounded series per worker."""
    from boxoffice_spark.functions.numeric import dsum
    from boxoffice_spark.operators.temporal import holt_by_key

    o = table(spark, sf_dir, "orders")
    daily = (
        o.filter(F.col("o_orderdate").between("1995-01-01", "1995-06-30"))
        .groupBy(
            F.col("o_orderstatus").alias("status"),
            F.to_date("o_orderdate").alias("day"),
        )
        .agg(dsum("o_totalprice", scale=2).alias("revenue"))
    )
    fitted = holt_by_key(daily, ["status"], "day", "revenue", alpha=0.5, beta=0.3)
    w = W.partitionBy("status").orderBy("day")
    scored = fitted.select(
        "status",
        "day",
        "revenue",
        F.lag("forecast_next").over(w).alias("holt_pred"),
        F.lag("revenue").over(w).alias("naive_pred"),
    ).filter(F.col("holt_pred").isNotNull())
    agg = scored.groupBy("status").agg(
        F.count("*").alias("n_scored"),
        (
            dsum(F.abs(F.col("revenue") - F.col("holt_pred")), scale=6)
            / F.count("*")
        ).alias("mae_holt"),
        (
            dsum(F.abs(F.col("revenue") - F.col("naive_pred")), scale=6)
            / F.count("*")
        ).alias("mae_naive"),
        (
            dsum(
                F.abs(F.col("revenue") - F.col("holt_pred"))
                / F.abs(F.col("revenue")),
                scale=8,
            )
            / F.count("*")
        ).alias("mape_holt"),
    )
    return agg.select(
        "status",
        "n_scored",
        F.round("mae_holt", 4).alias("mae_holt"),
        F.round("mae_naive", 4).alias("mae_naive"),
        F.round("mape_holt", 6).alias("mape_holt"),
        F.when(
            F.col("mae_naive") > 0,
            F.round(1.0 - F.col("mae_holt") / F.col("mae_naive"), 6),
        ).alias("skill_vs_naive"),
    ).orderBy("status")


@register(
    "w_markov_3step",
    oracle=f"""
    WITH ev AS ({_EVENTS_US}),
    nxt AS (
        SELECT event_type AS from_type,
            LEAD(event_type) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
            ) AS to_type
        FROM ev
    ),
    t AS (
        SELECT from_type, to_type, count(*) AS n_transitions
        FROM nxt WHERE to_type IS NOT NULL
        GROUP BY 1, 2
    ),
    p1 AS (
        SELECT from_type, to_type,
            round(CAST(n_transitions AS DOUBLE)
                  / sum(n_transitions) OVER (PARTITION BY from_type), 6) AS p
        FROM t
    ),
    p2 AS (
        SELECT a.from_type, b.to_type,
            cast(sum(cast(round(a.p * b.p, 12) as decimal(27,12)))
                 as double) AS p
        FROM p1 a JOIN p1 b ON b.from_type = a.to_type
        GROUP BY 1, 2
    ),
    p3 AS (
        SELECT a.from_type, b.to_type,
            round(cast(sum(cast(round(a.p * b.p, 12) as decimal(27,12)))
                       as double), 6) AS p3_prob
        FROM p2 a JOIN p1 b ON b.from_type = a.to_type
        GROUP BY 1, 2
    )
    SELECT from_type, to_type, p3_prob FROM p3
    ORDER BY from_type, to_type
    """,
    tags=("window", "markov", "sequence"),
)
def w_markov_3step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-step Markov reach: P³ over w_event_transitions' one-step
    matrix — where does a user END UP three actions after X, the
    medium-horizon flow question one-step probabilities can't answer
    (a low direct view->purchase cell can still carry high 3-step mass
    through click chains). The chain rule is two matrix multiplications
    expressed as equi-joins on the BOUNDED |event_types|² transition
    table — after the one corpus-sized LEAD shuffle, every join touches
    at most |types|³ tiny rows, so the 'matrix power' costs nothing at
    any corpus size (the pattern extends to P^k for path-length k).
    Products rounded at 12dp and decimal-summed per cell (the sum over
    intermediate states is order-independent on both engines); one-step
    probabilities carry w_event_transitions' exact 6dp contract.
    Cell-exact."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    t = nxt.groupBy("from_type", "to_type").agg(
        F.count("*").alias("n_transitions")
    )
    norm = W.partitionBy("from_type")
    p1 = t.select(
        "from_type",
        "to_type",
        F.round(
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(norm),
            6,
        ).alias("p"),
    )
    a1 = p1.alias("a")
    b1 = p1.alias("b")
    p2 = (
        a1.join(b1, F.col("b.from_type") == F.col("a.to_type"))
        .groupBy(F.col("a.from_type").alias("from_type"), F.col("b.to_type").alias("to_type"))
        .agg(
            F.sum(
                F.round(F.col("a.p") * F.col("b.p"), 12).cast("decimal(27,12)")
            )
            .cast("double")
            .alias("p")
        )
    )
    a2 = p2.alias("a")
    p3 = (
        a2.join(b1, F.col("b.from_type") == F.col("a.to_type"))
        .groupBy(F.col("a.from_type").alias("from_type"), F.col("b.to_type").alias("to_type"))
        .agg(
            F.round(
                F.sum(
                    F.round(F.col("a.p") * F.col("b.p"), 12).cast(
                        "decimal(27,12)"
                    )
                ).cast("double"),
                6,
            ).alias("p3_prob")
        )
    )
    return p3.select("from_type", "to_type", "p3_prob").orderBy(
        "from_type", "to_type"
    )


@register(
    "w_activity_heatmap",
    oracle=f"""
    WITH ev AS ({_EVENTS_US}),
    cells AS (
        SELECT dayofweek(ts) AS dow, hour(ts) AS hour_of_day,
            count(*) AS n_events,
            count(DISTINCT user_id) AS n_users
        FROM ev GROUP BY 1, 2
    ),
    spread AS (
        SELECT dow, hour_of_day, n_events, n_users,
            CAST(sum(n_events) OVER () AS BIGINT) AS tot_events,
            CAST(max(n_events) OVER (PARTITION BY dow) AS BIGINT)
                AS peak_events
        FROM cells
    )
    SELECT dow, hour_of_day, n_events, n_users,
        {ratio6_sql('n_events', 'tot_events')} AS share_of_total,
        {ratio6_sql('n_events', 'peak_events')} AS within_dow_peak
    FROM spread
    ORDER BY dow, hour_of_day
    """,
    tags=("window", "heatmap", "calendar"),
)
def w_activity_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week x hour-of-day activity heatmap: event and distinct-
    user counts per calendar cell, each cell's share of total traffic,
    and its intensity relative to its weekday's peak hour — the grid
    behind every 'when are users here' dashboard panel and the load
    model capacity planning reads (the within-dow normalization is what
    makes a quiet Sunday's 8pm peak visible next to Monday's). One
    corpus shuffle to the FIXED 7 x 24 grid; both normalizing windows
    run over <= 168 rows (bounded by the calendar, not the corpus —
    the same posture at any scale). DuckDB dayofweek == Spark's
    dayofweek - 1 (Sunday=0 vs Sunday=1), aligned explicitly.
    Cell-exact."""
    ev = table(spark, sf_dir, "events")
    # long, not dayofweek/hour's int32: both engines emit BIGINT
    cells = ev.groupBy(
        (F.dayofweek("ts") - 1).cast("long").alias("dow"),
        F.hour("ts").cast("long").alias("hour_of_day"),
    ).agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )
    wall = W.partitionBy()
    wdow = W.partitionBy("dow")
    # Both shares are exact integer ratios -> ratio6's BIGINT HALF_UP
    # (parity rule 4), never round(double, 6).
    spread = cells.select(
        "dow",
        "hour_of_day",
        "n_events",
        "n_users",
        F.sum("n_events").over(wall).alias("tot_events"),
        F.max("n_events").over(wdow).alias("peak_events"),
    )
    return spread.select(
        "dow",
        "hour_of_day",
        "n_events",
        "n_users",
        ratio6("n_events", "tot_events").alias("share_of_total"),
        ratio6("n_events", "peak_events").alias("within_dow_peak"),
    ).orderBy("dow", "hour_of_day")
