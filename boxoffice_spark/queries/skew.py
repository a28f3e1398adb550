"""Skew-mitigation queries over the events log (hot low-cardinality key:
event_type has ~5 values, so every per-type shuffle is maximally skewed —
the miniature of a 100 TB log's hot-partition problem). Operators in
operators/skew.py; results are exactly the unsalted plans' results, which
is what the oracles assert."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from boxoffice_spark.functions.numeric import dsum, dsum_sql, funits, funits_sql
from boxoffice_spark.operators.skew import salted_distinct_count, salted_join
from boxoffice_spark.registry import register
from boxoffice_spark.tables import EVENTS_US_SQL as _EVENTS_US, table


@register(
    "k_salted_join",
    oracle=f"""
    WITH ev AS ({_EVENTS_US}),
    dim AS (SELECT DISTINCT event_type, length(event_type) AS weight FROM ev)
    SELECT e.event_type,
           count(*) AS n_events,
           CAST(sum({funits_sql('e.value * d.weight', 6)}) AS DOUBLE) / 1e6
               AS weighted_sum
    FROM ev e JOIN dim d ON e.event_type = d.event_type
    GROUP BY e.event_type
    """,
    bench=True,
    tags=("skew", "join"),
)
def k_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key equi-join, salted: the 5-value event_type key would land
    entire event classes on single reducers in a plain shuffle join; the
    salted form fans each key over 16 (key, salt) reducers and must produce
    exactly the unsalted result (the oracle is the plain join)."""
    ev = table(spark, sf_dir, "events")
    dim = ev.select("event_type").distinct().withColumn(
        "weight", F.length("event_type")
    )
    joined = salted_join(ev, dim, on="event_type", salt=16)
    # r10 legacy conversion (broadened DECCAST flag): value*weight is an
    # off-grid double product, so it quantizes to EXACT 1e-6 integer
    # units via funits (identical IEEE ops on every build) and sums in
    # DECIMAL(38,0)/HUGEINT — no decimal cast of a double anywhere.
    term_u = funits(F.col("value") * F.col("weight"), 6)
    return joined.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        (
            F.sum(term_u.cast("decimal(38,0)")).cast("double") / 1e6
        ).alias("weighted_sum"),
    )


@register(
    "k_salted_distinct",
    oracle=f"""
    WITH ev AS ({_EVENTS_US})
    SELECT event_type, count(DISTINCT user_id) AS n_distinct
    FROM ev GROUP BY event_type
    """,
    tags=("skew", "distinct"),
)
def k_salted_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-hot-key COUNT(DISTINCT user_id) via disjoint salted
    sub-universes (two bounded stages) — equals the single-reducer-per-key
    plan the oracle runs."""
    ev = table(spark, sf_dir, "events")
    return salted_distinct_count(ev, ["event_type"], "user_id", salt=16).select(
        "event_type", "n_distinct"
    )


@register(
    "k_group_topk_salted",
    oracle=f"""
    WITH ev AS ({_EVENTS_US}),
    r AS (
        SELECT event_id, user_id, event_type, value,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY event_type
                   ORDER BY value DESC, event_id
               ) AS INT) AS rnk
        FROM ev
    )
    SELECT event_id, user_id, event_type, value, rnk
    FROM r WHERE rnk <= 5
    """,
    tags=("skew", "topk", "window"),
)
def k_group_topk_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 events by value per event_type WITHOUT sorting whole
    event classes on single tasks: event_type has ~5 values, so the plain
    row_number window is 5 tasks sorting the entire log. The salted form
    (operators/skew.salted_group_topk) ranks within (type, hash(event_id)
    % 16) sub-partitions first, then ranks only the 16*5 survivors per
    type — identical rows to the single-window plan, which is what the
    oracle runs."""
    from boxoffice_spark.operators.skew import salted_group_topk

    ev = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    return salted_group_topk(
        ev,
        group_cols=["event_type"],
        order_cols=[F.desc("value")],
        k=5,
        tiebreak_cols=["event_id"],
        salt=16,
    )


@register(
    "k_skew_report",
    oracle="""
    WITH counts AS (
        SELECT l_partkey AS k, count(*) AS cnt FROM lineitem GROUP BY 1
    ),
    top AS (SELECT k AS top_key FROM counts ORDER BY cnt DESC, k LIMIT 1),
    agg AS (
        SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
               count(*) AS n_keys,
               max(cnt) AS max_per_key,
               round(quantile_cont(cnt, 0.5), 6) AS p50_per_key,
               round(quantile_cont(cnt, 0.9), 6) AS p90_per_key,
               round(quantile_cont(cnt, 0.99), 6) AS p99_per_key
        FROM counts
    )
    SELECT n_rows, n_keys,
           round(CAST(n_rows AS DOUBLE) / n_keys, 6) AS avg_per_key,
           p50_per_key, p90_per_key, p99_per_key, max_per_key,
           round(CAST(max_per_key AS DOUBLE) * n_keys / n_rows, 6)
               AS skew_ratio,
           top.top_key,
           round(CAST(max_per_key AS DOUBLE) / n_rows, 6) AS top_share
    FROM agg, top
    """,
    tags=("skew", "diagnostic"),
)
def k_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew pre-flight diagnostic on the lineitem join key: row/key
    totals, per-key count quantiles, the heaviest key and its share, and
    skew_ratio = max/avg — the report a pipeline reads BEFORE choosing
    between a plain shuffle join, AQE skew splitting, and explicit
    salting (k_salted_join is the treatment; this is the diagnosis).

    One shuffle to per-key counts; everything after runs on the |keys|
    aggregate. The exact percentiles are sort-based over that aggregate —
    at 100 TB swap approx_percentile in (the dq_numeric_drift note) and
    nothing else changes. Top-key selection is orderBy().limit(1) —
    TakeOrderedAndProject with a total-order key, broadcast back onto
    the one-row report."""
    li = table(spark, sf_dir, "lineitem")
    counts = li.groupBy(F.col("l_partkey").alias("k")).agg(
        F.count("*").alias("cnt")
    )
    top = (
        counts.orderBy(F.desc("cnt"), F.asc("k"))
        .limit(1)
        .select(F.col("k").alias("top_key"))
    )
    agg = counts.agg(
        F.sum("cnt").cast("long").alias("n_rows"),
        F.count("*").alias("n_keys"),
        F.max("cnt").alias("max_per_key"),
        F.round(F.percentile("cnt", F.lit(0.5)), 6).alias("p50_per_key"),
        F.round(F.percentile("cnt", F.lit(0.9)), 6).alias("p90_per_key"),
        F.round(F.percentile("cnt", F.lit(0.99)), 6).alias("p99_per_key"),
    )
    return agg.crossJoin(F.broadcast(top)).select(
        "n_rows",
        "n_keys",
        F.round(F.col("n_rows").cast("double") / F.col("n_keys"), 6).alias(
            "avg_per_key"
        ),
        "p50_per_key",
        "p90_per_key",
        "p99_per_key",
        "max_per_key",
        F.round(
            F.col("max_per_key").cast("double") * F.col("n_keys") / F.col("n_rows"), 6
        ).alias("skew_ratio"),
        "top_key",
        F.round(F.col("max_per_key").cast("double") / F.col("n_rows"), 6).alias(
            "top_share"
        ),
    )
