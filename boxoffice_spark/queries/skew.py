"""Skew-mitigation queries over the events log (hot low-cardinality key:
event_type has ~5 values, so every per-type shuffle is maximally skewed —
the miniature of a 100 TB log's hot-partition problem). Operators in
operators/skew.py; results are exactly the unsalted plans' results, which
is what the oracles assert."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from boxoffice_spark.functions.numeric import dsum, dsum_sql
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
           {dsum_sql('e.value * d.weight', 6)} AS weighted_sum
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
    return joined.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        dsum(F.col("value") * F.col("weight"), scale=6).alias("weighted_sum"),
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
