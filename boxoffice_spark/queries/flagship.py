"""Flagship query: daily top-10 ranking with day-over-day delta.

The box-office core loop (reference dashboard.py:79-86 'ORDER BY target_dt
DESC, rank ASC' + the rank_inten/audi_inten delta columns stored at
sqlite_connector.py:27-31) re-derived natively: scan -> broadcast join ->
aggregate -> two windows -> top-k. On the fixtures: daily revenue per part
brand, ranked within each ship date, with each brand's day-over-day revenue
delta (W2/W4 from SURVEY §2.5).

Scale notes: the part dimension is small relative to lineitem (1:30 row
ratio, TPC-H) -> broadcast join, no shuffle on the fact side for the join.
The aggregation shuffles once on (ship_dt, brand); both windows then
repartition by their own keys. Revenue sums go through decimal so results
are bit-deterministic (see functions/numeric.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from boxoffice_spark.functions.numeric import dsum_sql, usum
from boxoffice_spark.registry import register
from boxoffice_spark.tables import table

_ORACLE = f"""
WITH daily AS (
    SELECT
        CAST(l.l_shipdate AS DATE) AS ship_dt,
        p.p_brand AS brand,
        {dsum_sql('l.l_extendedprice * (1 - l.l_discount)', 4)} AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY 1, 2
), ranked AS (
    SELECT
        ship_dt, brand, revenue,
        CAST(ROW_NUMBER() OVER (PARTITION BY ship_dt ORDER BY revenue DESC, brand) AS INT) AS rnk,
        revenue - LAG(revenue) OVER (PARTITION BY brand ORDER BY ship_dt) AS revenue_delta
    FROM daily
)
SELECT ship_dt, brand, revenue, rnk, revenue_delta
FROM ranked
WHERE rnk <= 10
ORDER BY ship_dt, rnk
"""


@register("flagship_daily_topk_delta", oracle=_ORACLE, bench=True, tags=("flagship", "window", "join", "agg"))
def flagship_daily_topk_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily top-10 brands by revenue with day-over-day delta per brand."""
    # no spread() here: the broadcast join + partial agg are scan-bound and
    # cheap per row — an extra exchange costs more than the parallelism buys
    # (spread pays off only for compute-heavy per-row work, see tables.py)
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")

    daily = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(
            F.to_date("l_shipdate").alias("ship_dt"),
            F.col("p_brand").alias("brand"),
        )
        # r12 (guide §2.3 narrower types): integer-units sum — the inputs
        # sit on the 0.01 grid so the 1e-4-grid product units are exact,
        # and the per-(ship_dt, brand) cell bounds the BIGINT sum (wrap
        # needs 9.2e14 of revenue for ONE brand on ONE day — not a real
        # regime). Bit-identical to the decimal sum (oracle keeps the
        # decimal text); ~1.5x the aggregate stage locally, and at scale
        # the shuffle carries 8-byte longs instead of 16-byte decimals.
        .agg(usum(F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=4).alias("revenue"))
    )

    w_rank = W.partitionBy("ship_dt").orderBy(F.desc("revenue"), F.asc("brand"))
    w_lag = W.partitionBy("brand").orderBy("ship_dt")
    return (
        daily.withColumn("rnk", F.row_number().over(w_rank))
        .withColumn("revenue_delta", F.col("revenue") - F.lag("revenue").over(w_lag))
        .filter(F.col("rnk") <= 10)
        .orderBy("ship_dt", "rnk")
    )
