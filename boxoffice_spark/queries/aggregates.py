"""Aggregations, top-k, rollups (SURVEY.md §2.4, §2.6).

All aggregations are hash aggregates with map-side partial combine; double
sums ride the decimal path (functions/numeric.py) for bit-determinism.
Top-k queries end in ``orderBy().limit()`` which Catalyst plans as
TakeOrderedAndProject (per-partition heaps, no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from boxoffice_spark.functions.numeric import (
    davg,
    davg_sql,
    dsum,
    dsum_sql,
    fround,
    fround_sql,
    funits,
    funits_sql,
    ratio6,
    ratio6_sql,
    ratio6w,
    ratio6w_sql,
    umerge,
    units_div_sql,
)
from boxoffice_spark.operators.dedup import md5_u60_sql as _md5_u60
from boxoffice_spark.registry import register
from boxoffice_spark.tables import table


@register(
    "a_groupby_multi_agg",
    oracle=f"""
    SELECT
        l_returnflag,
        l_linestatus,
        {dsum_sql('l_quantity')} AS sum_qty,
        {dsum_sql('l_extendedprice')} AS sum_base_price,
        {dsum_sql('l_extendedprice * (1 - l_discount)', 4)} AS sum_disc_price,
        {davg_sql('l_quantity')} AS avg_qty,
        count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    bench=True,
    tags=("agg",),
)
def a_groupby_multi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 generalized to the TPC-H Q1 shape: grouped multi-aggregate
    (reference dashboard.py:249 groupby sum; :291-294 multi-agg).

    r12 (guide §2.3 narrower types): the decimal sums are replaced by the
    TWO-LEVEL integer-units sum — per-row funits (primitive ops; the old
    double->decimal cast string-formats every row) summed as BIGINT within
    (keys, spark_partition_id()), then the tiny partials merged exactly in
    DECIMAL(38,0) (numeric.umerge). The partition id bounds each partial
    by rows-per-scan-split, so no BIGINT wrap at ANY corpus size even
    though Q1's four flag/status groups each span ~1/4 of the corpus —
    the flat-long form would wrap near 100 TB for the 1e-4-grid
    disc_price. spark_partition_id is stable per parquet split (same
    split -> same id under task retry), so the partial grouping is
    deterministic. Bit-identical output to the decimal form (verified
    cell-exact vs the unchanged decimal oracle); measured 0.79 s -> 0.39 s
    min-of-7 on the aggregate. Plan: two tiny exchanges (groups x
    partitions rows, then groups rows) replace one; both carry ~KB."""
    li = table(spark, sf_dir, "lineitem")
    partials = (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus", F.spark_partition_id().alias("_pid"))
        .agg(
            F.sum(funits(F.col("l_quantity"), 2)).alias("_qty_u"),
            F.sum(funits(F.col("l_extendedprice"), 2)).alias("_base_u"),
            F.sum(
                funits(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
            ).alias("_disc_u"),
            F.sum(funits(F.col("l_quantity"), 6)).alias("_qty6_u"),
            F.count("*").alias("_n"),
            F.count("l_quantity").alias("_nq"),
        )
    )
    return partials.groupBy("l_returnflag", "l_linestatus").agg(
        umerge("_qty_u", 2).alias("sum_qty"),
        umerge("_base_u", 2).alias("sum_base_price"),
        umerge("_disc_u", 4).alias("sum_disc_price"),
        (umerge("_qty6_u", 6) / F.sum("_nq")).alias("avg_qty"),
        F.sum("_n").alias("count_order"),
    )


@register(
    "a_group_topk",
    oracle=f"""
    SELECT o_custkey, {dsum_sql('o_totalprice')} AS total_spend
    FROM orders
    GROUP BY o_custkey
    ORDER BY total_spend DESC, o_custkey
    LIMIT 10
    """,
    tags=("agg", "topk"),
)
def a_group_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2+O3: group-by sum then top-k (reference dashboard.py:249
    nlargest(10)). orderBy+limit -> TakeOrderedAndProject."""
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(dsum("o_totalprice").alias("total_spend"))
        .orderBy(F.desc("total_spend"), F.asc("o_custkey"))
        .limit(10)
    )


@register(
    "a_countdistinct_stringagg",
    oracle="""
    SELECT
        n.n_name AS nation,
        count(DISTINCT c.c_mktsegment) AS n_segments,
        string_agg(DISTINCT c.c_mktsegment, ', ' ORDER BY c.c_mktsegment) AS segment_list,
        count(*) AS n_customers
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    tags=("agg", "stringagg"),
)
def a_countdistinct_stringagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: count-distinct + SORTED string-agg per group (reference
    dashboard.py:291-294 movie_count nunique + ', '.join(sorted(unique))).
    collect_set -> array_sort -> array_join reproduces the reference's
    deterministic ordering (SURVEY §7 hard part (c))."""
    cust = table(spark, sf_dir, "customer")
    nat = table(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.countDistinct("c_mktsegment").alias("n_segments"),
            F.array_join(F.array_sort(F.collect_set("c_mktsegment")), ", ").alias("segment_list"),
            F.count("*").alias("n_customers"),
        )
    )


@register(
    "a_watermark_max",
    oracle="""
    SELECT max(ts) AS max_ts, min(ts) AS min_ts, count(*) AS n_events
    FROM events
    """,
    tags=("agg", "watermark"),
)
def a_watermark_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/T4: global watermark read (reference kobis_pipeline.py:18
    SELECT MAX(target_dt); dashboard.py:125-128 MAX(scraped_at))."""
    return table(spark, sf_dir, "events").agg(
        F.max("ts").alias("max_ts"), F.min("ts").alias("min_ts"), F.count("*").alias("n_events")
    )


@register(
    "a_count_rows",
    oracle="SELECT count(*) AS n_rows FROM lineitem",
    tags=("agg",),
)
def a_count_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: row count (reference len(df) logging, kobis_pipeline.py:46)."""
    return table(spark, sf_dir, "lineitem").agg(F.count("*").alias("n_rows"))


@register(
    "a_grouped_distinct",
    oracle="SELECT event_type FROM events GROUP BY event_type",
    tags=("agg", "distinct"),
)
def a_grouped_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: GROUP BY used as DISTINCT (reference
    movie_events_scraper.py:70-75)."""
    return table(spark, sf_dir, "events").groupBy("event_type").agg(F.count("*").alias("_n")).select("event_type")


@register(
    "a_post_agg_sort_topk",
    oracle="""
    SELECT c_mktsegment, count(DISTINCT c_custkey) AS n_customers
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY n_customers DESC, c_mktsegment
    LIMIT 3
    """,
    tags=("agg", "topk"),
)
def a_post_agg_sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: post-aggregation sort + top-3 (reference dashboard.py:296
    sort_values.nlargest(3))."""
    return (
        table(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(F.countDistinct("c_custkey").alias("n_customers"))
        .orderBy(F.desc("n_customers"), F.asc("c_mktsegment"))
        .limit(3)
    )


@register(
    "a_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus, {dsum_sql('l_quantity')} AS sum_qty, count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("agg", "rollup"),
)
def a_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup generalization of the KPI aggregates (SURVEY §2.4 note:
    cube/rollup are free in Spark; the reference computes each KPI level
    with a separate pandas pass)."""
    return (
        table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(dsum("l_quantity").alias("sum_qty"), F.count("*").alias("n"))
    )


@register(
    "a_grouping_sets",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT)
               AS grouping_id,
           {dsum_sql('o_totalprice')} AS revenue, count(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
    """,
    tags=("agg", "grouping-sets"),
)
def a_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS with a grouping_id disambiguator (a NULL
    group value vs a rolled-up level are different things): detail,
    per-status, and grand-total grains in ONE scan + one shuffle —
    the general form of a_rollup for non-hierarchical grain lists."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.grouping_id().alias("grouping_id"),
            dsum("o_totalprice").alias("revenue"),
            F.count("*").alias("n"),
        )
        .select("o_orderstatus", "o_orderpriority", "grouping_id", "revenue", "n")
    )


@register(
    "a_pivot_conditional",
    oracle=f"""
    SELECT
        l_returnflag,
        {dsum_sql("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS qty_open,
        {dsum_sql("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS qty_fulfilled
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "pivot"),
)
def a_pivot_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot as conditional aggregation (the KPI-matrix shape the reference
    renders per-status; expressed with explicit CASE so the oracle is plain
    ANSI SQL — Spark's .pivot() plans the same conditional aggregate)."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        dsum(F.when(F.col("l_linestatus") == "O", F.col("l_quantity"))).alias("qty_open"),
        dsum(F.when(F.col("l_linestatus") == "F", F.col("l_quantity"))).alias("qty_fulfilled"),
    )


@register(
    "a_approx_stats",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n,
           count(DISTINCT l_partkey) AS exact_parts,
           TRUE AS parts_ok, TRUE AS p50_ok, TRUE AS p95_ok, TRUE AS p99_ok
    FROM lineitem
    GROUP BY 1
    """,
    tags=("agg", "approx"),
)
def a_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct + quantiles (SURVEY §2.11 extension: sketch-based
    stats are the 100 TB substitutes for exact countDistinct/percentile).
    HLL++ and GK-quantile both merge map-side — one narrow shuffle.

    Raw sketch ESTIMATES can't hash-match a cross-engine oracle (HLL++ and
    GK are engine-specific), so this query verifies the sketch error
    CONTRACT in-plan instead: the same single aggregate pass computes the
    exact countDistinct/percentiles next to the sketches and emits
    deterministic within-bound booleans — HLL++ within 3x its default rsd
    (0.05), GK quantiles inside the exact quantile envelope at p +/- 10x
    the default 1/accuracy rank-error bound. The oracle asserts the exact
    values and that every bound holds. (Production at 100 TB runs the
    sketch aggregates alone; the exact twins here are the verification
    harness, feasible at test SFs.)"""
    li = table(spark, sf_dir, "lineitem")
    q = F.percentile_approx("l_extendedprice", [0.5, 0.95, 0.99])
    # exact quantile envelope at p -/+ 0.001 (= 10x the 1/10000 default
    # rank-error bound, generous margin for interpolated-vs-discrete gaps)
    lo = F.percentile("l_extendedprice", [0.499, 0.949, 0.989])
    hi = F.percentile("l_extendedprice", [0.501, 0.951, 0.991])
    agg = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.approx_count_distinct("l_partkey").alias("_hll"),
        F.element_at(q, 1).alias("_p50"),
        F.element_at(q, 2).alias("_p95"),
        F.element_at(q, 3).alias("_p99"),
        F.element_at(lo, 1).alias("_lo50"),
        F.element_at(lo, 2).alias("_lo95"),
        F.element_at(lo, 3).alias("_lo99"),
        F.element_at(hi, 1).alias("_hi50"),
        F.element_at(hi, 2).alias("_hi95"),
        F.element_at(hi, 3).alias("_hi99"),
    )
    within = lambda v, a, b: F.col(v).between(F.col(a), F.col(b))  # noqa: E731
    return agg.select(
        "l_returnflag",
        "n",
        "exact_parts",
        (
            F.abs(F.col("_hll") - F.col("exact_parts"))
            <= 0.15 * F.col("exact_parts")
        ).alias("parts_ok"),
        within("_p50", "_lo50", "_hi50").alias("p50_ok"),
        within("_p95", "_lo95", "_hi95").alias("p95_ok"),
        within("_p99", "_lo99", "_hi99").alias("p99_ok"),
    )


@register(
    "a_exact_median",
    oracle="""
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
           round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
           count(*) AS n
    FROM orders
    GROUP BY 1
    """,
    tags=("agg", "percentile"),
)
def a_exact_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (interpolated) median and p90 per priority class. Exact
    percentile collects each group's values — the right tool up to
    ~10^7 rows per group; past that the sketch path (a_approx_stats)
    is the 100 TB substitute. Both engines interpolate identically
    (type 7 / linear), rounded for float stability."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("median_price"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90_price"),
        F.count("*").alias("n"),
    )


@register(
    "a_histogram",
    oracle="""
    SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
           CAST(floor(o_totalprice / 50000) * 50000 AS DOUBLE) AS bucket_lo,
           count(*) AS n_orders
    FROM orders
    GROUP BY 1, 2
    """,
    tags=("agg", "histogram"),
)
def a_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totals (50k bins): the profiling
    primitive behind every distribution dashboard. A pure groupBy on the
    bin id — partial-aggregated map-side, one narrow shuffle of (bin,
    count) pairs, output size = bin count regardless of input rows."""
    o = table(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 50000)
    return o.groupBy(
        bucket.cast("bigint").alias("bucket"),
        (bucket * 50000).cast("double").alias("bucket_lo"),
    ).agg(F.count("*").alias("n_orders"))


@register(
    "a_hll_sketch_rollup",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
           count(DISTINCT user_id) AS exact_users,
           TRUE AS union_ok, TRUE AS reagg_consistent
    FROM events
    GROUP BY 1
    """,
    tags=("agg", "approx", "sketch"),
)
def a_hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup (Apache DataSketches HLL, Spark 3.5+
    built-ins): per-(event_type, day) user sketches are unioned with
    ``hll_union_agg`` into per-type totals — the continuous-aggregate
    pattern where daily sketch partials re-aggregate to any coarser grain
    WITHOUT rescanning raw data (count-distinct does not re-aggregate;
    sketches do). At 100 TB: the daily sketch table is KBs per group, and
    a month/quarter/all-time unique count is a union over sketches, not a
    scan over events.

    Like a_approx_stats, estimates themselves are engine-specific, so the
    oracle checks the sketch CONTRACT: (a) the unioned estimate lands
    within 5% of exact count(DISTINCT) (default lgK=12 -> ~1.6% rse;
    deterministic for a given input), and (b) union-of-daily-sketches
    tracks the direct whole-set sketch within 2% — the merge is
    mathematically near-lossless but NOT bit-identical (measured here:
    the union gadget's sparse->dense promotion path can differ from
    direct aggregation's, e.g. 1488 vs 1494 on 1500 true uniques)."""
    ev = table(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day"), "user_id"
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    rolled = daily.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("_union_est"),
    )
    direct = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("_direct_est"),
    )
    return rolled.join(direct, "event_type").select(
        "event_type",
        "n_days",
        "exact_users",
        (
            F.abs(F.col("_union_est") - F.col("exact_users"))
            <= 0.05 * F.col("exact_users")
        ).alias("union_ok"),
        (
            F.abs(F.col("_union_est") - F.col("_direct_est"))
            <= 0.02 * F.col("exact_users")
        ).alias("reagg_consistent"),
    )


@register(
    "a_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT)
               AS grouping_id,
           {dsum_sql('l_quantity')} AS sum_qty, count(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("agg", "cube"),
)
def a_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all four grains — detail, each
    one-dimension margin, grand total — in ONE scan + one Expand shuffle
    (completes the rollup/grouping-sets OLAP trio). grouping_id
    disambiguates a NULL group value from a rolled-up level, matching
    a_grouping_sets' convention."""
    from boxoffice_spark.functions.numeric import dsum

    li = table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus"))
            .cast("long")
            .alias("grouping_id"),
            dsum("l_quantity").alias("sum_qty"),
            F.count("*").alias("n"),
        )
        .select("l_returnflag", "l_linestatus", "grouping_id", "sum_qty", "n")
    )


@register(
    "a_pivot_segment_status",
    oracle=f"""
    SELECT c.c_mktsegment,
           {dsum_sql("CASE WHEN o.o_orderstatus = 'F' THEN o.o_totalprice END")} AS f_total,
           {dsum_sql("CASE WHEN o.o_orderstatus = 'O' THEN o.o_totalprice END")} AS o_total,
           {dsum_sql("CASE WHEN o.o_orderstatus = 'P' THEN o.o_totalprice END")} AS p_total
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY 1
    """,
    tags=("agg", "pivot"),
)
def a_pivot_segment_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: revenue matrix market-segment x order-status — the
    wide-report shape every dashboard export needs. The status values are
    passed EXPLICITLY to ``pivot()``: with the value list given, Catalyst
    compiles straight to one hash aggregate carrying a pivot-agg per
    value — no exchange beyond the group-key shuffle, and no eager
    collect-distinct job (which an open-ended pivot runs first: a whole
    extra pass at 100 TB). Upstream, the customer dim joins by key and
    broadcasts under AQE when small. Cells are decimal-summed, so the
    wide result is bit-deterministic and cell-exact against the oracle's
    filtered-aggregate form (PIVOT is pure sugar over CASE aggregation)."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    joined = o.join(c, o.o_custkey == c.c_custkey).select(
        "c_mktsegment", "o_orderstatus", "o_totalprice"
    )
    piv = (
        joined.groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(dsum("o_totalprice"))
    )
    return piv.select(
        "c_mktsegment",
        F.col("F").alias("f_total"),
        F.col("O").alias("o_total"),
        F.col("P").alias("p_total"),
    )


def _kmv_est_sql(n: str, kth: str) -> str:
    from boxoffice_spark.operators.sketch import kmv_estimate_sql

    return kmv_estimate_sql(n, kth, 64)


_KMV_ORACLE = f"""
    WITH dv AS (
        SELECT DISTINCT strftime(l_shipdate, '%Y-%m') AS m, l_partkey AS p
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
    ),
    dh0 AS (
        SELECT DISTINCT m, md5(CAST(p AS VARCHAR)) AS hx FROM dv
    ),
    dh AS (
        SELECT DISTINCT m, {_md5_u60('hx')} AS h FROM dh0
    ),
    sk AS (
        SELECT m, h FROM (
            SELECT m, h, ROW_NUMBER() OVER (PARTITION BY m ORDER BY h) AS rn FROM dh
        ) WHERE rn <= 64
    ),
    gs AS (SELECT m, count(*) AS n_s, max(h) AS h_k FROM sk GROUP BY 1),
    ex AS (SELECT m, count(*) AS exact_n FROM dv GROUP BY 1),
    prs AS (SELECT a.m AS ma, b.m AS mb FROM gs a JOIN gs b ON a.m < b.m),
    mg AS (
        SELECT DISTINCT ma, mb, h FROM (
            SELECT p.ma, p.mb, s.h FROM prs p JOIN sk s ON s.m = p.ma
            UNION ALL
            SELECT p.ma, p.mb, s.h FROM prs p JOIN sk s ON s.m = p.mb
        ) u
    ),
    us AS (
        SELECT ma, mb, h FROM (
            SELECT ma, mb, h,
                ROW_NUMBER() OVER (PARTITION BY ma, mb ORDER BY h) AS rn
            FROM mg
        ) WHERE rn <= 64
    ),
    uf AS (
        SELECT u.ma, u.mb, u.h,
            CASE WHEN sa.h IS NOT NULL THEN 1 ELSE 0 END AS ia,
            CASE WHEN sb.h IS NOT NULL THEN 1 ELSE 0 END AS ib
        FROM us u
        LEFT JOIN sk sa ON sa.m = u.ma AND sa.h = u.h
        LEFT JOIN sk sb ON sb.m = u.mb AND sb.h = u.h
    ),
    ust AS (
        SELECT ma, mb, count(*) AS n_u, max(h) AS u_k,
            CAST(sum(ia * ib) AS BIGINT) AS n_common
        FROM uf GROUP BY 1, 2
    ),
    exi AS (
        SELECT a.m AS ma, b.m AS mb, count(*) AS exact_common
        FROM dv a JOIN dv b ON a.p = b.p AND a.m < b.m
        GROUP BY 1, 2
    )
    SELECT p.ma AS month_a, p.mb AS month_b,
        exa.exact_n AS exact_a, exb.exact_n AS exact_b,
        coalesce(exi.exact_common, 0) AS exact_common,
        {ratio6_sql('coalesce(exi.exact_common, 0)',
                    'exa.exact_n + exb.exact_n'
                    ' - coalesce(exi.exact_common, 0)')} AS exact_jaccard,
        {fround_sql('{est_a}', 3)} AS est_a,
        {fround_sql('{est_b}', 3)} AS est_b,
        {fround_sql('{est_u}', 3)} AS est_union,
        {ratio6_sql('u.n_common', 'u.n_u')} AS jaccard_est,
        {fround_sql('CAST(u.n_common AS DOUBLE) / CAST(u.n_u AS DOUBLE)'
                    ' * ({est_u})', 3)} AS est_common
    FROM prs p
    JOIN gs ga ON ga.m = p.ma
    JOIN gs gb ON gb.m = p.mb
    JOIN ex exa ON exa.m = p.ma
    JOIN ex exb ON exb.m = p.mb
    JOIN ust u ON u.ma = p.ma AND u.mb = p.mb
    LEFT JOIN exi ON exi.ma = p.ma AND exi.mb = p.mb
    ORDER BY 1, 2
"""


@register(
    "a_kmv_overlap",
    oracle=_KMV_ORACLE.format(
        est_a=_kmv_est_sql("ga.n_s", "ga.h_k"),
        est_b=_kmv_est_sql("gb.n_s", "gb.h_k"),
        est_u=_kmv_est_sql("u.n_u", "u.u_k"),
    ),
    tags=("agg", "approx", "sketch", "overlap"),
)
def a_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) set-overlap sketch: month-over-month
    assortment overlap of distinct parts shipped, for every 1997 month
    pair — estimated distinct counts, union, Jaccard, and INTERSECTION
    from 64-value sketches, with the exact twin columns alongside (the
    a_approx_stats posture: the estimate and its audit in one frame).

    HLL (a_hll_sketch_rollup) can only union; KMV sketches additionally
    answer |A ∩ B| — the question behind cross-source audience overlap,
    shard-dedup sizing, and month-over-month assortment churn. Because
    the hash is md5-derived (operators/sketch.kmv_hash), every estimate
    is deterministic and the DuckDB oracle mirrors the arithmetic
    window-for-window — the sketch itself is driver-verified, not just
    sanity-tested.

    Scale: ONE distinct shuffle of (month, hash) then two-phase bounded
    k-min selection (operators/sketch.kmv_kmin — no reducer ever sorts a
    whole group); all G² pair estimates derive from G×k sketch rows. The
    exact-twin columns (one self-join of the distinct sets) are the
    audit at test SF — at 100 TB a deployment drops them and keeps the
    sketch side, which never touches the fact table again."""
    from boxoffice_spark.operators.sketch import kmv_estimate, kmv_hash, kmv_kmin

    K = 64
    li = table(spark, sf_dir, "lineitem")
    dv = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select(
            F.date_format("l_shipdate", "yyyy-MM").alias("m"),
            F.col("l_partkey").alias("p"),
        )
        .distinct()
    )
    dh = dv.select("m", kmv_hash(F.col("p")).alias("h")).distinct()
    sk = kmv_kmin(dh, ["m"], "h", K)
    gs = sk.groupBy("m").agg(F.count("*").alias("n_s"), F.max("h").alias("h_k"))
    ex = dv.groupBy("m").agg(F.count("*").alias("exact_n"))

    ga = gs.select(F.col("m").alias("ma"), "n_s", "h_k")
    gb = gs.select(F.col("m").alias("mb"), F.col("n_s").alias("n_sb"), F.col("h_k").alias("h_kb"))
    pairs = ga.select("ma").join(gb.select("mb"), F.col("ma") < F.col("mb"))

    # union sketch: k smallest of S_a ∪ S_b per pair (input bounded 2k rows)
    mg = (
        pairs.join(sk, sk.m == F.col("ma"))
        .select("ma", "mb", "h")
        .unionAll(pairs.join(sk, sk.m == F.col("mb")).select("ma", "mb", "h"))
        .distinct()
    )
    from pyspark.sql import Window as W

    wu = W.partitionBy("ma", "mb").orderBy("h")
    us = mg.withColumn("_rn", F.row_number().over(wu)).filter(F.col("_rn") <= K).drop("_rn")
    sa = sk.select(F.col("m").alias("_sam"), F.col("h").alias("_sah"), F.lit(1).alias("_ia"))
    sb = sk.select(F.col("m").alias("_sbm"), F.col("h").alias("_sbh"), F.lit(1).alias("_ib"))
    uf = (
        us.join(sa, (F.col("_sam") == F.col("ma")) & (F.col("_sah") == F.col("h")), "left")
        .join(sb, (F.col("_sbm") == F.col("mb")) & (F.col("_sbh") == F.col("h")), "left")
        .select("ma", "mb", "h", F.coalesce("_ia", F.lit(0)).alias("ia"), F.coalesce("_ib", F.lit(0)).alias("ib"))
    )
    ust = uf.groupBy("ma", "mb").agg(
        F.count("*").alias("n_u"),
        F.max("h").alias("u_k"),
        F.sum(F.col("ia") * F.col("ib")).cast("long").alias("n_common"),
    )

    da = dv.select(F.col("m").alias("ma"), "p")
    db = dv.select(F.col("m").alias("mb"), "p")
    exi = (
        da.join(db, "p")
        .filter(F.col("ma") < F.col("mb"))
        .groupBy("ma", "mb")
        .agg(F.count("*").alias("exact_common_raw"))
    )

    est_a = kmv_estimate(F.col("n_s"), F.col("h_k"), K)
    est_b = kmv_estimate(F.col("n_sb"), F.col("h_kb"), K)
    est_u = kmv_estimate(F.col("n_u"), F.col("u_k"), K)
    jac = F.col("n_common").cast("double") / F.col("n_u").cast("double")
    exc = F.coalesce(F.col("exact_common_raw"), F.lit(0).cast("long"))

    return (
        pairs.join(ga, "ma")
        .join(gb, "mb")
        .join(ex.select(F.col("m").alias("ma"), F.col("exact_n").alias("exact_a")), "ma")
        .join(ex.select(F.col("m").alias("mb"), F.col("exact_n").alias("exact_b")), "mb")
        .join(ust, ["ma", "mb"])
        .join(exi, ["ma", "mb"], "left")
        .select(
            F.col("ma").alias("month_a"),
            F.col("mb").alias("month_b"),
            "exact_a",
            "exact_b",
            exc.alias("exact_common"),
            # r10 legacy conversion: jaccards are exact integer ratios
            # (ratio6); the KMV estimates are raw-IEEE chains over exact
            # integers pinned to the 3dp grid via fround.
            ratio6(
                "coalesce(exact_common_raw, 0)",
                "exact_a + exact_b - coalesce(exact_common_raw, 0)",
            ).alias("exact_jaccard"),
            fround(est_a, 3).alias("est_a"),
            fround(est_b, 3).alias("est_b"),
            fround(est_u, 3).alias("est_union"),
            ratio6("n_common", "n_u").alias("jaccard_est"),
            fround(jac * est_u, 3).alias("est_common"),
        )
        .orderBy("month_a", "month_b")
    )


@register(
    "a_ab_test_zstat",
    oracle=f"""
    WITH ud AS (
        SELECT user_id % 2 AS variant, CAST(ts AS DATE) AS day,
            max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS viewed,
            max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS purchased
        FROM events
        GROUP BY 1, user_id, 2
    ),
    arms AS (
        SELECT variant,
            CAST(sum(viewed) AS BIGINT) AS n_exposed,
            CAST(sum(viewed * purchased) AS BIGINT) AS n_converted
        FROM ud GROUP BY 1
    ),
    wide AS (
        SELECT
            max(CASE WHEN variant = 0 THEN n_exposed END) AS n_control,
            max(CASE WHEN variant = 0 THEN n_converted END) AS conv_control,
            max(CASE WHEN variant = 1 THEN n_exposed END) AS n_treatment,
            max(CASE WHEN variant = 1 THEN n_converted END) AS conv_treatment
        FROM arms
    )
    SELECT n_control, conv_control,
        {ratio6_sql('conv_control', 'n_control')} AS rate_control,
        n_treatment, conv_treatment,
        {ratio6_sql('conv_treatment', 'n_treatment')}
            AS rate_treatment,
        (
            (CAST(conv_treatment AS DOUBLE) / n_treatment
             - CAST(conv_control AS DOUBLE) / n_control)
            / sqrt(
                (CAST(conv_control + conv_treatment AS DOUBLE)
                 / (n_control + n_treatment))
                * (1.0 - CAST(conv_control + conv_treatment AS DOUBLE)
                   / (n_control + n_treatment))
                * (CAST(1 AS DOUBLE) / n_control
                   + CAST(1 AS DOUBLE) / n_treatment)
            )) AS zstat,
        abs(
            (CAST(conv_treatment AS DOUBLE) / n_treatment
             - CAST(conv_control AS DOUBLE) / n_control)
            / sqrt(
                (CAST(conv_control + conv_treatment AS DOUBLE)
                 / (n_control + n_treatment))
                * (1.0 - CAST(conv_control + conv_treatment AS DOUBLE)
                   / (n_control + n_treatment))
                * (CAST(1 AS DOUBLE) / n_control
                   + CAST(1 AS DOUBLE) / n_treatment)
            )) > 1.96 AS significant
    FROM wide
    """,
    tags=("agg", "experiment", "stats"),
)
def a_ab_test_zstat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion A/B readout over the event log: unit = (user, day),
    exposure = a view that day, conversion = view AND purchase the same
    day, arms split by user hash (user_id % 2 — the deterministic stand-
    in for an assignment column). Reports per-arm exposures/conversions/
    rates, the pooled two-proportion z statistic, and the |z| > 1.96
    significance flag — the experimentation readout every product
    analytics deployment runs on exactly this event-log shape.

    One shuffle to the (variant, user, day) grain, a 2-row arm
    aggregate, then a conditional-aggregation pivot to one row. All
    counts are exact integers; the z arithmetic is IEEE on those
    integers in an expression mirrored token-for-token in the oracle —
    cell-exact."""
    ev = table(spark, sf_dir, "events")
    ud = ev.groupBy(
        (F.col("user_id") % 2).alias("variant"),
        F.col("user_id"),
        F.to_date("ts").alias("day"),
    ).agg(
        F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("viewed"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "purchased"
        ),
    )
    arms = ud.groupBy("variant").agg(
        F.sum("viewed").cast("long").alias("n_exposed"),
        F.sum(F.col("viewed") * F.col("purchased")).cast("long").alias("n_converted"),
    )
    wide = arms.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n_exposed"))).alias("n_control"),
        F.max(F.when(F.col("variant") == 0, F.col("n_converted"))).alias(
            "conv_control"
        ),
        F.max(F.when(F.col("variant") == 1, F.col("n_exposed"))).alias("n_treatment"),
        F.max(F.when(F.col("variant") == 1, F.col("n_converted"))).alias(
            "conv_treatment"
        ),
    )
    rate_c = F.col("conv_control").cast("double") / F.col("n_control")
    rate_t = F.col("conv_treatment").cast("double") / F.col("n_treatment")
    # mirror the oracle token order exactly: pooled rate computed as
    # cast(sum)/sum each time it appears
    pooled = (
        (F.col("conv_control") + F.col("conv_treatment")).cast("double")
        / (F.col("n_control") + F.col("n_treatment"))
    )
    se = F.sqrt(
        pooled
        * (F.lit(1.0) - pooled)
        * (
            F.lit(1.0).cast("double") / F.col("n_control")
            + F.lit(1.0).cast("double") / F.col("n_treatment")
        )
    )
    z = (rate_t - rate_c) / se
    # r10 legacy conversion: the rates are exact integer ratios (ratio6);
    # z is a chain of correctly-rounded IEEE ops over exact integers, so
    # the RAW double is bit-identical on every build — no round(double, 6).
    return wide.select(
        "n_control",
        "conv_control",
        ratio6("conv_control", "n_control").alias("rate_control"),
        "n_treatment",
        "conv_treatment",
        ratio6("conv_treatment", "n_treatment").alias("rate_treatment"),
        z.alias("zstat"),
        (F.abs(z) > 1.96).alias("significant"),
    )


@register(
    "a_market_basket_lift",
    oracle=f"""
    WITH basket AS (
        SELECT DISTINCT l.l_orderkey AS o, p.p_brand AS b
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    n AS (SELECT count(DISTINCT o) AS n_baskets FROM basket),
    item AS (SELECT b, count(*) AS item_count FROM basket GROUP BY 1),
    pair AS (
        SELECT a.b AS brand_a, c.b AS brand_b, count(*) AS pair_count
        FROM basket a JOIN basket c ON a.o = c.o AND a.b < c.b
        GROUP BY 1, 2
    )
    SELECT brand_a, brand_b, pair_count,
        {ratio6_sql('pair_count', 'n.n_baskets')} AS support,
        {ratio6_sql('pair_count', 'ia.item_count')} AS confidence,
        {ratio6w_sql('pair_count * n.n_baskets',
                     'ia.item_count * ib.item_count')} AS lift
    FROM pair
    JOIN item ia ON ia.b = brand_a
    JOIN item ib ON ib.b = brand_b
    CROSS JOIN n
    WHERE pair_count >= 20
    ORDER BY lift DESC, brand_a, brand_b
    LIMIT 30
    """,
    tags=("agg", "basket", "association"),
)
def a_market_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule readout over order baskets: for every brand pair
    co-occurring in >= 20 orders, support, confidence(a->b), and lift —
    the classic market-basket statistic behind "frequently bought
    together" surfaces (the reference's co-purchase intuition, here with
    the probabilistic normalization that separates real affinity from
    popularity). Top-30 by lift, ties on the pair.

    Shape: one broadcast dim join (part is the small side), then ONE
    ``collect_set`` aggregate to basket grain — the distinct brand set
    per order as a sorted array (bounded by |brands| = 25, order-local,
    never global) — from which all three consumers derive: n_baskets is
    a count of basket rows, item counts explode the array once, and the
    ordered pairs explode MAP-SIDE from the array (r11, guide §2.4 —
    replaces the former distinct + order-local self-join, dropping the
    distinct-(o,b) exchange and the join; same pair multiset since
    collect_set members are distinct and sort_array orders them, so
    brand_a < brand_b holds by construction). The min-support gate
    prunes the pair tail before ranking, and the final top-30 plans as
    TakeOrderedAndProject. At 100 TB the same plan holds: the only wide
    exchange is the basket aggregate, and lift math runs on
    |pairs| <= 25*24/2 rows."""
    from boxoffice_spark.functions.caching import scoped_persist

    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    baskets = scoped_persist(
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(F.col("l_orderkey").isNotNull())  # match join-form semantics (ADVICE r11)
        .groupBy(F.col("l_orderkey").alias("o"))
        .agg(F.sort_array(F.collect_set("p_brand")).alias("_bs")),
        # three consumers (n, item, pair) read this aggregate; unpersisted,
        # AQE breaks exchange reuse and the basket build runs three times
        # (ADVICE r11 — the g_degree_distribution fix applied here).
        # Bounded: one row per order.
        "market_basket_lift.baskets",
    )
    n = baskets.agg(F.count("*").alias("n_baskets"))
    item = (
        baskets.select(F.explode("_bs").alias("b"))
        .groupBy("b")
        .agg(F.count("*").alias("item_count"))
    )
    pair = (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(_bs, (x, i) -> "
                    "transform(slice(_bs, i + 2, size(_bs) - i - 1), "
                    "y -> struct(x as brand_a, y as brand_b))))"
                )
            ).alias("_pr")
        )
        .select("_pr.brand_a", "_pr.brand_b")
        .groupBy("brand_a", "brand_b")
        .agg(F.count("*").alias("pair_count"))
        .filter(F.col("pair_count") >= 20)
    )
    ia = item.select(F.col("b").alias("brand_a"), F.col("item_count").alias("_ca"))
    ib = item.select(F.col("b").alias("brand_b"), F.col("item_count").alias("_cb"))
    # r10 legacy conversion: all three cells are exact integer ratios —
    # support/confidence via ratio6's BIGINT HALF_UP, lift via ratio6w's
    # 128-bit path (its numerator pair_count * n_baskets is corpus² —
    # exact while under 9.2e18, i.e. ~3e9 baskets).
    return (
        pair.join(F.broadcast(ia), "brand_a")
        .join(F.broadcast(ib), "brand_b")
        .crossJoin(F.broadcast(n))
        .select(
            "brand_a",
            "brand_b",
            "pair_count",
            ratio6("pair_count", "n_baskets").alias("support"),
            ratio6("pair_count", "_ca").alias("confidence"),
            ratio6w("pair_count * n_baskets", "_ca * _cb").alias("lift"),
        )
        .orderBy(F.desc("lift"), "brand_a", "brand_b")
        .limit(30)
    )


@register(
    "a_regression_by_group",
    oracle=f"""
    WITH daily AS (
        SELECT p.p_brand AS brand,
            datediff('day', DATE '1992-01-01', CAST(l.l_shipdate AS DATE)) AS x,
            {dsum_sql('l.l_extendedprice * (1 - l.l_discount)', 4)} AS y
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY 1, 2
    ),
    s AS (
        SELECT brand, count(*) AS n,
            CAST(sum(x) AS BIGINT) AS sx, CAST(sum(x * x) AS BIGINT) AS sxx,
            {dsum_sql('y', 4)} AS sy, {dsum_sql('x * y', 4)} AS sxy,
            CAST(sum(CAST({funits_sql('y', 4)} AS HUGEINT)
                     * {funits_sql('y', 4)}) AS DOUBLE) / 1e8 AS syy
        FROM daily GROUP BY 1
    )
    SELECT brand, n,
        {fround_sql('(n * sxy - sx * sy)'
                    ' / (n * sxx - CAST(sx AS DOUBLE) * sx)', 6)}
            AS slope,
        {fround_sql('(sy - ((n * sxy - sx * sy)'
                    ' / (n * sxx - CAST(sx AS DOUBLE) * sx)) * sx) / n', 6)}
            AS intercept,
        {fround_sql('(n * sxy - sx * sy) * (n * sxy - sx * sy)'
                    ' / ((n * sxx - CAST(sx AS DOUBLE) * sx)'
                    ' * (n * syy - sy * sy))', 6)}
            AS r2
    FROM s
    ORDER BY brand
    """,
    tags=("agg", "regression", "trend"),
)
def a_regression_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand OLS trend of daily revenue vs day index — the grouped
    regression every metrics dashboard runs ("is this segment growing,
    and how fast"), computed in closed form from sufficient statistics
    (n, Sx, Sxx, Sy, Sxy, Syy) instead of any per-group model fit:
    slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2), plus intercept and R^2.

    Cell-exact: x is an integer day index so Sx/Sxx are exact BIGINTs; y
    and the cross moments ride the decimal path (y is exact at 4dp by
    construction, so x*y is exact at 4dp and y*y at 8dp); the closed-form
    division mirrors the oracle token-for-token in IEEE double. Shape:
    one shuffle to (brand, day) grain, one partial-agg shuffle to brand
    — the regression itself costs |brands| rows of arithmetic. The same
    two-exchange plan holds at 100 TB; no per-group iteration, no
    collect, no ML library."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    x = F.datediff(F.to_date("l_shipdate"), F.lit("1992-01-01").cast("date"))
    daily = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            x.alias("x"),
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=4).alias(
                "y"
            )
        )
    )
    # r10 legacy conversion: y*y is OFF the 8dp grid at daily-revenue
    # magnitude (1e12 needs > 53 bits at 1e-8 resolution), so its decimal
    # cast was the refuted double->decimal-grid class. Syy now accumulates
    # as EXACT integer units — yu = funits(y, 4) recovers y's exact 1e-4
    # units (y is on the 4dp grid by construction), yu*yu sums in
    # DECIMAL(38,0)/HUGEINT (exact to 38 digits; ~2.4e23 at fixture
    # magnitudes). Sy/Sxy keep the value-preserving decimal path. The
    # three fitted cells pin their 6dp grid via fround.
    from boxoffice_spark.functions.numeric import funits

    yu = funits(F.col("y"), 4)
    s = daily.groupBy("brand").agg(
        F.count("*").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        dsum("y", scale=4).alias("sy"),
        dsum(F.col("x") * F.col("y"), scale=4).alias("sxy"),
        (
            F.sum(yu.cast("decimal(38,0)") * yu).cast("double") / 1e8
        ).alias("syy"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    sy, sxy, syy = F.col("sy"), F.col("sxy"), F.col("syy")
    num = n * sxy - sx * sy
    den = n * sxx - sx.cast("double") * sx
    slope = num / den
    return s.select(
        "brand",
        "n",
        fround(slope, 6).alias("slope"),
        fround((sy - slope * sx) / n, 6).alias("intercept"),
        fround(num * num / (den * (n * syy - sy * sy)), 6).alias("r2"),
    ).orderBy("brand")


@register(
    "a_gini_concentration",
    oracle=f"""
    WITH spend AS (
        SELECT c.c_mktsegment AS segment, o.o_custkey,
            {dsum_sql('o.o_totalprice')} AS x
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT segment, x,
            ROW_NUMBER() OVER (
                PARTITION BY segment ORDER BY x, o_custkey
            ) AS i,
            ROW_NUMBER() OVER (
                PARTITION BY segment ORDER BY x DESC, o_custkey
            ) AS i_desc,
            COUNT(*) OVER (PARTITION BY segment) AS n_seg
        FROM spend
    ),
    agg AS (
        SELECT segment, count(*) AS n,
            {dsum_sql('x')} AS sx, {dsum_sql('i * x', 2)} AS six,
            {dsum_sql('CASE WHEN i_desc <= n_seg / 10 THEN x ELSE 0 END', 2)} AS top_decile_x
        FROM ranked GROUP BY 1
    )
    SELECT segment, n,
        {fround_sql('sx', 2)} AS total_spend,
        {fround_sql('(2 * six - (n + 1) * sx) / (n * sx)', 6)} AS gini,
        {fround_sql('top_decile_x / sx', 6)} AS top_decile_share
    FROM agg
    ORDER BY segment
    """,
    tags=("agg", "gini", "concentration"),
)
def a_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration report per market segment: the Gini
    coefficient of per-customer spend (0 = perfectly even, ->1 = one
    whale) plus the top-decile revenue share — the inequality statistics
    behind "80% of revenue from 20% of customers" claims, per segment so
    segments are comparable. Gini from the rank formula
    G = (2*Σ(i·x_i) − (n+1)·Σx) / (n·Σx) on the ascending-sorted spend.

    Cell-exact: ranks are deterministic (spend asc, custkey tie-break),
    i·x is exact at 2dp so the cross moment decimal-sums, and the final
    expression is mirrored IEEE. Scale: the sort is a per-SEGMENT window
    over the per-customer aggregate (never raw orders, never a single
    global partition); at extreme cardinality swap the exact rank for a
    quantile-histogram Lorenz approximation, same output schema."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    spend = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"), "o_custkey")
        .agg(dsum("o_totalprice").alias("x"))
    )
    wi = W.partitionBy("segment").orderBy("x", "o_custkey")
    wd = W.partitionBy("segment").orderBy(F.desc("x"), "o_custkey")
    wn = W.partitionBy("segment")
    ranked = spend.select(
        "segment",
        "x",
        F.row_number().over(wi).alias("i"),
        F.row_number().over(wd).alias("i_desc"),
        F.count("*").over(wn).alias("_n_seg"),
    )
    agg = ranked.groupBy("segment").agg(
        F.count("*").alias("n"),
        dsum("x").alias("sx"),
        dsum(F.col("i") * F.col("x"), scale=2).alias("six"),
        dsum(
            F.when(F.col("i_desc") <= F.col("_n_seg") / 10, F.col("x")).otherwise(
                F.lit(0)
            ),
            scale=2,
        ).alias("top_decile_x"),
    )
    n, sx, six = F.col("n"), F.col("sx"), F.col("six")
    # r10 legacy conversion: gini and the decile share are raw-IEEE
    # chains over 2dp-grid decimal sums, pinned to the 6dp grid via
    # fround (round(double, 6) is build surface); total_spend's round is
    # the GRID class (sx already sits on the 2dp grid) and stays.
    return agg.select(
        "segment",
        "n",
        fround(sx, 2).alias("total_spend"),
        fround((2 * six - (n + 1) * sx) / (n * sx), 6).alias("gini"),
        fround(F.col("top_decile_x") / sx, 6).alias("top_decile_share"),
    ).orderBy("segment")


@register(
    "a_abc_classification",
    oracle=f"""
    WITH rev AS (
        SELECT p.p_type AS category, p.p_partkey,
            {dsum_sql('l.l_extendedprice * (1 - l.l_discount)', 4)} AS revenue
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY 1, 2
    ),
    walk AS (
        SELECT category, p_partkey, revenue,
            CAST(SUM(CAST(revenue AS DECIMAL(38,4))) OVER (
                PARTITION BY category ORDER BY revenue DESC, p_partkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) AS DOUBLE) AS cum_rev,
            CAST(SUM(CAST(revenue AS DECIMAL(38,4))) OVER (
                PARTITION BY category
            ) AS DOUBLE) AS tot_rev
        FROM rev
    )
    SELECT category, p_partkey, revenue,
        {fround_sql('cum_rev / tot_rev', 6)} AS cum_share,
        CASE WHEN cum_rev / tot_rev <= 0.8 THEN 'A'
             WHEN cum_rev / tot_rev <= 0.95 THEN 'B'
             ELSE 'C' END AS abc_class
    FROM walk
    ORDER BY category, cum_share
    """,
    tags=("agg", "abc", "pareto"),
)
def a_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto inventory classification per part category: parts
    sorted by revenue contribution, cumulative share, and the classic
    A (first 80% of revenue) / B (to 95%) / C (tail) class — the
    analysis that decides which SKUs get counted weekly vs yearly, and
    the long-tail cut a curation pipeline applies to sources. Cumulative
    revenue rides a DECIMAL running window (w_cumulative_sum rule) and
    the share is one mirrored IEEE division, so the class boundaries are
    cell-exact. All windows partition by category over the per-part
    aggregate — bounded, never global, never over raw lineitem."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    rev = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_type").alias("category"), "p_partkey")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=4).alias(
                "revenue"
            )
        )
    )
    wcum = (
        W.partitionBy("category")
        .orderBy(F.desc("revenue"), "p_partkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    walk = rev.select(
        "category",
        "p_partkey",
        "revenue",
        F.sum(F.col("revenue").cast("decimal(38,4)"))
        .over(wcum)
        .cast("double")
        .alias("cum_rev"),
        F.sum(F.col("revenue").cast("decimal(38,4)"))
        .over(W.partitionBy("category"))
        .cast("double")
        .alias("tot_rev"),
    )
    share = F.col("cum_rev") / F.col("tot_rev")
    # r10 legacy conversion: the share is one IEEE division of decimal-
    # grid doubles, pinned to 6dp via fround (not round(double, 6)).
    return walk.select(
        "category",
        "p_partkey",
        "revenue",
        fround(share, 6).alias("cum_share"),
        F.when(share <= 0.8, "A").when(share <= 0.95, "B").otherwise("C").alias(
            "abc_class"
        ),
    ).orderBy("category", "cum_share")


@register(
    "a_spearman_rank_corr",
    oracle=f"""
    WITH per_cust AS (
        SELECT c.c_mktsegment AS segment, o.o_custkey,
            count(*) AS freq, {dsum_sql('o.o_totalprice')} AS spend
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT segment,
            ROW_NUMBER() OVER (
                PARTITION BY segment ORDER BY spend, o_custkey
            ) AS r_spend,
            ROW_NUMBER() OVER (
                PARTITION BY segment ORDER BY freq, o_custkey
            ) AS r_freq
        FROM per_cust
    )
    SELECT segment, count(*) AS n,
        {fround_sql('''1.0 - 6.0 * CAST(sum(
            (r_spend - r_freq) * (r_spend - r_freq)) AS BIGINT)
            / (CAST(count(*) AS DOUBLE)
               * (CAST(count(*) AS DOUBLE) * count(*) - 1))''', 6)}
            AS spearman_rho
    FROM ranked GROUP BY 1
    ORDER BY segment
    """,
    tags=("agg", "correlation", "rank"),
)
def a_spearman_rank_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between customer SPEND and order
    FREQUENCY per segment: do the customers who order most often also
    spend the most, monotonically? The robust (rank-space) complement of
    Pearson r that survives the heavy-tailed spend distribution —
    rho = 1 − 6Σd²/(n(n²−1)) on deterministically tie-broken ranks
    (custkey breaks ties identically in both engines; documented as
    Spearman-on-broken-ties rather than averaged-rank Spearman).

    Cell-exact: ranks and Σd² are exact integers, the closing expression
    is one mirrored IEEE division. Scale: two per-SEGMENT windows over
    the per-customer aggregate, one |segments|-row readout — the rank
    windows never see raw orders."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    per_cust = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"), "o_custkey")
        .agg(F.count("*").alias("freq"), dsum("o_totalprice").alias("spend"))
    )
    ranked = per_cust.select(
        "segment",
        F.row_number()
        .over(W.partitionBy("segment").orderBy("spend", "o_custkey"))
        .alias("r_spend"),
        F.row_number()
        .over(W.partitionBy("segment").orderBy("freq", "o_custkey"))
        .alias("r_freq"),
    )
    d2 = (F.col("r_spend") - F.col("r_freq")) * (F.col("r_spend") - F.col("r_freq"))
    n = F.count("*")
    return (
        ranked.groupBy("segment")
        .agg(
            n.alias("n"),
            # r10 legacy conversion: the rho chain is IEEE over exact
            # integers; fround pins its 6dp grid (round is build surface).
            fround(
                F.lit(1.0)
                - 6.0
                * F.sum(d2).cast("long")
                / (n.cast("double") * (n.cast("double") * n - 1)),
                6,
            ).alias("spearman_rho"),
        )
        .orderBy("segment")
    )


@register(
    "a_sample_estimate_ci",
    oracle=f"""
    WITH s AS (
        SELECT o_totalprice AS x
        FROM orders
        WHERE substr(md5('aqp' || CAST(o_orderkey AS VARCHAR)), 1, 8)
              < '04000000'
    ),
    agg AS (
        SELECT count(*) AS n_sample, {dsum_sql('x')} AS sx,
            {dsum_sql('x * x', 4)} AS sxx
        FROM s
    ),
    truth AS (
        SELECT count(*) AS n_true, {dsum_sql('o_totalprice')} AS true_total
        FROM orders
    )
    SELECT n_sample, n_true,
        round(sx * 64, 2) AS est_total,
        round(true_total, 2) AS true_total,
        round(sqrt(sxx * (1.0 - 1.0 / 64)) * 64, 2) AS se,
        round(abs(sx * 64 - true_total) / (sqrt(sxx * (1.0 - 1.0 / 64)) * 64), 6)
            AS z_err,
        abs(sx * 64 - true_total)
            <= 1.96 * (sqrt(sxx * (1.0 - 1.0 / 64)) * 64) AS within_95ci
    FROM agg CROSS JOIN truth
    """,
    tags=("agg", "aqp", "sampling"),
)
def a_sample_estimate_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate query processing with an error bar: estimate total
    order revenue from a deterministic ~1.6% Bernoulli sample (md5 hash
    coin on the order key, the t_hash_sample rule) via the
    Horvitz-Thompson estimator T = Σx/p, with its design-based standard
    error se = sqrt(Σx²(1−p))/p — the sample-with-confidence pattern a
    dashboard runs when the full scan is too expensive, made auditable
    here by computing the TRUE total alongside and flagging whether it
    falls inside the 95% interval. At 100 TB only the sample aggregate
    runs (drop the truth columns); the estimator math is identical.

    The inclusion probability is p = 1/64 EXACTLY (8-hex-digit md5
    prefix < '04000000' — the operators/sampling lexicographic-coin
    idiom with threshold 0x04000000/16^8), so the 64x scale factor is
    binary-exact. Cell-exact: the sample is hash-deterministic, moments
    ride decimal sums, estimator/SE/z arithmetic is token-mirrored."""
    o = table(spark, sf_dir, "orders")
    coin = F.substring(
        F.md5(F.concat(F.lit("aqp"), F.col("o_orderkey").cast("string"))), 1, 8
    )
    s = o.filter(coin < "04000000").select(F.col("o_totalprice").alias("x"))
    agg = s.agg(
        F.count("*").alias("n_sample"),
        dsum("x").alias("sx"),
        dsum(F.col("x") * F.col("x"), scale=4).alias("sxx"),
    )
    truth = o.agg(
        F.count("*").alias("n_true"), dsum("o_totalprice").alias("true_total")
    )
    est = F.col("sx") * 64
    se = F.sqrt(F.col("sxx") * (1.0 - 1.0 / 64)) * 64
    return agg.crossJoin(F.broadcast(truth)).select(
        "n_sample",
        "n_true",
        F.round(est, 2).alias("est_total"),
        F.round("true_total", 2).alias("true_total"),
        F.round(se, 2).alias("se"),
        F.round(F.abs(est - F.col("true_total")) / se, 6).alias("z_err"),
        (F.abs(est - F.col("true_total")) <= 1.96 * se).alias("within_95ci"),
    )


@register(
    "a_trimmed_mean",
    oracle=f"""
    WITH th AS (
        SELECT o_orderpriority,
            quantile_cont(o_totalprice, 0.05) AS p5,
            quantile_cont(o_totalprice, 0.95) AS p95
        FROM orders GROUP BY 1
    )
    SELECT o.o_orderpriority, count(*) AS n_all,
        {davg_sql('o.o_totalprice')} AS mean_all,
        count(CASE WHEN o.o_totalprice >= th.p5
                    AND o.o_totalprice <= th.p95 THEN 1 END) AS n_kept,
        ({dsum_sql("CASE WHEN o.o_totalprice >= th.p5 AND o.o_totalprice <= th.p95 THEN o.o_totalprice END", 6)}
         / count(CASE WHEN o.o_totalprice >= th.p5
                       AND o.o_totalprice <= th.p95 THEN 1 END)) AS trimmed_mean
    FROM orders o JOIN th ON th.o_orderpriority = o.o_orderpriority
    GROUP BY 1
    ORDER BY 1
    """,
    tags=("agg", "robust", "trimmed"),
)
def a_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5% two-sided trimmed mean of order value per priority class — the
    robust central-tendency readout that doesn't move when a whale order
    lands (the reporting-layer complement to dq_volume_anomaly_mad's
    alarm): exact p5/p95 thresholds from one grouped percentile
    aggregate, broadcast back, then a conditional decimal mean over the
    kept middle 90%. Mean_all sits alongside so the whale influence is
    visible as the gap between the two columns. Cell-exact; one
    percentile pass + one conditional-aggregate pass, thresholds are a
    |priorities|-row broadcast."""
    o = table(spark, sf_dir, "orders")
    th = o.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", F.lit(0.05)).alias("p5"),
        F.percentile("o_totalprice", F.lit(0.95)).alias("p95"),
    )
    kept = F.when(
        (F.col("o_totalprice") >= F.col("p5"))
        & (F.col("o_totalprice") <= F.col("p95")),
        F.col("o_totalprice"),
    )
    return (
        o.join(F.broadcast(th), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_all"),
            davg("o_totalprice").alias("mean_all"),
            F.count(kept).alias("n_kept"),
            (dsum(kept, scale=6) / F.count(kept)).alias("trimmed_mean"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "a_moments_profile",
    oracle=f"""
    WITH s AS (
        SELECT o_orderpriority, count(*) AS n,
            {dsum_sql('o_totalprice')} AS s1,
            {dsum_sql('o_totalprice * o_totalprice', 4)} AS s2,
            {dsum_sql('(o_totalprice * o_totalprice) * o_totalprice', 2)} AS s3,
            {dsum_sql('(o_totalprice * o_totalprice) * (o_totalprice * o_totalprice)', 2)} AS s4
        FROM orders GROUP BY 1
    ),
    m AS (
        SELECT o_orderpriority, n,
            s1 / n AS mean,
            s2 / n - (s1 / n) * (s1 / n) AS m2,
            s3 / n - 3 * (s1 / n) * (s2 / n)
                + 2 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
            s4 / n - 4 * (s1 / n) * (s3 / n)
                + 6 * (s1 / n) * (s1 / n) * (s2 / n)
                - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
        FROM s
    )
    SELECT o_orderpriority, n,
        round(mean, 4) AS mean,
        round(sqrt(m2), 4) AS stddev_pop,
        round(m3 / pow(m2, 1.5), 6) AS skewness,
        round(m4 / (m2 * m2) - 3, 6) AS excess_kurtosis
    FROM m
    ORDER BY o_orderpriority
    """,
    tags=("agg", "moments", "profile"),
)
def a_moments_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-shape profile per priority class: population mean,
    stddev, skewness (g1 = m3/m2^1.5) and excess kurtosis (g2 =
    m4/m2² − 3) from one pass of raw power sums — the datacard row that
    says whether a value column is symmetric, right-tailed, or
    heavy-tailed before anyone fits thresholds to it (z-score gates
    assume g1≈0; this is the check). Central moments expand from
    S1..S4 in token-mirrored IEEE; the power sums ride decimal at
    scale 2 (x³/x⁴ exceed both double's 53 bits and decimal(27)'s
    room at full scale, but BOTH engines compute the identical
    correctly-rounded double and cast it to the same 2dp decimal, so
    the sums stay bit-deterministic — the determinism contract needs
    identical inputs, not exact ones; a tie at the 2dp cast boundary
    would need the double's full ~50-digit expansion to terminate in
    5000…, which finite binary fractions of these magnitudes do not).
    One aggregation pass, |groups| output rows, no second scan."""
    o = table(spark, sf_dir, "orders")
    x = F.col("o_totalprice")
    s = o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        dsum(x).alias("s1"),
        dsum(x * x, scale=4).alias("s2"),
        dsum((x * x) * x, scale=2).alias("s3"),
        dsum((x * x) * (x * x), scale=2).alias("s4"),
    )
    n = F.col("n")
    mean = F.col("s1") / n
    m2 = F.col("s2") / n - mean * mean
    m3 = F.col("s3") / n - 3 * mean * (F.col("s2") / n) + 2 * mean * mean * mean
    m4 = (
        F.col("s4") / n
        - 4 * mean * (F.col("s3") / n)
        + 6 * mean * mean * (F.col("s2") / n)
        - 3 * mean * mean * mean * mean
    )
    return s.select(
        "o_orderpriority",
        "n",
        F.round(mean, 4).alias("mean"),
        F.round(F.sqrt(m2), 4).alias("stddev_pop"),
        F.round(m3 / F.pow(m2, F.lit(1.5)), 6).alias("skewness"),
        F.round(m4 / (m2 * m2) - 3, 6).alias("excess_kurtosis"),
    ).orderBy("o_orderpriority")


@register(
    "a_welch_ttest",
    oracle=f"""
    WITH arm AS (
        SELECT c_mktsegment AS segment, count(*) AS n,
            {dsum_sql('o_totalprice')} AS s1,
            {dsum_sql('o_totalprice * o_totalprice', 4)} AS s2
        FROM orders JOIN customer ON c_custkey = o_custkey
        WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
        GROUP BY 1
    ),
    m AS (
        SELECT segment, n, s1 / n AS mean,
            (s2 - s1 * (s1 / n)) / (n - 1) AS var_s
        FROM arm
    ),
    wide AS (
        SELECT
            max(CASE WHEN segment = 'BUILDING' THEN n END) AS n_a,
            max(CASE WHEN segment = 'BUILDING' THEN mean END) AS mean_a,
            max(CASE WHEN segment = 'BUILDING' THEN var_s END) AS var_a,
            max(CASE WHEN segment = 'MACHINERY' THEN n END) AS n_b,
            max(CASE WHEN segment = 'MACHINERY' THEN mean END) AS mean_b,
            max(CASE WHEN segment = 'MACHINERY' THEN var_s END) AS var_b
        FROM m
    )
    SELECT n_a, round(mean_a, 4) AS mean_a, round(sqrt(var_a), 4) AS sd_a,
        n_b, round(mean_b, 4) AS mean_b, round(sqrt(var_b), 4) AS sd_b,
        round((mean_a - mean_b) / sqrt(var_a / n_a + var_b / n_b), 6)
            AS tstat,
        round(
            (var_a / n_a + var_b / n_b) * (var_a / n_a + var_b / n_b)
            / ((var_a / n_a) * (var_a / n_a) / (n_a - 1)
               + (var_b / n_b) * (var_b / n_b) / (n_b - 1)), 2) AS df_welch,
        abs((mean_a - mean_b) / sqrt(var_a / n_a + var_b / n_b)) > 1.96
            AS significant
    FROM wide
    """,
    tags=("agg", "experiment", "stats"),
)
def a_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test on mean order value between two
    customer segments — the MEANS complement of a_ab_test_zstat's
    proportions test, together the two readouts every experimentation
    platform ships. Per-arm count / sum / sum-of-squares come from ONE
    grouped decimal aggregate (order-independent, so the derived mean
    and sample variance are bit-deterministic); the t statistic and
    Welch-Satterthwaite degrees of freedom are pure scalar IEEE on
    those deterministic doubles, mirrored token-for-token in the
    oracle — cell-exact. |t| > 1.96 is the large-sample 5% flag (df is
    in the thousands here, where t and normal quantiles coincide).

    At 100 TB: the fact scan shuffles once to the 2-row arm grain
    (map-side partials do nearly all the work); the segment dimension
    is a broadcast join; everything after the aggregate is driver-tier
    arithmetic on 2 rows."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_mktsegment").alias("segment"),
    )
    price = F.col("o_totalprice")
    arm = (
        o.join(F.broadcast(c), "o_custkey")
        .filter(F.col("segment").isin("BUILDING", "MACHINERY"))
        .groupBy("segment")
        .agg(
            F.count("*").alias("n"),
            dsum(price).alias("s1"),
            dsum(price * price, scale=4).alias("s2"),
        )
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    m = arm.select(
        "segment",
        "n",
        (s1 / n).alias("mean"),
        ((s2 - s1 * (s1 / n)) / (n - 1)).alias("var_s"),
    )

    def pick(seg: str, col: str) -> Column:
        return F.max(F.when(F.col("segment") == seg, F.col(col)))

    wide = m.agg(
        pick("BUILDING", "n").alias("n_a"),
        pick("BUILDING", "mean").alias("mean_a"),
        pick("BUILDING", "var_s").alias("var_a"),
        pick("MACHINERY", "n").alias("n_b"),
        pick("MACHINERY", "mean").alias("mean_b"),
        pick("MACHINERY", "var_s").alias("var_b"),
    )
    se2 = F.col("var_a") / F.col("n_a") + F.col("var_b") / F.col("n_b")
    t = (F.col("mean_a") - F.col("mean_b")) / F.sqrt(se2)
    df = (se2 * se2) / (
        (F.col("var_a") / F.col("n_a")) * (F.col("var_a") / F.col("n_a"))
        / (F.col("n_a") - 1)
        + (F.col("var_b") / F.col("n_b")) * (F.col("var_b") / F.col("n_b"))
        / (F.col("n_b") - 1)
    )
    return wide.select(
        "n_a",
        F.round("mean_a", 4).alias("mean_a"),
        F.round(F.sqrt("var_a"), 4).alias("sd_a"),
        "n_b",
        F.round("mean_b", 4).alias("mean_b"),
        F.round(F.sqrt("var_b"), 4).alias("sd_b"),
        F.round(t, 6).alias("tstat"),
        F.round(df, 2).alias("df_welch"),
        (F.abs(t) > 1.96).alias("significant"),
    )


@register(
    "a_chi2_independence",
    oracle=f"""
    WITH obs AS (
        SELECT o_orderpriority AS priority, o_orderstatus AS status,
            count(*) AS n_obs
        FROM orders GROUP BY 1, 2
    ),
    rt AS (SELECT priority, sum(n_obs) AS row_n FROM obs GROUP BY 1),
    ct AS (SELECT status, sum(n_obs) AS col_n FROM obs GROUP BY 1),
    g AS (SELECT sum(n_obs) AS grand FROM obs),
    grid AS (
        SELECT rt.priority, ct.status,
            coalesce(obs.n_obs, 0) AS n_obs,
            CAST(rt.row_n AS DOUBLE) * ct.col_n / g.grand AS expected
        FROM rt CROSS JOIN ct CROSS JOIN g
        LEFT JOIN obs ON obs.priority = rt.priority
            AND obs.status = ct.status
    ),
    cells AS (
        SELECT priority, status, n_obs,
            {fround_sql('expected', 6)} AS expected,
            {fround_sql('(n_obs - expected) * (n_obs - expected)'
                        ' / expected', 6)} AS contrib
        FROM grid
    ),
    tot AS (
        SELECT cast(sum(cast(contrib AS DECIMAL(27, 6))) AS DOUBLE)
            AS chi2_total,
            (count(DISTINCT priority) - 1) * (count(DISTINCT status) - 1)
                AS dof
        FROM cells
    )
    SELECT cells.*, tot.chi2_total, tot.dof
    FROM cells CROSS JOIN tot
    ORDER BY priority, status
    """,
    tags=("agg", "stats", "contingency"),
)
def a_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-squared test of independence between order priority
    and order status — the contingency-table question (is fulfilment
    status independent of priority?) that complements t_chi2_keywords'
    one-vs-rest keyness with the full R x C form. Expected counts come
    from the row/column marginals of ONE grouped aggregate; absent
    cells are restored by the marginal cross join (a zero cell still
    contributes its full expected mass — dropping it understates
    chi2). Per-cell contributions land on the 6dp grid via fround's
    pinned floor-implemented HALF_UP (r10 conversion off the build-
    sensitive round(double, 6)) then decimal-sum value-preservingly, so
    the total is order-independent; dof =
    (R-1)(C-1) falls out of the same 15-row table. All joins after the
    first aggregate are broadcasts of <= |priorities| x |statuses|
    rows — at 100 TB the fact scan is one shuffle to the R x C grain
    and everything downstream is constant-size."""
    o = table(spark, sf_dir, "orders")
    obs = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderstatus").alias("status"),
    ).agg(F.count("*").alias("n_obs"))
    rt = obs.groupBy("priority").agg(F.sum("n_obs").alias("row_n"))
    ct = obs.groupBy("status").agg(F.sum("n_obs").alias("col_n"))
    g = obs.agg(F.sum("n_obs").alias("grand"))
    grid = (
        rt.crossJoin(F.broadcast(ct))
        .crossJoin(F.broadcast(g))
        .join(F.broadcast(obs), ["priority", "status"], "left")
        .select(
            "priority",
            "status",
            F.coalesce(F.col("n_obs"), F.lit(0)).alias("n_obs"),
            (
                F.col("row_n").cast("double") * F.col("col_n") / F.col("grand")
            ).alias("expected"),
        )
    )
    # r10 legacy conversion: expected/contrib are IEEE chains over exact
    # integers, pinned to the 6dp grid via fround (round is build
    # surface); the decimal sum of on-grid contribs stays value-preserving.
    cells = grid.select(
        "priority",
        "status",
        "n_obs",
        fround(F.col("expected"), 6).alias("expected"),
        fround(
            (F.col("n_obs") - F.col("expected"))
            * (F.col("n_obs") - F.col("expected"))
            / F.col("expected"),
            6,
        ).alias("contrib"),
    )
    tot = cells.agg(
        F.sum(F.col("contrib").cast("decimal(27,6)"))
        .cast("double")
        .alias("chi2_total"),
        (
            (F.countDistinct("priority") - 1) * (F.countDistinct("status") - 1)
        ).alias("dof"),
    )
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            "priority", "status", "n_obs", "expected", "contrib",
            "chi2_total", "dof",
        )
        .orderBy("priority", "status")
    )


@register(
    "a_mann_whitney_u",
    oracle=f"""
    WITH daily AS (
        SELECT o_orderstatus AS status,
            CAST(o_orderdate AS DATE) < DATE '1998-01-01' AS first_half,
            {dsum_sql('o_totalprice')} AS rev
        FROM orders
        GROUP BY 1, 2, CAST(o_orderdate AS DATE)
    ),
    n AS (
        SELECT status,
            sum(CASE WHEN first_half THEN 1 ELSE 0 END) AS n_first,
            sum(CASE WHEN first_half THEN 0 ELSE 1 END) AS n_second
        FROM daily GROUP BY 1
    ),
    n2 AS (SELECT * FROM n WHERE n_first > 0 AND n_second > 0),
    ranked AS (
        SELECT daily.status, first_half, n_first, n_second,
            rank() OVER (PARTITION BY daily.status ORDER BY rev) AS rk,
            count(*) OVER (PARTITION BY daily.status, rev) AS tie_n
        FROM daily JOIN n2 ON n2.status = daily.status
    ),
    agg AS (
        SELECT status, n_first, n_second,
            CAST(sum(CASE WHEN first_half
                THEN CAST(rk + (tie_n - 1) / 2.0 AS DECIMAL(20, 1)) END)
                AS DOUBLE) AS r1,
            sum(tie_n * tie_n - 1) AS tie_sum
        FROM ranked GROUP BY 1, 2, 3
    ),
    stat AS (
        SELECT status, n_first, n_second,
            r1 - n_first * (n_first + 1) / 2.0 AS u1,
            n_first * CAST(n_second AS DOUBLE) / 2.0 AS mu,
            sqrt(n_first * CAST(n_second AS DOUBLE) / 12.0
                 * ((n_first + n_second + 1.0)
                    - CAST(tie_sum AS DOUBLE)
                      / ((n_first + n_second)
                         * (n_first + n_second - 1.0)))) AS sigma
        FROM agg
    )
    SELECT status,
        CAST(n_first AS BIGINT) AS n_first,
        CAST(n_second AS BIGINT) AS n_second,
        CAST(u1 AS DECIMAL(20, 1)) AS u1,
        CASE WHEN sigma > 0 THEN (u1 - mu) / sigma END AS z_mwu,
        CASE WHEN sigma > 0 THEN abs((u1 - mu) / sigma) > 1.96 END
            AS significant
    FROM stat
    ORDER BY status
    """,
    tags=("agg", "stats", "nonparametric"),
)
def a_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test on the daily-revenue distribution
    between the early (< 1998) and late eras, per order status — the
    nonparametric LOCATION complement to dq_ks_drift's shape test and
    a_welch_ttest's parametric means test: did typical daily revenue
    SHIFT, without assuming normality?

    Pooled average ranks come from two windows over the bounded daily
    aggregate — rank() for the strictly-below count plus a per-(status,
    rev) tie count, giving avg_rank = rk + (tie_n-1)/2 (exactly the
    midrank, and exactly representable at one decimal place, so the
    rank-sum rides the decimal path order-independently). The tie
    correction Σ(t³-t) falls out of the same tie window as
    Σ tie_n²-1 per row. z uses the normal approximation with tie-
    corrected σ (no continuity correction — documented contract);
    σ = 0 (all days tied) yields NULL on both engines, not ±inf.

    At 100 TB: the only corpus-sized work is the first groupBy to the
    daily grain; ranks/windows run per-status over the calendar-bounded
    daily table, and everything after is a per-status scalar."""
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderstatus").alias("status"),
        (F.to_date("o_orderdate") < F.lit("1998-01-01")).alias("first_half"),
        F.to_date("o_orderdate").alias("_d"),
    ).agg(dsum("o_totalprice").alias("rev"))
    n = daily.groupBy("status").agg(
        F.sum(F.when(F.col("first_half"), 1).otherwise(0)).alias("n_first"),
        F.sum(F.when(F.col("first_half"), 0).otherwise(1)).alias("n_second"),
    )
    both = n.filter((F.col("n_first") > 0) & (F.col("n_second") > 0))
    w_rank = W.partitionBy("status").orderBy("rev")
    w_tie = W.partitionBy("status", "rev")
    ranked = daily.join(F.broadcast(both), "status").select(
        "status",
        "first_half",
        "n_first",
        "n_second",
        F.rank().over(w_rank).alias("rk"),
        F.count("*").over(w_tie).alias("tie_n"),
    )
    avg_rank = (F.col("rk") + (F.col("tie_n") - 1) / 2.0).cast("decimal(20,1)")
    agg = ranked.groupBy("status", "n_first", "n_second").agg(
        F.sum(F.when(F.col("first_half"), avg_rank)).cast("double").alias("r1"),
        F.sum(F.col("tie_n") * F.col("tie_n") - 1).alias("tie_sum"),
    )
    n1, n2_ = F.col("n_first"), F.col("n_second")
    nn = n1 + n2_
    u1 = F.col("r1") - n1 * (n1 + 1) / 2.0
    mu = n1 * n2_.cast("double") / 2.0
    sigma = F.sqrt(
        n1 * n2_.cast("double") / 12.0
        * (
            (nn + 1.0)
            - F.col("tie_sum").cast("double") / (nn * (nn - 1.0))
        )
    )
    stat = agg.select(
        "status", "n_first", "n_second",
        u1.alias("u1"), mu.alias("mu"), sigma.alias("sigma"),
    )
    z = (F.col("u1") - F.col("mu")) / F.col("sigma")
    # Final cells per parity rule 4 (r08 revision): u1 is an exact
    # half-integer (midrank sums), so the DECIMAL(20,1) cast is VALUE-
    # PRESERVING — the only safe decimal-cast class. z is emitted as the
    # RAW double: its chain (integer sums -> mul/div/sqrt/sub) is all
    # correctly-rounded IEEE ops over exact inputs, bit-identical on every
    # conformant build. The dec6 decimal cast this replaces was driver-red
    # two rounds running (double->decimal-grid rounding is build surface).
    return stat.select(
        "status",
        "n_first",
        "n_second",
        F.col("u1").cast("decimal(20,1)").alias("u1"),
        F.when(F.col("sigma") > 0, z).alias("z_mwu"),
        F.when(F.col("sigma") > 0, F.abs(z) > 1.96).alias("significant"),
    ).orderBy("status")


@register(
    "a_theil_sen_trend",
    oracle=f"""
    WITH daily AS (
        SELECT o_orderstatus AS status,
            date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
                AS x,
            {dsum_sql('o_totalprice')} AS rev
        FROM orders GROUP BY 1, 2
    ),
    pairs AS (
        SELECT a.status,
            round((b.rev - a.rev) / (b.x - a.x), 6) AS slope
        FROM daily a JOIN daily b ON a.status = b.status AND b.x > a.x
    ),
    sl AS (
        SELECT status, round(quantile_cont(slope, 0.5), 6) AS ts_slope,
            count(*) AS n_pairs
        FROM pairs GROUP BY 1
    ),
    icpt AS (
        SELECT d.status,
            round(quantile_cont(d.rev - s.ts_slope * d.x, 0.5), 4)
                AS ts_intercept,
            count(*) AS n_days
        FROM daily d JOIN sl s ON s.status = d.status
        GROUP BY 1
    )
    SELECT s.status, i.n_days, s.n_pairs, s.ts_slope, i.ts_intercept
    FROM sl s JOIN icpt i ON i.status = s.status
    ORDER BY s.status
    """,
    tags=("agg", "stats", "trend"),
)
def a_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of daily revenue per order status: the
    median of all pairwise slopes (rev_j - rev_i)/(x_j - x_i) over the
    daily series, plus the companion median-residual intercept — the
    outlier-proof alternative to a_regression_by_group's OLS (one wild
    revenue day moves OLS but not the median slope, breakdown point
    ~29%).

    Pairs come from a self-equi-join on status with the x_j > x_i range
    as a post-join filter (SortMergeJoin, never a cartesian). The pair
    count is C(|days|, 2) per status — quadratic in CALENDAR DAYS, not
    in rows, so it's bounded (~3M pairs per status for a 7-year
    window) at any data volume; the only corpus-sized work is the
    first groupBy to the daily grain. Slopes are rounded at 6dp before
    the exact interpolated median so both engines interpolate identical
    doubles; slope/intercept rounded again on output.

    The slope median is SORT-based, not percentile()-based: Spark's
    exact percentile aggregate materializes a value->count map per
    group and merges those maps across partitions — measured 14x
    slower on the ~3M-slope groups than a row_number window + the
    type-7 pick (x_lo + (x_hi - x_lo) * 0.5 over the one or two middle
    ranks, the identical interpolation quantile_cont uses, exact for
    the odd case since frac = 0). The window sort is spillable and
    per-status. The intercept median stays percentile() — it runs over
    |days| rows, where the map path is fine — and its groupBy also
    carries the slope/n_pairs columns through, so the pair pipeline is
    evaluated ONCE, not once per downstream join.

    At 100 TB: same shape — the daily aggregate is calendar-bounded,
    and the per-status median sorts at most the bounded pair list. For
    minute-grain series where |points|² explodes, the documented
    fallback is the repeated-median or sampled-pairs estimator; the
    engine contract here is the exact bounded tier."""
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderstatus").alias("status"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1992-01-01")).alias("x"),
    ).agg(dsum("o_totalprice").alias("rev"))
    # The daily aggregate is a few thousand rows, so AQE coalesces it to
    # one partition — which would make the C(n,2) pair EXPANSION serial.
    # Spreading the probe side by x (explicit numPartitions survives AQE
    # coalescing) and broadcasting the build side turns the expansion
    # into a parallel BroadcastHashJoin: each task expands its own slice
    # of days against the broadcast table.
    a = daily.repartition(32, "x").alias("a")
    b = F.broadcast(daily).alias("b")
    pairs = a.join(
        b,
        (F.col("a.status") == F.col("b.status")) & (F.col("b.x") > F.col("a.x")),
    ).select(
        F.col("a.status").alias("status"),
        F.round(
            (F.col("b.rev") - F.col("a.rev")) / (F.col("b.x") - F.col("a.x")), 6
        ).alias("slope"),
    )
    np_ = pairs.groupBy("status").agg(F.count("*").alias("n_pairs"))
    ranked = pairs.join(F.broadcast(np_), "status").select(
        "status",
        "slope",
        "n_pairs",
        F.row_number()
        .over(W.partitionBy("status").orderBy("slope"))
        .alias("rn"),
    )
    lo = F.floor((F.col("n_pairs") - 1) / 2) + 1
    hi = F.col("n_pairs") - F.floor((F.col("n_pairs") - 1) / 2)
    mid = ranked.filter((F.col("rn") == lo) | (F.col("rn") == hi))
    # type-7 interpolation at q=0.5: lower + (upper - lower) * 0.5 —
    # the exact expression quantile_cont/percentile use, so the sorted
    # pick is bit-compatible with the oracle's aggregate
    sl = mid.groupBy("status").agg(
        F.round(
            F.min("slope") + (F.max("slope") - F.min("slope")) * 0.5, 6
        ).alias("ts_slope"),
        F.any_value("n_pairs").alias("n_pairs"),
    )
    return (
        daily.join(F.broadcast(sl), "status")
        .groupBy("status")
        .agg(
            F.any_value("n_pairs").alias("n_pairs"),
            F.any_value("ts_slope").alias("ts_slope"),
            F.round(
                F.percentile(
                    F.col("rev") - F.col("ts_slope") * F.col("x"), F.lit(0.5)
                ),
                4,
            ).alias("ts_intercept"),
            F.count("*").alias("n_days"),
        )
        .select("status", "n_days", "n_pairs", "ts_slope", "ts_intercept")
        .orderBy("status")
    )


@register(
    "a_mode_per_group",
    oracle="""
    WITH cnt AS (
        SELECT c_mktsegment AS segment, o_orderpriority AS priority,
            count(*) AS n
        FROM orders JOIN customer ON c_custkey = o_custkey
        GROUP BY 1, 2
    ),
    rk AS (
        SELECT *,
            row_number() OVER (
                PARTITION BY segment ORDER BY n DESC, priority
            ) AS rn,
            sum(n) OVER (PARTITION BY segment) AS seg_n
        FROM cnt
    )
    SELECT segment, priority AS modal_priority, n AS modal_n,
        round(CAST(n AS DOUBLE) / seg_n, 6) AS modal_share
    FROM rk WHERE rn = 1
    ORDER BY segment
    """,
    tags=("agg", "mode"),
)
def a_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical mode per group with a DETERMINISTIC tie-break: the
    most frequent order priority within each customer segment, plus its
    share of the segment. Spark's native ``mode()`` aggregate is
    explicitly non-deterministic under ties, which makes it untestable
    and irreproducible across runs — the count + row_number(count DESC,
    value ASC) formulation is the reproducible idiom this engine
    standardizes on (same contract as the dedup keepers' min-id rule).

    One shuffle to the |segments| x |priorities| grain (map-side
    partials absorb the fact volume, dimension broadcast); the ranking
    windows run over that bounded grid, and the output is |segments|
    rows at any scale."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_mktsegment").alias("segment"),
    )
    cnt = (
        o.join(F.broadcast(c), "o_custkey")
        .groupBy("segment", F.col("o_orderpriority").alias("priority"))
        .agg(F.count("*").alias("n"))
    )
    rk = cnt.select(
        "*",
        F.row_number()
        .over(W.partitionBy("segment").orderBy(F.desc("n"), F.asc("priority")))
        .alias("rn"),
        F.sum("n").over(W.partitionBy("segment")).alias("seg_n"),
    )
    return (
        rk.filter(F.col("rn") == 1)
        .select(
            "segment",
            F.col("priority").alias("modal_priority"),
            F.col("n").alias("modal_n"),
            F.round(F.col("n").cast("double") / F.col("seg_n"), 6).alias(
                "modal_share"
            ),
        )
        .orderBy("segment")
    )


def _poisson1_ladder():
    """Cumulative Poisson(1) thresholds as 8-hex-digit md5-bucket cutoffs
    (operators/sampling's portable uniform): bucket < cum_hex(k) <=> draw
    <= k. Returns [(hex_threshold, k), ...] for k = 0..8; draws past the
    ladder cap at 9 (P ~ 1e-7)."""
    import math

    from boxoffice_spark.operators.sampling import _threshold_hex

    cum, out = 0.0, []
    for k in range(9):
        cum += math.exp(-1.0) / math.factorial(k)
        out.append((_threshold_hex(cum), k))
    return out


@register(
    "a_permutation_test",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) < DATE '1998-01-01' AS first_half,
            date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
                AS x,
            CAST(sum(CAST(o_totalprice AS DECIMAL(27,2))) * 100 AS BIGINT)
                AS rev_c
        FROM orders GROUP BY 1, 2
    ),
    obs AS (
        SELECT
            sum(CASE WHEN first_half THEN 1 ELSE 0 END) AS n_first,
            sum(CASE WHEN first_half THEN 0 ELSE 1 END) AS n_second,
            CAST(sum(CASE WHEN first_half THEN rev_c END) AS BIGINT)
                * sum(CASE WHEN first_half THEN 0 ELSE 1 END)
            - CAST(sum(CASE WHEN NOT first_half THEN rev_c END) AS BIGINT)
                * sum(CASE WHEN first_half THEN 1 ELSE 0 END) AS obs_num
        FROM daily
    ),
    reps AS (SELECT CAST(range AS INT) AS rep FROM range(0, 200)),
    shuffled AS (
        SELECT rep, rev_c, n_first, n_second,
            row_number() OVER (
                PARTITION BY rep
                ORDER BY md5('perm:' || CAST(rep AS VARCHAR) || ':'
                             || CAST(x AS VARCHAR)), x
            ) AS rn
        FROM daily CROSS JOIN reps CROSS JOIN obs
    ),
    perm AS (
        SELECT rep,
            CAST(sum(CASE WHEN rn <= n_first THEN rev_c END) AS BIGINT)
                * max(n_second)
            - CAST(sum(CASE WHEN rn > n_first THEN rev_c END) AS BIGINT)
                * max(n_first) AS num_r
        FROM shuffled GROUP BY rep
    ),
    counted AS (
        SELECT n_first AS n_days_first, n_second AS n_days_second, obs_num,
            count(*) AS b_reps,
            sum(CASE WHEN abs(num_r) >= abs(obs_num) THEN 1 ELSE 0 END)
                AS n_extreme
        FROM perm CROSS JOIN obs
        GROUP BY 1, 2, 3
    )
    SELECT CAST(n_days_first AS BIGINT) AS n_days_first,
        CAST(n_days_second AS BIGINT) AS n_days_second,
        CAST(obs_num AS DOUBLE)
            / (100.0 * n_days_first * n_days_second) AS obs_diff,
        b_reps, CAST(n_extreme AS BIGINT) AS n_extreme,
        {ratio6_sql('1 + n_extreme', 'b_reps + 1')} AS p_value
    FROM counted
    """,
    tags=("agg", "stats", "resampling"),
)
def a_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monte-Carlo permutation test of the difference in mean daily
    revenue between the early (< 1998) and late eras — the
    assumption-free complement to a_welch_ttest: no normality, no
    variance model, the null distribution IS the data's own relabeling.
    B = 200 fixed-size permutations: per replicate, days are ranked by
    a salted md5 of (rep, day) — the engine's standard retry-safe
    portable uniform (operators/sampling.py) — and the n_first smallest
    take the first-era label, so every replicate preserves the observed
    group sizes exactly (a true permutation, not Bernoulli relabeling).
    The add-one p-value (1 + #extreme)/(B + 1) is the standard
    Monte-Carlo form, emitted via ratio6's exact BIGINT HALF_UP.

    The extreme test is EXACT INTEGER arithmetic end-to-end (parity
    rule 4, r08 revision — the earlier 6dp decimal casts of the double
    means were driver-red two rounds running): daily revenue is summed
    as BIGINT cents, both group sizes are fixed at (n_first, n_second)
    in every replicate, so |mean1 - mean2| comparisons share the
    denominator 100*n1*n2 and reduce to |s1c*n2 - s2c*n1| >=
    |t1c*n2 - t2c*n1| in BIGINT — no rounding anywhere can decide the
    count. obs_diff is emitted as the raw double of that exact integer
    numerator over its exact denominator (two correctly-rounded IEEE
    ops). Exact while total-cents * |days| < 2^63, i.e. total revenue
    below ~3.7e13 dollars per era — ten-million-fold above the fixture
    and still comfortable at sf1000.

    At 100 TB: the corpus is touched ONCE (the groupBy to the daily
    grain); the 200-replicate spine multiplies only the calendar-
    bounded daily table (~200 x |days| rows), the per-rep ranking
    window is partitioned by rep, and each replicate reduces to one
    row. Deterministic under retries by construction — rand() would
    re-draw on task re-execution."""
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        (F.to_date("o_orderdate") < F.lit("1998-01-01")).alias("first_half"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1992-01-01")).alias("x"),
    ).agg(
        (F.sum(F.col("o_totalprice").cast("decimal(27,2)")) * 100)
        .cast("long")
        .alias("rev_c")
    )
    n1 = F.sum(F.when(F.col("first_half"), 1).otherwise(0))
    n2 = F.sum(F.when(F.col("first_half"), 0).otherwise(1))
    obs = daily.agg(
        n1.alias("n_first"),
        n2.alias("n_second"),
        (
            F.sum(F.when(F.col("first_half"), F.col("rev_c"))) * n2
            - F.sum(F.when(~F.col("first_half"), F.col("rev_c"))) * n1
        ).alias("obs_num"),
    )
    reps = spark.range(0, 200).select(F.col("id").cast("int").alias("rep"))
    coin = F.md5(
        F.concat(
            F.lit("perm:"),
            F.col("rep").cast("string"),
            F.lit(":"),
            F.col("x").cast("string"),
        )
    )
    shuffled = (
        daily.crossJoin(F.broadcast(reps))
        .crossJoin(F.broadcast(obs))
        .select(
            "rep",
            "rev_c",
            "n_first",
            "n_second",
            F.row_number()
            .over(W.partitionBy("rep").orderBy(coin, F.col("x")))
            .alias("rn"),
        )
    )
    perm = shuffled.groupBy("rep").agg(
        (
            F.sum(F.when(F.col("rn") <= F.col("n_first"), F.col("rev_c")))
            * F.max("n_second")
            - F.sum(F.when(F.col("rn") > F.col("n_first"), F.col("rev_c")))
            * F.max("n_first")
        ).alias("num_r")
    )
    extreme = F.sum(
        F.when(F.abs(F.col("num_r")) >= F.abs(F.col("obs_num")), 1).otherwise(0)
    )
    counted = (
        perm.crossJoin(F.broadcast(obs))
        .groupBy(
            F.col("n_first").alias("n_days_first"),
            F.col("n_second").alias("n_days_second"),
            "obs_num",
        )
        .agg(
            F.count("*").alias("b_reps"),
            extreme.alias("n_extreme"),
        )
    )
    # p-value is an exact integer ratio (1+k)/(B+1): ratio6's BIGINT
    # HALF_UP; obs_diff is the raw double of the exact integer ratio.
    return counted.select(
        "n_days_first",
        "n_days_second",
        (
            F.col("obs_num").cast("double")
            / (F.lit(100.0) * F.col("n_days_first") * F.col("n_days_second"))
        ).alias("obs_diff"),
        "b_reps",
        "n_extreme",
        ratio6("1 + n_extreme", "b_reps + 1").alias("p_value"),
    )


def _bootstrap_oracle() -> str:
    ladder = " ".join(
        f"WHEN substr(md5('boot:' || status || ':' || CAST(rep AS VARCHAR)"
        f" || ':' || CAST(x AS VARCHAR)), 1, 8) < '{hx}' THEN {k}"
        for hx, k in _poisson1_ladder()
    )
    return f"""
    WITH daily AS (
        SELECT o_orderstatus AS status,
            date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
                AS x,
            {dsum_sql('o_totalprice')} AS rev
        FROM orders GROUP BY 1, 2
    ),
    reps AS (SELECT CAST(range AS INT) AS rep FROM range(0, 200)),
    drawn AS (
        SELECT status, rep, rev,
            CASE {ladder} ELSE 9 END AS w
        FROM daily CROSS JOIN reps
    ),
    boot AS (
        SELECT status, rep,
            round({dsum_sql('w * rev')} / sum(w), 6) AS mean_r
        FROM drawn GROUP BY 1, 2 HAVING sum(w) > 0
    ),
    stat AS (
        SELECT status, count(*) AS n_days,
            round({davg_sql('rev', 2)}, 6) AS mean_daily_rev
        FROM daily GROUP BY 1
    ),
    ci AS (
        SELECT status, count(*) AS b_reps,
            round(quantile_cont(mean_r, 0.025), 4) AS ci_lo,
            round(quantile_cont(mean_r, 0.975), 4) AS ci_hi
        FROM boot GROUP BY 1
    )
    SELECT stat.status, n_days, mean_daily_rev, b_reps, ci_lo, ci_hi
    FROM stat JOIN ci ON ci.status = stat.status
    ORDER BY stat.status
    """


@register(
    "a_bootstrap_ci_poisson",
    oracle=_bootstrap_oracle(),
    tags=("agg", "stats", "resampling"),
)
def a_bootstrap_ci_poisson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap 95% CI for mean daily revenue per order status
    — THE bootstrap that scales: instead of materializing B resamples
    (impossible at 100 TB), each row draws an independent Poisson(1)
    replication weight per replicate, which approximates multinomial
    resampling with n unknown ahead of time and needs exactly ONE pass.
    Here the draw is the engine's portable md5 uniform pushed through
    the cumulative-Poisson CASE ladder as pure HEX-STRING compares
    (_poisson1_ladder — no hex parsing, mirrorable to any engine with
    md5 and string order), so every replicate weight is deterministic
    under retries and identical across engines.

    Replicate means are Sum(w * rev)/Sum(w) with the weighted sum
    decimal-summed (exact — w is a small integer, rev is 2dp); the CI
    is the 2.5/97.5 exact interpolated percentile over the B = 200
    6dp-rounded replicate means per status. Empty-weight replicates
    (P ~ e^-|days|, effectively never) drop out via the Sum(w) > 0
    guard on both engines.

    At 100 TB: one corpus pass to the daily grain; the B-replicate
    spine multiplies only the calendar-bounded daily table; per-status
    percentiles collect B values."""
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderstatus").alias("status"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1992-01-01")).alias("x"),
    ).agg(dsum("o_totalprice").alias("rev"))
    reps = spark.range(0, 200).select(F.col("id").cast("int").alias("rep"))
    bucket = F.substring(
        F.md5(
            F.concat(
                F.lit("boot:"),
                F.col("status"),
                F.lit(":"),
                F.col("rep").cast("string"),
                F.lit(":"),
                F.col("x").cast("string"),
            )
        ),
        1,
        8,
    )
    w = F.lit(9)
    for hx, k in reversed(_poisson1_ladder()):
        w = F.when(bucket < F.lit(hx), F.lit(k)).otherwise(w)
    drawn = daily.crossJoin(F.broadcast(reps)).select(
        "status", "rep", "rev", w.alias("w")
    )
    boot = (
        drawn.groupBy("status", "rep")
        .agg(
            dsum(F.col("w") * F.col("rev")).alias("ws"),
            F.sum("w").alias("wn"),
        )
        .filter(F.col("wn") > 0)
        .select(
            "status",
            F.round(F.col("ws") / F.col("wn"), 6).alias("mean_r"),
        )
    )
    stat = daily.groupBy("status").agg(
        F.count("*").alias("n_days"),
        F.round(davg("rev", scale=2), 6).alias("mean_daily_rev"),
    )
    ci = boot.groupBy("status").agg(
        F.count("*").alias("b_reps"),
        F.round(F.percentile("mean_r", F.lit(0.025)), 4).alias("ci_lo"),
        F.round(F.percentile("mean_r", F.lit(0.975)), 4).alias("ci_hi"),
    )
    return (
        stat.join(ci, "status")
        .select(
            "status", "n_days", "mean_daily_rev", "b_reps", "ci_lo", "ci_hi"
        )
        .orderBy("status")
    )


@register(
    "a_winsorized_mean",
    oracle=f"""
    WITH th AS (
        SELECT o_orderpriority,
            quantile_cont(o_totalprice, 0.05) AS p5,
            quantile_cont(o_totalprice, 0.95) AS p95
        FROM orders GROUP BY 1
    )
    SELECT o.o_orderpriority, count(*) AS n,
        {davg_sql('o.o_totalprice')} AS mean_all,
        count(CASE WHEN o.o_totalprice < th.p5 THEN 1 END) AS n_clamped_low,
        count(CASE WHEN o.o_totalprice > th.p95 THEN 1 END) AS n_clamped_high,
        ({dsum_sql('least(greatest(o.o_totalprice, th.p5), th.p95)', 6)}
         / count(*)) AS winsorized_mean
    FROM orders o JOIN th ON th.o_orderpriority = o.o_orderpriority
    GROUP BY 1
    ORDER BY 1
    """,
    tags=("agg", "robust", "winsorize"),
)
def a_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5%/95% winsorized mean of order value per priority class — the
    robust companion to a_trimmed_mean that CLAMPS tail values to the
    percentile fences instead of dropping them, so n stays intact (the
    estimator of choice when the tail rows are real business but their
    magnitudes are noise — a_trimmed_mean discards them, which biases
    per-row ratios computed downstream). Exact p5/p95 from one grouped
    percentile aggregate (type-7 interpolation == quantile_cont, the
    same contract a_trimmed_mean relies on), broadcast back, then
    least(greatest(x, p5), p95) under a decimal mean. Clamp counts sit
    alongside so the tail mass being flattened is visible. Cell-exact;
    one percentile pass + one clamped-aggregate pass, thresholds are a
    |priorities|-row broadcast — same 100 TB shape as the trimmed tier."""
    o = table(spark, sf_dir, "orders")
    th = o.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", F.lit(0.05)).alias("p5"),
        F.percentile("o_totalprice", F.lit(0.95)).alias("p95"),
    )
    x = F.col("o_totalprice")
    clamped = F.least(F.greatest(x, F.col("p5")), F.col("p95"))
    return (
        o.join(F.broadcast(th), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            davg(x).alias("mean_all"),
            F.count(F.when(x < F.col("p5"), 1)).alias("n_clamped_low"),
            F.count(F.when(x > F.col("p95"), 1)).alias("n_clamped_high"),
            (dsum(clamped, scale=6) / F.count("*")).alias("winsorized_mean"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "a_kendall_tau",
    oracle=f"""
    WITH daily AS (
        SELECT o_orderstatus AS status,
            date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
                AS x,
            {dsum_sql('o_totalprice')} AS rev,
            count(*) AS cnt
        FROM orders GROUP BY 1, 2
    ),
    pairs AS (
        SELECT a.status,
            CASE WHEN (b.rev - a.rev) * (b.cnt - a.cnt) > 0 THEN 1 ELSE 0
                END AS conc,
            CASE WHEN (b.rev - a.rev) * (b.cnt - a.cnt) < 0 THEN 1 ELSE 0
                END AS disc,
            CASE WHEN b.rev = a.rev THEN 1 ELSE 0 END AS tie_rev,
            CASE WHEN b.cnt = a.cnt THEN 1 ELSE 0 END AS tie_cnt
        FROM daily a JOIN daily b ON a.status = b.status AND b.x > a.x
    ),
    agg AS (
        SELECT status, count(*) AS n_pairs,
            CAST(sum(conc) AS BIGINT) AS concordant,
            CAST(sum(disc) AS BIGINT) AS discordant,
            CAST(sum(tie_rev) AS BIGINT) AS ties_rev,
            CAST(sum(tie_cnt) AS BIGINT) AS ties_cnt
        FROM pairs GROUP BY 1
    ),
    nd AS (SELECT status, count(*) AS n_days FROM daily GROUP BY 1)
    SELECT a.status, nd.n_days, a.n_pairs, a.concordant, a.discordant,
        a.ties_rev, a.ties_cnt,
        CASE WHEN (a.n_pairs - a.ties_rev) > 0 AND (a.n_pairs - a.ties_cnt) > 0
            THEN (a.concordant - a.discordant)
                / sqrt(CAST(a.n_pairs - a.ties_rev AS DOUBLE)
                       * CAST(a.n_pairs - a.ties_cnt AS DOUBLE))
        END AS tau_b
    FROM agg a JOIN nd ON nd.status = a.status
    ORDER BY a.status
    """,
    tags=("agg", "stats", "rank-corr"),
)
def a_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's tau-b rank correlation between daily revenue and daily
    order count per status — the concordance-based alternative to
    a_spearman_rank_corr: tau counts agreeing pair ORDERINGS directly,
    so it is interpretable as P(concordant) - P(discordant) and is less
    sensitive to a single wild rank than Spearman's rho (which squares
    rank gaps). Tie handling is the tau-b denominator: pairs tied on
    either margin are removed from that margin's normalizer,
    sqrt((n0 - T_rev)(n0 - T_cnt)); a zero normalizer (a margin fully
    tied) yields NULL on both engines, never 0/0.

    Pairs enumerate from the same spread-probe x broadcast-build
    equi-join as a_theil_sen_trend (BroadcastHashJoin, never cartesian;
    explicit repartition survives AQE's small-table coalescing) —
    quadratic in CALENDAR DAYS only, so the pair list is bounded at any
    corpus volume and the only row-linear work is the first groupBy to
    the daily grain. Concordance tests compare the decimal-summed daily
    revenue cast to double IDENTICALLY on both engines (dsum == its SQL
    twin) and exact integer counts, so every sign/tie test sees
    bit-identical inputs — tau needs no rounding until the final ratio.
    Cell-exact."""
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderstatus").alias("status"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1992-01-01")).alias("x"),
    ).agg(
        dsum("o_totalprice").alias("rev"),
        F.count("*").alias("cnt"),
    )
    a = daily.repartition(32, "x").alias("a")
    b = F.broadcast(daily).alias("b")
    drev = F.col("b.rev") - F.col("a.rev")
    dcnt = F.col("b.cnt") - F.col("a.cnt")
    pairs = a.join(
        b,
        (F.col("a.status") == F.col("b.status")) & (F.col("b.x") > F.col("a.x")),
    ).select(
        F.col("a.status").alias("status"),
        F.when(drev * dcnt > 0, 1).otherwise(0).alias("conc"),
        F.when(drev * dcnt < 0, 1).otherwise(0).alias("disc"),
        F.when(F.col("b.rev") == F.col("a.rev"), 1).otherwise(0).alias("tie_rev"),
        F.when(F.col("b.cnt") == F.col("a.cnt"), 1).otherwise(0).alias("tie_cnt"),
    )
    agg = pairs.groupBy("status").agg(
        F.count("*").alias("n_pairs"),
        F.sum("conc").alias("concordant"),
        F.sum("disc").alias("discordant"),
        F.sum("tie_rev").alias("ties_rev"),
        F.sum("tie_cnt").alias("ties_cnt"),
    )
    nd = daily.groupBy("status").agg(F.count("*").alias("n_days"))
    n0r = (F.col("n_pairs") - F.col("ties_rev")).cast("double")
    n0c = (F.col("n_pairs") - F.col("ties_cnt")).cast("double")
    # tau_b is emitted as the RAW double (parity rule 4, r08 revision):
    # (C - D)/sqrt(n0r*n0c) over exact integer counts is a chain of
    # correctly-rounded IEEE ops, bit-identical across conformant builds;
    # the dec6 decimal cast it replaces was driver-red two rounds running.
    tau = F.when(
        (n0r > 0) & (n0c > 0),
        (F.col("concordant") - F.col("discordant")) / F.sqrt(n0r * n0c),
    )
    return (
        agg.join(F.broadcast(nd), "status")
        .select(
            "status",
            "n_days",
            "n_pairs",
            "concordant",
            "discordant",
            "ties_rev",
            "ties_cnt",
            tau.alias("tau_b"),
        )
        .orderBy("status")
    )


@register(
    "a_kruskal_wallis",
    oracle=f"""
    WITH daily AS (
        SELECT o_orderpriority AS grp,
            {dsum_sql('o_totalprice')} AS rev
        FROM orders
        GROUP BY 1, CAST(o_orderdate AS DATE)
    ),
    ranked AS (
        SELECT grp, rev,
            rank() OVER (ORDER BY rev) AS rk,
            count(*) OVER (PARTITION BY rev) AS tie_n
        FROM daily
    ),
    per_group AS (
        SELECT grp, count(*) AS n_i,
            CAST(sum(CAST(rk + (tie_n - 1) / 2.0 AS DECIMAL(20, 1))) * 10
                AS BIGINT) AS r_iu
        FROM ranked GROUP BY 1
    ),
    ties AS (
        SELECT CAST(sum(tie_n * tie_n - 1) AS DOUBLE) AS tie_sum,
            count(*) AS n_total
        FROM ranked
    ),
    stat AS (
        SELECT t.n_total, count(*) AS n_groups,
            12.0 / (t.n_total * (t.n_total + 1.0))
                * (CAST(sum({units_div_sql(
                        'CAST(g.r_iu AS HUGEINT) * g.r_iu',
                        '100 * g.n_i', 4)}) AS DOUBLE) / 1e4)
                - 3.0 * (t.n_total + 1.0) AS h_raw,
            1.0 - t.tie_sum
                / (CAST(t.n_total AS DOUBLE) * t.n_total * t.n_total
                   - t.n_total) AS tie_c
        FROM per_group g, ties t
        GROUP BY t.n_total, t.tie_sum
    )
    SELECT n_total, n_groups, {fround_sql('h_raw', 6)} AS h_raw,
        {fround_sql('tie_c', 8)} AS tie_c,
        CASE WHEN tie_c > 0 THEN {fround_sql('h_raw / tie_c', 6)} END
            AS h_stat,
        n_groups - 1 AS df,
        CASE WHEN tie_c > 0 THEN
            {fround_sql('h_raw / tie_c', 6)} > CASE n_groups - 1
                WHEN 1 THEN 3.841 WHEN 2 THEN 5.991 WHEN 3 THEN 7.815
                WHEN 4 THEN 9.488 WHEN 5 THEN 11.070 WHEN 6 THEN 12.592
                ELSE 0 END
        END AS significant
    FROM stat
    """,
    tags=("agg", "stats", "nonparametric"),
)
def a_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H test: do the k=5 order-priority classes draw
    their DAILY-REVENUE distributions from the same population? The
    k-sample generalization of a_mann_whitney_u (k=2) — one omnibus
    rank test instead of C(5,2) pairwise U tests with their multiple-
    comparison inflation. Pooled midranks (rank() + tie window, the
    exact machinery of the U test) over the per-(priority, day) revenue
    series; H = 12/(N(N+1)) * sum R_i^2/n_i - 3(N+1), divided by the
    tie correction C = 1 - sum(t^3-t)/(N^3-N); compared against the
    chi-square 95% critical value for df = k-1 (lookup CASE, identical
    on both engines). A fully-tied pool (C = 0) yields NULL, never 0/0.

    The pooled rank window is GLOBAL by the test's definition — but it
    runs over the calendar-bounded daily grain (|days| x |priorities|
    rows, ~13k for a 7-year window AT ANY corpus volume), never over
    raw orders: the only corpus-sized work is the first groupBy. The
    R_i^2/n_i terms are exact rationals of the 0.1-unit midrank sums,
    HALF_UP-quantized to 1e-4 units in 128-bit integer math (units_div,
    r10 conversion) and summed exactly — order-independent with no
    engine rounding rule anywhere. Cell-exact."""
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderpriority").alias("grp"),
        F.to_date("o_orderdate").alias("_d"),
    ).agg(dsum("o_totalprice").alias("rev"))
    w_rank = W.partitionBy().orderBy("rev")
    w_tie = W.partitionBy("rev")
    ranked = daily.select(
        "grp",
        "rev",
        F.rank().over(w_rank).alias("rk"),
        F.count("*").over(w_tie).alias("tie_n"),
    )
    # r10 legacy conversion: R_i is exact in 0.1-units (midrank sums), so
    # each R_i^2/n_i term is an exact rational HALF_UP-quantized to 1e-4
    # units in 128-bit integer math (units_div) and summed exactly — the
    # old round(double, 4) + decimal cast was the refuted DECCAST class.
    # Final cells pin their grids via fround.
    from boxoffice_spark.functions.numeric import units_div

    avg_rank = (F.col("rk") + (F.col("tie_n") - 1) / 2.0).cast("decimal(20,1)")
    per_group = ranked.groupBy("grp").agg(
        F.count("*").alias("n_i"),
        (F.sum(avg_rank) * 10).cast("long").alias("r_iu"),
    )
    ties = ranked.agg(
        F.sum(F.col("tie_n") * F.col("tie_n") - 1).cast("double").alias("tie_sum"),
        F.count("*").alias("n_total"),
    )
    nt = F.col("n_total").cast("double")
    term_u = units_div(
        "CAST(r_iu AS DECIMAL(38,0)) * r_iu", "100 * n_i", 4
    )
    stat = (
        per_group.crossJoin(F.broadcast(ties))
        .groupBy("n_total", "tie_sum")
        .agg(
            F.count("*").alias("n_groups"),
            (
                12.0
                / (nt * (nt + 1.0))
                * (
                    F.sum(term_u.cast("decimal(38,0)")).cast("double")
                    / 1e4
                )
                - 3.0 * (nt + 1.0)
            ).alias("h_raw"),
            F.first(
                1.0 - F.col("tie_sum") / (nt * nt * nt - nt)
            ).alias("tie_c"),
        )
    )
    crit = (
        F.when(F.col("df") == 1, 3.841)
        .when(F.col("df") == 2, 5.991)
        .when(F.col("df") == 3, 7.815)
        .when(F.col("df") == 4, 9.488)
        .when(F.col("df") == 5, 11.070)
        .when(F.col("df") == 6, 12.592)
        .otherwise(0.0)
    )
    h = F.col("h_raw") / F.col("tie_c")
    return (
        stat.select(
            "n_total",
            "n_groups",
            fround(F.col("h_raw"), 6).alias("h_raw"),
            fround(F.col("tie_c"), 8).alias("tie_c"),
            F.when(F.col("tie_c") > 0, fround(h, 6)).alias("h_stat"),
            (F.col("n_groups") - 1).alias("df"),
        )
        .select(
            "n_total",
            "n_groups",
            "h_raw",
            "tie_c",
            "h_stat",
            "df",
            F.when(
                F.col("tie_c") > 0, F.col("h_stat") > crit
            ).alias("significant"),
        )
    )


@register(
    "a_cramers_v",
    oracle=f"""
    WITH obs AS (
        SELECT lang, source, count(*) AS n_obs
        FROM documents GROUP BY 1, 2
    ),
    rt AS (SELECT lang, sum(n_obs) AS row_n FROM obs GROUP BY 1),
    ct AS (SELECT source, sum(n_obs) AS col_n FROM obs GROUP BY 1),
    g AS (SELECT sum(n_obs) AS grand FROM obs),
    grid AS (
        SELECT rt.lang, ct.source, coalesce(obs.n_obs, 0) AS n_obs,
            CAST(rt.row_n AS BIGINT) AS row_n,
            CAST(ct.col_n AS BIGINT) AS col_n,
            CAST(g.grand AS BIGINT) AS grand
        FROM rt CROSS JOIN ct CROSS JOIN g
        LEFT JOIN obs ON obs.lang = rt.lang AND obs.source = ct.source
    ),
    cells AS (
        SELECT lang, source, n_obs, grand,
            n_obs * grand - row_n * col_n AS dv,
            row_n * col_n AS rc
        FROM grid
    ),
    tot AS (
        SELECT CAST(sum({units_div_sql('CAST(dv AS HUGEINT) * dv',
                                       'CAST(grand AS HUGEINT) * rc', 9)})
                    AS BIGINT) AS chi2_u9,
            count(DISTINCT lang) AS r, count(DISTINCT source) AS c,
            CAST(sum(n_obs) AS BIGINT) AS n
        FROM cells
    ),
    stat AS (
        SELECT n, r, c,
            CAST(chi2_u9 AS DOUBLE) / 1000000000.0 AS chi2
        FROM tot
    )
    SELECT n, r, c, chi2,
        sqrt(chi2 / n / least(r - 1, c - 1)) AS cramers_v,
        sqrt(
            greatest(chi2 / n - CAST((r - 1) * (c - 1) AS DOUBLE) / (n - 1),
                     0.0)
            / least(r - CAST((r - 1) * (r - 1) AS DOUBLE) / (n - 1) - 1,
                    c - CAST((c - 1) * (c - 1) AS DOUBLE) / (n - 1) - 1)
        ) AS cramers_v_corrected
    FROM stat
    """,
    tags=("agg", "stats", "effect-size"),
)
def a_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V effect size for the (language x source) association in
    the documents corpus — the readout a_chi2_independence cannot give:
    with corpus-scale n, chi-squared is ALWAYS significant; V = sqrt(
    (chi2/n) / min(r-1, c-1)) in [0,1] says whether the association
    MATTERS (is the corpus's language mix actually source-driven — the
    'our German is all from one crawl' diagnosis that predicts style
    entanglement). Alongside: the Bergsma bias-corrected V, which
    shrinks the positive bias plain V carries on sparse grids. Same
    zero-cell-restoring marginal machinery as a_chi2_independence (an
    absent (lang, source) cell still contributes its expected mass).

    Parity (rule 4, r08 revision — the per-cell DECIMAL(27,6) casts of
    double contributions were driver-red two rounds running): chi2 is
    EXACT INTEGER arithmetic end-to-end. Each cell's contribution
    (O - E)^2/E with E = r*c/n is the rational (O*n - r*c)^2/(n*r*c);
    it is HALF_UP-quantized to 1e-9 units in 128-bit integer math
    (units_div — (2*dv^2*1e9 + n*rc) div (2*n*rc)), the units sum
    exactly (order-free), and chi2 plus both V cells are emitted as
    raw doubles derived from that one integer by correctly-rounded
    IEEE ops only — nothing is ever rounded on a decimal grid. Exact
    while dv^2*2e9 fits 38 digits (|dv| reaches ~n^2, so n below ~1.5e7
    documents — guarded by an explicit raise_error so a too-large corpus
    fails loudly on both engines instead of Spark's non-ANSI decimal
    overflow silently dropping NULL cells from the sum; the grid
    statistic is for datacard-scale grids — past that, drop the units
    scale). One shuffle to the R x C grain, constant-size after.
    Cell-exact."""
    from boxoffice_spark.functions.numeric import units_div

    d = table(spark, sf_dir, "documents")
    obs = d.groupBy("lang", "source").agg(F.count("*").alias("n_obs"))
    rt = obs.groupBy("lang").agg(F.sum("n_obs").alias("row_n"))
    ct = obs.groupBy("source").agg(F.sum("n_obs").alias("col_n"))
    g = obs.agg(F.sum("n_obs").alias("grand"))
    grid = (
        rt.crossJoin(F.broadcast(ct))
        .crossJoin(F.broadcast(g))
        .join(F.broadcast(obs), ["lang", "source"], "left")
        .select(
            "lang",
            "source",
            F.coalesce(F.col("n_obs"), F.lit(0)).alias("n_obs"),
            "row_n",
            "col_n",
            "grand",
        )
    )
    cells = grid.select(
        "n_obs",
        "lang",
        "source",
        "grand",
        (F.col("n_obs") * F.col("grand") - F.col("row_n") * F.col("col_n"))
        .alias("dv"),
        (F.col("row_n") * F.col("col_n")).alias("rc"),
    )
    tot = cells.agg(
        F.sum(
            units_div(
                "CAST(dv AS DECIMAL(38,0)) * dv",
                "CAST(grand AS DECIMAL(38,0)) * rc",
                9,
            )
        )
        .cast("long")
        .alias("chi2_u9"),
        F.countDistinct("lang").alias("r"),
        F.countDistinct("source").alias("c"),
        F.sum("n_obs").alias("n"),
    )
    # ADVICE r09: 2*dv^2*1e9 must fit DECIMAL(38,0) and |dv| can reach
    # ~n^2, so the exactness bound is n <= ~1.5e7 documents (not the
    # ~3e7 previously stated). Past it Spark's non-ANSI decimal overflow
    # yields NULL cells that F.sum silently DROPS (wrong chi2) while
    # DuckDB raises — so fail loudly on both engines instead.
    n_guarded = F.when(F.col("n") <= 15_000_000, F.col("n")).otherwise(
        F.raise_error(
            F.lit(
                "a_cramers_v: n exceeds the units_div DECIMAL(38,0) "
                "bound (~1.5e7 docs) — chi2 would silently drop "
                "overflowed cells; shard the grid or drop the 1e-9 "
                "units scale"
            )
        )
    )
    stat = tot.select(
        n_guarded.alias("n"),
        "r",
        "c",
        (F.col("chi2_u9").cast("double") / 1000000000.0).alias("chi2"),
    )
    r_, c_, n_ = F.col("r"), F.col("c"), F.col("n")
    phi2 = F.col("chi2") / n_
    phi2_corr = F.greatest(
        phi2 - ((r_ - 1) * (c_ - 1)).cast("double") / (n_ - 1), F.lit(0.0)
    )
    r_corr = r_ - ((r_ - 1) * (r_ - 1)).cast("double") / (n_ - 1) - 1
    c_corr = c_ - ((c_ - 1) * (c_ - 1)).cast("double") / (n_ - 1) - 1
    return stat.select(
        "n",
        "r",
        "c",
        "chi2",
        F.sqrt(phi2 / F.least(r_ - 1, c_ - 1)).alias("cramers_v"),
        F.sqrt(phi2_corr / F.least(r_corr, c_corr)).alias(
            "cramers_v_corrected"
        ),
    )


@register(
    "a_cohens_d",
    oracle=f"""
    WITH daily AS (
        SELECT o_orderstatus AS status,
            CAST(o_orderdate AS DATE) < DATE '1998-01-01' AS first_half,
            {dsum_sql('o_totalprice')} AS rev
        FROM orders
        GROUP BY 1, 2, CAST(o_orderdate AS DATE)
    ),
    s AS (
        SELECT status,
            count(CASE WHEN first_half THEN 1 END) AS n1,
            count(CASE WHEN NOT first_half THEN 1 END) AS n2,
            {davg_sql('CASE WHEN first_half THEN rev END')} AS m1,
            {davg_sql('CASE WHEN NOT first_half THEN rev END')} AS m2,
            {dsum_sql('CASE WHEN first_half THEN round(rev * rev, 2) END')} AS s2_1,
            {dsum_sql('CASE WHEN NOT first_half THEN round(rev * rev, 2) END')} AS s2_2,
            {dsum_sql('CASE WHEN first_half THEN rev END')} AS sum1,
            {dsum_sql('CASE WHEN NOT first_half THEN rev END')} AS sum2
        FROM daily GROUP BY 1
    ),
    v AS (
        SELECT status, n1, n2, m1, m2,
            (s2_1 - sum1 * sum1 / n1) / (n1 - 1) AS var1,
            (s2_2 - sum2 * sum2 / n2) / (n2 - 1) AS var2
        FROM s WHERE n1 > 1 AND n2 > 1
    )
    SELECT status, n1, n2, round(m1, 4) AS mean_first,
        round(m2, 4) AS mean_second,
        CASE WHEN ((n1 - 1) * var1 + (n2 - 1) * var2) > 0 THEN
            round((m2 - m1) / sqrt(((n1 - 1) * var1 + (n2 - 1) * var2)
                                   / (n1 + n2 - 2)), 6)
        END AS cohens_d,
        CASE WHEN ((n1 - 1) * var1 + (n2 - 1) * var2) > 0 THEN
            round((m2 - m1) / sqrt(((n1 - 1) * var1 + (n2 - 1) * var2)
                                   / (n1 + n2 - 2))
                  * (1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0)), 6)
        END AS hedges_g
    FROM v
    ORDER BY status
    """,
    tags=("agg", "stats", "effect-size"),
)
def a_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d (pooled-SD standardized mean difference) of daily
    revenue between the early and late eras, per status — the
    CONTINUOUS effect size that completes what a_cramers_v does for
    categorical association: a_welch_ttest says the means differ,
    d says by HOW MUCH in noise units (0.2 small / 0.5 medium / 0.8
    large — the only scale a mean shift is comparable across metrics
    in). Hedges' g (the (1 - 3/(4N-9)) small-sample correction)
    alongside. Variances expand from decimal power sums (rev² rounded
    2dp first, the a_moments_profile determinism contract); a
    zero-pooled-variance group yields NULL, never 0/0. One corpus
    shuffle to the daily grain; the effect sizes are per-status
    scalars over the calendar-bounded daily table. Cell-exact."""
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderstatus").alias("status"),
        (F.to_date("o_orderdate") < F.lit("1998-01-01")).alias("first_half"),
        F.to_date("o_orderdate").alias("_d"),
    ).agg(dsum("o_totalprice").alias("rev"))
    fh = F.col("first_half")
    rev = F.col("rev")
    rev2 = F.round(rev * rev, 2)
    s = daily.groupBy("status").agg(
        F.count(F.when(fh, 1)).alias("n1"),
        F.count(F.when(~fh, 1)).alias("n2"),
        (
            dsum(F.when(fh, rev), scale=6) / F.count(F.when(fh, rev))
        ).alias("m1"),
        (
            dsum(F.when(~fh, rev), scale=6) / F.count(F.when(~fh, rev))
        ).alias("m2"),
        dsum(F.when(fh, rev2)).alias("s2_1"),
        dsum(F.when(~fh, rev2)).alias("s2_2"),
        dsum(F.when(fh, rev)).alias("sum1"),
        dsum(F.when(~fh, rev)).alias("sum2"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    v = s.filter((n1 > 1) & (n2 > 1)).select(
        "status",
        "n1",
        "n2",
        "m1",
        "m2",
        ((F.col("s2_1") - F.col("sum1") * F.col("sum1") / n1) / (n1 - 1)).alias(
            "var1"
        ),
        ((F.col("s2_2") - F.col("sum2") * F.col("sum2") / n2) / (n2 - 1)).alias(
            "var2"
        ),
    )
    pooled_num = (n1 - 1) * F.col("var1") + (n2 - 1) * F.col("var2")
    d = (F.col("m2") - F.col("m1")) / F.sqrt(pooled_num / (n1 + n2 - 2))
    g = d * (1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0))
    return v.select(
        "status",
        "n1",
        "n2",
        F.round("m1", 4).alias("mean_first"),
        F.round("m2", 4).alias("mean_second"),
        F.when(pooled_num > 0, F.round(d, 6)).alias("cohens_d"),
        F.when(pooled_num > 0, F.round(g, 6)).alias("hedges_g"),
    ).orderBy("status")


@register(
    "a_kpi_decomposition",
    oracle=f"""
    WITH monthly AS (
        SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS mon,
            count(*) AS n_orders,
            {dsum_sql('o_totalprice')} AS revenue
        FROM orders GROUP BY 1
    ),
    paired AS (
        SELECT mon, n_orders, revenue,
            lag(n_orders) OVER (ORDER BY mon) AS n_prev,
            lag(revenue) OVER (ORDER BY mon) AS rev_prev
        FROM monthly
    )
    SELECT mon, n_orders, revenue,
        {fround_sql('revenue - rev_prev', 2)} AS delta_revenue,
        {fround_sql('(n_orders - n_prev)'
                    ' * ((revenue / n_orders + rev_prev / n_prev) / 2)', 4)}
            AS volume_effect,
        {fround_sql('(revenue / n_orders - rev_prev / n_prev)'
                    ' * ((n_orders + n_prev) / 2.0)', 4)} AS aov_effect
    FROM paired
    WHERE n_prev IS NOT NULL
    ORDER BY mon
    """,
    tags=("agg", "kpi", "decomposition"),
)
def a_kpi_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue-change decomposition into VOLUME and
    AOV effects (midpoint / Bennet attribution: each factor's delta
    weighted by the other factor's period average, so the two effects
    sum to the total delta EXACTLY, no interaction residual to argue
    about) — the 'did we grow because more orders or bigger orders?'
    question every revenue review starts with, answered additively.
    revenue = n_orders x AOV; delta = dN x mid(AOV) + dAOV x mid(N).
    One shuffle to the month grain; the lag window runs over the
    bounded calendar spine. AOV quotients are bit-identical doubles on
    both engines (decimal-summed revenue / exact counts); the effect
    products round at 4dp where the inputs are non-terminating
    quotients (no exact grid ties). Cell-exact."""
    o = table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", F.to_date("o_orderdate")).cast("date").alias("mon")
    ).agg(
        F.count("*").alias("n_orders"),
        dsum("o_totalprice").alias("revenue"),
    )
    w = W.orderBy("mon")
    paired = monthly.select(
        "mon",
        "n_orders",
        "revenue",
        F.lag("n_orders").over(w).alias("n_prev"),
        F.lag("revenue").over(w).alias("rev_prev"),
    ).filter(F.col("n_prev").isNotNull())
    aov = F.col("revenue") / F.col("n_orders")
    aov_prev = F.col("rev_prev") / F.col("n_prev")
    # r10 legacy conversion: all three effect cells pin their grids via
    # fround (the chains are IEEE over decimal-grid sums and exact counts;
    # round(double, k) is build surface).
    return paired.select(
        "mon",
        "n_orders",
        "revenue",
        fround(F.col("revenue") - F.col("rev_prev"), 2).alias("delta_revenue"),
        fround(
            (F.col("n_orders") - F.col("n_prev")) * ((aov + aov_prev) / 2), 4
        ).alias("volume_effect"),
        fround(
            (aov - aov_prev) * ((F.col("n_orders") + F.col("n_prev")) / 2.0), 4
        ).alias("aov_effect"),
    ).orderBy("mon")


@register(
    "a_dunn_posthoc",
    oracle=f"""
    WITH daily AS (
        SELECT o_orderpriority AS grp,
            {dsum_sql('o_totalprice')} AS rev
        FROM orders
        GROUP BY 1, CAST(o_orderdate AS DATE)
    ),
    ranked AS (
        SELECT grp, rev,
            rank() OVER (ORDER BY rev) AS rk,
            count(*) OVER (PARTITION BY rev) AS tie_n
        FROM daily
    ),
    per_group AS (
        SELECT grp, count(*) AS n_i,
            CAST(sum(CAST(rk + (tie_n - 1) / 2.0 AS DECIMAL(20, 1)))
                AS DOUBLE) / count(*) AS rbar_i
        FROM ranked GROUP BY 1
    ),
    ties AS (
        SELECT CAST(sum(tie_n * tie_n - 1) AS DOUBLE) AS tie_sum,
            count(*) AS n_total
        FROM ranked
    ),
    pairs AS (
        SELECT a.grp AS grp_a, b.grp AS grp_b,
            a.n_i AS n_a, b.n_i AS n_b,
            a.rbar_i - b.rbar_i AS rdiff,
            t.n_total, t.tie_sum
        FROM per_group a
        JOIN per_group b ON a.grp < b.grp
        CROSS JOIN ties t
    ),
    stat AS (
        SELECT grp_a, grp_b, n_a, n_b,
            rdiff / sqrt(
                (CAST(n_total AS DOUBLE) * (n_total + 1) / 12.0
                 - tie_sum / (12.0 * (n_total - 1)))
                * (1.0 / n_a + 1.0 / n_b)
            ) AS z
        FROM pairs
    )
    SELECT grp_a, grp_b, n_a, n_b, z AS z_dunn,
        abs(z) > 2.807 AS significant_bonf
    FROM stat
    ORDER BY grp_a, grp_b
    """,
    tags=("agg", "stats", "posthoc"),
)
def a_dunn_posthoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunn's post-hoc pairwise comparisons — the follow-up question
    a_kruskal_wallis leaves open: the omnibus H says SOME priority
    classes differ on daily revenue; Dunn's z on the pooled-midrank
    means says WHICH pairs, with the tie-corrected variance
    N(N+1)/12 - sum(t^3-t)/(12(N-1)) and a Bonferroni-adjusted critical
    value (2.807 = z at alpha 0.05 / (2*10) for the C(5,2)=10
    comparisons — the multiple-testing discipline that stops
    pairwise-U fishing). Rank means are raw quotients of the decimal
    midrank sums (bit-identical; the rule-3 contract), the z
    denominator is irrational (sqrt), so the 6dp round has no grid
    ties. The pooled rank window runs once over the calendar-bounded
    daily grain (the a_kruskal_wallis machinery); the pair grid is
    C(|groups|, 2) tiny rows. Cell-exact."""
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderpriority").alias("grp"),
        F.to_date("o_orderdate").alias("_d"),
    ).agg(dsum("o_totalprice").alias("rev"))
    w_rank = W.partitionBy().orderBy("rev")
    w_tie = W.partitionBy("rev")
    ranked = daily.select(
        "grp",
        "rev",
        F.rank().over(w_rank).alias("rk"),
        F.count("*").over(w_tie).alias("tie_n"),
    )
    avg_rank = (F.col("rk") + (F.col("tie_n") - 1) / 2.0).cast("decimal(20,1)")
    per_group = ranked.groupBy("grp").agg(
        F.count("*").alias("n_i"),
        (F.sum(avg_rank).cast("double") / F.count("*")).alias("rbar_i"),
    )
    ties = ranked.agg(
        F.sum(F.col("tie_n") * F.col("tie_n") - 1).cast("double").alias("tie_sum"),
        F.count("*").alias("n_total"),
    )
    a = per_group.alias("a")
    b = per_group.alias("b")
    pairs = (
        a.join(b, F.col("a.grp") < F.col("b.grp"))
        .crossJoin(F.broadcast(ties))
        .select(
            F.col("a.grp").alias("grp_a"),
            F.col("b.grp").alias("grp_b"),
            F.col("a.n_i").alias("n_a"),
            F.col("b.n_i").alias("n_b"),
            (F.col("a.rbar_i") - F.col("b.rbar_i")).alias("rdiff"),
            "n_total",
            "tie_sum",
        )
    )
    nt = F.col("n_total").cast("double")
    z = F.col("rdiff") / F.sqrt(
        (nt * (F.col("n_total") + 1) / 12.0 - F.col("tie_sum") / (12.0 * (nt - 1)))
        * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
    )
    # r10 legacy conversion: z is a correctly-rounded IEEE chain over the
    # decimal midrank sums and exact counts — emitted RAW (the driver-
    # proven a_mann_whitney_u posture), no round(double, 6).
    return pairs.select(
        "grp_a",
        "grp_b",
        "n_a",
        "n_b",
        z.alias("z_dunn"),
        (F.abs(z) > 2.807).alias("significant_bonf"),
    ).orderBy("grp_a", "grp_b")


@register(
    "a_price_index",
    oracle=f"""
    WITH base AS (
        SELECT l.l_partkey AS part,
            {dsum_sql('l.l_quantity')} AS q0,
            {dsum_sql('l.l_extendedprice')} AS v0
        FROM lineitem l
        WHERE CAST(l.l_shipdate AS DATE) BETWEEN DATE '1996-01-01'
            AND DATE '1996-12-31'
        GROUP BY 1
    ),
    cur AS (
        SELECT l.l_partkey AS part,
            {dsum_sql('l.l_quantity')} AS q1,
            {dsum_sql('l.l_extendedprice')} AS v1
        FROM lineitem l
        WHERE CAST(l.l_shipdate AS DATE) BETWEEN DATE '1999-01-01'
            AND DATE '1999-12-31'
        GROUP BY 1
    ),
    j AS (
        SELECT base.part,
            v0 / q0 AS p0, v1 / q1 AS p1,
            q0, q1
        FROM base JOIN cur ON cur.part = base.part
        WHERE q0 > 0 AND q1 > 0
    ),
    sums AS (
        SELECT count(*) AS n_parts,
            {dsum_sql('round(p1 * q0, 4)', 4)} AS p1q0,
            {dsum_sql('round(p0 * q0, 4)', 4)} AS p0q0,
            {dsum_sql('round(p1 * q1, 4)', 4)} AS p1q1,
            {dsum_sql('round(p0 * q1, 4)', 4)} AS p0q1
        FROM j
    )
    SELECT n_parts,
        round(p1q0 / p0q0, 6) AS laspeyres,
        round(p1q1 / p0q1, 6) AS paasche,
        round(sqrt((p1q0 / p0q0) * (p1q1 / p0q1)), 6) AS fisher
    FROM sums
    """,
    tags=("agg", "economics", "index"),
)
def a_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laspeyres / Paasche / Fisher price indices between the 1996 and
    1999 shipping years over the common part basket — the classic
    'did prices move, holding the BASKET fixed' decomposition that a
    raw revenue delta conflates with volume shifts (a_kpi_decomposition
    splits one month's delta; this compares price LEVELS across years
    with base-period weights, current-period weights, and their
    geometric compromise). Unit prices derive per part from decimal
    revenue/quantity sums; the cross products p x q round at 4dp before
    the decimal sum — v/q quotients are non-terminating rationals, so
    the round has no exact grid ties (rule 3's safe case), and the
    index ratios are irrational quotients rounded at 6dp. Two scans of
    the fact (one per period, both date-pruned at the parquet scan) to
    the part grain, one part-keyed join, one scalar readout — the same
    shape at any corpus size. Cell-exact."""
    li = table(spark, sf_dir, "lineitem")

    def period(y0: str, y1: str, qn: str, vn: str) -> DataFrame:
        return (
            li.filter(F.to_date("l_shipdate").between(y0, y1))
            .groupBy(F.col("l_partkey").alias("part"))
            .agg(
                dsum("l_quantity").alias(qn),
                dsum("l_extendedprice").alias(vn),
            )
        )

    base = period("1996-01-01", "1996-12-31", "q0", "v0")
    cur = period("1999-01-01", "1999-12-31", "q1", "v1")
    j = (
        base.join(cur, "part")
        .filter((F.col("q0") > 0) & (F.col("q1") > 0))
        .select(
            "part",
            (F.col("v0") / F.col("q0")).alias("p0"),
            (F.col("v1") / F.col("q1")).alias("p1"),
            "q0",
            "q1",
        )
    )
    sums = j.agg(
        F.count("*").alias("n_parts"),
        dsum(F.round(F.col("p1") * F.col("q0"), 4), scale=4).alias("p1q0"),
        dsum(F.round(F.col("p0") * F.col("q0"), 4), scale=4).alias("p0q0"),
        dsum(F.round(F.col("p1") * F.col("q1"), 4), scale=4).alias("p1q1"),
        dsum(F.round(F.col("p0") * F.col("q1"), 4), scale=4).alias("p0q1"),
    )
    las = F.col("p1q0") / F.col("p0q0")
    paa = F.col("p1q1") / F.col("p0q1")
    return sums.select(
        "n_parts",
        F.round(las, 6).alias("laspeyres"),
        F.round(paa, 6).alias("paasche"),
        F.round(F.sqrt(las * paa), 6).alias("fisher"),
    )
