"""Projections, filters, predicates, set ops (SURVEY.md §2.2, §2.7).

Each query is the fixture-table realization of a reference operator (cited
per query). All are pure Catalyst plans: filters and projections reach the
parquet scan (PushedFilters / ReadSchema), set ops are exchange-free where
the inputs are co-partitioned, and the anti-join broadcasts its small side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from boxoffice_spark.functions.numeric import fround, fround_sql
from boxoffice_spark.registry import register
from boxoffice_spark.tables import table


@register(
    "p_projection_daterange",
    oracle="""
    SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice, l_shipdate
    FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-03-31'
    """,
    tags=("filter", "projection"),
)
def p_projection_daterange(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1+P5: explicit select-list with a date-range predicate (reference
    dashboard.py:79-86 column pruning; :246 date range). Both the projection
    and the predicate push down to the parquet scan."""
    return (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice", "l_shipdate")
        .filter(F.col("l_shipdate").between("1996-01-01", "1996-03-31"))
    )


@register(
    "p_conjunctive_filter",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice
    FROM part
    WHERE p_size > 25 AND p_type = 'PROMO' AND p_retailprice < 1500
    """,
    tags=("filter",),
)
def p_conjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: three-way conjunctive predicate (reference
    kobisdata_extractor.py:115-118 is_not_adult & has_eng_title &
    has_directors)."""
    p = table(spark, sf_dir, "part")
    return p.filter((F.col("p_size") > 25) & (F.col("p_type") == "PROMO") & (F.col("p_retailprice") < 1500))


@register(
    "p_null_and_empty_filter",
    oracle="""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE text IS NOT NULL AND text <> '' AND lang IS NOT NULL AND n_chars > 200
    """,
    tags=("filter",),
)
def p_null_and_empty_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4+P9: null-drop + non-empty-string filter (reference
    kobisdata_extractor.py:137-138 dropna; dashboard.py:288 notna & != '')."""
    d = table(spark, sf_dir, "documents")
    return d.filter(
        F.col("text").isNotNull() & (F.col("text") != "") & F.col("lang").isNotNull() & (F.col("n_chars") > 200)
    ).select("doc_id", "lang", "source", "n_chars")


@register(
    "p_membership_filter",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderpriority, o_totalprice
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
    tags=("filter",),
)
def p_membership_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8: isin membership filter (reference dashboard.py:335
    movie_nm.isin(selected))."""
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select("o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice")
    )


@register(
    "p_rolling_window_filter",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value
    FROM events
    WHERE ts >= date_trunc('microseconds', (SELECT max(ts) FROM events)) - INTERVAL 7 DAY
    """,
    tags=("filter", "watermark"),
)
def p_rolling_window_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7: rolling-window predicate (reference movie_events_scraper.py:72
    DATE('now','-1 days')). 'now' is anchored to the table's own max event
    time so the query is deterministic; the max is a 1-row aggregate joined
    back (broadcast) rather than a driver-side collect."""
    ev = table(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("mx"))
    return (
        ev.join(F.broadcast(mx))
        .filter(F.col("ts") >= F.col("mx") - F.expr("INTERVAL 7 DAYS"))
        .select("event_id", "ts", "user_id", "event_type", "value")
    )


@register(
    "p_anti_join_new_keys",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    """,
    tags=("antijoin",),
)
def p_anti_join_new_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10/P11/U3: anti-join 'insert-if-absent' dedup (reference
    kobis_pipeline.py:77-81 movie_cd NOT IN existing): customers with no
    urgent order. left_anti keeps the probe side partition-local when the
    existing-keys side broadcasts."""
    cust = table(spark, sf_dir, "customer")
    urgent = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "p_distinct_subset",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
    tags=("distinct",),
)
def p_distinct_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P12: dropDuplicates on a column subset (reference
    backfill_goods_events.py:37; dashboard.py:286)."""
    return table(spark, sf_dir, "events").select("user_id", "event_type").dropDuplicates()


@register(
    "p_union_dedup",
    oracle="""
    SELECT c_name AS name FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT s_name AS name FROM supplier
    """,
    tags=("setop",),
)
def p_union_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1/J2: UNION with dedup (reference movie_events_scraper.py:68-81
    recent-titles ∪ upcoming-titles)."""
    c = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_name").alias("name"))
    )
    s = table(spark, sf_dir, "supplier").select(F.col("s_name").alias("name"))
    return c.union(s).distinct()


@register(
    "p_union_all_concat",
    oracle="""
    SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
    WHERE o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1995-01-31'
    UNION ALL
    SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
    WHERE o_orderdate BETWEEN TIMESTAMP '1995-02-01' AND TIMESTAMP '1995-02-28'
    """,
    tags=("setop",),
)
def p_union_all_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: UNION ALL batch concat (reference pd.concat at
    kobisdata_extractor.py:92, kobis_pipeline.py:43) — the per-day fetch
    batches unioned into one frame. unionByName, no shuffle."""
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_totalprice")
    jan = o.filter(F.col("o_orderdate").between("1995-01-01", "1995-01-31"))
    feb = o.filter(F.col("o_orderdate").between("1995-02-01", "1995-02-28"))
    return jan.unionByName(feb)


@register(
    "p_multikey_sort_limit",
    oracle="""
    SELECT o_orderkey, o_orderdate, o_totalprice, o_orderpriority
    FROM orders
    ORDER BY o_orderdate DESC, o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
    tags=("sort", "limit"),
)
def p_multikey_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1+O2: multi-key sort + head (reference dashboard.py:84 ORDER BY
    target_dt DESC, rank ASC; :164 head). Catalyst plans
    TakeOrderedAndProject — no global sort materialization."""
    return (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderdate", "o_totalprice", "o_orderpriority")
        .orderBy(F.desc("o_orderdate"), F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@register(
    "p_intersect_repeat_buyers",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderdate >= DATE '1996-01-01'
                                    AND o_orderdate < DATE '1997-01-01'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderdate >= DATE '1997-01-01'
                                    AND o_orderdate < DATE '1998-01-01'
    """,
    tags=("setop", "intersect"),
)
def p_intersect_repeat_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-family INTERSECT: customers who ordered in BOTH 1996 and 1997.
    Planned as distinct + LEFT SEMI hash join on the key — each side's
    year filter pushes to the scan, the semi join keeps only the key
    column, and no row payload crosses the shuffle. (The reference has no
    INTERSECT; this closes the U-family for engine completeness.)"""
    o = table(spark, sf_dir, "orders")
    y96 = o.filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    ).select("o_custkey").distinct()
    y97 = o.filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")
    ).select("o_custkey")
    return y96.join(y97, "o_custkey", "left_semi")


@register(
    "p_except_all_multiset",
    oracle="""
    SELECT o_custkey FROM (
        SELECT o_custkey FROM orders WHERE o_orderstatus IN ('O', 'P')
        EXCEPT ALL
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    )
    ORDER BY o_custkey
    """,
    tags=("relational", "set", "multiset"),
)
def p_except_all_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — multiset difference with multiplicity: a customer
    with 3 open/pending orders and 1 finished order keeps 2 rows, which
    neither the anti-join (drops the key entirely) nor EXCEPT (dedups)
    can express. The bag-semantics member of the U-family, via Spark's
    native exceptAll (planned as a count-difference aggregate +
    generate, one shuffle — not a join explosion). Cell-exact: row
    multiplicities are integers."""
    o = table(spark, sf_dir, "orders")
    open_side = o.filter(F.col("o_orderstatus").isin("O", "P")).select("o_custkey")
    done_side = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_side.exceptAll(done_side).orderBy("o_custkey")


@register(
    "p_skyline_pareto",
    oracle=f"""
    WITH p AS (
        SELECT p_brand, p_partkey, p_retailprice, p_size,
            CAST({fround_sql('p_retailprice * 100', 0)} AS BIGINT) AS cents
        FROM part
    ),
    flagged AS (
        SELECT p_brand, p_partkey, p_retailprice, p_size,
            max(p_size) OVER (
                PARTITION BY p_brand ORDER BY cents
                RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
            ) AS best_cheaper,
            max(p_size) OVER (PARTITION BY p_brand, cents) AS best_same_price
        FROM p
    )
    SELECT p_brand, p_partkey, p_retailprice, p_size
    FROM flagged
    WHERE (best_cheaper IS NULL OR best_cheaper < p_size)
      AND best_same_price <= p_size
    ORDER BY p_brand, p_retailprice, p_partkey
    """,
    tags=("filter", "skyline", "olap"),
)
def p_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand 2-D skyline (Pareto frontier): the parts for which no
    same-brand part is both cheaper-or-equal AND larger-or-equal with at
    least one strict — the classic multi-objective shortlist operator
    ("show me the options not strictly beaten on price vs capacity")
    that plain ORDER BY cannot express. Two window passes replace the
    textbook NOT EXISTS self-join: ordered by price (in exact cents so
    the RANGE frame has an integer domain), a row survives iff no
    STRICTLY cheaper row reaches its size (RANGE .. 1 PRECEDING running
    max) and no equal-priced row strictly exceeds it (per-price-group
    max). Equal (price, size) twins are mutually non-dominating and both
    survive — the NOT-EXISTS form agrees.

    At 100 TB: windows are partitioned by brand — one shuffle, per-brand
    sort, no self-join, no pair blowup (the NOT EXISTS form is the
    quadratic trap). The running-max trick generalizes to any 2-D
    skyline; higher dimensions need the block-nested-loop family, which
    is exactly why the engine ships the 2-D case as the declarative
    fast path."""
    from pyspark.sql import Window

    p = table(spark, sf_dir, "part").select(
        "p_brand",
        "p_partkey",
        "p_retailprice",
        "p_size",
        # r10 legacy conversion: fround pins the cent quantization
        # (round(double, 0) is build surface).
        fround(F.col("p_retailprice") * 100, 0).cast("bigint").alias("cents"),
    )
    w_cheaper = (
        Window.partitionBy("p_brand")
        .orderBy("cents")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_same = Window.partitionBy("p_brand", "cents")
    flagged = p.select(
        "p_brand",
        "p_partkey",
        "p_retailprice",
        "p_size",
        F.max("p_size").over(w_cheaper).alias("best_cheaper"),
        F.max("p_size").over(w_same).alias("best_same_price"),
    )
    return (
        flagged.filter(
            (F.col("best_cheaper").isNull() | (F.col("best_cheaper") < F.col("p_size")))
            & (F.col("best_same_price") <= F.col("p_size"))
        )
        .select("p_brand", "p_partkey", "p_retailprice", "p_size")
        .orderBy("p_brand", "p_retailprice", "p_partkey")
    )


@register(
    "p_relational_division",
    oracle="""
    WITH pr AS (
        SELECT count(DISTINCT o_orderpriority) AS n_all FROM orders
    ),
    cov AS (
        SELECT o_custkey,
            count(DISTINCT o_orderpriority) AS n_cov,
            count(*) AS n_orders
        FROM orders GROUP BY 1
    )
    SELECT c_custkey, c_name, c_mktsegment, n_orders
    FROM cov
    JOIN customer ON c_custkey = o_custkey
    CROSS JOIN pr
    WHERE n_cov = n_all
    ORDER BY c_custkey
    """,
    tags=("projection", "setops", "division"),
)
def p_relational_division(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational division — the FOR ALL quantifier: customers whose
    order history spans EVERY order priority class. Codd's division is
    the one classic relational operator with no direct SQL keyword; the
    set-cover formulation (per-divisor-group distinct count == divisor
    cardinality) replaces the textbook double-NOT-EXISTS correlated
    subquery, which Catalyst would otherwise plan as a nested anti-join
    per divisor row.

    One shuffle to the per-customer grain folds both the distinct
    priority count and the order count (the distinct rides the same
    hash partitioning); the divisor cardinality is a 1-row broadcast
    and the customer dimension joins on the post-aggregate (already
    customer-keyed) side. At 100 TB: corpus scan -> one customer-keyed
    exchange -> bounded output."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    pr = o.agg(F.countDistinct("o_orderpriority").alias("n_all"))
    cov = o.groupBy("o_custkey").agg(
        F.countDistinct("o_orderpriority").alias("n_cov"),
        F.count("*").alias("n_orders"),
    )
    return (
        cov.crossJoin(F.broadcast(pr))
        .filter(F.col("n_cov") == F.col("n_all"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .select("c_custkey", "c_name", "c_mktsegment", "n_orders")
        .orderBy("c_custkey")
    )
