"""Join operators (SURVEY.md §2.3).

Join-strategy notes for the 100 TB design point are on each query: small
dimensions broadcast (no shuffle of the fact side), the star join shuffles
the fact exactly once, and the fuzzy join broadcasts its small input side
under a filtered nested loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from boxoffice_spark.functions.numeric import dsum, dsum_sql, fround, fround_sql
from boxoffice_spark.operators.fuzzy import fuzzy_containment_join
from boxoffice_spark.registry import register
from boxoffice_spark.tables import table

# DuckDB twin of functions.cleaning.normalize_title (kept in lockstep).
_NORM_SQL = (
    "lower(regexp_replace(trim(regexp_replace(regexp_replace({col}, "
    "'[^가-힣a-zA-Z0-9\\s]', '', 'g'), '\\s+', ' ', 'g')), '[ :_]', '', 'g'))"
)


@register(
    "j_broadcast_left_join",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, o.o_orderdate, c.c_name, c.c_mktsegment
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    bench=True,
    tags=("join",),
)
def j_broadcast_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: left equi-join fact x dimension (reference dashboard.py:287
    boxoffice ⋈ movie genre enrichment). Dimension broadcasts: the fact side
    never shuffles, which is the difference between O(fact) and
    O(fact shuffle) at 100 TB."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left").select(
        "o_orderkey", "o_totalprice", "o_orderdate", "c_name", "c_mktsegment"
    )


@register(
    "j_two_key_priority",
    oracle="""
    SELECT
        o.o_orderkey,
        o.o_custkey,
        coalesce(p1.c_name, p2.c_name) AS enriched_name,
        CASE WHEN p1.c_name IS NOT NULL THEN 'primary' ELSE 'fallback' END AS match_tier
    FROM orders o
    LEFT JOIN (SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 5000) p1
        ON o.o_custkey = p1.c_custkey
    LEFT JOIN customer p2 ON o.o_custkey = p2.c_custkey
    """,
    tags=("join", "priority"),
)
def j_two_key_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: two-key priority enrichment (reference
    movie_events_scraper.py:307-367: probe dict keyed (title, goods_name),
    fall back to (title, start, end)). Two broadcast left joins + coalesce;
    the match_tier column records which key hit, mirroring the reference's
    consume-matched-rows bookkeeping."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    p1 = c.filter(F.col("c_acctbal") > 5000).select(
        F.col("c_custkey").alias("k1"), F.col("c_name").alias("name1")
    )
    p2 = c.select(F.col("c_custkey").alias("k2"), F.col("c_name").alias("name2"))
    return (
        o.join(F.broadcast(p1), o.o_custkey == F.col("k1"), "left")
        .join(F.broadcast(p2), o.o_custkey == F.col("k2"), "left")
        .select(
            "o_orderkey",
            "o_custkey",
            F.coalesce("name1", "name2").alias("enriched_name"),
            F.when(F.col("name1").isNotNull(), "primary").otherwise("fallback").alias("match_tier"),
        )
    )


@register(
    "j_dispatch_join",
    oracle=f"""
    SELECT m.handler, count(*) AS n_events, {dsum_sql('e.value')} AS total_value
    FROM events e
    JOIN (VALUES
        ('click', 'web'), ('view', 'web'), ('purchase', 'commerce'),
        ('signup', 'account'), ('error', 'ops')
    ) AS m(event_type, handler) ON e.event_type = m.event_type
    GROUP BY m.handler
    """,
    tags=("join", "dispatch"),
)
def j_dispatch_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: key-map dispatch join (reference goods_stock_pipeline.py:60-66
    routes rows to scrapers by theater_chain). The routing table is a
    broadcast literal DataFrame — at scale this is how per-source handlers
    partition a firehose without a shuffle."""
    ev = table(spark, sf_dir, "events")
    mapping = spark.createDataFrame(
        [("click", "web"), ("view", "web"), ("purchase", "commerce"), ("signup", "account"), ("error", "ops")],
        "event_type string, handler string",
    )
    return (
        ev.join(F.broadcast(mapping), "event_type")
        .groupBy("handler")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total_value"))
    )


@register(
    "j_semi_join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1995-12-31'
    )
    """,
    tags=("join", "semi"),
)
def j_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers active in 1995. The dual of the
    reference's NOT IN anti-join (movie_events_scraper.py:79)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderdate").between("1995-01-01", "1995-12-31"))
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "j_star_join",
    oracle=f"""
    SELECT n.n_name AS nation, {dsum_sql('l.l_extendedprice * (1 - l.l_discount)', 4)} AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
    GROUP BY n.n_name
    """,
    bench=True,
    tags=("join", "star"),
)
def j_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way star join (TPC-H Q5 shape) — the scaled generalization of
    the reference's fact x dim enrichment. customer/nation/region broadcast;
    lineitem ⋈ orders is the only real shuffle. The region filter prunes
    before the join via Catalyst predicate pushdown."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderdate").between("1995-01-01", "1996-12-31"))
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=4).alias("revenue"))
    )


_FUZZY_NORM_C = _NORM_SQL.format(col="c.p_name")
_FUZZY_NORM_Q = _NORM_SQL.format(col="i.q")


@register(
    "j_fuzzy_containment",
    oracle=f"""
    WITH cands AS (SELECT DISTINCT p_name FROM part),
    inputs AS (
        SELECT p_partkey AS input_id, split_part(p_name, ' ', 1) AS q
        FROM part WHERE p_partkey % 97 = 0
    ),
    scored AS (
        SELECT
            i.input_id,
            i.q,
            c.p_name AS matched_name,
            length({_FUZZY_NORM_C}) - length({_FUZZY_NORM_Q}) AS score,
            ROW_NUMBER() OVER (
                PARTITION BY i.input_id
                ORDER BY length({_FUZZY_NORM_C}) - length({_FUZZY_NORM_Q}), c.p_name
            ) AS rn
        FROM inputs i
        JOIN cands c ON contains({_FUZZY_NORM_C}, {_FUZZY_NORM_Q})
        WHERE length({_FUZZY_NORM_Q}) > 0
    )
    SELECT input_id, q, matched_name, score FROM scored WHERE rn = 1
    """,
    bench=True,
    tags=("join", "fuzzy"),
)
def j_fuzzy_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: fuzzy containment-scored join (reference
    movie_events_scraper.py:56-128) on fixtures: match one-word queries
    (first word of every 97th part name) to the closest full part name —
    normalized containment, min length-difference, deterministic tie-break.
    See operators/fuzzy.py for semantics + scale notes."""
    part = table(spark, sf_dir, "part")
    inputs = part.filter(F.col("p_partkey") % 97 == 0).select(
        F.col("p_partkey").alias("input_id"),
        F.split(F.col("p_name"), " ").getItem(0).alias("q"),
    )
    return fuzzy_containment_join(
        inputs, "input_id", "q", part, "p_name", out_match="matched_name", out_score="score"
    )


_TIER_SCORED = """
        SELECT
            i.input_id, i.q, c.p_name AS matched_name,
            length({nc}) - length({nq}) AS score,
            ROW_NUMBER() OVER (
                PARTITION BY i.input_id
                ORDER BY length({nc}) - length({nq}), c.p_name
            ) AS rn
        FROM {inputs} i
        JOIN {cands} c ON contains({nc}, {nq})
        WHERE length({nq}) > 0
""".format


@register(
    "j_fuzzy_tiered",
    oracle=f"""
    WITH inputs AS (
        SELECT p_partkey AS input_id, split_part(p_name, ' ', 1) AS q
        FROM part WHERE p_partkey % 97 = 0
        UNION ALL
        SELECT 2000000 + c_custkey AS input_id, substring(c_name, 9, 1) AS q
        FROM customer WHERE c_custkey % 293 = 0
    ),
    recent_cands AS (SELECT DISTINCT p_name FROM part WHERE p_partkey % 3 = 0),
    full_cands AS (SELECT DISTINCT p_name FROM part
                   UNION SELECT DISTINCT c_name FROM customer),
    t1 AS ({_TIER_SCORED(nc=_FUZZY_NORM_C, nq=_FUZZY_NORM_Q, inputs='inputs', cands='recent_cands')}),
    m1 AS (SELECT input_id, q, matched_name, score, 'recent' AS tier FROM t1 WHERE rn = 1),
    rest AS (SELECT * FROM inputs i
             WHERE NOT EXISTS (SELECT 1 FROM m1 WHERE m1.input_id = i.input_id)),
    t2 AS ({_TIER_SCORED(nc=_FUZZY_NORM_C, nq=_FUZZY_NORM_Q, inputs='rest', cands='full_cands')}),
    m2 AS (SELECT input_id, q, matched_name, score, 'full' AS tier FROM t2 WHERE rn = 1),
    rest2 AS (SELECT * FROM rest r
              WHERE NOT EXISTS (SELECT 1 FROM m2 WHERE m2.input_id = r.input_id)),
    t3 AS ({_TIER_SCORED(nc='c.p_name', nq='i.q', inputs='rest2', cands='full_cands')}),
    m3 AS (SELECT input_id, q, matched_name, score, 'raw' AS tier FROM t3 WHERE rn = 1)
    SELECT * FROM m1 UNION ALL SELECT * FROM m2 UNION ALL SELECT * FROM m3
    """,
    tags=("join", "fuzzy", "tiered"),
)
def j_fuzzy_tiered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4's staged fallback, all THREE reference tiers
    (movie_events_scraper.py:67-125): probe a cheap 'recent' candidate tier
    first (every 3rd part, standing in for recent box-office titles), fall
    back to the full dimension for unmatched inputs, then a last-resort RAW
    un-normalized substring pass — the reference's step 4, which catches
    inputs whose normalized form is empty (here: '#' queries cut from
    customer names; they skip the normalized tiers' non-empty filter but
    raw-match the 'Customer#...' names). The full dimension is parts ∪
    customers so the raw tier has real work. operators/fuzzy.
    tiered_fuzzy_match."""
    from boxoffice_spark.operators.fuzzy import tiered_fuzzy_match

    part = table(spark, sf_dir, "part")
    cust = table(spark, sf_dir, "customer")
    inputs = part.filter(F.col("p_partkey") % 97 == 0).select(
        F.col("p_partkey").alias("input_id"),
        F.split(F.col("p_name"), " ").getItem(0).alias("q"),
    ).unionByName(
        cust.filter(F.col("c_custkey") % 293 == 0).select(
            (F.lit(2000000) + F.col("c_custkey")).alias("input_id"),
            # 'Customer#000000293' -> '#': normalizes to empty, raw-matchable
            F.substring("c_name", 9, 1).alias("q"),
        )
    )
    recent = part.filter(F.col("p_partkey") % 3 == 0)
    full = part.select("p_name").union(cust.select(F.col("c_name").alias("p_name")))
    return tiered_fuzzy_match(
        inputs,
        "input_id",
        "q",
        [
            ("recent", recent, "p_name"),
            ("full", full, "p_name"),
            ("raw", full, "p_name", False),
        ],
    )


@register(
    "j_entity_resolution",
    oracle="""
    WITH RECURSIVE names AS (
        SELECT DISTINCT p_name FROM part
    ),
    cand AS (
        SELECT a.p_name AS name_a, b.p_name AS name_b
        FROM names a JOIN names b
          ON string_split(a.p_name, ' ')[-1] = string_split(b.p_name, ' ')[-1]
         AND a.p_name < b.p_name
        WHERE levenshtein(a.p_name, b.p_name) <= 2
    ),
    edges AS (
        SELECT name_a AS a, name_b AS b FROM cand
        UNION
        SELECT name_b AS a, name_a AS b FROM cand
    ),
    reach AS (
        SELECT a AS node, a AS comp FROM edges
        UNION
        SELECT e.a AS node, r.comp FROM edges e JOIN reach r ON e.b = r.node
    ),
    labels AS (
        SELECT node, min(comp) AS entity_name FROM reach GROUP BY node
    )
    SELECT p.p_partkey, p.p_name,
           coalesce(l.entity_name, p.p_name) AS entity_name
    FROM part p LEFT JOIN labels l ON l.node = p.p_name
    """,
    tags=("join", "fuzzy", "entity-resolution", "iterative"),
)
def j_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution over the part dimension
    (operators/fuzzy.entity_resolution): names within one edit-block
    (same trailing token, levenshtein <= 2) consolidate into entities via
    connected components — chains like cold gear -> old gear -> red gear
    land in ONE entity, which pairwise matching alone cannot do. Every
    part row gets its canonical entity_name (lexicographic cluster min;
    singletons canonicalize to themselves). Pairwise work runs on
    DISTINCT names inside capped blocks, never on records — the oracle is
    the same closure as a DuckDB recursive CTE."""
    from boxoffice_spark.operators.fuzzy import entity_resolution

    # capless: the recursive-CTE oracle has no block cap, and a capped
    # side would silently diverge once any block outgrows it (the
    # operators/dedup.py oracle-exactness rule); the cap is the operator's
    # scale-path option, not part of the checked contract
    return entity_resolution(
        table(spark, sf_dir, "part"), "p_partkey", "p_name", max_dist=2,
        max_block_names=None,
    )


@register(
    "j_band_join_bucketed",
    oracle=f"""
    SELECT c.c_custkey, s.s_suppkey, c.c_acctbal, s.s_acctbal,
        {fround_sql('abs(c.c_acctbal - s.s_acctbal)', 2)} AS bal_diff
    FROM customer c
    JOIN supplier s ON abs(c.c_acctbal - s.s_acctbal) <= 10.0
    ORDER BY c.c_custkey, s.s_suppkey
    """,
    tags=("join", "band", "theta"),
)
def j_band_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric band join — every (customer, supplier) pair whose account
    balances agree within ±10.00, the reconciliation / entity-matching
    shape ("which counterparty records almost-agree") that a naive
    engine plans as a cross product with a theta filter. Here the band
    is EQUI-JOINED: each supplier explodes to its width-10
    floor(balance/10) bucket and both neighbors, customers key to their
    own bucket, and the exact |diff| <= 10 predicate runs as a residual
    filter — any qualifying pair lands in exactly one exploded bucket
    (|floor(a/10) - floor(b/10)| <= 1 whenever |a - b| <= 10), so no
    dedup pass is needed. Bucket width = band width keeps the fixture
    readout non-vacuous at every scale factor (3 pairs at sf0.001).
    The oracle states the declarative theta form; the Spark plan never
    contains a CartesianProduct (plan-gated registry-wide).

    At 100 TB: shuffle cost is 3x the small side's rows on integer
    bucket keys; bucket width trades replication factor against
    residual selectivity — the standard interval/band-join technique
    (DB2/Blink 'banded join', Spark range-join hints)."""
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    sb = F.floor(F.col("s_acctbal") / 10)
    sx = s.select(
        "s_suppkey",
        "s_acctbal",
        F.explode(F.array(sb - 1, sb, sb + 1)).alias("bucket"),
    )
    cx = c.select(
        "c_custkey", "c_acctbal", F.floor(F.col("c_acctbal") / 10).alias("bucket")
    )
    return (
        cx.join(sx, "bucket")
        .filter(F.abs(F.col("c_acctbal") - F.col("s_acctbal")) <= 10.0)
        .select(
            "c_custkey",
            "s_suppkey",
            "c_acctbal",
            "s_acctbal",
            # r10 legacy conversion: fround pins the cent grid (the diff
            # of two 2dp-grid doubles; round(double, 2) is build surface).
            fround(F.abs(F.col("c_acctbal") - F.col("s_acctbal")), 2).alias(
                "bal_diff"
            ),
        )
        .orderBy("c_custkey", "s_suppkey")
    )
