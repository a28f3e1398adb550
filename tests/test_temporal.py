"""Semantic + plan tests for the temporal join operators.

Semantics on hand-built frames (direction, ties, tolerance, emptiness);
plan audits locking in the scale properties: the as-of join is ONE shuffle
and ZERO join operators (union + running window), and neither interval
join form ever degrades to a cartesian/nested-loop product.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from boxoffice_spark.operators.temporal import asof_join, interval_join
from boxoffice_spark.registry import load_all

SPECS = load_all()


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, "k1", _ts("2024-01-01 10:00:00")),
            (2, "k1", _ts("2024-01-01 12:00:00")),
            (3, "k2", _ts("2024-01-01 09:00:00")),
        ],
        "lid long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, "k1", _ts("2024-01-01 09:30:00"), 1.0),
            (11, "k1", _ts("2024-01-01 10:00:00"), 2.0),  # tie with lid=1
            (12, "k1", _ts("2024-01-01 11:00:00"), 3.0),
            (13, "k3", _ts("2024-01-01 08:00:00"), 4.0),
        ],
        "rid long, k string, ts timestamp, v double",
    )
    return left, right


def test_asof_backward_inclusive_and_unmatched_null(spark):
    left, right = _frames(spark)
    out = {
        r.lid: (r.r_rid, r.r_v)
        for r in asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="ts", tie_col="rid"
        ).collect()
    }
    assert out[1] == (11, 2.0)  # equal timestamp matches (inclusive)
    assert out[2] == (12, 3.0)  # latest at-or-before 12:00
    assert out[3] == (None, None)  # k2 has no right rows at all


def test_asof_null_right_ts_never_matches(spark):
    """A right row with a NULL event time must never be attached
    (regression: backward's NULLS FIRST scan carried it as a universal
    fallback match for left rows earlier than every real right row)."""
    import datetime as dt

    left = spark.createDataFrame(
        [(1, "k", dt.datetime(2025, 1, 1))], "lid long, k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [(10, "k", None, 1.0), (11, "k", dt.datetime(2025, 1, 2), 2.0)],
        "rid long, k string, ts timestamp, v double",
    )
    out = {
        r.lid: (r.r_rid, r.r_v)
        for r in asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="ts", tie_col="rid"
        ).collect()
    }
    assert out[1] == (None, None)  # no purchase at/before 2025-01-01


def test_asof_forward(spark):
    left, right = _frames(spark)
    out = {
        r.lid: r.r_rid
        for r in asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="ts",
            direction="forward", tie_col="rid",
        ).collect()
    }
    assert out[1] == 11  # equal ts still matches forward
    assert out[2] is None  # nothing at/after 12:00
    assert out[3] is None


def test_asof_tolerance_nulls_stale_matches(spark):
    left, right = _frames(spark)
    out = {
        r.lid: r.r_rid
        for r in asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="ts",
            tie_col="rid", tolerance_secs=1800,
        ).collect()
    }
    assert out[1] == 11  # 0s gap
    assert out[2] is None  # nearest is 1h old > 30min tolerance


def test_asof_equal_ts_tie_breaks_to_max_tie_col(spark):
    left, _ = _frames(spark)
    right = left.sparkSession.createDataFrame(
        [
            (20, "k1", _ts("2024-01-01 10:00:00"), 1.0),
            (21, "k1", _ts("2024-01-01 10:00:00"), 2.0),
        ],
        "rid long, k string, ts timestamp, v double",
    )
    out = {
        r.lid: r.r_rid
        for r in asof_join(
            left.filter("lid = 1"), right, on=["k"], left_ts="ts", right_ts="ts", tie_col="rid"
        ).collect()
    }
    assert out[1] == 21


def test_asof_null_payload_field_not_backfilled_from_older_row(spark):
    """The matched right row must come back ATOMIC: when its v is NULL, the
    output v must be NULL too — not back-filled from an older right row
    (the per-column last(ignorenulls) Frankenstein bug)."""
    left = spark.createDataFrame(
        [(1, "k1", _ts("2024-01-01 12:00:00"))], "lid long, k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (10, "k1", _ts("2024-01-01 09:00:00"), 7.0),  # older, v NOT null
            (11, "k1", _ts("2024-01-01 11:00:00"), None),  # matched, v IS null
        ],
        "rid long, k string, ts timestamp, v double",
    )
    rows = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts", tie_col="rid"
    ).collect()
    assert len(rows) == 1
    assert rows[0].r_rid == 11 and rows[0].r_v is None


def test_keyless_interval_join_matches_naive(spark):
    points = spark.range(0, 500).select(
        F.timestamp_seconds(F.lit(1700000000) + F.col("id") * 97).alias("ts"),
        F.col("id").alias("pid"),
    )
    intervals = spark.range(0, 20).select(
        F.timestamp_seconds(F.lit(1700000000) + F.col("id") * 3000).alias("s"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id") * 3000 + 7000).alias("e"),
        F.col("id").alias("iid"),
    )
    got = {
        (r.pid, r.iid)
        for r in interval_join(
            points, intervals, point_ts="ts", start_col="s", end_col="e", bin_secs=1000
        ).collect()
    }
    naive = {
        (r.pid, r.iid)
        for r in points.crossJoin(intervals)
        .filter((F.col("ts") >= F.col("s")) & (F.col("ts") < F.col("e")))
        .collect()
    }
    assert got == naive and len(got) > 0


def test_asof_plan_one_shuffle_no_join(spark, sf_dir):
    df = SPECS["j_asof_last_purchase"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    for op in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert op not in plan, f"asof must not plan a join operator ({op}):\n{plan}"


def test_interval_plans_never_cartesian(spark, sf_dir):
    for name in ("j_attribution_window", "j_sliding_interval_count"):
        plan = SPECS[name].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, f"{name} planned a cartesian product:\n{plan}"
        assert "BroadcastNestedLoopJoin" not in plan, f"{name} planned a nested loop:\n{plan}"


def test_interval_overlap_join_matches_naive_and_emits_once(spark):
    """The binned overlap join must equal the naive cross-join + overlap
    predicate exactly — including boundary semantics (half-open: touching
    intervals do NOT overlap) — and emit each overlapping pair exactly
    once even when the pair shares many bins."""
    from pyspark.sql import functions as F

    from boxoffice_spark.operators.temporal import interval_overlap_join

    def ts(h):
        return f"2024-01-0{1 + h // 24}T{h % 24:02d}:00:00"

    left = spark.createDataFrame(
        [(i, ts(s), ts(e)) for i, (s, e) in enumerate([(0, 5), (3, 30), (10, 11), (20, 21)])],
        "lid long, ls string, le string",
    ).select("lid", F.col("ls").cast("timestamp").alias("ls"), F.col("le").cast("timestamp").alias("le"))
    right = spark.createDataFrame(
        [(i, ts(s), ts(e)) for i, (s, e) in enumerate([(4, 12), (11, 20), (5, 6), (21, 40)])],
        "rid long, rs string, re string",
    ).select("rid", F.col("rs").cast("timestamp").alias("rs"), F.col("re").cast("timestamp").alias("re"))

    got = sorted(
        (r.lid, r.rid)
        for r in interval_overlap_join(
            left, right, "ls", "le", "rs", "re", bin_secs=3600
        ).collect()
    )
    naive = sorted(
        (r.lid, r.rid)
        for r in left.crossJoin(right)
        .filter((F.col("ls") < F.col("re")) & (F.col("rs") < F.col("le")))
        .collect()
    )
    assert got == naive and len(got) == len(set(got)), (got, naive)
    # half-open boundary: [10,11) vs [11,20) touch but must not match
    assert (2, 1) not in got


def test_ewma_matches_reference_and_partitioning(spark):
    """The distributed applyInPandas EWMA must equal the single-machine
    recursion on each key's ordered series, for any input partitioning."""
    import math

    from pyspark.sql import functions as F

    from boxoffice_spark.operators.temporal import ewma_by_key

    rows = [("a", d, float(v)) for d, v in enumerate([10, 20, 5, 40, 40, 1])] + [
        ("b", d, float(v)) for d, v in enumerate([100, 0, 50])
    ]
    df = spark.createDataFrame(rows, "k string, t long, x double")
    for parts in (1, 7):
        got = {
            (r.k, r.t): r.ewma
            for r in ewma_by_key(df.repartition(parts), ["k"], "t", "x", alpha=0.5).collect()
        }
        want = {}
        for k in ("a", "b"):
            series = sorted((t, x) for kk, t, x in rows if kk == k)
            y = None
            for t, x in series:
                y = x if y is None else 0.5 * x + 0.5 * y
                want[(k, t)] = round(y, 6)
        assert got.keys() == want.keys()
        for key in want:
            assert math.isclose(got[key], want[key], abs_tol=1e-9), (key, got[key], want[key])


def test_event_funnel_strict_stage_ordering(spark):
    """A later-stage event BEFORE its predecessor stage must not convert:
    purchase-before-view counts the user as viewed (if they view) but not
    purchased; click-before-view likewise. Equal timestamps DO chain
    (>= boundary)."""
    import datetime as dt

    from boxoffice_spark.queries.windows import w_event_funnel  # noqa: F401
    from pyspark.sql import functions as F, Window as W

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    rows = [
        # u1: clean funnel view(0) -> click(1) -> purchase(2)
        (7, ts(0), 1, "view", 1.0),
        (14, ts(1), 1, "click", 1.0),
        (21, ts(2), 1, "purchase", 1.0),
        # u2: purchase BEFORE view -> viewed, clicked, NOT purchased
        (28, ts(0), 2, "purchase", 1.0),
        (35, ts(1), 2, "view", 1.0),
        (42, ts(2), 2, "click", 1.0),
        # u3: click before view, none after -> viewed only
        (49, ts(0), 3, "click", 1.0),
        (56, ts(1), 3, "view", 1.0),
        # u4: same-microsecond view+click+purchase -> all stages (>= chain)
        (63, ts(0), 4, "view", 1.0),
        (70, ts(0), 4, "click", 1.0),
        (77, ts(0), 4, "purchase", 1.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    # replicate the funnel's window chain on the fixture-free frame
    # (event_id values are all %7==0 so the campaign slice keeps them)
    w = W.partitionBy("user_id")
    staged = (
        ev.withColumn("view_ts", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w))
        .withColumn(
            "click_ts",
            F.min(F.when((F.col("event_type") == "click") & (F.col("ts") >= F.col("view_ts")), F.col("ts"))).over(w),
        )
        .withColumn(
            "purchase_ts",
            F.min(F.when((F.col("event_type") == "purchase") & (F.col("ts") >= F.col("click_ts")), F.col("ts"))).over(w),
        )
    )
    got = {
        r["user_id"]: (r["view_ts"] is not None, r["click_ts"] is not None, r["purchase_ts"] is not None)
        for r in staged.groupBy("user_id").agg(
            F.first("view_ts").alias("view_ts"),
            F.first("click_ts").alias("click_ts"),
            F.first("purchase_ts").alias("purchase_ts"),
        ).collect()
    }
    assert got[1] == (True, True, True)
    assert got[2] == (True, True, False)   # purchase predates view: no conversion
    assert got[3] == (True, False, False)  # click predates view: no conversion
    assert got[4] == (True, True, True)    # ties chain on the >= boundary


class TestHoltByKey:
    def _ref(self, xs, alpha=0.5, beta=0.3):
        lvl = [xs[0]]
        trd = [(xs[1] - xs[0]) if len(xs) > 1 else 0.0]
        for t in range(1, len(xs)):
            l = alpha * xs[t] + (1.0 - alpha) * (lvl[-1] + trd[-1])
            b = beta * (l - lvl[-1]) + (1.0 - beta) * trd[-1]
            lvl.append(l)
            trd.append(b)
        return [round(v, 6) for v in lvl], [round(v, 6) for v in trd]

    def test_matches_sequential_reference(self, spark):
        from boxoffice_spark.operators.temporal import holt_by_key

        xs = [10.0, 12.0, 15.0, 14.0, 20.0, 26.0, 25.0]
        df = spark.createDataFrame(
            [("k", i, x) for i, x in enumerate(xs)], "k string, t int, x double"
        )
        out = {
            r.t: (r.level, r.trend, r.forecast_next)
            for r in holt_by_key(df, ["k"], "t", "x").collect()
        }
        lvl, trd = self._ref(xs)
        for t in range(len(xs)):
            assert out[t][0] == lvl[t], (t, out[t], lvl[t])
            assert out[t][1] == trd[t], (t, out[t], trd[t])

    def test_repartition_invariant(self, spark, sf_dir):
        from boxoffice_spark.registry import load_all

        fn = load_all()["w_holt_trend"].fn
        base = sorted(map(tuple, fn(spark, sf_dir).collect()))
        # the operator sorts inside each group, so input partitioning
        # must not matter
        from boxoffice_spark.functions.numeric import dsum
        from boxoffice_spark.operators.temporal import holt_by_key
        from boxoffice_spark.tables import table
        from pyspark.sql import functions as F

        o = table(spark, sf_dir, "orders")
        daily = (
            o.filter(F.col("o_orderdate").between("1995-01-01", "1995-06-30"))
            .groupBy(
                F.col("o_orderstatus").alias("status"),
                F.to_date("o_orderdate").alias("day"),
            )
            .agg(dsum("o_totalprice", scale=2).alias("revenue"))
            .repartition(13)
        )
        again = sorted(
            map(tuple, holt_by_key(daily, ["status"], "day", "revenue").collect())
        )
        assert base == again

    def test_constant_and_linear_fixed_points(self, spark):
        from boxoffice_spark.operators.temporal import holt_by_key

        const = [("c", i, 5.0) for i in range(10)]
        lin = [("l", i, 2.0 + 3.0 * i) for i in range(10)]
        df = spark.createDataFrame(const + lin, "k string, t int, x double")
        rows = holt_by_key(df, ["k"], "t", "x").collect()
        for r in rows:
            if r.k == "c":
                assert r.level == 5.0 and r.trend == 0.0
            else:
                # a perfect line is a fixed point: level tracks exactly,
                # trend holds the slope
                assert abs(r.level - (2.0 + 3.0 * r.t)) < 1e-9, r
                assert abs(r.trend - 3.0) < 1e-9, r


class TestHoltBacktest:
    def test_runs_and_scores_all_statuses(self, spark, sf_dir):
        from boxoffice_spark.registry import load_all

        fn = load_all()["w_holt_backtest"].fn
        rows = {r.status: r for r in fn(spark, sf_dir).collect()}
        assert len(rows) > 0
        for r in rows.values():
            assert r.n_scored > 0
            assert r.mae_holt >= 0 and r.mae_naive >= 0
            # skill is bounded above by 1 (MAE >= 0); no lower bound
            if r.skill_vs_naive is not None:
                assert r.skill_vs_naive <= 1.0

    def test_perfect_skill_on_linear_series(self, spark, tmp_path):
        """On an exact line, Holt's one-step forecast is exact from the
        first step (linear fixed point) while the naive forecast is off
        by the slope every day -> skill == 1."""
        import datetime as dt

        import pyarrow as pa
        import pyarrow.parquet as pq

        days = [dt.datetime(1995, 1, 1) + dt.timedelta(days=i) for i in range(40)]
        t = pa.table(
            {
                "o_orderkey": list(range(40)),
                "o_custkey": [1] * 40,
                "o_orderstatus": ["L"] * 40,
                "o_totalprice": [100.0 + 7.0 * i for i in range(40)],
                "o_orderdate": days,
                "o_orderpriority": ["1-URGENT"] * 40,
            }
        )
        pq.write_table(t, str(tmp_path / "orders.parquet"))
        from boxoffice_spark.registry import load_all

        fn = load_all()["w_holt_backtest"].fn
        rows = fn(spark, str(tmp_path)).collect()
        assert len(rows) == 1
        r = rows[0]
        assert r.mae_holt == 0.0, r
        assert r.mae_naive == 7.0, r
        assert r.skill_vs_naive == 1.0, r
