"""Temporal join operators: as-of join and interval (range) join.

The reference has no explicit as-of/range joins (SURVEY.md §2.3 "No
sort-merge, range, as-of, interval ... joins exist"); its as-of flavor
appears implicitly as "latest stock per theater" (reference
dashboard.py:131-140 latest-scrape filter). These operators make the shape
explicit and scalable, because a naive SQL formulation of either one is a
per-key cross join — quadratic in the hot key — which is exactly what dies
first at 100 TB.

Strategies
----------
``asof_join``: the union trick. Tag both sides, union them, sort each key
partition by (ts, side, tie), and carry the right payload forward — as a
single struct, so the attached row stays atomic — with
``last(ignorenulls=True)`` over a running window. Cost = ONE shuffle of each
side on the join keys + one partition-local sort — the same cost class as a
sort-merge equi-join, with no pairwise comparison blowup. State per row is
O(1) (the running "most recent right payload"), so skewed keys degrade
linearly, not quadratically.

``interval_join``: with equi keys, Spark's sort-merge join handles the range
predicate as a residual filter — one shuffle per side. Without keys, a
naive formulation is a full cross join; instead we discretize time into
fixed-width bins: each point lands in exactly one bin, each interval
explodes to the bins it covers, the join becomes an equi-join on the bin id,
and the exact containment predicate filters bin-edge false positives.
Output is exact; the bin width only trades shuffle fan-out (wide bins = more
false pairs filtered, narrow bins = more interval replication).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F, types as T


def latest_per_key(
    df: DataFrame, keys: list[str], order_cols: list[Column | str]
) -> DataFrame:
    """Latest-state-per-key reduction over an append-only log (reference
    dashboard.py:105-118 current-stock CTE): one row per key, the first
    under ``order_cols`` (pass descending columns for 'latest'; include a
    unique tie-breaker for determinism). THE shared W1 shape —
    i_latest_state_view (batch), the stateful stock-poll stream's final
    fold, and their equality tests all call this one definition.

    Scale shape: single hash-partition-by-key + partition-local sort; with
    the log bucketed by the key the exchange disappears. At extreme key
    cardinality prefer the max_by aggregate form (no full sort), but the
    window form keeps every payload column without a struct repack."""
    w = W.partitionBy(*keys).orderBy(*order_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    tie_col: str | None = None,
    right_prefix: str = "r_",
    tolerance_secs: int | None = None,
) -> DataFrame:
    """For each left row, attach the single right row with the greatest
    ``right_ts <= left_ts`` (direction="backward", inclusive) or the
    smallest ``right_ts >= left_ts`` ("forward") within the same ``on``
    keys. Always left-outer: unmatched left rows keep null right columns.

    ``tie_col`` names a right column that breaks equal-timestamp ties
    deterministically (the max ``tie_col`` row wins); required for a
    deterministic result if (on, right_ts) is not unique in ``right``.
    ``tolerance_secs`` nulls out matches further than that many seconds
    from the left timestamp.

    All right columns except the keys come back prefixed with
    ``right_prefix``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = list(on)
    l_payload = [c for c in left.columns if c not in keys and c != left_ts]
    r_payload = [c for c in right.columns if c not in keys]
    overlap = {right_prefix + c for c in r_payload} & set(keys + l_payload)
    if overlap:
        raise ValueError(f"prefixed right columns collide with left: {sorted(overlap)}")

    r_types = {c: right.schema[c].dataType for c in r_payload}
    l_types = {c: left.schema[c].dataType for c in l_payload}
    tie_type = right.schema[tie_col].dataType if tie_col else None

    def null_as(dt, name: str) -> Column:
        return F.lit(None).cast(dt).alias(name)

    # The right payload travels as ONE struct, not independent columns: a
    # per-column last(ignorenulls) would back-fill a NULL field of the
    # matched row from an OLDER right row, stitching together a "row" that
    # never existed. Carrying the struct keeps the attached row atomic,
    # genuine NULL fields included.
    r_struct_type = T.StructType(
        [T.StructField(right_prefix + c, r_types[c]) for c in r_payload]
    )
    lt = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in l_payload],
        null_as(r_struct_type, "__r"),
        *([null_as(tie_type, "__tie")] if tie_col else []),
    )
    # a right row with a NULL event time can never be "most recent at/
    # before" (or "next after") anything — drop it, or the backward scan's
    # NULLS FIRST ordering would carry it as a universal fallback match
    rt = right.filter(F.col(right_ts).isNotNull()).select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[null_as(l_types[c], c) for c in l_payload],
        F.struct(*[F.col(c).alias(right_prefix + c) for c in r_payload]).alias("__r"),
        *([F.col(tie_col).alias("__tie")] if tie_col else []),
    )
    u = lt.unionByName(rt)

    # Backward: scan keys in ts order; at equal ts the right row (side 0)
    # precedes the left row so the inclusive match is visible; among equal
    # (ts, side) right rows the max tie_col is scanned last and wins.
    # Forward mirrors the scan (ts desc), same tie rules.
    ts_order = F.asc("__ts") if direction == "backward" else F.desc("__ts")
    order = [ts_order, F.asc("__side")] + ([F.asc("__tie")] if tie_col else [])
    w = W.partitionBy(*keys).orderBy(*order).rowsBetween(W.unboundedPreceding, W.currentRow)

    out = (
        u.select(
            *keys,
            "__ts",
            "__side",
            *l_payload,
            F.last("__r", ignorenulls=True).over(w).alias("__r"),
        )
        .filter(F.col("__side") == 1)
        .select(
            *keys,
            "__ts",
            *l_payload,
            *[F.col(f"__r.{right_prefix}{c}").alias(right_prefix + c) for c in r_payload],
        )
        .withColumnRenamed("__ts", left_ts)
    )

    if tolerance_secs is not None:
        matched_ts = F.col(right_prefix + right_ts)
        # microsecond arithmetic: cast('long') truncates to whole seconds,
        # which mis-classifies matches within a second of the cutoff
        gap_us = F.abs(F.unix_micros(F.col(left_ts)) - F.unix_micros(matched_ts))
        keep = matched_ts.isNotNull() & (
            gap_us <= F.lit(int(tolerance_secs) * 1_000_000)
        )
        out = out.select(
            *keys,
            left_ts,
            *l_payload,
            *[
                F.when(keep, F.col(right_prefix + c)).alias(right_prefix + c)
                for c in r_payload
            ],
        )
    return out


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    on: list[str] | None = None,
    bin_secs: int | None = None,
) -> DataFrame:
    """Inner-join each point row to every interval row whose half-open
    window ``[start_col, end_col)`` contains ``point_ts``.

    With equi keys (``on``) this is a plain join — Catalyst plans a
    sort-merge on the keys and applies the range predicate as a residual
    filter, so each side shuffles exactly once. Without keys, ``bin_secs``
    is required and the join is discretized: equi-join on the time bin,
    then the exact containment filter. Each (point, interval) pair meets in
    exactly one bin (the point's), so no dedup pass is needed.
    """
    containment = (F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) < F.col(end_col))
    if on:
        return points.join(intervals, list(on), "inner").filter(containment)

    if bin_secs is None:
        raise ValueError("keyless interval_join requires bin_secs")
    p = points.withColumn("__bin", F.floor(F.col(point_ts).cast("long") / bin_secs))
    # cover [start, end] bins inclusive; the containment filter drops the
    # (at most one) spurious edge bin when end sits exactly on a boundary
    i = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col).cast("long") / bin_secs),
                F.floor(F.col(end_col).cast("long") / bin_secs),
            )
        ),
    )
    return p.join(i, "__bin", "inner").filter(containment).drop("__bin")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    on: list[str] | None = None,
    bin_secs: int | None = None,
) -> DataFrame:
    """Inner-join interval rows whose half-open windows overlap:
    ``[l_start, l_end) ∩ [r_start, r_end) != ∅`` (i.e. l_start < r_end AND
    r_start < l_end) — the interval x interval complement of
    :func:`interval_join`'s point-in-interval.

    With equi keys the range test is a residual on a single sort-merge
    shuffle. Keyless, both sides replicate into ``bin_secs`` time bins
    covering their span and equi-join on the bin; a pair can now meet in
    SEVERAL shared bins, so instead of a dedup shuffle each pair is kept
    only in its canonical FIRST overlapping bin — the bin of
    max(l_start, r_start), which both sides' ranges provably cover for
    any truly overlapping pair. Replication factor is span/bin_secs per
    row: pick bins near the typical interval length.
    """
    overlap = (F.col(l_start) < F.col(r_end)) & (F.col(r_start) < F.col(l_end))
    if on:
        return left.join(right, list(on), "inner").filter(overlap)
    if bin_secs is None:
        raise ValueError("keyless interval_overlap_join requires bin_secs")

    def binned(df: DataFrame, s: str, e: str) -> DataFrame:
        return df.withColumn(
            "__bin",
            F.explode(
                F.sequence(
                    F.floor(F.col(s).cast("long") / bin_secs),
                    F.floor(F.col(e).cast("long") / bin_secs),
                )
            ),
        )
    first_bin = F.floor(
        F.greatest(F.col(l_start), F.col(r_start)).cast("long") / bin_secs
    )
    return (
        binned(left, l_start, l_end)
        .join(binned(right, r_start, r_end), "__bin", "inner")
        .filter(overlap)
        .filter(F.col("__bin") == first_bin)
        .drop("__bin")
    )


def ewma_by_key(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    alpha: float = 0.3,
    out_col: str = "ewma",
    tie_col: str | None = None,
) -> DataFrame:
    """Per-key exponentially weighted moving average in event order —
    the smoothing step behind anomaly baselines and trend charts.

    EWMA is a true recursion (y_t = a*x_t + (1-a)*y_{t-1}) that SQL
    window frames cannot express (the power-weight identity overflows
    numerically for long series), so this is the canonical
    ``groupBy().applyInPandas`` shape: each key's rows arrive as ONE
    pandas DataFrame, sorted locally inside the worker (Spark guarantees
    group colocation, not order), recursed vectorized, and returned with
    the same cardinality. State is one group in memory at a time — fine
    whenever a single key's history fits an executor (the same contract
    as any per-key pandas op); for million-row keys, chunk by time range
    first. Rounded to 6dp so the result is comparable across runs and
    engines.

    Determinism caveat: EWMA is order-defined, so the result is
    reproducible only if (key, order_col) is unique per group — pass
    ``tie_col`` (a unique column) when it is not, or equal-``order_col``
    rows recurse in partition-arrival order, which varies across runs.
    """
    import pandas as pd

    sort_cols = [order_col] + ([tie_col] if tie_col else [])
    sel_cols = [*key_cols, order_col, value_col] + (
        [tie_col] if tie_col and tie_col not in (*key_cols, order_col, value_col) else []
    )
    out_fields = df.select(*sel_cols).schema.fieldNames()
    schema_src = df.select(*sel_cols).schema
    out_schema = schema_src.add(out_col, "double")

    def one_group(pdf: pd.DataFrame) -> pd.DataFrame:
        # stable mergesort: equal-order rows keep a consistent relative
        # order within one run (cross-run determinism still needs tie_col)
        pdf = pdf.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
        pdf[out_col] = (
            pdf[value_col].ewm(alpha=alpha, adjust=False).mean().round(6)
        )
        return pdf

    return (
        df.select(*out_fields)
        .groupBy(*key_cols)
        .applyInPandas(one_group, schema=out_schema)
    )


def holt_by_key(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    alpha: float = 0.5,
    beta: float = 0.3,
) -> DataFrame:
    """Per-key Holt double-exponential smoothing (level + trend) in event
    order — the forecasting-grade upgrade of ewma_by_key: EWMA tracks a
    level but lags any sustained ramp; Holt carries an explicit trend
    state (l_t = a·x_t + (1-a)(l_{t-1}+b_{t-1});
    b_t = β(l_t − l_{t-1}) + (1-β)b_{t-1}) so the one-step-ahead forecast
    (l + b) stays on a moving series. Initialization: l_1 = x_1,
    b_1 = x_2 − x_1 (standard), single-point series get trend 0.

    Same applyInPandas contract and caveats as ewma_by_key (one group in
    worker memory, order defined by order_col which must be unique per
    key). The coupled two-state recursion is not expressible as a SQL
    window frame OR a single list fold with scalar state, so this stays
    a rows-only operator: tests pin numpy-reference equality,
    repartition invariance, and the constant/linear-series fixed points.
    Outputs level, trend, and the one-step forecast, 6dp-rounded."""
    import numpy as np
    import pandas as pd

    sel_cols = [*key_cols, order_col, value_col]
    out_schema = (
        df.select(*sel_cols)
        .schema.add("level", "double")
        .add("trend", "double")
        .add("forecast_next", "double")
    )

    def one_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([order_col], kind="mergesort").reset_index(drop=True)
        x = pdf[value_col].to_numpy(dtype=np.float64)
        n = len(x)
        lvl = np.empty(n)
        trd = np.empty(n)
        lvl[0] = x[0]
        trd[0] = (x[1] - x[0]) if n > 1 else 0.0
        for t in range(1, n):
            prev_l, prev_b = lvl[t - 1], trd[t - 1]
            lvl[t] = alpha * x[t] + (1.0 - alpha) * (prev_l + prev_b)
            trd[t] = beta * (lvl[t] - prev_l) + (1.0 - beta) * prev_b
        pdf["level"] = np.round(lvl, 6)
        pdf["trend"] = np.round(trd, 6)
        pdf["forecast_next"] = np.round(lvl + trd, 6)
        return pdf

    return (
        df.select(*sel_cols)
        .groupBy(*key_cols)
        .applyInPandas(one_group, schema=out_schema)
    )
