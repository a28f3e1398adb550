"""Cross-engine parity of the rule-based final-cell helpers (parity rules
5-6, round 8): dec6/ratio6 (functions/numeric.py) and the digit-arithmetic
md5 SQL helpers must produce IDENTICAL cells in Spark and DuckDB — on the
adversarial inputs the round-7 driver reds were made of: exact dyadic 6dp
grid midpoints (j/2^7, j/(2^7*5)) where round(double, 6) implementations
legitimately disagree."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from boxoffice_spark.functions.numeric import (
    dec6,
    dec6_sql,
    ratio6,
    ratio6_sql,
)

# (num, den) integer ratios whose exact value sits ON a 6dp grid midpoint
# (reduced denominator 2^7 * 5^m) plus ordinary and boundary cases.
RATIOS = [
    (1, 128),  # 0.0078125 — exactly between 0.007812 and 0.007813
    (3, 128),
    (127, 128),
    (1, 640),  # 0.0015625 — 2^7 * 5 denominator, also a midpoint
    (7, 640),
    (1, 64),  # 0.015625 — ON the grid (6 decimals), not a midpoint
    (0, 7),
    (7, 7),
    (1, 3),
    (2, 3),
    (999999, 1000000),
    (1, 201),  # permutation-test p-value shape
    (123456, 789012),
]


def test_ratio6_matches_duckdb_on_midpoints(spark):
    rows = spark.createDataFrame(RATIOS, "num long, den long").select(
        "num", "den", ratio6("num", "den").alias("r")
    )
    got = {(r["num"], r["den"]): r["r"] for r in rows.collect()}
    con = duckdb.connect()
    for num, den in RATIOS:
        (want,) = con.sql(
            f"SELECT {ratio6_sql(str(num), str(den))}"
        ).fetchone()
        assert got[(num, den)] == want, (num, den, got[(num, den)], want)


def test_ratio6_is_half_up_exact():
    """The BIGINT formula IS HALF_UP: check against Python Fraction."""
    from fractions import Fraction

    for num, den in RATIOS:
        micro = (2 * num * 1_000_000 + den) // (2 * den)
        exact = Fraction(num, den) * 1_000_000
        # HALF_UP for nonnegative: floor(x + 1/2)
        assert micro == int(exact + Fraction(1, 2)) or (
            # floor(x+1/2) == int(x+1/2) for nonnegative values
            micro == (exact + Fraction(1, 2)).__floor__()
        )


def test_dec6_matches_duckdb(spark):
    vals = [0.0078125, -0.0078125, 0.015625, 1.0 / 3, -2.0 / 3, 123.4567891]
    rows = spark.createDataFrame(
        [(v,) for v in vals], "x double"
    ).select("x", dec6(F.col("x")).alias("d"))
    got = {round(r["x"], 10): r["d"] for r in rows.collect()}
    con = duckdb.connect()
    for v in vals:
        # CAST AS DOUBLE mirrors real usage: dec6 inputs are computed
        # double chains, not decimal literals (whose rescale path DuckDB
        # rounds half-even — a raw 0.0078125 literal would cast to
        # 0.007812, the double 0.0078125 casts to 0.007813)
        (want,) = con.sql(
            f"SELECT {dec6_sql(f'CAST({v!r} AS DOUBLE)')}"
        ).fetchone()
        assert got[round(v, 10)] == want, (v, got[round(v, 10)], want)


@pytest.mark.parametrize(
    "s", ["", "a", "42:7", "sk1:Customer#000000001", "pos:0", "çétüé"]
)
def test_md5_digit_arithmetic_matches_spark_conv(spark, s):
    """_md5_u60_sql / _md5_mod100_sql == Spark's conv(md5-prefix) exactly."""
    from boxoffice_spark.queries.etl import _md5_u60_sql
    from boxoffice_spark.queries.text_pipeline import _md5_mod100_sql

    row = (
        spark.createDataFrame([(s,)], "s string")
        .select(
            F.conv(F.substring(F.md5("s"), 1, 15), 16, 10)
            .cast("long")
            .alias("u60")
        )
        .collect()[0]
    )
    con = duckdb.connect()
    got_u60, got_mod = con.sql(
        "SELECT "
        + _md5_u60_sql("h")
        + ", "
        + _md5_mod100_sql("h")
        + f" FROM (SELECT md5(?) AS h)",
        params=[s],
    ).fetchone()
    assert got_u60 == row["u60"]
    assert got_mod == row["u60"] % 100


def test_round_half_up_kernel_matches_engines():
    """operators/similarity._round_half_up == Spark/DuckDB HALF_UP on the
    dyadic midpoints numpy's half-even breaks the other way."""
    import numpy as np

    from boxoffice_spark.operators.similarity import _round_half_up

    x = np.array([0.0078125, -0.0078125, 0.0234375, 0.5, -0.5, 0.1234564])
    got = _round_half_up(x, 6)
    want = np.array([0.007813, -0.007813, 0.023438, 0.5, -0.5, 0.123456])
    assert np.array_equal(got, want)
    # np.round disagrees on the midpoints — that's the defect this guards
    assert not np.array_equal(np.round(x, 6), want)
