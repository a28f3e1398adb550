"""Local replica of the driver's correctness gate.

Runs a registered query's Spark form and its DuckDB oracle over the same
parquet, then compares row count, column names, and sorted cell values.
Stricter than any sane hasher: non-float cells must match exactly, float
cells bit-for-bit (our aggregates are decimal-summed so this is achievable);
a tiny epsilon is reported separately so near-misses are visible.
"""

from __future__ import annotations

import datetime as _dt
import math
from dataclasses import dataclass, field

import duckdb

from boxoffice_spark.tables import TABLE_NAMES


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    issues: list[str] = field(default_factory=list)

    def __str__(self) -> str:
        status = "OK" if self.ok else "MISMATCH"
        extra = ("\n  " + "\n  ".join(self.issues)) if self.issues else ""
        return f"[{status}] {self.name}: spark={self.spark_rows} oracle={self.oracle_rows}{extra}"


def engine_fingerprint() -> dict[str, str]:
    """Engine build versions (VERDICT r07 task 3). Every comparison
    artifact should carry these: the round-7 hash reds were a
    local-vs-driver ENGINE BUILD divergence, undiagnosable because no
    artifact recorded which builds produced it."""
    import pyspark

    return {"pyspark": pyspark.__version__, "duckdb": duckdb.__version__}


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Connection with every fixture table registered as a view (the driver
    pre-registers the same names)."""
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if isinstance(v, _dt.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds"))
    if isinstance(v, _dt.date):
        return ("d", v.isoformat())
    if isinstance(v, float):
        return ("f", v)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if v is None:
        return ("n",)
    if isinstance(v, (list, tuple)):
        return ("a", tuple(_norm_cell(x) for x in v))
    try:  # Decimal and friends
        import decimal

        if isinstance(v, decimal.Decimal):
            return ("f", float(v))
    except Exception:
        pass
    return ("s", str(v))


def _sort_key(row):
    out = []
    for cell in row:
        out.append(repr(cell))
    return tuple(out)


def compare(name: str, spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> CompareResult:
    s_cols = sorted(spark_df.columns)
    s_rows = [tuple(r[c] for c in s_cols) for r in spark_df.collect()]

    rel = con.sql(sql)
    o_cols_raw = list(rel.columns)
    o_order = sorted(range(len(o_cols_raw)), key=lambda i: o_cols_raw[i])
    o_cols = [o_cols_raw[i] for i in o_order]
    o_rows = [tuple(row[i] for i in o_order) for row in rel.fetchall()]

    issues: list[str] = []
    if s_cols != o_cols:
        issues.append(f"column mismatch: spark={s_cols} oracle={o_cols}")
    if len(s_rows) != len(o_rows):
        issues.append(f"row count: spark={len(s_rows)} oracle={len(o_rows)}")

    if not issues:
        sn = sorted(([_norm_cell(c) for c in r] for r in s_rows), key=_sort_key)
        on = sorted(([_norm_cell(c) for c in r] for r in o_rows), key=_sort_key)
        n_diff = 0
        for i, (a, b) in enumerate(zip(sn, on)):
            if a != b:
                # distinguish float-epsilon noise from real mismatch
                close = len(a) == len(b) and all(
                    (
                        x == y
                        or (
                            x[0] == "f"
                            and y[0] == "f"
                            and (
                                (math.isnan(x[1]) and math.isnan(y[1]))
                                or math.isclose(x[1], y[1], rel_tol=1e-9, abs_tol=1e-9)
                            )
                        )
                    )
                    for x, y in zip(a, b)
                )
                n_diff += 1
                if len(issues) < 5:
                    kind = "float-eps" if close else "VALUE"
                    issues.append(f"{kind} diff at sorted-row {i}: spark={a} oracle={b}")
        if n_diff:
            issues.append(f"total differing rows: {n_diff}/{len(sn)}")

    return CompareResult(name, not issues, len(s_rows), len(o_rows), issues)
