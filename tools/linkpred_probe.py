"""Stage-attributed link-prediction scale probe (r11 ledger closure).

Separates g_link_prediction's cap-independent EDGE BUILD (distinct
co-purchase pair shuffle over lineitem) from the capped wedge/score TAIL
that `max_center_degree` bounds — the decomposition behind
``SCALE_sf100.json: r11_linkpred_attribution_note``:

- ``stats`` mode prints the co-purchase graph's invariants (edge count,
  node count, degree profile, centers under a cap). On the chained-
  inflater decades the graph is byte-identical at every scale (the
  inflater clones basket part-sets verbatim), which is why the capped
  tail cannot grow across decades on this fixture.
- ``tail`` mode times the full query once cold (edge build + tail), then
  the tail alone over the operator's own warmed scoped cache, min-of-N,
  for cap=64 (the query's contract) and cap=8 (the VERDICT r10 item-6
  variant — vacuous here: zero nodes have degree <= 8).

Probe-harness note, learned the hard way: do NOT persist the probe's own
edge frame. The operator's internal ``scoped_persist`` of its alias-only
canonical edge select canonicalizes to the SAME plan, so Spark's cache
manager shares one entry between the two handles and the operator's
scope release drops the probe's cache too (observed as the "warm" count
silently re-running the 13 s edge build). Warming the operator's own
cache sidesteps the collision; the production query persists nothing
external, so this is a harness artifact, not an operator bug.

Usage:
    python tools/linkpred_probe.py stats SF_DIR [SF_DIR ...]
    python tools/linkpred_probe.py tail SF_DIR [--reps N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _steal() -> int:
    try:
        with open("/proc/stat") as fh:
            return int(fh.readline().split()[8])
    except (OSError, IndexError, ValueError):
        return 0


def _edges(spark, sf_dir: str):
    # Delegate to the shipped edge builder (r11: basket-array explode, 2
    # Exchange / 0 Join) so the probe always measures the production kernel.
    from boxoffice_spark.queries.graph import _copurchase_edges

    return _copurchase_edges(spark, sf_dir)


def main() -> None:
    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    mode = sys.argv[1]
    dirs = [a for a in sys.argv[2:] if not a.startswith("--")]
    reps = 3
    for a in sys.argv[2:]:
        if a.startswith("--reps"):
            reps = int(a.split("=", 1)[1])

    from pyspark.sql import functions as F

    from boxoffice_spark.session import get_spark

    spark = get_spark("linkpred_probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    if mode == "stats":
        for sf_dir in dirs:
            e = _edges(spark, sf_dir)
            deg = (
                e.select(F.col("u").alias("n"))
                .unionAll(e.select(F.col("v").alias("n")))
                .groupBy("n")
                .count()
            )
            row = deg.agg(
                F.count("*").alias("nodes"),
                F.max("count").alias("max_deg"),
                F.expr("percentile_approx(count, 0.5)").alias("med_deg"),
                F.sum(F.when(F.col("count") <= 64, 1).otherwise(0)).alias("centers_cap64"),
                F.sum(F.when(F.col("count") <= 8, 1).otherwise(0)).alias("centers_cap8"),
            ).first()
            print(sf_dir, "n_edges", e.count(), dict(row.asDict()), flush=True)
    elif mode == "tail":
        from boxoffice_spark.operators.graph import link_prediction_scores

        (sf_dir,) = dirs
        edges = _edges(spark, sf_dir)
        s0, t0 = _steal(), time.perf_counter()
        link_prediction_scores(edges, "u", "v", max_center_degree=64, k=30).write.format(
            "noop"
        ).mode("overwrite").save()
        print(
            f"COLD_FULL (edge build + tail, cap=64): {time.perf_counter() - t0:.3f}s"
            f" steal+{_steal() - s0}",
            flush=True,
        )
        for cap in (64, 8):
            runs = []
            for i in range(reps):
                s0, t0 = _steal(), time.perf_counter()
                link_prediction_scores(
                    edges, "u", "v", max_center_degree=cap, k=30
                ).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                runs.append(dt)
                print(f"# cap={cap} run{i}: {dt:.3f}s steal+{_steal() - s0}", flush=True)
            print(f"TAIL dir={sf_dir} cap={cap} warm={min(runs):.3f}", flush=True)
    else:
        raise SystemExit(f"unknown mode {mode!r} (use: stats | tail)")
    spark.stop()


if __name__ == "__main__":
    main()
