"""Scale-behavior probe: runs headline operator pipelines on 1x/4x/16x
inflations of the sf0.1 fixtures and reports wall time per scale, to show
the plans' growth curves empirically (near-linear for scan/agg/index
shapes) rather than by assertion.

Inflation preserves each operator's workload character without changing
its asymptotics class:
- lineitem copies shift l_orderkey (new fact rows, same dims/groups) —
  the flagship join+agg+window sees N x input, constant output.
- documents copies vowel-rotate the text per copy (distinct shingles per
  copy, so inverted-index postings grow linearly and pair output stays
  bounded — inflating with IDENTICAL text would measure the data's
  quadratic near-dup structure, not the engine).
- embeddings copies shift vec_id (N x corpus, same 5 probe queries).

Usage: python tools/scale_probe.py [sf_dir]   (default /root/testdata/sf0.1)
Prints one JSON line: {"probe": {...}} with seconds per (op, scale).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from boxoffice_spark.operators.dedup import exact_dedup, ngram_jaccard_pairs
    from boxoffice_spark.operators.similarity import cosine_topk_arrow
    from boxoffice_spark.queries.flagship import flagship_daily_topk_delta  # noqa: F401
    from boxoffice_spark.session import get_spark
    from boxoffice_spark.tables import table

    spark = get_spark("scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm JVM

    VOWELS = "aeiou"

    def inflate(df, n, key_col, key_span, text_col=None):
        parts = []
        for i in range(n):
            p = df.withColumn(key_col, F.col(key_col) + F.lit(i * key_span))
            if text_col is not None and i > 0:
                rot = VOWELS[i % 5:] + VOWELS[: i % 5]
                p = p.withColumn(text_col, F.translate(F.col(text_col), VOWELS, rot))
            parts.append(p)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def run(mk):
        runs = []
        for _ in range(2):  # run 1 pays codegen compile; run 2 is steady-state
            df = mk()
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        return round(min(runs), 3)

    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    docs = table(spark, sf_dir, "documents")
    emb = table(spark, sf_dir, "embeddings")

    def flagship_on(li_s):
        from pyspark.sql import Window as W

        from boxoffice_spark.functions.numeric import dsum

        daily = (
            li_s.join(F.broadcast(part), li_s.l_partkey == part.p_partkey)
            .groupBy(F.to_date("l_shipdate").alias("d"), F.col("p_brand").alias("b"))
            .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=4).alias("rev"))
        )
        w = W.partitionBy("d").orderBy(F.desc("rev"), F.asc("b"))
        return daily.withColumn("r", F.row_number().over(w)).filter(F.col("r") <= 10)

    results: dict[str, dict[str, float]] = {}
    for scale in (1, 4, 16):
        li_s = inflate(li, scale, "l_orderkey", 100_000_000)
        docs_s = inflate(docs, scale, "doc_id", 10_000_000, text_col="text")
        emb_s = inflate(emb, scale, "vec_id", 10_000_000)
        probes = emb.filter(F.col("vec_id") < 5)
        for name, mk in [
            ("flagship_join_agg_window", lambda: flagship_on(li_s)),
            ("exact_dedup", lambda: exact_dedup(docs_s, "text", "doc_id")),
            (
                "ngram_jaccard_pairs",
                lambda: ngram_jaccard_pairs(docs_s, "doc_id", "text", ["lang", "source"]),
            ),
            ("cosine_topk_arrow", lambda: cosine_topk_arrow(emb_s, probes, k=10)),
        ]:
            results.setdefault(name, {})[f"{scale}x"] = run(mk)
    print(json.dumps({"probe": results, "sf_dir": sf_dir}))
    spark.stop()


if __name__ == "__main__":
    main()
