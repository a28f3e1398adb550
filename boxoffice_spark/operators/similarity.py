"""Vector similarity search over embedding columns (BASELINE.json
north-star).

- ``cosine_topk``: exact brute-force top-k — cross join against a small
  broadcast query set, JVM-side dot products via zip_with/aggregate, window
  top-k. O(queries x corpus): correct baseline, and actually optimal when
  the query set is small enough to broadcast (the common retrieval-eval
  shape). The scan side streams; no shuffle until the (tiny) top-k window.
- ``ann_lsh_topk``: BucketedRandomProjectionLSH (random-hyperplane buckets)
  — the sub-linear path when queries x corpus stops fitting. Approximate ->
  rows-only check.

Embeddings are float32 at rest; both operators promote to double BEFORE any
arithmetic so results are reproducible and comparable across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns, JVM-side.

    zip_with multiplies pairwise; aggregate folds left-to-right — the same
    deterministic association order DuckDB's list_cosine_similarity uses,
    so values match to the last ulp on identical inputs.
    """
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))
    return dot / (na * nb)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector (self excluded).

    Returns (query_id, neighbor_id, cos_sim, rank). cos_sim is rounded for
    cross-engine float stability; rank ties break on neighbor_id.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("_qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("_cv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", F.round(cosine(F.col("_qv"), F.col("_cv")), round_to))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    bucket_length: float = 0.5,
    num_hash_tables: int = 4,
) -> DataFrame:
    """Approximate top-k neighbors via random-projection LSH buckets.

    Euclidean-bucket LSH; for unit-normalized embeddings Euclidean ranking
    equals cosine ranking (||a-b||² = 2 - 2·cos on the unit sphere), so we
    normalize before hashing. Sub-linear probing at corpus scale; rows-only
    correctness (the exact operator above is its small-scale oracle).
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH, Normalizer
    from pyspark.ml.functions import array_to_vector

    def prep(df: DataFrame, out_id: str) -> DataFrame:
        vec = array_to_vector(F.col(vec_col).cast("array<double>"))
        raw = df.select(F.col(id_col).alias(out_id), vec.alias("_raw"))
        return Normalizer(inputCol="_raw", outputCol="features", p=2.0).transform(raw).drop("_raw")

    c = prep(corpus, "neighbor_id")
    q = prep(queries, "query_id")
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=42,
    )
    model = lsh.fit(c)
    # approxSimilarityJoin over a distance ceiling, then exact top-k among
    # candidates (standard LSH probe-then-rerank)
    pairs = model.approxSimilarityJoin(q, c, 2.0, distCol="dist").filter(
        F.col("datasetA.query_id") != F.col("datasetB.neighbor_id")
    )
    w = W.partitionBy("datasetA.query_id").orderBy(F.asc("dist"), F.asc("datasetB.neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("datasetA.query_id").alias("query_id"),
            F.col("datasetB.neighbor_id").alias("neighbor_id"),
            F.col("dist").alias("l2_dist"),
            "rank",
        )
    )
