"""Document deduplication operators (BASELINE.json north-star; seeded by
the reference's fuzzy-match J4 — movie_events_scraper.py:56-128 — which is
a 1-vs-N near-dup problem on titles).

Four tiers, weakest-to-strongest guarantee, cheapest-to-dearest at 100 TB:

1. ``exact_dedup``       — hash-groupBy on a normalized fingerprint. One
   shuffle on a 16-byte key. The only tier with *exact* semantics.
2. ``ngram_jaccard_pairs`` — blocked pairwise word-3-gram Jaccard. Exact
   similarity, but O(block²); keep blocks bounded (here: (lang, source)).
3. ``simhash`` — 60-bit locality-sensitive fingerprint; near-dups collide
   in Hamming space. One shuffle, constant per-doc output.
4. ``minhash_lsh_pairs`` — MinHash + banded LSH via Spark ML; sub-quadratic
   candidate generation, the scale path for corpus-level near-dup removal.

Tiers 1-3 are expressed in pure Catalyst expressions (oracle-checkable
bit-for-bit against DuckDB); tier 4 is approximate by construction
(rows-only check).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

SIMHASH_BITS = 60  # 15 hex chars of md5 -> fits signed int64 in both engines


def normalized_text(col: Column | str) -> Column:
    """Dedup normalization: lowercase, collapse whitespace, trim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


NORMALIZED_SQL = "trim(regexp_replace(lower({col}), '\\s+', ' ', 'g'))"


def word_ngrams(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles as an array (order-sensitive token windows —
    unigram sets don't discriminate on small vocabularies)."""
    c = F.col(col) if isinstance(col, str) else col
    return _word_ngrams_col(F.split(normalized_text(c), " "), n)


def _word_ngrams_col(words: Column, n: int) -> Column:
    idx = F.sequence(F.lit(1), F.greatest(F.size(words) - (n - 1), F.lit(0)))
    return F.transform(idx, lambda i: F.array_join(F.slice(words, i, n), " "))


WORD_NGRAMS_SQL = (
    "list_transform(generate_series(1, greatest(len(string_split({norm}, ' ')) - {nm1}, 0)), "
    "i -> array_to_string(list_slice(string_split({norm}, ' '), i, i + {nm1}), ' '))"
)


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Tier 1: exact duplicate groups by md5 of normalized text. Returns one
    row per distinct fingerprint: (fingerprint, keeper id = min id,
    n_copies). md5 (not xxhash64) so the fingerprint itself is
    oracle-comparable across engines."""
    fp = F.md5(normalized_text(text_col)).alias("fingerprint")
    return (
        df.select(fp, F.col(id_col))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("keeper_id"), F.count("*").alias("n_copies"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: list[str],
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Tier 2: pairwise word-n-gram Jaccard within blocks.

    Blocking bounds the quadratic term: at 100 TB, block on a cheap
    discriminator (language x source x length-bucket) so each block fits a
    partition; the self-join then shuffles each side once on the block key.
    """
    shingled = df.select(
        *[F.col(c) for c in block_cols],
        F.col(id_col),
        F.array_distinct(_word_ngrams_col(F.split(normalized_text(text_col), " "), n)).alias("_sh"),
    )
    a = shingled.alias("a")
    b = shingled.alias("b")
    cond = [F.col(f"a.{c}") == F.col(f"b.{c}") for c in block_cols] + [
        F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    ]
    inter = F.size(F.array_intersect(F.col("a._sh"), F.col("b._sh")))
    union = F.size(F.array_union(F.col("a._sh"), F.col("b._sh")))
    jac = inter.cast("double") / union
    return (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def _word_hash(word: Column) -> Column:
    """60-bit word hash shared with the DuckDB oracle: first 15 hex chars of
    md5, parsed base-16. (xxhash64 would be faster but engine-specific.)"""
    return F.conv(F.substring(F.md5(word), 1, 15), 16, 10).cast("long")


WORD_HASH_SQL = "CAST(('0x' || substring(md5({w}), 1, 15)) AS BIGINT)"


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = SIMHASH_BITS) -> DataFrame:
    """Tier 3: SimHash fingerprint (Charikar) over word hashes.

    Explode words -> per-bit signed vote -> majority -> reassemble. The
    per-bit votes are ``bits`` aggregate expressions over one exploded
    shuffle — all codegen, no Python. At true scale a Pandas-UDF map-side
    simhash (one pass, no explode) wins on shuffle volume; this form is the
    oracle-exact reference implementation.
    """
    words = df.select(
        F.col(id_col), F.explode(F.split(normalized_text(text_col), " ")).alias("_w")
    ).withColumn("_h", _word_hash(F.col("_w")))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("_h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"_v{j}")
        for j in range(bits)
    ]
    voted = words.groupBy(id_col).agg(*votes)
    sh = None
    for j in range(bits):
        bit = F.when(F.col(f"_v{j}") > 0, F.lit(1).cast("long") * (1 << j)).otherwise(0)
        sh = bit if sh is None else sh + bit
    return voted.select(F.col(id_col), sh.alias("simhash"))


def simhash_sql(table_expr: str, id_col: str, text_col: str, bits: int = SIMHASH_BITS) -> str:
    """DuckDB twin of :func:`simhash` (generated, kept in lockstep)."""
    norm = NORMALIZED_SQL.format(col=text_col)
    votes = ", ".join(
        f"sum(CASE WHEN (({WORD_HASH_SQL.format(w='_w')} >> {j}) & 1) = 1 THEN 1 ELSE -1 END) AS _v{j}"
        for j in range(bits)
    )
    recombine = " + ".join(f"(CASE WHEN _v{j} > 0 THEN (CAST(1 AS BIGINT) << {j}) ELSE 0 END)" for j in range(bits))
    return f"""
    WITH words AS (
        SELECT {id_col}, unnest(string_split({norm}, ' ')) AS _w FROM {table_expr}
    ),
    votes AS (
        SELECT {id_col}, {votes} FROM words GROUP BY {id_col}
    )
    SELECT {id_col}, CAST({recombine} AS BIGINT) AS simhash FROM votes
    """


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hash_tables: int = 8,
    threshold: float = 0.5,
    num_features: int = 1 << 18,
) -> DataFrame:
    """Tier 4: MinHash + banded LSH candidate pairs (Spark ML).

    shingle -> HashingTF (binary) -> MinHashLSH.approxSimilarityJoin.
    Sub-quadratic: only bucket-colliding pairs are compared, which is the
    only tier that survives corpus-scale all-pairs dedup. Approximate ->
    rows-only correctness check; the exact tiers above are its oracle on
    small data.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    shingled = df.select(
        F.col(id_col),
        F.array_distinct(_word_ngrams_col(F.split(normalized_text(text_col), " "), n)).alias("shingles"),
    ).filter(F.size("shingles") > 0)

    tf = HashingTF(inputCol="shingles", outputCol="features", numFeatures=num_features, binary=True)
    feat = tf.transform(shingled)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=42)
    model = lsh.fit(feat)
    pairs = model.approxSimilarityJoin(feat, feat, 1.0 - threshold, distCol="jaccard_dist")
    return (
        pairs.filter(F.col(f"datasetA.{id_col}") < F.col(f"datasetB.{id_col}"))
        .select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            (1.0 - F.col("jaccard_dist")).alias("jaccard_est"),
        )
    )
