"""Round-9 single-construct canary queries (VERDICT r08 task 2).

TEMPORARY — registered for round 9 only and removed in round 10.

Two queries have been driver hash-red for two consecutive rounds while
bit-exact against the sandbox's duckdb build (`t_span_corruption`,
`v_int8_quantization_report`). Whole-query fixes failed twice, so this
round decomposes each into single-aspect variants: every pinned query is
one bit of driver feedback, and the r09 red/green pattern localizes the
divergent construct instead of a third round of guessing.

Span-corruption suspects, one canary each (all share the real query's
tokenize + md5 coin up to the aspect under test):
  c9_span_mask_counts  tokenize positions + md5 coin, integer counts only
                       (no windows, no strings).
  c9_span_sentinels    + lag/run-sum windows, span ids with the window sum
                       explicitly CAST to BIGINT on the oracle side (kills
                       the DuckDB HUGEINT-typing suspect), sentinel concat,
                       start/len — no span_text.
  c9_span_text         + string_agg(token ORDER BY pos) — the one aspect
                       c9_span_sentinels omits.
Decision table: mask_counts red -> tokenization/coin diverges; sentinels
red (mask_counts green) -> window/HUGEINT/concat; span_text red alone ->
string_agg assembly; all three green but t_span_corruption red -> the
divergence is in the composition (un-cast window sum typing).

Int8-quantization: the real query was converted this round to exact
integer units via pure double arithmetic (floor(err^2*1e12 + 0.5) — no
decimal grid anywhere); the canary keeps the OLD decimal-cast cells:
  c9_int8_decimal_cells  per-cell DECIMAL(27,12)/(27,8) casts of double
                         error terms + the indexed list_transform oracle,
                         verbatim from the r08 red form.
Decision: real green + canary red confirms double->decimal-grid rounding
as the construct (the dec6 0-for-6 pattern); both green means the r08 red
was the lambda after all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from boxoffice_spark.operators import dedup as D
from boxoffice_spark.queries.text_pipeline import _md5_mod100_sql, _NORM
from boxoffice_spark.registry import register
from boxoffice_spark.tables import table

# --- shared span-pipeline fragments (mirrors queries/text_pipeline.py's
# t_span_corruption exactly; reference semantics cited there) -------------

_TOKS_SQL = f"""
    toks AS (
        SELECT doc_id, tok AS token, i - 1 AS pos
        FROM (
            SELECT doc_id, unnest(lst) AS tok,
                generate_subscripts(lst, 1) AS i
            FROM (SELECT doc_id, string_split({_NORM}, ' ') AS lst
                  FROM documents)
        )
        WHERE tok <> ''
    ),
    hashed AS (
        SELECT doc_id, token, pos,
            md5(CAST(doc_id AS VARCHAR) || ':' || CAST(pos AS VARCHAR)) AS h
        FROM toks
    ),
    marked AS (
        SELECT doc_id, token, pos, {_md5_mod100_sql('h')} < 15 AS masked
        FROM hashed
    )
"""

_SPANS_SQL = """
    spans0 AS (
        SELECT doc_id, token, pos, masked,
            CASE WHEN masked AND NOT coalesce(
                lag(masked) OVER (PARTITION BY doc_id ORDER BY pos), FALSE)
            THEN 1 ELSE 0 END AS span_start
        FROM marked
    ),
    spans AS (
        SELECT doc_id, token, pos,
            CAST(sum(span_start) OVER (PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1
                AS BIGINT) AS span_id
        FROM spans0 WHERE masked
    )
"""


def _marked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of the toks+marked CTEs (== t_span_corruption's head)."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.posexplode(F.split(D.normalized_text("text"), " ")).alias(
            "pos", "token"
        ),
    ).filter(F.col("token") != "")
    masked = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("doc_id"), F.col("pos"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        % 100
        < 15
    )
    return toks.select("doc_id", "token", "pos", masked.alias("masked"))


def _spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of the spans CTE: masked rows labeled with span_id."""
    wlag = Window.partitionBy("doc_id").orderBy("pos")
    wrun = wlag.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spans0 = _marked(spark, sf_dir).select(
        "doc_id",
        "token",
        "pos",
        "masked",
        F.when(
            F.col("masked")
            & ~F.coalesce(F.lag("masked").over(wlag), F.lit(False)),
            1,
        )
        .otherwise(0)
        .alias("span_start"),
    )
    return spans0.filter(F.col("masked")).select(
        "doc_id",
        "token",
        "pos",
        (F.sum("span_start").over(wrun) - 1).cast("long").alias("span_id"),
    )


@register(
    "c9_span_mask_counts",
    oracle=f"""
    WITH {_TOKS_SQL}
    SELECT doc_id, count(*) AS n_tokens,
        CAST(sum(CASE WHEN masked THEN 1 ELSE 0 END) AS BIGINT) AS n_masked
    FROM marked
    GROUP BY 1
    ORDER BY doc_id
    """,
    tags=("canary", "r09"),
)
def c9_span_mask_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CANARY (r09, temporary): t_span_corruption's tokenize + md5 mask
    coin, reduced to integer counts per document — no windows, no string
    assembly. Red here means the divergence is upstream of the span
    machinery (string_split/posexplode position semantics or the
    md5-mod-100 coin)."""
    return (
        _marked(spark, sf_dir)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.when(F.col("masked"), 1).otherwise(0))
            .cast("long")
            .alias("n_masked"),
        )
        .orderBy("doc_id")
    )


@register(
    "c9_span_sentinels",
    oracle=f"""
    WITH {_TOKS_SQL},
    {_SPANS_SQL}
    SELECT doc_id, span_id,
        '<extra_id_' || span_id || '>' AS sentinel,
        min(pos) AS start_pos, count(*) AS span_len
    FROM spans
    GROUP BY 1, 2
    ORDER BY doc_id, span_id
    """,
    tags=("canary", "r09"),
)
def c9_span_sentinels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CANARY (r09, temporary): the full span pipeline through span ids,
    sentinels, start, and length — with the oracle's window sum explicitly
    CAST to BIGINT (so DuckDB's HUGEINT window-sum typing cannot be the
    divergence) and NO span_text. Red here (with c9_span_mask_counts
    green) means the lag/run-sum windows or the sentinel concat."""
    return (
        _spans(spark, sf_dir)
        .groupBy("doc_id", "span_id")
        .agg(
            F.min("pos").cast("long").alias("start_pos"),
            F.count("*").alias("span_len"),
        )
        .select(
            "doc_id",
            "span_id",
            F.concat(
                F.lit("<extra_id_"), F.col("span_id").cast("string"), F.lit(">")
            ).alias("sentinel"),
            "start_pos",
            "span_len",
        )
        .orderBy("doc_id", "span_id")
    )


@register(
    "c9_span_text",
    oracle=f"""
    WITH {_TOKS_SQL},
    {_SPANS_SQL}
    SELECT doc_id, span_id,
        string_agg(token, ' ' ORDER BY pos) AS span_text
    FROM spans
    GROUP BY 1, 2
    ORDER BY doc_id, span_id
    """,
    tags=("canary", "r09"),
)
def c9_span_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CANARY (r09, temporary): span text assembly alone —
    string_agg(token, ' ' ORDER BY pos) against Spark's sorted-struct
    array_join, the one aspect c9_span_sentinels omits."""
    return (
        _spans(spark, sf_dir)
        .groupBy("doc_id", "span_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "token"))),
                    lambda s: s.token,
                ),
                " ",
            ).alias("span_text")
        )
        .orderBy("doc_id", "span_id")
    )


@register(
    "c9_int8_decimal_cells",
    oracle="""
    WITH ex AS (
        SELECT label, p.dim AS dim, CAST(p.val AS DOUBLE) AS val
        FROM (
            SELECT label,
                   unnest(list_transform(generate_series(1, len(embedding)),
                          i -> {'dim': i, 'val': embedding[i]})) AS p
            FROM embeddings
        )
    ),
    rng AS (
        SELECT dim, min(val) AS lo, max(val) AS hi
        FROM ex GROUP BY 1
    ),
    q AS (
        SELECT ex.label, ex.val,
            CASE WHEN rng.hi > rng.lo THEN
                rng.lo + least(255, greatest(0,
                    floor((ex.val - rng.lo) * 255.0 / (rng.hi - rng.lo))))
                * (rng.hi - rng.lo) / 255.0
            ELSE ex.val END AS deq
        FROM ex JOIN rng ON rng.dim = ex.dim
    )
    SELECT label, count(*) AS n_values,
        cast(sum(cast((val - deq) * (val - deq)
                      as decimal(27,12))) as double) / count(*) AS mse,
        CAST(max(abs(val - deq)) AS DECIMAL(27, 8)) AS max_abs_err
    FROM q
    GROUP BY 1
    ORDER BY 1
    """,
    tags=("canary", "r09"),
)
def c9_int8_decimal_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CANARY (r09, temporary): v_int8_quantization_report's r08 red form,
    verbatim — per-cell DECIMAL(27,12) casts of double squared errors, a
    DECIMAL(27,8) max cell, and the indexed list_transform oracle. The
    real query now uses floor-based integer units and raw doubles; this
    pin isolates whether the decimal-grid casts (the dec6 0-for-6 class)
    or the lambda were the r08 divergence."""
    emb = table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "dim0", "val"
        ),
    ).select("label", (F.col("dim0") + 1).alias("dim"), "val")
    rng = ex.groupBy("dim").agg(F.min("val").alias("lo"), F.max("val").alias("hi"))
    span = F.col("hi") - F.col("lo")
    code = F.least(
        F.lit(255),
        F.greatest(
            F.lit(0), F.floor((F.col("val") - F.col("lo")) * 255.0 / span)
        ),
    )
    deq = F.when(
        F.col("hi") > F.col("lo"), F.col("lo") + code * span / 255.0
    ).otherwise(F.col("val"))
    q = ex.join(F.broadcast(rng), "dim").select("label", "val", deq.alias("deq"))
    err = F.col("val") - F.col("deq")
    return (
        q.groupBy("label")
        .agg(
            F.count("*").alias("n_values"),
            (
                F.sum((err * err).cast("decimal(27,12)")).cast("double")
                / F.count("*")
            ).alias("mse"),
            F.max(F.abs(err)).cast("decimal(27,8)").alias("max_abs_err"),
        )
        .orderBy("label")
    )
