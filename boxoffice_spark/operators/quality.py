"""Declarative data-quality constraint checking (the validation stage of a
training-data pipeline; generalizes the reference's scattered ad-hoc guards:
dropna on dates kobisdata_extractor.py:137-138, NaN scrubbing
supabase_connector.py:42-43, empty-page checks kobisdata_extractor.py:63-66).

``check_constraints`` evaluates every rule in ONE pass over the data (a
single aggregate of conditional counts — no per-rule scans), returning one
row per rule: (rule, n_violations, n_rows, pass). At 100 TB this is the
difference between a constraint suite that costs one scan and one that
costs |rules| scans.

Uniqueness is the exception — it needs its own groupBy shuffle — and is
provided separately (``check_unique``) so the cheap single-pass suite stays
single-pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def check_constraints(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Evaluate named boolean rules (True = row passes) in one aggregate
    pass. Null rule results count as violations (SQL three-valued logic
    would otherwise let null-valued rows pass silently). Rule names are
    arbitrary strings — they are backtick/quote-escaped into the unpivot,
    so 'non-empty text' or names with quotes work; the internal row-count
    column uses a collision-proof name."""
    if not rules:
        raise ValueError("check_constraints: at least one rule is required")
    aggs = []
    for name, cond in rules.items():
        bad = F.sum(F.when(F.coalesce(cond, F.lit(False)), 0).otherwise(1))
        aggs.append(bad.cast("long").alias(name))
    total = "__check_constraints_n__"
    counted = df.agg(F.count(F.lit(1)).alias(total), *aggs)

    def _lit(s: str) -> str:  # SQL string literal
        return "'" + s.replace("'", "''") + "'"

    def _ident(s: str) -> str:  # backticked identifier
        return "`" + s.replace("`", "``") + "`"

    # one row per rule via stack (unpivot) — still a single scan
    pairs = ", ".join(f"{_lit(name)}, {_ident(name)}" for name in rules)
    return counted.selectExpr(
        _ident(total), f"stack({len(rules)}, {pairs}) AS (rule, n_violations)"
    ).select(
        "rule",
        "n_violations",
        F.col(total).alias("n_rows"),
        (F.col("n_violations") == 0).alias("pass"),
    )


def check_unique(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Key-uniqueness audit: one row per duplicated key with its multiplicity
    (empty result = constraint holds). Shuffles once on the key."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n_copies"))
        .filter(F.col("n_copies") > 1)
    )


def quality_classifier_score(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    labels: DataFrame,
    train_size: int = 2048,
    seed_salt: str = "qc",
    iters: int = 300,
    lr: float = 1.0,
    threshold: float = 0.5,
) -> DataFrame:
    """Weak-supervision quality classifier — the fastText/CCNet pattern:
    an EXPENSIVE signal (LM perplexity, a teacher model, human ratings)
    labels a bounded sample, a tiny logistic regression is fit to mimic
    it over CHEAP codegen features, and the whole corpus is then scored
    by the cheap model — pure Catalyst expressions with literal weights,
    so the 100 TB scoring pass is scan-bound whole-stage codegen with no
    Python and no model server in the hot path.

    Mechanics: features are length/stopword/punctuation/vocabulary-
    diversity expressions (operators/textstats.py); the training sample
    is the salted-content-hash prefix of the labeled set (uniform over
    the corpus, deterministic under retries AND partitioning — the same
    sampling contract as the ANN quantizer fits); standardization stats
    and gradient-descent weights are computed driver-side with numpy
    (fixed iteration count, zero-init — bit-deterministic, no RNG) and
    baked back into the scoring expression as literals.

    Returns (id, quality_prob, keep) for EVERY input doc. ``labels``
    carries (id, label 0/1) for at least the sampled docs. Not SQL-
    expressible (the fit); properties pinned in tests: repartition
    invariance, [0,1] range, training-sample class separation, and a
    Python-free scoring plan.
    """
    import numpy as np

    from boxoffice_spark.operators import textstats as TS

    c = F.col(text_col)
    words = F.split(F.trim(F.regexp_replace(F.lower(c), r"\s+", " ")), " ")
    n_words = F.greatest(F.size(words), F.lit(1))
    feats: dict[str, Column] = {
        "f_logwords": F.log1p(F.size(words).cast("double")),
        "f_wordlen": F.length(c).cast("double") / n_words,
        "f_stopword": TS.stopword_ratio(c),
        "f_punct": TS.punct_ratio(c),
        "f_distinct": F.size(F.array_distinct(words)).cast("double") / n_words,
    }
    names = list(feats)

    sample = (
        # null/empty text yields all-NULL features: one such row in the
        # sample would NaN-poison mu/sd/weights and make EVERY corpus
        # score NaN (which Spark's NaN-is-largest ordering then KEEPS —
        # the gate failing open). Exclude it from the fit; scoring still
        # covers every doc.
        docs.filter(F.col(text_col).isNotNull() & (F.length(text_col) > 0))
        .join(labels, id_col)
        .select(
            F.col(id_col),
            F.col("label").cast("double").alias("_y"),
            *[expr.alias(n) for n, expr in feats.items()],
        )
        .orderBy(F.md5(F.concat(F.lit(seed_salt), F.col(id_col).cast("string"))), id_col)
        .limit(train_size)
        .collect()
    )
    if not sample:
        raise ValueError("quality_classifier_score: no labeled rows to fit on")
    X = np.array(
        [[r[n] for n in names] for r in sample], dtype=np.float64
    )
    y = np.array([r["_y"] for r in sample], dtype=np.float64)
    finite = np.isfinite(X).all(axis=1) & np.isfinite(y)
    X, y = X[finite], y[finite]
    if not len(y):
        raise ValueError("quality_classifier_score: no finite training rows")
    mu = X.mean(axis=0)
    sd = np.maximum(X.std(axis=0), 1e-9)
    Xs = (X - mu) / sd
    w = np.zeros(len(names) + 1)
    for _ in range(iters):
        z = Xs @ w[1:] + w[0]
        p = 1.0 / (1.0 + np.exp(-z))
        w[1:] -= lr * (Xs.T @ (p - y)) / len(y)
        w[0] -= lr * float((p - y).mean())

    z_expr: Column = F.lit(float(w[0]))
    for i, n in enumerate(names):
        z_expr = z_expr + F.lit(float(w[i + 1])) * (
            (feats[n] - F.lit(float(mu[i]))) / F.lit(float(sd[i]))
        )
    prob = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z_expr)), 6)
    return docs.select(
        F.col(id_col),
        prob.alias("quality_prob"),
        (prob >= F.lit(threshold)).alias("keep"),
    )
