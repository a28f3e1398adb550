"""Text analysis operators for training-data pipelines (BASELINE.json
north-star): language ID, quality scoring, token counting, fingerprinting.

Everything is pure Catalyst expressions — a 100 TB text pass stays inside
whole-stage codegen with zero Python in the hot path. Each helper has a SQL
twin (kept in lockstep) so the query layer can pair it with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from boxoffice_spark.operators.dedup import NORMALIZED_SQL, normalized_text

# Marker stopwords per language for the n-gram-heuristic language ID.
# Deliberately tiny and deterministic — the operator contract is the shape
# (score-per-language -> argmax with fixed tie order), not model quality.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "a", "is"],
    "de": ["der", "die", "das", "und", "ist"],
    "es": ["el", "la", "de", "y", "es"],
    "fr": ["le", "la", "les", "et", "est"],
    "zh": ["的", "是", "了", "在", "和"],
}
LANG_ORDER = ["en", "de", "es", "fr", "zh"]  # deterministic tie-break order


def words_of(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(normalized_text(c), " ")


WORDS_SQL = "string_split({norm}, ' ')"


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Distinct-marker-hit count per language."""
    w = F.array_distinct(words_of(col))
    return {
        lang: F.size(F.array_intersect(w, F.array(*[F.lit(m) for m in markers])))
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(col: Column | str) -> Column:
    """Argmax language with fixed tie order; 'und' when no marker hits."""
    scores = lang_scores(col)
    best = F.greatest(*scores.values())
    expr = F.when(best <= 0, "und")
    for lang in LANG_ORDER:
        expr = expr.when(scores[lang] == best, lang)
    return expr.otherwise("und")


def lang_id_sql(col: str) -> str:
    """DuckDB twin of :func:`lang_id`."""
    norm = NORMALIZED_SQL.format(col=col)
    w = f"list_distinct({WORDS_SQL.format(norm=norm)})"
    score = {
        lang: f"len(list_intersect({w}, {_sql_list(markers)}))"
        for lang, markers in LANG_MARKERS.items()
    }
    best = "greatest(" + ", ".join(score.values()) + ")"
    cases = " ".join(f"WHEN {score[lang]} = {best} THEN '{lang}'" for lang in LANG_ORDER)
    return f"CASE WHEN {best} <= 0 THEN 'und' {cases} ELSE 'und' END"


def _sql_list(items: list[str]) -> str:
    return "[" + ", ".join(f"'{i}'" for i in items) + "]"


def whitespace_token_count(col: Column | str) -> Column:
    """Token count, whitespace tokenization."""
    return F.size(words_of(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """BPE-ish token estimate: count of letter-runs, digit-runs, and
    single punctuation marks (the classic 'GPT-ish tokens ≈ word pieces'
    regex heuristic)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(r"[A-Za-z가-힣]+|[0-9]+|[^A-Za-z가-힣0-9\s]"))


BPEISH_SQL = "len(regexp_extract_all({col}, '[A-Za-z가-힣]+|[0-9]+|[^A-Za-z가-힣0-9\\s]'))"


def punct_ratio(col: Column | str) -> Column:
    """Punctuation chars / total chars (quality signal)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(r"[^A-Za-z가-힣0-9\s]")).cast("double") / F.greatest(
        F.length(c), F.lit(1)
    )


def stopword_ratio(col: Column | str, stopwords: list[str] | None = None) -> Column:
    """Stopword tokens / total tokens (English-marker default)."""
    sw = stopwords or LANG_MARKERS["en"]
    w = words_of(col)
    hits = F.size(F.filter(w, lambda x: x.isin(*sw)))
    return hits.cast("double") / F.greatest(F.size(w), F.lit(1))


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality score: length signal x (1 - punct ratio),
    rounded for cross-engine float stability. The shape of every
    'heuristic filter' stage in LLM-data pipelines: cheap, monotone,
    threshold-able."""
    c = F.col(col) if isinstance(col, str) else col
    len_signal = F.least(F.length(c).cast("double") / F.lit(500.0), F.lit(1.0))
    return F.round(len_signal * (1.0 - punct_ratio(c)), 6)


def fingerprint(col: Column | str) -> Column:
    """Content fingerprint: md5 of normalized text (engine-portable; the
    rolling-hash variant at scale would be xxhash64)."""
    return F.md5(normalized_text(col))
