"""Query registry.

Every operator from SURVEY.md §2 lands here as a named query: a PySpark
callable ``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) a
DuckDB-compatible oracle SQL string over the same parquet tables. The driver
compares the two at sf=0.01 (row count + schema + order-insensitive value
hash), so:

- every computed column is aliased IDENTICALLY in both forms;
- double aggregates that sum many rows go through ``decimal`` and back
  (see functions/numeric.py) so the result is bit-deterministic and
  independent of partial-aggregation order.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None  # DuckDB SQL; None -> rows-only check
    doc: str = ""
    bench: bool = False  # include in bench.py headline set
    tags: tuple[str, ...] = field(default_factory=tuple)


QUERIES: dict[str, QuerySpec] = {}

# Module order doubles as the registration-priority order. The round driver
# records correctness rows for only the FIRST 50 load_all() entries, so the
# north-star surface (text pipeline, similarity, skew, temporal, quality,
# sources, multimodal, SQL surface) registers before the reference-shaped
# relational/etl tail that it already verified green in round 1.
_QUERY_MODULES = [
    "boxoffice_spark.queries.flagship",
    "boxoffice_spark.queries.text_pipeline",
    "boxoffice_spark.queries.similarity",
    "boxoffice_spark.queries.multimodal",
    "boxoffice_spark.queries.sql_surface",
    "boxoffice_spark.queries.sources",
    "boxoffice_spark.queries.skew",
    "boxoffice_spark.queries.graph",
    "boxoffice_spark.queries.quality",
    "boxoffice_spark.queries.temporal",
    "boxoffice_spark.queries.aggregates",
    "boxoffice_spark.queries.joins",
    "boxoffice_spark.queries.windows",
    "boxoffice_spark.queries.etl",
    "boxoffice_spark.queries.incremental",
    "boxoffice_spark.queries.relational",
    "boxoffice_spark.queries.streaming_checks",
]

# Queries pulled to the very front of load_all() order regardless of module,
# so they land inside the driver's 50-entry correctness window. Round-4
# rotation (VERDICT r03 item 1): the nine oracle-backed queries the union of
# r01–r03 windows never covered go first, then every query whose plan or
# oracle changed this round and therefore needs a fresh driver row. Round-3
# pins (a_approx_stats, a_hll_sketch_rollup, ...) earned their green rows in
# CORRECTNESS_r03 and rotate out.
_PINNED = [
    "flagship_daily_topk_delta",
    # -- the 9 never-driver-checked oracle-backed queries (r01–r03 gap)
    "q_udtf_chunk_words",
    "dq_distribution_drift",
    "dq_fk_orphans",
    "a_exact_median",
    "a_histogram",
    "w_trailing_range_sum",
    "w_ntile_quartiles",
    "e_scd2_history",
    "p_intersect_repeat_buyers",
    # -- plan or oracle changed round 4: fresh evidence required
    "g_pagerank_authority",  # top-k rewritten limit-first (no global window)
    "j_fuzzy_tiered",  # tier-3 raw-substring fallback added
    "t_corpus_datacard",  # est_tokens column added
    "t_lang_token_mix",  # NEW round 4: per-language token budget
    "t_sequence_packing",  # NEW round 4: token-budget sample packing
    "t_perplexity_buckets",  # NEW round 4: CCNet-style head/middle/tail
    "t_source_quality_report",  # NEW round 4: per-source triage scorecard
    "t_dup_cluster_sizes",  # NEW round 4: dedup sizing histogram
    "v_embedding_drift",  # NEW round 4: centroid-shift ingest gate
    "t_boilerplate_units",  # NEW round 4: boilerplate blocklist mining
    "t_mixture_rebalance",  # token-aware weights
    "t_bm25_search",  # repeated-query-term dedup
    "t_curation_funnel",  # oracle NOT IN -> NOT EXISTS
    "t_unigram_logprob",  # scoped-persist cache change
    "w_ewma_daily_revenue",  # oracle added round 4 (list_reduce prefix folds)
    # -- NEW round 5: fresh driver evidence required
    "t_dsir_weights",  # DSIR hashed-unigram importance weights
    "t_dedup_keep_best",  # keep-highest-quality canonicalization per cluster
    "t_cross_source_dup_matrix",  # near-dup pair counts by source pair
    "w_event_funnel",  # ordered view->click->purchase funnel
    "dq_completeness_by_day",  # per-ingest-partition DQ trend
    "a_cube",  # CUBE margins completing the rollup/grouping-sets trio
    "t_dedup_apply",  # surviving-corpus materialization (unique + keepers)
    "t_blocklist_gate",  # wordlist content gate (C4 badword-filter shape)
    "w_cohort_retention",  # day-N retention triangle by first-activity cohort
    "dq_pii_prevalence",  # per-source PII scorecard (privacy triage)
    "dq_numeric_drift",  # decile-comparison drift gate for continuous values
    # -- NEW round 6: fresh driver evidence required
    "t_hybrid_rrf_search",  # BM25 + embedding-cosine reciprocal-rank fusion
    "j_entity_resolution",  # blocked edit-distance record linkage + components
    "a_pivot_segment_status",  # explicit-values PIVOT (single-pass wide report)
    "e_unpivot_metrics",  # UNPIVOT/melt via zero-shuffle Expand
    "e_cdc_apply",  # changeset replay; oracle = the new snapshot (round trip)
    "dq_schema_drift",  # column-level null-rate/cardinality drift gate
    "e_scd2_asof_read",  # point-in-time snapshot from the SCD2 dimension
    "t_incremental_dedup_clusters",  # quotient-graph merge == full recompute
    "t_pii_pseudonymize",  # join-preserving deterministic PII surrogates
]


def register(
    name: str,
    oracle: str | None = None,
    bench: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query under ``name`` with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = QuerySpec(name, fn, oracle, fn.__doc__ or "", bench, tuple(tags))
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (populating QUERIES) and return the
    registry, ordered for the driver's fixed-size correctness window:
    pinned names first, then oracle-backed queries in module-priority order
    (each can earn a GREEN hash-match row), then the rows-only queries
    (approximate/streaming/pandas ops whose driver row can never be more
    than a row-count anyway)."""
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)

    def rank(item: tuple[int, tuple[str, QuerySpec]]) -> tuple[int, int, int]:
        idx, (name, spec) = item
        pin = _PINNED.index(name) if name in _PINNED else len(_PINNED)
        return (pin, 0 if spec.oracle is not None else 1, idx)

    ordered = sorted(enumerate(QUERIES.items()), key=rank)
    return {name: spec for _, (name, spec) in ordered}
