"""Round-5 batch operators: KMV overlap sketch, link prediction,
z-score anomaly flags, and the dedup recall scorecard.

The registry-wide oracle test (test_queries_oracle.py) checks the
oracle-backed forms cell-for-cell; these tests pin the operator-level
contracts a row hash can't see: selection exactness, estimator accuracy,
salt-phase invariance, hand-graph scores, and report invariants.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from boxoffice_spark.operators.sketch import (
    KMV_SPACE,
    kmv_estimate,
    kmv_hash,
    kmv_kmin,
)


def _hashed(spark, groups):
    """(group, value) rows -> distinct (m, h) frame via kmv_hash."""
    rows = [(g, v) for g, vals in groups.items() for v in vals]
    df = spark.createDataFrame(rows, "m string, p long")
    return df.select("m", kmv_hash(F.col("p")).alias("h")).distinct()


class TestKmvKmin:
    def test_matches_brute_force_k_smallest(self, spark):
        dh = _hashed(spark, {"a": range(500), "b": range(400, 900)})
        got = {
            (r.m, r.h) for r in kmv_kmin(dh, ["m"], "h", k=32).collect()
        }
        rows = dh.collect()
        want = set()
        for g in ("a", "b"):
            hs = sorted(r.h for r in rows if r.m == g)[:32]
            want |= {(g, h) for h in hs}
        assert got == want

    def test_salt_phase_invariance(self, spark):
        dh = _hashed(spark, {"a": range(1000)})
        one = sorted(r.h for r in kmv_kmin(dh, ["m"], "h", k=64, n_salts=1).collect())
        many = sorted(r.h for r in kmv_kmin(dh, ["m"], "h", k=64, n_salts=16).collect())
        assert one == many

    def test_small_group_kept_whole(self, spark):
        dh = _hashed(spark, {"a": range(10)})
        assert kmv_kmin(dh, ["m"], "h", k=64).count() == 10

    def test_estimate_accuracy(self, spark):
        n, k = 5000, 64
        dh = _hashed(spark, {"a": range(n)})
        sk = kmv_kmin(dh, ["m"], "h", k=k)
        row = (
            sk.groupBy("m")
            .agg(F.count("*").alias("n_s"), F.max("h").alias("h_k"))
            .select(kmv_estimate(F.col("n_s"), F.col("h_k"), k).alias("est"))
            .collect()[0]
        )
        # KMV rse ~ 1/sqrt(k-1) ~ 12.6%; allow 3 sigma
        assert abs(row.est - n) / n < 0.38, row.est

    def test_estimate_exact_below_k(self, spark):
        dh = _hashed(spark, {"a": range(40)})
        sk = kmv_kmin(dh, ["m"], "h", k=64)
        row = (
            sk.groupBy("m")
            .agg(F.count("*").alias("n_s"), F.max("h").alias("h_k"))
            .select(kmv_estimate(F.col("n_s"), F.col("h_k"), 64).alias("est"))
            .collect()[0]
        )
        assert row.est == 40.0

    def test_hash_range_is_60_bit(self, spark):
        hs = [r.h for r in _hashed(spark, {"a": range(200)}).collect()]
        assert all(0 <= h < int(KMV_SPACE) for h in hs)


class TestLinkPrediction:
    def _scores(self, spark, edges, **kw):
        df = spark.createDataFrame(edges, "u long, v long")
        from boxoffice_spark.operators.graph import link_prediction_scores

        return {
            (r.node_a, r.node_b): (r.common_neighbors, r.ra_score)
            for r in link_prediction_scores(df, "u", "v", **kw).collect()
        }

    def test_path_graph(self, spark):
        # 1-2-3: only non-adjacent pair (1,3), common neighbor 2 (deg 2)
        got = self._scores(spark, [(1, 2), (2, 3)])
        assert got == {(1, 3): (1, 0.5)}

    def test_square_graph(self, spark):
        # cycle 1-2-3-4: diagonals (1,3) and (2,4), each two deg-2 centers
        got = self._scores(spark, [(1, 2), (2, 3), (3, 4), (1, 4)])
        assert got == {(1, 3): (2, 1.0), (2, 4): (2, 1.0)}

    def test_adjacent_pairs_excluded(self, spark):
        # triangle: every pair adjacent -> no predictions
        assert self._scores(spark, [(1, 2), (2, 3), (1, 3)]) == {}

    def test_hub_center_capped(self, spark):
        # star: hub 0 joined to 1..5; cap 4 < deg(0)=5 excludes the hub,
        # so leaf pairs get NO common-neighbor evidence
        star = [(0, i) for i in range(1, 6)]
        assert self._scores(spark, star, max_center_degree=4) == {}
        # with the cap above the hub degree the 10 leaf pairs all appear
        got = self._scores(spark, star, max_center_degree=5)
        assert len(got) == 10
        assert got[(1, 2)] == (1, 0.2)

    def test_top_k_bound(self, spark):
        star = [(0, i) for i in range(1, 8)]
        got = self._scores(spark, star, max_center_degree=10, k=3)
        assert len(got) == 3

    def test_ra_sum_past_bigint_wrap(self, spark):
        # r11 (ADVICE r10): the RA unit-sum has one term PER SHARED CENTER,
        # which max_center_degree does not bound. 20,000 shared deg-2
        # centers contribute 20,000 x 5e14 units = 1e19 — past the ~9.2e18
        # BIGINT wrap — so a long sum would go negative; the DECIMAL(38,0)
        # accumulation must return the exact 10000.0.
        n = 20_000
        edges = [(-1, 10 + i) for i in range(n)] + [(-2, 10 + i) for i in range(n)]
        got = self._scores(spark, edges, k=5)
        assert got[(-2, -1)] == (n, 10000.0)


class TestAnomalyZscore:
    def test_flags_consistent_with_z(self, spark, sf_dir):
        from boxoffice_spark.registry import load_all

        df = load_all()["w_anomaly_zscore"].fn(spark, sf_dir)
        rows = df.collect()
        assert rows, "empty result"
        for r in rows:
            if r.zscore is None:
                assert not r.is_anomaly
            else:
                assert r.is_anomaly == (abs(r.zscore) > 2.5)
            if r.n_obs >= 2 and r.std_7d is not None:
                assert r.std_7d >= 0.0
            if r.n_obs == 0:
                assert r.mean_7d is None


class TestDedupRecallReport:
    @pytest.fixture(scope="class")
    def report(self, spark, sf_dir):
        from boxoffice_spark.registry import load_all

        df = load_all()["t_dedup_recall_report"].fn(spark, sf_dir)
        return {(r.tier, r.tau): r for r in df.collect()}

    def test_shape(self, report):
        assert set(report) == {
            (t, tau)
            for t in ("minhash_banded", "minhash_lsh", "simhash_hamming")
            for tau in (0.3, 0.5, 0.8)
        }

    def test_counting_invariants(self, report):
        for r in report.values():
            assert 0 <= r.true_positives <= min(r.n_truth, r.n_candidates)
            for v in (r.precision, r.recall):
                if v is not None:
                    assert 0.0 <= v <= 1.0

    def test_truth_shrinks_with_tau(self, report):
        for t in ("minhash_banded", "minhash_lsh", "simhash_hamming"):
            assert (
                report[(t, 0.3)].n_truth
                >= report[(t, 0.5)].n_truth
                >= report[(t, 0.8)].n_truth
            )

    def test_lsh_rerank_precision_is_one(self, report):
        # minhash_lsh candidates pass an EXACT jaccard >= 0.5 rerank over
        # the same shingle definition as the truth set, and the truth set
        # is capless -> every candidate is a tau=0.5 truth pair. A value
        # below 1.0 means the report's join logic broke.
        r = report[("minhash_lsh", 0.5)]
        if r.n_candidates > 0:
            assert r.precision == 1.0

    def test_candidate_counts_constant_across_tau(self, report):
        for t in ("minhash_banded", "minhash_lsh", "simhash_hamming"):
            ns = {report[(t, tau)].n_candidates for tau in (0.3, 0.5, 0.8)}
            assert len(ns) == 1


class TestFfdPacking:
    @pytest.fixture(scope="class")
    def packed(self, spark, sf_dir):
        from boxoffice_spark.registry import load_all

        return load_all()["t_sequence_packing_ffd"].fn(spark, sf_dir).collect()

    def test_budget_respected_for_multi_doc_bins(self, packed):
        for r in packed:
            if r.n_docs > 1:
                assert r.tokens <= 2048, r

    def test_tokens_conserved(self, spark, sf_dir, packed):
        from boxoffice_spark.operators.textstats import bpe_ish_token_count
        from boxoffice_spark.tables import table

        total = (
            table(spark, sf_dir, "documents")
            .select(bpe_ish_token_count("text").alias("t"))
            .agg(F.sum("t"))
            .collect()[0][0]
        )
        assert sum(r.tokens for r in packed) == total

    def test_bin_count_bounds(self, packed):
        # per group: bins >= ceil(total/budget) (volume lower bound) and
        # bins <= n_docs (each doc alone is the worst case)
        from collections import defaultdict

        groups = defaultdict(list)
        for r in packed:
            groups[(r.lang, r.shard)].append(r)
        for rows in groups.values():
            total = sum(r.tokens for r in rows)
            ndocs = sum(r.n_docs for r in rows)
            nbins = len(rows)
            assert -(-total // 2048) <= nbins <= ndocs

    def test_deterministic_and_repartition_invariant(self, spark, sf_dir):
        from boxoffice_spark.registry import load_all

        fn = load_all()["t_sequence_packing_ffd"].fn
        a = sorted(map(tuple, fn(spark, sf_dir).collect()))
        b = sorted(
            map(
                tuple,
                fn(spark, sf_dir).repartition(7).collect(),
            )
        )
        # repartition of the RESULT is trivially equal; re-run the query
        # to check run-to-run determinism of the greedy loop itself
        c = sorted(map(tuple, fn(spark, sf_dir).collect()))
        assert a == b == c


class TestWeightedSample:
    def test_heavy_weights_dominate_sample(self, spark):
        """Efraimidis-Spirakis semantics: with weights 50x apart, the
        top-k is overwhelmingly heavy items (deterministic md5 draws, so
        this is a fixed property of the operator, not a flaky stat)."""
        from pyspark.sql import Window

        rows = [(i, "x", 5.0 if i < 500 else 0.1) for i in range(1000)]
        d = spark.createDataFrame(rows, "doc_id long, lang string, q double")
        u = (
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
            ).cast("long").cast("double")
            + 1
        ) / F.lit(1152921504606846976.0)
        keyed = d.select(
            "doc_id",
            "lang",
            F.round(F.log(u) / F.greatest(F.col("q"), F.lit(1e-6)), 8).alias("k"),
        )
        w = Window.partitionBy("lang").orderBy(F.desc("k"), F.asc("doc_id"))
        top = (
            keyed.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 100)
            .collect()
        )
        heavy = sum(1 for r in top if r.doc_id < 500)
        assert heavy >= 95, heavy


class TestRollingHllDistinct:
    def test_within_5pct_of_exact_and_consistent(self, spark, sf_dir):
        """The sketch-union estimate must land within 5% of the exact
        trailing-7-day distinct count (the interval self-join this query
        exists to replace), and must be >= the largest single-day exact
        count in its window (union can never lose users)."""
        from boxoffice_spark.registry import load_all
        from boxoffice_spark.tables import table

        out = {r.day: r for r in load_all()["w_rolling_hll_distinct"].fn(spark, sf_dir).collect()}
        ev = table(spark, sf_dir, "events").select(
            F.to_date("ts").alias("day"), "user_id"
        ).distinct()
        days = sorted(out)
        pairs = ev.collect()
        by_day = {}
        for r in pairs:
            by_day.setdefault(r.day, set()).add(r.user_id)
        for i, day in enumerate(days):
            window_days = [d for d in days if 0 <= (day - d).days <= 6]
            exact = len(set().union(*(by_day[d] for d in window_days)))
            approx = out[day].n_users_7d_approx
            assert abs(approx - exact) <= max(0.05 * exact, 2), (day, approx, exact)
            assert out[day].n_days_in_window == len(window_days)


class TestPcaWhitening:
    def test_whitener_decorrelates_sample(self, spark, sf_dir):
        """W^T Σ W ≈ I on the fit sample (λ >> eps here) — the defining
        property of the whitening transform."""
        import numpy as np

        from boxoffice_spark.operators.similarity import fit_pca_whitener
        from boxoffice_spark.tables import table

        emb = table(spark, sf_dir, "embeddings")
        mean, w, evals = fit_pca_whitener(emb, "vec_id", "embedding", n_components=8)
        rows = emb.select("vec_id", "embedding").orderBy(
            F.md5(F.concat(F.lit("pca"), F.col("vec_id").cast("string"))), "vec_id"
        ).limit(1024).collect()
        mat = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
        x = mat - mean
        cov = (x.T @ x) / max(len(rows) - 1, 1)
        gram = w.T @ cov @ w
        assert np.allclose(gram, np.eye(8), atol=1e-3), gram

    def test_query_report_contracts(self, spark, sf_dir):
        from boxoffice_spark.registry import load_all

        fn = load_all()["v_pca_whitening"].fn
        rows = {r.component: r for r in fn(spark, sf_dir).collect()}
        assert len(rows) == 16
        evr_sum = sum(r.explained_var_ratio for r in rows.values())
        assert 0.0 < evr_sum <= 1.000001
        # eigenvalues descending
        evs = [rows[i].eigenvalue for i in range(16)]
        assert evs == sorted(evs, reverse=True)
        for r in rows.values():
            assert abs(r.corpus_mean) < 0.2
            assert 0.5 < r.corpus_var < 1.5, r
        # determinism: no RNG anywhere in fit or projection
        again = {r.component: r for r in fn(spark, sf_dir).collect()}
        assert {k: tuple(v) for k, v in rows.items()} == {
            k: tuple(v) for k, v in again.items()
        }


class TestBatch6to9Invariants:
    """Operator-level contracts for the round's batch 6-9 statistics
    queries — each is ALSO oracle-checked cell-for-cell by
    test_queries_oracle.py; these pin the semantic invariants a value
    hash can't express (probability laws, monotonicity, bound checks)."""

    def test_event_transitions_rows_are_distributions(self, spark, sf_dir):
        from boxoffice_spark.registry import load_all

        out = load_all()["w_event_transitions"].fn(spark, sf_dir).collect()
        by_from = {}
        for r in out:
            by_from.setdefault(r.from_type, []).append(r.p_transition)
            assert 0.0 < r.p_transition <= 1.0
        for src, ps in by_from.items():
            assert abs(sum(ps) - 1.0) < 1e-4, (src, sum(ps))

    def test_gini_bounds_and_decile_share(self, spark, sf_dir):
        from boxoffice_spark.registry import load_all

        for r in load_all()["a_gini_concentration"].fn(spark, sf_dir).collect():
            assert 0.0 <= r.gini < 1.0, r
            # the top decile can never hold less than 10% of revenue
            # minus tie slack, and never more than all of it
            assert 0.0 <= r.top_decile_share <= 1.0, r

    def test_abc_share_monotone_and_complete(self, spark, sf_dir):
        from boxoffice_spark.registry import load_all

        rows = load_all()["a_abc_classification"].fn(spark, sf_dir).collect()
        by_cat = {}
        for r in rows:
            assert r.abc_class in ("A", "B", "C")
            by_cat.setdefault(r.category, []).append(r.cum_share)
        for cat, shares in by_cat.items():
            assert shares == sorted(shares), cat
            assert abs(shares[-1] - 1.0) < 1e-5, (cat, shares[-1])

    def test_bfs_sources_at_zero_and_depth_bound(self, spark, sf_dir):
        from boxoffice_spark.registry import load_all

        rows = load_all()["g_bfs_distances"].fn(spark, sf_dir).collect()
        assert rows, "graph is non-empty at every fixture sf"
        srcs = {r.source for r in rows}
        assert len(srcs) == 3
        for r in rows:
            assert 0 <= r.dist <= 3
            if r.node == r.source:
                assert r.dist == 0

    def test_band_join_residual_holds(self, spark, sf_dir):
        from boxoffice_spark.registry import load_all

        rows = load_all()["j_band_join_bucketed"].fn(spark, sf_dir).collect()
        assert rows  # the zero-row gate's point: the band must fire here
        for r in rows:
            assert abs(r.c_acctbal - r.s_acctbal) <= 10.0 + 1e-9, r
        # no duplicate pairs from the ±1 bucket explode
        pairs = [(r.c_custkey, r.s_suppkey) for r in rows]
        assert len(pairs) == len(set(pairs))

    def test_merge_full_clause_partition(self, spark, sf_dir):
        from boxoffice_spark.registry import load_all

        rows = load_all()["e_merge_full"].fn(spark, sf_dir).collect()
        for r in rows:
            k = r.c_custkey
            if r.action == "inserted":
                assert k % 2 == 0 and k % 3 == 0  # source-only keys
            elif r.action == "updated":
                assert k % 3 != 0 and k % 2 == 0
            else:  # kept: target-only, delete condition not met
                assert k % 3 != 0 and k % 2 != 0

    def test_cusum_stat_nonnegative_and_dated(self, spark, sf_dir):
        from boxoffice_spark.registry import load_all

        rows = load_all()["w_cusum_changepoint"].fn(spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert r.max_abs_cusum >= 0.0
            assert r.norm_stat >= 0.0
            assert r.changepoint_date is not None
            assert r.n_days > 0
