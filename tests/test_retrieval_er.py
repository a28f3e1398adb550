"""Unit tests for the round-6 additions: reciprocal-rank fusion, blocked
entity resolution, and changeset replay (the oracle sweep checks the
registered queries end-to-end; these pin the operator semantics on small
hand-built frames where the expected answer is computable by eye)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _ranking(spark, rows):
    return spark.createDataFrame(rows, "query_id int, doc_id long, rank int")


class TestRrfFuse:
    def test_known_fusion(self, spark):
        from boxoffice_spark.operators.textstats import rrf_fuse

        # doc 1 is rank-1 in both lists -> must win; doc 2 and doc 3 are
        # rank-2 in one list each -> tie on score, doc_id breaks it.
        lex = _ranking(spark, [(1, 1, 1), (1, 2, 2)])
        sem = _ranking(spark, [(1, 1, 1), (1, 3, 2)])
        got = {
            r["doc_id"]: (r["rrf_score"], r["rank"])
            for r in rrf_fuse([lex, sem], k=10).collect()
        }
        assert got[1][1] == 1 and got[2][1] == 2 and got[3][1] == 3
        assert got[1][0] == round(2 * round(1 / 61, 10), 6)
        assert got[2][0] == got[3][0] == round(round(1 / 62, 10), 6)

    def test_k_cut_and_single_list(self, spark):
        from boxoffice_spark.operators.textstats import rrf_fuse

        lex = _ranking(spark, [(1, d, d) for d in range(1, 8)])
        out = rrf_fuse([lex], k=3).collect()
        assert [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])] == [1, 2, 3]


class TestEntityResolution:
    def test_chain_merges_into_one_entity(self, spark):
        from boxoffice_spark.operators.fuzzy import entity_resolution

        # cold gear -(2)- old gear -(2)- red gear: pairwise cold<->red is
        # dist 3 (> max_dist) yet the chain must land in ONE entity.
        recs = spark.createDataFrame(
            [(1, "cold gear"), (2, "old gear"), (3, "red gear"), (4, "blue anvil")],
            "id long, name string",
        )
        out = {r["id"]: r["entity_name"] for r in
               entity_resolution(recs, "id", "name", max_dist=2).collect()}
        assert out[1] == out[2] == out[3] == "cold gear"
        assert out[4] == "blue anvil"  # singleton canonicalizes to itself

    def test_blocking_prevents_cross_block_merge(self, spark):
        from boxoffice_spark.operators.fuzzy import entity_resolution

        # same edit distance, different trailing token -> never compared
        recs = spark.createDataFrame(
            [(1, "red gear"), (2, "red gears")], "id long, name string"
        )
        out = {r["id"]: r["entity_name"] for r in
               entity_resolution(recs, "id", "name", max_dist=2).collect()}
        assert out[1] == "red gear" and out[2] == "red gears"

    def test_block_cap_degrades_to_singletons(self, spark):
        from boxoffice_spark.operators.fuzzy import entity_resolution

        recs = spark.createDataFrame(
            [(i, f"v{i} hub") for i in range(6)], "id long, name string"
        )
        out = entity_resolution(recs, "id", "name", max_dist=2, max_block_names=3)
        labels = {r["entity_name"] for r in out.collect()}
        assert len(labels) == 6  # capped block pairs dropped, no merge

    def test_record_level_fanout(self, spark):
        from boxoffice_spark.operators.fuzzy import entity_resolution

        # many records per name all inherit the same entity label
        recs = spark.createDataFrame(
            [(i, "old rod" if i % 2 else "cold rod") for i in range(10)],
            "id long, name string",
        )
        out = entity_resolution(recs, "id", "name", max_dist=2)
        assert out.count() == 10
        assert out.select("entity_name").distinct().count() == 1


class TestApplyChangeset:
    def _snap(self, spark, rows):
        return spark.createDataFrame(rows, "k long, v string")

    def test_round_trip(self, spark):
        from boxoffice_spark.operators.upsert import apply_changeset, snapshot_diff

        old = self._snap(spark, [(1, "a"), (2, "b"), (3, "c")])
        new = self._snap(spark, [(2, "B"), (3, "c"), (4, "d")])
        diff = snapshot_diff(old, new, ["k"], ["v"])
        applied = apply_changeset(old, diff, ["k"], ["v"])
        assert sorted((r["k"], r["v"]) for r in applied.collect()) == [
            (2, "B"), (3, "c"), (4, "d"),
        ]

    def test_empty_changeset_is_identity(self, spark):
        from boxoffice_spark.operators.upsert import apply_changeset, snapshot_diff

        old = self._snap(spark, [(1, "a"), (2, "b")])
        diff = snapshot_diff(old, old, ["k"], ["v"])
        assert diff.count() == 0
        applied = apply_changeset(old, diff, ["k"], ["v"])
        assert sorted((r["k"], r["v"]) for r in applied.collect()) == [(1, "a"), (2, "b")]

    def test_null_value_update_applies(self, spark):
        from boxoffice_spark.operators.upsert import apply_changeset, snapshot_diff

        old = self._snap(spark, [(1, "a")])
        new = self._snap(spark, [(1, None)])
        diff = snapshot_diff(old, new, ["k"], ["v"])
        applied = apply_changeset(old, diff, ["k"], ["v"])
        assert [(r["k"], r["v"]) for r in applied.collect()] == [(1, None)]


class TestMmrRerank:
    def _emb(self, spark, rows):
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def test_first_pick_is_cosine_rank1_and_lam1_is_topk(self, spark, sf_dir):
        from boxoffice_spark.operators.similarity import cosine_topk, mmr_rerank
        from boxoffice_spark.tables import table

        emb = table(spark, sf_dir, "embeddings")
        probes = emb.filter("vec_id < 2")
        plain = cosine_topk(emb, probes, k=5).collect()
        top1 = {r["query_id"]: r["neighbor_id"] for r in plain if r["rank"] == 1}
        order = {}
        for r in sorted(plain, key=lambda r: (r["query_id"], r["rank"])):
            order.setdefault(r["query_id"], []).append(r["neighbor_id"])
        mmr = mmr_rerank(emb, probes, n_candidates=5, k=5, lam=1.0).collect()
        got = {}
        for r in sorted(mmr, key=lambda r: (r["query_id"], r["pick"])):
            got.setdefault(r["query_id"], []).append(r["neighbor_id"])
        # lam=1 -> no redundancy penalty -> exactly the cosine order
        assert got == order
        for qid, first in top1.items():
            assert got[qid][0] == first

    def test_duplicate_candidate_demoted(self, spark):
        from boxoffice_spark.operators.similarity import mmr_rerank

        # q = e1; candidates: two IDENTICAL vectors near q (ids 10, 11) and
        # one orthogonal-ish distinct vector (id 12). Plain top-2 picks the
        # twins; MMR at lam=0.5 must pick one twin then the distinct one.
        rows = [
            (0, [1.0, 0.0, 0.0]),       # query/probe
            (10, [0.9, 0.1, 0.0]),
            (11, [0.9, 0.1, 0.0]),
            (12, [0.5, 0.0, 0.8]),
        ]
        emb = self._emb(spark, rows)
        probes = emb.filter("vec_id = 0")
        out = sorted(
            mmr_rerank(emb, probes, n_candidates=3, k=2, lam=0.5).collect(),
            key=lambda r: r["pick"],
        )
        assert out[0]["neighbor_id"] == 10  # tie between twins -> min id
        assert out[1]["neighbor_id"] == 12  # twin 11 demoted by redundancy

    def test_repartition_invariance(self, spark, sf_dir):
        from boxoffice_spark.operators.similarity import mmr_rerank
        from boxoffice_spark.tables import table

        emb = table(spark, sf_dir, "embeddings")
        probes = emb.filter("vec_id < 3")
        a = mmr_rerank(emb, probes, n_candidates=10, k=5, lam=0.7).collect()
        b = mmr_rerank(emb.repartition(7), probes, n_candidates=10, k=5, lam=0.7).collect()
        key = lambda r: (r["query_id"], r["pick"])
        assert sorted(((r["query_id"], r["pick"], r["neighbor_id"], r["mmr_score"])
                       for r in a)) == \
               sorted(((r["query_id"], r["pick"], r["neighbor_id"], r["mmr_score"])
                       for r in b))

    def test_fewer_candidates_than_k(self, spark):
        from boxoffice_spark.operators.similarity import mmr_rerank

        rows = [(0, [1.0, 0.0]), (1, [0.8, 0.2]), (2, [0.0, 1.0])]
        emb = self._emb(spark, rows)
        out = mmr_rerank(emb, emb.filter("vec_id = 0"), n_candidates=10, k=10).collect()
        assert len(out) == 2  # only 2 non-self candidates exist


class TestQualityClassifier:
    def _fit(self, spark, sf_dir):
        from boxoffice_spark.operators.quality import quality_classifier_score
        from boxoffice_spark.tables import table

        d = table(spark, sf_dir, "documents")
        # weak label: long docs = good (a deterministic stand-in teacher)
        labels = d.select(
            "doc_id", (F.length("text") >= 200).cast("int").alias("label")
        )
        return d, labels, quality_classifier_score

    def test_scores_in_range_and_plan_python_free(self, spark, sf_dir):
        d, labels, fit = self._fit(spark, sf_dir)
        out = fit(d, "doc_id", "text", labels, train_size=200)
        rows = out.collect()
        assert len(rows) == d.count()
        assert all(0.0 <= r["quality_prob"] <= 1.0 for r in rows)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan  # scoring is literal-weight codegen

    def test_training_separation_and_signal(self, spark, sf_dir):
        d, labels, fit = self._fit(spark, sf_dir)
        out = fit(d, "doc_id", "text", labels, train_size=200)
        joined = out.join(labels, "doc_id")
        means = {
            r["label"]: r["m"]
            for r in joined.groupBy("label")
            .agg(F.avg("quality_prob").alias("m"))
            .collect()
        }
        # the model must assign higher probability to the positive class
        # (length is among the features, so this signal is learnable)
        assert means[1] > means[0]

    def test_repartition_invariance(self, spark, sf_dir):
        d, labels, fit = self._fit(spark, sf_dir)
        a = sorted(map(tuple, fit(d, "doc_id", "text", labels, train_size=200).collect()))
        b = sorted(
            map(
                tuple,
                fit(d.repartition(13), "doc_id", "text", labels, train_size=200).collect(),
            )
        )
        assert a == b

    def test_empty_labels_raise(self, spark, sf_dir):
        import pytest as _pytest

        d, labels, fit = self._fit(spark, sf_dir)
        with _pytest.raises(ValueError):
            fit(d, "doc_id", "text", labels.limit(0), train_size=200)
