"""Bucketed co-located join: pre-bucketing both sides on the join key must
eliminate every Exchange from the join plan (the write-once-shuffle,
join-many-times-free contract of io.write_bucketed)."""

from __future__ import annotations

import uuid

import pytest

from boxoffice_spark.io import write_bucketed
from boxoffice_spark.tables import table


@pytest.fixture(scope="module")
def bucket_db(spark, tmp_path_factory):
    db = "bucketdb_" + uuid.uuid4().hex[:8]
    loc = tmp_path_factory.mktemp("warehouse")
    spark.sql(f"CREATE DATABASE {db} LOCATION '{loc}'")
    yield db
    spark.sql(f"DROP DATABASE {db} CASCADE")


def test_bucketed_join_is_shuffle_free(spark, sf_dir, bucket_db):
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    write_bucketed(orders, f"{bucket_db}.orders_b", ["o_custkey"], buckets=8,
                   sort_by=["o_custkey"])
    write_bucketed(customer, f"{bucket_db}.customer_b", ["c_custkey"], buckets=8,
                   sort_by=["c_custkey"])

    ob = spark.table(f"{bucket_db}.orders_b")
    cb = spark.table(f"{bucket_db}.customer_b")
    # disable broadcast so the join would need a shuffle WITHOUT bucketing
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = ob.join(cb, ob.o_custkey == cb.c_custkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        # cross-check the result is right, not just the plan shape
        assert joined.count() == orders.join(customer, orders.o_custkey == customer.c_custkey).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


class TestIvfLayout:
    def test_probe_matches_in_query_ivf_and_prunes_partitions(
        self, spark, sf_dir, tmp_path_factory
    ):
        from boxoffice_spark.operators.similarity import (
            ann_ivf_topk,
            ivf_probe_read,
            write_ivf_layout,
        )
        from boxoffice_spark.tables import table

        emb = table(spark, sf_dir, "embeddings")
        path = str(tmp_path_factory.mktemp("ivf") / "emb_ivf")
        write_ivf_layout(emb, path, n_cells=8)

        probes = emb.filter("vec_id < 3")
        got = ivf_probe_read(spark, path, probes, k=5, n_probe=2)

        # partition pruning: the probe scan carries a PartitionFilter on
        # cell (directory-level pruning at planning time, not a row
        # filter after reading), covering at most 3 queries x 2 probes
        plan = got._jdf.queryExecution().executedPlan().toString()
        import re

        m = re.search(r"PartitionFilters: \[cell[^\]]*IN \(([^)]*)\)", plan)
        assert m, f"no partition filter on cell in probe plan:\n{plan}"
        assert len(m.group(1).split(",")) <= 6

        # same trainer, same assignment, same rerank -> bit-identical to
        # the in-query IVF operator at equal parameters
        expect = ann_ivf_topk(emb, probes, k=5, n_cells=8, n_probe=2)
        a = sorted((r["query_id"], r["rank"], r["neighbor_id"], r["cos_sim"])
                   for r in got.collect())
        b = sorted((r["query_id"], r["rank"], r["neighbor_id"], r["cos_sim"])
                   for r in expect.collect())
        assert a == b

    def test_layout_roundtrip_preserves_rows(self, spark, sf_dir, tmp_path_factory):
        from boxoffice_spark.operators.similarity import write_ivf_layout
        from boxoffice_spark.tables import table

        emb = table(spark, sf_dir, "embeddings")
        path = str(tmp_path_factory.mktemp("ivf") / "emb_ivf2")
        cmat = write_ivf_layout(emb, path, n_cells=4)
        assert cmat.shape[0] == 4
        back = spark.read.parquet(path)
        assert back.count() == emb.count()
        assert back.select("vec_id").distinct().count() == emb.count()
        assert back.select("cell").distinct().count() <= 4
