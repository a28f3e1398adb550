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
