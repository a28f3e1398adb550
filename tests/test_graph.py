"""connected_components semantics on hand-built graphs: component
identification, canonical min-id labels, chain diameters, singletons-with-
self-loops, and the convergence guard."""

from __future__ import annotations

import pytest

from boxoffice_spark.operators.graph import connected_components


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, "a long, b long")
    return {r.node: r.cluster_id for r in connected_components(df, "a", "b", **kw).collect()}


def test_two_components_min_label(spark):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11), (3, 1)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_long_chain_converges(spark):
    # path graph 0-1-2-...-9: worst-case diameter for label propagation
    got = _cc(spark, [(i, i + 1) for i in range(9)])
    assert got == {i: 0 for i in range(10)}


def test_self_loop_is_singleton(spark):
    got = _cc(spark, [(5, 5), (1, 2)])
    assert got == {5: 5, 1: 1, 2: 1}


def test_max_iters_guard_raises(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        _cc(spark, [(i, i + 1) for i in range(9)], max_iters=2)
