"""The local mirror of the driver's t2 gate: every registered query with an
oracle must match DuckDB exactly (count + schema + sorted values); queries
without an oracle must at least run and return a stable schema."""

from __future__ import annotations

import pytest

from boxoffice_spark.registry import load_all
from boxoffice_spark.testing import compare

SPECS = load_all()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(name, spark, sf_dir, oracle_con):
    spec = SPECS[name]
    df = spec.fn(spark, sf_dir)
    if spec.oracle is None:
        rows = df.count()
        assert rows >= 0
        assert len(df.columns) > 0
        return
    result = compare(name, df, oracle_con, spec.oracle)
    assert result.ok, str(result)
