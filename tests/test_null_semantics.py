"""NULL-handling parity between Spark anti-joins and the DuckDB oracles.

Regression for the t_incremental_dedup oracle: with any NULL document text,
md5(normalized) is NULL. A `NOT IN (subquery)` oracle would return ZERO rows
as soon as the corpus side contains one NULL (SQL three-valued logic), while
Spark's LEFT ANTI keeps null-fingerprint batch rows — the oracle must use
NOT EXISTS to match anti-join semantics. The shipped fixtures have no NULL
text, so this builds its own.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from boxoffice_spark.registry import load_all
from boxoffice_spark.testing import compare

SPECS = load_all()


@pytest.fixture(scope="module")
def null_doc_dir(tmp_path_factory):
    """A documents.parquet where both the corpus (doc_id % 10 != 0) and the
    incoming batch (doc_id % 10 == 0) contain NULL-text rows, plus a
    batch-only duplicate pair and a corpus-seen fingerprint."""
    rows = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 10, 20, 30, 40],
            "text": [
                "seen before",  # corpus
                None,  # corpus NULL -> NOT IN would blank the result
                "corpus only",
                "seen before",  # batch, seen in corpus -> dropped
                None,  # batch NULL -> anti-join keeps it
                "fresh twice",  # batch-only dup pair ...
                "fresh twice",  # ... keeper = 30, n copies = 2
            ],
            "lang": ["en"] * 7,
        }
    )
    d = tmp_path_factory.mktemp("nulldocs")
    rows.to_parquet(d / "documents.parquet", index=False)
    return str(d)


def test_incremental_dedup_null_text_matches_oracle(spark, null_doc_dir):
    spec = SPECS["t_incremental_dedup"]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{null_doc_dir}/documents.parquet')"
    )
    result = compare("t_incremental_dedup", spec.fn(spark, null_doc_dir), con, spec.oracle)
    assert result.ok, str(result)
    # and the semantics themselves: NULL fingerprint admitted, dup pair
    # collapsed to one keeper, corpus-seen fingerprint dropped
    out = {r["keeper_id"]: r["n_batch_copies"] for r in spec.fn(spark, null_doc_dir).collect()}
    assert out == {20: 1, 30: 2}
