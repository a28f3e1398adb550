"""Registry entries for the custom Python data sources (SURVEY.md §2.1
S1-S5, T2/T3) — see sources/rest_source.py for the stubbed-network
contract."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from boxoffice_spark.registry import register
from boxoffice_spark.sources.rest_source import page_scan_oracle_sql, register_sources
from boxoffice_spark.streaming.stateful import latest_stock_state

_TOTAL_ROWS = 1000
_PAGE_SIZE = 100


@register(
    "r_rest_page_scan",
    oracle=page_scan_oracle_sql(_TOTAL_ROWS),
    tags=("source", "datasource"),
)
def r_rest_page_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/S2 as a custom batch DataSource: one InputPartition per page,
    cluster-parallel 'fetch', ordinary DataFrame on top. The deterministic
    record formulas are regenerated in DuckDB SQL, so the source's
    pagination/schema/union behavior is value-checked end-to-end."""
    register_sources(spark)
    return (
        spark.read.format("paginated_rest")
        .option("page_size", _PAGE_SIZE)
        .option("total_rows", _TOTAL_ROWS)
        .load()
    )


@register("s_stock_poll_stateful_latest", oracle=None, tags=("streaming", "stateful", "source"))
def s_stock_poll_stateful_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2+T3: the 10-minute poll as a custom micro-batch stream source,
    folded to latest-state-per-key by a custom applyInPandasWithState
    operator (O(keys) state). Rows-only: stateful incremental execution;
    tests/test_sources.py asserts equality with the batch window over the
    full replayed log."""
    return latest_stock_state(spark)
