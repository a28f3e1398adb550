"""Custom Python data sources for the reference's HTTP ingest surface
(SURVEY.md §2.1 S1-S5, T2) on the Spark 4 Python Data Source API.

The reference fetches paginated JSON in a driver-side loop
(kobisdata_extractor.py:56-91 pages ``curPage`` until an empty page;
movie_events_scraper.py:226-301 offset/limit) and polls stock every 10
minutes (goods_stock_pipeline.py:135-139). Spark-first, both become *data
sources*, not driver loops:

- ``PaginatedRestDataSource`` (batch): one InputPartition per page, so the
  cluster fetches pages in parallel and the result is a normal DataFrame —
  filters/projections compose on top. At 1000 executors the page fan-out IS
  the parallelism; no collect, no driver bottleneck.
- ``StockPollStreamSource`` (streaming): a SimpleDataSourceStreamReader
  whose offset is the poll number — each micro-batch is one snapshot of
  per-event stock, stamped ``scraped_at`` (T2/T3 shape).

NETWORK IS STUBBED: this container has no egress, so ``_fetch_page`` /
``_poll_stock`` generate deterministic synthetic records (pure arithmetic
on the global row number — reproducible in DuckDB SQL, which is what makes
the batch source oracle-checkable end-to-end). A real deployment replaces
those two functions with HTTP calls; partitioning, offsets, schema, and
everything Spark-side is unchanged.
"""

from __future__ import annotations

import datetime as dt
import json
from collections.abc import Iterator, Sequence

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

BOXOFFICE_PAGE_SCHEMA = (
    "target_dt date, rnk int, movie_cd string, audi_cnt bigint, sales_amt double"
)

_EPOCH = dt.date(2025, 1, 1)


def _fetch_page(page: int, page_size: int, total_rows: int) -> Iterator[tuple]:
    """STUB of the per-page HTTP GET (kobisdata_extractor.py:18-32).

    Deterministic synthetic daily-box-office records from the global row
    number g: 10 ranked movies per day from a 137-title catalog. The same
    formulas exist in SQL form in ``page_scan_oracle_sql`` so the whole
    source is cross-checked against DuckDB.
    """
    start = page * page_size
    for g in range(start, min(start + page_size, total_rows)):
        audi = (g * 7919) % 100_000
        yield (
            _EPOCH + dt.timedelta(days=g // 10),
            g % 10 + 1,
            f"MV{g % 137:05d}",
            audi,
            audi * 12_000.0,
        )


def page_scan_oracle_sql(total_rows: int) -> str:
    """DuckDB twin of a full ``paginated_rest`` scan (generate_series over
    the same record formulas as :func:`_fetch_page`)."""
    return f"""
    SELECT
        CAST(DATE '2025-01-01' + INTERVAL ((g) // 10) DAY AS DATE) AS target_dt,
        CAST((g) % 10 + 1 AS INT) AS rnk,
        'MV' || lpad(CAST((g) % 137 AS VARCHAR), 5, '0') AS movie_cd,
        (g * 7919) % 100000 AS audi_cnt,
        CAST((g * 7919) % 100000 AS DOUBLE) * 12000.0 AS sales_amt
    FROM generate_series(0, {total_rows - 1}) AS t(g)
    """


class _PagePartition(InputPartition):
    def __init__(self, page: int) -> None:
        self.page = page


class _PaginatedReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.page_size = int(options.get("page_size", 100))
        self.total_rows = int(options.get("total_rows", 1000))

    def partitions(self) -> Sequence[InputPartition]:
        npages = -(-self.total_rows // self.page_size)
        return [_PagePartition(p) for p in range(npages)]

    def read(self, partition: _PagePartition) -> Iterator[tuple]:
        return _fetch_page(partition.page, self.page_size, self.total_rows)


class PaginatedRestDataSource(DataSource):
    """``spark.read.format("paginated_rest").option("page_size", …)`` —
    S2's page loop as a partitioned scan."""

    @classmethod
    def name(cls) -> str:
        return "paginated_rest"

    def schema(self) -> str:
        return BOXOFFICE_PAGE_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return _PaginatedReader(self.options)


STOCK_POLL_SCHEMA = "event_id int, theater_name string, quantity int, scraped_at timestamp"

_POLL_BASE = dt.datetime(2025, 7, 1, 8, 0, 0)


def _poll_stock(poll: int, n_events: int, n_theaters: int) -> list[tuple]:
    """STUB of one stock-poll sweep (goods_stock_pipeline.py:99-113):
    quantity decays deterministically per (event, theater) as polls
    advance — an append-only snapshot log."""
    rows = []
    ts = _POLL_BASE + dt.timedelta(minutes=10 * poll)
    for e in range(n_events):
        for t in range(n_theaters):
            q = max(0, 50 - ((e * 7 + t * 3 + poll * 5) % 60))
            rows.append((e, f"theater_{t:02d}", q, ts))
    return rows


class _StockPollReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        self.n_events = int(options.get("n_events", 4))
        self.n_theaters = int(options.get("n_theaters", 3))
        self.max_polls = int(options.get("max_polls", 6))

    def initialOffset(self) -> dict:
        return {"poll": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        poll = start["poll"]
        if poll >= self.max_polls:  # bounded replay: no progress -> stream drains
            return iter([]), start
        return iter(_poll_stock(poll, self.n_events, self.n_theaters)), {"poll": poll + 1}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # replay for recovery: polls are deterministic, so regeneration IS
        # the WAL (same contract as a replayable Kafka range).
        rows: list[tuple] = []
        for poll in range(start["poll"], end["poll"]):
            rows.extend(_poll_stock(poll, self.n_events, self.n_theaters))
        return iter(rows)

    def commit(self, end: dict) -> None:
        pass


class StockPollStreamSource(DataSource):
    """``spark.readStream.format("stock_poll")`` — the 10-minute stock poll
    as a micro-batch stream; offset = poll number."""

    @classmethod
    def name(cls) -> str:
        return "stock_poll"

    def schema(self) -> str:
        return STOCK_POLL_SCHEMA

    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:
        return _StockPollReader(self.options)


def register_sources(spark: SparkSession) -> None:
    """Idempotently register both custom sources on the session."""
    spark.dataSource.register(PaginatedRestDataSource)
    spark.dataSource.register(StockPollStreamSource)
