"""Paginated REST as a Spark 4 Python DataSource (DataSource V2 API).

``sources/paginated_rest.py`` drives the crawl imperatively
(mapPartitions over a page-id range). This module exposes the same
scan as a REGISTERED SOURCE — ``spark.read.format("paginated_rest")``
— which is the idiomatic Spark 4 surface: the planner sees a real
relation, partition planning lives in ``partitions()``, and any SQL
user can consume the API without touching Python plumbing
(SURVEY.md §2.B "Scans/sources"; reference crawl semantics
mapwarper.js:49-55, :183-199).

Contract mirrors the imperative scanner:
- one output row per page, PAGE_SCHEMA-shaped (page/url/status/ok/
  body/error) — error-as-data (:122-129); item explosion stays
  JVM-side via ``page_items`` / ``from_json``;
- pages are grouped into ``max_concurrency`` input partitions; each
  partition rate-limits with the shared token bucket so the global
  request rate honors the politeness budget on any cluster size;
- retry/timeout mirror GOT_OPTIONS (:12-16).

Options (all strings, per the DataSource API):
  url_template   required; receives {page} and {per_page}
  total_pages    required; count-first fan-out is the caller's
                 ``fetch_count`` (the reference's :183-187 precheck)
  per_page, max_concurrency, requests_per_second, timeout_s,
  retries, backoff_s   as in RestSourceConfig
  fetcher        optional "module.path:attr" of an importable fetcher
                 (url, timeout_s) -> FetchResult — used by tests and
                 mock servers; omitted = stdlib HTTP fetch
"""

from __future__ import annotations

import importlib
from dataclasses import replace

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from .paginated_rest import (
    PAGE_SCHEMA,
    RestSourceConfig,
    _fetch_pages_partition,
)


def _resolve_fetcher(path: str):
    mod, _, attr = path.partition(":")
    return getattr(importlib.import_module(mod), attr)


def _config_from_options(options: dict) -> RestSourceConfig:
    cfg = RestSourceConfig(
        url_template=options["url_template"],
        per_page=int(options.get("per_page", 250)),
        requests_per_second=float(options.get("requests_per_second", 0.5)),
        timeout_s=float(options.get("timeout_s", 25.0)),
        retries=int(options.get("retries", 5)),
        max_concurrency=int(options.get("max_concurrency", 1)),
        backoff_s=float(options.get("backoff_s", 0.5)),
    )
    if "fetcher" in options:
        cfg = replace(cfg, fetcher=_resolve_fetcher(options["fetcher"]))
    return cfg


class _Pages(InputPartition):
    def __init__(self, pages: list[int]):
        self.pages = pages


class PaginatedRestReader(DataSourceReader):
    def __init__(self, options: dict):
        self._options = dict(options)
        self._total_pages = int(options["total_pages"])

    def partitions(self):
        cfg = _config_from_options(self._options)
        n_parts = max(cfg.max_concurrency, 1)
        buckets: list[list[int]] = [[] for _ in range(n_parts)]
        for page in range(1, self._total_pages + 1):
            buckets[(page - 1) % n_parts].append(page)
        return [_Pages(b) for b in buckets if b]

    def read(self, partition: _Pages):
        cfg = _config_from_options(self._options)
        for row in _fetch_pages_partition(cfg, partition.pages):
            yield (
                row.page,
                row.url,
                row.status,
                row.ok,
                row.body,
                row.error,
            )


class PaginatedRestStreamReader(DataSourceStreamReader):
    """Incremental page ingestion as a STREAMING source.

    The offset is the page high-water mark: ``latestOffset`` reports
    how many pages the API currently exposes (``available_pages``),
    Spark plans the [committed, latest) delta, and ``read`` fetches
    those pages on EXECUTORS — the driver only moves page numbers.
    With a checkpoint, repeated ``availableNow`` runs land each run's
    newly-published pages exactly once: the streaming counterpart of
    the reference's re-crawl (the mapwarper pipeline re-downloads the
    full API each run; the offset log turns that into an incremental
    crawl).
    """

    def __init__(self, options: dict):
        self._options = dict(options)
        self._available = int(options.get("available_pages", 0))

    def initialOffset(self):
        return {"page": 0}

    def latestOffset(self):
        return {"page": self._available}

    def partitions(self, start, end):
        cfg = _config_from_options(self._options)
        pages = list(range(start["page"] + 1, end["page"] + 1))
        n_parts = max(cfg.max_concurrency, 1)
        buckets: list[list[int]] = [[] for _ in range(n_parts)]
        for i, page in enumerate(pages):
            buckets[i % n_parts].append(page)
        parts = [_Pages(b) for b in buckets if b]
        # Spark requires >=1 partition per microbatch even when the
        # delta is empty
        return parts or [_Pages([])]

    def read(self, partition: _Pages):
        cfg = _config_from_options(self._options)
        for row in _fetch_pages_partition(cfg, partition.pages):
            yield (
                row.page,
                row.url,
                row.status,
                row.ok,
                row.body,
                row.error,
            )

    def commit(self, end) -> None:
        pass


class PaginatedRestDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "paginated_rest"

    def schema(self):
        return PAGE_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return PaginatedRestReader(self.options)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return PaginatedRestStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(PaginatedRestDataSource)
