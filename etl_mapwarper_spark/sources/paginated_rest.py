"""Paginated-REST source — Spark-first re-expression of the reference's
HTTP ingestion (mapwarper.js:23-26, :49-55, :112-149, :183-199).

The reference crawls a REST API two ways:

1. **Count-first fan-out** (maps, :183-199): request page 1, read
   ``total_entries`` (:185-187), plan ceil(total/per_page) page URLs
   (:49-55), fetch sequentially with a 2 s sleep (:18, :194).
2. **Short-page loop** (layers, :112-149): fetch pages until one comes
   back with fewer than ``per_page`` items (:138-143); fetch errors are
   pushed into the stream as error records, not thrown (:122-129).

Spark mapping (designed for a 1000-executor cluster, tested local):

- Fan-out = ``spark.range(num_pages)`` coalesced to ``max_concurrency``
  partitions; each partition runs a token-bucket rate limiter so the
  *global* request rate matches the politeness budget no matter how
  many executors the cluster has. The reference's ``H.series()``
  (concurrency 1) is the degenerate case ``max_concurrency=1``.
- Short-page termination is inherently sequential; we fetch in *waves*
  of ``wave_size`` pages (driver loop), stopping after the first wave
  that contains a short or failed page — at most ``wave_size - 1``
  wasted requests, with full parallelism inside a wave.
- Every fetch returns a **result record** ``(page, url, status, ok,
  body, error)`` — error-as-data (:122-129); callers split ok/error
  with two filters and parse bodies JVM-side via ``from_json`` so the
  Python boundary carries raw page text only, never per-item objects.
- Retry/timeout mirror GOT_OPTIONS (:12-16): 25 s timeout, 5 retries,
  exponential backoff. Spark's own task retry is the outer layer.

At 100 TB the right pattern is: land raw pages to object storage with
this source once, then all downstream passes read the parquet/NDJSON
landing zone — re-crawling per query would re-pay the politeness
budget, the slowest resource in the pipeline.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request
from dataclasses import dataclass, field
from typing import Callable, Iterable, Iterator, Optional

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Fetch result contract: one row per requested page, success or not.
PAGE_SCHEMA = T.StructType(
    [
        T.StructField("page", T.IntegerType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("status", T.IntegerType(), True),
        T.StructField("ok", T.BooleanType(), False),
        T.StructField("body", T.StringType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)

Fetcher = Callable[[str, float], "FetchResult"]


@dataclass(frozen=True)
class FetchResult:
    status: Optional[int]
    body: Optional[str]
    error: Optional[str] = None


@dataclass(frozen=True)
class RestSourceConfig:
    """Scan parameters; defaults mirror the reference's politeness.

    url_template receives ``{page}`` and ``{per_page}``.
    """

    url_template: str
    per_page: int = 250  # PER_PAGE, mapwarper.js:21
    requests_per_second: float = 0.5  # SLEEP_MS=2000, :18
    timeout_s: float = 25.0  # GOT_OPTIONS.timeout, :13
    retries: int = 5  # GOT_OPTIONS.retries, :14
    max_concurrency: int = 1  # H.series(), :194 — raise per API budget
    backoff_s: float = 0.5
    fetcher: Optional[Fetcher] = field(default=None, compare=False)

    def url_for(self, page: int) -> str:
        return self.url_template.format(page=page, per_page=self.per_page)


def http_fetch(url: str, timeout_s: float) -> FetchResult:
    """Stdlib fetch; returns a result, never raises."""
    try:
        with urllib.request.urlopen(url, timeout=timeout_s) as resp:
            return FetchResult(resp.status, resp.read().decode("utf-8"))
    except urllib.error.HTTPError as e:  # non-2xx still has a status
        return FetchResult(e.code, None, f"HTTP {e.code}: {e.reason}")
    except Exception as e:  # timeout, connection refused, DNS …
        return FetchResult(None, None, f"{type(e).__name__}: {e}")


def _fetch_with_retry(config: RestSourceConfig, url: str) -> FetchResult:
    fetch = config.fetcher or http_fetch
    last = FetchResult(None, None, "no attempt made")
    for attempt in range(config.retries + 1):
        last = fetch(url, config.timeout_s)
        if last.error is None:
            return last
        if attempt < config.retries:
            time.sleep(config.backoff_s * (2**attempt))
    return last


class _TokenBucket:
    """Per-partition limiter; global rate = rate/partition × partitions."""

    def __init__(self, rate_per_s: float):
        self._interval = 1.0 / rate_per_s if rate_per_s > 0 else 0.0
        self._next_ok = 0.0

    def acquire(self) -> None:
        now = time.monotonic()
        if now < self._next_ok:
            time.sleep(self._next_ok - now)
            now = time.monotonic()
        self._next_ok = now + self._interval


def _fetch_pages_partition(
    config: RestSourceConfig, pages: Iterable[int]
) -> Iterator[Row]:
    per_partition_rate = config.requests_per_second / max(
        config.max_concurrency, 1
    )
    bucket = _TokenBucket(per_partition_rate)
    for page in pages:
        bucket.acquire()
        url = config.url_for(page)
        r = _fetch_with_retry(config, url)
        yield Row(
            page=page,
            url=url,
            status=r.status,
            ok=r.error is None,
            body=r.body,
            error=r.error,
        )


def fetch_count(
    config: RestSourceConfig, count_field: str = "total_entries"
) -> int:
    """Driver-side count precheck (reference :183-187; throws if absent)."""
    r = _fetch_with_retry(config, config.url_for(1))
    if r.error is not None:
        raise RuntimeError(f"count request failed: {r.error}")
    body = json.loads(r.body)
    if count_field not in body:
        raise RuntimeError(f"API response has no {count_field!r} field")
    return int(body[count_field])


def scan_pages(
    spark: SparkSession,
    config: RestSourceConfig,
    num_pages: int,
    first_page: int = 1,
) -> DataFrame:
    """Count-first fan-out scan: one result row per page (:49-55, :189-199).

    ``spark.range`` plans the page list cluster-side; coalescing to
    ``max_concurrency`` partitions bounds in-flight requests exactly.
    """
    pages = spark.range(first_page, first_page + num_pages).coalesce(
        max(config.max_concurrency, 1)
    )
    cfg = config  # capture a picklable copy for executors

    def run(it: Iterator[Row]) -> Iterator[Row]:
        return _fetch_pages_partition(cfg, (int(r.id) for r in it))

    return spark.createDataFrame(
        pages.rdd.mapPartitions(run), PAGE_SCHEMA
    )


# Columns the short-page probe is allowed to pull to the driver —
# metadata only, never ``body`` (tests pin this contract).
WAVE_META_COLUMNS = ("page", "ok", "n_items", "bad_json")


def _wave_meta(wave: DataFrame, items_field: str) -> DataFrame:
    """Per-page termination metadata, computed JVM-side on executors.

    ``n_items`` = length of the items array (0 when the field is
    absent, mirroring the reference's ``.get(items_field, [])``);
    ``bad_json`` = body present but not a parseable JSON object.
    """
    raw_items = F.get_json_object("body", f"$.{items_field}")
    return wave.select(
        "page",
        "ok",
        F.coalesce(F.json_array_length(raw_items), F.lit(0)).alias("n_items"),
        (
            F.col("body").isNotNull()
            & (
                F.try_parse_json("body").isNull()
                | ~F.startswith(F.ltrim("body"), F.lit("{"))
            )
        ).alias("bad_json"),
    )


def scan_until_short_page(
    spark: SparkSession,
    config: RestSourceConfig,
    items_field: str = "items",
    wave_size: int = 8,
    max_pages: int = 100_000,
) -> DataFrame:
    """Unknown-total scan (reference downloadLayers loop, :112-149).

    Fetches waves of ``wave_size`` pages in parallel; terminates after
    the first wave containing a short page (< per_page items), a failed
    page, or an unparseable body — matching the reference's
    stop-on-short-page contract (:138-143) with error-as-record
    (:122-129).

    Page *bodies* never cross to the driver: each wave is persisted on
    the executors, the driver collects only ``WAVE_META_COLUMNS``
    (page, ok, n_items, bad_json — four scalars per page) to decide
    termination, and the returned DataFrame is the union of the cached
    waves filtered to the accepted page range. Each page is therefore
    fetched exactly once; the politeness budget is paid per wave, not
    per downstream action. At 100 TB scale the same shape holds — the
    driver's working set is O(pages probed), not O(bytes fetched).
    """
    kept: list[DataFrame] = []
    page = 1
    done = False
    while not done and page <= max_pages:
        n = min(wave_size, max_pages - page + 1)
        wave = scan_pages(spark, config, n, page).persist()
        meta = sorted(
            _wave_meta(wave, items_field).collect(), key=lambda r: r.page
        )
        last_accepted = None  # last page of this wave kept as-is
        bad_json_page = None  # page replaced by an invalid-JSON error row
        for r in meta:
            if not r.ok:
                last_accepted = r.page  # error record kept verbatim
                done = True  # reference falls through after error record
                break
            if r.bad_json:
                bad_json_page = r.page
                done = True
                break
            last_accepted = r.page
            if r.n_items < config.per_page:
                done = True
                break
        if last_accepted is not None:
            kept.append(wave.filter(F.col("page") <= last_accepted))
        if bad_json_page is not None:
            kept.append(
                wave.filter(F.col("page") == bad_json_page).select(
                    "page",
                    "url",
                    "status",
                    F.lit(False).alias("ok"),
                    F.lit(None).cast("string").alias("body"),
                    F.lit("invalid JSON body").alias("error"),
                )
            )
        page += len(meta)
    if not kept:
        return spark.createDataFrame([], PAGE_SCHEMA)
    out = kept[0]
    for w in kept[1:]:
        out = out.unionByName(w)
    return out


def page_items(
    pages: DataFrame, item_schema: T.StructType, items_field: str = "items"
) -> DataFrame:
    """Explode ok-pages into item rows — parsing stays JVM-side.

    ``from_json`` + ``explode`` is the reference's ``.map(body =>
    body.items)…flatten()`` (:195-197) with codegen; the page body
    string is the only thing that ever crossed from Python.
    """
    body_schema = T.StructType(
        [T.StructField(items_field, T.ArrayType(item_schema))]
    )
    return (
        pages.filter(F.col("ok"))
        .select(
            "page",
            F.explode(
                F.from_json(F.col("body"), body_schema)[items_field]
            ).alias("item"),
        )
        .select("page", "item.*")
    )


def page_errors(pages: DataFrame) -> DataFrame:
    """Quarantine stream: failed fetches as data (:122-129)."""
    return pages.filter(~F.col("ok")).select("page", "url", "status", "error")


# Keyed (per-entity) fetch contract: one row per requested key.
KEYED_SCHEMA = T.StructType(
    [
        T.StructField("key", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("status", T.IntegerType(), True),
        T.StructField("ok", T.BooleanType(), False),
        T.StructField("body", T.StringType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)


def fetch_by_key(
    spark: SparkSession,
    config: RestSourceConfig,
    keys_df: DataFrame,
    key_col: str = "id",
) -> DataFrame:
    """Per-entity endpoint fetch (reference getMask, mapwarper.js:79-110).

    The reference hits ``…/{mapId}/mask`` once per qualifying map,
    serially. Spark shape: the key column (and ONLY the key column —
    never whole records) is coalesced to ``max_concurrency`` partitions
    and fetched through the same token-bucket + retry machinery as the
    page scans, so the global request rate honors the politeness budget
    on any cluster size. ``url_template`` receives ``{id}``. Errors are
    result rows (error-as-data), mirroring the reference's maskError
    attachment (:90) rather than stream failure.
    """
    cfg = config
    keys = keys_df.select(F.col(key_col).cast("long").alias("key")).coalesce(
        max(config.max_concurrency, 1)
    )

    def run(it: Iterator[Row]) -> Iterator[Row]:
        per_partition_rate = cfg.requests_per_second / max(
            cfg.max_concurrency, 1
        )
        bucket = _TokenBucket(per_partition_rate)
        for r in it:
            bucket.acquire()
            url = cfg.url_template.format(id=int(r.key))
            rr = _fetch_with_retry(cfg, url)
            yield Row(
                key=int(r.key),
                url=url,
                status=rr.status,
                ok=rr.error is None,
                body=rr.body,
                error=rr.error,
            )

    return spark.createDataFrame(keys.rdd.mapPartitions(run), KEYED_SCHEMA)


def _inject(url: str, timeout_s: float, inner: Fetcher, pages: tuple, status: int):
    from urllib.parse import parse_qs, urlparse

    page = int(parse_qs(urlparse(url).query).get("page", ["-1"])[0])
    if page in pages:
        return FetchResult(status, None, f"HTTP {status}: injected failure")
    return inner(url, timeout_s)


def with_injected_failures(
    inner: Fetcher, pages: Iterable[int], status: int = 500
) -> Fetcher:
    """Fault-injection wrapper: the given pages fail with an HTTP
    error result. Module-level (picklable) — usable from executors for
    testing the error-quarantine path end-to-end."""
    import functools

    return functools.partial(
        _inject, inner=inner, pages=tuple(pages), status=status
    )
