"""Paginated-REST source: scan contract tests against a real local
HTTP server (count-first fan-out, short-page loop, retry, error-as-
record) plus NDJSON round-trip. Mirrors the reference's iterator
contract (mapwarper.js:112-149, :183-199)."""

from __future__ import annotations

import json
import os
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from etl_mapwarper_spark.sources.paginated_rest import (  # noqa: E402
    FetchResult,
    RestSourceConfig,
    fetch_count,
    http_fetch,
    page_errors,
    page_items,
    scan_pages,
    scan_until_short_page,
)

TOTAL = 537
PER_PAGE = 100

_fail_counts: dict[int, int] = {}  # page -> remaining failures
_fail_lock = threading.Lock()


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):  # silence
        pass

    def do_GET(self):
        q = parse_qs(urlparse(self.path).query)
        page = int(q.get("page", ["1"])[0])
        per_page = int(q.get("per_page", [str(PER_PAGE)])[0])
        if self.path.startswith("/flaky"):
            with _fail_lock:
                remaining = _fail_counts.get(page, 0)
                if remaining > 0:
                    _fail_counts[page] = remaining - 1
                    self.send_response(503)
                    self.end_headers()
                    return
        if self.path.startswith("/broken"):
            self.send_response(500)
            self.end_headers()
            return
        lo = (page - 1) * per_page
        hi = min(lo + per_page, TOTAL)
        body = json.dumps(
            {
                "total_entries": TOTAL,
                "items": [{"id": i, "name": f"rec-{i}"} for i in range(lo, hi)],
            }
        ).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture(scope="module")
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


ITEM = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("name", T.StringType())]
)


def _cfg(base: str, path: str = "/items.json", **kw) -> RestSourceConfig:
    defaults = dict(
        url_template=base + path + "?per_page={per_page}&page={page}",
        per_page=PER_PAGE,
        requests_per_second=1e9,
        max_concurrency=4,
        retries=0,
        backoff_s=0.01,
    )
    defaults.update(kw)
    return RestSourceConfig(**defaults)


def test_fetch_count(server):
    assert fetch_count(_cfg(server)) == TOTAL


def test_count_first_fanout_full_scan(spark, server):
    cfg = _cfg(server)
    n_pages = -(-TOTAL // PER_PAGE)
    pages = scan_pages(spark, cfg, n_pages)
    items = page_items(pages, ITEM)
    got = sorted(r.id for r in items.collect())
    assert got == list(range(TOTAL))
    assert page_errors(pages).count() == 0


def test_short_page_termination(spark, server):
    cfg = _cfg(server)
    pages = scan_until_short_page(spark, cfg, wave_size=3)
    # 537 items / 100 per page -> stops at page 6 (37 items, short);
    # wave_size=3 means at most pages 1..6 fetched (2 waves), never 7+.
    fetched = sorted(r.page for r in pages.collect())
    assert fetched == [1, 2, 3, 4, 5, 6]
    items = page_items(pages, ITEM)
    assert items.count() == TOTAL


def test_retry_recovers_from_transient_failures(spark, server):
    with _fail_lock:
        _fail_counts.clear()
        _fail_counts.update({1: 2, 2: 1})  # fail page1 twice, page2 once
    cfg = _cfg(server, path="/flaky.json", retries=3)
    pages = scan_pages(spark, cfg, 2)
    assert page_errors(pages).count() == 0
    assert page_items(pages, ITEM).count() == 2 * PER_PAGE


def test_error_as_record_not_exception(spark, server):
    cfg = _cfg(server, path="/broken.json")
    pages = scan_pages(spark, cfg, 3)
    errs = page_errors(pages).collect()
    assert len(errs) == 3
    assert all(e.status == 500 for e in errs)
    assert all("500" in e.error for e in errs)
    assert page_items(pages, ITEM).count() == 0  # no exception raised


def test_http_fetch_connection_error_is_record():
    r = http_fetch("http://127.0.0.1:1/nothing", timeout_s=0.5)
    assert r.error is not None and r.status is None


def test_token_bucket_rate(spark, server):
    import time

    cfg = _cfg(server, requests_per_second=10.0, max_concurrency=1)
    t0 = time.monotonic()
    scan_pages(spark, cfg, 5).collect()
    elapsed = time.monotonic() - t0
    # 5 requests at 10 rps through one partition >= ~0.4s of spacing
    assert elapsed >= 0.35


def test_page_items_keeps_parsing_jvm_side(spark, server):
    cfg = _cfg(server)
    items = page_items(scan_pages(spark, cfg, 1), ITEM)
    plan = items._jdf.queryExecution().optimizedPlan().toString()
    assert "from_json" in plan  # parse is a Catalyst expression


def test_fetch_by_key_roundtrip_and_errors(spark, server):
    from etl_mapwarper_spark.sources.paginated_rest import fetch_by_key

    keys = spark.range(1, 6).select(F.col("id"))
    cfg = _cfg(server)
    # keyed template: only {id} is substituted
    cfg = RestSourceConfig(
        url_template=server + "/items.json?per_page=10&page={id}",
        requests_per_second=1e9,
        max_concurrency=3,
        retries=0,
    )
    rows = fetch_by_key(spark, cfg, keys, "id").collect()
    assert sorted(r.key for r in rows) == [1, 2, 3, 4, 5]
    assert all(r.ok and r.status == 200 and r.body for r in rows)
    assert all(f"page={r.key}" in r.url for r in rows)

    broken = RestSourceConfig(
        url_template=server + "/broken?page={id}",
        requests_per_second=1e9,
        max_concurrency=2,
        retries=0,
    )
    errs = fetch_by_key(spark, broken, keys, "id").collect()
    assert all((not r.ok) and r.error for r in errs)
    assert len(errs) == 5


def test_fetch_masks_gates_and_parses(spark):
    from etl_mapwarper_spark.operators.enrichment import fetch_masks
    from etl_mapwarper_spark.operators.pipeline_queries import _serve_mask

    maps = spark.createDataFrame(
        [(3, "masked"), (5, "masking"), (10, "unmasked"), (11, None)],
        "id long, mask_status string",
    )
    cfg = RestSourceConfig(
        url_template="http://fake/maps/{id}/mask.json",
        requests_per_second=1e9,
        max_concurrency=2,
        retries=0,
        fetcher=_serve_mask,
    )
    out = {r["id"]: r for r in fetch_masks(spark, maps, cfg).collect()}
    assert out[3]["mask"] is not None and len(out[3]["gcps"]) == 4
    assert out[5]["mask"] is not None
    # unmasked / null-status rows never fetched
    assert out[10]["mask"] is None and out[11]["mask"] is None
    assert all(out[k]["mask_fetch_error"] is None for k in out)


def test_rest_datasource_matches_imperative_scan(spark):
    from etl_mapwarper_spark.operators.ingestion import (
        src_rest_datasource,
        src_rest_scan,
    )

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    a = src_rest_scan(spark, sf).orderBy("id").collect()
    b = src_rest_datasource(spark, sf).orderBy("id").collect()
    assert a == b and len(a) == 1234


def test_short_page_driver_never_collects_bodies(spark, server, monkeypatch):
    """The short-page probe's driver-side payload is page METADATA only
    (WAVE_META_COLUMNS) — item bodies must stay on executors."""
    from etl_mapwarper_spark.sources.paginated_rest import WAVE_META_COLUMNS

    # patch the concrete class (pyspark.sql.classic), not the ABC —
    # instance method lookup never reaches the base's collect
    _DF = type(spark.range(1))

    seen: list[list[str]] = []
    orig = _DF.collect

    def spy(self):
        seen.append([f.name for f in self.schema.fields])
        return orig(self)

    monkeypatch.setattr(_DF, "collect", spy)
    pages = scan_until_short_page(spark, _cfg(server), wave_size=3)
    assert seen, "probe must have collected wave metadata"
    assert all("body" not in cols for cols in seen), (
        f"driver collected page bodies: {seen}"
    )
    assert all(set(cols) <= set(WAVE_META_COLUMNS) for cols in seen)
    monkeypatch.setattr(_DF, "collect", orig)
    # result still complete and correct after the probe
    assert sorted(r.page for r in pages.collect()) == [1, 2, 3, 4, 5, 6]


def test_short_page_invalid_json_becomes_error_record(spark, server):
    """A page whose body is not a JSON object terminates the scan with
    an error-as-data row (ok=False, body dropped), reference :122-129."""
    def bad_json_fetch(url, timeout_s):
        if "page=3" in url:
            return FetchResult(200, "not json at all {")
        return http_fetch(url, timeout_s)

    cfg = _cfg(server, fetcher=bad_json_fetch)
    pages = scan_until_short_page(spark, cfg, wave_size=2)
    rows = {r.page: r for r in pages.collect()}
    assert sorted(rows) == [1, 2, 3]
    assert rows[3].ok is False
    assert rows[3].body is None
    assert rows[3].error == "invalid JSON body"
    assert rows[1].ok and rows[2].ok
