"""Scalar function library, transform combinators, DAO range reads."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_scalar_functions(spark):
    from cmoncrawl_spark.functions import scalars as S

    df = spark.createDataFrame(
        [
            (
                "CC-MAIN-2022-05",
                "https://index.commoncrawl.org/CC-MAIN-2022-05-index",
                "2022-01-02 03:04:05",
                "text/html; charset=UTF-8",
                "https://a.cz/x/y",
            )
        ],
        ["crawl", "crawl_url", "ts", "ctype", "url"],
    ).withColumn("ts", F.to_timestamp("ts"))
    r = df.select(
        S.crawl_to_year(F.col("crawl")).alias("year"),
        S.crawl_url_to_name(F.col("crawl_url")).alias("name"),
        S.to_compact_timestamp(F.col("ts")).alias("compact"),
        S.from_compact_timestamp(F.lit("20220102030405")).alias("rt"),
        S.to_sql_date(F.col("ts")).alias("sqldate"),
        S.cache_key(F.lit("f.warc.gz"), F.lit(100), F.lit(200)).alias("ck"),
        S.http_charset_col(F.col("ctype")).alias("charset"),
        S.name_mangle(F.col("url")).alias("mangled"),
    ).first()
    assert r["year"] == 2022
    assert r["name"] == "CC-MAIN-2022-05"
    assert r["compact"] == "20220102030405"
    assert str(r["rt"]) == "2022-01-02 03:04:05"
    assert r["sqldate"] == "2022-01-02 03:04:05"
    import hashlib

    assert r["ck"] == hashlib.sha256(b"f.warc.gz|100|200").hexdigest() + ".bin"
    assert r["charset"] == "UTF-8"
    assert r["mangled"] == "https:__a.cz_x_y"


def test_filter_non_200(spark):
    from cmoncrawl_spark.functions.scalars import filter_non_200

    df = spark.createDataFrame(
        [(1, {"http_response_code": "200"}), (2, {"http_response_code": "404"}), (3, {})],
        "id int, http_header map<string,string>",
    )
    kept = {r["id"] for r in df.where(filter_non_200(F.col("http_header"))).collect()}
    assert kept == {1, 3}  # missing header passes (reference semantics)


def test_transform_combinators():
    from cmoncrawl_spark.extraction import html as H
    from cmoncrawl_spark.extraction.transforms import (
        chain,
        combine_dicts,
        extract_transform,
        get_attribute,
        get_tag,
        get_tags,
        get_text,
        get_text_list,
    )

    dom = H.parse(
        '<div><a href="/x">one</a><a href="/y">two</a>'
        '<span class="t">hello</span></div>'
    )
    assert chain(get_tag("a"), get_attribute("href"))(dom) == "/x"
    assert chain(get_tag("span.t"), get_text())(dom) == "hello"
    assert chain(get_tags("a"), get_text_list(","))(dom) == "one,two"
    # once None always None
    assert chain(get_tag("nope"), get_attribute("href"))(dom) is None
    out = extract_transform(
        dom,
        {"link": "a", "label": "span.t"},
        {"link": get_attribute("href"), "label": get_text()},
    )
    assert out == {"link": "/x", "label": "hello"}
    assert combine_dicts({"a": None, "b": 1}, {"a": 2, "b": 9}) == {
        "a": 2,
        "b": 1,
    }


def test_local_dao_range_and_cache(tmp_path):
    from cmoncrawl_spark.sources.dao import LocalFileDAO, RangeCache, cache_key

    f = tmp_path / "arc.bin"
    f.write_bytes(bytes(range(256)))
    cache = RangeCache(str(tmp_path / "cache"))
    dao = LocalFileDAO(str(tmp_path), cache)
    assert dao.fetch("arc.bin", 10, 5) == bytes([10, 11, 12, 13, 14])
    # cache hit path: mutate the file; cached range still served
    f.write_bytes(bytes(256))
    assert dao.fetch("arc.bin", 10, 5) == bytes([10, 11, 12, 13, 14])
    assert cache.get(cache_key("arc.bin", 10, 5)) is not None


def test_retrying_dao_backoff():
    from cmoncrawl_spark.sources.dao import RetryingDAO

    class Flaky:
        def __init__(self, fail_times):
            self.n = fail_times

        def fetch(self, f, o, l):
            if self.n > 0:
                self.n -= 1
                raise OSError("retryable HTTP 503")
            return b"ok"

    sleeps = []
    dao = RetryingDAO(Flaky(2), max_retry=3, _sleep=sleeps.append)
    assert dao.fetch("f", 0, 1) == b"ok"
    assert dao.attempts == 3
    assert sleeps == [5.0, 6.5]  # 5 * 1.3^0, 5 * 1.3^1

    dao2 = RetryingDAO(Flaky(10), max_retry=2, _sleep=lambda s: None)
    with pytest.raises(OSError):
        dao2.fetch("f", 0, 1)
    assert dao2.attempts == 3


def test_fetch_ranges_spark(spark, tmp_path):
    from cmoncrawl_spark.sources.dao import LocalFileDAO, fetch_ranges

    f = tmp_path / "arc.bin"
    f.write_bytes(b"0123456789abcdef")
    records = spark.createDataFrame(
        [("arc.bin", 0, 4), ("arc.bin", 10, 3)],
        "filename string, offset long, length long",
    )
    base = str(tmp_path)
    out = fetch_ranges(records, lambda: LocalFileDAO(base)).collect()
    got = {(r["offset"]): bytes(r["content"]) for r in out}
    assert got == {0: b"0123", 10: b"abc"}


class _RangeHandler:
    """Minimal Range-aware handler factory over an in-memory blob, with
    an optional fail-first-N-requests mode (exercises T2 retry)."""

    @staticmethod
    def make(blob: bytes, fail_first: int = 0):
        import http.server

        state = {"fails_left": fail_first}

        class H(http.server.BaseHTTPRequestHandler):
            def do_GET(self):
                if state["fails_left"] > 0:
                    state["fails_left"] -= 1
                    self.send_response(503)
                    self.end_headers()
                    return
                rng = self.headers.get("Range")
                if rng and rng.startswith("bytes="):
                    lo, hi = rng[len("bytes="):].split("-")
                    lo, hi = int(lo), int(hi)
                    data = blob[lo : hi + 1]
                    self.send_response(206)
                else:
                    data = blob
                    self.send_response(200)
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def log_message(self, *a):
                pass

        return H


def _serve(blob: bytes, fail_first: int = 0):
    import http.server
    import threading

    srv = http.server.ThreadingHTTPServer(
        ("127.0.0.1", 0), _RangeHandler.make(blob, fail_first)
    )
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}"


def test_http_range_dao_real_range_reads():
    from cmoncrawl_spark.sources.dao import HTTPRangeDAO

    blob = bytes(range(256)) * 4
    srv, base = _serve(blob)
    try:
        dao = HTTPRangeDAO(base)
        assert dao.fetch("whatever.warc.gz", 10, 20) == blob[10:30]
        assert dao.fetch("x", 0, 1) == blob[0:1]
        assert dao.fetch("x", 1000, 24) == blob[1000:1024]
    finally:
        srv.shutdown()


def test_http_range_dao_retries_503_then_succeeds():
    from cmoncrawl_spark.sources.dao import HTTPRangeDAO, RetryingDAO

    blob = b"retry-me-" * 100
    srv, base = _serve(blob, fail_first=2)
    try:
        dao = RetryingDAO(
            HTTPRangeDAO(base), max_retry=3, _sleep=lambda s: None
        )
        assert dao.fetch("f", 9, 8) == blob[9:17]
        assert dao.attempts == 3  # 2 x 503 + 1 success
    finally:
        srv.shutdown()


def test_fetch_ranges_over_http(spark):
    """Full Spark path: mapInPandas range-fetch against a live local
    server — the offline stand-in for the commoncrawl S3/HTTP gateway."""
    from cmoncrawl_spark.sources.dao import HTTPRangeDAO, fetch_ranges

    blob = bytes((i * 7) % 256 for i in range(4096))
    srv, base = _serve(blob)
    try:
        recs = spark.createDataFrame(
            [("seg/a.warc.gz", 0, 16), ("seg/a.warc.gz", 100, 32),
             ("seg/b.warc.gz", 4000, 96)],
            "filename string, offset long, length long",
        )
        out = fetch_ranges(recs, lambda: HTTPRangeDAO(base)).collect()
        got = {(r["filename"], r["offset"]): bytes(r["content"]) for r in out}
        assert got[("seg/a.warc.gz", 0)] == blob[0:16]
        assert got[("seg/a.warc.gz", 100)] == blob[100:132]
        assert got[("seg/b.warc.gz", 4000)] == blob[4000:4096]
    finally:
        srv.shutdown()


def test_parse_timestamp_col_iso_union(spark):
    """X6 differential vs the reference's datetime.fromisoformat union
    (common/types.py:11-21)."""
    from datetime import datetime

    from pyspark.sql import functions as F

    from cmoncrawl_spark.functions.scalars import parse_timestamp_col

    cases = [
        "2023-03-21 21:19:02",
        "2023-03-21T21:19:02",
        "2021-01-01",
        "2023-03-21 21:19:02.123456",
        "2023-03-21T21:19:02.123456",
        None,
        "not a time",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    got = {r["s"]: r["ts"] for r in df.select(
        "s", parse_timestamp_col(F.col("s")).alias("ts")).collect()}
    for c in cases:
        if c is None or c == "not a time":
            assert got.get(c) is None
            continue
        want = datetime.fromisoformat(c)
        assert got[c] == want, f"{c}: {got[c]} != {want}"
