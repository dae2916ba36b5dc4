"""CLI end-to-end — the `cmon` UX mirrored over the Spark engine.

Replays the reference's own end-to-end scenarios
(/root/reference/tests/end_to_end_test.py) against our CLI: extract
from file.html (HTML mode) and from file.jsonl's embedded captures
(record mode) must emit the golden title; download (record mode) must
emit sorted-keys {"domain_record": {...}} lines."""

from __future__ import annotations

import json
import os

import pytest

from cmoncrawl_spark.cli import main

FIXTURE_DIR = "/root/reference/tests/test_extract/files"
GOLDEN_TITLE = (
    '<title data-document-head-keeper="0">'
    "Seznam – najdu tam, co neznám</title>"
)

needs_fixtures = pytest.mark.skipif(
    not os.path.isdir(FIXTURE_DIR), reason="reference fixtures not present"
)


def _read_jsonl_dir(path: str) -> list[dict]:
    rows = []
    for root, _d, files in os.walk(path):
        for name in files:
            if name.startswith("part-") and not name.endswith(".crc"):
                with open(os.path.join(root, name)) as f:
                    rows += [json.loads(l) for l in f if l.strip()]
    return rows


@pytest.fixture()
def plugin_cfg(tmp_path):
    exdir = tmp_path / "extractors"
    exdir.mkdir()
    (exdir / "title_raw.py").write_text(
        "from cmoncrawl_spark.extraction.extractor import TitleTagExtractor\n"
        "NAME = 'title_raw'\n"
        "extractor = TitleTagExtractor()\n"
    )
    cfg = tmp_path / "cfg.json"
    cfg.write_text(
        json.dumps(
            {
                "extractors_path": str(exdir),
                "routes": [
                    {
                        "regexes": [".*"],
                        "extractors": [
                            {"name": "title_raw", "since": "2009-01-01T00:00:00"}
                        ],
                    }
                ],
            }
        )
    )
    return str(cfg)


@needs_fixtures
def test_cli_extract_html_mode(spark, plugin_cfg, tmp_path):
    out = str(tmp_path / "out_html")
    main(
        [
            "extract", plugin_cfg, out,
            os.path.join(FIXTURE_DIR, "file.html"), "html",
        ]
    )
    rows = _read_jsonl_dir(out)
    assert len(rows) == 1
    assert rows[0]["title"] == GOLDEN_TITLE


@needs_fixtures
def test_cli_extract_record_mode(spark, plugin_cfg, tmp_path):
    out = str(tmp_path / "out_rec")
    main(
        [
            "extract", plugin_cfg, out,
            os.path.join(FIXTURE_DIR, "file.jsonl"), "record",
        ]
    )
    rows = _read_jsonl_dir(out)
    titles = [r["title"] for r in rows]
    assert len(rows) == 2  # the two embedded-payload captures
    assert GOLDEN_TITLE in titles


def test_cli_download_record_mode(spark, tmp_path, sf_dir):
    out = str(tmp_path / "out_dl")
    main(
        [
            "download", out, "hot-domain.com", "record",
            "--match_type", "domain", "--limit", "7",
            "--table_dir", sf_dir,
        ]
    )
    rows = _read_jsonl_dir(out)
    assert len(rows) == 7
    for r in rows:
        dr = r["domain_record"]
        # reference JSONL contract: sorted keys, filename/offset/length
        assert list(r.keys()) == ["domain_record"]
        assert "filename" in dr and "offset" in dr and "length" in dr
        assert "hot-domain.com" in dr["url"]


def test_cli_download_html_mode_local_dao(spark, tmp_path, sf_dir):
    """html download through the LocalFileDAO: stage a fake archive at
    the recorded (filename, offset, length) and check payload bytes."""
    from cmoncrawl_spark.datagen import register_crawl_views

    register_crawl_views(spark, sf_dir)
    recs = (
        spark.table("ccindex")
        .where("url_host_name = 'blog.hot-domain.com'")
        .groupBy("warc_filename")
        .agg({"warc_record_offset": "max", "warc_record_length": "max"})
        .collect()
    )
    base = tmp_path / "archives"
    for r in recs:
        p = base / r["warc_filename"]
        p.parent.mkdir(parents=True, exist_ok=True)
        size = (
            r["max(warc_record_offset)"] + r["max(warc_record_length)"]
        )
        with open(p, "wb") as f:
            f.write(bytes(i % 251 for i in range(size)))
    out = str(tmp_path / "out_html_dl")
    main(
        [
            "download", out, "blog.hot-domain.com", "html",
            "--match_type", "host", "--limit", "3",
            "--table_dir", sf_dir, "--dao_base", str(base),
        ]
    )
    # one html FILE per record (url-mangled name.html), written
    # directly under the output dir — no partition directories
    # (reference streamer.py:215-229 layout)
    entries = [e for e in os.listdir(out) if not e.startswith(".")]
    assert 1 <= len(entries) <= 3
    assert all(e.endswith(".html") for e in entries)
    assert not any(os.path.isdir(os.path.join(out, e)) for e in entries)
    # host match includes www. variants (reference HOST semantics)
    assert all("blog.hot-domain.com" in e for e in entries)


def test_cli_crawl_composed_pipeline_end_to_end(spark, tmp_path):
    """VERDICT r4 item 6: the full composed live pipeline through the
    CLI as ONE job — fixture CDX server -> cdx_records (distributed
    probe + fetch stages) -> scheduling_round (dedupe + politeness
    budget + per-host top-k) -> fetch_schedule -> rotated JSONL sink.
    Asserts record counts per host (budget-capped) and the politeness
    spacing column (fetch_offset_ms = (rank-1) * crawl_delay)."""
    import json as _json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import parse_qs, urlparse

    # two hosts; b.example has MORE candidates than the budget, and
    # one duplicate-canonical URL pair (/p1x vs /p1x/) exercises dedup
    recs = [
        {"url": "https://a-example.com/pa", "filename": "f1.warc.gz",
         "offset": "0", "length": "10", "digest": "SHA1:A",
         "encoding": "UTF-8", "timestamp": "20230301120000"},
        {"url": "https://b-example.com/p1x", "filename": "f1.warc.gz",
         "offset": "10", "length": "10", "digest": "SHA1:B",
         "encoding": "UTF-8", "timestamp": "20230301120001"},
        {"url": "https://b-example.com/p1x/", "filename": "f1.warc.gz",
         "offset": "20", "length": "10", "digest": "SHA1:B2",
         "encoding": "UTF-8", "timestamp": "20230301120002"},
        {"url": "https://b-example.com/p2y", "filename": "f1.warc.gz",
         "offset": "30", "length": "10", "digest": "SHA1:C",
         "encoding": "UTF-8", "timestamp": "20230301120003"},
        {"url": "https://b-example.com/p3z", "filename": "f2.warc.gz",
         "offset": "0", "length": "10", "digest": "SHA1:D",
         "encoding": "UTF-8", "timestamp": "20230301120004"},
    ]

    class H(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            q = parse_qs(urlparse(self.path).query)
            if q.get("showNumPages") == ["true"]:
                body = _json.dumps({"pages": 1}).encode()
            else:
                body = "\n".join(_json.dumps(r) for r in recs).encode()
            self.send_response(200)
            self.end_headers()
            self.wfile.write(body)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}/cdx"
    out = str(tmp_path / "sched")
    try:
        main([
            "crawl", out, "a-example.com", "b-example.com",
            "--cdx_server", base, "--match_type", "domain",
            "--budget", "2", "--crawl_delay", "1.5",
            "--max_requests_per_second", "1000",
        ])
    finally:
        srv.shutdown()
    rows = [
        _json.loads(r["value"])
        for r in spark.read.text(out).collect()
    ]
    by_host: dict[str, list] = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(r)
    # a-example: 1 candidate -> 1 scheduled; b-example: 4 candidates,
    # 1 canonical duplicate removed -> 3 distinct, budget-capped at 2
    assert sorted(by_host) == ["a-example.com", "b-example.com"]
    assert len(by_host["a-example.com"]) == 1
    assert len(by_host["b-example.com"]) == 2
    # politeness spacing: k-th fetch of a host at (k-1)*1500 ms
    for host, hrows in by_host.items():
        offsets = sorted(r["fetch_offset_ms"] for r in hrows)
        assert offsets == [1500 * i for i in range(len(hrows))], host
        assert all(r["crawl_delay_s"] == 1.5 for r in hrows)


def test_cli_crawl_domain_politeness_subdomain_hosts(spark, tmp_path):
    """Regression (round-5 review): with --domain_politeness the CLI's
    synthesized policies must be keyed by the PSL registered domain,
    not the raw hosts — scheduling_round rewrites every candidate's
    politeness key to eTLD+1 before the INNER policy join, so
    raw-host-keyed policies matched nothing and the schedule was
    silently EMPTY for any frontier of subdomain URLs (the common
    case on a real CDX index). Also asserts the semantics the flag
    exists for: subdomains of one owner share ONE budget."""
    import json as _json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import parse_qs, urlparse

    # three URLs across two subdomains of ONE registered domain
    # (co.uk is a wildcard-free public suffix in the bundled list)
    recs = [
        {"url": "https://www.shop-x.co.uk/p1a", "filename": "f1.warc.gz",
         "offset": "0", "length": "10", "digest": "SHA1:A",
         "encoding": "UTF-8", "timestamp": "20230301120000"},
        {"url": "https://blog.shop-x.co.uk/p2b", "filename": "f1.warc.gz",
         "offset": "10", "length": "10", "digest": "SHA1:B",
         "encoding": "UTF-8", "timestamp": "20230301120001"},
        {"url": "https://blog.shop-x.co.uk/p3c", "filename": "f2.warc.gz",
         "offset": "0", "length": "10", "digest": "SHA1:C",
         "encoding": "UTF-8", "timestamp": "20230301120002"},
    ]

    class H(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            q = parse_qs(urlparse(self.path).query)
            if q.get("showNumPages") == ["true"]:
                body = _json.dumps({"pages": 1}).encode()
            else:
                body = "\n".join(_json.dumps(r) for r in recs).encode()
            self.send_response(200)
            self.end_headers()
            self.wfile.write(body)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}/cdx"
    out = str(tmp_path / "sched_dp")
    try:
        main([
            "crawl", out, "shop-x.co.uk",
            "--cdx_server", base, "--match_type", "domain",
            "--budget", "2", "--crawl_delay", "1.0",
            "--domain_politeness",
            "--max_requests_per_second", "1000",
        ])
    finally:
        srv.shutdown()
    rows = [
        _json.loads(r["value"])
        for r in spark.read.text(out).collect()
    ]
    # pre-fix: rows == [] (policy join missed every subdomain host)
    assert rows, "domain-politeness schedule must not be empty"
    # all three candidates share one politeness key == eTLD+1 ...
    assert {r["host"] for r in rows} == {"shop-x.co.uk"}
    # ... and therefore share ONE budget: 3 distinct URLs, budget 2
    assert len(rows) == 2
    offsets = sorted(r["fetch_offset_ms"] for r in rows)
    assert offsets == [0, 1000]
