"""Encoding cascade + HTML extraction + routing tests.

Encoding cases mirror the reference's own unit tests
(/root/reference/tests/processor_test.py:145-189) — same inputs, same
expected winning encodings.
"""

from __future__ import annotations

import pytest

from cmoncrawl_spark.extraction import html as H
from cmoncrawl_spark.extraction.encoding import decode_cascade, http_charset

HTML = "<html><body><p>test</p></body></html>".encode("latin-1")
NON_UTF8 = bytes([0x81, 0x81, 0x82, 0x83])


def test_cascade_default_utf8():
    text, enc = decode_cascade(HTML)
    assert enc == "utf-8"
    assert "test" in text


def test_cascade_record_encoding_priority():
    text, enc = decode_cascade(HTML, record_encoding="latin-1")
    assert enc == "latin-1"


def test_cascade_forced_overrides_record():
    _, enc = decode_cascade(HTML, forced_encoding="utf-8", record_encoding="latin-1")
    assert enc == "utf-8"


def test_cascade_fallback_latin1():
    text, enc = decode_cascade(NON_UTF8)
    assert enc == "latin-1"
    assert text == "\x81\x81\x82\x83"


def test_cascade_raise_on_encoding():
    with pytest.raises(ValueError):
        decode_cascade(NON_UTF8, raise_on_encoding=True)


def test_cascade_crlf_normalized():
    text, enc = decode_cascade(b"a\r\nb")
    assert text == "a\nb"


def test_cascade_http_charset():
    _, enc = decode_cascade(HTML, content_type="text/html; charset=latin-1")
    assert enc == "latin-1"
    assert http_charset("text/html") is None
    assert http_charset(None) is None


def test_cascade_unknown_encoding_skipped():
    _, enc = decode_cascade(HTML, record_encoding="not-a-codec")
    assert enc == "utf-8"


def test_html_title_and_body():
    dom = H.parse("<html><head><title>T1</title></head><body><p>a</p><p>b</p></body></html>")
    assert H.title_of(dom) == "T1"
    assert H.body_text(dom) == "ab"


def test_html_no_title():
    dom = H.parse("garbage no tags")
    assert H.title_of(dom) is None
    assert H.body_text(dom) == "garbage no tags"


def test_html_select():
    dom = H.parse(
        '<div class="x"><span id="s">hi</span></div><p class="x y">t</p>'
    )
    assert len(H.select(dom, ".x")) == 2
    assert H.select(dom, "#s")[0].text() == "hi"
    assert H.select(dom, "div span")[0].text() == "hi"
    assert H.select(dom, "p.y")[0].text() == "t"
    assert H.select(dom, "nope") == []


def test_config_extractor_filters():
    from cmoncrawl_spark.extraction.extractor import (
        ConfigExtractor,
        CssField,
        PageMeta,
    )

    ex = ConfigExtractor(
        fields={"t": CssField("title")},
        must_exist=["body"],
        must_not_exist=[".paywall"],
    )
    ok = "<html><head><title>x</title></head><body>y</body></html>".encode()
    assert ex.extract_one(ok, PageMeta()) == {"t": "x"}
    nobody = "<html><head><title>x</title></head></html>".encode()
    assert ex.extract_one(nobody, PageMeta()) is None
    paywalled = (
        '<html><head><title>x</title></head><body><div class="paywall"/>'
        "</body></html>"
    ).encode()
    assert ex.extract_one(paywalled, PageMeta()) is None


def test_apply_extractor_spark(spark, sf_dir):
    from pyspark.sql import functions as F

    from cmoncrawl_spark.datagen import pages_with_html
    from cmoncrawl_spark.extraction.extractor import (
        TitleExtractor,
        apply_extractor,
    )

    df = pages_with_html(spark, sf_dir).limit(50)
    out = apply_extractor(
        df, TitleExtractor(), passthrough=["doc_id"],
        record_encoding_col="record_encoding",
    )
    rows = out.collect()
    assert len(rows) == 50
    for r in rows:
        if r["doc_id"] % 101 == 0:
            assert r["title"] is None
        else:
            assert r["title"] == f"Doc {r['doc_id']}"


def test_routing_first_match_wins(spark):
    from datetime import datetime

    from cmoncrawl_spark.operators.routing import Route, route_records

    df = spark.createDataFrame(
        [
            ("https://a.example.com/x", datetime(2022, 6, 1)),
            ("https://b.other.org/y", datetime(2022, 6, 1)),
            ("https://a.example.com/x", datetime(2019, 1, 1)),
        ],
        ["url", "warc_ts"],
    )
    routes = [
        Route("A", [r"example\.com"], since=datetime(2020, 1, 1)),
        Route("B", [r"\.org"]),
        Route("C", [r"example\.com"]),  # shadowed by A within interval
    ]
    got = {
        (r["url"], str(r["warc_ts"])): r["route"]
        for r in route_records(df, routes, no_match="NONE").collect()
    }
    assert got[("https://a.example.com/x", "2022-06-01 00:00:00")] == "A"
    assert got[("https://b.other.org/y", "2022-06-01 00:00:00")] == "B"
    # outside A's interval the later registration C catches it
    assert got[("https://a.example.com/x", "2019-01-01 00:00:00")] == "C"


def test_check_required_semantics():
    """F11 parity with reference utils.py:223-272."""
    from cmoncrawl_spark.extraction.extractor import check_required

    v = check_required({"a": True, "b": False})
    assert v({"a": 1, "b": None}) is True          # b may be None
    assert v({"a": None, "b": 1}) is False         # a must have a value
    assert v({"b": 1}) is False                    # a missing entirely
    assert v({"a": "", "b": None}) is True         # empty ok w/o non_empty
    ve = check_required({"a": True}, non_empty=True)
    assert ve({"a": ""}) is False
    assert ve({"a": []}) is False
    assert ve({"a": "x"}) is True
    assert ve({"a": [1]}) is True


def test_required_filter_col_matches_check_required(spark):
    """The Catalyst twin keeps exactly the rows the validator keeps."""
    from cmoncrawl_spark.extraction.extractor import (
        check_required,
        required_filter_col,
    )

    rows = [
        (0, "x", ["t"]),
        (1, None, ["t"]),
        (2, "", ["t"]),
        (3, "x", []),
        (4, "x", None),
    ]
    df = spark.createDataFrame(rows, "id int, a string, b array<string>")
    req = {"a": True, "b": True}
    v = check_required(req, non_empty=True)
    expected = {
        r[0] for r in rows if v({"a": r[1], "b": r[2]})
    }
    got = {
        r["id"]
        for r in df.where(required_filter_col(df, req, non_empty=True)).collect()
    }
    assert got == expected == {0}
    # missing column -> analysis-time False (schema-first analog)
    assert df.where(
        required_filter_col(df, {"nope": True})
    ).count() == 0


def test_allowed_domain_prefixes_both_paths(spark):
    """F10: native prefilter and the extract_one parity path agree
    (reference extractor.py:313-318 splits the raw netloc)."""
    from pyspark.sql import functions as F

    from cmoncrawl_spark.extraction.extractor import (
        ConfigExtractor,
        CssField,
        PageMeta,
        apply_extractor,
        domain_prefix_allowed,
    )

    urls = [
        "https://news.site.com/a",
        "https://www.news.site.com/a",
        "https://blog.site.com/a",
        "https://ads.site.com/a",
    ]
    df = spark.createDataFrame(
        [(u, b"<html><head><title>t</title></head></html>") for u in urls],
        "url string, html binary",
    )
    keep = {"news", "www"}
    got = {
        r["url"]
        for r in df.where(
            domain_prefix_allowed(F.col("url"), sorted(keep))
        ).collect()
    }
    assert got == {u for u in urls if u.split("//")[1].split(".")[0] in keep}

    ex = ConfigExtractor(
        fields={"t": CssField("title")},
        allowed_domain_prefixes=sorted(keep),
    )
    # Spark path: prefilter hoisted before the UDF
    out = apply_extractor(df, ex, passthrough=["url"])
    assert {r["url"] for r in out.collect()} == got
    # non-Spark parity path: filter_dom via meta.url
    for u in urls:
        res = ex.extract_one(
            b"<html><head><title>t</title></head></html>", PageMeta(url=u)
        )
        assert (res is not None) == (u in got)


def test_css_attribute_selectors():
    from cmoncrawl_spark.extraction import html as H

    doc = H.parse(
        '<html><head>'
        '<meta property="og:url" content="https://x.com/">'
        '<meta name="viewport" content="width=device-width">'
        '<link rel="home" href="/h">'
        '<link title="My RSS feed" href="/rss">'
        '</head><body>'
        '<div class="a b" data-k="v1 v2">hit</div>'
        '<div class="a">miss</div>'
        '</body></html>'
    )
    sel = lambda s: H.select(doc, s)
    assert len(sel("meta[property='og:url']")) == 1
    assert sel("meta[property='og:url']")[0].attrs["content"] == "https://x.com/"
    assert len(sel('meta[property="og:url"]')) == 1
    assert len(sel("meta[property=og:url]")) == 1
    assert len(sel("[property]")) == 1
    assert len(sel("link[title*='RSS']")) == 1
    assert len(sel("link[href^='/r']")) == 1
    assert len(sel("link[href$='ss']")) == 1
    assert len(sel("div[data-k~='v2']")) == 1
    assert sel("div[data-k~='v2']")[0].text() == "hit"
    assert len(sel("div.a[data-k]")) == 1
    assert len(sel("meta[property='nope']")) == 0
    # descendant combinator still works with brackets present
    assert len(sel("head meta[property='og:url']")) == 1
    # space INSIDE quoted attribute value doesn't split the selector
    doc2 = H.parse('<i data-x="a b">t</i>')
    assert len(H.select(doc2, "i[data-x='a b']")) == 1


def test_config_extractor_scoped_fields_and_merge(spark):
    """PageExtractor parity: head-scoped og:title preferred, article
    h1 fallback (combine_dicts first-non-None), transforms applied."""
    from cmoncrawl_spark.extraction.extractor import (
        ConfigExtractor,
        CssField,
        PageMeta,
    )

    ex = ConfigExtractor(
        fields={
            "title": [
                CssField(
                    "meta[property='og:title']", attr="content", scope="head"
                ),
                CssField("h1", scope="div.article"),
            ],
            "body": CssField(
                "p", scope="div.article", transform=lambda s: s.strip().upper()
            ),
        },
        must_exist=["div.article"],
    )
    with_og = (
        b"<html><head><meta property='og:title' content='OG Title'></head>"
        b"<body><div class='article'><h1>H1 Title</h1><p> text </p></div>"
        b"</body></html>"
    )
    res = ex.extract_one(with_og, PageMeta(record_encoding="UTF-8"))
    assert res == {"title": "OG Title", "body": "TEXT"}

    no_og = (
        b"<html><head></head><body><div class='article'>"
        b"<h1>H1 Title</h1><p>x</p></div></body></html>"
    )
    res2 = ex.extract_one(no_og, PageMeta(record_encoding="UTF-8"))
    assert res2["title"] == "H1 Title"

    # must_exist drops pages without the article scope
    bare = b"<html><body><p>x</p></body></html>"
    assert ex.extract_one(bare, PageMeta(record_encoding="UTF-8")) is None
