"""Differential tests against the REFERENCE'S OWN CODE.

The reference package can't be imported whole here (aioboto3/bs4 not
installed), but its pure functions can: we AST-extract just the
needed defs + module-level constants from the source files under
/root/reference and exec them in an isolated namespace. The extracted
code is used ONLY as a test oracle — the engine never imports it.

Covers:
- unify_url_id: our Python twin AND our Catalyst expression chain must
  equal the reference function on the synthetic URL population and on
  hypothesis-generated URLs;
- the Athena SQL generator: the reference's generated SQL, executed by
  Spark SQL over our ccindex view, must return exactly the rows of our
  ``index_query`` DataFrame (SURVEY §7.1 step 2).
"""

from __future__ import annotations

import ast
import re
from datetime import datetime

import pytest
from hypothesis import given, settings, strategies as st

REF = "/root/reference/cmoncrawl"


def _extract(path: str, names: set[str], extra_ns: dict | None = None) -> dict:
    """Exec only top-level assignments and the named defs from a file."""
    src = open(path).read()
    tree = ast.parse(src)
    keep: list[ast.stmt] = []
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            if node.name in names:
                keep.append(node)
        elif isinstance(node, ast.Assign):
            keep.append(node)
    mod = ast.Module(body=keep, type_ignores=[])
    ns: dict = {"re": re, "datetime": datetime}
    ns.update(extra_ns or {})
    exec(compile(mod, path, "exec"), ns)
    return ns


_REF_UNIFY_CACHE: dict = {}


def _ref_unify_fn():
    if "fn" not in _REF_UNIFY_CACHE:
        from urllib.parse import urlparse

        ns = _extract(
            f"{REF}/aggregator/utils/helpers.py",
            {"unify_url_id"},
            {"urlparse": urlparse},
        )
        _REF_UNIFY_CACHE["fn"] = ns["unify_url_id"]
    return _REF_UNIFY_CACHE["fn"]


@pytest.fixture(scope="module")
def ref_unify():
    return _ref_unify_fn()


@pytest.fixture(scope="module")
def ref_athena():
    import textwrap
    from urllib.parse import urlparse

    import sys

    sys.path.insert(0, "/root/reference")
    from cmoncrawl.common.types import MatchType  # pure pydantic-free enum? (importable)

    helpers = _extract(
        f"{REF}/aggregator/utils/helpers.py", {"crawl_to_year"}
    )
    ns = _extract(
        f"{REF}/aggregator/utils/athena_query_maker.py",
        {
            "url_query_based_on_match_type",
            "url_query_date_range",
            "date_to_sql_format",
            "crawl_url_to_name",
            "crawl_query",
            "prepare_athena_where_conditions",
            "prepare_athena_sql_query",
        },
        {
            "urlparse": urlparse,
            "crawl_to_year": helpers["crawl_to_year"],
            "MatchType": MatchType,
            "textwrap": textwrap,
            "Optional": object,
            "List": list,
        },
    )
    ns["MatchType"] = MatchType
    return ns


def test_unify_matches_reference_on_synthetic(spark, sf_dir, ref_unify):
    from pyspark.sql import functions as F

    from cmoncrawl_spark.datagen import register_crawl_views
    from cmoncrawl_spark.functions.urls import unify_url_id_col, unify_url_id_py

    register_crawl_views(spark, sf_dir)
    rows = (
        spark.table("pages")
        .select("url", unify_url_id_col(F.col("url")).alias("engine_id"))
        .collect()
    )
    assert rows
    for r in rows:
        expected = ref_unify(r["url"])
        assert r["engine_id"] == expected, r["url"]
        assert unify_url_id_py(r["url"]) == expected, r["url"]


@settings(max_examples=150, deadline=None)
@given(
    st.builds(
        lambda scheme, www, host, path, suf: f"{scheme}://{www}{host}{path}{suf}",
        st.sampled_from(["http", "https"]),
        st.sampled_from(
            ["", "www.", "video.", "data.blog.", "user@", "u:pw@www."]
        ),
        st.from_regex(
            r"[a-z][a-z0-9]{0,8}(\.[a-z]{2,3}){1,2}(:\d{2,5})?",
            fullmatch=True,
        ),
        st.from_regex(
            r"(/[a-zA-Z0-9_\-\.~]{0,15}){0,4}", fullmatch=True
        ),
        st.sampled_from(["", "/", ".html", ".jpg", "?x=1&y=2", "-20220306.html"]),
    )
)
def test_unify_matches_reference_hypothesis(url):
    from cmoncrawl_spark.functions.urls import unify_url_id_py

    assert unify_url_id_py(url) == _ref_unify_fn()(url)


def test_index_query_matches_reference_sql(spark, sf_dir, ref_athena):
    """Execute the reference's generated Athena SQL with Spark SQL over
    our ccindex view; compare against index_query row-for-row."""
    from cmoncrawl_spark.datagen import register_crawl_views
    from cmoncrawl_spark.operators.ccindex import MatchType as OurMT
    from cmoncrawl_spark.operators.ccindex import index_query

    register_crawl_views(spark, sf_dir)
    RefMT = ref_athena["MatchType"]
    crawl_urls = [
        "https://index.commoncrawl.org/CC-MAIN-2021-05-index",
        "https://index.commoncrawl.org/CC-MAIN-2021-21-index",
        "https://index.commoncrawl.org/CC-MAIN-2022-05-index",
        "https://index.commoncrawl.org/CC-MAIN-2022-21-index",
        "https://index.commoncrawl.org/CC-MAIN-2023-05-index",
        "https://index.commoncrawl.org/CC-MAIN-2023-21-index",
    ]
    cases = [
        (["hot-domain.com"], RefMT.DOMAIN, OurMT.DOMAIN, None, None),
        (["blog.hot-domain.com"], RefMT.HOST, OurMT.HOST, None, None),
        (
            ["news.hot-domain.com/sec1"],
            RefMT.PREFIX,
            OurMT.PREFIX,
            datetime(2021, 6, 1),
            datetime(2022, 12, 31),
        ),
    ]
    for urls, ref_mt, our_mt, since, to in cases:
        sql = ref_athena["prepare_athena_sql_query"](
            urls, since, to, crawl_urls, "db", "tbl", match_type=ref_mt
        )
        # point the reference's FROM at our view; semantics untouched
        sql = sql.replace('FROM "db"."tbl" AS cc', "FROM ccindex AS cc").rstrip(
            "; \n"
        )
        ref_rows = sorted(tuple(map(str, r)) for r in spark.sql(sql).collect())
        ours = sorted(
            tuple(map(str, r))
            for r in index_query(
                spark.table("ccindex"), urls, our_mt, since=since, to=to
            ).collect()
        )
        assert ref_rows == ours, (urls, ref_mt, len(ref_rows), len(ours))
        assert len(ref_rows) > 0, ("case matched nothing", urls)


# --------------------------------------------------------------------------
# Encoding cascade differential (F12 — the byte-identity invariant's core)
# --------------------------------------------------------------------------

_REF_ENC_CACHE: dict = {}


def _ref_encode_fns():
    """AST-extract BaseExtractor.encode/preprocess as plain functions."""
    if "encode" in _REF_ENC_CACHE:
        return _REF_ENC_CACHE["encode"], _REF_ENC_CACHE["preprocess"]
    import ast as _ast

    path = f"{REF}/processor/pipeline/extractor.py"
    tree = _ast.parse(open(path).read())
    fns = {}
    for node in tree.body:
        if isinstance(node, _ast.ClassDef) and node.name == "BaseExtractor":
            for item in node.body:
                if isinstance(item, _ast.FunctionDef) and item.name in (
                    "encode",
                    "preprocess",
                ):
                    fns[item.name] = item
    assert set(fns) == {"encode", "preprocess"}

    class _Logger:
        def warn(self, *a, **k):
            pass

    ns: dict = {"metadata_logger": _Logger(), "Dict": dict}
    for f in fns.values():
        mod = _ast.Module(body=[f], type_ignores=[])
        exec(compile(mod, path, "exec"), ns)
    _REF_ENC_CACHE["encode"] = ns["encode"]
    _REF_ENC_CACHE["preprocess"] = ns["preprocess"]
    return ns["encode"], ns["preprocess"]


class _FakeDR:
    def __init__(self, encoding):
        self.encoding = encoding


class _FakeMeta:
    def __init__(self, record_encoding, content_type):
        self.encoding = "latin-1"  # downloader default (types.py:65-66,77)
        self.domain_record = _FakeDR(record_encoding)
        self.http_header = (
            {"Content-Type": content_type} if content_type is not None else {}
        )


class _FakeSelf:
    def __init__(self, forced, raise_on_encoding=False):
        self.encoding = forced
        self.raise_on_encoding = raise_on_encoding


def _ref_cascade(raw, forced, record_encoding, content_type):
    encode, preprocess = _ref_encode_fns()
    _FakeSelf.encode = encode  # preprocess calls self.encode(...)
    meta = _FakeMeta(record_encoding, content_type)
    self_ = _FakeSelf(forced)
    # the reference downloader decodes WARC bytes with meta.encoding
    # (latin-1, byte-transparent) before preprocess runs
    response = raw.decode(meta.encoding)
    out = preprocess(self_, response, meta)
    return out, meta.encoding


_ENCS = [None, "utf-8", "ISO-8859-1", "windows-1250", "big5", "no-such-codec"]
_CTYPES = [
    None,
    "",
    "text/html",
    "text/html; charset=utf-8",
    "text/html; charset=windows-1250",
    "text/html; charset=",
    "text/html; charset=bogus",
    "a; charset=b; charset=big5",  # multiple charset= pieces
]
_TEXTS = ["", "plain ascii", "ünïcodé ™ Doc", "Seznam – neznám", "中文测试页"]


@settings(max_examples=200, deadline=None)
@given(
    st.sampled_from(_TEXTS),
    st.sampled_from(["utf-8", "ISO-8859-1", "windows-1250", "utf-16"]),
    st.sampled_from(_ENCS),
    st.sampled_from(_ENCS),
    st.sampled_from(_CTYPES),
    st.booleans(),
)
def test_encoding_cascade_matches_reference(
    text, payload_enc, forced, record_enc, ctype, crlf
):
    from cmoncrawl_spark.extraction.encoding import decode_cascade

    try:
        raw = (text + ("\r\nend" if crlf else " end")).encode(
            payload_enc, errors="ignore"
        )
    except LookupError:
        return
    want_text, want_enc = _ref_cascade(raw, forced, record_enc, ctype)
    got_text, got_enc = decode_cascade(
        raw,
        forced_encoding=forced,
        record_encoding=record_enc,
        content_type=ctype,
    )
    assert got_text == want_text
    assert got_enc == want_enc


def test_encoding_cascade_garbage_bytes_match_reference():
    from cmoncrawl_spark.extraction.encoding import decode_cascade

    raw = bytes([0x81, 0x81, 0x82, 0x83])  # the reference fixture bytes
    want_text, want_enc = _ref_cascade(raw, None, None, None)
    got_text, got_enc = decode_cascade(raw)
    assert (got_text, got_enc) == (want_text, want_enc)
