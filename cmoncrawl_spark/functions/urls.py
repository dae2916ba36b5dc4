"""URL canonicalization — the engine's hottest scalar path.

Two canonicalizers:

1. ``unify_url_id`` — the reference's URL-seen id (semantics from
   /root/reference/cmoncrawl/aggregator/utils/helpers.py:39-59, golden
   vectors tests/gateway_test.py:111-151). Implemented TWICE:
   - :func:`unify_url_id_col` — pure Catalyst column expressions
     (``parse_url`` + ``regexp_*``). JVM-side, whole-stage codegen,
     zero Python in the hot path — this is what frontier rounds use at
     100 TB scale.
   - :func:`unify_url_id_py` — plain-Python twin used by tests (golden
     vectors + hypothesis differential vs the column version) and by
     the single-threaded frontier simulator oracle.

2. ``surt`` — RFC-3986-normalized SURT form (north_rule addition; no
   reference equivalent). Native expression fast path; the full
   query-param-sorting variant is an Arrow-batched pandas UDF.

Reference semantics notes (pinned by the golden vectors):
- extension strip removes EVERY occurrence of .html/.jpg/.png/.zip;
- the reference's "collapse slashes" regex is ``re.sub('/', '/')`` — a
  literal no-op we intentionally do not reproduce as work;
- path core = FIRST match of ``(/[a-zA-Z0-9_-]*)*(/[a-zA-Z0-9-]*)``;
  no match => empty path;
- trailing ``[/\\-0-9]+`` stripped; leading ``www.`` stripped from the
  netloc.
"""

from __future__ import annotations

from urllib.parse import urlsplit, urlunsplit, parse_qsl, urlencode, quote, unquote

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_EXT_RE = r"\.html|\.jpg|\.png|\.zip"
_PATH_CORE_RE = r"(/[a-zA-Z0-9_\-]*)*(/[a-zA-Z0-9\-]*)"
_TRAILING_RE = r"[/\-0-9]+$"


def _host_col(url: Column) -> Column:
    return F.try_parse_url(url, F.lit("HOST"))


def _netloc_col(url: Column) -> Column:
    # The reference id keys on urlparse(url).netloc — which KEEPS
    # userinfo and port ('user@h:8080'), unlike parse_url HOST. One
    # regexp reproduces netloc exactly for scheme-ful URLs (and ''
    # otherwise, same as urlparse on scheme-less input).
    return F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)", 1)


def unify_url_id_col(url: Column, netloc: Column | None = None) -> Column:
    """Canonical URL-seen id as a native expression chain (no UDF).

    Pass ``netloc`` (an already-computed ``_netloc_col(url)``) to avoid
    re-parsing the URL on the frontier hot path. NOTE: the id keys on
    the full netloc (reference helpers.py:54-57), not the bare host.
    """
    host = _netloc_col(url) if netloc is None else netloc
    host = F.when(host.startswith("www."), F.substring(host, 5, 2048)).otherwise(
        host
    )
    path = F.coalesce(F.try_parse_url(url, F.lit("PATH")), F.lit(""))
    path = F.regexp_replace(path, _EXT_RE, "")
    path = F.regexp_extract(path, _PATH_CORE_RE, 0)
    path = F.regexp_replace(path, _TRAILING_RE, "")
    return F.concat(F.coalesce(host, F.lit("")), path)


def unify_url_id_py(url: str) -> str:
    """Plain-Python twin of :func:`unify_url_id_col` (test oracle)."""
    import re

    parts = urlsplit(url)
    path = re.sub(_EXT_RE, "", parts.path)
    m = re.search(_PATH_CORE_RE, path)
    path = m.group(0) if m else ""
    path = re.sub(_TRAILING_RE, "", path)
    netloc = parts.netloc
    if netloc.startswith("www."):
        netloc = netloc[4:]
    return f"{netloc}{path}"


# ---------------------------------------------------------------------------
# SURT (Sort-friendly URI Reordering Transform) + RFC-3986 normalization
# ---------------------------------------------------------------------------

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def surt_py(url: str) -> str:
    """RFC-3986-normalized SURT key: ``tld,domain,sub)/path?q=a&q=b``.

    Normalization: lowercase scheme+host, drop fragment, drop default
    port, percent-decode unreserved chars, sort query params, strip
    leading ``www.``; host labels reversed and comma-joined.
    """
    try:
        parts = urlsplit(url if "://" in url else "http://" + url)
        # parts.port parses lazily and raises on non-numeric/out-of-range
        # ports ('http://h:80x/') — one bad crawl URL must not kill a task.
        port = parts.port
    except ValueError:
        return url
    host = (parts.hostname or "").lower().rstrip(".")
    if host.startswith("www."):
        host = host[4:]
    scheme = (parts.scheme or "http").lower()
    portstr = (
        f":{port}" if port is not None and str(port) != _DEFAULT_PORTS.get(scheme)
        else ""
    )
    path = quote(unquote(parts.path or "/"), safe="/:@!$&'()*+,;=~-._") or "/"
    qs = parse_qsl(parts.query, keep_blank_values=True)
    query = urlencode(sorted(qs)) if qs else ""
    rev_host = ",".join(reversed(host.split("."))) if host else ""
    return f"{rev_host}{portstr}){path}" + (f"?{query}" if query else "")


def surt_udf():
    """Arrow-batched SURT canonicalizer (full query-sorting variant).

    Returned lazily: pandas_udf registration requires an active
    SparkSession, so modules must stay importable without one.
    """

    @pandas_udf("string")
    def _surt(urls: pd.Series) -> pd.Series:
        return urls.map(lambda u: surt_py(u) if isinstance(u, str) else None)

    return _surt


def surt_key_col(url: Column) -> Column:
    """Native-expression SURT fast path (no query-param sorting).

    Good enough as a partitioning / sort key at scale; exact SURT
    (sorted query) is :func:`surt_udf`. Kept JVM-side so the frontier's
    sort/partition keys never leave codegen.
    """
    host = F.lower(_host_col(url))
    host = F.when(host.startswith("www."), F.substring(host, 5, 2048)).otherwise(host)
    rev = F.concat_ws(",", F.reverse(F.split(host, r"\.")))
    path = F.coalesce(F.try_parse_url(url, F.lit("PATH")), F.lit("/"))
    query = F.try_parse_url(url, F.lit("QUERY"))
    return F.concat(
        rev,
        F.lit(")"),
        F.when(path == "", "/").otherwise(path),
        F.when(query.isNotNull() & (query != ""), F.concat(F.lit("?"), query)).otherwise(
            F.lit("")
        ),
    )


def host_of(url: Column) -> Column:
    """url_host_name (netloc incl. any www.) as native expression."""
    return _host_col(url)


def registered_domain_col(host: Column) -> Column:
    """Quick two-label heuristic — WRONG for ccTLD registrations
    (``foo.co.uk`` -> ``co.uk``). Use
    :func:`cmoncrawl_spark.functions.psl.with_registered_domain`
    (broadcast PSL snapshot, exact eTLD+1) anywhere the answer
    matters: politeness grouping, hot-domain salting, DOMAIN-match
    index queries. Kept only as a dependency-free scalar for ad-hoc
    exploration.
    """
    labels = F.split(host, r"\.")
    n = F.size(labels)
    return F.when(
        n >= 2,
        F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1)),
    ).otherwise(host)
