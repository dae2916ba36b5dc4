"""AWS Signature Version 4 signing client (closes SURVEY §2 S4's
signed-private-bucket delta).

The reference's ``S3Dao`` authenticates via boto3 sessions
(/root/reference/cmoncrawl/processor/dao/s3.py:30-101); this engine's
DAO layer instead takes any injected ``client(url, headers) ->
(status, bytes)`` (sources/dao.py:159). :func:`sigv4_client` is that
injectable client for SIGNED access: it wraps a transport client and
adds the three SigV4 headers (``x-amz-date``, ``x-amz-content-sha256``,
``Authorization``) computed per the public AWS SigV4 specification
(docs.aws.amazon.com/IAM/latest/UserGuide/create-signed-request.html)
— pure stdlib ``hmac``/``hashlib``, no boto3 (not in this container).

Usage (executor-side, via the dao_factory pattern)::

    dao_factory = lambda: HTTPRangeDAO(
        "https://my-bucket.s3.us-east-1.amazonaws.com",
        client=sigv4_client(
            access_key, secret_key, region="us-east-1",
            token=session_token,          # optional STS
        ),
    )
    fetch_ranges(records, dao_factory)

Scale note: signing is O(1) driver-free per request (a few HMACs);
credentials travel to executors inside the pickled factory closure —
the same trust boundary as boto3 env credentials on a cluster.
"""

from __future__ import annotations

import hashlib
import hmac
from collections.abc import Callable
from datetime import datetime, timezone
from urllib.parse import quote, unquote, urlsplit

_ALGO = "AWS4-HMAC-SHA256"
_EMPTY_SHA256 = hashlib.sha256(b"").hexdigest()


def _hmac(key: bytes, msg: str) -> bytes:
    return hmac.new(key, msg.encode(), hashlib.sha256).digest()


def signing_key(secret_key: str, date: str, region: str, service: str) -> bytes:
    """kSigning = HMAC-chain over date/region/service (AWS SigV4 spec)."""
    k = _hmac(f"AWS4{secret_key}".encode(), date)
    k = _hmac(k, region)
    k = _hmac(k, service)
    return _hmac(k, "aws4_request")


def canonical_request(
    method: str, url: str, headers: dict[str, str], payload_sha256: str
) -> tuple[str, str]:
    """(canonical_request, signed_headers) per the SigV4 spec.

    The canonical URI is the path double-encoded except '/' (S3 rule:
    S3 uses single URI-encoding); query params sorted & encoded.

    CONTRACT: ``url`` must be percent-ENCODED (the decode-once-then-
    re-encode below is what makes signing correct for keys containing
    escaped characters). The flip side is inherent to that ambiguity:
    an UNencoded key whose raw name literally contains a valid escape
    (an object actually named ``report%2Fv1``) would be decoded and
    signed as ``report/v1``. Callers must pre-encode such keys
    (``report%252Fv1``) — the same one-decode choice
    ``functions/urls.py`` makes for URL canonicalization, so one rule
    holds engine-wide.
    """
    parts = urlsplit(url)
    # S3-style: encode each path segment exactly once, keep '/'. The
    # incoming URL is typically already percent-encoded, so unquote
    # first — otherwise '%' itself gets re-encoded and S3 rejects the
    # signature for keys containing encoded characters.
    canon_uri = quote(unquote(parts.path or "/"), safe="/-_.~")
    q = sorted(
        tuple(p.split("=", 1)) if "=" in p else (p, "")
        for p in parts.query.split("&")
        if p
    )
    canon_query = "&".join(
        f"{quote(unquote(k), safe='-_.~')}={quote(unquote(v), safe='-_.~')}"
        for k, v in q
    )
    lower = {k.lower().strip(): " ".join(v.split()) for k, v in headers.items()}
    signed = ";".join(sorted(lower))
    canon_headers = "".join(f"{k}:{lower[k]}\n" for k in sorted(lower))
    req = "\n".join(
        [method, canon_uri, canon_query, canon_headers, signed, payload_sha256]
    )
    return req, signed


def sign_headers(
    method: str,
    url: str,
    headers: dict[str, str],
    access_key: str,
    secret_key: str,
    region: str,
    service: str = "s3",
    token: str | None = None,
    payload_sha256: str = _EMPTY_SHA256,
    now: datetime | None = None,
) -> dict[str, str]:
    """Return ``headers`` + the SigV4 auth headers for this request.

    Deterministic given ``now`` (tests pin it); pure function — safe
    to call per-request inside executor partitions.
    """
    if now is None:
        now = datetime.now(timezone.utc)
    amz_date = now.strftime("%Y%m%dT%H%M%SZ")
    date = now.strftime("%Y%m%d")
    host = urlsplit(url).netloc
    out = dict(headers)
    out["host"] = host
    out["x-amz-date"] = amz_date
    out["x-amz-content-sha256"] = payload_sha256
    if token is not None:
        out["x-amz-security-token"] = token
    canon, signed = canonical_request(method, url, out, payload_sha256)
    scope = f"{date}/{region}/{service}/aws4_request"
    string_to_sign = "\n".join(
        [_ALGO, amz_date, scope, hashlib.sha256(canon.encode()).hexdigest()]
    )
    sig = hmac.new(
        signing_key(secret_key, date, region, service),
        string_to_sign.encode(),
        hashlib.sha256,
    ).hexdigest()
    out["Authorization"] = (
        f"{_ALGO} Credential={access_key}/{scope}, "
        f"SignedHeaders={signed}, Signature={sig}"
    )
    del out["host"]  # urllib sets Host itself; it was signed above
    return out


def sigv4_client(
    access_key: str,
    secret_key: str,
    region: str,
    service: str = "s3",
    token: str | None = None,
    transport: Callable[[str, dict[str, str]], tuple[int, bytes]] | None = None,
    _now: Callable[[], datetime] | None = None,
):
    """An injectable signing client for :class:`HTTPRangeDAO`.

    Wraps ``transport`` (default: the stdlib urllib client) and signs
    every GET. Matches the DAO client contract exactly:
    ``(url, headers) -> (status, bytes)``.
    """
    if transport is None:
        from cmoncrawl_spark.sources.dao import _stdlib_http_client

        transport = _stdlib_http_client()

    def client(url: str, headers: dict[str, str]) -> tuple[int, bytes]:
        signed = sign_headers(
            "GET",
            url,
            headers,
            access_key,
            secret_key,
            region,
            service=service,
            token=token,
            now=_now() if _now else None,
        )
        return transport(url, signed)

    return client
