"""SigV4 signing client: AWS-documented golden vector + an offline
auth-enforcing Range server driven through HTTPRangeDAO (the signed
private-bucket path of SURVEY §2 S4; reference dao/s3.py:30-101 uses
boto3 for the same)."""

from __future__ import annotations

import hashlib
import hmac
import threading
from datetime import datetime, timezone

import pytest

from cmoncrawl_spark.sources.sigv4 import (
    canonical_request,
    sign_headers,
    signing_key,
    sigv4_client,
)

# The published AWS SigV4 example request (create-signed-request docs /
# the retired sigv4-test-suite 'get-vanilla-query-order-key-case'
# family): GET https://iam.amazonaws.com/?Action=ListUsers&Version=
# 2010-05-08 at 20150830T123600Z with AKIDEXAMPLE — expected signature
# 5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7.
AWS_DOC_SECRET = "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY"
AWS_DOC_SIG = "5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7"


def test_sigv4_aws_documentation_golden_vector():
    url = "https://iam.amazonaws.com/?Action=ListUsers&Version=2010-05-08"
    headers = {
        "host": "iam.amazonaws.com",
        "content-type": "application/x-www-form-urlencoded; charset=utf-8",
        "x-amz-date": "20150830T123600Z",
    }
    empty_sha = hashlib.sha256(b"").hexdigest()
    canon, signed = canonical_request("GET", url, headers, empty_sha)
    assert signed == "content-type;host;x-amz-date"
    string_to_sign = "\n".join(
        [
            "AWS4-HMAC-SHA256",
            "20150830T123600Z",
            "20150830/us-east-1/iam/aws4_request",
            hashlib.sha256(canon.encode()).hexdigest(),
        ]
    )
    key = signing_key(AWS_DOC_SECRET, "20150830", "us-east-1", "iam")
    sig = hmac.new(key, string_to_sign.encode(), hashlib.sha256).hexdigest()
    assert sig == AWS_DOC_SIG


def _serve_signed(blob: bytes, access_key: str, secret_key: str, region: str):
    """Range server that REJECTS (403) any request whose SigV4
    signature it cannot reproduce from the shared secret — i.e. it
    verifies the client the way S3 does, offline."""
    import http.server

    class H(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            auth = self.headers.get("Authorization", "")
            amz_date = self.headers.get("x-amz-date")
            payload_sha = self.headers.get("x-amz-content-sha256")
            ok = False
            if auth.startswith("AWS4-HMAC-SHA256") and amz_date:
                now = datetime.strptime(amz_date, "%Y%m%dT%H%M%SZ").replace(
                    tzinfo=timezone.utc
                )
                url = f"http://{self.headers['Host']}{self.path}"
                base = {
                    k: self.headers[k]
                    for k in ("Range",)
                    if self.headers.get(k)
                }
                expect = sign_headers(
                    "GET", url, base, access_key, secret_key, region,
                    payload_sha256=payload_sha, now=now,
                )
                ok = hmac.compare_digest(expect["Authorization"], auth)
            if not ok:
                self.send_response(403)
                self.end_headers()
                return
            rng = self.headers.get("Range")
            if rng:
                lo, hi = rng.split("=")[1].split("-")
                data = blob[int(lo) : int(hi) + 1]
                self.send_response(206)
            else:
                data = blob
                self.send_response(200)
            self.end_headers()
            self.wfile.write(data)

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}"


def test_http_range_dao_with_sigv4_client():
    from cmoncrawl_spark.sources.dao import HTTPRangeDAO

    blob = bytes(range(256)) * 4
    srv, base = _serve_signed(blob, "AKIDEXAMPLE", AWS_DOC_SECRET, "us-east-1")
    try:
        dao = HTTPRangeDAO(
            base,
            client=sigv4_client("AKIDEXAMPLE", AWS_DOC_SECRET, "us-east-1"),
        )
        assert dao.fetch("bucketkey.warc.gz", 10, 16) == blob[10:26]
        assert dao.fetch("bucketkey.warc.gz", 0, 4) == blob[:4]
        # unsigned access is refused — the server really checks
        unsigned = HTTPRangeDAO(base)
        with pytest.raises(ValueError, match="HTTP 403"):
            unsigned.fetch("bucketkey.warc.gz", 10, 16)
        # wrong secret is refused
        bad = HTTPRangeDAO(
            base, client=sigv4_client("AKIDEXAMPLE", "nope", "us-east-1")
        )
        with pytest.raises(ValueError, match="HTTP 403"):
            bad.fetch("bucketkey.warc.gz", 10, 16)
    finally:
        srv.shutdown()


def test_sigv4_session_token_and_determinism():
    now = datetime(2023, 3, 1, 12, 0, 0, tzinfo=timezone.utc)
    h1 = sign_headers(
        "GET", "https://b.s3.us-east-1.amazonaws.com/k", {"Range": "bytes=0-9"},
        "AK", "SK", "us-east-1", token="TOK", now=now,
    )
    h2 = sign_headers(
        "GET", "https://b.s3.us-east-1.amazonaws.com/k", {"Range": "bytes=0-9"},
        "AK", "SK", "us-east-1", token="TOK", now=now,
    )
    assert h1 == h2  # pure function of inputs
    assert h1["x-amz-security-token"] == "TOK"
    assert "x-amz-security-token" in h1["Authorization"]  # token is signed
    assert "host" not in h1  # urllib re-adds Host; it WAS signed


def test_canonical_request_mixed_valueless_and_kv_params():
    """'?acl&versionId=1' used to crash sorted() (list vs tuple); the
    valueless param canonicalizes as 'acl=' per the SigV4 spec."""
    canon, _signed = canonical_request(
        "GET",
        "https://bucket.s3.amazonaws.com/key?acl&versionId=1",
        {"host": "bucket.s3.amazonaws.com"},
        hashlib.sha256(b"").hexdigest(),
    )
    assert canon.splitlines()[2] == "acl=&versionId=1"


def test_canonical_request_no_double_encoding():
    """A pre-percent-encoded path/query must be encoded exactly once:
    '%20' stays '%20' (not '%2520'), and a literal-space query value
    encodes to '%20'."""
    canon, _ = canonical_request(
        "GET",
        "https://b.s3.amazonaws.com/my%20key?prefix=a%2Fb",
        {"host": "b.s3.amazonaws.com"},
        hashlib.sha256(b"").hexdigest(),
    )
    lines = canon.splitlines()
    assert lines[1] == "/my%20key"
    assert lines[2] == "prefix=a%2Fb"
