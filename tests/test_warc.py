"""From-scratch WARC container kernel (kernel/warc.py).

Evidence model mirrors the codec suites: writer-twin roundtrips across
all three public layouts (per-member gzip — the Common Crawl shape —
whole-file gzip, uncompressed), hand-built records for reader-only
grammar (WARC 1.1 angle-quoted URIs, tolerated trailing CRLFs), and
the untrusted-input containment contract (ValueError for malformed
streams). The Spark surface (operators/webcorpus.py) is value-hashed
end-to-end by the warc_ingest_pipeline / url_* oracles in
tests/test_oracle_parity.py."""

import zlib

import pytest

from gmft_spark.kernel.warc import (
    build_warc,
    http_response,
    parse_warc,
)
from gmft_spark.operators.webcorpus import _page_html, _url_for


def _docs(n=7):
    return [
        (_url_for(d), _page_html(d, f"body text {d} alpha beta").encode())
        for d in range(n)
    ]


@pytest.mark.parametrize("gz", [True, False])
def test_roundtrip_layouts(gz):
    docs = _docs()
    data = build_warc(docs, gzip_members=gz)
    recs = parse_warc(data)
    types = [r.warc_type for r in recs]
    assert types[0] == "warcinfo"
    assert types.count("request") == len(docs)
    assert types.count("response") == len(docs)
    resp = [r for r in recs if r.warc_type == "response"]
    for (url, html), r in zip(docs, resp):
        assert r.target_uri == url
        status, hdrs, body = http_response(r.block)
        assert status == 200
        assert hdrs["content-type"].startswith("text/html")
        assert body == html


def test_whole_file_gzip_layout():
    plain = build_warc(_docs(3), gzip_members=False)
    c = zlib.compressobj(6, zlib.DEFLATED, 31)
    whole = c.compress(plain) + c.flush()
    assert len(parse_warc(whole)) == len(parse_warc(plain)) == 7


def test_no_request_records():
    recs = parse_warc(build_warc(_docs(2), with_requests=False))
    assert [r.warc_type for r in recs] == ["warcinfo", "response", "response"]


def test_angle_quoted_target_uri():
    # WARC 1.1 writers may angle-quote the URI; the reader strips it
    block = b"HTTP/1.1 200 OK\r\n\r\nhi"
    rec = (
        b"WARC/1.1\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: <https://example.com/a>\r\n"
        + f"Content-Length: {len(block)}\r\n\r\n".encode()
        + block
        + b"\r\n\r\n"
    )
    (r,) = parse_warc(rec)
    assert r.target_uri == "https://example.com/a"
    status, hdrs, body = http_response(r.block)
    assert (status, body) == (200, b"hi")


def test_trailing_crlf_tolerated():
    data = build_warc(_docs(1), gzip_members=False) + b"\r\n\r\n"
    assert len(parse_warc(data)) == 3


def test_containment():
    good = build_warc(_docs(2))
    with pytest.raises(ValueError):
        parse_warc(b"NOTWARC/1.0\r\n\r\n")
    with pytest.raises(ValueError):
        parse_warc(b"WARC/1.0\r\nWARC-Type: response\r\n\r\n")  # no length
    with pytest.raises(ValueError):
        parse_warc(
            b"WARC/1.0\r\nContent-Length: 999\r\n\r\nxx\r\n\r\n"
        )  # block outruns file
    with pytest.raises(ValueError):
        parse_warc(
            b"WARC/1.0\r\nContent-Length: 2\r\n\r\nxxNOSEP"
        )  # missing record separator
    with pytest.raises(ValueError):
        parse_warc(b"\x1f\x8b\x08rubbish-not-gzip")
    with pytest.raises(ValueError):
        parse_warc(good[: len(good) - 8])  # truncated final member
    with pytest.raises(ValueError):
        http_response(b"HTTP/1.1 200 OK\r\nno-terminator")
    with pytest.raises(ValueError):
        http_response(b"GOPHER 200\r\n\r\nx")


def test_http_response_headers_lowercased():
    status, hdrs, body = http_response(
        b"HTTP/1.1 404 Not Found\r\nX-Thing: A\r\nContent-Type: a/b\r\n\r\n"
    )
    assert status == 404
    assert hdrs == {"x-thing": "A", "content-type": "a/b"}
    assert body == b""


def test_wet_conversion_records():
    from gmft_spark.kernel.warc import build_wet

    docs = [
        ("https://a.example/x", "extracted text one"),
        ("https://b.example/y", "unicode ünïcode body"),
    ]
    recs = parse_warc(build_wet(docs))
    assert [r.warc_type for r in recs] == [
        "warcinfo", "conversion", "conversion",
    ]
    for (url, text), r in zip(docs, recs[1:]):
        assert r.target_uri == url
        assert r.block.decode("utf-8") == text
        assert r.headers["content-type"] == "text/plain"


def test_cdx_index_random_access():
    from gmft_spark.kernel.warc import build_warc_indexed, surt_key

    docs = _docs(9)
    blob, entries = build_warc_indexed(docs)
    assert len(entries) == 9
    # whole-file parse sees warcinfo + responses; every index entry's
    # slice parses standalone to exactly its record
    assert len(parse_warc(blob)) == 10
    for (url, html), e in zip(docs, entries):
        assert e["url"] == url
        assert e["urlkey"] == surt_key(url)
        (rec,) = parse_warc(blob[e["offset"] : e["offset"] + e["length"]])
        assert rec.warc_type == "response"
        assert rec.target_uri == url
        _status, _hdrs, body = http_response(rec.block)
        assert body == html
    # offsets are strictly increasing and tile the file exactly
    end = entries[0]["offset"]
    for e in entries:
        assert e["offset"] == end
        end += e["length"]
    assert end == len(blob)


def test_surt_key_shape():
    from gmft_spark.kernel.warc import surt_key

    assert surt_key("https://WWW.Site3.CO.UK:443/Docs/5?Ref=1#frag") == (
        "uk,co,site3,www)/docs/5?ref=1"
    )
    assert surt_key("http://a.example.com/") == "com,example,a)/"
    assert surt_key("https://x.org/p/q") == "org,x)/p/q"
