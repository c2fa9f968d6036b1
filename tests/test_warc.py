"""WARC source: record framing via multi-char lineSep, header/payload
extraction, strict Content-Length verification, the documents adapter,
and the zero-Python plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_rtcef_spark.sources.warc import (
    read_warc,
    warc_responses_as_documents,
)


def _rec(headers: dict, payload: str) -> str:
    head = "".join(f"{k}: {v}\r\n" for k, v in headers.items())
    return f"WARC/1.0\r\n{head}\r\n{payload}\r\n\r\n"


def _write_fixture(tmp_path, torn: bool = False) -> str:
    body_html = "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n<html><body>hello web</body></html>"
    body_pdf = "HTTP/1.1 200 OK\r\nContent-Type: application/pdf\r\n\r\n%PDF-1.4 fake"
    recs = [
        _rec(
            {"WARC-Type": "warcinfo", "WARC-Record-ID": "<urn:uuid:0>",
             "Content-Length": "9"},
            "info text",
        ),
        _rec(
            {"WARC-Type": "request", "WARC-Target-URI": "http://example.com/a",
             "WARC-Record-ID": "<urn:uuid:1>",
             "Content-Length": str(len("GET /a HTTP/1.1\r\n\r\n"))},
            "GET /a HTTP/1.1\r\n\r\n",
        ),
        _rec(
            {"WARC-Type": "response", "WARC-Target-URI": "http://www.example.com/a",
             "WARC-Date": "2026-08-14T00:00:00Z", "WARC-Record-ID": "<urn:uuid:2>",
             "Content-Length": str(len(body_html))},
            body_html,
        ),
        _rec(
            {"WARC-Type": "response", "WARC-Target-URI": "http://other.org/doc.pdf",
             "WARC-Record-ID": "<urn:uuid:3>",
             "Content-Length": str(len(body_pdf))},
            body_pdf,
        ),
    ]
    if torn:
        recs.append(
            _rec(
                {"WARC-Type": "response", "WARC-Target-URI": "http://torn.example/",
                 "WARC-Record-ID": "<urn:uuid:4>", "Content-Length": "99999"},
                "HTTP/1.1 200 OK\r\n\r\nshort",
            )
        )
    p = tmp_path / "fixture.warc"
    p.write_text("".join(recs), newline="")
    return str(p)


def test_read_warc_fields(spark, tmp_path):
    df = read_warc(spark, _write_fixture(tmp_path)).orderBy("record_id")
    rows = {r["record_id"]: r for r in df.collect()}
    assert len(rows) == 4
    info = rows["<urn:uuid:0>"]
    assert info["record_type"] == "warcinfo"
    assert info["body"] == "info text"
    assert info["content_length"] == 9
    resp = rows["<urn:uuid:2>"]
    assert resp["record_type"] == "response"
    assert resp["target_uri"] == "http://www.example.com/a"
    assert resp["warc_date"] == "2026-08-14T00:00:00Z"
    assert resp["http_status"] == 200
    assert resp["http_content_type"] == "text/html"
    assert resp["body"] == "<html><body>hello web</body></html>"
    req = rows["<urn:uuid:1>"]
    assert req["record_type"] == "request"
    assert req["http_status"] is None
    assert req["body"] == ""  # request payload is headers-only


def test_strict_drops_torn_record(spark, tmp_path):
    path = _write_fixture(tmp_path, torn=True)
    assert read_warc(spark, path).count() == 5
    strict = read_warc(spark, path, strict=True)
    ids = [r["record_id"] for r in strict.collect()]
    assert "<urn:uuid:4>" not in ids and len(ids) == 4


def test_responses_as_documents(spark, tmp_path):
    docs = warc_responses_as_documents(spark, _write_fixture(tmp_path))
    rows = docs.collect()
    # only the text/html response survives (pdf filtered, www. stripped)
    assert len(rows) == 1
    r = rows[0]
    assert r["source"] == "example.com"
    assert r["text"] == "<html><body>hello web</body></html>"
    assert r["doc_id"] >= 0


def test_plan_is_jvm_only(spark, tmp_path):
    df = warc_responses_as_documents(spark, _write_fixture(tmp_path))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---- property: serialize -> parse round-trips arbitrary payloads ----

from hypothesis import given, settings, strategies as st

# printable payloads; excludes the record delimiter by construction
# (the documented framing assumption) but DOES include lone CRLFs,
# blank lines, and HTTP-looking prefixes
_payload = st.text(
    alphabet=st.characters(
        min_codepoint=32, max_codepoint=126, include_characters="\r\n"
    ),
    min_size=0,
    max_size=200,
).map(lambda s: s.replace("WARC/1.0", "WARC-1.0"))


@settings(max_examples=15, deadline=None)
@given(st.lists(_payload, min_size=1, max_size=6))
def test_warc_roundtrip_fuzz(spark, tmp_path_factory, payloads):
    tmp = tmp_path_factory.mktemp("warcfuzz")
    recs = []
    for i, p in enumerate(payloads):
        recs.append(
            _rec(
                {"WARC-Type": "resource", "WARC-Record-ID": f"<urn:uuid:{i}>",
                 "Content-Length": str(len(p))},
                p,
            )
        )
    path = tmp / "fuzz.warc"
    path.write_text("".join(recs), newline="")
    got = {
        r["record_id"]: r
        for r in read_warc(spark, str(path), strict=True).collect()
    }
    assert len(got) == len(payloads)
    for i, p in enumerate(payloads):
        r = got[f"<urn:uuid:{i}>"]
        assert r["body"] == p, (i, p, r["body"])
        assert r["content_length"] == len(p)


def test_http_prefix_without_blank_line_stays_raw(spark, tmp_path):
    """A payload that LOOKS like HTTP but has no header/body blank line
    must pass through untouched (the naive substring split would chop
    the first 3 characters)."""
    p = "GET no blank line here at all"
    rec = _rec(
        {"WARC-Type": "resource", "WARC-Record-ID": "<urn:uuid:9>",
         "Content-Length": str(len(p))},
        p,
    )
    path = tmp_path / "httpish.warc"
    path.write_text(rec, newline="")
    r = read_warc(spark, str(path), strict=True).collect()[0]
    assert r["body"] == p
    assert r["http_status"] is None
