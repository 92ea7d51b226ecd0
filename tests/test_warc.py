"""WARC source tests (sources/warc.py): framing, gzip member layouts,
HTTP payload split, truncation tolerance, and the Spark reader."""

from __future__ import annotations

import gzip


def _record(warc_type, body: bytes, uri=None, rid="<urn:uuid:1>", extra=()):
    headers = [
        b"WARC/1.0",
        b"WARC-Type: " + warc_type.encode(),
        b"WARC-Record-ID: " + rid.encode(),
        b"WARC-Date: 2026-08-14T00:00:00Z",
        b"Content-Length: " + str(len(body)).encode(),
    ]
    if uri:
        headers.append(b"WARC-Target-URI: " + uri.encode())
    headers.extend(extra)
    return b"\r\n".join(headers) + b"\r\n\r\n" + body + b"\r\n\r\n"


def _http_response(html: bytes, status=b"200 OK"):
    return (
        b"HTTP/1.1 " + status + b"\r\n"
        b"Content-Type: text/html; charset=UTF-8\r\n"
        b"Server: test\r\n\r\n" + html
    )


def _shard():
    return (
        _record("warcinfo", b"software: test\r\n")
        + _record("request", b"GET / HTTP/1.1\r\nHost: a.example\r\n\r\n", uri="http://a.example/")
        + _record(
            "response",
            _http_response(b"<html>hello corpus</html>"),
            uri="http://a.example/",
            rid="<urn:uuid:2>",
        )
        + _record(
            "response",
            _http_response(b"gone", status=b"404 Not Found"),
            uri="http://a.example/missing",
            rid="<urn:uuid:3>",
        )
    )


def test_parse_warc_records_plain_and_gzip_layouts():
    from kyiv_traffic_bigdata_spark.sources.warc import parse_warc_records

    shard = _shard()
    for payload in (
        shard,
        gzip.compress(shard),  # one member per shard
        # one member PER RECORD (the Common Crawl layout)
        b"".join(gzip.compress(r) for r in [shard[: len(_record('warcinfo', b'software: test\r\n'))], shard[len(_record('warcinfo', b'software: test\r\n')) :]]),
    ):
        recs = parse_warc_records(payload)
        assert [r["warc_type"] for r in recs] == ["warcinfo", "request", "response", "response"]
        ok = recs[2]
        assert ok["target_uri"] == "http://a.example/"
        assert ok["http_status"] == 200
        assert ok["http_content_type"] == "text/html; charset=UTF-8"
        assert ok["body"] == b"<html>hello corpus</html>"
        assert recs[3]["http_status"] == 404
        # request records get their HTTP framing split too: no status
        # line -> no status, and a GET carries no body
        assert recs[1]["http_status"] is None and recs[1]["body"] == b""


def test_parse_warc_truncation_and_junk_yield_prefix_never_raise():
    from kyiv_traffic_bigdata_spark.sources.warc import parse_warc_records

    shard = _shard()
    full = parse_warc_records(shard)
    # cutting anywhere returns a parseable prefix, never raises
    for cut in range(0, len(shard), 97):
        recs = parse_warc_records(shard[:cut])
        assert len(recs) <= len(full)
        for a, b in zip(recs, full):
            assert a == b
    assert parse_warc_records(b"not a warc") == []
    assert parse_warc_records(b"\x1f\x8bcorrupt gzip") == []


def test_read_warc_distributed_and_documents_bridge(spark, tmp_path):
    from kyiv_traffic_bigdata_spark.sources.warc import (
        read_warc,
        warc_responses_as_documents,
    )

    d = tmp_path / "crawl"
    d.mkdir()
    (d / "shard-00000.warc.gz").write_bytes(gzip.compress(_shard()))
    (d / "shard-00001.warc").write_bytes(_shard())

    recs = read_warc(spark, str(d))
    rows = recs.collect()
    assert len(rows) == 8  # 4 records x 2 shards
    assert {r.record_idx for r in rows} == {0, 1, 2, 3}

    docs = warc_responses_as_documents(recs).collect()
    # only the HTTP-200 responses survive, one per shard
    assert len(docs) == 2
    assert all(doc.text == "<html>hello corpus</html>" for doc in docs)
    assert all(doc.doc_id == "<urn:uuid:2>" for doc in docs)
    assert {doc.source.rsplit("/", 1)[-1] for doc in docs} == {
        "shard-00000.warc.gz",
        "shard-00001.warc",
    }


def test_documents_bridge_with_text_extraction(spark, tmp_path):
    from kyiv_traffic_bigdata_spark.sources.warc import (
        read_warc,
        warc_responses_as_documents,
    )

    d = tmp_path / "crawl2"
    d.mkdir()
    (d / "s.warc").write_bytes(_shard())
    recs = read_warc(spark, str(d))
    docs = warc_responses_as_documents(recs, extract_text=True).collect()
    assert len(docs) == 1
    assert docs[0].text == "hello corpus"  # tags stripped, whitespace collapsed
