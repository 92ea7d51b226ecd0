"""WARC (Web ARChive) source — the Common Crawl ingestion path.

The reference pipeline ingests live city feeds; a training-data pipeline
at 100 TB ingests web crawls, and the interchange format there is WARC
(ISO 28500: the format Common Crawl publishes). This module reads
``.warc`` / ``.warc.gz`` shards into typed DataFrames with pure-stdlib
parsing — no external warc library.

Scale design — the unit of parallelism is the SHARD, not the byte range:

* WARC.gz files are concatenated gzip members and cannot be split at
  arbitrary offsets, so each file is one task (Common Crawl shards are
  ~1 GB — the natural task size). ``spark.read.format("binaryFile")``
  lists and distributes the files; record parsing runs inside
  ``mapInPandas`` so a 100k-shard crawl is a 100k-task map with zero
  shuffle.
* Record framing is Content-Length based (never a delimiter scan), so
  parsing is O(bytes) with no pathological inputs.
* Malformed records / truncated shards follow the repo's
  log-and-continue stance: bad shards yield their parseable prefix, a
  corrupt record ends that shard's parse, and nothing throws inside a
  batch.

The HTTP-response payload split (`http_headers` / body) is included
because the body is what every downstream text operator (dedup, quality
gates, language ID) actually consumes.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator

import pandas as pd  # noqa: F401 — resolves pandas_udf type hints

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: Output schema of :func:`read_warc` — one row per WARC record.
WARC_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.StringType()),
        T.StructField("record_idx", T.IntegerType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("content_length", T.LongType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("http_content_type", T.StringType()),
        T.StructField("body", T.BinaryType()),
    ]
)

_CRLF2 = b"\r\n\r\n"


def _split_http_payload(block: bytes):
    """(status, content_type, body) for an HTTP message block, or
    (None, None, block) when the block is not HTTP-framed."""
    if not (block.startswith(b"HTTP/") or block.startswith(b"GET ") or block.startswith(b"POST ")):
        return None, None, block
    head, sep, body = block.partition(_CRLF2)
    if not sep:
        return None, None, block
    lines = head.split(b"\r\n")
    status = None
    if lines[0].startswith(b"HTTP/"):
        parts = lines[0].split()
        if len(parts) >= 2 and parts[1].isdigit():
            status = int(parts[1])
    ctype = None
    for ln in lines[1:]:
        k, _, v = ln.partition(b":")
        if k.strip().lower() == b"content-type":
            ctype = v.strip().decode("latin-1", "replace")
            break
    return status, ctype, body


def parse_warc_records(payload: bytes, max_records: int | None = None) -> list[dict]:
    """Parse a (possibly gzipped, possibly multi-member) WARC shard into
    record dicts. Framing is WARC/1.x: header block, CRLFCRLF,
    ``Content-Length`` payload bytes, CRLF CRLF record separator.
    Stops (returning the parsed prefix) at the first malformed record —
    a truncated shard yields its good records, never an exception."""
    if payload[:2] == b"\x1f\x8b":
        try:
            # gzip.decompress consumes ALL concatenated members — the
            # warc.gz layout (one member per record or per shard)
            payload = gzip.decompress(payload)
        except Exception:  # noqa: BLE001 — undecodable shard → no records
            return []
    out: list[dict] = []
    i, n = 0, len(payload)
    while i < n:
        # tolerate inter-record CRLF padding
        while i < n and payload[i : i + 2] == b"\r\n":
            i += 2
        if i >= n:
            break
        if not payload.startswith(b"WARC/", i):
            break
        head_end = payload.find(_CRLF2, i)
        if head_end < 0:
            break
        headers: dict[str, str] = {}
        for ln in payload[i:head_end].split(b"\r\n")[1:]:
            k, _, v = ln.partition(b":")
            headers[k.strip().decode("latin-1", "replace").lower()] = v.strip().decode(
                "latin-1", "replace"
            )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break
        body_start = head_end + 4
        if body_start + length > n:
            break  # truncated shard — keep the prefix
        block = payload[body_start : body_start + length]
        status, http_ctype, body = _split_http_payload(block)
        out.append(
            {
                "warc_type": headers.get("warc-type"),
                "record_id": headers.get("warc-record-id"),
                "target_uri": headers.get("warc-target-uri"),
                "warc_date": headers.get("warc-date"),
                "content_type": headers.get("content-type"),
                "content_length": length,
                "http_status": status,
                "http_content_type": http_ctype,
                "body": body,
            }
        )
        i = body_start + length
        if max_records is not None and len(out) >= max_records:
            break
    return out


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC reader: ``binaryFile`` lists/distributes the
    shards (one task per shard — the gzip-member layout forbids byte
    splitting), ``mapInPandas`` parses records. Zero shuffle; crawl
    size only adds map tasks."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                for idx, rec in enumerate(parse_warc_records(bytes(content))):
                    rows.append({"shard": path_, "record_idx": idx, **rec})
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_RECORD_SCHEMA.fields]
            )

    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return files.mapInPandas(batches, WARC_RECORD_SCHEMA)


def warc_responses_as_documents(
    records: DataFrame, extract_text: bool = False
) -> DataFrame:
    """Project HTTP 200 response records into the repo's ``documents``
    shape: (doc_id = record_id, text, uri, source = shard) — the bridge
    from crawl ingest to every text operator (dedup, quality gates,
    lang-ID). ``extract_text=True`` additionally runs
    functions.web.html_to_text over HTML bodies (non-HTML bodies pass
    through raw) — the full crawl→corpus path in one map-only plan.
    Real pipelines plug charset detection in here; latin-1 is the
    lossless byte-preserving default decode."""
    from pyspark.sql import functions as F

    text = F.decode(F.col("body"), "ISO-8859-1")
    if extract_text:
        from ..functions.web import html_to_text

        is_html = F.lower(F.coalesce(F.col("http_content_type"), F.lit(""))).contains(
            "text/html"
        )
        text = F.when(is_html, html_to_text(text)).otherwise(text)
    return (
        records.where(
            (F.col("warc_type") == "response") & (F.col("http_status") == 200)
        )
        .select(
            F.col("record_id").alias("doc_id"),
            text.alias("text"),
            F.col("target_uri").alias("uri"),
            F.col("shard").alias("source"),
        )
    )
