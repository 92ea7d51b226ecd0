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
  LISTS and distributes the files, but only ``path``/``length`` are
  selected (binaryFile prunes the ``content`` column), so shard bytes
  never ride a Spark row — no 2 GB row limit, no whole-shard
  materialization. Each task STREAM-parses its shard (pyarrow FS /
  local open + incremental gzip), so peak memory is
  O(``max_body_bytes``), not O(shard).
* Memory guards: per-record bodies are kept up to ``max_body_bytes``
  (flagged ``body_truncated`` — the Common-Crawl-style truncation
  contract); shards whose on-disk size exceeds ``max_shard_bytes``
  are skipped with a logged warning instead of OOMing a task.
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
import logging
import re
from collections.abc import Iterator

import pandas as pd  # noqa: F401 — resolves pandas_udf type hints

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

logger = logging.getLogger(__name__)

#: Per-record body cap (1 MiB — the Common Crawl WET/WAT-era truncation
#: scale): bytes beyond it are dropped and the record flags
#: ``body_truncated``. ``None`` disables the cap.
DEFAULT_MAX_BODY_BYTES = 1 << 20

#: Compressed-shard size guard (4 GiB): a rogue shard past it is skipped
#: with a logged warning — a bounded, observable gap beats an executor
#: OOM. ``None`` disables the guard.
DEFAULT_MAX_SHARD_BYTES = 4 << 30

#: read_warc flushes an Arrow batch to Spark once either threshold is
#: hit mid-shard, so task memory is bounded by the flush size plus one
#: capped record — never by the decompressed shard contents.
FLUSH_ROWS = 2_000
FLUSH_BYTES = 64 << 20

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
        T.StructField("body_truncated", T.BooleanType()),
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


class _RawAdapter(io.RawIOBase):
    """RawIOBase shim over any object with ``read(n)`` (pyarrow
    NativeFile, local file), with optional pushed-back head bytes —
    lets ``io.BufferedReader`` provide buffered read/readline for both
    plain and gzip shard streams."""

    def __init__(self, f, head: bytes = b""):
        self._f = f
        self._head = head

    def readable(self) -> bool:  # pragma: no cover - io protocol
        return True

    def readinto(self, b) -> int:
        if self._head:
            n = min(len(b), len(self._head))
            b[:n] = self._head[:n]
            self._head = self._head[n:]
            return n
        data = self._f.read(len(b))
        if not data:
            return 0
        b[: len(data)] = data
        return len(data)


def _record_stream(raw) -> io.BufferedReader | gzip.GzipFile:
    """Wrap a raw shard stream for incremental WARC parsing,
    transparently inflating gzip (multi-member — the warc.gz layout)."""
    head = raw.read(2) or b""
    buffered = io.BufferedReader(_RawAdapter(raw, head))
    if head == b"\x1f\x8b":
        return gzip.GzipFile(fileobj=buffered)
    return buffered


def parse_warc_stream(
    stream,
    max_records: int | None = None,
    max_body_bytes: int | None = DEFAULT_MAX_BODY_BYTES,
) -> Iterator[dict]:
    """Incrementally parse a WARC record stream. Framing is WARC/1.x:
    header block, CRLFCRLF, ``Content-Length`` payload bytes, CRLF CRLF
    record separator. Peak memory is O(record cap), never O(shard).
    Stops (yielding the parsed prefix) at the first malformed record —
    a truncated shard yields its good records, never an exception.
    Bodies past ``max_body_bytes`` are dropped and flagged
    ``body_truncated`` (``content_length`` keeps the true size)."""
    n_out = 0
    while max_records is None or n_out < max_records:
        # tolerate inter-record CRLF padding / locate the version line
        line = stream.readline()
        while line in (b"\r\n", b"\n"):
            line = stream.readline()
        if not line or not line.startswith(b"WARC/"):
            return
        headers: dict[str, str] = {}
        while True:
            ln = stream.readline()
            if not ln:
                return  # truncated inside a header block
            if ln in (b"\r\n", b"\n"):
                break
            k, _, v = ln.partition(b":")
            headers[k.strip().decode("latin-1", "replace").lower()] = v.strip().decode(
                "latin-1", "replace"
            )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            return
        if length < 0:
            return
        cap = length if max_body_bytes is None else min(length, max_body_bytes)
        kept = bytearray()
        remaining = length
        short = False
        while remaining > 0:
            chunk = stream.read(min(1 << 16, remaining))
            if not chunk:
                short = True
                break
            remaining -= len(chunk)
            if len(kept) < cap:
                kept.extend(chunk[: cap - len(kept)])
        if short:
            return  # truncated shard — keep the prefix
        status, http_ctype, body = _split_http_payload(bytes(kept))
        yield {
            "warc_type": headers.get("warc-type"),
            "record_id": headers.get("warc-record-id"),
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "content_type": headers.get("content-type"),
            "content_length": length,
            "http_status": status,
            "http_content_type": http_ctype,
            "body": body,
            "body_truncated": cap < length,
        }
        n_out += 1


def parse_warc_records(
    payload: bytes,
    max_records: int | None = None,
    max_body_bytes: int | None = None,
) -> list[dict]:
    """Parse an in-memory (possibly gzipped) WARC shard into record
    dicts — the bytes-level twin of :func:`parse_warc_stream`, kept for
    tests and small-shard callers. No body cap by default (the caller
    already holds the whole payload)."""
    out: list[dict] = []
    try:
        stream = _record_stream(io.BytesIO(payload))
        for rec in parse_warc_stream(
            stream, max_records=max_records, max_body_bytes=max_body_bytes
        ):
            out.append(rec)
    except Exception:  # noqa: BLE001 — corrupt gzip → parsed prefix
        pass
    return out


def _open_shard(path_str: str):
    """Open a shard URI for streaming. ``file:`` URIs (what binaryFile
    lists on local runs) open directly; anything else resolves through
    pyarrow's FileSystem (hdfs://, s3://, ...) so executors stream
    remote shards without materializing them."""
    if path_str.startswith("file:"):
        return open(re.sub(r"^file:/+", "/", path_str), "rb")
    if "://" not in path_str:
        return open(path_str, "rb")
    from pyarrow import fs as pafs

    fsys, p = pafs.FileSystem.from_uri(path_str)
    return fsys.open_input_stream(p)


def read_warc(
    spark: SparkSession,
    path: str,
    max_body_bytes: int | None = DEFAULT_MAX_BODY_BYTES,
    max_shard_bytes: int | None = DEFAULT_MAX_SHARD_BYTES,
) -> DataFrame:
    """Distributed WARC reader: ``binaryFile`` lists/distributes the
    shards (one task per shard — the gzip-member layout forbids byte
    splitting) but only ``path``/``length`` are read (content pruned),
    and each task STREAM-parses its shard via ``mapInPandas``, flushing
    an Arrow batch every ``FLUSH_ROWS`` records or ``FLUSH_BYTES`` of
    body bytes — peak task memory is O(flush threshold + max_body_bytes),
    NOT O(decompressed shard), so a legitimate ~1 GB crawl shard streams
    through in bounded batches and a 10 GB rogue shard cannot OOM a
    task (skipped with a logged warning past ``max_shard_bytes``).
    Zero shuffle; crawl size only adds map tasks."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield from _shard_record_batches(
                zip(pdf["path"], pdf["length"]),
                max_body_bytes=max_body_bytes,
                max_shard_bytes=max_shard_bytes,
            )

    files = spark.read.format("binaryFile").load(path).select("path", "length")
    return files.mapInPandas(batches, WARC_RECORD_SCHEMA)


def _shard_record_batches(
    shards,
    max_body_bytes: int | None,
    max_shard_bytes: int | None,
    flush_rows: int | None = None,
    flush_bytes: int | None = None,
) -> Iterator[pd.DataFrame]:
    """Stream-parse ``(path, size)`` shards, yielding a bounded pandas
    batch every ``flush_rows`` records or ``flush_bytes`` of body bytes
    (defaults: module FLUSH_ROWS / FLUSH_BYTES). This is what bounds
    read_warc task memory: a shard never materializes all its records
    at once, only the current flush window."""
    flush_rows = FLUSH_ROWS if flush_rows is None else flush_rows
    flush_bytes = FLUSH_BYTES if flush_bytes is None else flush_bytes
    cols = [f.name for f in WARC_RECORD_SCHEMA.fields]
    rows: list[dict] = []
    pending_bytes = 0
    for path_, size in shards:
        if max_shard_bytes is not None and size > max_shard_bytes:
            logger.warning(
                "skipping oversized WARC shard %s (%d bytes > cap %d)",
                path_,
                size,
                max_shard_bytes,
            )
            continue
        try:
            with _open_shard(str(path_)) as raw:
                stream = _record_stream(raw)
                for idx, rec in enumerate(
                    parse_warc_stream(stream, max_body_bytes=max_body_bytes)
                ):
                    rows.append({"shard": path_, "record_idx": idx, **rec})
                    pending_bytes += len(rec.get("body") or b"")
                    if len(rows) >= flush_rows or pending_bytes >= flush_bytes:
                        yield pd.DataFrame(rows, columns=cols)
                        rows, pending_bytes = [], 0
        except Exception:  # noqa: BLE001 — corrupt shard → prefix kept
            logger.warning("WARC shard %s ended early (corrupt?)", path_)
    if rows:
        yield pd.DataFrame(rows, columns=cols)


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
