"""WARC source: Common-Crawl-style archive files -> the pages table.

The engine's input contract is a table ``(url, warc_ts, html, ...)``,
but crawl data arrives as WARC files (ISO 28500, public spec): a
sequence of records, each with ``WARC/1.x`` + headers, a blank line,
``Content-Length`` payload bytes, and a ``\\r\\n\\r\\n`` trailer.
Common Crawl additionally gzips each record individually so archives
are splittable by member; both plain and per-record-gzip forms are
handled (concatenated-member decompression via zlib).

Spark shape: ``spark.read.format("binaryFile")`` over the archive glob
-> one ``mapInPandas`` kernel parsing whole files into page rows.  WARC
files are bounded (~1 GB in Common Crawl), so file-at-a-time parsing is
the standard unit of parallelism — parallelism comes from the number of
archives, exactly like the reference corpus layout (one artifact file
per work unit, ``batch/core/processor.py``).

No external warc library — the parser is ~60 lines over bytes, and the
synthetic writer below makes tests hermetic.
"""

from __future__ import annotations

import datetime as _dt
import gzip as _gzip
import io
import zlib

_CRLF2 = b"\r\n\r\n"


def _gunzip_members(data: bytes) -> bytes:
    """Decompress concatenated gzip members (per-record gzip WARCs).

    Real crawls contain the occasional truncated or corrupt member; a
    raised zlib.error here would fail the whole archive's Spark task
    (losing every good record), so decompression keeps everything
    successfully decoded up to the first bad member and stops."""
    out = []
    pos, n = 0, len(data)
    while pos < n:
        d = zlib.decompressobj(wbits=16 + zlib.MAX_WBITS)
        try:
            out.append(d.decompress(data[pos:]))
        except zlib.error:
            break  # corrupt member: keep the good prefix
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            break
        pos += consumed
    return b"".join(out)


def _parse_headers(block: bytes) -> dict:
    headers = {}
    for line in block.split(b"\r\n")[1:]:  # [0] is the WARC/1.x line
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().lower().decode("ascii", "replace")] = (
                v.strip().decode("utf-8", "replace")
            )
    return headers


def _http_body(payload: bytes) -> bytes:
    """HTTP response payload -> body (headers stripped)."""
    cut = payload.find(_CRLF2)
    return payload[cut + 4:] if cut >= 0 else payload


def parse_warc_bytes(data: bytes) -> list:
    """WARC bytes (plain or per-record gzip) -> list of
    {url, warc_ts, html} dicts for response records."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    pages = []
    pos, n = 0, len(data)
    while pos < n:
        start = data.find(b"WARC/", pos)
        if start < 0:
            break
        head_end = data.find(_CRLF2, start)
        if head_end < 0:
            break
        headers = _parse_headers(data[start:head_end])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break  # unrecoverable framing
        payload = data[head_end + 4 : head_end + 4 + length]
        pos = head_end + 4 + length
        if headers.get("warc-type") == "response" and "warc-target-uri" in headers:
            ts = None
            raw_ts = headers.get("warc-date", "")
            try:
                ts = _dt.datetime.fromisoformat(raw_ts.replace("Z", "+00:00"))
                ts = ts.replace(tzinfo=None)
            except ValueError:
                pass
            pages.append({
                "url": headers["warc-target-uri"],
                "warc_ts": ts,
                "html": _http_body(payload),
            })
    return pages


WARC_PAGES_SCHEMA = "url string, warc_ts timestamp, html binary"


def read_warc(spark, path):
    """Archive glob -> DataFrame(url, warc_ts, html), ready for
    extract()/extract_fused()."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("content")

    def parse(batches):
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                rows.extend(parse_warc_bytes(bytes(content)))
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html"])

    return files.mapInPandas(parse, schema=WARC_PAGES_SCHEMA)


# ---------------------------------------------------------------------------
# synthetic writer (tests)
# ---------------------------------------------------------------------------

def synth_warc(pages, per_record_gzip: bool = False) -> bytes:
    """pages: iterable of {url, warc_ts, html} -> WARC bytes."""
    out = io.BytesIO()
    for p in pages:
        ts = p.get("warc_ts") or _dt.datetime(2024, 1, 1)
        body = p["html"] if isinstance(p["html"], bytes) else p["html"].encode()
        http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body)
        head = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + f"WARC-Target-URI: {p['url']}\r\n".encode()
            + f"WARC-Date: {ts.isoformat()}Z\r\n".encode()
            + b"Content-Type: application/http; msgtype=response\r\n"
            + f"Content-Length: {len(http)}\r\n".encode()
            + b"\r\n"
        )
        record = head + http + b"\r\n\r\n"
        if per_record_gzip:
            buf = io.BytesIO()
            with _gzip.GzipFile(fileobj=buf, mode="wb") as g:
                g.write(record)
            record = buf.getvalue()
        out.write(record)
    return out.getvalue()
