"""WARC source — Common-Crawl-style crawl archives as a Spark DataFrame.

The input_hint table (url, warc_ts, html, ...) is what a crawl DELIVERS;
this reader is how it gets there from the wire format. WARC/1.0 (ISO
28500): each record is a ``WARC/1.0`` header block (named headers incl.
WARC-Type, WARC-Target-URI, WARC-Date, Content-Length), CRLF CRLF, then
exactly Content-Length payload bytes, then CRLF CRLF. For ``response``
records the payload is an HTTP/1.1 message whose body is the page bytes.

Parallelism model (the 100 TB contract): Common Crawl ships ``.warc.gz``
with ONE GZIP MEMBER PER RECORD, files ~1 GB, ~10^5 files per crawl — so
file-level parallelism is the natural splitting unit and record-level
splitting inside a file is unnecessary (a crawl has orders of magnitude
more files than a cluster has cores). Each task therefore reads whole
files via Spark's binaryFile source and parses records with an
Arrow-batched mapInPandas — the same narrow-map shape as the multimodal
decode plumbing. Multi-member gzip is decompressed with a zlib loop
(gzip.decompress handles only well-formed concatenations; raw zlib gives
per-member control and tolerates the trailing-garbage some writers emit).

Malformed records follow the multimodal error contract: never throw on a
bad record — emit the row with NULL fields and the error in ``warc_error``
so corruption at 10^12 scale is an observable column, not a dead executor.
"""

from __future__ import annotations

import gzip
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = (
    "warc_file string, record_type string, url string, warc_ts string, "
    "http_status int, content_type string, payload binary, "
    "warc_error string"
)

_GZIP_MAGIC = b"\x1f\x8b"


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a (possibly multi-member) gzip stream. Raises on a
    truncated final member — silently returning partial plaintext could
    drop whole records with no error row (review finding)."""
    out = []
    while data[:2] == _GZIP_MAGIC:
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        out.append(d.decompress(data))
        if not d.eof:
            raise ValueError("truncated gzip member")
        data = d.unused_data
        if not out[-1] and not data:
            break
    return b"".join(out)


def parse_warc_bytes(name: str, data: bytes) -> Iterator[tuple]:
    """Yield (warc_file, record_type, url, warc_ts, http_status,
    content_type, payload, warc_error) per record. Pure function of the
    bytes — unit-testable without Spark, reused verbatim by the
    mapInPandas batches."""
    if data[:2] == _GZIP_MAGIC:
        try:
            data = _gunzip_members(data)
        except Exception as exc:  # corrupt archive: one error row
            yield (name, None, None, None, None, None, None, f"gzip: {exc}")
            return
    pos = 0
    while True:
        # earliest marker of EITHER version — a 1.0-only search would skip
        # every 1.1 record in a mixed archive (review finding)
        starts = [
            s
            for s in (
                data.find(b"WARC/1.0\r\n", pos),
                data.find(b"WARC/1.1\r\n", pos),
            )
            if s >= 0
        ]
        if not starts:
            return
        start = min(starts)
        hdr_end = data.find(b"\r\n\r\n", start)
        if hdr_end < 0:
            yield (name, None, None, None, None, None, None, "truncated header")
            return
        headers: dict[str, str] = {}
        for line in data[start:hdr_end].split(b"\r\n")[1:]:
            k, sep, v = line.partition(b":")
            if sep:
                headers[k.strip().decode("ascii", "replace").lower()] = (
                    v.strip().decode("utf-8", "replace")
                )
        try:
            length = int(headers.get("content-length", ""))
            if length < 0:
                # a negative length would move the cursor BACKWARDS and
                # re-find the same record forever (review finding)
                raise ValueError(length)
        except ValueError:
            yield (name, None, None, None, None, None, None, "bad Content-Length")
            pos = hdr_end + 4
            continue
        body = data[hdr_end + 4 : hdr_end + 4 + length]
        pos = hdr_end + 4 + length
        rtype = headers.get("warc-type")
        url = headers.get("warc-target-uri")
        ts = headers.get("warc-date")
        status: int | None = None
        ctype: str | None = None
        payload = body
        err = None
        if len(body) < length:
            err = "truncated payload"
        elif rtype == "response":
            # peel the HTTP message: status line + headers, body after CRLFCRLF
            http_end = body.find(b"\r\n\r\n")
            if http_end < 0 or not body.startswith(b"HTTP/"):
                err = "bad http payload"
            else:
                head_lines = body[:http_end].split(b"\r\n")
                try:
                    status = int(head_lines[0].split(b" ")[1])
                except (IndexError, ValueError):
                    err = "bad http status line"
                for hl in head_lines[1:]:
                    hk, hsep, hv = hl.partition(b":")
                    if hsep and hk.strip().lower() == b"content-type":
                        ctype = hv.strip().decode("ascii", "replace").lower()
                        break
                payload = body[http_end + 4 :]
        yield (name, rtype, url, ts, status, ctype, payload, err)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Crawl archive scan: one task per .warc/.warc.gz file (binaryFile
    source), records parsed in Arrow batches. Returns WARC_SCHEMA rows."""
    files = spark.read.format("binaryFile").load(path)

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "warc_file", "record_type", "url", "warc_ts",
            "http_status", "content_type", "payload", "warc_error",
        ]
        for pdf in batches:
            rows = [
                rec
                for name, content in zip(pdf["path"], pdf["content"])
                for rec in parse_warc_bytes(name, bytes(content))
            ]
            out = pd.DataFrame(rows, columns=cols)
            out["http_status"] = out["http_status"].astype("Int32")
            yield out

    return files.select("path", "content").mapInPandas(
        _parse, schema=WARC_SCHEMA
    )


def warc_to_pages(warc: DataFrame) -> DataFrame:
    """Shape the raw record stream into the pipeline's pages contract
    (url, warc_ts, html, text, lang — fixtures.PAGES_SCHEMA): HTTP-200
    text/html response records only (a missing Content-Type passes — some
    servers omit it and the extractor handles non-HTML gracefully),
    WARC-Date parsed to timestamp, payload as the html bytes. A narrow
    projection — read_warc + this + the flagship quality_filter_plan is
    the full wire-to-keep/drop path."""
    from pyspark.sql import functions as F

    return warc.filter(
        (F.col("record_type") == "response")
        & (F.col("http_status") == 200)
        & F.col("warc_error").isNull()
        & (
            F.col("content_type").isNull()
            | F.col("content_type").startswith("text/html")
        )
    ).select(
        "url",
        F.to_timestamp("warc_ts").alias("warc_ts"),
        F.col("payload").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )
