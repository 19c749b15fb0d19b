"""WARC (ISO 28500) container ingestion — the Common-Crawl native format.

Common Crawl ships crawls as ``.warc.gz`` files with one gzip MEMBER per
record; the page table in BASELINE.json's input_hint is what falls out of
this reader + ``extract.extract_text``. No reference analog (the reference
starts from TSV triples); this closes the raw-crawl seam of the north star.

100-TB posture:

- **File-granular parallelism** via the ``binaryFile`` source: gzip
  members are not splittable, so one ~1 GB WARC per task is the standard
  Common-Crawl processing unit. A 10^12-doc crawl is ~10^5-10^6 WARC
  files — ample task parallelism for any executor count, with ZERO
  shuffles: the parse is a stateless Arrow-batched ``mapInPandas`` kernel
  (a pure function of the file bytes), and downstream consumers should
  project away ``html`` before their first exchange so payload bytes
  never ride a shuffle.
- **Byte identity starts here**: the emitted ``html`` column is exactly
  the record's payload bytes (HTTP body for ``response`` records, the
  raw block for ``conversion``/WET records) — the input_hint's
  byte-identical-text-per-url invariant is anchored on this column, and
  ``warc_record_bytes`` is the parser's pinned inverse (the rdfio
  roundtrip doctrine), so tests prove parse ∘ write = id.
- **Corruption resyncs, never kills a file**: the scanner skips to the
  next ``WARC/1.`` magic after a malformed header / bad length /
  truncated tail (the P4 malformed-tolerance posture) — one damaged
  record in a 1 GB container costs that record only.
"""

from __future__ import annotations

import re
import zlib
from collections.abc import Iterator
from datetime import datetime

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_GZIP_MAGIC = b"\x1f\x8b"
_MAGIC_RE = re.compile(rb"WARC/\d")
_CRLF2 = b"\r\n\r\n"

WARC_SCHEMA = (
    "warc_file STRING, rec_offset BIGINT, warc_type STRING, rec_id STRING, "
    "url STRING, warc_ts TIMESTAMP, mime STRING, http_status INT, html BINARY"
)


# --- writer (the parser's pinned inverse) ------------------------------------

def warc_record_bytes(
    url: str | None,
    ts_iso: str,
    payload: bytes,
    *,
    warc_type: str = "response",
    rec_id: str | None = None,
    http_status: int = 200,
    mime: str = "text/html",
    with_http: bool | None = None,
) -> bytes:
    """One WARC/1.0 record, deterministically rendered.

    ``response`` records wrap ``payload`` in an HTTP/1.1 message (the
    Common-Crawl layout); ``conversion`` (WET) and metadata-ish records
    carry the payload as the raw block. ``rec_id`` defaults to a pure
    function of (type, url, ts) so two builders emit identical bytes.
    """
    if with_http is None:
        with_http = warc_type == "response"
    if with_http:
        status_text = {200: "OK", 301: "Moved Permanently", 404: "Not Found"}.get(
            http_status, "Status"
        )
        block = (
            f"HTTP/1.1 {http_status} {status_text}\r\n"
            f"Content-Type: {mime}\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n"
        ).encode("latin-1") + payload
        block_type = "application/http; msgtype=response"
    else:
        block = payload
        block_type = mime
    if rec_id is None:
        rec_id = f"<urn:prase:{warc_type}:{url or 'none'}:{ts_iso}>"
    headers = ["WARC/1.0", f"WARC-Type: {warc_type}"]
    if url is not None:
        headers.append(f"WARC-Target-URI: {url}")
    headers += [
        f"WARC-Date: {ts_iso}",
        f"WARC-Record-ID: {rec_id}",
        f"Content-Type: {block_type}",
        f"Content-Length: {len(block)}",
    ]
    return "\r\n".join(headers).encode("utf-8") + _CRLF2 + block + _CRLF2


def gzip_member(data: bytes) -> bytes:
    """One deterministic gzip member (no mtime/filename — bit-stable)."""
    co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
    return co.compress(data) + co.flush()


# --- pure-python parse core ---------------------------------------------------

def _gunzip_members(data: bytes) -> bytes:
    """Concatenated-member gzip -> plaintext; a corrupt member ends the
    stream at the last good byte instead of raising (resync posture)."""
    out = []
    while data[:2] == _GZIP_MAGIC:
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            out.append(d.decompress(data))
            out.append(d.flush())
        except zlib.error:
            break
        data = d.unused_data
    return b"".join(out)


def _parse_http_block(block: bytes) -> tuple[int | None, str | None, bytes]:
    """HTTP/1.x message -> (status, content-type, body). Non-HTTP blocks
    pass through as the payload (status/mime None)."""
    if not block.startswith(b"HTTP/"):
        return None, None, block
    sep = block.find(_CRLF2)
    if sep < 0:
        return None, None, block
    head_lines = block[:sep].split(b"\r\n")
    status: int | None = None
    parts = head_lines[0].split(b" ", 2)
    if len(parts) >= 2 and parts[1].isdigit():
        status = int(parts[1])
    mime: str | None = None
    for ln in head_lines[1:]:
        if b":" in ln:
            k, v = ln.split(b":", 1)
            if k.strip().lower() == b"content-type":
                mime = v.strip().decode("utf-8", "replace")
                break
    return status, mime, block[sep + 4 :]


def _parse_ts(iso: str | None) -> datetime | None:
    if not iso:
        return None
    for fmt in ("%Y-%m-%dT%H:%M:%SZ", "%Y-%m-%dT%H:%M:%S.%fZ"):
        try:
            return datetime.strptime(iso, fmt)
        except ValueError:
            continue
    return None


def parse_warc_bytes(data: bytes) -> Iterator[dict]:
    """Sequential record scan over one WARC container (gzip or plain).

    Yields dicts with keys (rec_offset, warc_type, rec_id, url, warc_ts,
    mime, http_status, html). Malformed headers, non-integer/oversized
    Content-Length, and truncated tails resync to the next WARC magic.
    ``rec_offset`` is the record's byte offset in the DECOMPRESSED stream
    (stable across gzip-vs-plain storage of identical content).
    """
    buf = _gunzip_members(data) if data[:2] == _GZIP_MAGIC else data
    n = len(buf)
    pos = 0
    while pos < n:
        m = _MAGIC_RE.search(buf, pos)
        if m is None:
            return
        start = m.start()
        hdr_end = buf.find(_CRLF2, start)
        if hdr_end < 0:
            return
        headers: dict[str, str] = {}
        for ln in buf[start:hdr_end].split(b"\r\n")[1:]:
            if b":" not in ln:
                continue
            k, v = ln.split(b":", 1)
            headers[k.strip().lower().decode("latin-1")] = v.strip().decode(
                "utf-8", "replace"
            )
        clen_raw = headers.get("content-length", "")
        if not clen_raw.isdigit() or hdr_end + 4 + int(clen_raw) > n:
            pos = start + 5  # resync past this magic
            continue
        clen = int(clen_raw)
        block = buf[hdr_end + 4 : hdr_end + 4 + clen]
        warc_type = headers.get("warc-type", "").lower()
        block_type = headers.get("content-type", "")
        if warc_type in ("response", "request") and block_type.startswith(
            "application/http"
        ):
            status, mime, payload = _parse_http_block(block)
        else:
            status, mime, payload = None, block_type or None, block
        yield {
            "rec_offset": start,
            "warc_type": warc_type,
            "rec_id": headers.get("warc-record-id"),
            "url": headers.get("warc-target-uri"),
            "warc_ts": _parse_ts(headers.get("warc-date")),
            "mime": mime,
            "http_status": status,
            "html": payload,
        }
        pos = hdr_end + 4 + clen


# --- Spark plumbing -----------------------------------------------------------

def read_warc(
    spark: SparkSession, path: str, warc_types: tuple[str, ...] = ("response",)
) -> DataFrame:
    """WARC container glob -> one row per record of the requested types.

    ``binaryFile`` source (one file per row — gzip members are not
    splittable), then a stateless Arrow kernel; zero exchanges in the
    plan. Filter-by-type happens inside the kernel so skipped records
    (warcinfo/request/metadata) never materialize as Arrow rows.
    """
    types = {t.lower() for t in warc_types}
    binary = spark.read.format("binaryFile").load(path).select("path", "content")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = (
            "warc_file", "rec_offset", "warc_type", "rec_id",
            "url", "warc_ts", "mime", "http_status", "html",
        )
        for pdf in batches:
            rows: dict[str, list] = {c: [] for c in cols}
            for fpath, content in zip(pdf["path"], pdf["content"]):
                fname = str(fpath).rsplit("/", 1)[-1]
                for rec in parse_warc_bytes(bytes(content)):
                    if rec["warc_type"] not in types:
                        continue
                    rows["warc_file"].append(fname)
                    for c in cols[1:]:
                        rows[c].append(rec[c])
            yield pd.DataFrame(
                {
                    "warc_file": pd.Series(rows["warc_file"], dtype="string"),
                    "rec_offset": pd.Series(rows["rec_offset"], dtype="int64"),
                    "warc_type": pd.Series(rows["warc_type"], dtype="string"),
                    "rec_id": pd.Series(rows["rec_id"], dtype="string"),
                    "url": pd.Series(rows["url"], dtype="string"),
                    "warc_ts": pd.to_datetime(pd.Series(rows["warc_ts"])),
                    "mime": pd.Series(rows["mime"], dtype="string"),
                    "http_status": pd.array(rows["http_status"], dtype="Int32"),
                    "html": pd.Series(rows["html"], dtype="object"),
                }
            )

    return binary.mapInPandas(kernel, WARC_SCHEMA)


def parse_warc_stats(data: bytes) -> dict:
    """Per-container health summary for the manifest audit: record count
    by type, total payload bytes, and the number of RESYNC events (a
    magic marker skipped because of a malformed header / bad length) —
    the parser emits records best-effort, so a sagging record count or a
    nonzero resync count flags bit rot / truncated transfer per file."""
    buf = _gunzip_members(data) if data[:2] == _GZIP_MAGIC else data
    n = len(buf)
    pos = 0
    counts: dict[str, int] = {}
    payload_bytes = 0
    resyncs = 0
    while pos < n:
        m = _MAGIC_RE.search(buf, pos)
        if m is None:
            break
        start = m.start()
        hdr_end = buf.find(_CRLF2, start)
        if hdr_end < 0:
            resyncs += 1
            break
        headers: dict[str, str] = {}
        for ln in buf[start:hdr_end].split(b"\r\n")[1:]:
            if b":" in ln:
                k, v = ln.split(b":", 1)
                headers[k.strip().lower().decode("latin-1")] = v.strip().decode(
                    "utf-8", "replace"
                )
        clen_raw = headers.get("content-length", "")
        if not clen_raw.isdigit() or hdr_end + 4 + int(clen_raw) > n:
            resyncs += 1
            pos = start + 5
            continue
        wt = headers.get("warc-type", "").lower() or "unknown"
        counts[wt] = counts.get(wt, 0) + 1
        payload_bytes += int(clen_raw)
        pos = hdr_end + 4 + int(clen_raw)
    return {
        "decompressed_bytes": n,
        "records_by_type": counts,
        "n_records": sum(counts.values()),
        "payload_bytes": payload_bytes,
        "n_resyncs": resyncs,
    }


def warc_file_metrics(spark: SparkSession, path: str) -> DataFrame:
    """One row per container: (warc_file, n_records, n_responses,
    payload_bytes, decompressed_bytes, n_resyncs) — the audit pass to
    join against the crawl manifest (DEPLOY.md WARC health signal).
    Separate lightweight scan: it never materializes payloads as rows.
    """
    binary = spark.read.format("binaryFile").load(path).select("path", "content")
    schema = (
        "warc_file STRING, n_records BIGINT, n_responses BIGINT, "
        "payload_bytes BIGINT, decompressed_bytes BIGINT, n_resyncs BIGINT"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                s = parse_warc_stats(bytes(content))
                rows.append(
                    (
                        str(fpath).rsplit("/", 1)[-1],
                        s["n_records"],
                        s["records_by_type"].get("response", 0),
                        s["payload_bytes"],
                        s["decompressed_bytes"],
                        s["n_resyncs"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "warc_file", "n_records", "n_responses",
                    "payload_bytes", "decompressed_bytes", "n_resyncs",
                ],
            )

    return binary.mapInPandas(kernel, schema)


def warc_to_pages(records: DataFrame) -> DataFrame:
    """WARC records -> the PAGES shape (url, warc_ts, html, text, lang).

    text/lang are NULL here by design: ``extract.extract_text`` derives
    text from the byte-identical html, language-ID fills lang — both are
    downstream, so this projection stays a zero-exchange narrow map.
    """
    return records.select(
        "url",
        "warc_ts",
        "html",
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )


def wet_to_pages(records: DataFrame) -> DataFrame:
    """WET (``conversion``) records -> PAGES: Common Crawl's sibling
    format where the block already IS the extracted text, so ``text``
    is the UTF-8 decode of the byte-identical payload and ``html`` is
    NULL. Read with ``read_warc(path, warc_types=('conversion',))``.
    Zero-exchange narrow projection, like ``warc_to_pages``.
    """
    return records.select(
        "url",
        "warc_ts",
        F.lit(None).cast("binary").alias("html"),
        F.col("html").cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )
