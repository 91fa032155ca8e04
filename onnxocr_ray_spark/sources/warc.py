"""WARC container ingestion (the crawl wire format behind `warc_ts`).

Common-Crawl-style corpora arrive as WARC 1.0 files: back-to-back
records, each one a header block (``WARC/1.0`` + RFC-822-ish named
fields), a blank line, then exactly ``Content-Length`` payload bytes —
for ``WARC-Type: response`` the payload is itself a full HTTP response
(status line, headers, body). On the wire each record is its own gzip
member and the members are concatenated, so a reader can split records
without decompressing the whole file.

This module makes that format a first-class source:

- ``synth_warc`` — deterministic synthesis from ``documents.text``
  (build brief: no external data): one gzip member per record,
  ``mtime=0`` pinned so bytes are reproducible, real HTTP envelope with
  a correct nested Content-Length. Parsing must be structural: payloads
  may legally contain ``WARC/1.0`` or blank lines, so only the length
  fields delimit records (adversarially tested).
- ``parse_warc_blob`` / ``warc_records`` — member-split via
  ``zlib.decompressobj`` (``unused_data`` marks the member boundary),
  case-insensitive header parse, Content-Length slicing, HTTP unwrap.
  Plain (uncompressed) WARC is handled by the same walk.
- ``read_warc`` — loose ``*.warc.gz`` files -> the standard pages shape
  ``(url, warc_ts, html, text, lang)``, so the whole extraction
  pipeline runs unchanged on crawl archives. Reference parity: this is
  the corpus-scale analog of the reference's file ingestion
  (/root/reference/onnxocr/app-service.py accepts wire payloads per
  request; a crawl delivers the same payloads batched in WARC).

Scale design (100 TB): synthesis and parse are chained shuffle-free
``mapInPandas`` — one task per split, no Exchange (plan-asserted in
tests). A real CC segment (~1 GB .warc.gz) is one binaryFile row;
records stream out of the member walk one at a time, so peak memory is
one record, not one file.
"""

from __future__ import annotations

import gzip
import hashlib
import zlib
from typing import Iterator, List, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

URI_PREFIX = "https://crawl.example/doc/"
_EPOCH_DAY = "2024-01-01"  # WARC-Date base: epoch + doc_id seconds


def _warc_date(doc_id: int) -> str:
    h, rem = divmod(int(doc_id) % 86400, 3600)
    m, s = divmod(rem, 60)
    return f"{_EPOCH_DAY}T{h:02d}:{m:02d}:{s:02d}Z"


def _record_id(doc_id: int) -> str:
    d = hashlib.md5(b"warc-record-%d" % doc_id).hexdigest()
    return f"<urn:uuid:{d[:8]}-{d[8:12]}-{d[12:16]}-{d[16:20]}-{d[20:32]}>"


def synth_record_bytes(doc_id: int, text: str) -> bytes:
    """One gzip member holding one WARC response record for a document."""
    payload = text.encode("utf-8")
    http = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/plain; charset=utf-8\r\n"
        b"Content-Length: %d\r\n\r\n" % len(payload)
    ) + payload
    hdr = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Record-ID: {_record_id(doc_id)}\r\n"
        f"WARC-Date: {_warc_date(doc_id)}\r\n"
        f"WARC-Target-URI: {URI_PREFIX}{int(doc_id)}\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    ).encode("ascii")
    return gzip.compress(hdr + http + b"\r\n\r\n", mtime=0)


def synth_warc(docs: DataFrame) -> DataFrame:
    """(doc_id, text) -> (warc binary, n_records): one multi-record
    concatenated-gzip-member WARC blob per Arrow batch (the real file
    shape — a CC segment holds ~30k records)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            members = [
                synth_record_bytes(int(i), t if isinstance(t, str) else "")
                for i, t in zip(b["doc_id"], b["text"])
            ]
            yield pd.DataFrame(
                {"warc": [b"".join(members)], "n_records": [len(members)]}
            )

    return docs.mapInPandas(gen, schema="warc binary, n_records long")


# ---------------------------------------------------------------------------
# parse
# ---------------------------------------------------------------------------


def _split_members(blob: bytes) -> Iterator[bytes]:
    """Yield decompressed gzip members (or the whole blob if plain)."""
    if blob[:2] != b"\x1f\x8b":
        yield bytes(blob)
        return
    view = memoryview(blob)
    i, n = 0, len(blob)
    while i < n:
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            data = d.decompress(view[i:])
        except zlib.error:
            return  # corrupt tail after valid members: keep walked prefix
        yield data
        if not d.eof:  # truncated member: stop rather than loop forever
            return
        i = n - len(d.unused_data)


def _parse_headers(block: bytes) -> dict:
    out = {}
    for line in block.split(b"\r\n"):
        if b":" in line:
            k, v = line.split(b":", 1)
            out[k.strip().lower().decode("latin-1")] = v.strip().decode("latin-1")
    return out


def _records_in(data: bytes) -> Iterator[Tuple[dict, bytes]]:
    """Walk WARC records inside one decompressed chunk by Content-Length
    only — payload bytes may contain anything, including 'WARC/1.0'."""
    i, n = 0, len(data)
    while i < n:
        if data[i : i + 2] == b"\r\n":  # inter-record gap (2x CRLF per spec)
            i += 2
            continue
        if not data[i : i + 9].startswith(b"WARC/"):
            return
        sep = data.index(b"\r\n\r\n", i)
        headers = _parse_headers(data[i:sep])
        length = int(headers["content-length"])
        body_at = sep + 4
        if body_at + length > n:
            return  # record cut off mid-payload: keep the walked prefix
        yield headers, bytes(data[body_at : body_at + length])
        i = body_at + length


def parse_warc_blob(blob: bytes) -> List[dict]:
    """All records of one WARC blob as dicts with the parsed HTTP unwrap."""
    out = []
    for member in _split_members(bytes(blob)):
        walk = _records_in(member)
        while True:
            try:
                headers, body = next(walk)
            except StopIteration:
                break
            except (ValueError, KeyError, IndexError):
                break  # cut-off header block: keep the walked prefix
            rec = {
                "uri": headers.get("warc-target-uri"),
                "warc_date": headers.get("warc-date"),
                "warc_type": headers.get("warc-type"),
                "http_status": None,
                "payload": body,
            }
            if (headers.get("content-type", "").startswith("application/http")
                    and b"\r\n\r\n" in body):
                # a dirty HTTP envelope must not cost the blob (or even the
                # record): fall back to the raw body on any parse failure
                try:
                    sep = body.index(b"\r\n\r\n")
                    status_line = body[: body.index(b"\r\n")]
                    http_headers = _parse_headers(body[:sep])
                    # no Content-Length (e.g. chunked): take the whole rest
                    plen = int(
                        http_headers.get("content-length", len(body) - sep - 4)
                    )
                    rec["http_status"] = int(status_line.split()[1])
                    rec["payload"] = body[sep + 4 : sep + 4 + plen]
                except (ValueError, IndexError):
                    rec["http_status"] = None
                    rec["payload"] = body
            out.append(rec)
    return out


WARC_ROWS_SCHEMA = (
    "doc_id long, uri string, warc_date string, http_status int, "
    "payload string, payload_len long"
)


def warc_records(warcs: DataFrame, warc_col: str = "warc") -> DataFrame:
    """(warc binary) -> one row per parsed record. A blob that fails to
    parse contributes its successfully-walked prefix (crawls contain
    truncated files; the job must not die)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = {k: [] for k in (
                "doc_id", "uri", "warc_date", "http_status", "payload",
                "payload_len")}
            for blob in b[warc_col]:
                try:
                    recs = parse_warc_blob(blob)
                except Exception:
                    continue
                for r in recs:
                    uri = r["uri"] or ""
                    try:
                        doc_id = int(uri.rsplit("/", 1)[1])
                    except (IndexError, ValueError):
                        doc_id = -1
                    rows["doc_id"].append(doc_id)
                    rows["uri"].append(uri)
                    rows["warc_date"].append(r["warc_date"])
                    rows["http_status"].append(r["http_status"])
                    rows["payload_len"].append(len(r["payload"]))
                    rows["payload"].append(r["payload"].decode("utf-8", "replace"))
            yield pd.DataFrame(rows)

    return warcs.mapInPandas(gen, schema=WARC_ROWS_SCHEMA)


def read_warc(spark: SparkSession, path: str, glob: str = "*.warc.gz") -> DataFrame:
    """Loose WARC files -> the standard pages shape: the crawl-archive
    src function. html carries the raw payload bytes; warc_ts the
    record's WARC-Date."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("content")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = {"url": [], "warc_ts": [], "html": []}
            for blob in b["content"]:
                try:
                    recs = parse_warc_blob(blob)
                except Exception:
                    continue
                for r in recs:
                    if r["warc_type"] != "response":
                        continue
                    try:  # a malformed WARC-Date must not fail the task
                        ts = (pd.Timestamp(r["warc_date"].rstrip("Z"))
                              if r["warc_date"] else None)
                    except ValueError:
                        ts = None
                    rows["url"].append(r["uri"])
                    rows["warc_ts"].append(ts)
                    rows["html"].append(r["payload"])
            yield pd.DataFrame(rows)

    return (
        raw.mapInPandas(gen, schema="url string, warc_ts timestamp, html binary")
        .withColumn("text", F.lit(None).cast("string"))
        .withColumn("lang", F.lit(None).cast("string"))
    )


# ---------------------------------------------------------------------------
# driver-contract query
# ---------------------------------------------------------------------------


def _register_warc_query():
    from onnxocr_ray_spark.registry import register
    from onnxocr_ray_spark.sources.tables import load_table, spread_scan

    @register(
        "warc_ingest_roundtrip",
        priority=13,  # new this round: into the checked window
        sql=f"""
        SELECT doc_id,
               '{URI_PREFIX}' || CAST(doc_id AS VARCHAR) AS uri,
               strftime(TIMESTAMP '{_EPOCH_DAY} 00:00:00'
                        + to_seconds(doc_id % 86400),
                        '%Y-%m-%dT%H:%M:%SZ') AS warc_date,
               200 AS http_status,
               text AS payload,
               octet_length(encode(text)) AS payload_len
        FROM documents
        ORDER BY doc_id
        """,
        doc=(
            "WARC container roundtrip: synthesize per-record-gzipped WARC 1.0 "
            "blobs (real header blocks, nested HTTP envelope, byte-pinned "
            "mtime=0 members) from documents.text, then structurally parse "
            "them back — gzip member split, Content-Length record walk, HTTP "
            "unwrap. Oracle checks byte-identical payload roundtrip plus the "
            "SQL-computable WARC-Date/URI/length fields."
        ),
    )
    def warc_ingest_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
        # r6: spread the single-row-group scan (synthesis + gzip-member
        # parse ran near-serially without it; 12.7 s at sf1.0)
        docs = spread_scan(
            load_table(spark, sf_dir, "documents").select("doc_id", "text")
        )
        recs = warc_records(synth_warc(docs))
        return (
            recs.withColumn("http_status", F.col("http_status").cast("int"))
            .select("doc_id", "uri", "warc_date", "http_status",
                    "payload", "payload_len")
            .orderBy("doc_id")
        )


_register_warc_query()
