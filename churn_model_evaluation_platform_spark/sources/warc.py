"""WARC (ISO 28500) source — the container format web crawls actually
arrive in (Common Crawl publishes ~1 GB ``.warc.gz`` files). A corpus
engine that starts from crawl data needs to READ this shape natively;
the deterministic writer exists for fixtures and round-trip tests.

Read path (Spark-first): ``spark.read.format("binaryFile")`` lists the
``.warc``/``.warc.gz`` files — ONE FILE PER TASK, which is exactly how
WARC is processed at scale (member-gzip files are not splittable; the
unit of parallelism is the file, and crawls ship thousands of ~1 GB
files, so a 1000-executor cluster saturates naturally) — then a
``mapInArrow`` pass parses records out of each file's bytes. The
parser is a pure-bytes scanner: version line, CRLF header block,
``Content-Length``-delimited payload, two CRLF record separators;
``response`` records additionally split the HTTP status line and
headers from the body. Malformed tails DEGRADE (records parsed so far
survive, a ``truncated`` flag rides the last row) rather than failing
the job — one corrupt crawl file must not kill a 100 TB read.

gzip: a ``.gz`` file is decompressed with stdlib zlib before
scanning. Python's zlib handles multi-member streams (the per-record
gzip members real crawls use) via repeated decompressobj calls on the
unused tail.
"""

from __future__ import annotations

import zlib

from pyspark.sql import DataFrame, SparkSession

#: Fixed fixture timestamp (determinism; WARC requires UTC ISO-8601).
FIXTURE_DATE = "2026-01-01T00:00:00Z"

_CRLF = b"\r\n"


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a possibly multi-member gzip stream (stdlib-only)."""
    out = []
    tail = data
    while tail:
        d = zlib.decompressobj(wbits=31)
        out.append(d.decompress(tail))
        out.append(d.flush())
        if d.unused_data == tail:  # no progress — corrupt tail
            break
        tail = d.unused_data
    return b"".join(out)


def parse_warc_bytes(data: bytes, gz: bool = False) -> list:
    """Parse one WARC file's bytes into record dicts:
    (offset, warc_type, record_id, target_uri, content_length,
    http_status, body, truncated). Pure Python, unit-testable without
    a session."""
    if gz:
        data = _gunzip_members(data)
    records: list = []
    i = 0
    n = len(data)
    while i < n:
        # skip inter-record CRLFs
        while data.startswith(_CRLF, i):
            i += 2
        if i >= n:
            break
        if not data.startswith(b"WARC/", i):
            # garbage where a record should start: degrade
            if records:
                records[-1]["truncated"] = True
            break
        hdr_end = data.find(_CRLF + _CRLF, i)
        if hdr_end < 0:
            if records:
                records[-1]["truncated"] = True
            break
        lines = data[i:hdr_end].split(_CRLF)
        headers = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(b":")
            headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers.get(b"content-length", b""))
        except ValueError:
            if records:
                records[-1]["truncated"] = True
            break
        body_start = hdr_end + 4
        if body_start + clen > n:
            if records:
                records[-1]["truncated"] = True
            break
        payload = data[body_start : body_start + clen]
        wtype = headers.get(b"warc-type", b"").decode("ascii", "replace")
        status = None
        body = payload
        if wtype == "response" and payload.startswith(b"HTTP/"):
            he = payload.find(_CRLF + _CRLF)
            if he >= 0:
                status_line = payload.split(_CRLF, 1)[0]
                parts = status_line.split(b" ")
                if len(parts) >= 2 and parts[1].isdigit():
                    status = int(parts[1])
                body = payload[he + 4 :]
        records.append(
            {
                "offset": i,
                "warc_type": wtype,
                "record_id": headers.get(b"warc-record-id", b"").decode(
                    "ascii", "replace"
                ),
                "target_uri": headers.get(b"warc-target-uri", b"").decode(
                    "ascii", "replace"
                ),
                "content_length": clen,
                "http_status": status,
                "body": bytes(body),
                "truncated": False,
            }
        )
        i = body_start + clen
    return records


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC read: binaryFile listing (one file per task)
    → Arrow-batched per-file record parse. Returns one row per record
    with the file path carried for provenance."""
    import pyarrow as pa

    files = spark.read.format("binaryFile").load(path)

    def parse(batches):
        for batch in batches:
            paths = batch.column("path").to_pylist()
            contents = batch.column("content").to_pylist()
            rows = {
                "path": [],
                "offset": [],
                "warc_type": [],
                "record_id": [],
                "target_uri": [],
                "content_length": [],
                "http_status": [],
                "body": [],
                "truncated": [],
            }
            for p, c in zip(paths, contents):
                for r in parse_warc_bytes(c, gz=p.endswith(".gz")):
                    rows["path"].append(p)
                    for k in (
                        "offset",
                        "warc_type",
                        "record_id",
                        "target_uri",
                        "content_length",
                        "http_status",
                        "body",
                        "truncated",
                    ):
                        rows[k].append(r[k])
            # explicit Arrow types: from_pydict would infer int64 for
            # http_status where the declared Spark schema says int32
            pa_schema = pa.schema(
                [
                    ("path", pa.string()),
                    ("offset", pa.int64()),
                    ("warc_type", pa.string()),
                    ("record_id", pa.string()),
                    ("target_uri", pa.string()),
                    ("content_length", pa.int64()),
                    ("http_status", pa.int32()),
                    ("body", pa.binary()),
                    ("truncated", pa.bool_()),
                ]
            )
            yield pa.RecordBatch.from_pydict(rows, schema=pa_schema)

    schema = (
        "path string, offset long, warc_type string, "
        "record_id string, target_uri string, content_length long, "
        "http_status int, body binary, truncated boolean"
    )
    return files.select("path", "content").mapInArrow(parse, schema)


def warc_record_bytes(
    record_id: str,
    target_uri: str,
    body: bytes,
    warc_type: str = "response",
    date: str = FIXTURE_DATE,
    http_status: int = 200,
) -> bytes:
    """One deterministic WARC record. ``response`` records wrap the
    body in a minimal HTTP/1.1 response (status + Content-Type), the
    shape crawl WARCs actually carry."""
    if warc_type == "response":
        payload = (
            f"HTTP/1.1 {http_status} OK\r\n"
            "Content-Type: text/html\r\n\r\n"
        ).encode("ascii") + body
    else:
        payload = body
    head = (
        "WARC/1.0\r\n"
        f"WARC-Type: {warc_type}\r\n"
        f"WARC-Record-ID: {record_id}\r\n"
        f"WARC-Date: {date}\r\n"
        f"WARC-Target-URI: {target_uri}\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode("ascii")
    return head + payload + _CRLF + _CRLF


def write_warc_file(path: str, records: list, gz: bool = False) -> None:
    """Write records (already-encoded bytes from ``warc_record_bytes``)
    as one ``.warc`` file, or — with ``gz`` — as the per-record-member
    gzip stream real crawls use (each record its own gzip member, so
    readers can seek to member boundaries)."""
    import gzip as _gzip

    with open(path, "wb") as f:
        for rec in records:
            f.write(
                _gzip.compress(rec, mtime=0) if gz else rec
            )
