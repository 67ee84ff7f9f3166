"""WARC source — pure-bytes parser semantics plus the distributed
read path round-trip."""

from __future__ import annotations

import gzip

from churn_model_evaluation_platform_spark.sources.warc import (
    parse_warc_bytes,
    read_warc,
    warc_record_bytes,
    write_warc_file,
)


def _rec(i: int, body: bytes = b"hello", **kw) -> bytes:
    return warc_record_bytes(
        record_id=f"<urn:uuid:{i:032d}>",
        target_uri=f"http://example.org/doc/{i}",
        body=body,
        **kw,
    )


def test_parse_roundtrip_two_records():
    data = _rec(1) + _rec(2, body=b"x" * 100)
    recs = parse_warc_bytes(data)
    assert [r["target_uri"] for r in recs] == [
        "http://example.org/doc/1",
        "http://example.org/doc/2",
    ]
    assert recs[0]["body"] == b"hello"
    assert recs[0]["http_status"] == 200
    assert recs[1]["body"] == b"x" * 100
    assert all(not r["truncated"] for r in recs)
    # offsets point at the WARC/ version lines
    assert data[recs[1]["offset"] :].startswith(b"WARC/1.0")


def test_parse_non_response_record_keeps_raw_payload():
    rec = warc_record_bytes(
        "<id>", "http://e/x", b"raw bytes", warc_type="metadata"
    )
    (r,) = parse_warc_bytes(rec)
    assert r["warc_type"] == "metadata"
    assert r["http_status"] is None
    assert r["body"] == b"raw bytes"


def test_parse_response_without_http_envelope():
    # a response record whose payload does not start with HTTP/ is
    # kept whole with NULL status (tolerant-read discipline)
    head = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Record-ID: <i>\r\nWARC-Target-URI: http://e/y\r\n"
        b"Content-Length: 4\r\n\r\nBODY\r\n\r\n"
    )
    (r,) = parse_warc_bytes(head)
    assert r["http_status"] is None and r["body"] == b"BODY"


def test_parse_truncated_tail_degrades():
    data = _rec(1) + b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 999\r\n\r\nshort"
    recs = parse_warc_bytes(data)
    assert len(recs) == 1  # the complete record survives
    assert recs[0]["truncated"] is True  # ...flagged


def test_parse_garbage_between_records_degrades():
    data = _rec(1) + b"NOT A RECORD"
    recs = parse_warc_bytes(data)
    assert len(recs) == 1 and recs[0]["truncated"] is True


def test_parse_gz_multi_member():
    raw = b"".join(gzip.compress(_rec(i), mtime=0) for i in (1, 2, 3))
    recs = parse_warc_bytes(raw, gz=True)
    assert [r["target_uri"][-1:] for r in recs] == ["1", "2", "3"]


def test_read_warc_distributed(spark, tmp_path):
    write_warc_file(str(tmp_path / "a.warc"), [_rec(1), _rec(2)])
    write_warc_file(
        str(tmp_path / "b.warc.gz"), [_rec(3)], gz=True
    )
    rows = read_warc(spark, str(tmp_path)).collect()
    got = {
        r["target_uri"]: (r["body"], r["path"].endswith(".gz"))
        for r in rows
    }
    assert got == {
        "http://example.org/doc/1": (bytearray(b"hello"), False),
        "http://example.org/doc/2": (bytearray(b"hello"), False),
        "http://example.org/doc/3": (bytearray(b"hello"), True),
    }
