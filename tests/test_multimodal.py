"""Multimodal column plumbing (decode is a documented stub; the Spark
schema/partitioning/Arrow paths are real)."""

from __future__ import annotations

import pytest

from churn_model_evaluation_platform_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_features,
    resize_stub,
    sample_frames,
)


@pytest.fixture
def media(spark):
    rows = [
        (1, "image", bytes([0, 32, 64, 96, 128, 160, 192, 224]), 8, 8, None, "png"),
        (2, "audio", b"\x00" * 100, None, None, 2000, "wav"),
        (3, "video", b"\xff" * 50, 640, 480, 10000, "mp4"),
        (4, "image", None, None, None, None, "png"),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features_shapes(media):
    out = extract_features(media)
    rows = {r["media_id"]: r for r in out.collect()}
    assert rows[1]["n_bytes"] == 8
    # one byte in each of the 8 buckets → uniform histogram
    assert rows[1]["features"] == pytest.approx([0.125] * 8)
    assert rows[2]["byte_entropy"] == 0.0  # constant bytes
    assert rows[1]["byte_entropy"] == pytest.approx(3.0)  # 8 distinct bytes
    assert rows[4]["n_bytes"] == 0 and rows[4]["features"] == []


def test_resize_stub_restamps_metadata(media):
    out = resize_stub(media, 32, 32)
    assert out.schema == media.schema
    for r in out.collect():
        assert (r["width"], r["height"]) == (32, 32)


def test_sample_frames(media):
    frames = sample_frames(media, every_ms=2500).collect()
    # only the video row explodes: 10000ms / 2500ms → 4 frames
    assert len(frames) == 4
    assert [r["ts_ms"] for r in frames] == [0, 2500, 5000, 7500]
    assert {r["media_id"] for r in frames} == {3}


def test_parse_media_header_formats():
    import struct

    from churn_model_evaluation_platform_spark.operators.multimodal import (
        parse_media_header,
        synth_media_bytes,
    )

    png = parse_media_header(synth_media_bytes(0))
    assert (png["format"], png["width"], png["height"]) == ("png", 16, 16)
    gif = parse_media_header(synth_media_bytes(1))
    assert (gif["format"], gif["width"], gif["height"]) == ("gif", 9, 9)
    wav = parse_media_header(synth_media_bytes(2))
    assert wav["format"] == "wav"
    assert wav["sample_rate"] == 44100
    assert wav["duration_ms"] == 300  # 17640*3 bytes / 176400 B/s
    # hand-built JPEG with APP0 + SOF0 240x320
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
        + b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
        + struct.pack(">HH", 240, 320) + b"\x03" + b"\x00" * 9
        + b"\xff\xd9"
    )
    j = parse_media_header(jpeg)
    assert (j["format"], j["width"], j["height"]) == ("jpeg", 320, 240)
    # BMP 64x48 (top-down negative height is normalized)
    bmp = (
        b"BM" + b"\x00" * 16
        + struct.pack("<i", 64) + struct.pack("<i", -48) + b"\x00" * 4
    )
    bm = parse_media_header(bmp)
    assert (bm["format"], bm["width"], bm["height"]) == ("bmp", 64, 48)
    # garbage → unknown
    assert parse_media_header(b"not a media file at all")["format"] is None
    assert parse_media_header(None)["format"] is None


def test_probe_media_spark_roundtrip(spark):
    from churn_model_evaluation_platform_spark.operators.multimodal import (
        probe_media,
        synth_media_bytes,
    )

    rows = [(i, synth_media_bytes(i)) for i in range(8)]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r["media_id"]: r for r in probe_media(df).collect()}
    assert got[0]["format"] == "png" and got[0]["width"] == 16
    assert got[1]["format"] == "gif"
    assert got[2]["format"] == "wav" and got[2]["duration_ms"] == 300
    assert got[3]["format"] == "mp4" and got[3]["track_count"] == 1
    assert got[4]["format"] == "png" and got[4]["width"] == 20
    assert got[6]["format"] == "wav" and got[6]["sample_rate"] == 44100
    assert got[7]["format"] == "mp4" and got[7]["codec"] == "hvc1"
    # single-stream formats carry no track/codec fields
    assert got[0]["track_count"] is None and got[2]["codec"] is None


def test_parse_mp4_bmff_boxes():
    from churn_model_evaluation_platform_spark.operators.multimodal import (
        parse_media_header,
        synth_mp4_bytes,
    )

    # id 3: duration 250*(1+3%8)=1000ms, 1 track, codec av01, 19x19
    p = parse_media_header(synth_mp4_bytes(3))
    assert p["format"] == "mp4"
    assert p["duration_ms"] == 1000
    assert p["track_count"] == 1
    assert p["codec"] == "av01"
    assert (p["width"], p["height"]) == (19, 19)
    # id 7: duration 250*(1+7%8)=2000ms, 1+7%3=2 tracks, codec 7%5->hvc1;
    # second track is audio (0x0 tkhd) so dims come from track 1 only
    p = parse_media_header(synth_mp4_bytes(7))
    assert p["track_count"] == 2
    assert p["codec"] == "hvc1"
    assert p["duration_ms"] == 2000
    assert (p["width"], p["height"]) == (16 + 7 % 320, 16 + 7 % 240)
    # truncated/garbage boxes must not crash and must not claim fields
    trunc = synth_mp4_bytes(3)[:40]
    t = parse_media_header(trunc)
    assert t["format"] == "mp4" and t["track_count"] is None


def test_decode_roundtrip_all_formats():
    from churn_model_evaluation_platform_spark.operators.multimodal import (
        decode_media_bytes,
        synth_decodable_media_bytes,
    )

    for m in range(16):
        d = decode_media_bytes(synth_decodable_media_bytes(m))
        fmt = ["png", "bmp", "wav", "gif"][m % 4]
        assert d["format"] == fmt
        if fmt == "png":
            w, h = 4 + m % 13, 4 + m % 11
            vals = [(m + 11 * y + j) % 256 for y in range(h) for j in range(3 * w)]
        elif fmt == "bmp":
            w, h = 4 + m % 9, 4 + m % 7
            vals = [(m + 5 * y + j) % 256 for y in range(h) for j in range(3 * w)]
        elif fmt == "gif":
            w, h = 4 + m % 11, 4 + m % 13
            vals = [
                (m + 3 * ((m + 3 * y + x) % 8) + k) % 256
                for y in range(h)
                for x in range(w)
                for k in range(3)
            ]
        else:
            n = 256 + m % 200
            vals = [((m * 31 + i * 7) % 4096) - 2048 for i in range(n)]
        assert d["n_values"] == len(vals)
        assert d["mean_value"] == round(sum(vals) / len(vals), 6)
        assert d["min_value"] == float(min(vals))
        assert d["max_value"] == float(max(vals))


def test_gif_lzw_roundtrip():
    # Real LZW both ways: dictionary growth, width increases, KwKwK
    # (aaa... runs), and the 4096-entry clear/reset path.
    import random

    from churn_model_evaluation_platform_spark.operators.multimodal import (
        _gif_lzw_decode,
        _gif_lzw_encode,
    )

    rng = random.Random(11)
    for mcs in (2, 3, 8):
        ncol = 1 << mcs
        cases = [
            [rng.randrange(ncol) for _ in range(997)],  # random
            [0] * 400,  # max-run → KwKwK chains
            [(i * 7 + 3) % ncol for i in range(2048)],  # periodic
            [rng.randrange(ncol) for _ in range(1)],  # single pixel
        ]
        for idx in cases:
            enc = _gif_lzw_encode(idx, mcs)
            assert list(_gif_lzw_decode(enc, mcs, len(idx))) == idx
    # long low-entropy stream crosses the 4096 table reset
    idx = [rng.randrange(4) for _ in range(120_000)]
    enc = _gif_lzw_encode(idx, 2)
    assert list(_gif_lzw_decode(enc, 2, len(idx))) == idx
    assert len(enc) < len(idx)  # genuinely compressed


def test_decode_hardening_bomb_and_compression_fields():
    import struct
    import zlib

    from churn_model_evaluation_platform_spark.operators.multimodal import (
        decode_media_bytes,
        synth_decodable_media_bytes,
    )

    # huge-IHDR PNG must not allocate: format-only, instantly
    bomb = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">IIBBBBB", 100_000, 100_000, 8, 2, 0, 0, 0)
        + b"\x00" * 4
    )
    assert decode_media_bytes(bomb)["n_values"] is None
    # stream inflating past the IHDR-declared size is rejected, and the
    # inflation itself is bounded (decompressobj max_length)
    over = zlib.compress(b"\x00" * 10_000)
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
        + b"\x00" * 4
        + struct.pack(">I", len(over))
        + b"IDAT"
        + over
        + b"\x00" * 4
        + struct.pack(">I", 0)
        + b"IEND"
        + b"\x00" * 4
    )
    assert decode_media_bytes(blob)["n_values"] is None
    # BMP with biCompression != BI_RGB degrades instead of mis-decoding
    bmp = bytearray(synth_decodable_media_bytes(1))
    bmp[30] = 3  # BI_BITFIELDS
    d = decode_media_bytes(bytes(bmp))
    assert d["format"] == "bmp" and d["n_values"] is None
    # interlaced GIF degrades (4-pass row order unsupported)
    gif = bytearray(synth_decodable_media_bytes(3))
    assert gif[37] == 0x2C
    gif[37 + 9] |= 0x40
    d = decode_media_bytes(bytes(gif))
    assert d["format"] == "gif" and d["n_values"] is None
    # truncated GIF degrades, never raises
    assert decode_media_bytes(synth_decodable_media_bytes(7)[:50])["format"] == "gif"


def test_png_unfilter_average_and_paeth():
    # The synth generator only emits filters 0-2; build a PNG whose rows
    # use Average (3) and Paeth (4) so those reconstruction paths are
    # exercised against a hand-computed forward filter.
    import struct
    import zlib

    from churn_model_evaluation_platform_spark.operators.multimodal import (
        decode_media_bytes,
    )

    w, h, bpp = 4, 2, 3
    stride = w * bpp
    rows = [
        bytes((7 * j + 3) % 256 for j in range(stride)),
        bytes((13 * j + 1) % 256 for j in range(stride)),
    ]
    # forward-filter row 0 with Average (prior = zeros), row 1 with Paeth
    enc0 = bytearray()
    for j in range(stride):
        left = rows[0][j - bpp] if j >= bpp else 0
        enc0.append((rows[0][j] - (left >> 1)) & 0xFF)
    enc1 = bytearray()
    for j in range(stride):
        a = rows[1][j - bpp] if j >= bpp else 0
        b_ = rows[0][j]
        c = rows[0][j - bpp] if j >= bpp else 0
        p = a + b_ - c
        pa, pb, pc = abs(p - a), abs(p - b_), abs(p - c)
        pred = a if pa <= pb and pa <= pc else (b_ if pb <= pc else c)
        enc1.append((rows[1][j] - pred) & 0xFF)
    raw = bytes([3]) + bytes(enc0) + bytes([4]) + bytes(enc1)

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    d = decode_media_bytes(png)
    vals = [v for row in rows for v in row]
    assert d["n_values"] == len(vals)
    assert d["mean_value"] == round(sum(vals) / len(vals), 6)
    assert d["min_value"] == float(min(vals))
    assert d["max_value"] == float(max(vals))


def test_decode_media_spark(spark):
    from churn_model_evaluation_platform_spark.operators.multimodal import (
        decode_media,
        synth_decodable_media_bytes,
    )

    rows = [(i, synth_decodable_media_bytes(i)) for i in range(6)]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r["media_id"]: r for r in decode_media(df).collect()}
    assert got[0]["format"] == "png" and got[0]["n_values"] == 4 * 4 * 3
    assert got[2]["format"] == "wav" and got[2]["n_values"] == 258
    # unknown bytes → format-only nulls
    from churn_model_evaluation_platform_spark.operators.multimodal import (
        decode_media_bytes,
    )

    assert decode_media_bytes(b"garbage bytes here")["format"] is None


def test_decode_never_raises_on_malformed_media():
    import struct
    import zlib

    from churn_model_evaluation_platform_spark.operators.multimodal import (
        decode_media_bytes,
        synth_decodable_media_bytes,
    )

    # truncated PNG (IDAT cut short) → format-only, no exception
    png = synth_decodable_media_bytes(0)
    assert decode_media_bytes(png[:60])["n_values"] is None
    # interlaced PNG rejected (Adam7 needs a codec)
    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )
    interlaced = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 1))
        + chunk(b"IDAT", zlib.compress(b"\x00" * 52))
        + chunk(b"IEND", b"")
    )
    d = decode_media_bytes(interlaced)
    assert d["format"] == "png" and d["n_values"] is None
    # WAV with data chunk BEFORE fmt still decodes
    samples = struct.pack("<4h", 1, -2, 3, -4)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    wav = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(samples) + 8 + 16) + b"WAVE"
        + b"data" + struct.pack("<I", len(samples)) + samples
        + b"fmt " + struct.pack("<I", 16) + fmt
    )
    d = decode_media_bytes(wav)
    assert d["format"] == "wav" and d["n_values"] == 4
    assert d["min_value"] == -4.0 and d["max_value"] == 3.0
    # WAV whose data length field overruns the buffer → truncated decode,
    # no exception
    bad = (
        b"RIFF" + struct.pack("<I", 100) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", 9999) + samples
    )
    assert decode_media_bytes(bad)["n_values"] == 4


def _jpeg_headers(w, h, comps, quant, dc_tables, ac_tables):
    """Test-side JPEG assembler: comps = [(cid, tq)], tables =
    {tid: (bits, vals)}. Returns everything up to and incl. SOS."""
    import struct

    out = b"\xff\xd8"
    for tq, q in quant.items():
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + bytes(q)
    out += (
        b"\xff\xc0" + struct.pack(">H", 8 + 3 * len(comps)) + b"\x08"
        + struct.pack(">HH", h, w) + bytes([len(comps)])
    )
    for cid, tq in comps:
        out += bytes([cid, 0x11, tq])
    for tc, tables in ((0, dc_tables), (1, ac_tables)):
        for tid, (bits, vals) in tables.items():
            out += (
                b"\xff\xc4" + struct.pack(">H", 2 + 17 + len(vals))
                + bytes([(tc << 4) | tid]) + bytes(bits) + bytes(vals)
            )
    out += b"\xff\xda" + struct.pack(">H", 6 + 2 * len(comps)) + bytes([len(comps)])
    for cid, _tq in comps:
        out += bytes([cid, 0x00])
    out += bytes([0, 63, 0])
    return out


def test_jpeg_ac_coefficient_against_reference_idct():
    """Non-flat block: DC + one AC coefficient, checked against an
    independent textbook IDCT (explicit double loop, not the module's
    matrix product)."""
    import math

    import numpy as np

    from churn_model_evaluation_platform_spark.operators.multimodal import (
        _JpegBitWriter,
        _jpeg_decode,
    )

    dc_tbl = ([0, 0, 0, 8] + [0] * 12, list(range(8)))
    # AC: two 2-bit codes: 00 -> EOB (0x00), 01 -> run0/size2 (0x02)
    ac_tbl = ([0, 2] + [0] * 14, [0x00, 0x02])
    head = _jpeg_headers(8, 8, [(1, 0)], {0: [16] * 64}, {0: dc_tbl}, {0: ac_tbl})
    bw = _JpegBitWriter()
    bw.write(4, 4)       # DC size 4
    bw.write(0b1010, 4)  # DC = +10
    bw.write(0b01, 2)    # AC symbol run0/size2
    bw.write(0b11, 2)    # AC value = +3 (zigzag k=1 -> natural (0,1))
    bw.write(0b00, 2)    # EOB
    blob = head + bw.finish() + b"\xff\xd9"
    vals, w, h = _jpeg_decode(blob)
    assert (w, h) == (8, 8)
    # independent reference: F[0,0]=160, F[0,1]=48 dequantized
    ref = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            acc = 0.0
            for u, v, f in ((0, 0, 160.0), (0, 1, 48.0)):
                cu = 1 / math.sqrt(2) if u == 0 else 1.0
                cv = 1 / math.sqrt(2) if v == 0 else 1.0
                acc += (
                    0.25 * cu * cv * f
                    * math.cos((2 * x + 1) * u * math.pi / 16)
                    * math.cos((2 * y + 1) * v * math.pi / 16)
                )
            ref[x, y] = min(255, max(0, round(acc + 128)))
    assert vals == [int(r) for r in ref.ravel()]


def test_jpeg_color_444_ycbcr_to_rgb():
    from churn_model_evaluation_platform_spark.operators.multimodal import (
        _JpegBitWriter,
        _jpeg_decode,
    )

    dc_tbl = ([0, 0, 0, 8] + [0] * 12, list(range(8)))
    ac_tbl = ([1] + [0] * 15, [0x00])
    head = _jpeg_headers(
        8, 8, [(1, 0), (2, 0), (3, 0)], {0: [8] * 64}, {0: dc_tbl}, {0: ac_tbl}
    )
    bw = _JpegBitWriter()
    for dc in (0, 8, -8):  # Y=128, Cb=136, Cr=120 flat planes
        s = abs(dc).bit_length()
        bw.write(s, 4)
        if s:
            bw.write(dc if dc > 0 else dc + (1 << s) - 1, s)
        bw.write(0, 1)  # EOB
    blob = head + bw.finish() + b"\xff\xd9"
    vals, w, h = _jpeg_decode(blob)
    # JFIF: R=Y+1.402(Cr-128), G=Y-0.344136(Cb-128)-0.714136(Cr-128),
    # B=Y+1.772(Cb-128) with Y=128, Cb=136, Cr=120
    exp = [round(128 + 1.402 * -8), round(128 - 0.344136 * 8 + 0.714136 * 8),
           round(128 + 1.772 * 8)]
    assert vals == exp * 64


def test_jpeg_fixture_roundtrip_and_degradation():
    from churn_model_evaluation_platform_spark.operators.multimodal import (
        decode_media_bytes,
        synth_jpeg_bytes,
    )

    for m in (0, 5, 11, 42):
        out = decode_media_bytes(synth_jpeg_bytes(m))
        bx, by = 1 + m % 4, 1 + m % 3
        dcs = [((m + 7 * bi) % 128) + 64 for bi in range(bx * by)]
        assert out["format"] == "jpeg"
        assert out["n_values"] == 64 * bx * by
        assert out["mean_value"] == round(sum(dcs) / len(dcs), 6)
        assert out["min_value"] == float(min(dcs))
        assert out["max_value"] == float(max(dcs))
    # truncated entropy stream degrades to format-only, never raises
    blob = synth_jpeg_bytes(5)
    out = decode_media_bytes(blob[: len(blob) - 4])
    assert out["format"] == "jpeg" and out["n_values"] is None


# ---------------------------------------------------------------------------
# real nearest-neighbor resize (r13)
# ---------------------------------------------------------------------------


def test_resize_nearest_hand_computed(spark):
    """4x2 gradient PNG resized to 2x1: nearest-neighbor floor mapping
    picks in(0,0) and in(2,0) — hand-verified per channel."""
    from churn_model_evaluation_platform_spark.operators.multimodal import (
        decode_png_pixels,
        resize_nearest,
        synth_decodable_media_bytes,
    )

    # media_id 0 -> PNG w=4, h=4; formula byte j of row y = (11y + j) % 256
    blob = synth_decodable_media_bytes(0)
    w, h, rgb = decode_png_pixels(blob)
    assert (w, h) == (4, 4)
    assert rgb[0] == 0 and rgb[1] == 1  # row 0: j % 256
    assert rgb[w * 3] == 11  # row 1 starts at 11*1 + 0

    df = spark.createDataFrame(
        [(0, bytearray(blob))], "media_id long, content binary"
    )
    row = resize_nearest(df, out_w=2, out_h=2).collect()[0]
    assert (row["src_w"], row["src_h"]) == (4, 4)
    px = list(row["pixels"])
    # out(X,Y,c) = in(X*4//2, Y*4//2, c) = (11*(2Y) + 3*(2X) + c) % 256
    want = [
        (11 * (2 * Y) + 3 * (2 * X) + c) % 256
        for Y in range(2)
        for X in range(2)
        for c in range(3)
    ]
    assert px == want


def test_resize_undecodable_blob_degrades(spark):
    from churn_model_evaluation_platform_spark.operators.multimodal import (
        resize_nearest,
    )

    df = spark.createDataFrame(
        [(1, bytearray(b"not a png at all, sorry!"))],
        "media_id long, content binary",
    )
    row = resize_nearest(df).collect()[0]
    assert row["pixels"] is None and row["src_w"] is None
