"""Round-9 JPEG coverage: chroma subsampling (4:2:0 / 4:2:2 / 4:4:0),
restart intervals (DRI + RSTn) in baseline AND progressive streams, and
the degrade-to-format-only error paths (out-of-sequence / missing RST).
Pixel expectations are computed independently (closed form over DC-only
blocks + explicit replication upsampling) — never by the decoder under
test. No Spark session needed: everything here is the pure-Python codec
layer that runs inside the mapInPandas operator."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from churn_model_evaluation_platform_spark.operators.multimodal import (
    _JpegBitWriter,
    _jpeg_420_params,
    _jpeg_decode,
    _prog_headers,
    _sos,
    decode_media_bytes,
    synth_jpeg_420_bytes,
    synth_jpeg_bytes,
    synth_jpeg_restart_bytes,
)

# the fixtures' shared minimal tables: DC sizes 0..7 as 4-bit codes
# (symbol s == code s), AC EOB as a 1-bit code
_DC_BITS = bytes([0, 0, 0, 8] + [0] * 12)
_DC_VALS = bytes(range(8))
_AC_BITS = bytes([1] + [0] * 15)
_AC_VALS = bytes([0x00])


def _dqt() -> bytes:
    return b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([8] * 64)


def _dht() -> bytes:
    return (
        b"\xff\xc4" + struct.pack(">H", 2 + 17 + 8) + b"\x00"
        + _DC_BITS + _DC_VALS
        + b"\xff\xc4" + struct.pack(">H", 2 + 17 + 1) + b"\x10"
        + _AC_BITS + _AC_VALS
    )


def _sof0_color(w: int, h: int, y_hv: int) -> bytes:
    return (
        b"\xff\xc0"
        + struct.pack(">H", 17)
        + b"\x08"
        + struct.pack(">HH", h, w)
        + b"\x03"
        + bytes([1, y_hv, 0, 2, 0x11, 0, 3, 0x11, 0])
    )


def _sos_color() -> bytes:
    return (
        b"\xff\xda"
        + struct.pack(">H", 12)
        + b"\x03"
        + bytes([1, 0x00, 2, 0x00, 3, 0x00])
        + bytes([0, 63, 0])
    )


def _put_block(bw: _JpegBitWriter, preds: list, ci: int, dc: int) -> None:
    diff = dc - preds[ci]
    preds[ci] = dc
    s = abs(diff).bit_length()
    bw.write(s, 4)
    if s:
        bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    bw.write(0, 1)  # EOB


def _rgb(y: int, cb: int, cr: int) -> tuple[int, int, int]:
    return (
        int(np.clip(np.round(y + 1.402 * cr), 0, 255)),
        int(np.clip(np.round(y - 0.344136 * cb - 0.714136 * cr), 0, 255)),
        int(np.clip(np.round(y + 1.772 * cb), 0, 255)),
    )


# -- 4:2:0 fixture: closed form ------------------------------------------


@pytest.mark.parametrize("m", list(range(0, 40, 3)))
def test_420_fixture_pixel_exact(m):
    got = _jpeg_decode(synth_jpeg_420_bytes(m))
    assert got is not None
    vals, w, h = got
    mcux, mcuy, cb, cr = _jpeg_420_params(m)
    assert (w, h) == (16 * mcux, 16 * mcuy)
    arr = np.asarray(vals).reshape(h, w, 3)
    lumaw = 2 * mcux
    for py in range(h):
        for px in range(w):
            bi = (py // 8) * lumaw + (px // 8)
            y = ((m + 7 * bi) % 128) + 64
            assert tuple(arr[py, px]) == _rgb(y, cb, cr)


def test_420_stats_surface(m=7):
    out = decode_media_bytes(synth_jpeg_420_bytes(m))
    mcux, mcuy, _cb, _cr = _jpeg_420_params(m)
    assert out["format"] == "jpeg"
    assert out["n_values"] == 16 * mcux * 16 * mcuy * 3


# -- varying chroma across MCUs: pins the replication upsample -----------


def test_420_varying_chroma_replication():
    # 32x16: two MCUs side by side, DIFFERENT chroma per MCU — each
    # chroma sample covers a 2x2 luma area, so the left 16 columns use
    # (cb0, cr0) and the right 16 use (cb1, cr1); luma flat 130
    w, h = 32, 16
    chroma = [(-10, 4), (12, -7)]
    bw = _JpegBitWriter()
    preds = [0, 0, 0]
    for mx in range(2):
        for _sub in range(4):
            _put_block(bw, preds, 0, 2)  # y = 2 + 128 = 130
        _put_block(bw, preds, 1, chroma[mx][0])
        _put_block(bw, preds, 2, chroma[mx][1])
    b = (
        b"\xff\xd8" + _dqt() + _sof0_color(w, h, 0x22) + _dht()
        + _sos_color() + bw.finish() + b"\xff\xd9"
    )
    got = _jpeg_decode(b)
    assert got is not None
    vals, gw, gh = got
    assert (gw, gh) == (w, h)
    arr = np.asarray(vals).reshape(h, w, 3)
    for px in range(w):
        cb, cr = chroma[px // 16]
        assert tuple(arr[3, px]) == _rgb(130, cb, cr)


# -- 4:2:2 and 4:4:0 -------------------------------------------------------


def test_422_horizontal_subsampling():
    # Y 2x1: 16x8 image, one MCU of 2 luma blocks + 1 Cb + 1 Cr; the
    # 8x8 chroma block is replicated horizontally only
    bw = _JpegBitWriter()
    preds = [0, 0, 0]
    _put_block(bw, preds, 0, 10)   # left luma 138
    _put_block(bw, preds, 0, -20)  # right luma 108
    _put_block(bw, preds, 1, 8)
    _put_block(bw, preds, 2, -5)
    b = (
        b"\xff\xd8" + _dqt() + _sof0_color(16, 8, 0x21) + _dht()
        + _sos_color() + bw.finish() + b"\xff\xd9"
    )
    got = _jpeg_decode(b)
    assert got is not None
    vals, w, h = got
    assert (w, h) == (16, 8)
    arr = np.asarray(vals).reshape(h, w, 3)
    for px in range(16):
        y = 138 if px < 8 else 108
        assert tuple(arr[5, px]) == _rgb(y, 8, -5)


def test_440_vertical_subsampling():
    # Y 1x2: 8x16 image — chroma replicated vertically only
    bw = _JpegBitWriter()
    preds = [0, 0, 0]
    _put_block(bw, preds, 0, 30)   # top luma 158
    _put_block(bw, preds, 0, -6)   # bottom luma 122
    _put_block(bw, preds, 1, -3)
    _put_block(bw, preds, 2, 14)
    b = (
        b"\xff\xd8" + _dqt() + _sof0_color(8, 16, 0x12) + _dht()
        + _sos_color() + bw.finish() + b"\xff\xd9"
    )
    got = _jpeg_decode(b)
    assert got is not None
    vals, w, h = got
    assert (w, h) == (8, 16)
    arr = np.asarray(vals).reshape(h, w, 3)
    for py in range(16):
        y = 158 if py < 8 else 122
        assert tuple(arr[py, 2]) == _rgb(y, -3, 14)


# -- restart intervals (baseline) ------------------------------------------


@pytest.mark.parametrize("m", list(range(0, 30, 2)))
def test_restart_fixture_matches_plain(m):
    assert _jpeg_decode(synth_jpeg_restart_bytes(m)) == _jpeg_decode(
        synth_jpeg_bytes(m)
    )


def test_out_of_sequence_restart_degrades():
    b = bytearray(synth_jpeg_restart_bytes(11))  # 12 blocks, 5 RSTs
    i = b.find(b"\xff\xd0")
    assert i > 0
    b[i + 1] = 0xD1  # first marker must be D0
    out = decode_media_bytes(bytes(b))
    assert out["format"] == "jpeg" and out["n_values"] is None


def test_missing_restart_marker_degrades():
    # declare DRI=2 on a stream encoded WITHOUT restart markers: ids
    # with >2 blocks must degrade; ids with <=2 blocks decode unchanged
    def with_dri(m):
        b = synth_jpeg_bytes(m)
        dri = b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(">H", 2)
        i = b.find(b"\xff\xda")
        return b[:i] + dri + b[i:]

    out = decode_media_bytes(with_dri(11))  # bx*by = 12 blocks
    assert out["n_values"] is None
    ok = decode_media_bytes(with_dri(12))  # bx=1, by=1: never restarts
    assert ok["n_values"] == 64


def test_dri_zero_is_noop():
    b = synth_jpeg_bytes(5)
    dri = b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(">H", 0)
    i = b.find(b"\xff\xda")
    assert _jpeg_decode(b[:i] + dri + b[i:]) == _jpeg_decode(b)


# -- restart intervals (progressive) ---------------------------------------


def _prog_restart_fixture(dcs: list[int], w: int, h: int, ri: int) -> bytes:
    """Grayscale SOF2 stream with DRI=ri and three scans — DC first
    (Al=1), AC first (EOB runs per interval), DC refinement — each
    emitting in-sequence RSTn markers every ``ri`` blocks with
    predictor/EOB-run state reset, the encoder-side mirror of T.81
    E.2.4. AC table carries EOB(0x00) and EOBRUN2(0x10)."""
    head = _prog_headers(w, h, [0x00, 0x10])
    dri = b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(">H", ri)
    n = len(dcs)

    def intervals():
        for s in range(0, n, ri):
            yield s // ri, dcs[s : s + ri]

    # scan 1: DC first at Al=1
    bw = _JpegBitWriter()
    rst = 0
    for idx, chunk in intervals():
        if idx:
            bw.restart_marker(rst)
            rst = (rst + 1) & 7
        pred = 0
        for dc in chunk:
            d = dc >> 1
            diff = d - pred
            pred = d
            s = abs(diff).bit_length()
            bw.write(s, 4)
            if s:
                bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    scan1 = _sos(0, 0, 0, 1) + bw.finish()
    # scan 2: AC first over 1..63 — one EOB run per restart interval
    bw = _JpegBitWriter()
    rst = 0
    for idx, chunk in intervals():
        if idx:
            bw.restart_marker(rst)
            rst = (rst + 1) & 7
        if len(chunk) == 2:
            bw.write(0b001, 3)  # 0x10: EOBRUN, run = 2 + 1 extra bit
            bw.write(0, 1)
        else:
            for _ in chunk:
                bw.write(0b000, 3)  # 0x00: EOB (run of 1)
    scan2 = _sos(1, 63, 0, 0) + bw.finish()
    # scan 3: DC refinement — each block's low bit
    bw = _JpegBitWriter()
    rst = 0
    for idx, chunk in intervals():
        if idx:
            bw.restart_marker(rst)
            rst = (rst + 1) & 7
        for dc in chunk:
            bw.write(dc & 1, 1)
    scan3 = _sos(0, 0, 1, 0) + bw.finish()
    return head + dri + scan1 + scan2 + scan3 + b"\xff\xd9"


def test_progressive_with_restarts_pixel_exact():
    dcs = [3, -9, 27, 64, -64, 15]  # 48x8: 6 blocks, DRI=2 -> 2 RSTs/scan
    b = _prog_restart_fixture(dcs, 48, 8, ri=2)
    got = _jpeg_decode(b)
    assert got is not None
    vals, w, h = got
    arr = np.asarray(vals).reshape(h, w)
    for bi, dc in enumerate(dcs):
        blk = arr[:, bi * 8 : bi * 8 + 8]
        assert (blk == dc + 128).all()


def test_progressive_restart_out_of_sequence_degrades():
    b = bytearray(_prog_restart_fixture([3, -9, 27, 64], 32, 8, ri=2))
    i = b.find(b"\xff\xd0")
    assert i > 0
    b[i + 1] = 0xD4
    assert _jpeg_decode(bytes(b)) is None


# -- unsupported variants stay format-only ---------------------------------


def test_progressive_subsampled_degrades():
    # SOF2 with a 2x2 luma factor: documented out of scope
    b = bytearray(_prog_restart_fixture([3, -9], 16, 8, ri=2))
    i = b.find(b"\xff\xc2")
    b[i + 2 + 2 + 5 + 2] = 0x22  # component 1's H/V byte
    assert _jpeg_decode(bytes(b)) is None


def test_non_integer_ratio_sampling_degrades():
    # H factors 3 and 2: 3 % 2 != 0 — replication needs integer ratios
    bw = _JpegBitWriter()
    sof = (
        b"\xff\xc0"
        + struct.pack(">H", 17)
        + b"\x08"
        + struct.pack(">HH", 8, 24)
        + b"\x03"
        + bytes([1, 0x31, 0, 2, 0x21, 0, 3, 0x11, 0])
    )
    b = (
        b"\xff\xd8" + _dqt() + sof + _dht() + _sos_color()
        + bw.finish() + b"\xff\xd9"
    )
    assert _jpeg_decode(b) is None
