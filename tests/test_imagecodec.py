"""Unit tests for the dependency-free image codec (operators/imagecodec).

Pure-python tests — no SparkSession — covering the PNG roundtrip, all
five PNG scanline filters (hand-forward-filtered in the test, since the
encoder only emits filter 0), and header sniffing for every supported
container format.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kerf_spark.errors import FormatStringError, MissingFeatureError
from kerf_spark.operators import imagecodec as IC


# --------------------------------------------------------------- roundtrip
@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip_all_channel_counts(channels):
    rng = np.random.default_rng(42 + channels)
    arr = rng.integers(0, 256, size=(13, 7, channels), dtype=np.uint8)
    payload = IC.encode_png(arr)
    fmt, w, h, c = IC.sniff_header(payload)
    assert (fmt, w, h, c) == ("png", 7, 13, channels)
    np.testing.assert_array_equal(IC.decode_png(payload), arr)


@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=15, deadline=None)
def test_png_roundtrip_property(w, h, seed):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    np.testing.assert_array_equal(IC.decode_png(IC.encode_png(arr)), arr)


# ------------------------------------------------- scanline filter decode
def _forward_filter(arr: np.ndarray, ftype: int) -> bytes:
    """Apply a PNG forward filter so the decoder's reverse is tested
    against an independent implementation (PNG spec §9)."""
    h, w, c = arr.shape
    stride = w * c
    flat = arr.reshape(h, stride).astype(int)
    out = bytearray()
    prev = np.zeros(stride, dtype=int)
    for y in range(h):
        row = flat[y]
        filt = np.zeros(stride, dtype=int)
        for x in range(stride):
            a = row[x - c] if x >= c else 0
            b = prev[x]
            cc = prev[x - c] if x >= c else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) // 2
            else:  # Paeth
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            filt[x] = (row[x] - pred) % 256
        out.append(ftype)
        out.extend(int(v) for v in filt)
        prev = row
    return bytes(out)


def _png_with_raw(raw: bytes, w: int, h: int, color: int) -> bytes:
    def chunk(ctype, data):
        body = ctype + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_decode_every_filter_type(ftype):
    rng = np.random.default_rng(7 + ftype)
    arr = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    raw = _forward_filter(arr, ftype)
    payload = _png_with_raw(raw, 5, 6, color=2)
    np.testing.assert_array_equal(IC.decode_png(payload), arr)


# ----------------------------------------------------------- header sniff
def test_jpeg_header_sof_scan():
    # minimal JPEG skeleton: SOI, APP0 (skipped), SOF0 with dims, EOI
    app0 = b"\xff\xe0" + struct.pack(">H", 4) + b"JF"
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + bytes([8]) + struct.pack(
        ">HH", 480, 640
    ) + bytes([3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1])[:4]
    payload = b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"
    assert IC.sniff_header(payload) == ("jpeg", 640, 480, 3)


def test_gif_and_bmp_and_ppm_headers():
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 4
    assert IC.sniff_header(gif) == ("gif", 320, 200, 3)

    bmp = bytearray(b"BM" + b"\x00" * 60)
    struct.pack_into("<ii", bmp, 18, 64, 32)
    struct.pack_into("<H", bmp, 28, 24)
    assert IC.sniff_header(bytes(bmp)) == ("bmp", 64, 32, 3)

    ppm = b"P6\n# comment\n4 2\n255\n" + bytes(range(24))
    assert IC.sniff_header(ppm) == ("ppm", 4, 2, 3)
    np.testing.assert_array_equal(
        IC.decode_pixels(ppm).ravel(), np.arange(24, dtype=np.uint8)
    )


def test_bmp_pixel_decode_bottom_up_bgr():
    # 2x2 24-bit BMP, bottom-up rows, BGR order, rows padded to 4 bytes
    w, h = 2, 2
    stride = (w * 3 + 3) & ~3
    pix = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [9, 8, 7]]], dtype=np.uint8
    )  # RGB, top-down
    rows = b""
    for y in range(h - 1, -1, -1):  # bottom-up
        row = pix[y][:, ::-1].tobytes()  # BGR
        rows += row + b"\x00" * (stride - len(row))
    header = bytearray(54)
    header[0:2] = b"BM"
    struct.pack_into("<I", header, 10, 54)
    struct.pack_into("<ii", header, 18, w, h)
    struct.pack_into("<H", header, 28, 24)
    np.testing.assert_array_equal(IC.decode_pixels(bytes(header) + rows), pix)


# ----------------------------------------------------------- JPEG codec
def test_jpeg_constant_blocks_exact():
    """DC-only images with a unit quant table round-trip bit-for-bit —
    the property the closed-form oracle relies on."""
    from kerf_spark.operators import jpegcodec as JC

    rng = np.random.default_rng(7)
    for h, w in [(8, 8), (16, 24), (32, 48)]:
        blocks = rng.integers(0, 256, size=(h // 8, w // 8))
        img = np.repeat(np.repeat(blocks, 8, 0), 8, 1).astype(np.uint8)
        dec = JC.decode_jpeg(JC.encode_jpeg(img))
        assert dec.shape == (h, w, 1)
        np.testing.assert_array_equal(dec[:, :, 0], img)


def test_jpeg_gray_near_lossless_and_edge_pad():
    from kerf_spark.operators import jpegcodec as JC

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(24, 40)).astype(np.uint8)
    dec = JC.decode_jpeg(JC.encode_jpeg(img))[:, :, 0]
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2
    # non-multiple-of-8 dims exercise the MCU edge-padding path
    img = np.full((13, 21), 77, np.uint8)
    np.testing.assert_array_equal(
        JC.decode_jpeg(JC.encode_jpeg(img))[:, :, 0], img
    )


def test_jpeg_rgb_and_subsampled():
    from kerf_spark.operators import jpegcodec as JC

    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, size=(17, 23, 3)).astype(np.uint8)
    dec = JC.decode_jpeg(JC.encode_jpeg(img))
    assert dec.shape == (17, 23, 3)
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 4
    # 4:2:0: smooth gradient, decoder must upsample chroma back
    base = np.linspace(0, 255, 32 * 48).reshape(32, 48)
    img = np.stack([base, base[::-1], base], -1).astype(np.uint8)
    dec = JC.decode_jpeg(JC.encode_jpeg(img, subsample=True))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).mean() <= 8


def test_jpeg_fill_bytes_before_markers():
    """T.81 B.1.1.2: markers may be preceded by any number of 0xFF fill
    bytes; external encoders emit them (review r4)."""
    from kerf_spark.operators import jpegcodec as JC

    img = np.full((8, 8), 42, np.uint8)
    payload = JC.encode_jpeg(img)
    # inject fill bytes before the DQT marker
    i = payload.find(b"\xff\xdb")
    padded = payload[:i] + b"\xff\xff\xff" + payload[i:]
    dec = JC.decode_jpeg(padded)
    np.testing.assert_array_equal(dec[:, :, 0], img)


def test_jpeg_dispatch_and_typed_edges():
    from kerf_spark.operators import imagecodec as IC
    from kerf_spark.operators import jpegcodec as JC

    payload = JC.encode_jpeg(np.zeros((16, 8), np.uint8))
    assert IC.sniff_header(payload) == ("jpeg", 8, 16, 1)
    assert IC.decode_pixels(payload).shape == (16, 8, 1)  # dispatches
    with pytest.raises(FormatStringError):
        JC.decode_jpeg(b"\x00\x01not a jpeg" + b"\x00" * 40)
    # progressive SOF2 is a typed capability edge
    prog = bytearray(payload)
    sof = prog.find(b"\xff\xc0")
    prog[sof + 1] = 0xC2
    with pytest.raises(MissingFeatureError):
        JC.decode_jpeg(bytes(prog))


# ------------------------------------------------------- MJPEG-AVI codec
def test_avi_mjpeg_roundtrip_and_stride():
    from kerf_spark.operators import jpegcodec as JC
    from kerf_spark.operators import videocodec as VC

    frames_px, jpegs = [], []
    for f in range(5):
        blocks = np.array([[(f * 17 + bx * 7) % 256 for bx in range(2)]])
        img = np.repeat(np.repeat(blocks, 8, 0), 8, 1).astype(np.uint8)
        frames_px.append(img)
        jpegs.append(JC.encode_jpeg(img))
    avi = VC.encode_avi_mjpeg(jpegs, 16, 8, fps=10)
    assert VC.sniff_avi(avi) == (16, 8, 5, 10, "MJPG")
    assert VC.extract_frames(avi) == jpegs  # byte-exact container walk
    dec = VC.decode_frames(avi, stride=2)
    assert len(dec) == 3
    for d, want in zip(dec, frames_px[::2]):
        np.testing.assert_array_equal(d[:, :, 0], want)


def test_avi_typed_edges():
    from kerf_spark.operators import jpegcodec as JC
    from kerf_spark.operators import videocodec as VC

    with pytest.raises(FormatStringError):
        VC.sniff_avi(b"RIFF\x00\x00\x00\x00WAVE" + b"\x00" * 40)
    img = np.zeros((8, 8), np.uint8)
    avi = VC.encode_avi_mjpeg([JC.encode_jpeg(img)], 8, 8)
    # a non-MJPG fourcc is a typed capability edge, not a crash
    with pytest.raises(MissingFeatureError):
        VC.decode_frames(avi.replace(b"vidsMJPG", b"vidsH264"))


# ------------------------------------------------------------ WAV codec
def test_wav_roundtrip_mono_and_stereo():
    from kerf_spark.operators import audiocodec as AC

    rng = np.random.default_rng(3)
    mono = rng.integers(-(2**15), 2**15, size=257, dtype=np.int16)
    payload = AC.encode_wav(mono, 16000)
    assert AC.sniff_wav(payload) == (16000, 1, 16, 257)
    sr, dec = AC.decode_wav(payload)
    assert sr == 16000
    np.testing.assert_array_equal(dec[:, 0], mono)

    stereo = rng.integers(-(2**15), 2**15, size=(64, 2), dtype=np.int16)
    payload = AC.encode_wav(stereo, 44100)
    assert AC.sniff_wav(payload) == (44100, 2, 16, 64)
    np.testing.assert_array_equal(AC.decode_wav(payload)[1], stereo)


def test_wav_rejects_compressed_and_garbage():
    import struct as _s

    from kerf_spark.operators import audiocodec as AC

    with pytest.raises(FormatStringError):
        AC.sniff_wav(b"II*\x00 definitely not wav" + b"\x00" * 40)
    # format tag 85 (MP3-in-WAV) is declared out of scope, typed
    fmt = _s.pack("<HHIIHH", 85, 1, 8000, 8000, 1, 16)
    body = b"WAVE" + b"fmt " + _s.pack("<I", len(fmt)) + fmt + b"data" + _s.pack("<I", 0)
    payload = b"RIFF" + _s.pack("<I", len(body)) + body
    with pytest.raises(MissingFeatureError):
        AC.sniff_wav(payload)


def test_wav_malformed_fmt_raises_typed():
    """channels=0 / truncated fmt chunks hit the typed-error contract
    (FormatStringError), never ZeroDivisionError or struct.error
    (ADVICE r4)."""
    import struct as _s

    from kerf_spark.operators import audiocodec as AC

    # degenerate: PCM with 0 channels
    fmt = _s.pack("<HHIIHH", 1, 0, 16000, 0, 0, 16)
    body = (
        b"WAVE" + b"fmt " + _s.pack("<I", len(fmt)) + fmt
        + b"data" + _s.pack("<I", 4) + b"\x00" * 4
    )
    payload = b"RIFF" + _s.pack("<I", len(body)) + body
    with pytest.raises(FormatStringError):
        AC.sniff_wav(payload)

    # truncated: fmt chunk header present, body cut off mid-buffer
    body = b"WAVE" + b"JUNK" + _s.pack("<I", 16) + b"\x00" * 16
    body += b"fmt " + _s.pack("<I", 16) + b"\x00" * 2  # 2 of 16 bytes
    payload = b"RIFF" + _s.pack("<I", len(body)) + body
    assert len(payload) >= 44
    with pytest.raises(FormatStringError):
        AC.sniff_wav(payload)


def test_unrecognized_and_unsupported_are_typed():
    with pytest.raises(FormatStringError):
        IC.sniff_header(b"not an image at all")
    # baseline jpeg now decodes (jpegcodec); a stream that declares a
    # frame but carries no scan stays a typed format error, and gif
    # remains a metadata-only format
    app0 = b"\xff\xe0" + struct.pack(">H", 4) + b"JF"
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + bytes([8]) + struct.pack(
        ">HH", 2, 2
    ) + bytes([3, 1, 0x11, 0])
    jpeg = b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"
    with pytest.raises(FormatStringError):
        IC.decode_pixels(jpeg)  # no SOS / no huffman tables
    # gif now really decodes; a headerless one stays a typed error
    gif = b"GIF89a" + struct.pack("<HH", 2, 2) + b"\x00" * 20
    with pytest.raises(FormatStringError):
        IC.decode_pixels(gif)


def test_gif_lzw_roundtrip_exact():
    """GIF is lossless: real LZW encode→decode must reproduce palette
    images bit-for-bit, across table-growth and table-reset paths."""
    rng = np.random.default_rng(5)
    for h, w, n in [(1, 1, 2), (7, 13, 16), (24, 40, 256)]:
        pal = rng.integers(0, 256, size=(n, 3)).astype(np.uint8)
        idx = rng.integers(0, n, size=(h, w)).astype(np.uint8)
        dec = IC.decode_gif(IC.encode_gif(idx, pal))
        np.testing.assert_array_equal(dec, pal[idx])
    # structured gradient overflows the 4096-entry dict: reset path
    idx = (np.arange(200 * 120).reshape(200, 120) % 251).astype(np.uint8)
    pal = rng.integers(0, 256, size=(256, 3)).astype(np.uint8)
    dec = IC.decode_gif(IC.encode_gif(idx, pal))
    np.testing.assert_array_equal(dec, pal[idx])
    assert IC.sniff_header(IC.encode_gif(idx, pal))[0] == "gif"


def test_gif_robustness_edges():
    """Corrupt LZW codes, oversized palettes, and offset sub-frames all
    hit typed/spec behavior, never IndexError or silent garbage
    (review r4)."""
    rng = np.random.default_rng(6)
    # out-of-range first code: typed, not IndexError
    with pytest.raises(FormatStringError):
        IC._lzw_decode(bytes([4 | (7 << 3)]), 2)
    # palette > 256 / index out of range: typed at encode time
    with pytest.raises(FormatStringError):
        IC.encode_gif(np.zeros((2, 2), np.uint8),
                      rng.integers(0, 256, (300, 3)).astype(np.uint8))
    with pytest.raises(FormatStringError):
        IC.encode_gif(np.full((2, 2), 5, np.uint8),
                      np.zeros((2, 3), np.uint8))
    # optimized GIF: sub-frame honors descriptor offsets on the screen
    pal = np.array([[9, 9, 9], [200, 10, 30]], np.uint8)
    sub = IC.encode_gif(np.ones((2, 3), np.uint8), pal)
    # rewrite: logical screen 6x5, frame 3x2 at (left=2, top=1), bg=0
    body = bytearray(sub)
    import struct as _s
    _s.pack_into("<HH", body, 6, 6, 5)          # logical screen w,h
    i = bytes(body).find(b"\x2c")
    _s.pack_into("<HHHH", body, i + 1, 2, 1, 3, 2)  # left, top, w, h
    dec = IC.decode_gif(bytes(body))
    assert dec.shape == (5, 6, 3)
    want = np.broadcast_to(pal[0], (5, 6, 3)).copy()
    want[1:3, 2:5] = pal[1]
    np.testing.assert_array_equal(dec, want)
