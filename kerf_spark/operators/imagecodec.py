"""Dependency-free image codec: the REAL decode kernel for multimodal.

The container ships no image libraries, but "real decode" does not need
one: PNG is zlib (stdlib) + per-row unfiltering, and metadata decode
for JPEG/GIF/BMP/PPM is pure header parsing.  This module implements:

* :func:`sniff_header` — format/width/height/channels from real bytes
  for PNG, JPEG (SOF scan), GIF, BMP, PPM/PGM;
* :func:`decode_png` — full pixel decode of 8-bit non-interlaced
  grayscale / gray+alpha / RGB / RGBA PNGs (all five scanline filters);
* :func:`encode_png` — minimal writer (filter 0, zlib, CRC32) used by
  the bytes-roundtrip oracle.

JPEG *pixel* decode lives in the sibling ``jpegcodec`` module (baseline
DCT + Huffman, stdlib + numpy); ``decode_pixels`` dispatches to it.
Progressive/arithmetic/12-bit JPEG stay behind typed
MissingFeatureErrors there.

This is a per-row kernel by design — it runs inside Arrow-batched
``mapInPandas`` (operators.multimodal), where Spark hands it bounded
batches; nothing here touches the driver.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from ..errors import FormatStringError, MissingFeatureError

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

#: PNG color type -> channel count (8-bit assumed)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def sniff_header(payload: bytes) -> tuple[str, int, int, int]:
    """(format, width, height, channels) from real image bytes.

    Raises FormatStringError for unrecognized payloads.
    """
    b = bytes(payload)
    if b.startswith(_PNG_SIG) and len(b) >= 33 and b[12:16] == b"IHDR":
        w, h = struct.unpack(">II", b[16:24])
        ctype = b[25]
        return ("png", w, h, _PNG_CHANNELS.get(ctype, 0))
    if b[:2] == b"\xff\xd8":  # JPEG: scan for a start-of-frame marker
        i = 2
        while i + 9 < len(b):
            if b[i] != 0xFF:
                i += 1
                continue
            marker = b[i + 1]
            if marker in (0xC0, 0xC1, 0xC2, 0xC3):  # SOFn
                h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                return ("jpeg", w, h, b[i + 9])
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg = struct.unpack(">H", b[i + 2 : i + 4])[0]
            i += 2 + seg
        raise FormatStringError("jpeg: no SOF marker found")
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        w, h = struct.unpack("<HH", b[6:10])
        return ("gif", w, h, 3)
    if b[:2] == b"BM" and len(b) >= 30:
        w, h = struct.unpack("<ii", b[18:26])
        bpp = struct.unpack("<H", b[28:30])[0]
        return ("bmp", w, abs(h), max(1, bpp // 8))
    if b[:2] in (b"P5", b"P6"):
        fields = _ppm_fields(b)
        return ("ppm", fields[0], fields[1], 3 if b[:2] == b"P6" else 1)
    raise FormatStringError("unrecognized image payload")


def _ppm_fields(b: bytes) -> tuple[int, int, int, int]:
    """Parse PPM/PGM ASCII header: (width, height, maxval, data_offset)."""
    vals: list[int] = []
    i = 2
    while len(vals) < 3 and i < len(b):
        while i < len(b) and b[i : i + 1].isspace():
            i += 1
        if b[i : i + 1] == b"#":  # comment to end-of-line
            while i < len(b) and b[i] not in (10, 13):
                i += 1
            continue
        j = i
        while j < len(b) and not b[j : j + 1].isspace():
            j += 1
        vals.append(int(b[i:j]))
        i = j
    return (vals[0], vals[1], vals[2], i + 1)


# ------------------------------------------------------------------ PNG
def _unfilter(raw: bytes, w: int, h: int, c: int) -> np.ndarray:
    """Reverse PNG scanline filtering (spec §9: None/Sub/Up/Average/
    Paeth) -> (h, w, c) uint8 array."""
    stride = w * c
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    prev = np.zeros(stride, dtype=np.intp)
    for y in range(h):
        ftype = raw[pos]
        row = np.frombuffer(raw, np.uint8, stride, pos + 1).astype(np.intp)
        pos += 1 + stride
        if ftype == 0:
            cur = row
        elif ftype == 1:  # Sub: left neighbor
            cur = row.copy()
            for x in range(c, stride):
                cur[x] = (cur[x] + cur[x - c]) & 0xFF
        elif ftype == 2:  # Up
            cur = (row + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = row.copy()
            for x in range(stride):
                left = cur[x - c] if x >= c else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = row.copy()
            for x in range(stride):
                a = cur[x - c] if x >= c else 0
                bb = prev[x]
                cc = prev[x - c] if x >= c else 0
                p = a + bb - cc
                pa, pb, pc = abs(p - a), abs(p - bb), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (bb if pb <= pc else cc)
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise FormatStringError(f"png: bad filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(h, w, c)


def decode_png(payload: bytes) -> np.ndarray:
    """Full pixel decode: 8-bit non-interlaced PNG -> (h, w, c) uint8."""
    b = bytes(payload)
    if not b.startswith(_PNG_SIG):
        raise FormatStringError("not a png")
    pos, w = 8, 0
    h = c = 0
    idat = bytearray()
    while pos + 8 <= len(b):
        (length,) = struct.unpack(">I", b[pos : pos + 4])
        ctype = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            w, h = struct.unpack(">II", data[:8])
            depth, color, _, _, interlace = data[8:13]
            if depth != 8:
                raise MissingFeatureError("png: only 8-bit depth supported")
            if interlace:
                raise MissingFeatureError("png: interlaced not supported")
            if color not in (0, 2, 4, 6):
                raise MissingFeatureError("png: palette not supported")
            c = _PNG_CHANNELS[color]
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (w * c + 1):
        raise FormatStringError("png: IDAT size mismatch")
    return _unfilter(raw, w, h, c)


def encode_png(arr: np.ndarray) -> bytes:
    """Minimal PNG writer: 8-bit, filter 0 rows, one IDAT."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        body = ctype + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


# ------------------------------------------------------------------ GIF
def _lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """GIF-flavor LZW: variable-width codes, clear/end codes, 4096-entry
    dictionary cap."""
    clear = 1 << min_code_size
    end = clear + 1
    out: list[int] = []
    table: list[list[int]] = []
    width = prev = 0

    def reset():
        nonlocal table, width, prev
        table = [[i] for i in range(clear)] + [[], []]
        width = min_code_size + 1
        prev = -1

    reset()
    acc = nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                reset()
                continue
            if code == end:
                return out
            # typed-error contract: corrupt streams must raise, not
            # IndexError / silent garbage.  A fresh code may reference
            # at most the next table slot (the KwKwK case).
            if code > len(table) or (prev < 0 and code >= len(table)):
                raise FormatStringError(
                    f"gif: LZW code {code} out of range"
                )
            if prev < 0:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(table[prev] + [entry[0]])
            else:  # the KwKwK case (code == len(table))
                entry = table[prev] + [table[prev][0]]
                table.append(entry)
            out.extend(entry)
            prev = code
            if len(table) >= (1 << width) and width < 12:
                width += 1
    return out


def _lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    run: tuple[int, ...] = ()
    for v in indices:
        cand = run + (v,)
        if cand in table:
            run = cand
            continue
        emit(table[run])
        table[cand] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:  # table full: reset
            emit(clear)
            table = {(i,): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        run = (v,)
    if run:
        emit(table[run])
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def decode_gif(payload: bytes) -> np.ndarray:
    """Full pixel decode of a GIF87a/89a first frame -> (h, w, 3) uint8
    via LZW + palette lookup; interlaced row order handled."""
    b = bytes(payload)
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise FormatStringError("not a gif")
    w, h = struct.unpack("<HH", b[6:10])
    flags = b[10]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(b, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    while pos < len(b):
        block = b[pos]
        if block == 0x21:  # extension: skip sub-blocks
            pos += 2
            while pos < len(b) and b[pos]:
                pos += 1 + b[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            left, top, iw, ih = struct.unpack("<HHHH", b[pos + 1 : pos + 9])
            iflags = b[pos + 9]
            pos += 10
            pal = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                pal = np.frombuffer(b, np.uint8, 3 * n, pos).reshape(n, 3)
                pos += 3 * n
            if pal is None:
                raise FormatStringError("gif: no color table")
            mcs = b[pos]
            pos += 1
            data = bytearray()
            while pos < len(b) and b[pos]:
                ln = b[pos]
                data += b[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = _lzw_decode(bytes(data), mcs)
            if len(idx) < iw * ih:
                raise FormatStringError("gif: truncated LZW data")
            grid = np.array(idx[: iw * ih], np.int32).reshape(ih, iw)
            if iflags & 0x40:  # interlaced: pass order 8/8, 8/4+4, 4/2, 2/1
                rows = (
                    list(range(0, ih, 8)) + list(range(4, ih, 8))
                    + list(range(2, ih, 4)) + list(range(1, ih, 2))
                )
                de = np.empty_like(grid)
                de[rows] = grid
                grid = de
            frame = pal[np.clip(grid, 0, len(pal) - 1)]
            if (left, top, iw, ih) == (0, 0, w, h):
                return frame
            # optimized GIFs place a sub-frame on the logical screen:
            # honor the descriptor offsets, background-fill the rest
            if left + iw > w or top + ih > h:
                raise FormatStringError("gif: frame exceeds logical screen")
            bg = b[11]
            canvas = np.broadcast_to(
                pal[min(bg, len(pal) - 1)], (h, w, 3)
            ).copy()
            canvas[top : top + ih, left : left + iw] = frame
            return canvas
        elif block == 0x3B:
            break
        else:
            raise FormatStringError(f"gif: unknown block 0x{block:02x}")
    raise FormatStringError("gif: no image descriptor")


def encode_gif(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """Minimal GIF89a writer: one frame, global color table, real LZW."""
    idx = np.asarray(indices, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8)
    h, w = idx.shape
    n = len(pal)
    if not 1 <= n <= 256:
        raise FormatStringError(f"gif: palette must have 1..256 entries, got {n}")
    if idx.size and int(idx.max()) >= n:
        raise FormatStringError("gif: index out of palette range")
    bits = max(1, (n - 1).bit_length())
    size = 1 << bits
    table = np.zeros((size, 3), np.uint8)
    table[:n] = pal
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) & 7), 0, 0)
    out += table.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    mcs = max(2, bits)
    out.append(mcs)
    lzw = _lzw_encode(idx.flatten().tolist(), mcs)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def decode_pixels(payload: bytes) -> np.ndarray:
    """Pixel decode for the formats with dependency-free codecs."""
    b = bytes(payload)
    fmt = sniff_header(b)[0]
    if fmt == "png":
        return decode_png(b)
    if fmt == "jpeg":
        from .jpegcodec import decode_jpeg

        return decode_jpeg(b)
    if fmt == "gif":
        return decode_gif(b)
    if fmt == "ppm":
        w, h, maxval, off = _ppm_fields(b)
        c = 3 if b[:2] == b"P6" else 1
        return np.frombuffer(b, np.uint8, h * w * c, off).reshape(h, w, c)
    if fmt == "bmp":
        w, h_signed = struct.unpack("<ii", b[18:26])
        bpp = struct.unpack("<H", b[28:30])[0]
        if bpp != 24:
            raise MissingFeatureError("bmp: only 24-bit supported")
        (off,) = struct.unpack("<I", b[10:14])
        h = abs(h_signed)
        stride = (w * 3 + 3) & ~3
        rows = [
            np.frombuffer(b, np.uint8, w * 3, off + y * stride).reshape(w, 3)
            for y in range(h)
        ]
        img = np.stack(rows[::-1] if h_signed > 0 else rows)
        return img[:, :, ::-1]  # BGR -> RGB
    raise MissingFeatureError(f"{fmt}: pixel decode needs an external codec")
