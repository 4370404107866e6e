"""Dependency-free baseline JPEG codec (stdlib + numpy).

Completes the multimodal image surface beyond headers: real baseline
DCT pixel decode — segment parsing (DQT/DHT/SOF0/DRI/SOS), canonical
Huffman entropy decode with byte-unstuffing and restart markers,
dequantize + 8x8 IDCT (orthonormal DCT matrix, pure numpy), chroma
upsampling for 4:4:4 / 4:2:2 / 4:2:0, and JFIF YCbCr→RGB.  The
matching encoder (grayscale / RGB, optional 2x2 chroma subsampling,
Annex-K Huffman tables) exists so tests and oracles can round-trip
without any external image library.

Honest capability edges stay typed: progressive (SOF2), arithmetic
coding, 12-bit precision, and CMYK raise MissingFeatureError.

Like the PNG codec this is a per-row kernel: it runs inside
Arrow-batched ``mapInPandas`` on bounded batches, never on the driver.

Exactness note for oracles: JPEG is lossy, but an image whose 8x8
blocks are each CONSTANT has only DC energy — with a unit quant table
the DC coefficient is an exact integer and every AC coefficient is
exactly zero, so encode→decode reproduces the pixels bit-for-bit.
``multimodal.jpeg_roundtrip_check`` builds exactly such images, which
is what makes a lossy binary codec closed-form oracle-checkable.
"""

from __future__ import annotations

import struct

import numpy as np

from ..errors import FormatStringError, MissingFeatureError

# ------------------------------------------------------------ constants
_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
])

# orthonormal 8-point DCT-II basis: forward F = M @ B @ M.T, inverse
# B = M.T @ F @ M (M is orthogonal)
_M = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _s = np.sqrt(1 / 8) if _u == 0 else 0.5
        _M[_u, _x] = _s * np.cos((2 * _x + 1) * _u * np.pi / 16)

# Annex K (K.3.3) standard Huffman table specs: (bits[1..16], values)
_DC_LUMA = (
    [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _canonical_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """JPEG canonical Huffman assignment: value -> (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for bit-serial decoding."""
    enc = _canonical_codes(bits, values)
    return {(ln, code): sym for sym, (code, ln) in enc.items()}


# ------------------------------------------------------------ bit I/O
class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            byte = (self._acc >> (self._n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self._n -= 8
        self._acc &= (1 << self._n) - 1

    def flush(self) -> bytes:
        if self._n:
            self.write(0x7F, 8 - self._n)  # pad with 1s per spec
        return bytes(self.buf)


class _BitReader:
    """Entropy-segment reader: unstuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise FormatStringError("jpeg: entropy data truncated")
            byte = self.data[self.pos]
            if byte == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else None
                if nxt == 0x00:
                    self.pos += 2
                else:  # a real marker: the scan is over / malformed
                    raise FormatStringError("jpeg: marker inside entropy data")
            else:
                self.pos += 1
            self._acc = byte
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def align_restart(self) -> None:
        """Byte-align and consume an RSTn marker."""
        self._n = 0
        if (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 2
        else:
            raise FormatStringError("jpeg: expected restart marker")

    def huffman(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise FormatStringError("jpeg: invalid huffman code")

    def receive_extend(self, size: int) -> int:
        if size == 0:
            return 0
        v = 0
        for _ in range(size):
            v = (v << 1) | self.bit()
        if v < (1 << (size - 1)):  # negative branch
            v -= (1 << size) - 1
        return v


# ------------------------------------------------------------- encoder
def _magnitude(v: int) -> tuple[int, int]:
    """(size, raw bits) for a coefficient value."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v >= 0 else v + (1 << size) - 1
    return size, bits


def _encode_block(
    w: _BitWriter,
    block: np.ndarray,
    q: np.ndarray,
    pred: int,
    dc_tab: dict[int, tuple[int, int]],
    ac_tab: dict[int, tuple[int, int]],
) -> int:
    f = _M @ (block.astype(np.float64) - 128.0) @ _M.T
    coef = np.round(f / q).astype(np.int64)
    zz = coef.flatten()[_ZIGZAG]
    dc = int(zz[0])
    size, bits = _magnitude(dc - pred)
    code, ln = dc_tab[size]
    w.write(code, ln)
    if size:
        w.write(bits, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            if k > last_nz:
                break
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]  # ZRL
            w.write(code, ln)
            run -= 16
        size, bits = _magnitude(v)
        code, ln = ac_tab[(run << 4) | size]
        w.write(code, ln)
        w.write(bits, size)
        run = 0
    if last_nz < 63:
        code, ln = ac_tab[0x00]  # EOB
        w.write(code, ln)
    return dc


def _dht_segment(tc_th: int, bits: list[int], values: list[int]) -> bytes:
    body = bytes([tc_th]) + bytes(bits[1:]) + bytes(values)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _dqt_segment(tq: int, q: np.ndarray) -> bytes:
    body = bytes([tq]) + bytes(int(x) for x in q.flatten()[_ZIGZAG])
    return b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(
    arr: np.ndarray, q: np.ndarray | int = 1, subsample: bool = False
) -> bytes:
    """Baseline JFIF encoder: (h, w) or (h, w, 1) grayscale, or
    (h, w, 3) RGB (4:4:4, or 4:2:0 with ``subsample=True``).

    ``q`` is a uniform quantizer value or a full 8x8 table; the default
    unit table makes constant 8x8 blocks decode exactly (see module
    docstring) and everything else near-losslessly.
    """
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ncomp = a.shape
    if ncomp not in (1, 3):
        raise MissingFeatureError("jpeg encode: 1 or 3 channels only")
    qt = (np.full((8, 8), int(q)) if np.isscalar(q) else np.asarray(q)).astype(
        np.float64
    )

    if ncomp == 3:
        rgb = a.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = 128.0 - 0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2]
        cr = 128.0 + 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2]
        planes = [y, cb, cr]
    else:
        planes = [a[..., 0].astype(np.float64)]

    hv = [(2, 2), (1, 1), (1, 1)] if (ncomp == 3 and subsample) else [(1, 1)] * ncomp
    hmax = max(x for x, _ in hv[:ncomp])
    vmax = max(y_ for _, y_ in hv[:ncomp])
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcux = (w + mcu_w - 1) // mcu_w
    mcuy = (h + mcu_h - 1) // mcu_h

    comp_planes = []
    for ci in range(ncomp):
        hi, vi = hv[ci]
        cw, ch = (w * hi + hmax - 1) // hmax, (h * vi + vmax - 1) // vmax
        if (hi, vi) == (hmax, vmax):
            p = planes[ci]
        else:  # box-filter downsample (2x2 average), exact for constants
            fx, fy = hmax // hi, vmax // vi
            pw, ph = cw * fx, ch * fy
            src = np.pad(
                planes[ci], ((0, ph - h), (0, pw - w)), mode="edge"
            )
            p = src.reshape(ch, fy, cw, fx).mean(axis=(1, 3))
        # pad to whole MCU coverage with edge replication
        tw, th = mcux * hi * 8, mcuy * vi * 8
        p = np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge")
        comp_planes.append(p)

    dc_l = _canonical_codes(*_DC_LUMA)
    ac_l = _canonical_codes(*_AC_LUMA)
    dc_c = _canonical_codes(*_DC_CHROMA)
    ac_c = _canonical_codes(*_AC_CHROMA)
    tabs = [(dc_l, ac_l)] + [(dc_c, ac_c)] * (ncomp - 1)

    bw = _BitWriter()
    preds = [0] * ncomp
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(ncomp):
                hi, vi = hv[ci]
                for by in range(vi):
                    for bx in range(hi):
                        y0 = (my * vi + by) * 8
                        x0 = (mx * hi + bx) * 8
                        block = comp_planes[ci][y0 : y0 + 8, x0 : x0 + 8]
                        preds[ci] = _encode_block(
                            bw, block, qt, preds[ci], *tabs[ci]
                        )

    out = bytearray(b"\xff\xd8")  # SOI
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HHBB", 1, 1, 0, 0)
    )
    out += _dqt_segment(0, qt)
    sof_comps = b"".join(
        bytes([ci + 1, (hv[ci][0] << 4) | hv[ci][1], 0]) for ci in range(ncomp)
    )
    out += (
        b"\xff\xc0"
        + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
        + sof_comps
    )
    out += _dht_segment(0x00, *_DC_LUMA) + _dht_segment(0x10, *_AC_LUMA)
    if ncomp == 3:
        out += _dht_segment(0x01, *_DC_CHROMA) + _dht_segment(0x11, *_AC_CHROMA)
    sos_comps = b"".join(
        bytes([ci + 1, 0x00 if ci == 0 else 0x11]) for ci in range(ncomp)
    )
    out += (
        b"\xff\xda"
        + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
        + sos_comps
        + b"\x00\x3f\x00"
    )
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------------------- decoder
def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG -> (h, w, c) uint8.  Supports SOF0/SOF1, restart
    intervals, sampling factors up to 2, 1- or 3-component scans."""
    b = bytes(payload)
    if b[:2] != b"\xff\xd8":
        raise FormatStringError("not a jpeg")
    qtables: dict[int, np.ndarray] = {}
    htables: dict[int, dict[tuple[int, int], int]] = {}
    comps: list[dict] = []
    h = w = 0
    restart = 0
    pos = 2
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise FormatStringError("jpeg: expected marker")
        # T.81 B.1.1.2: markers may be preceded by any number of 0xFF
        # fill bytes — external encoders emit them
        while pos + 4 <= len(b) and b[pos + 1] == 0xFF:
            pos += 1
        marker = b[pos + 1]
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack(">H", b[pos + 2 : pos + 4])[0]
        seg = b[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                if pq != 0:
                    raise MissingFeatureError("jpeg: 16-bit quant tables")
                tbl = np.zeros(64)
                tbl[_ZIGZAG] = np.frombuffer(seg, np.uint8, 64, i + 1)
                qtables[tq] = tbl.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc_th = seg[i]
                bits = [0] + list(seg[i + 1 : i + 17])
                n = sum(bits)
                values = list(seg[i + 17 : i + 17 + n])
                htables[tc_th] = _decode_table(bits, values)
                i += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise MissingFeatureError("jpeg: only 8-bit precision")
            if nc not in (1, 3):
                raise MissingFeatureError("jpeg: 1 or 3 components only")
            if len(seg) < 6 + 3 * nc:
                raise FormatStringError("jpeg: truncated SOF segment")
            for ci in range(nc):
                cid, hvb, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append(
                    {"id": cid, "h": hvb >> 4, "v": hvb & 0xF, "tq": tq}
                )
        elif marker == 0xC2:
            raise MissingFeatureError("jpeg: progressive needs an external codec")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise MissingFeatureError("jpeg: non-baseline SOF")
        elif marker == 0xDD:  # DRI
            restart = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            for si in range(ns):
                cid, tabs = seg[1 + 2 * si : 3 + 2 * si]
                for comp in comps:
                    if comp["id"] == cid:
                        comp["td"], comp["ta"] = tabs >> 4, tabs & 0xF
            data_pos = pos + 2 + seglen
            return _decode_scan(b, data_pos, comps, qtables, htables, h, w, restart)
        pos += 2 + seglen
    raise FormatStringError("jpeg: no SOS marker")


def _decode_scan(b, pos, comps, qtables, htables, h, w, restart):
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax > 2 or vmax > 2:
        raise MissingFeatureError("jpeg: sampling factors > 2")
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        c["plane"] = np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), np.float64)
        c["pred"] = 0
        c["q"] = qtables[c["tq"]]

    r = _BitReader(b, pos)
    mt = _M.T
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and n_mcu and n_mcu % restart == 0:
                r.align_restart()
                for c in comps:
                    c["pred"] = 0
            n_mcu += 1
            for c in comps:
                dc_tab = htables.get(0x00 | c["td"])
                ac_tab = htables.get(0x10 | c["ta"])
                if dc_tab is None or ac_tab is None:
                    raise FormatStringError("jpeg: missing huffman table")
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64)
                        size = r.huffman(dc_tab)
                        c["pred"] += r.receive_extend(size)
                        zz[0] = c["pred"]
                        k = 1
                        while k < 64:
                            rs = r.huffman(ac_tab)
                            run, size = rs >> 4, rs & 0xF
                            if size == 0:
                                if run == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise FormatStringError("jpeg: AC index overflow")
                            zz[k] = r.receive_extend(size)
                            k += 1
                        coef = np.zeros(64)
                        coef[_ZIGZAG] = zz
                        blk = mt @ (coef.reshape(8, 8) * c["q"]) @ _M
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        c["plane"][y0 : y0 + 8, x0 : x0 + 8] = blk + 128.0

    out_planes = []
    for c in comps:
        p = c["plane"]
        fx, fy = hmax // c["h"], vmax // c["v"]
        if fx > 1 or fy > 1:  # nearest-neighbor chroma upsample
            p = np.repeat(np.repeat(p, fy, axis=0), fx, axis=1)
        out_planes.append(p[:h, :w])

    if len(comps) == 1:
        gray = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return gray[:, :, None]
    y, cb, cr = out_planes
    r_ = y + 1.402 * (cr - 128.0)
    g_ = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b_ = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r_, g_, b_], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
