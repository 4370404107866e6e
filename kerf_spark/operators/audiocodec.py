"""Dependency-free audio codec: real WAV/PCM decode for multimodal.

The audio twin of ``operators.imagecodec``: RIFF/WAVE container parsing
and 16-bit PCM sample decode need only ``struct`` + numpy, so the
multimodal audio path gets a REAL kernel, not a stub.  Compressed
codecs (MP3/AAC/Opus) genuinely need external libraries and stay out of
scope behind a typed MissingFeatureError.

Runs inside Arrow-batched ``mapInPandas`` (bounded batches, per-task).
"""

from __future__ import annotations

import struct

import numpy as np

from ..errors import FormatStringError, MissingFeatureError


def sniff_wav(payload: bytes) -> tuple[int, int, int, int]:
    """(sample_rate, channels, bits, n_samples) from a RIFF/WAVE header.

    ``n_samples`` counts per-channel frames in the data chunk.
    """
    b = bytes(payload)
    if len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise FormatStringError("not a RIFF/WAVE payload")
    pos = 12
    sr = ch = bits = 0
    n_data = -1
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (size,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        if cid == b"fmt ":
            # typed-error contract: truncated or degenerate fmt chunks
            # (channels=0, bits=0) must raise FormatStringError, never a
            # bare struct.error / ZeroDivisionError
            try:
                fmt, ch, sr = struct.unpack("<HHI", b[pos + 8 : pos + 16])
                bits = struct.unpack("<H", b[pos + 22 : pos + 24])[0]
            except struct.error as exc:
                raise FormatStringError(f"wav: truncated fmt chunk: {exc}")
            if fmt != 1:
                raise MissingFeatureError(
                    f"wav: compression format {fmt} needs an external codec"
                )
            if ch <= 0 or bits < 8:
                raise FormatStringError(
                    f"wav: malformed fmt chunk (channels={ch}, bits={bits})"
                )
        elif cid == b"data":
            n_data = size
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if not sr or n_data < 0:
        raise FormatStringError("wav: missing fmt/data chunk")
    n_samples = n_data // (ch * (bits // 8))
    return (sr, ch, bits, n_samples)


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """(sample_rate, samples[frames, channels] int16) — 16-bit PCM only."""
    b = bytes(payload)
    sr, ch, bits, n = sniff_wav(b)
    if bits != 16:
        raise MissingFeatureError("wav: only 16-bit PCM supported")
    pos = 12
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (size,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        if cid == b"data":
            raw = np.frombuffer(b, "<i2", n * ch, pos + 8)
            return (sr, raw.reshape(n, ch))
        pos += 8 + size + (size & 1)
    raise FormatStringError("wav: data chunk vanished")  # pragma: no cover


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Minimal 16-bit PCM writer; samples shaped (frames,) or
    (frames, channels)."""
    a = np.asarray(samples, dtype="<i2")
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    data = a.tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body
