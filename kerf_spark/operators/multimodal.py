"""Multimodal columns: binary payloads + typed metadata over mapInPandas.

Image/audio/video payloads ride as opaque ``BinaryType`` columns with a
metadata struct; decode / feature-extract / resize / frame-sample run
as Arrow-batched ``mapInPandas`` stages (SURVEY.md §7 milestone 5).

Decode modes, selected by ``KERF_SPARK_FAKE_DECODE``:

* ``fake`` (default): deterministic metadata derived from the bytes
  (md5-seeded) — used with fixture payloads that are NOT images (the
  documents table carries text bytes), so the Spark-side plumbing —
  schema, batching, partitioning, UDF signature — is testable on any
  payload.
* ``real``: the dependency-free codec in ``operators.imagecodec`` —
  true header parsing for PNG/JPEG/GIF/BMP/PPM and full pixel decode
  for 8-bit PNG (zlib + all five scanline filters), no image library
  required.  Only JPEG *pixel* decode (DCT entropy coding) remains
  behind a typed MissingFeatureError.  The ``multimodal_real_decode``
  query proves an encode→decode bytes roundtrip against a closed-form
  oracle.

Scale design: mapInPandas streams Arrow batches — bounded memory per
task regardless of corpus size; payload columns are pruned unless
requested; binary columns should be stored in their own parquet files
(column-per-file, kerf's directory-expanded layout) so metadata scans
never touch pixels.
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DECODE_MODE = os.environ.get("KERF_SPARK_FAKE_DECODE", "fake")

#: metadata schema attached by decode_images
IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("n_bytes", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
    ]
)


def attach_binary(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Fixture adapter: materialize a BinaryType payload column (UTF-8
    bytes of ``text_col``) so the multimodal path has real bytes to
    move.  In production the payload arrives from the source as-is."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8").cast("binary"))


def _fake_decode(payload: bytes) -> tuple[int, str, int, int, int]:
    """Deterministic fake image header: md5-derived dims."""
    h = hashlib.md5(payload).digest()
    width = 16 + h[0] % 240
    height = 16 + h[1] % 240
    channels = 1 + h[2] % 4
    fmt = ["png", "jpeg", "webp"][h[3] % 3]
    return (len(payload), fmt, width, height, channels)


def _real_decode(payload: bytes) -> tuple[int, str, int, int, int]:
    """Real header decode via the dependency-free codec."""
    from .imagecodec import sniff_header

    fmt, w, h, c = sniff_header(payload)
    return (len(payload), fmt, w, h, c)


def decode_images(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """payload -> image metadata struct, via Arrow-batched mapInPandas.

    Output schema: (id, meta struct) — stable regardless of decode mode.
    """
    out_schema = T.StructType(
        [T.StructField(id_col, T.LongType()), T.StructField("meta", IMAGE_META_SCHEMA)]
    )
    decode = _fake_decode if DECODE_MODE == "fake" else _real_decode

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            metas = [
                None if b is None else decode(bytes(b)) for b in pdf[payload_col]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "meta": [
                        None
                        if m is None
                        else {
                            "n_bytes": m[0],
                            "format": m[1],
                            "width": m[2],
                            "height": m[3],
                            "channels": m[4],
                        }
                        for m in metas
                    ],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def png_roundtrip_check(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL-decode proof: deterministic PNG encode→decode per id.

    For each id the kernel synthesizes an image with closed-form
    dims/pixels (width ``1+id%48``, height ``1+(id*7)%32``, channels
    ``[1,3,4][id%3]``, row ``y`` filled with ``(id+y)%256``), writes a
    real PNG (``imagecodec.encode_png``: zlib, CRC32), then decodes it
    back with the real parser (``imagecodec.decode_png``: inflate +
    unfilter) and emits the decoded metadata and pixel checksum.  Every
    output value is independently computable in plain SQL, which is
    what makes a binary codec oracle-checkable.

    Arrow-batched mapInPandas; payload bytes never leave the task.
    """
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("format", T.StringType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("channels", T.IntegerType()),
            T.StructField("checksum", T.LongType()),
        ]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        from .imagecodec import decode_pixels, encode_png, sniff_header

        for pdf in batches:
            rows = []
            for i in pdf[id_col]:
                i = int(i)
                w, h = 1 + i % 48, 1 + (i * 7) % 32
                c = (1, 3, 4)[i % 3]
                arr = np.empty((h, w, c), dtype=np.uint8)
                for y in range(h):
                    arr[y, :, :] = (i + y) % 256
                payload = encode_png(arr)
                fmt, dw, dh, dc = sniff_header(payload)
                dec = decode_pixels(payload)
                if dec.shape != (h, w, c) or not np.array_equal(dec, arr):
                    raise ValueError(f"png roundtrip mismatch for id={i}")
                rows.append((i, fmt, dw, dh, dc, int(dec.sum())))
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "format", "width", "height", "channels", "checksum"
                ],
            )

    return df.select(id_col).mapInPandas(run, schema=out_schema)


def wav_roundtrip_check(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL audio decode proof: deterministic WAV encode→decode per id.

    Per id the kernel synthesizes closed-form 16-bit PCM (sample rate
    ``8000*(1+id%3)``, ``100+id%400`` frames, sample ``j`` =
    ``(id*31 + j*7) % 4096 - 2048``), writes a real RIFF/WAVE container
    (``audiocodec.encode_wav``) and decodes it back with the real
    parser; emits decoded header fields + the sample sum, all
    independently computable in plain SQL.
    """
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("channels", T.IntegerType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("amp_sum", T.LongType()),
        ]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        from .audiocodec import decode_wav, encode_wav, sniff_wav

        for pdf in batches:
            rows = []
            for i in pdf[id_col]:
                i = int(i)
                sr = 8000 * (1 + i % 3)
                n = 100 + i % 400
                j = np.arange(n, dtype=np.int64)
                samples = ((i * 31 + j * 7) % 4096 - 2048).astype(np.int16)
                payload = encode_wav(samples, sr)
                dsr, dch, dbits, dn = sniff_wav(payload)
                sr2, dec = decode_wav(payload)
                if sr2 != sr or dn != n or not np.array_equal(dec[:, 0], samples):
                    raise ValueError(f"wav roundtrip mismatch for id={i}")
                rows.append((i, dsr, dch, dn, int(dec.sum())))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "sample_rate", "channels", "n_samples", "amp_sum"],
            )

    return df.select(id_col).mapInPandas(run, schema=out_schema)


def jpeg_roundtrip_check(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL lossy-codec decode proof: deterministic JPEG encode→decode
    per id, exact by construction.

    JPEG is lossy in general, but an image whose 8x8 blocks are each
    constant has only DC energy: with the unit quant table the DC
    coefficient is an exact integer and all AC coefficients are exactly
    zero, so baseline encode→decode reproduces the pixels bit-for-bit
    (see jpegcodec module docstring).  Per id the kernel builds such an
    image (width ``8*(1+id%6)``, height ``8*(1+(id*3)%4)``, grayscale;
    block (by, bx) filled with ``(id + by*31 + bx*7) % 256``), encodes a
    real baseline JFIF stream (DCT, Annex-K Huffman tables, byte
    stuffing), decodes it back through the full parser (segment walk,
    canonical Huffman, dequant + IDCT), asserts exact equality, and
    emits dims + pixel checksum — every value closed-form in plain SQL.
    """
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("format", T.StringType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("channels", T.IntegerType()),
            T.StructField("checksum", T.LongType()),
        ]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        from .imagecodec import decode_pixels, sniff_header
        from .jpegcodec import encode_jpeg

        for pdf in batches:
            rows = []
            for i in pdf[id_col]:
                i = int(i)
                bw, bh = 1 + i % 6, 1 + (i * 3) % 4
                by, bx = np.meshgrid(
                    np.arange(bh), np.arange(bw), indexing="ij"
                )
                blocks = (i + by * 31 + bx * 7) % 256
                arr = np.repeat(np.repeat(blocks, 8, 0), 8, 1).astype(np.uint8)
                payload = encode_jpeg(arr)
                fmt, dw, dh, dc = sniff_header(payload)
                dec = decode_pixels(payload)
                if dec.shape != (bh * 8, bw * 8, 1) or not np.array_equal(
                    dec[:, :, 0], arr
                ):
                    raise ValueError(f"jpeg roundtrip mismatch for id={i}")
                rows.append((i, fmt, dw, dh, dc, int(dec.sum())))
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "format", "width", "height", "channels", "checksum"
                ],
            )

    return df.select(id_col).mapInPandas(run, schema=out_schema)


def gif_roundtrip_check(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL GIF decode proof: deterministic palette image encode→decode
    per id, exact end-to-end (GIF is lossless — real LZW both ways).

    Per id: width ``1+id%40``, height ``1+(id*5)%24``, index grid
    ``(id + y*13 + x) % 256``, palette entry v = ``(v, v*3%256,
    v*7%256)``.  The kernel writes a real GIF89a (global color table +
    LZW sub-blocks), decodes it back (variable-width LZW, palette
    lookup), asserts exact equality, and emits dims + RGB checksum —
    closed-form in plain SQL.
    """
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("format", T.StringType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("checksum", T.LongType()),
        ]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        from .imagecodec import decode_pixels, encode_gif, sniff_header

        pal = np.stack(
            [
                np.arange(256),
                (np.arange(256) * 3) % 256,
                (np.arange(256) * 7) % 256,
            ],
            axis=1,
        ).astype(np.uint8)
        for pdf in batches:
            rows = []
            for i in pdf[id_col]:
                i = int(i)
                w, h = 1 + i % 40, 1 + (i * 5) % 24
                y, x = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
                idx = ((i + y * 13 + x) % 256).astype(np.uint8)
                payload = encode_gif(idx, pal)
                fmt, dw, dh, _ = sniff_header(payload)
                dec = decode_pixels(payload)
                if dec.shape != (h, w, 3) or not np.array_equal(dec, pal[idx]):
                    raise ValueError(f"gif roundtrip mismatch for id={i}")
                rows.append((i, fmt, dw, dh, int(dec.sum())))
            yield pd.DataFrame(
                rows, columns=[id_col, "format", "width", "height", "checksum"]
            )

    return df.select(id_col).mapInPandas(run, schema=out_schema)


def mjpeg_roundtrip_check(
    df: DataFrame, id_col: str = "doc_id", stride: int = 2
) -> DataFrame:
    """REAL video decode proof: deterministic MJPEG-AVI encode→decode
    per id, exact by construction (the JPEG constant-block trick, one
    level up: every frame is a DC-only baseline JPEG, so the whole
    container round-trips bit-exactly).

    Per id the kernel builds ``2 + id % 4`` frames of a 16x8 grayscale
    video (frame ``f``'s two 8x8 blocks carry ``(id + f*17 + bx*7) %
    256``), writes a real AVI (RIFF hdrl/strl/movi, ``00dc`` chunks),
    reads the header back, decodes every ``stride``-th frame through
    the full MJPEG path (container walk → segment parse → Huffman →
    IDCT), asserts exact pixels, and emits dims + sampled-frame
    checksum — all closed-form in plain SQL.
    """
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("codec", T.StringType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("n_frames", T.IntegerType()),
            T.StructField("sampled", T.IntegerType()),
            T.StructField("checksum", T.LongType()),
        ]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        from .jpegcodec import encode_jpeg
        from .videocodec import decode_frames, encode_avi_mjpeg, sniff_avi

        for pdf in batches:
            rows = []
            for i in pdf[id_col]:
                i = int(i)
                n = 2 + i % 4
                jpegs, pix = [], []
                for f in range(n):
                    blocks = np.array(
                        [[(i + f * 17 + bx * 7) % 256 for bx in range(2)]]
                    )
                    img = np.repeat(np.repeat(blocks, 8, 0), 8, 1).astype(
                        np.uint8
                    )
                    pix.append(img)
                    jpegs.append(encode_jpeg(img))
                avi = encode_avi_mjpeg(jpegs, 16, 8, fps=10)
                w, h, nf, _, fourcc = sniff_avi(avi)
                dec = decode_frames(avi, stride=stride)
                want = pix[::stride]
                if len(dec) != len(want) or any(
                    not np.array_equal(d[:, :, 0], p)
                    for d, p in zip(dec, want)
                ):
                    raise ValueError(f"mjpeg roundtrip mismatch for id={i}")
                rows.append(
                    (
                        i, fourcc.lower(), w, h, nf, len(dec),
                        int(sum(int(d.sum()) for d in dec)),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "codec", "width", "height", "n_frames",
                    "sampled", "checksum",
                ],
            )

    return df.select(id_col).mapInPandas(run, schema=out_schema)


def image_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id", dim: int = 8
) -> DataFrame:
    """payload -> deterministic feature vector (fake embed stage).

    Real pipelines put the vision encoder here; the stub hashes bytes
    into a unit-norm-ish vector so downstream similarity search can be
    exercised end-to-end.
    """
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )

    def run(batches):
        import pandas as pd

        def feat(b):
            if b is None:
                return None
            h = hashlib.md5(bytes(b)).digest() + hashlib.md5(b"x" + bytes(b)).digest()
            return [((h[i] / 255.0) * 2 - 1) for i in range(dim)]

        for pdf in batches:
            yield pd.DataFrame(
                {id_col: pdf[id_col], "features": [feat(b) for b in pdf[payload_col]]}
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def frame_sample(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    every_n: int = 10,
) -> DataFrame:
    """Video frame-sampling shape: one payload -> many (frame_idx, frame)
    rows.  Stub emits byte-slices as 'frames' for non-video fixture
    bytes.  REAL video decode exists for MJPEG-AVI payloads — see
    :func:`mjpeg_roundtrip_check` / ``operators.videocodec`` (container
    walk + jpegcodec per frame, no ffmpeg); inter-frame codecs
    (H.264/VP9/AV1) still require an ffmpeg swap-in here.
    Demonstrates the 1->N mapInPandas fan-out contract.
    """
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )
    if DECODE_MODE != "fake":
        raise NotImplementedError("real frame sampling requires ffmpeg")

    def run(batches):
        import pandas as pd

        ids, idxs, frames = [], [], []
        for pdf in batches:
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                if b is None:
                    continue
                bb = bytes(b)
                n_frames = max(1, len(bb) // max(every_n, 1))
                for fi in range(min(n_frames, 16)):
                    ids.append(i)
                    idxs.append(fi)
                    frames.append(bb[fi::every_n][:64])
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})
            ids, idxs, frames = [], [], []

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def audio_feature_check(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL audio DSP proof: the :func:`wav_roundtrip_check` waveform is
    re-synthesized, round-tripped through the real RIFF/WAVE codec, and
    summarized with the standard first-pass audio features a pipeline
    extracts before filtering — RMS energy, zero-crossing count, peak
    amplitude.  The closed-form sample law keeps every feature
    independently computable in plain SQL."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("rms", T.DoubleType()),
            T.StructField("zero_crossings", T.LongType()),
            T.StructField("peak", T.IntegerType()),
        ]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        from .audiocodec import decode_wav, encode_wav

        for pdf in batches:
            rows = []
            for i in pdf[id_col]:
                i = int(i)
                sr = 8000 * (1 + i % 3)
                n = 100 + i % 400
                j = np.arange(n, dtype=np.int64)
                samples = ((i * 31 + j * 7) % 4096 - 2048).astype(np.int16)
                _, dec = decode_wav(encode_wav(samples, sr))
                s = dec[:, 0].astype(np.float64)
                rms = float(np.sqrt(np.mean(s * s)))
                zc = int(np.sum(s[:-1] * s[1:] < 0))
                rows.append((i, n, round(rms, 6), zc, int(np.abs(s).max())))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "n_samples", "rms", "zero_crossings", "peak"],
            )

    return df.select(id_col).mapInPandas(run, schema=out_schema)
