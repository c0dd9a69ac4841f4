"""Multimodal column plumbing: images/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side design is real and tested — schema, partition sizing, UDF
signature, batch shape. The codec step has TWO tiers:

- ``real_decode=True`` runs a real, pure-numpy decoder with no external
  library behind it: binary PPM/PGM (``P6``/``P5``), 24-bpp uncompressed
  BMP, zlib-DEFLATEd PNG (all five scanline filters + palette/tRNS),
  baseline + progressive JPEG (``operators/jpeg.py``), GIF (LZW + interlace +
  transparency), uncompressed TIFF, PCM16 WAV audio, and MJPEG-AVI
  frame extraction (``decode_payload`` / ``decode_wav`` /
  ``parse_avi_frames``). Real parses, real inflate/entropy decode, real
  pixels — pinned by golden tests and validated against real-world
  libpng/libjpeg/GIF output and cross-format lossless pixel truth.
  Remaining codecs (WebP, JPEG2000, …) raise
  ``NotImplementedError``; swapping in Pillow extends ``decode_payload``
  and nothing else in the plan moves.
- The default path computes deterministic metadata from the raw bytes
  (length, byte-derived pseudo dimensions, sha256 prefix) so the Arrow
  plumbing can be exercised on arbitrary payloads.

Scale notes: binary payloads ride in the same parquet row group as their
metadata; ``spark.sql.files.maxPartitionBytes`` bounds task memory. The
mapInPandas stage is the only Python hop and transfers via Arrow in
``batch_size``-row chunks — at 100 TB you size batches so
``batch_size × avg_blob_size`` stays ≪ executor memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BinaryType, DoubleType, IntegerType,
                               LongType, StringType, StructField, StructType)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("media_type", StringType()),      # image | audio | video
    StructField("payload", BinaryType()),          # opaque encoded bytes
    StructField("source_uri", StringType()),
])

IMAGE_META_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("n_bytes", LongType()),
    StructField("sha256_prefix", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_channels", IntegerType()),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("feature", ArrayType(DoubleType())),
])

PIXEL_STATS_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_channels", IntegerType()),
    StructField("px_sum", LongType()),
])


def documents_as_media(docs: DataFrame, media_type: str = "image") -> DataFrame:
    """Adapter for tests/bench: treat document text bytes as opaque payloads
    so the binary plumbing can be exercised without real media files."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(media_type).alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        F.concat(F.lit("synthetic://doc/"), F.col("doc_id")).alias("source_uri"))


def documents_as_ppm(docs: DataFrame) -> DataFrame:
    """Synthesize REAL binary-PPM (P6) payloads from the documents table —
    pure Column expressions, so an external SQL engine can rebuild the
    identical bytes and the real-decode path gets an exact oracle.

    Per doc: width = 4 + doc_id % 13, height = 3 + doc_id % 7, raster =
    the 3-digit pattern ``lpad(doc_id % 1000, 3, '0')`` repeated w·h times
    (3 bytes per RGB pixel, ASCII digits, so string length == byte length
    and sha256-of-string == sha256-of-payload on any engine).
    """
    w = (F.col("doc_id") % 13 + 4).cast("int")
    h = (F.col("doc_id") % 7 + 3).cast("int")
    pat = F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0")
    payload_str = F.concat(
        F.lit("P6\n"), w.cast("string"), F.lit(" "), h.cast("string"),
        F.lit("\n255\n"), F.repeat(pat, w * h))
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.encode(payload_str, "utf-8").alias("payload"),
        F.concat(F.lit("synthetic://ppm/"), F.col("doc_id")).alias("source_uri"))


def documents_as_png(docs: DataFrame, batch_size: int = 256) -> DataFrame:
    """Synthesize REAL PNG payloads from the documents table: per doc a
    ``(3 + doc_id % 7) × (4 + doc_id % 13) × 3`` raster with
    ``pixel[y, x, c] = (doc_id + x + y + c) % 256``, encoded with filter
    type ``doc_id % 5`` — so one corpus pass exercises every PNG filter
    reconstruction path, and the analytic pixel law gives the decode an
    EXACT external oracle (a SQL engine can compute the expected pixel
    sum without any codec). Encoding runs in the Arrow ``mapInPandas``
    hop (zlib is not expressible as a Column)."""

    def gen(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 4 + did % 13, 3 + did % 7
                px = ((did + np.arange(h)[:, None, None]
                       + np.arange(w)[None, :, None]
                       + np.arange(3)[None, None, :]) % 256).astype(np.uint8)
                rows.append((did, "image", encode_png(px, filter_type=did % 5),
                             f"synthetic://png/{did}"))
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields])

    return docs.select("doc_id").mapInPandas(gen, schema=MEDIA_SCHEMA)


def decode_pixel_stats(media: DataFrame) -> DataFrame:
    """REAL decode → raster statistics: run :func:`decode_payload` on each
    payload and emit (width, height, n_channels, px_sum) — the pixel sum
    proves the full decode pipeline (inflate + filter reconstruction for
    PNG) byte-exactly, not just the header parse."""

    def stats(batches: Iterator) -> Iterator:
        import pandas as pd
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, c, px = decode_payload(bytes(payload))
                out.append((int(mid), w, h, c, int(px.sum(dtype="int64"))))
            yield pd.DataFrame(out,
                               columns=[f.name for f in PIXEL_STATS_SCHEMA.fields])

    return media.select("media_id", "payload") \
                .mapInPandas(stats, schema=PIXEL_STATS_SCHEMA)


AUDIO_STATS_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("sample_rate", IntegerType()),
    StructField("n_channels", IntegerType()),
    StructField("n_samples", LongType()),
    StructField("sum_abs", LongType()),
    StructField("peak", LongType()),
])


def decode_wav(data: bytes):
    """REAL RIFF/WAVE decoder — pure struct + numpy. PCM 16-bit
    (format 1); returns (sample_rate, n_channels, samples int16 ndarray
    of shape (n_frames, n_channels)). Compressed/float formats raise."""
    import struct as _struct

    import numpy as np

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("bad WAV signature")
    i, fmt, raw = 12, None, None
    while i + 8 <= len(data):
        cid, ln = data[i:i + 4], _struct.unpack_from("<I", data, i + 4)[0]
        body = data[i + 8:i + 8 + ln]
        if cid == b"fmt ":
            afmt, nch, rate, _br, _ba, bits = \
                _struct.unpack_from("<HHIIHH", body, 0)
            if afmt != 1 or bits != 16:
                raise NotImplementedError(
                    f"only 16-bit PCM WAV supported (format={afmt}, "
                    f"bits={bits})")
            fmt = (rate, nch)
        elif cid == b"data":
            raw = body
        i += 8 + ln + (ln & 1)                   # chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError("WAV missing fmt/data chunk")
    rate, nch = fmt
    samples = np.frombuffer(raw, "<i2")
    return rate, nch, samples.reshape(-1, nch)


def encode_wav(samples, rate: int = 16000) -> bytes:
    """Inverse of :func:`decode_wav` for fixtures/tests: int16 array
    ((n,) or (n, channels)) → PCM16 RIFF/WAVE bytes."""
    import struct as _struct

    import numpy as np

    s = np.asarray(samples, "<i2")
    if s.ndim == 1:
        s = s[:, None]
    nch = s.shape[1]
    raw = s.tobytes()
    fmt = _struct.pack("<HHIIHH", 1, nch, rate, rate * nch * 2, nch * 2, 16)
    body = (b"WAVE" + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
            + b"data" + _struct.pack("<I", len(raw)) + raw)
    return b"RIFF" + _struct.pack("<I", len(body)) + body


def documents_as_wav(docs: DataFrame) -> DataFrame:
    """Synthesize REAL PCM16 WAV payloads from the documents table:
    ``256 + doc_id % 512`` mono samples at 16 kHz following the analytic
    law ``s[i] = ((doc_id·7 + i·13) mod 65536) − 32768`` — so a SQL
    engine can compute the decoded stream's |sum| and peak with no codec
    (the audio twin of :func:`documents_as_png`'s pixel law)."""

    def gen(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                n = 256 + did % 512
                s = ((did * 7 + np.arange(n) * 13) % 65536 - 32768) \
                    .astype(np.int16)
                rows.append((did, "audio", encode_wav(s, 16000),
                             f"synthetic://wav/{did}"))
            yield pd.DataFrame(rows,
                               columns=[f.name for f in MEDIA_SCHEMA.fields])

    return docs.select("doc_id").mapInPandas(gen, schema=MEDIA_SCHEMA)


def audio_stats(media: DataFrame) -> DataFrame:
    """REAL audio decode → stream statistics: sample rate / channel /
    frame counts plus integer |sum| and peak over all samples — exact on
    any engine, proving the full RIFF parse + PCM reconstruction."""

    def stats(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rate, nch, s = decode_wav(bytes(payload))
                a = np.abs(s.astype(np.int64))
                out.append((int(mid), rate, nch, s.shape[0],
                            int(a.sum()), int(a.max()) if a.size else 0))
            yield pd.DataFrame(out,
                               columns=[f.name for f in AUDIO_STATS_SCHEMA.fields])

    return media.select("media_id", "payload") \
                .mapInPandas(stats, schema=AUDIO_STATS_SCHEMA)


VIDEO_FRAME_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("n_frames", IntegerType()),
    StructField("frame_idx", IntegerType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_channels", IntegerType()),
    StructField("px_sum", LongType()),
])


def parse_avi_frames(data: bytes) -> list[bytes]:
    """REAL video-container parse: walk a RIFF/AVI file's ``movi`` LIST
    and return the compressed video frame payloads (``..dc``/``..db``
    stream chunks, e.g. MJPEG frames ready for :func:`decode_payload`).
    Pure struct walk — headers (``hdrl``), index (``idx1``) and audio
    chunks are skipped; word alignment honoured."""
    import struct as _struct

    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("bad AVI signature")
    frames: list[bytes] = []

    def walk(start: int, end: int) -> None:
        i = start
        while i + 8 <= end:
            cid = data[i:i + 4]
            ln = _struct.unpack_from("<I", data, i + 4)[0]
            if cid == b"LIST":
                if data[i + 8:i + 12] in (b"movi", b"rec "):
                    walk(i + 12, i + 8 + ln)
            elif cid[2:4] in (b"dc", b"db") and ln:
                frames.append(data[i + 8:i + 8 + ln])
            i += 8 + ln + (ln & 1)

    walk(12, len(data))
    return frames


def encode_avi_mjpeg(frames: list[bytes]) -> bytes:
    """Inverse for fixtures/tests: JPEG frame payloads → minimal
    MJPEG-AVI (one video stream, ``movi`` list of ``00dc`` chunks)."""
    import struct as _struct

    movi = b"movi"
    for f in frames:
        movi += b"00dc" + _struct.pack("<I", len(f)) + f
        if len(f) & 1:
            movi += b"\x00"
    body = b"AVI " + b"LIST" + _struct.pack("<I", len(movi)) + movi
    return b"RIFF" + _struct.pack("<I", len(body)) + body


def video_frame_stats(media: DataFrame, every_n: int = 1) -> DataFrame:
    """REAL video decode: extract each payload's frames from the AVI
    container, decode every ``every_n``-th frame with
    :func:`decode_payload` (MJPEG → the baseline-JPEG decoder), and emit
    per-frame raster stats — the frame-sampling stage of a multimodal
    training pipeline with an actual codec behind it."""

    def stats(batches: Iterator) -> Iterator:
        import pandas as pd
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                frames = parse_avi_frames(bytes(payload))
                for k in range(0, len(frames), every_n):
                    w, h, c, px = decode_payload(frames[k])
                    out.append((int(mid), len(frames), k, w, h, c,
                                int(px.sum(dtype="int64"))))
            yield pd.DataFrame(out,
                               columns=[f.name for f in VIDEO_FRAME_SCHEMA.fields])

    return media.select("media_id", "payload") \
                .mapInPandas(stats, schema=VIDEO_FRAME_SCHEMA)


def _stub_dims(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake decode: dimensions derived from leading bytes."""
    b0 = payload[0] if payload else 0
    b1 = payload[1] if len(payload) > 1 else 0
    return 16 + (b0 % 240), 16 + (b1 % 240), 3


def _decode_ppm(data: bytes):
    """Binary PPM (``P6``, RGB) / PGM (``P5``, gray) decoder — pure numpy.

    Netpbm header grammar: magic, whitespace/comment-separated width,
    height, maxval, ONE whitespace byte, then the raster. maxval ≤ 255 →
    one byte per sample; 256..65535 → two-byte big-endian samples,
    rescaled to 8-bit (half-up 255·v/maxval).
    Returns (width, height, n_channels, H×W×C uint8).
    """
    import numpy as np

    magic = data[:2]
    channels = 3 if magic == b"P6" else 1
    i, vals = 2, []
    while len(vals) < 3:
        while i < len(data) and data[i:i + 1].isspace():
            i += 1
        if data[i:i + 1] == b"#":                   # comment to end of line
            while i < len(data) and data[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(data) and not data[j:j + 1].isspace():
            j += 1
        vals.append(int(data[i:j]))
        i = j
    i += 1                                          # single ws after maxval
    w, h, maxval = vals
    if maxval > 65535 or maxval < 1:
        raise ValueError(f"bad Netpbm maxval {maxval}")
    if maxval > 255:
        # two-byte big-endian samples (Netpbm "plain raster format",
        # maxval 256..65535); rescaled to 8-bit with HALF-UP rounding
        # (255·v/maxval — for maxval 65535 this equals the high byte)
        n = w * h * channels
        if len(data) - i < 2 * n:
            raise ValueError(f"PPM raster truncated: need {2 * n} bytes, "
                             f"have {len(data) - i}")
        wide = np.frombuffer(data, dtype=">u2", count=n, offset=i) \
                 .reshape(h, w, channels)
        px = np.floor(wide.astype(np.float64) * 255.0 / maxval + 0.5) \
               .astype(np.uint8)
        return w, h, channels, px
    n = w * h * channels
    if len(data) - i < n:
        raise ValueError(f"PPM raster truncated: need {n} bytes, "
                         f"have {len(data) - i}")
    px = np.frombuffer(data, dtype=np.uint8, count=n, offset=i) \
           .reshape(h, w, channels)
    return w, h, channels, px


def _decode_bmp(data: bytes):
    """Uncompressed BMP decoder — pure numpy: 24-bpp BI_RGB (BGR order,
    4-byte row padding) and 32-bpp BI_RGB / BI_BITFIELDS (per-channel
    masks read from the header, byte-aligned masks supported — the shape
    every real-world 32-bpp BMP uses). Handles bottom-up and top-down
    storage. Returns (width, height, 3 or 4, H×W×C uint8)."""
    import struct

    import numpy as np

    off = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMPs not supported")
    w, h_signed = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    comp = struct.unpack_from("<I", data, 30)[0]
    h = abs(h_signed)
    if bpp == 24 and comp == 0:
        row_bytes = (w * 3 + 3) & ~3
        raster = np.frombuffer(data, np.uint8, count=row_bytes * h,
                               offset=off) \
                   .reshape(h, row_bytes)[:, :w * 3] \
                   .reshape(h, w, 3)[..., ::-1]
        if h_signed > 0:                            # bottom-up storage
            raster = raster[::-1]
        return w, h, 3, np.ascontiguousarray(raster)
    if bpp == 32 and comp in (0, 3):
        if comp == 3:                               # masks follow the header
            masks = struct.unpack_from("<III", data, 54)
            if hdr_size >= 56:
                amask = struct.unpack_from("<I", data, 66)[0]
            else:
                amask = 0
        else:                                       # BI_RGB default layout
            masks, amask = (0x00FF0000, 0x0000FF00, 0x000000FF), 0xFF000000
        if not all(masks):
            # a zero color mask is malformed (and (0 & -0).bit_length()-1
            # would feed numpy a negative shift) — fail explicitly
            raise NotImplementedError("zero BI_BITFIELDS color mask")
        words = np.frombuffer(data, "<u4", count=w * h, offset=off) \
                  .reshape(h, w)

        def chan(mask):
            shift = (mask & -mask).bit_length() - 1
            return ((words >> shift) & 0xFF).astype(np.uint8)

        if any(m and (m >> ((m & -m).bit_length() - 1)) != 0xFF
               for m in (*masks, amask)):
            raise NotImplementedError("non-8-bit BMP channel masks")
        planes = [chan(m) for m in masks]
        ch = 3
        if amask:
            planes.append(chan(amask))
            ch = 4
        raster = np.stack(planes, axis=2)
        if h_signed > 0:
            raster = raster[::-1]
        return w, h, ch, np.ascontiguousarray(raster)
    raise NotImplementedError(
        f"only uncompressed 24/32-bpp BMP supported (bpp={bpp}, "
        f"compression={comp})")


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type → bytes per pixel in the scanline stream (8-bit depth);
# type 3 (palette) carries 1 index byte and expands through PLTE after
# filter reconstruction
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# Adam7 pass grid: (x offset, y offset, x stride, y stride) per pass
_ADAM7_PASSES = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
                 (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _png_unfilter(raw, h: int, w: int, ch: int):
    """Reconstruct ``h`` scanlines of ``w``×``ch`` bytes from a filtered
    PNG raster segment (RFC 2083 §6 — None/Sub/Up/Average/Paeth).
    Shared by the sequential and per-Adam7-pass paths."""
    import numpy as np

    stride = w * ch
    rows = np.asarray(raw, np.uint8).reshape(h, stride + 1)
    out = np.zeros((h, stride), np.int16)
    for y in range(h):
        f, line = rows[y, 0], rows[y, 1:].astype(np.int16)
        prior = out[y - 1] if y else np.zeros(stride, np.int16)
        if f == 0:
            rec = line
        elif f == 2:                                      # Up
            rec = (line + prior) & 0xFF
        elif f in (1, 3, 4):                              # Sub/Average/Paeth
            rec = line
            for x in range(stride):
                a = rec[x - ch] if x >= ch else 0         # reconstructed left
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (int(a) + int(prior[x])) >> 1
                else:
                    b, c = int(prior[x]), \
                        int(prior[x - ch]) if (x >= ch and y) else 0
                    p = int(a) + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc
                                                              else c)
                rec[x] = (rec[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = rec
    return out.astype(np.uint8)


def _decode_png(data: bytes):
    """REAL PNG decoder — stdlib ``zlib`` + numpy, no image library.

    Full pipeline: chunk walk (IHDR/PLTE/tRNS/IDAT/IEND), zlib-inflate
    of the concatenated IDAT stream, per-scanline reconstruction of all
    five PNG filter types (None/Sub/Up/Average/Paeth, RFC 2083 §6), and
    Adam7 de-interlacing (seven independently-filtered passes scattered
    back onto the grid). Supports 8-bit gray / gray+alpha / RGB / RGBA /
    palette (tRNS → RGBA) and 16-bit non-palette rasters (stripped to
    the high byte, libpng-style); 16-bit palette is not a legal PNG
    shape and raises. Up is vectorized; Sub/Average/Paeth recurse on the
    reconstructed left neighbour, so they walk the scanline (fine for
    the corpus-thumbnail sizes this engine decodes in-pipeline; a C
    codec slots in behind the same dispatcher).
    Returns (width, height, n_channels, H×W×C uint8).
    """
    import struct
    import zlib

    import numpy as np

    if data[:8] != _PNG_SIG:
        raise ValueError("bad PNG signature")
    i, idat, dims, color = 8, [], None, None
    plte, trns, interlace = None, None, 0
    while i + 8 <= len(data):
        ln, typ = struct.unpack_from(">I4s", data, i)
        chunk = data[i + 8:i + 8 + ln]
        if typ == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", chunk)
            if depth not in (8, 16) or (depth == 16 and color == 3):
                raise NotImplementedError(
                    f"PNG bit depth {depth} / color type {color} "
                    "(8-bit all types, 16-bit non-palette only)")
            if color not in _PNG_CHANNELS:
                raise NotImplementedError(f"PNG color type {color}")
            dims = (w, h, _PNG_CHANNELS[color])
        elif typ == b"PLTE":
            plte = np.frombuffer(chunk, np.uint8).reshape(-1, 3)
        elif typ == b"tRNS" and color == 3:
            trns = np.frombuffer(chunk, np.uint8)
        elif typ == b"IDAT":
            idat.append(chunk)
        elif typ == b"IEND":
            break
        i += 12 + ln
    if dims is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    if color == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE")
    w, h, ch = dims
    # PNG filters operate on BYTES at any depth; the predictor distance
    # is bytes-per-pixel, so the 16-bit path reuses the same unfilter
    # with bypp = 2·ch, then keeps the big-endian HIGH byte (libpng's
    # 16→8 strip)
    bypp = ch * (depth // 8)

    def to8(arr, hh, ww):
        if depth == 8:
            return arr.reshape(hh, ww, ch)
        return arr.reshape(hh, ww, ch, 2)[..., 0].copy()

    raw = zlib.decompress(b"".join(idat))
    if interlace == 0:
        if len(raw) != (w * bypp + 1) * h:
            raise ValueError("PNG raster size mismatch")
        px = to8(_png_unfilter(np.frombuffer(raw, np.uint8), h, w, bypp),
                 h, w)
    else:
        # Adam7: seven independently-filtered sub-images, consumed
        # sequentially from ONE inflated stream, scattered onto the grid
        px = np.zeros((h, w, ch), np.uint8)
        pos = 0
        for x0, y0, dx, dy in _ADAM7_PASSES:
            pw = -(-(w - x0) // dx) if w > x0 else 0
            ph = -(-(h - y0) // dy) if h > y0 else 0
            if pw == 0 or ph == 0:
                continue
            n = (pw * bypp + 1) * ph
            sub = to8(_png_unfilter(
                np.frombuffer(raw, np.uint8, count=n, offset=pos),
                ph, pw, bypp), ph, pw)
            px[y0::dy, x0::dx] = sub
            pos += n
        if pos != len(raw):
            raise ValueError("PNG raster size mismatch")
    if color == 3:
        idx = px[:, :, 0]
        if trns is not None:
            # expand sparse tRNS to a full per-entry alpha vector
            alpha = np.full(len(plte), 255, np.uint8)
            alpha[:len(trns)] = trns
            px = np.dstack([plte[idx], alpha[idx]])
            return w, h, 4, px
        px = plte[idx]
        return w, h, 3, px
    return w, h, ch, px


def _png_filter_rows(px, filter_type: int) -> bytes:
    """Filter one (sub-)image's scanlines for :func:`encode_png` —
    vectorized (predictors read the ORIGINAL neighbours)."""
    import numpy as np

    h, w, ch = px.shape
    flat = px.reshape(h, w * ch).astype(np.int16)
    left = np.zeros_like(flat)
    left[:, ch:] = flat[:, :-ch]
    up = np.zeros_like(flat)
    up[1:] = flat[:-1]
    ul = np.zeros_like(flat)
    ul[1:, ch:] = flat[:-1, :-ch]
    if filter_type == 0:
        filt = flat
    elif filter_type == 1:
        filt = flat - left
    elif filter_type == 2:
        filt = flat - up
    elif filter_type == 3:
        filt = flat - ((left + up) >> 1)
    elif filter_type == 4:
        p = left + up - ul
        pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
        pred = np.where((pa <= pb) & (pa <= pc), left,
                        np.where(pb <= pc, up, ul))
        filt = flat - pred
    else:
        raise ValueError(f"bad filter type {filter_type}")
    return np.concatenate(
        [np.full((h, 1), filter_type, np.uint8),
         (filt & 0xFF).astype(np.uint8)], axis=1).tobytes()


def encode_png(px, filter_type: int = 0, interlace: bool = False) -> bytes:
    """Inverse of :func:`_decode_png` for fixtures/tests: uint8 array
    (H×W gray or H×W×C) → PNG bytes, every scanline filtered with
    ``filter_type`` (0-4 — lets tests exercise each reconstruction
    path); ``interlace=True`` emits the seven Adam7 passes (each
    filtered independently, per spec)."""
    import struct
    import zlib

    import numpy as np

    px = np.asarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    if interlace:
        scan = b"".join(
            _png_filter_rows(np.ascontiguousarray(px[y0::dy, x0::dx]),
                             filter_type)
            for x0, y0, dx, dy in _ADAM7_PASSES
            if px[y0::dy, x0::dx].shape[0] and px[y0::dy, x0::dx].shape[1])
    else:
        scan = _png_filter_rows(px, filter_type)

    def chunk(typ: bytes, body: bytes) -> bytes:
        return struct.pack(">I", len(body)) + typ + body + \
            struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, int(interlace))
    return _PNG_SIG + chunk(b"IHDR", ihdr) + \
        chunk(b"IDAT", zlib.compress(scan)) + chunk(b"IEND", b"")


def _decode_tiff(data: bytes):
    """Baseline TIFF decoder — pure struct + numpy: both byte orders,
    first IFD, UNCOMPRESSED (compression=1) 8-bit gray/RGB/RGBA strips.
    LZW/PackBits/JPEG-in-TIFF raise explicitly."""
    import struct as _struct

    import numpy as np

    bo = {b"II": "<", b"MM": ">"}.get(data[:2])
    if bo is None or _struct.unpack_from(bo + "H", data, 2)[0] != 42:
        raise ValueError("bad TIFF signature")
    off = _struct.unpack_from(bo + "I", data, 4)[0]
    n = _struct.unpack_from(bo + "H", data, off)[0]
    tags = {}
    for k in range(n):
        tag, typ, cnt, raw = _struct.unpack_from(bo + "HHI4s", data,
                                                 off + 2 + 12 * k)
        size = {1: 1, 3: 2, 4: 4}.get(typ)
        if size is None:
            continue
        if size * cnt <= 4:
            buf, voff = raw, 0
        else:
            voff = _struct.unpack(bo + "I", raw)[0]
            buf = data
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        tags[tag] = list(_struct.unpack_from(bo + fmt * cnt, buf, voff))
    w, h = tags[256][0], tags[257][0]
    comp = tags.get(259, [1])[0]
    if comp != 1:
        raise NotImplementedError(f"TIFF compression {comp} (1/none only)")
    spp = tags.get(277, [1])[0]
    if any(b != 8 for b in tags.get(258, [8])):
        raise NotImplementedError("non-8-bit TIFF samples")
    if tags.get(284, [1])[0] != 1:
        # planar (RRR..GGG..BBB) strips would silently interleave wrong
        raise NotImplementedError("planar TIFF (PlanarConfiguration=2)")
    photo = tags.get(262, [1 if spp <= 2 else 2])[0]
    if photo not in (1, 2):
        # 0 = WhiteIsZero would decode inverted; palette/CMYK/YCbCr need
        # expansion this baseline decoder doesn't do
        raise NotImplementedError(f"TIFF photometric interpretation {photo}")
    raster = b"".join(
        data[o:o + c] for o, c in zip(tags[273], tags[279]))
    px = np.frombuffer(raster, np.uint8, count=w * h * spp) \
           .reshape(h, w, spp)
    return w, h, spp, px


def _gif_lzw(mcs: int, stream: bytes) -> bytearray:
    """GIF-flavour LZW decode: LSB-first codes, width mcs+1..12 bits,
    clear/end codes, standard KwKwK handling."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    out = bytearray()
    table: list[bytes] = []
    width = mcs + 1
    prev = None
    acc = nbits = pos = 0

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = mcs + 1
        prev = None

    reset()
    while True:
        while nbits < width:
            if pos >= len(stream):
                return out                      # truncated — emit decoded
            acc |= stream[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            reset()
            continue
        if code == end:
            return out
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):                # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt GIF LZW stream")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1


def _decode_gif(data: bytes):
    """GIF87a/89a decoder (first frame) — pure stdlib + numpy: global and
    local color tables, LZW raster decode, 4-pass interlace, transparency
    from the graphic-control extension (→ RGBA)."""
    import struct as _struct

    import numpy as np

    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("bad GIF signature")
    sw, sh, flags, _bg, _ar = _struct.unpack_from("<HHBBB", data, 6)
    i = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(data, np.uint8, 3 * n, i).reshape(n, 3)
        i += 3 * n
    transparent = None
    while i < len(data):
        b = data[i]
        if b == 0x21:                                   # extension
            label = data[i + 1]
            i += 2
            if label == 0xF9 and data[i] >= 4:          # graphic control
                if data[i + 1] & 1:
                    transparent = data[i + 4]
            while data[i]:                              # skip sub-blocks
                i += 1 + data[i]
            i += 1
        elif b == 0x2C:                                 # image descriptor
            _l, _t, w, h, iflags = _struct.unpack_from("<HHHHB", data, i + 1)
            i += 10
            pal = gct
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                pal = np.frombuffer(data, np.uint8, 3 * n, i).reshape(n, 3)
                i += 3 * n
            if pal is None:
                raise ValueError("GIF image without a color table")
            mcs = data[i]
            i += 1
            stream = bytearray()
            while data[i]:
                ln = data[i]
                stream += data[i + 1:i + 1 + ln]
                i += 1 + ln
            i += 1
            idx = np.frombuffer(bytes(_gif_lzw(mcs, bytes(stream))),
                                np.uint8, w * h).reshape(h, w)
            if iflags & 0x40:                           # 4-pass interlace
                rows = ([*range(0, h, 8)] + [*range(4, h, 8)]
                        + [*range(2, h, 4)] + [*range(1, h, 2)])
                de = np.empty_like(idx)
                de[rows] = idx
                idx = de
            rgb = pal[idx]
            if transparent is not None:
                alpha = np.where(idx == transparent, 0, 255) \
                          .astype(np.uint8)[:, :, None]
                return w, h, 4, np.concatenate([rgb, alpha], axis=2)
            return w, h, 3, rgb
        elif b == 0x3B:                                 # trailer
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
    raise ValueError("GIF contains no image data")


def decode_payload(data: bytes):
    """Decode an image payload to (width, height, n_channels, H×W×C uint8
    ndarray). Dispatches on magic bytes: binary PPM/PGM (``P6``/``P5``),
    24-bpp uncompressed BMP (``BM``), REAL zlib-inflated PNG
    (``\\x89PNG``, all five scanline filters), and REAL baseline JPEG
    (``\\xff\\xd8`` — Huffman entropy decode, IDCT, 4:2:0 fancy
    upsampling; ``operators/jpeg.py``) — all pure numpy + stdlib.
    Remaining codecs (WebP, progressive JPEG, …) raise
    ``NotImplementedError`` (no image library in this container —
    installing Pillow extends this dispatcher and nothing else changes).
    """
    if data[:2] in (b"P6", b"P5"):
        return _decode_ppm(data)
    if data[:2] == b"BM":
        return _decode_bmp(data)
    if data[:8] == _PNG_SIG:
        return _decode_png(data)
    if data[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg
        return decode_jpeg(data)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return _decode_gif(data)
    if data[:2] in (b"II", b"MM") and len(data) > 4:
        return _decode_tiff(data)
    raise NotImplementedError(
        f"unsupported codec (magic {data[:2]!r}): PPM/PGM/BMP/PNG/"
        "JPEG/GIF/TIFF decode without an external image "
        "library; WebP/JPEG2000 need Pillow")


def encode_ppm(px) -> bytes:
    """Inverse of :func:`_decode_ppm` for fixtures/tests: H×W×3 (P6) or
    H×W (P5) uint8 array → binary Netpbm bytes."""
    import numpy as np

    px = np.asarray(px, dtype=np.uint8)
    h, w = px.shape[:2]
    magic = b"P6" if px.ndim == 3 else b"P5"
    return magic + f"\n{w} {h}\n255\n".encode() + px.tobytes()


def decode_image_meta(media: DataFrame, batch_size: int = 256,
                      real_decode: bool = False) -> DataFrame:
    """Extract image metadata via Arrow-batched mapInPandas.

    ``real_decode=True`` runs :func:`decode_payload` — a REAL header parse
    for uncompressed PPM/PGM/BMP (width/height/channels from the file, not
    from byte heuristics); compressed codecs raise ``NotImplementedError``.
    The default stub path computes deterministic byte-derived metadata so
    arbitrary payloads exercise the same Arrow plumbing.
    """

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                if real_decode:
                    w, h, c, _ = decode_payload(data)
                else:
                    w, h, c = _stub_dims(data)
                out.append((int(mid), len(data),
                            hashlib.sha256(data).hexdigest()[:16], w, h, c))
            yield pd.DataFrame(out, columns=[f.name for f in IMAGE_META_SCHEMA.fields])

    conf_df = media.select("media_id", "payload")
    return conf_df.mapInPandas(extract, schema=IMAGE_META_SCHEMA)


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Byte-histogram feature vector via mapInPandas (stand-in for a real
    embedding model; the Arrow batch path is identical). L1-normalized
    ``dim``-bucket histogram of byte values."""

    def featurize(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = np.frombuffer(bytes(payload or b""), dtype=np.uint8)
                if data.size == 0:
                    hist = np.zeros(dim)
                else:
                    hist = np.bincount(data // (256 // dim), minlength=dim)[:dim]
                    hist = hist / hist.sum()
                rows.append((int(mid), [round(float(v), 6) for v in hist]))
            yield pd.DataFrame(rows, columns=["media_id", "feature"])

    return media.select("media_id", "payload").mapInPandas(featurize, FEATURE_SCHEMA)


def resize_images(media: DataFrame, target_w: int = 8, target_h: int = 8,
                  real_decode: bool = False) -> DataFrame:
    """Resize plumbing via mapInPandas: payload → (media_id, width, height,
    pixels array). ``real_decode=True`` really decodes (uncompressed
    PPM/PGM/BMP via :func:`decode_payload`), nearest-neighbour-resamples
    the raster to the target grid, and emits per-pixel luminance
    ``(sum of channels) // n_channels`` — integer arithmetic, so the
    goldens are bit-stable. The stub path produces a deterministic
    stride-sampled byte grid with the exact same schema/batching."""
    from pyspark.sql.types import ArrayType

    out_schema = StructType([
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("pixels", ArrayType(IntegerType())),
    ])
    n_px = target_w * target_h

    def resize(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                if real_decode:
                    w, h, c, raster = decode_payload(data)
                    ri = (np.arange(target_h) * h) // target_h
                    ci = (np.arange(target_w) * w) // target_w
                    sampled = raster[ri][:, ci].astype(np.int64)
                    px = [int(v) for v in
                          (sampled.sum(axis=2) // c).reshape(-1)]
                elif not data:
                    px = [0] * n_px
                else:
                    stride = max(len(data) // n_px, 1)
                    px = [data[min(i * stride, len(data) - 1)] for i in range(n_px)]
                rows.append((int(mid), target_w, target_h, px))
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return media.select("media_id", "payload").mapInPandas(resize, out_schema)


def sample_frames(media: DataFrame, every_n_bytes: int = 64,
                  max_frames: int = 16) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emit every Nth byte
    offset as a 'frame' marker (real codec would emit decoded frames).
    Pure Column expression — the explode shape matches a real frame table."""
    return media.select(
        "media_id",
        F.posexplode(F.slice(
            F.sequence(F.lit(0), F.greatest(
                (F.length("payload") / every_n_bytes).cast("int") - 1, F.lit(0))),
            1, max_frames)).alias("frame_index", "chunk_index")
    ).select("media_id", "frame_index",
             (F.col("chunk_index") * every_n_bytes).alias("byte_offset"))
