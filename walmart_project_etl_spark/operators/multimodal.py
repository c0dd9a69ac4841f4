"""Multimodal column plumbing: images/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side design is real and tested — schema, partition sizing, UDF
signature, batch shape. The codec step has TWO tiers:

- ``real_decode=True`` runs a real, pure-numpy decoder for the
  uncompressed formats that need no external library: binary PPM/PGM
  (``P6``/``P5``) and 24-bpp uncompressed BMP (``decode_payload``).
  Real header parse, real raster, real pixels — pinned by golden tests.
  Compressed codecs (JPEG/PNG/…) raise ``NotImplementedError`` because
  this container has no image libraries; swapping in Pillow extends
  ``decode_payload`` and nothing else in the plan moves.
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


def _stub_dims(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake decode: dimensions derived from leading bytes."""
    b0 = payload[0] if payload else 0
    b1 = payload[1] if len(payload) > 1 else 0
    return 16 + (b0 % 240), 16 + (b1 % 240), 3


def _decode_ppm(data: bytes):
    """Binary PPM (``P6``, RGB) / PGM (``P5``, gray) decoder — pure numpy.

    Netpbm header grammar: magic, whitespace/comment-separated width,
    height, maxval, ONE whitespace byte, then the raster. 8-bit only
    (maxval ≤ 255). Returns (width, height, n_channels, H×W×C uint8).
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
    if maxval > 255:
        raise NotImplementedError("16-bit Netpbm rasters not supported")
    n = w * h * channels
    if len(data) - i < n:
        raise ValueError(f"PPM raster truncated: need {n} bytes, "
                         f"have {len(data) - i}")
    px = np.frombuffer(data, dtype=np.uint8, count=n, offset=i) \
           .reshape(h, w, channels)
    return w, h, channels, px


def _decode_bmp(data: bytes):
    """24-bpp uncompressed (BI_RGB) BMP decoder — pure numpy. Handles
    bottom-up (positive height) and top-down rows, 4-byte row padding,
    BGR→RGB. Returns (width, height, 3, H×W×3 uint8)."""
    import struct

    import numpy as np

    off = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMPs not supported")
    w, h_signed = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    comp = struct.unpack_from("<I", data, 30)[0]
    if comp != 0 or bpp != 24:
        raise NotImplementedError(
            f"only uncompressed 24-bpp BMP supported (bpp={bpp}, "
            f"compression={comp})")
    h = abs(h_signed)
    row_bytes = (w * 3 + 3) & ~3
    raster = np.frombuffer(data, np.uint8, count=row_bytes * h, offset=off) \
               .reshape(h, row_bytes)[:, :w * 3].reshape(h, w, 3)[..., ::-1]
    if h_signed > 0:                                # bottom-up storage
        raster = raster[::-1]
    return w, h, 3, np.ascontiguousarray(raster)


def decode_payload(data: bytes):
    """Decode an uncompressed image payload to (width, height, n_channels,
    H×W×C uint8 ndarray). Dispatches on magic bytes: binary PPM/PGM
    (``P6``/``P5``) and 24-bpp uncompressed BMP (``BM``) decode with pure
    numpy; compressed codecs raise ``NotImplementedError`` (this container
    has no image library — installing Pillow extends this dispatcher and
    nothing else changes)."""
    if data[:2] in (b"P6", b"P5"):
        return _decode_ppm(data)
    if data[:2] == b"BM":
        return _decode_bmp(data)
    raise NotImplementedError(
        f"unsupported codec (magic {data[:2]!r}): only uncompressed "
        "PPM/PGM/BMP decode without an external image library")


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
