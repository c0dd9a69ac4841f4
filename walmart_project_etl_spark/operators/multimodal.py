"""Multimodal column plumbing: images/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side design is real and tested — schema, partition sizing, UDF
signature, batch shape. The actual codec step is STUBBED: this container
has no image/audio libraries, so ``decode_image_meta(..., real_decode=True)``
raises ``NotImplementedError`` and the default path computes deterministic
metadata from the raw bytes (length, byte-derived pseudo dimensions, sha256
prefix). Swapping the stub for Pillow/torchaudio is a one-function change;
nothing else in the plan moves.

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


def _stub_dims(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake decode: dimensions derived from leading bytes."""
    b0 = payload[0] if payload else 0
    b1 = payload[1] if len(payload) > 1 else 0
    return 16 + (b0 % 240), 16 + (b1 % 240), 3


def decode_image_meta(media: DataFrame, batch_size: int = 256,
                      real_decode: bool = False) -> DataFrame:
    """Extract image metadata via Arrow-batched mapInPandas.

    ``real_decode=True`` is the integration point for an actual codec
    (PIL.Image.open over ``io.BytesIO``); unavailable here → explicit
    NotImplementedError rather than a silent fake.
    """
    if real_decode:
        raise NotImplementedError(
            "real image decode needs an image codec (e.g. Pillow) which is "
            "not installed in this environment; default stub path computes "
            "deterministic byte-derived metadata instead")

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
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
    pixels array). The real path (decode + interpolate, e.g. PIL
    ``Image.resize``) raises NotImplementedError in this container; the
    stub produces a deterministic stride-sampled byte grid with the exact
    schema/batching a real resizer would emit."""
    if real_decode:
        raise NotImplementedError(
            "real image resize needs a codec (e.g. Pillow); stub path "
            "stride-samples payload bytes into the target grid")

    from pyspark.sql.types import ArrayType

    out_schema = StructType([
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("pixels", ArrayType(IntegerType())),
    ])
    n_px = target_w * target_h

    def resize(batches: Iterator) -> Iterator:
        import pandas as pd
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                if not data:
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
