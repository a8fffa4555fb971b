"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata structs.

The Spark-side machinery — schemas, magic-byte sniffing, Arrow-batched
``mapInPandas`` decode/feature pipelines, batch shaping, partition sizing —
is real and tested.  The actual media decoding is stubbed: the container has
no image/audio libraries, so ``decode_image``/``extract_audio_features``
either use PIL/soundfile when importable or fall back to a clearly-marked
deterministic fake (derived from the content hash) so downstream plumbing
can be exercised end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_META_SCHEMA",
    "sniff_mime",
    "attach_media_metadata",
    "decode_image",
    "image_features",
    "sample_video_frames",
]

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType(), True),
        T.StructField("size_bytes", T.LongType(), True),
        T.StructField("content_sha1", T.StringType(), True),
    ]
)

#: magic-byte prefixes (hex) -> mime; JVM-side sniffing, no UDF
_MAGIC = [
    ("FFD8FF", "image/jpeg"),
    ("89504E47", "image/png"),
    ("47494638", "image/gif"),
    ("52494646", "audio/wav"),  # RIFF (also webp/avi; refined below)
    ("494433", "audio/mpeg"),
    ("664C6143", "audio/flac"),
    ("1A45DFA3", "video/webm"),
    ("00000018667479", "video/mp4"),
    ("0000001C667479", "video/mp4"),
]


def sniff_mime(binary_col: str | Column) -> Column:
    """Magic-byte mime sniffing as a pure Column expression over hex()."""
    col = F.col(binary_col) if isinstance(binary_col, str) else binary_col
    head = F.upper(F.hex(F.substring(col, 1, 16)))
    out = F.lit("application/octet-stream")
    for prefix, mime in reversed(_MAGIC):
        out = F.when(head.startswith(prefix), F.lit(mime)).otherwise(out)
    return F.when(col.isNull(), F.lit(None).cast("string")).otherwise(out)


def attach_media_metadata(df: DataFrame, binary_col: str, out_col: str = "media_meta") -> DataFrame:
    """Add a typed metadata struct: mime, byte size, content sha1 — all
    JVM-side (sha1/length built-ins)."""
    col = F.col(binary_col)
    meta = F.struct(
        sniff_mime(col).alias("mime"),
        F.length(col).cast("long").alias("size_bytes"),
        F.sha1(col).alias("content_sha1"),
    )
    return df.withColumn(out_col, meta)


_DECODED_IMAGE_SCHEMA = "width int, height int, channels int, decode_ok boolean, decoder string"


def decode_image(df: DataFrame, binary_col: str, id_col: str, batch_size: int = 256) -> DataFrame:
    """Decode image dimensions via Arrow-batched ``mapInPandas``.

    Uses PIL when available; otherwise a DETERMINISTIC FAKE decoder (dims
    derived from the content hash) so the batch shape, schema, and
    partition behavior are exercised without the dependency.  The UDF
    signature, output schema, and iterator protocol are exactly what a real
    decoder plugs into."""
    out_schema = f"{id_col} long, {_DECODED_IMAGE_SCHEMA}"

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            from PIL import Image  # noqa: PLC0415
            import io  # noqa: PLC0415

            def decode(b: bytes | None):
                if b is None:
                    return (None, None, None, False, "pil")
                try:
                    img = Image.open(io.BytesIO(b))
                    return (img.width, img.height, len(img.getbands()), True, "pil")
                except Exception:  # noqa: BLE001
                    return (None, None, None, False, "pil")

        except ImportError:

            def decode(b: bytes | None):
                # STUB: deterministic fake dims from content hash
                if b is None:
                    return (None, None, None, False, "fake")
                digest = hashlib.sha1(b).digest()
                return (64 + digest[0], 64 + digest[1], 3, True, "fake")

        for pdf in batches:
            decoded = [decode(b) for b in pdf[binary_col]]
            out = pd.DataFrame(decoded, columns=["width", "height", "channels", "decode_ok", "decoder"])
            out.insert(0, id_col, pdf[id_col].values)
            yield out

    return df.select(id_col, binary_col).mapInPandas(decode_batches, out_schema)


def image_features(df: DataFrame, binary_col: str, id_col: str, dim: int = 64) -> DataFrame:
    """Feature-extraction plumbing: (id, features array<float>).  STUB
    features = normalized bytes of the iterated sha256 of the content — a
    stand-in with the exact shape/contract of a real vision-model encoder
    (swap the inner function; batching/schema stay)."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), True),
            T.StructField("features", T.ArrayType(T.FloatType()), True),
        ]
    )

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def feats(b: bytes | None):
            if b is None:
                return None
            raw = b""
            digest = b or b""
            while len(raw) < dim:
                digest = hashlib.sha256(digest).digest()
                raw += digest
            return [x / 255.0 for x in raw[:dim]]

        for pdf in batches:
            yield pd.DataFrame({id_col: pdf[id_col].values, "features": [feats(b) for b in pdf[binary_col]]})

    return df.select(id_col, binary_col).mapInPandas(featurize, out_schema)


def sample_video_frames(df: DataFrame, binary_col: str, id_col: str, every_n: int = 30) -> DataFrame:
    """Frame-sampling plumbing: explode (id, frame_index, frame binary).
    STUB: without a video decoder, emits deterministic byte slices as
    'frames' (one per every_n KiB of content) — the partition/explode/schema
    behavior downstream operators depend on is real."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), True),
            T.StructField("frame_index", T.IntegerType(), True),
            T.StructField("frame", T.BinaryType(), True),
        ]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for rid, b in zip(pdf[id_col], pdf[binary_col]):
                if b is None:
                    continue
                n_frames = max(1, len(b) // (every_n * 1024))
                for i in range(n_frames):
                    ids.append(rid)
                    idxs.append(i)
                    frames.append(bytes(b[i * every_n * 1024 : (i + 1) * every_n * 1024]))
            yield pd.DataFrame({id_col: ids, "frame_index": idxs, "frame": frames})

    return df.select(id_col, binary_col).mapInPandas(sample, out_schema)
