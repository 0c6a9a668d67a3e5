"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (engine extension; BASELINE.json north star).

Real here: the Spark-side plumbing — schema (schemas.MEDIA), Arrow-
batched mapInPandas pipelines, partition sizing, batch shapes, magic-
byte sniffing, deterministic feature extraction. Stubbed here: actual
codec work (decode/resize/frame-sample) — the image/audio libraries are
not in this container, so codecs raise NotImplementedError unless the
deterministic fake is requested (tests use the fake; swapping in a real
codec is a one-function change).

Scale notes: binary payloads ride the normal Parquet path (page-
compressed, column-pruned when untouched). mapInPandas streams Arrow
record batches — set spark.sql.execution.arrow.maxRecordsPerBatch so
batch_bytes ≈ rows × avg_payload stays inside executor memory. Feature
extraction is a pure map: no shuffle at any scale.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MAGIC = {
    b"\x89PNG": "image/png",
    b"\xff\xd8\xff": "image/jpeg",
    b"RIFF": "audio/wav",
    b"ID3": "audio/mpeg",
    b"\x00\x00\x00\x18ftyp": "video/mp4",
    b"\x00\x00\x00\x20ftyp": "video/mp4",
}


def sniff_mime(payload: bytes | None) -> str:
    if not payload:
        return "application/octet-stream"
    for magic, mime in MAGIC.items():
        if payload.startswith(magic):
            return mime
    return "application/octet-stream"


def synthesize_media(documents: DataFrame, kind: str = "image") -> DataFrame:
    """Deterministic fake media table derived from `documents` (the
    container ships no binary fixtures): payload = PNG magic + md5-
    stream bytes of the text; realistic enough to exercise the full
    plumbing. Pure Column ops until the binary concat."""
    payload = F.concat(
        F.lit(bytearray(b"\x89PNG\r\n\x1a\n")),
        F.unhex(F.md5(F.col("text"))),
        F.unhex(F.md5(F.reverse(F.col("text")))),
    )
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        payload.alias("payload"),
        F.lit("image/png").alias("mime"),
        F.create_map(F.lit("source"), F.col("source")).alias("meta"),
    )


MEDIA_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("sniffed_mime", StringType()),
        StructField("digest", StringType()),
    ]
)


def extract_features(media: DataFrame, batch_size: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads
    (mapInPandas): size, magic-byte mime, content digest. The UDF
    receives pandas batches — the canonical shape for plugging in a
    real decoder (PIL/librosa/ffmpeg) later."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                    "sniffed_mime": pdf["payload"].map(
                        lambda b: sniff_mime(bytes(b) if b is not None else None)
                    ),
                    "digest": pdf["payload"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest() if b is not None else None
                    ),
                }
            )
            yield out

    spark = media.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size))
    return media.mapInPandas(featurize, MEDIA_FEATURES_SCHEMA)


DECODED_IMAGE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("pixels", BinaryType()),
    ]
)


def decode_images(media: DataFrame, use_fake: bool = False) -> DataFrame:
    """Decode image payloads to (w, h, c, raw pixels).

    STUB: real decoding needs an image library not present in this
    container. ``use_fake=True`` produces a deterministic fake decode
    (dimensions derived from the digest, pixels = repeated payload) so
    the downstream plumbing — schema, batching, partitioning — is fully
    exercised; otherwise NotImplementedError per batch.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not use_fake:
                raise NotImplementedError(
                    "image decode requires PIL/opencv — not available in this "
                    "container; pass use_fake=True for the deterministic stub"
                )
            digests = pdf["payload"].map(lambda b: hashlib.md5(bytes(b)).digest())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": digests.map(lambda d: 16 + d[0] % 64),
                    "height": digests.map(lambda d: 16 + d[1] % 64),
                    "channels": 3,
                    "pixels": pdf["payload"].map(lambda b: bytes(b) * 2),
                }
            )

    return media.mapInPandas(run, DECODED_IMAGE_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 10, use_fake: bool = False) -> DataFrame:
    """Video frame sampling stub (one row per sampled frame). Fake mode
    emits ceil(n_bytes / 32 / every_n) frames per video with
    deterministic frame ids — exercising the one-to-many mapInPandas
    shape a real ffmpeg sampler would have."""
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_no", IntegerType()),
            StructField("frame", BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not use_fake:
                raise NotImplementedError(
                    "frame sampling requires ffmpeg — not available; use use_fake=True"
                )
            rows = []
            for _, r in pdf.iterrows():
                payload = bytes(r["payload"])
                n_frames = max(1, len(payload) // 32 // every_n)
                for i in range(n_frames):
                    rows.append(
                        {
                            "media_id": r["media_id"],
                            "frame_no": i * every_n,
                            "frame": payload[i * 32 : (i + 1) * 32],
                        }
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_no", "frame"])

    return media.mapInPandas(run, schema)


def resize_images(
    decoded: DataFrame, out_w: int = 32, out_h: int = 32, use_fake: bool = False
) -> DataFrame:
    """Resize decoded images to (out_w, out_h).

    STUB like ``decode_images``: a real resize needs PIL/opencv. Fake
    mode nearest-neighbor-samples the fake pixel buffer down to
    out_w*out_h*channels bytes deterministically, preserving the real
    operator's contract (schema, one-row-per-image, bounded output
    size) so partitioning/batching behavior is identical to production.
    Input is ``decode_images`` output (media_id, width, height,
    channels, pixels).
    """
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("channels", IntegerType()),
            StructField("pixels", BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not use_fake:
                raise NotImplementedError(
                    "image resize requires PIL/opencv — not available in this "
                    "container; pass use_fake=True for the deterministic stub"
                )
            out_px = []
            for _, r in pdf.iterrows():
                src = bytes(r["pixels"])
                n = out_w * out_h * int(r["channels"])
                # nearest-neighbor byte sampling: index i -> floor(i*len/n)
                out_px.append(
                    bytes(src[(i * len(src)) // n] for i in range(n)) if src else b""
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": out_w,
                    "height": out_h,
                    "channels": pdf["channels"],
                    "pixels": out_px,
                }
            )

    return decoded.mapInPandas(run, schema)
