"""Multimodal column operators: opaque binary payloads + typed metadata.

Media (image/audio/video) rides through the engine as ``binary`` columns with
a ``struct`` of typed metadata — the storage pattern that scales: parquet
keeps the bytes columnar/compressed, Spark never interprets them until an
explicit decode/feature step, and that step is an Arrow-batched
``mapInPandas`` so bytes cross the JVM↔Python boundary once per batch, not
per row.

Three tiers of "real" here:

* REAL, codec-free, JVM-side: magic-byte MIME sniffing
  (:func:`detect_media_type`) and PNG/GIF header dimension parsing
  (:func:`image_dimensions`) — pure binary/hex expressions, tested against
  byte-exact format headers.
* REAL, stdlib-codec, Python-side (capability probe 2026-08-14: PIL/
  imageio/opencv all absent in this container, but PNG and WAV need only
  zlib/wave — :mod:`.codecs`): pixel decode, luma features, nearest-
  neighbor resize + re-encode for PNG payloads, and PCM sample decode for
  WAV — all inside the same Arrow-batched ``mapInPandas`` stages.
* STUBBED: formats whose decoders genuinely need an external codec
  (JPEG/WEBP/video) raise ``NotImplementedError`` from the decode stage
  unless given ``fake=True``, in which case a clearly-marked deterministic
  fake (derived from the payload's md5) stands in for ALL payloads.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("source", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("checksum", T.StringType()),
                ]
            ),
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)


def attach_payload_meta(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """Derive the typed metadata struct from a raw binary column (JVM-side:
    octet_length/md5 are built-ins; no Python touches the bytes)."""
    p = F.col(payload_col)
    return df.withColumn(
        "meta",
        F.struct(
            F.coalesce(F.col("mime"), F.lit("application/octet-stream")).alias("mime")
            if "mime" in df.columns
            else F.lit("application/octet-stream").alias("mime"),
            (F.col("source") if "source" in df.columns else F.lit("unknown")).alias(
                "source"
            ),
            F.octet_length(p).cast("long").alias("n_bytes"),
            F.md5(p).alias("checksum"),
        ),
    )


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: the driver's documents table as a media-shaped frame (text
    bytes stand in for an encoded payload)."""
    base = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
        F.col("source"),
    )
    return attach_payload_meta(base).select("media_id", "payload", "meta")


def detect_media_type(payload_col: str = "payload") -> Column:
    """Container-format sniffing from magic bytes — REAL, not stubbed:
    pure JVM expressions (binary substring + hex compare), whole-stage
    codegen'd, no Python and no codec needed. This is how a 100 TB media
    lake routes payloads to per-format decode stages without trusting a
    user-supplied mime column.

    Recognizes PNG, JPEG, GIF, WEBP, WAV, and falls back to
    'application/octet-stream'.
    """
    p = F.col(payload_col)
    head = lambda pos, n: F.hex(F.substring(p, pos, n))  # noqa: E731
    return (
        F.when(head(1, 8) == "89504E470D0A1A0A", F.lit("image/png"))
        .when(head(1, 3) == "FFD8FF", F.lit("image/jpeg"))
        .when(head(1, 6).isin("474946383761", "474946383961"), F.lit("image/gif"))
        .when(
            (head(1, 4) == "52494646") & (head(9, 4) == "57454250"),
            F.lit("image/webp"),
        )
        .when(
            (head(1, 4) == "52494646") & (head(9, 4) == "57415645"),
            F.lit("audio/wav"),
        )
        .otherwise(F.lit("application/octet-stream"))
    )


def image_dimensions(payload_col: str = "payload") -> Column:
    """(width, height) struct parsed straight from the header bytes —
    REAL for PNG (big-endian u32 at IHDR offsets 17/21) and GIF
    (little-endian u16 at offsets 7/9); NULLs for other formats (JPEG
    dimensions live in a variable-offset SOF segment — that needs the
    decode stage). All JVM-side: binary substring → hex → base-16 conv.
    """
    p = F.col(payload_col)
    be32 = lambda pos: F.conv(F.hex(F.substring(p, pos, 4)), 16, 10).cast(  # noqa: E731
        "int"
    )
    le16 = lambda pos: F.conv(  # noqa: E731
        F.concat(F.hex(F.substring(p, pos + 1, 1)), F.hex(F.substring(p, pos, 1))),
        16,
        10,
    ).cast("int")
    mime = detect_media_type(payload_col)
    return (
        F.when(
            mime == "image/png",
            F.struct(be32(17).alias("width"), be32(21).alias("height")),
        )
        .when(
            mime == "image/gif",
            F.struct(le16(7).alias("width"), le16(9).alias("height")),
        )
        .otherwise(
            F.struct(
                F.lit(None).cast("int").alias("width"),
                F.lit(None).cast("int").alias("height"),
            )
        )
    )


def extract_image_features(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches).

    The real path decodes PNG payloads with the stdlib codec
    (:mod:`.codecs` — zlib inflate + filter reversal) and emits true
    (width, height, channels, Rec.601 mean luma). Payloads in formats with
    no shipped decoder (JPEG/WEBP/…) raise ``NotImplementedError`` from the
    worker, naming the format — pass ``fake=True`` for the deterministic
    md5-derived stand-in (applied to every payload, as before).
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from procurement_data_pipeline_spark.llm_ops.codecs import (
            GIF_MAGICS,
            PNG_MAGIC,
            decode_gif,
            decode_png,
            luma,
        )

        def _real_decode(payload: bytes) -> tuple[int, int, int, float]:
            raw = bytes(payload or b"")
            if raw.startswith(PNG_MAGIC):
                img = decode_png(raw)
                return img.shape[1], img.shape[0], img.shape[2], luma(img)
            if raw[:6] in GIF_MAGICS:
                img = decode_gif(raw)  # first frame, palette-resolved RGB
                return img.shape[1], img.shape[0], img.shape[2], luma(img)
            raise NotImplementedError(
                f"no shipped decoder for payload starting {raw[:8]!r} — PNG "
                f"and GIF decode for real; use fake=True for other formats"
            )

        # DETERMINISTIC FAKE decode: dimensions/luma derived from the
        # payload digest — the stand-in for codec-requiring formats.
        def _fake_decode(payload: bytes) -> tuple[int, int, int, float]:
            d = hashlib.md5(payload or b"").digest()
            return 64 + d[0] % 192, 64 + d[1] % 192, 1 + d[2] % 3, d[3] / 255.0

        decode = _fake_decode if fake else _real_decode
        for pdf in batches:
            feats = [decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "n_channels": [f[2] for f in feats],
                    "mean_luma": [f[3] for f in feats],
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        decode_batches, IMAGE_FEATURES_SCHEMA
    )


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def extract_audio_features(media: DataFrame) -> DataFrame:
    """REAL audio decode for WAV payloads (stdlib ``wave`` — PCM frames →
    rate/channels/duration/RMS amplitude), same Arrow-batched mapInPandas
    shape as the image stage. Non-WAV payloads raise from the worker (no
    fake tier: WAV is the only audio container in detect_media_type)."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from procurement_data_pipeline_spark.llm_ops.codecs import decode_wav

        for pdf in batches:
            # NULL payloads coerce to b"" so wave raises its named
            # "does not start with RIFF id" error, not a bytes(None)
            # TypeError (payload is nullable in MEDIA_SCHEMA).
            feats = [decode_wav(bytes(p or b"")) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sample_rate": [f["sample_rate"] for f in feats],
                    "n_channels": [f["n_channels"] for f in feats],
                    "duration_s": [f["duration_s"] for f in feats],
                    "rms": [f["rms"] for f in feats],
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        decode_batches, AUDIO_FEATURES_SCHEMA
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def resize_images(
    media: DataFrame, width: int, height: int, fake: bool = False
) -> DataFrame:
    """Resize plumbing via mapInPandas: payload in, resized payload +
    dimensions out — the batch-transform shape a PIL/opencv-backed resize
    uses (bytes cross the Arrow boundary once per batch).

    The real path decodes PNG payloads, nearest-neighbor resamples, and
    re-encodes a valid PNG of the target size (all stdlib — :mod:`.codecs`);
    other formats raise from the worker. ``fake=True`` substitutes the
    deterministic stand-in for every payload (bytes tiled/truncated to
    width×height — clearly marked)."""
    target = int(width) * int(height)

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from procurement_data_pipeline_spark.llm_ops.codecs import (
            PNG_MAGIC,
            decode_png,
            encode_png,
            resize_nearest,
        )

        def _real_resize(payload: bytes) -> bytes:
            if payload and bytes(payload).startswith(PNG_MAGIC):
                img = decode_png(bytes(payload))
                return encode_png(resize_nearest(img, int(width), int(height)))
            head = bytes(payload or b"")[:8]
            raise NotImplementedError(
                f"no shipped resampler for payload starting {head!r} — PNG "
                f"resizes for real; use fake=True for other formats"
            )

        # DETERMINISTIC FAKE resample: bytes tiled/truncated to the target
        # area, so output size is exactly width*height regardless of input.
        def _fake_resize(payload: bytes) -> bytes:
            src = payload or b"\x00"
            reps = -(-target // len(src))
            return (src * reps)[:target]

        resize = _fake_resize if fake else _real_resize
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": [resize(p) for p in pdf["payload"]],
                    "width": width,
                    "height": height,
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        resize_batches, RESIZED_SCHEMA
    )


def sample_frames(
    media: DataFrame, every_n_bytes: int = 1024, max_frames: int = 8
) -> DataFrame:
    """Frame-sampling plumbing: slice the payload at fixed strides into a
    frames array (binary slices stay JVM-side via substring on binary).

    Stand-in for video frame extraction: the partitioning/output shape
    (media_id, frame_idx, frame_bytes) matches what a real ffmpeg-backed
    mapInPandas would emit."""
    idx = F.sequence(
        F.lit(0),
        F.least(
            F.floor(F.octet_length("payload") / every_n_bytes).cast("int"),
            F.lit(max_frames - 1),
        ),
    )
    return media.select(
        "media_id",
        F.posexplode(
            F.transform(
                idx,
                lambda i: F.substring(
                    F.col("payload"), i * every_n_bytes + 1, every_n_bytes
                ),
            )
        ).alias("frame_idx", "frame_bytes"),
    )
