"""Multimodal column operators: opaque binary payloads + typed metadata.

Media (image/audio/video) rides through the engine as ``binary`` columns with
a ``struct`` of typed metadata — the storage pattern that scales: parquet
keeps the bytes columnar/compressed, Spark never interprets them until an
explicit decode/feature step, and that step is an Arrow-batched
``mapInPandas`` so bytes cross the JVM↔Python boundary once per batch, not
per row.

The container ships no media codecs, so the actual decoders are STUBBED:
``decode_image`` raises ``NotImplementedError`` unless given
``fake=True``, in which case a clearly-marked deterministic fake (derived
from the payload's md5) stands in. Everything around the stub — schemas,
batch iteration, partitioning, UDF signatures — is the real plumbing and is
tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
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


def extract_image_features(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches).

    Real decoders are unavailable in this container; pass ``fake=True`` to
    use the deterministic stand-in. The mapInPandas shape (batch iterator in,
    batch iterator out, explicit output schema) is production-real.
    """
    if not fake:
        raise NotImplementedError(
            "no media codecs in this environment — call with fake=True for the "
            "deterministic test double, or plug a real decoder here"
        )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # DETERMINISTIC FAKE decode (no codec in container): dimensions/luma
        # derived from the payload digest. Replace with PIL/ffmpeg in a real
        # deployment. Defined inside the closure so cloudpickle ships it by
        # value — workers need no import of this package.
        def _fake_decode(payload: bytes) -> tuple[int, int, int, float]:
            d = hashlib.md5(payload or b"").digest()
            return 64 + d[0] % 192, 64 + d[1] % 192, 1 + d[2] % 3, d[3] / 255.0

        for pdf in batches:
            feats = [_fake_decode(p) for p in pdf["payload"]]
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

    No codecs in this container: ``fake=True`` substitutes a deterministic
    stand-in whose output size scales with the target area (payload bytes
    repeated/truncated to width×height — clearly marked, replace the inner
    function with a real decoder+resampler in deployment)."""
    if not fake:
        raise NotImplementedError(
            "no media codecs in this environment — call with fake=True for the "
            "deterministic test double, or plug a real resizer here"
        )
    target = int(width) * int(height)

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # DETERMINISTIC FAKE resample: bytes tiled/truncated to the target
        # area, so output size is exactly width*height regardless of input.
        def _fake_resize(payload: bytes) -> bytes:
            src = payload or b"\x00"
            reps = -(-target // len(src))
            return (src * reps)[:target]

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": [_fake_resize(p) for p in pdf["payload"]],
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
