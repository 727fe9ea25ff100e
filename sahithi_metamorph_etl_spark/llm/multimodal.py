"""Multimodal column plumbing.

Media (image/audio/video) travels as an opaque ``binary`` payload
column plus typed metadata; decode / feature-extraction runs as an
Arrow-batched ``mapInPandas`` stage so heavy per-item work scales with
partitions, never through the driver.

The actual codec is STUBBED (no image/audio libraries in this
container): ``decode_media_stats`` ships a deterministic fake decoder
deriving pseudo width/height/duration from the payload bytes. The
Spark-side plumbing — schema, binary encoding, Arrow batch iteration,
partition-parallel execution — is real and tested; swap ``_fake_decode``
for a PIL/ffmpeg call to make it a production decoder.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = "media_id bigint, payload binary, media_type string, source string"


def to_media_column(
    df: DataFrame, payload_col: str, id_col: str, media_type: str = "image/fake", source_col: str | None = None
) -> DataFrame:
    """Pack an arbitrary column as an opaque binary media payload with
    typed metadata — the ingestion shape for multimodal data."""
    return df.select(
        F.col(id_col).cast("bigint").alias("media_id"),
        F.encode(F.col(payload_col).cast("string"), "UTF-8").alias("payload"),
        F.lit(media_type).alias("media_type"),
        (F.col(source_col) if source_col else F.lit("inline")).alias("source"),
    )


def decode_media_stats(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched decode stage: (media_id, n_bytes, width, height).

    ``mapInPandas`` keeps the decode embarrassingly parallel and
    streaming per partition — no collect, no driver involvement.

    The closure is self-contained (no module-level references) so it
    pickles by value and runs on workers that don't have this package
    on their PYTHONPATH.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def _fake_decode(payload: bytes) -> tuple[int, int, int]:
            # STUB decoder: deterministic pseudo-dimensions from byte
            # length. Replace with a real codec (PIL.Image.open etc.).
            n = len(payload)
            return n, n % 640 + 16, (n * 7) % 480 + 16

        for pdf in batches:
            stats = pdf["payload"].map(_fake_decode)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": stats.map(lambda t: t[0]),
                    "width": stats.map(lambda t: t[1]),
                    "height": stats.map(lambda t: t[2]),
                }
            )

    return media.mapInPandas(decode, schema="media_id bigint, n_bytes bigint, width bigint, height bigint")


def sample_frames(
    media: DataFrame,
    frame_bytes: int = 256,
    max_frames: int = 8,
) -> DataFrame:
    """Frame sampling for video-ish payloads: up to ``max_frames``
    evenly-spaced byte windows per media item —
    (media_id, frame_idx, frame_offset, frame_len, frame_payload).

    Pure JVM plan (sequence + posexplode + binary substring): the
    fan-out and slicing need no Python at all; a real video pipeline
    replaces the byte windows with an ffmpeg keyframe decode inside a
    mapInPandas stage downstream (see decode_media_stats for the
    pattern). Offsets are deterministic arithmetic on payload size, so
    the sampling plan itself is oracle-checkable.
    """
    if frame_bytes <= 0 or max_frames <= 0:
        raise ValueError("frame_bytes and max_frames must be positive")
    n = F.length("payload").cast("bigint")  # bytes, not chars, for binary
    n_frames = F.least(
        F.lit(max_frames).cast("bigint"),
        F.greatest(F.lit(1).cast("bigint"), F.ceil(n / F.lit(frame_bytes)).cast("bigint")),
    )
    stride = (n / n_frames).cast("bigint")  # floor: n_frames*stride <= n
    frames = media.select(
        "media_id",
        F.col("payload"),
        n.alias("__n"),
        stride.alias("__stride"),
        F.posexplode(F.sequence(F.lit(0).cast("bigint"), n_frames - 1)).alias("frame_idx", "__i"),
    )
    offset = F.col("__i") * F.col("__stride")
    flen = F.least(F.lit(frame_bytes).cast("bigint"), F.col("__n") - offset)
    return frames.select(
        "media_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        offset.alias("frame_offset"),
        flen.alias("frame_len"),
        F.expr(f"substring(payload, __i * __stride + 1, {frame_bytes})").alias("frame_payload"),
    )


def resize_media(media: DataFrame, max_bytes: int = 1024) -> DataFrame:
    """Resize/downscale stage (stub codec): payloads above ``max_bytes``
    are truncated, metadata records original + resized sizes —
    (media_id, payload, media_type, source, orig_bytes, resized).

    A real pipeline swaps the byte truncation for PIL ``Image.resize``
    / ffmpeg scale inside a mapInPandas stage; the stub keeps the
    operator pure-JVM (binary substring — no Python) so the
    size-bounding semantics are oracle-checkable: downstream batch
    memory is capped at |rows| x max_bytes, which is the production
    point of a resize stage."""
    if max_bytes <= 0:
        raise ValueError("max_bytes must be positive")
    n = F.length("payload").cast("bigint")
    return media.select(
        "media_id",
        F.expr(f"substring(payload, 1, {max_bytes})").alias("payload"),
        "media_type",
        "source",
        n.alias("orig_bytes"),
        (n > max_bytes).alias("resized"),
    )


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction: (media_id, features array<bigint>)
    — a folded byte histogram (byte value mod ``dim``, counted), the
    deterministic STUB standing in for a real embedding model. The
    plumbing is the production shape: vectorized numpy over Arrow
    batches, one output row per item, features as a fixed-width array
    column ready for the similarity operators. Self-contained closure."""
    if dim <= 0:
        raise ValueError("dim must be positive")

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for payload in pdf["payload"]:
                b = np.frombuffer(payload or b"", dtype=np.uint8)
                out.append(np.bincount(b % dim, minlength=dim).astype("int64").tolist())
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": out})

    return media.mapInPandas(feats, schema="media_id bigint, features array<bigint>")
