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
