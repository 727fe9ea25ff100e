"""Document chunking: split long documents into overlapping token
windows (context-window preparation for LLM training/embedding — every
corpus pipeline needs this between cleaning and tokenization).

All JVM codegen, zero shuffle: tokenize once (projection boundary so
the HOF sees an attribute, not a re-evaluated split — see
word_shingles), generate chunk starts with a stepped ``sequence``,
``posexplode`` to one row per chunk, slice+join per chunk. Output rows
are proportional to total tokens / stride — the explode fan-out is the
data itself, not an artifact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 128,
    overlap: int = 32,
) -> DataFrame:
    """(id, chunk_id, n_tokens, chunk_text): whitespace-token windows of
    ``chunk_tokens`` with ``overlap`` tokens shared between consecutive
    chunks. Starts advance by ``stride = chunk_tokens - overlap``; the
    final chunk may be shorter (never empty); a doc shorter than one
    chunk yields exactly one chunk. Empty/NULL text yields no rows.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"overlap ({overlap}) must be in [0, chunk_tokens) — an overlap >= "
            f"chunk size ({chunk_tokens}) would never advance"
        )
    stride = chunk_tokens - overlap
    words = df.select(
        F.col(id_col),
        F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+").alias("__w"),
    ).filter(F.size("__w") > 0)
    # drop the empty-string token split('') produces
    words = words.filter(~((F.size("__w") == 1) & (F.element_at("__w", 1) == "")))
    # chunk starts: 0, stride, 2*stride, ... strictly below n_tokens,
    # except that a start is only useful if it adds NEW tokens beyond
    # the previous chunk's end — i.e. start + overlap < n (the final
    # window otherwise duplicates a suffix of the previous one)
    n = F.size("__w")
    last_start = F.greatest(
        F.lit(0),
        (F.ceil((n - F.lit(overlap)) / F.lit(stride)) - 1).cast("int") * stride,
    )
    starts = F.sequence(F.lit(0), last_start, F.lit(stride))
    chunks = words.select(
        F.col(id_col),
        F.col("__w"),
        F.posexplode(starts).alias("chunk_id", "__start"),
    )
    piece = F.slice(F.col("__w"), F.col("__start") + 1, chunk_tokens)
    return chunks.select(
        F.col(id_col),
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.size(piece).cast("bigint").alias("n_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )
