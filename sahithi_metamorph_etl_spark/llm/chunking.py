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


def pack_sequences(
    df: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    shuffle_seed: str = "",
    bucket_hex_chars: int = 2,
) -> DataFrame:
    """Training-order preparation: deterministically shuffle the corpus
    and pack documents into fixed token-budget sequences — (id,
    tok_offset, pack_id, n_tokens, oversize).

    Shuffle order is ``md5(seed || id)``: engine-portable, seedable,
    uniform — the standard "deterministic random" training shuffle (a
    real ``rand()`` would be irreproducible across retries/engines).
    ``pack_id = floor(tokens_before / budget)``: contiguous documents in
    shuffle order share a pack until the budget fills; a document
    straddling a boundary belongs to the pack where it starts, and
    ``oversize`` flags documents that alone exceed the budget (a real
    pipeline splits those with chunk_documents first).

    SCALE: the global running token count is NOT a single-partition
    window. The md5 key space is bucketed by its leading
    ``bucket_hex_chars`` hex chars (a data-independent, order-preserving
    split: ordering by (bucket, key) == ordering by key): one shuffle
    computes per-bucket local cumsums, the per-bucket totals (256 rows
    at the default) are prefix-summed on a frame that small and
    broadcast back. At 100 TB raise ``bucket_hex_chars`` to 3-4 for
    4096/65536-way parallelism.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    if not 1 <= bucket_hex_chars <= 8:
        raise ValueError("bucket_hex_chars must be in 1..8")
    from pyspark.sql import Window

    key = F.md5(F.concat(F.lit(shuffle_seed), F.col(id_col).cast("string")))
    # NULL text must count as empty, not poison the prefix sum:
    # size(split(trim(NULL))) is -1 in Spark, which would silently
    # corrupt every later tok_offset/pack_id
    toks = F.size(
        F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
    ).cast("bigint")
    keyed = df.select(
        F.col(id_col),
        key.alias("__k"),
        F.substring(key, 1, bucket_hex_chars).alias("__b"),
        toks.alias("n_tokens"),
    )
    local_w = Window.partitionBy("__b").orderBy("__k", id_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    local = keyed.withColumn("__cum_local", F.sum("n_tokens").over(local_w))
    totals = local.groupBy("__b").agg(F.max("__cum_local").alias("__btotal"))
    # per-bucket offsets: a window over a <= 16^bucket_hex_chars row
    # frame — bounded by construction, never corpus-sized
    off_w = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "__boffset", F.coalesce(F.sum("__btotal").over(off_w), F.lit(0).cast("bigint"))
    ).select("__b", "__boffset")
    packed = local.join(F.broadcast(offsets), "__b")
    tok_offset = F.col("__boffset") + F.col("__cum_local") - F.col("n_tokens")
    return packed.select(
        F.col(id_col),
        tok_offset.alias("tok_offset"),
        F.floor(tok_offset / F.lit(budget)).cast("bigint").alias("pack_id"),
        F.col("n_tokens"),
        (F.col("n_tokens") > budget).alias("oversize"),
    )
