"""Record linkage: blocked fuzzy join (entity resolution without
all-pairs).

Matching dirty entity names across sources is the tabular cousin of the
document near-dup problem: comparing every row against every row is
O(N×M) and dead at scale, so candidate pairs come from a cheap BLOCKING
key (join, shuffle-sized by the block distribution) and only
within-block pairs pay the edit-distance comparison — the exact
strategy the MinHash-LSH dedup path uses for documents, here with
deterministic JVM ``levenshtein`` instead of hashed shingles.

SCALE SHAPE: one equi-join on the block key; per-block pair counts are
``|left block| × |right block|``, so block design (prefix length, extra
columns like city/zip) bounds the quadratic locally. A pathologically
hot block is the same problem as a skewed join key — route through
``operators.skew.adaptive_salted_join``'s strategy if a block exceeds
executor memory; this operator keeps the naive block join because
linkage blocks are chosen small by construction.

Recall caveat (standard for prefix blocking): an edit inside the first
``block_len`` characters moves the row to another block and the pair is
missed. Production linkage runs multiple blocking passes (prefix,
suffix, phonetic) and unions candidates; compose this operator per pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def blocked_fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_distance: int = 2,
    block_len: int = 2,
    left_block_extra: list[str] = (),
    right_block_extra: list[str] = (),
    distance_col: str = "distance",
) -> DataFrame:
    """Candidate pairs whose ``levenshtein(left_col, right_col) <=
    max_distance``, discovered via equi-join on a blocking key: the
    lower-cased first ``block_len`` characters of the trimmed name plus
    any ``*_block_extra`` equality columns. Returns all left columns +
    all right columns + ``distance_col``; right-side name collisions
    must be pre-renamed by the caller (asserted)."""
    if max_distance < 0:
        raise ValueError("max_distance must be >= 0")
    if block_len < 1:
        raise ValueError("block_len must be >= 1")
    if len(left_block_extra) != len(right_block_extra):
        raise ValueError("block extras must pair up left/right")
    clash = set(left.columns) & set(right.columns)
    if clash:
        raise ValueError(f"rename right-side columns before joining: {sorted(clash)}")

    def blk(col: str) -> Column:
        return F.lower(F.substring(F.trim(F.col(col)), 1, block_len))

    lb = left.withColumn("__blk", blk(left_col))
    rb = right.withColumn("__rblk", blk(right_col))
    cond = lb["__blk"] == rb["__rblk"]
    for lc, rc in zip(left_block_extra, right_block_extra):
        cond = cond & (lb[lc] == rb[rc])
    dist = F.levenshtein(F.col(left_col), F.col(right_col))
    return (
        lb.join(rb, cond)
        .filter(dist <= max_distance)
        .withColumn(distance_col, dist.cast("int"))
        .drop("__blk", "__rblk")
    )
