"""Embedding-column analytics: per-group centroids.

Mean embedding per group (language, source, near-dup cluster) is the
building block for corpus drift monitoring, IVF coarse quantizers, and
cluster labeling. Distributed shape: ``posexplode`` the vector (one row
per dimension — |rows| x dim, the data itself), aggregate per
(group, dim) in ONE shuffle with decimal sums (float summation order
is partition-dependent; decimal makes the result bit-deterministic and
cross-engine checkable), then reassemble the array form with a sorted
collect over the tiny (|groups| x dim) frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.money import dround


def group_centroids_long(
    emb: DataFrame,
    group_col: str,
    vec_col: str = "embedding",
    decimals: int = 8,
) -> DataFrame:
    """(group, dim, mean_value, n_vectors) — one row per dimension.
    Deterministic: per-dim decimal(38,12) sums, rounded to ``decimals``
    after the divide, so shuffle order cannot flip a bit."""
    exploded = emb.select(
        F.col(group_col), F.posexplode(F.col(vec_col)).alias("dim", "__v")
    )
    # the davg sequence from functions.money: exact decimal sum → double
    # → divide → dround, so both engines execute the same IEEE ops
    return (
        exploded.groupBy(group_col, "dim")
        .agg(
            F.sum(F.col("__v").cast("double").cast("decimal(38,12)")).alias("__s"),
            F.count(F.lit(1)).alias("n_vectors"),
        )
        .select(
            F.col(group_col),
            F.col("dim").cast("int").alias("dim"),
            dround(F.col("__s").cast("double") / F.col("n_vectors"), decimals).alias("mean_value"),
            F.col("n_vectors").cast("bigint").alias("n_vectors"),
        )
    )


def group_centroids(
    emb: DataFrame,
    group_col: str,
    vec_col: str = "embedding",
    decimals: int = 8,
) -> DataFrame:
    """(group, n_vectors, centroid array<double>) — the shape the
    similarity operators consume (e.g. as an IVF coarse quantizer)."""
    long = group_centroids_long(emb, group_col, vec_col, decimals)
    return (
        long.groupBy(group_col)
        .agg(
            F.max("n_vectors").alias("n_vectors"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "mean_value"))),
                lambda s: s.mean_value,
            ).alias("centroid"),
        )
    )
