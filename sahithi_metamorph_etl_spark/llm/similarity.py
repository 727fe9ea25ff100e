"""Embedding similarity search.

- ``cosine_topk_bruteforce``: exact top-k for a bounded query set —
  O(|queries| x |corpus|), the correctness baseline. All arithmetic in
  double with a deterministic left-to-right fold (``F.aggregate``), so
  results are bit-comparable to an external oracle.
- ``hyperplane_lsh_topk``: the scale path — random-hyperplane LSH
  (sign-bit bucketing) so each query only scores its bucket. Planes are
  seeded deterministically; recall/bucket-size trade-off via n_planes.

At 100 TB the corpus side stays partitioned; the bounded query set is
broadcast. Neither operator needs a UDF — dot products are higher-order
array expressions (JVM codegen).
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.money import dround
from ..operators.windows import top_k_per_group


def _dot(a: Column, b: Column) -> Column:
    # double-precision left-to-right fold; deterministic given the arrays
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_topk_bruteforce(
    embeddings: DataFrame,
    k: int = 5,
    query_filter: Column | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_scale: int = 8,
) -> DataFrame:
    """Exact cosine top-k: (vec_id, rank, neighbor_id, cos_sim).

    ``cos_sim`` is rounded (default 8dp) before ranking with a
    neighbor-id tie-break, so ordering is reproducible across engines.
    """
    q = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("qv"))
    if query_filter is not None:
        q = q.filter(query_filter)
    c = embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    pairs = F.broadcast(q).crossJoin(c).filter(F.col("vec_id") != F.col("neighbor_id"))
    cos = _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv")))
    scored = pairs.select("vec_id", "neighbor_id", dround(cos, round_scale).alias("cos_sim"))
    return top_k_per_group(
        scored,
        partition_by=["vec_id"],
        order_by=[F.col("cos_sim").desc(), F.col("neighbor_id").asc()],
        k=k,
        rank_col="rank",
        keep_rank=True,
    ).select("vec_id", F.col("rank").cast("int").alias("rank"), "neighbor_id", "cos_sim")


def _planes(n_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.uniform(-1.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def hyperplane_lsh_topk(
    embeddings: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    query_filter: Column | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k: bucket by sign bits against seeded
    random hyperplanes, then exact scoring within the bucket only.
    2^n_planes buckets => corpus scanned per query shrinks ~2^-n_planes
    (at some recall cost; multi-probe = lower n_planes here)."""
    planes = _planes(n_planes, dim)
    plane_arr = F.array(*[F.array(*[F.lit(v) for v in row]) for row in planes])
    sig = F.concat_ws(
        "",
        F.transform(plane_arr, lambda p: F.when(_dot(F.col(vec_col), p) >= 0, "1").otherwise("0")),
    )
    bucketed = embeddings.select(
        F.col(id_col), F.col(vec_col), sig.alias("bucket")
    )
    q = bucketed.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("qv"), "bucket")
    if query_filter is not None:
        q = q.filter(query_filter)
    c = bucketed.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), "bucket")
    pairs = q.join(c, "bucket").filter(F.col("vec_id") != F.col("neighbor_id"))
    cos = _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv")))
    scored = pairs.select("vec_id", "neighbor_id", dround(cos, 8).alias("cos_sim"))
    return top_k_per_group(
        scored,
        partition_by=["vec_id"],
        order_by=[F.col("cos_sim").desc(), F.col("neighbor_id").asc()],
        k=k,
        rank_col="rank",
        keep_rank=True,
    ).select("vec_id", F.col("rank").cast("int").alias("rank"), "neighbor_id", "cos_sim")
