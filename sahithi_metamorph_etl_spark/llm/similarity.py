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
    # clamped so zero vectors score 0, not NaN (0/eps = 0)
    return F.greatest(F.sqrt(_dot(a, a)), F.lit(1e-12))


def _dround_once(c: Column, scale: int = 8) -> Column:
    """``dround`` with its argument evaluated ONCE: binds ``c`` as a
    transform lambda variable. dround's sign() and abs() branches
    otherwise inline the child twice, and higher-order functions are
    CodegenFallback where per-expression CSE does not apply — for a
    fold-heavy child (``_dot``/``_norm``) that doubles the row cost.
    Same IEEE op sequence, bit-identical values."""
    rf = float(10**scale)
    return F.element_at(
        F.transform(
            F.array(c),
            lambda x: F.signum(x) * F.floor(F.abs(x) * F.lit(rf) + F.lit(0.5)) / F.lit(rf),
        ),
        1,
    )


def _nround(t, scale: int = 8):
    """numpy twin of functions.money.dround (half-away-from-zero via
    sign/abs/floor — bit-identical in any engine evaluating the same
    double). Every ANN ordering key — cos_sim, ADC, and since r10 the
    IVF assignment/probe argmax, PQ encode argmin and LSH sign bit —
    rounds through this before compare, so oracle determinism never
    rides on bit-identical unrounded accumulation (BLAS vs DuckDB
    list_dot_product can differ by an ulp on near-ties)."""
    import numpy as np

    f = float(10**scale)
    return np.sign(t) * np.floor(np.abs(t) * f + 0.5) / f


def _local_sidecar_path(path: str) -> str:
    """Enforce the index-path sidecar contract (ADVICE_r21): the
    pyarrow sidecar fast path does driver-local POSIX I/O, while the
    data files (codes/lists) in the SAME ``index_path`` go through
    Spark's Hadoop FS layer. On a non-local ``index_path`` (hdfs://,
    s3a://, ...) the index would silently split across storage
    systems — fail fast with the contract instead. ``file:`` URIs are
    accepted and stripped to their POSIX path so both layers resolve
    to the same files."""
    import re

    m = re.match(r"^([a-zA-Z][a-zA-Z0-9+.-]*)://(.*)$", path)
    if m is None:
        return path
    if m.group(1) == "file":
        return "/" + m.group(2).lstrip("/")
    raise ValueError(
        f"index sidecars use driver-local pyarrow I/O, but index_path "
        f"{path!r} has scheme {m.group(1)!r}: build the index on a "
        "driver-local path (or mount), then publish it to the remote "
        "filesystem as a unit — a remote index_path would silently "
        "write sidecars locally while the codes go to the remote FS"
    )


def _sidecar_write(path: str, columns: dict, schema) -> None:
    """Write a TINY index sidecar (centroids / minmax / codebooks —
    metadata-sized, driver-resident by construction) as one parquet
    file directly with pyarrow, replacing the former
    ``createDataFrame(...).repartition(1).write.parquet`` round-trip
    (r21: one Spark job + commit protocol per sidecar was pure
    overhead at any scale — these tables are k x dim doubles the
    driver already holds). Same overwrite semantics as the Spark
    writer (the directory is replaced); the file is plain parquet,
    readable by ``spark.read.parquet`` or any engine. Driver-local
    paths only (:func:`_local_sidecar_path`)."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    path = _local_sidecar_path(path)
    shutil.rmtree(path, ignore_errors=True)
    import os

    os.makedirs(path, exist_ok=True)
    table = pa.table(columns, schema=schema)
    pq.write_table(table, f"{path}/part-00000.parquet")


def _sidecar_rows(path: str) -> list[dict]:
    """Read a sidecar directory back as a list of dict rows via
    pyarrow — the driver-side twin of ``spark.read.parquet(...).
    collect()`` for metadata-sized tables (no Spark job). Reads every
    ``*.parquet`` part file, so sidecars written by either the pyarrow
    or the Spark writer load identically. Driver-local paths only
    (:func:`_local_sidecar_path`)."""
    import glob as _glob

    import pyarrow.parquet as pq

    parts = sorted(_glob.glob(f"{_local_sidecar_path(path)}/*.parquet"))
    if not parts:
        raise FileNotFoundError(f"no parquet sidecar files under {path!r}")
    rows: list[dict] = []
    for p in parts:
        rows.extend(pq.read_table(p).to_pylist())
    return rows


def _bounded_query_rows(
    embeddings, id_col, vec_col, query_filter, max_queries, op_name,
    extra_cols=(),
):
    """Collect the query set with an explicit bound — an unbounded
    ``collect()`` of the whole corpus is a driver OOM at scale, so it is
    a usage error, not a silent default."""
    q = embeddings.select(
        F.col(id_col), F.col(vec_col), *[F.col(c) for c in extra_cols]
    )
    if query_filter is not None:
        q = q.filter(query_filter)
    elif max_queries is None:
        raise ValueError(
            f"{op_name}: pass query_filter to bound the query set, or set "
            "max_queries explicitly — collecting the full corpus as queries "
            "is O(N x N) and a driver OOM at scale"
        )
    if max_queries is not None:
        rows = q.limit(max_queries + 1).collect()
        if len(rows) > max_queries:
            raise ValueError(
                f"{op_name}: query set exceeds max_queries={max_queries}; "
                "tighten query_filter or raise the cap deliberately"
            )
        return rows
    return q.collect()



def _topk_scorer(q_ids, qm, k, rf, exclude_self=True, q_labels=None):
    """Shared ``mapInPandas`` scorer for the bounded-query BLAS top-k
    scan (:func:`cosine_topk_bruteforce` / :func:`hard_negative_topk`):
    per-partition heaps of the best (cos, neighbor) per query, each
    Arrow batch scored by one matmul, candidates rounded half-away
    BEFORE compare. With ``q_labels`` the corpus frame must also carry
    the neighbor label as ``nl``: same-label columns are masked out
    vectorized (hard negatives — the self row masks for free) and the
    label rides through the heap into the output. The returned closure
    is self-contained (pickles by value; no package refs)."""

    def score_partition(batches):
        import heapq

        import numpy as np
        import pandas as pd

        heaps = {int(qid): [] for qid in q_ids}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cm = np.array(list(pdf["cv"]), dtype=np.float64)
            cm = cm / np.maximum(np.linalg.norm(cm, axis=1, keepdims=True), 1e-12)
            t = qm @ cm.T
            # half-AWAY-from-zero (functions.money.dround twin): np.round
            # is half-to-even and can disagree with the oracle on .5 ties
            sims = np.sign(t) * np.floor(np.abs(t) * rf + 0.5) / rf
            nids = pdf["neighbor_id"].to_numpy()
            nlabels = pdf["nl"].to_numpy() if q_labels is not None else None
            for qi, qid in enumerate(q_ids):
                heap = heaps[int(qid)]
                s = sims[qi]
                # vectorized prefilter: only items that can beat (or tie)
                # the worst kept candidate — and, under a label mask,
                # carry a DIFFERENT label — enter the Python loop
                if q_labels is not None:
                    elig = nlabels != q_labels[qi]
                    if len(heap) >= k:
                        elig &= s >= heap[0][0]
                    idxs = np.nonzero(elig)[0]
                elif len(heap) >= k:
                    idxs = np.nonzero(s >= heap[0][0])[0]
                else:
                    idxs = range(len(nids))
                for ci in idxs:
                    nid = int(nids[ci])
                    if exclude_self and nid == qid:
                        continue
                    # min-heap keyed (cos asc, neighbor desc): root is the
                    # WORST kept candidate under (cos desc, neighbor asc);
                    # nid is unique so a trailing label never compares
                    item = (
                        (float(s[ci]), -nid)
                        if nlabels is None
                        else (float(s[ci]), -nid, int(nlabels[ci]))
                    )
                    if len(heap) < k:
                        heapq.heappush(heap, item)
                    elif item > heap[0]:
                        heapq.heapreplace(heap, item)
        if q_labels is None:
            out = [
                (int(qid), -it[1], it[0])
                for qid, heap in heaps.items()
                for it in heap
            ]
            yield pd.DataFrame(
                out, columns=["vec_id", "neighbor_id", "cos_sim"]
            ).astype(
                {"vec_id": "int64", "neighbor_id": "int64", "cos_sim": "float64"}
            )
        else:
            out = [
                (int(qid), -it[1], it[2], it[0])
                for qid, heap in heaps.items()
                for it in heap
            ]
            yield pd.DataFrame(
                out, columns=["vec_id", "neighbor_id", "neighbor_label", "cos_sim"]
            ).astype(
                {"vec_id": "int64", "neighbor_id": "int64",
                 "neighbor_label": "int32", "cos_sim": "float64"}
            )

    return score_partition


def cosine_topk_bruteforce(
    embeddings: DataFrame,
    k: int = 5,
    query_filter: Column | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_scale: int = 8,
    max_queries: int | None = None,
    queries: DataFrame | None = None,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k: (vec_id, rank, neighbor_id, cos_sim).

    ``queries`` turns this into a cross-frame KNN JOIN: the (bounded)
    query set comes from another frame carrying the same ``id_col`` /
    ``vec_col`` names (alias first) with NUMERIC ids — e.g. per-label
    centroids asking "which corpus vectors sit nearest each class
    center". Pass ``exclude_self=False`` there: the id namespaces
    differ, so dropping a corpus row that merely shares a query's id
    number would be wrong.

    Scale design: the (bounded) query set is collected once and shipped
    to executors as a unit-normalized float64 matrix inside the scoring
    closure; the corpus NEVER leaves its partitions — each partition
    streams Arrow batches through one BLAS matmul (``Q @ C.T``) and
    reduces to a per-partition top-k heap, so the shuffle carries only
    ``partitions x |queries| x k`` candidate rows into the final global
    window. Brute force stays exact at any corpus size; only the query
    set must fit on the driver (it must be small for O(Q x N) to make
    sense at all).

    ``cos_sim`` is rounded (default 8dp) BEFORE ranking with a
    neighbor-id tie-break, so ordering is reproducible across engines.
    """
    import numpy as np

    qrows = _bounded_query_rows(
        queries if queries is not None else embeddings,
        id_col, vec_col, query_filter, max_queries, "cosine_topk_bruteforce",
    )
    if not qrows:
        schema = "vec_id bigint, rank int, neighbor_id bigint, cos_sim double"
        return embeddings.sparkSession.createDataFrame([], schema)
    q_ids = np.array([r[0] for r in qrows], dtype=np.int64)
    qm = np.array([r[1] for r in qrows], dtype=np.float64)
    qm = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-12)

    rf = float(10**round_scale)
    corpus = embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))

    candidates = corpus.mapInPandas(
        _topk_scorer(q_ids, qm, k, rf, exclude_self=exclude_self),
        schema="vec_id bigint, neighbor_id bigint, cos_sim double",
    )
    return top_k_per_group(
        candidates,
        partition_by=["vec_id"],
        order_by=[F.col("cos_sim").desc(), F.col("neighbor_id").asc()],
        k=k,
        rank_col="rank",
        keep_rank=True,
    ).select("vec_id", F.col("rank").cast("int").alias("rank"), "neighbor_id", "cos_sim")


def hard_negative_topk(
    embeddings: DataFrame,
    k: int = 5,
    query_filter: Column | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    round_scale: int = 8,
    max_queries: int | None = None,
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each (bounded)
    query vector, the exact top-k most-cosine-similar corpus vectors
    whose ``label_col`` DIFFERS from the query's — the classic
    "hardest negatives" batch-construction step for embedding-model
    training. Returns (vec_id, rank, neighbor_id, neighbor_label,
    cos_sim); reference parity: the reference has no ANN surface, this
    extends the training-data family per SURVEY §2.

    Scale design: identical to :func:`cosine_topk_bruteforce` — the
    bounded query set ships inside the scoring closure as a
    unit-normalized float64 matrix PLUS a label vector; the corpus
    never leaves its partitions, each Arrow batch is scored by one BLAS
    matmul with the same-label columns masked out vectorized, and the
    shuffle carries only ``partitions x |queries| x k`` candidates into
    the final global window. The self-row is excluded for free (it
    always shares the query's label).

    Label contract: ``label_col`` must be an INTEGRAL column
    (byte/short/int/long) with no nulls among the queries — the output
    schema pins ``neighbor_label int`` and the mask compares int64
    vectors. A non-integer label column raises ``ValueError`` up front
    (map string labels through a dictionary join first); a null query
    label raises ``ValueError`` at plan construction.

    ``cos_sim`` is rounded (default 8dp) BEFORE ranking with a
    neighbor-id tie-break, so ordering is reproducible across engines.
    """
    import numpy as np

    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    ltype = embeddings.schema[label_col].dataType
    if not isinstance(ltype, (ByteType, ShortType, IntegerType, LongType)):
        raise ValueError(
            f"hard_negative_topk: label column {label_col!r} must be an "
            f"integral type (byte/short/int/long), got {ltype.simpleString()} "
            "— join string labels through a dictionary table first"
        )
    qrows = _bounded_query_rows(
        embeddings, id_col, vec_col, query_filter, max_queries,
        "hard_negative_topk", extra_cols=(label_col,),
    )
    schema = (
        "vec_id bigint, rank int, neighbor_id bigint, "
        "neighbor_label int, cos_sim double"
    )
    if not qrows:
        return embeddings.sparkSession.createDataFrame([], schema)
    if any(r[2] is None for r in qrows):
        raise ValueError(
            f"hard_negative_topk: null {label_col!r} among query rows — "
            "the different-label mask is undefined for null labels; "
            "filter or impute them first"
        )
    q_ids = np.array([r[0] for r in qrows], dtype=np.int64)
    q_labels = [int(r[2]) for r in qrows]
    qm = np.array([r[1] for r in qrows], dtype=np.float64)
    qm = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-12)

    rf = float(10**round_scale)
    corpus = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("nl"),
        F.col(vec_col).alias("cv"),
    )

    candidates = corpus.mapInPandas(
        _topk_scorer(q_ids, qm, k, rf, exclude_self=False, q_labels=q_labels),
        schema="vec_id bigint, neighbor_id bigint, neighbor_label int, cos_sim double",
    )
    return top_k_per_group(
        candidates,
        partition_by=["vec_id"],
        order_by=[F.col("cos_sim").desc(), F.col("neighbor_id").asc()],
        k=k,
        rank_col="rank",
        keep_rank=True,
    ).select(
        "vec_id", F.col("rank").cast("int").alias("rank"),
        "neighbor_id", "neighbor_label", "cos_sim",
    )


def cosine_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_scale: int = 8,
    max_corpus_rows: int = 100_000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (vec_a, vec_b, cos_sim)
    for every a < b with cosine >= threshold — the exact O(N^2)
    correctness baseline for embedding dedup, bounded by
    ``max_corpus_rows`` (it broadcasts one full side by closure). The
    production-scale path is :func:`lsh_near_dup_pairs`, which never
    collects and scores only within LSH buckets.

    Scale design: one side of the N x N comparison is shipped to
    executors as a unit-normalized float64 matrix; the other side
    streams through its partitions, each Arrow batch scored by one BLAS
    matmul and mask-filtered to >= threshold before anything is
    materialized. Exact all-pairs is inherently O(N^2) — this keeps the
    constant BLAS-sized; at open-corpus scale run the same scoring
    within LSH buckets (:func:`hyperplane_lsh_topk`) instead.
    """
    import numpy as np

    rows = embeddings.select(F.col(id_col), F.col(vec_col)).limit(max_corpus_rows + 1).collect()
    if len(rows) > max_corpus_rows:
        raise ValueError(
            f"cosine_near_dup_pairs: corpus exceeds max_corpus_rows={max_corpus_rows}; "
            "this exact all-pairs baseline broadcasts one full side — use "
            "lsh_near_dup_pairs for open-ended corpora"
        )
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    m = np.array([r[1] for r in rows], dtype=np.float64)
    m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)

    rf = float(10**round_scale)
    corpus = embeddings.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("cv"))

    def score_partition(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            cm = np.array(list(pdf["cv"]), dtype=np.float64)
            cm = cm / np.maximum(np.linalg.norm(cm, axis=1, keepdims=True), 1e-12)
            t = m @ cm.T
            # half-away-from-zero rounding (dround twin)
            sims = np.sign(t) * np.floor(np.abs(t) * rf + 0.5) / rf
            bids = pdf["vec_b"].to_numpy()
            # a < b keeps each unordered pair exactly once (the a-side
            # runs over the full matrix, the b-side over this batch)
            ai, bi = np.nonzero((sims >= threshold) & (ids[:, None] < bids[None, :]))
            yield pd.DataFrame(
                {"vec_a": ids[ai], "vec_b": bids[bi], "cos_sim": sims[ai, bi]}
            ).astype({"vec_a": "int64", "vec_b": "int64", "cos_sim": "float64"})

    return corpus.mapInPandas(score_partition, schema="vec_a bigint, vec_b bigint, cos_sim double")


def lsh_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.4,
    n_bands: int = 24,
    band_planes: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_scale: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Embedding near-duplicate pairs via banded hyperplane LSH —
    the fully distributed scale path (nothing is ever collected to the
    driver; contrast :func:`cosine_near_dup_pairs`, the bounded exact
    oracle twin).

    Shape: (1) one ``mapInPandas`` pass signs each vector against
    ``n_bands x band_planes`` seeded hyperplanes and emits one
    (band, bucket) row per band — zero shuffle; (2) ``applyInPandas``
    per (band, bucket) group runs the exact BLAS all-pairs scoring
    WITHIN the bucket only and keeps pairs >= threshold; (3) one
    ``dropDuplicates`` merges pairs that collided in several bands
    (scores are identically rounded, so the merge is exact). Two
    shuffles total, both keyed finer than the data (band x bucket).

    A pair at exactly the threshold collides in a band with
    p = (1 - acos(t)/pi)^band_planes; missing all bands is
    (1-p)^n_bands — ~5e-6 at t=0.4 with the defaults, and the planes
    are seeded, so results are deterministic. At production thresholds
    (~0.95) raise ``band_planes`` to 8-16 so buckets shrink ~2^-planes
    and within-bucket work stays sub-quadratic.

    SCALE WARNING (loud, r10 SCALING.md evidence): few planes per band
    put essentially EVERY pair in a shared bucket — an unrelated
    (orthogonal) pair collides per band with ~2^-band_planes, so with
    the defaults (24 bands x 2 planes) ~99.9% of ALL pairs reach the
    exact within-bucket scorer and cost grows quadratically with the
    corpus (measured 26x work for 8x rows at t=0.4/2-planes, vs 1.8x
    at t=0.9/12-planes). That is inherent to recall at low thresholds,
    not a bug — but it must be a choice, so this function emits a
    ``RuntimeWarning`` when the expected random-pair collision
    fraction 1-(1-2^-band_planes)^n_bands exceeds 5%. Alternatives at
    scale: raise the threshold + band_planes, use multi-probe
    :func:`hyperplane_lsh_topk` (recall from probes instead of coarse
    buckets), or text-side :func:`~..llm.dedup.jaccard_pairs` whose
    prefix filter is exact and sub-quadratic at high thresholds.
    """
    import numpy as np

    p_random = 0.5**band_planes
    random_pair_frac = 1.0 - (1.0 - p_random) ** n_bands
    if random_pair_frac > 0.05:
        import warnings

        warnings.warn(
            f"lsh_near_dup_pairs(threshold={threshold}, n_bands={n_bands}, "
            f"band_planes={band_planes}): ~{random_pair_frac:.0%} of ALL "
            "pairs share a bucket, so exact scoring is effectively "
            "all-pairs and cost grows QUADRATICALLY with the corpus "
            "(SCALING.md 'LSH regimes at a glance': 31x wall for 8x "
            "rows in this regime vs 1.4x at t=0.9/12-planes). Raise "
            "band_planes (with a higher threshold), or use multi-probe "
            "hyperplane_lsh_topk / prefix-filtered jaccard_pairs for "
            "sub-quadratic near-dup at scale.",
            RuntimeWarning,
            stacklevel=2,
        )

    # one bounded driver probe for the vector dim (the array<> schema does
    # not carry it); empty/all-null input short-circuits to an empty pair
    # frame instead of a TypeError deep in plane construction
    row = embeddings.select(vec_col).filter(F.col(vec_col).isNotNull()).first()
    if row is None:
        return embeddings.sparkSession.createDataFrame(
            [], "vec_a bigint, vec_b bigint, cos_sim double"
        )
    dim = len(row[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_bands * band_planes, dim))
    rf = float(10**round_scale)
    nb, bp = n_bands, band_planes

    src = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))

    def assign_buckets(batches):
        import numpy as np
        import pandas as pd

        weights = (2 ** np.arange(bp)).astype(np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.array(list(pdf["v"]), dtype=np.float64)
            bits = (m @ planes.T >= 0).astype(np.int64)  # (n, nb*bp)
            buckets = bits.reshape(len(m), nb, bp) @ weights  # (n, nb)
            ids = pdf["vec_id"].to_numpy()
            out = pd.DataFrame(
                {
                    "band": np.repeat(np.arange(nb, dtype=np.int32), len(m)),
                    "bucket": buckets.T.reshape(-1),
                    "vec_id": np.tile(ids, nb),
                    "v": list(pdf["v"]) * nb,
                }
            )
            yield out

    banded = src.mapInPandas(
        assign_buckets, schema=f"band int, bucket bigint, vec_id bigint, v {src.schema['v'].dataType.simpleString()}"
    )

    def score_bucket(pdf):
        import numpy as np
        import pandas as pd

        if len(pdf) < 2:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cos_sim": []}).astype(
                {"vec_a": "int64", "vec_b": "int64", "cos_sim": "float64"}
            )
        m = np.array(list(pdf["v"]), dtype=np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        t = m @ m.T
        sims = np.sign(t) * np.floor(np.abs(t) * rf + 0.5) / rf  # dround twin
        ids = pdf["vec_id"].to_numpy()
        ai, bi = np.nonzero((sims >= threshold) & (ids[:, None] < ids[None, :]))
        return pd.DataFrame(
            {"vec_a": ids[ai], "vec_b": ids[bi], "cos_sim": sims[ai, bi]}
        ).astype({"vec_a": "int64", "vec_b": "int64", "cos_sim": "float64"})

    pairs = banded.groupBy("band", "bucket").applyInPandas(
        score_bucket, schema="vec_a bigint, vec_b bigint, cos_sim double"
    )
    return pairs.dropDuplicates(["vec_a", "vec_b"])


def _write_centroid_sidecar(path: str, cents) -> None:
    """(list_id, centroid) sidecar via :func:`_sidecar_write`."""
    import pyarrow as pa

    _sidecar_write(
        path,
        {
            "list_id": list(range(len(cents))),
            "centroid": [[float(v) for v in row] for row in cents],
        },
        pa.schema(
            [("list_id", pa.int32()), ("centroid", pa.list_(pa.float64()))]
        ),
    )


def _read_centroid_sidecar(path: str):
    """centroid matrix (np float64, indexed by list_id) from the
    sidecar — driver-side, no Spark job."""
    import numpy as np

    rows = _sidecar_rows(path)
    cents = np.zeros((len(rows), len(rows[0]["centroid"])))
    for r in rows:
        cents[r["list_id"]] = r["centroid"]
    return cents


def _train_centroids(embeddings, vec_col, n_lists, seed, train_sample):
    """Seeded k-means coarse quantizer: a few Lloyd iterations on cosine
    (unit vectors -> dot argmax) over a bounded driver sample. Returns a
    unit-normalized (n_lists, dim) ndarray — small enough to ship into
    closures by value."""
    import numpy as np

    rng = np.random.default_rng(seed)
    sample = embeddings.select(F.col(vec_col)).limit(train_sample).collect()
    xs = np.array([r[0] for r in sample], dtype=np.float64)
    xs = xs / np.maximum(np.linalg.norm(xs, axis=1, keepdims=True), 1e-12)
    cents = xs[rng.choice(len(xs), size=min(n_lists, len(xs)), replace=False)]
    for _ in range(5):
        assign = (xs @ cents.T).argmax(axis=1)
        for j in range(len(cents)):
            members = xs[assign == j]
            if len(members):
                c = members.mean(axis=0)
                cents[j] = c / max(np.linalg.norm(c), 1e-12)
    return cents


def ivf_topk(
    embeddings: DataFrame,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    query_filter: Column | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_scale: int = 8,
    seed: int = 42,
    train_sample: int = 2048,
    max_queries: int | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k — index-FREE form: one-shot
    search where the corpus is scanned once and every vector's list
    assignment is recomputed at score time. Use this when the corpus is
    not worth materializing; for repeated searches over a large corpus,
    :func:`ivf_build_index` + :func:`ivf_search` persist the assignment
    as a physical partition key so a probe READS only ``n_probe /
    n_lists`` of the data (partition pruning at the scan) instead of
    scanning everything and discarding non-probed rows.

    Train: k-means (a few Lloyd iterations, seeded, on a bounded driver
    sample) -> ``n_lists`` centroids. Search: each query keeps scores
    only from its ``n_probe`` nearest inverted lists. All scoring is
    BLAS matmul in ``mapInPandas``; only centroid training touches the
    driver.
    """
    import numpy as np

    cents = _train_centroids(embeddings, vec_col, n_lists, seed, train_sample)

    qrows = _bounded_query_rows(
        embeddings, id_col, vec_col, query_filter, max_queries, "ivf_topk"
    )
    if not qrows:
        schema = "vec_id bigint, rank int, neighbor_id bigint, cos_sim double"
        return embeddings.sparkSession.createDataFrame([], schema)
    q_ids = np.array([r[0] for r in qrows], dtype=np.int64)
    qm = np.array([r[1] for r in qrows], dtype=np.float64)
    qm = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-12)
    # each query probes its n_probe nearest lists (rounded key + stable
    # sort: deterministic lowest-list-id tie-break, same as ivf_search)
    q_probes = np.argsort(-_nround(qm @ cents.T), axis=1, kind="stable")[:, :n_probe]

    rf = float(10**round_scale)
    corpus = embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))

    def score_partition(batches):
        import heapq

        import numpy as np
        import pandas as pd

        heaps = {int(qid): [] for qid in q_ids}
        probe_sets = [set(map(int, row)) for row in q_probes]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cm = np.array(list(pdf["cv"]), dtype=np.float64)
            cm = cm / np.maximum(np.linalg.norm(cm, axis=1, keepdims=True), 1e-12)
            c_assign = _nround(cm @ cents.T).argmax(axis=1)
            t = qm @ cm.T
            # half-AWAY-from-zero (functions.money.dround twin): np.round
            # is half-to-even and can disagree with the oracle on .5 ties
            sims = np.sign(t) * np.floor(np.abs(t) * rf + 0.5) / rf
            nids = pdf["neighbor_id"].to_numpy()
            for qi, qid in enumerate(q_ids):
                heap = heaps[int(qid)]
                probes = probe_sets[qi]
                s = sims[qi]
                floor = heap[0][0] if len(heap) >= k else -2.0
                for ci in np.nonzero(s >= floor)[0]:
                    if int(c_assign[ci]) not in probes:
                        continue  # outside the probed inverted lists
                    nid = int(nids[ci])
                    if nid == qid:
                        continue
                    item = (float(s[ci]), -nid)
                    if len(heap) < k:
                        heapq.heappush(heap, item)
                    elif item > heap[0]:
                        heapq.heapreplace(heap, item)
        out = [
            (int(qid), -neg_nid, cos)
            for qid, heap in heaps.items()
            for cos, neg_nid in heap
        ]
        yield pd.DataFrame(out, columns=["vec_id", "neighbor_id", "cos_sim"]).astype(
            {"vec_id": "int64", "neighbor_id": "int64", "cos_sim": "float64"}
        )

    candidates = corpus.mapInPandas(
        score_partition, schema="vec_id bigint, neighbor_id bigint, cos_sim double"
    )
    return top_k_per_group(
        candidates,
        partition_by=["vec_id"],
        order_by=[F.col("cos_sim").desc(), F.col("neighbor_id").asc()],
        k=k,
        rank_col="rank",
        keep_rank=True,
    ).select("vec_id", F.col("rank").cast("int").alias("rank"), "neighbor_id", "cos_sim")


def ivf_build_index(
    embeddings: DataFrame,
    index_path: str,
    n_lists: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    train_sample: int = 2048,
    centroids=None,
):
    """Materialize the IVF physical layout: the corpus written to
    ``{index_path}/lists`` PARTITIONED BY ``list_id`` (one directory
    per inverted list), centroids to ``{index_path}/centroids``.

    This is what makes IVF pay at scale: :func:`ivf_search` pushes
    ``list_id IN (probes)`` into the scan as a partition filter, so a
    probe reads ``n_probe/n_lists`` of the FILES — the non-probed lists
    are never opened, not scanned-then-discarded. Assignment is an
    Arrow-batched argmax over the (tiny) centroid matrix shipped by
    value — partition-parallel, no shuffle beyond the partitioned
    write. Returns the centroid matrix for convenience.

    ``centroids`` (an (n_lists, dim) array-like) skips k-means training
    and quantizes against the given coarse centroids — e.g. seed
    vectors chosen by a rule an external oracle can replay exactly
    (the catalog's hash-checked IVF entry passes the unit-normalized
    lowest-id corpus vectors)."""
    import numpy as np

    if centroids is not None:
        cents = np.asarray(centroids, dtype=np.float64)
    else:
        cents = _train_centroids(embeddings, vec_col, n_lists, seed, train_sample)
    _write_centroid_sidecar(f"{index_path}/centroids", cents)

    cents_ship = cents.copy()

    def assign(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.array(list(pdf["embedding"]), dtype=np.float64)
            m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            # assignment argmax on the ROUNDED dot (8dp): ties break
            # first-index = lowest list_id, matching the oracle's
            # (dot DESC, list_id) window
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "embedding": pdf["embedding"],
                    "list_id": _nround(m @ cents_ship.T).argmax(axis=1).astype("int32"),
                }
            )

    (
        embeddings.select(
            F.col(id_col).cast("bigint").alias("vec_id"),
            F.col(vec_col).cast("array<double>").alias("embedding"),
        )
        .mapInPandas(assign, schema="vec_id bigint, embedding array<double>, list_id int")
        .write.partitionBy("list_id")
        .mode("overwrite")
        .parquet(f"{index_path}/lists")
    )
    return cents


def ivf_search(
    spark,
    index_path: str,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_scale: int = 8,
    max_queries: int = 10_000,
) -> DataFrame:
    """Search a materialized IVF index (:func:`ivf_build_index`): the
    scan is FILTERED to the union of every query's ``n_probe`` nearest
    lists — ``list_id IN (...)`` is a partition filter, so non-probed
    list directories are never read (plan-asserted in tests). Each
    query then keeps scores only from its own probed lists (the row's
    stored ``list_id`` — no re-assignment at search time).

    ``queries`` is a bounded DataFrame of (id_col, vec_col);
    ``max_queries`` guards the driver collect the same way the other
    similarity operators do."""
    import numpy as np

    cents = _read_centroid_sidecar(f"{index_path}/centroids")

    qrows = queries.select(F.col(id_col), F.col(vec_col)).limit(max_queries + 1).collect()
    if len(qrows) > max_queries:
        raise ValueError(
            f"ivf_search: query set exceeds max_queries={max_queries}; "
            "tighten the queries DataFrame or raise the cap deliberately"
        )
    if not qrows:
        return spark.createDataFrame(
            [], "vec_id bigint, rank int, neighbor_id bigint, cos_sim double"
        )
    q_ids = np.array([r[0] for r in qrows], dtype=np.int64)
    qm = np.array([r[1] for r in qrows], dtype=np.float64)
    qm = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-12)
    # probe ranking on the ROUNDED dot; stable sort so ties break by
    # lowest list_id like the oracle's (dot DESC, list_id) window
    q_probes = np.argsort(-_nround(qm @ cents.T), axis=1, kind="stable")[:, :n_probe]
    probe_union = sorted({int(p) for row in q_probes for p in row})

    corpus = (
        spark.read.parquet(f"{index_path}/lists")
        .filter(F.col("list_id").isin(probe_union))  # partition pruning
        .select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv"), "list_id")
    )
    rf = float(10**round_scale)
    k_ = k

    def score_partition(batches):
        import heapq

        import numpy as np
        import pandas as pd

        heaps = {int(qid): [] for qid in q_ids}
        probe_sets = [set(map(int, row)) for row in q_probes]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cm = np.array(list(pdf["cv"]), dtype=np.float64)
            cm = cm / np.maximum(np.linalg.norm(cm, axis=1, keepdims=True), 1e-12)
            lids = pdf["list_id"].to_numpy()
            t = qm @ cm.T
            sims = np.sign(t) * np.floor(np.abs(t) * rf + 0.5) / rf  # dround twin
            nids = pdf["neighbor_id"].to_numpy()
            for qi, qid in enumerate(q_ids):
                heap = heaps[int(qid)]
                probes = probe_sets[qi]
                s = sims[qi]
                floor = heap[0][0] if len(heap) >= k_ else -2.0
                for ci in np.nonzero(s >= floor)[0]:
                    if int(lids[ci]) not in probes:
                        continue  # another query's probe, not this one's
                    nid = int(nids[ci])
                    if nid == qid:
                        continue
                    item = (float(s[ci]), -nid)
                    if len(heap) < k_:
                        heapq.heappush(heap, item)
                    elif item > heap[0]:
                        heapq.heapreplace(heap, item)
        out = [
            (int(qid), -neg_nid, cos)
            for qid, heap in heaps.items()
            for cos, neg_nid in heap
        ]
        yield pd.DataFrame(out, columns=["vec_id", "neighbor_id", "cos_sim"]).astype(
            {"vec_id": "int64", "neighbor_id": "int64", "cos_sim": "float64"}
        )

    candidates = corpus.mapInPandas(
        score_partition, schema="vec_id bigint, neighbor_id bigint, cos_sim double"
    )
    return top_k_per_group(
        candidates,
        partition_by=["vec_id"],
        order_by=[F.col("cos_sim").desc(), F.col("neighbor_id").asc()],
        k=k,
        rank_col="rank",
        keep_rank=True,
    ).select("vec_id", F.col("rank").cast("int").alias("rank"), "neighbor_id", "cos_sim")


def ann_recall_summary(
    exact_topk: DataFrame, ann_topk: DataFrame, recall_floor: float
) -> DataFrame:
    """One self-verifying row comparing an ANN top-k result to its
    exact brute-force twin: (n_queries, n_exact, n_ann, n_hits, recall,
    floor_ok). Everything is deterministic (seeded planes/centroids), so
    the row is reproducible run-to-run; ``floor_ok`` makes a recall
    regression visible as a value change, not just a silent drift."""
    # ONE full-outer join + ONE aggregate (r21): the former
    # three-1-row-aggregate crossJoin form executed the exact
    # brute-force pipeline AND the ANN pipeline twice each (their own
    # count + the hits join), as 4-5 separate jobs per composed-index
    # query. (vec_id, neighbor_id) is unique within each top-k list, so
    # per joined row the presence markers recover exactly the old
    # counts: n_exact/n_ann = marker counts, n_hits = both-present,
    # n_queries = distinct vec_id among exact rows.
    ex = exact_topk.select("vec_id", "neighbor_id", F.lit(1).alias("__e"))
    an = ann_topk.select("vec_id", "neighbor_id", F.lit(1).alias("__a"))
    both = ex.join(an, ["vec_id", "neighbor_id"], "full_outer")
    return (
        both.agg(
            F.count_distinct(
                F.when(F.col("__e").isNotNull(), F.col("vec_id"))
            ).alias("n_queries"),
            F.count("__e").alias("n_exact"),
            F.count("__a").alias("n_ann"),
            F.count(F.when(F.col("__e").isNotNull() & F.col("__a").isNotNull(), 1)).alias(
                "n_hits"
            ),
        )
        .select(
            "n_queries",
            "n_exact",
            "n_ann",
            "n_hits",
            # n_exact = 0 (empty query set / k=0) would make both NULL and a
            # gate reading floor_ok would see neither true nor false — pin
            # recall to 0.0 and floor_ok to false so no-data reads as a
            # failing gate, not a silent one
            F.coalesce(dround(F.col("n_hits") / F.col("n_exact"), 4), F.lit(0.0)).alias("recall"),
            F.coalesce(
                F.col("n_hits") / F.col("n_exact") >= recall_floor, F.lit(False)
            ).alias("floor_ok"),
        )
    )


def _planes(n_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.uniform(-1.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def hyperplane_lsh_topk(
    embeddings: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int | None = None,
    query_filter: Column | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probes: int = 1,
) -> DataFrame:
    """Approximate cosine top-k: bucket by sign bits against seeded
    random hyperplanes, then exact scoring within the bucket only.
    2^n_planes buckets => corpus scanned per query shrinks ~2^-n_planes
    (at some recall cost).

    ``n_probes`` enables MULTI-PROBE: each query additionally scans the
    ``n_probes - 1`` flip-one-bit neighbor buckets whose planes it is
    CLOSEST to (smallest |rounded dot| margin — those are the buckets a
    true near neighbor most likely fell into), so candidate volume
    grows ~linearly in ``n_probes`` while recall climbs much faster
    than lowering ``n_planes`` would allow (measured at sf0.01,
    n_planes=4: recall 0.134 at n_probes=1 → 0.244 at 2 → 0.340 at 3 →
    0.414 at 4 → 0.462 at 5).
    Each corpus vector lives in exactly ONE bucket and probe signatures
    are distinct, so no candidate pair is scored twice. Default 1 keeps
    the single-bucket behavior (the hash-graded catalog oracle replays
    that path).

    ``dim`` is inferred from the data when not given — a mismatched dim
    would null-pad the dot products and silently collapse every vector
    into one bucket (a full cross join)."""
    if not 1 <= n_probes <= n_planes + 1:
        raise ValueError(f"n_probes must be in [1, n_planes + 1], got {n_probes}")
    if dim is None:
        first = embeddings.select(vec_col).filter(F.col(vec_col).isNotNull()).first()
        if first is None:  # empty/all-null input: no buckets, no neighbors
            return embeddings.sparkSession.createDataFrame(
                [], "vec_id bigint, rank int, neighbor_id bigint, cos_sim double"
            )
        dim = len(first[0])
    planes = _planes(n_planes, dim)
    # one parsed literal instead of n_planes x dim F.lit py4j calls
    # (r21 driver-cost fix; repr() round-trips every double exactly)
    plane_arr = F.expr(
        "array(" + ",".join(
            "array(" + ",".join(repr(v) + "D" for v in row) + ")"
            for row in planes
        ) + ")"
    )
    # sign bit on the ROUNDED dot (8dp dround, oracle twin o_round):
    # an ulp of accumulation skew at the 0 boundary must not flip a
    # bucket between engines
    dots = F.transform(plane_arr, lambda p: _dround_once(_dot(F.col(vec_col), p), 8))
    sig_from = lambda d: F.concat_ws(  # noqa: E731
        "", F.transform(d, lambda x: F.when(x >= 0, "1").otherwise("0"))
    )
    bucketed = embeddings.select(
        F.col(id_col), F.col(vec_col), dots.alias("__dots"), sig_from(dots).alias("bucket")
    )
    q = bucketed.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("qv"), "__dots", "bucket"
    )
    if query_filter is not None:
        q = q.filter(query_filter)
    if n_probes > 1:
        # flip the (n_probes - 1) closest-margin bits: sort plane
        # indices by (|dot|, idx) and rebuild the signature with each
        # chosen bit inverted — all in-plan, no Python
        margins = F.sort_array(
            F.transform(
                F.col("__dots"),
                lambda d, i: F.struct(F.abs(d).alias("m"), i.alias("idx")),
            )
        )
        flips = F.slice(F.transform(margins, lambda s: s["idx"]), 1, n_probes - 1)
        probe_sigs = F.array_union(
            F.array(F.col("bucket")),
            F.transform(
                flips,
                lambda fi: F.concat_ws(
                    "",
                    F.transform(
                        F.col("__dots"),
                        lambda d, i: F.when(
                            i == fi,
                            F.when(d >= 0, "0").otherwise("1"),
                        ).otherwise(F.when(d >= 0, "1").otherwise("0")),
                    ),
                ),
            ),
        )
        q = q.select(
            "vec_id", "qv", F.explode(probe_sigs).alias("bucket")
        )
    else:
        q = q.select("vec_id", "qv", "bucket")
    c = bucketed.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), "bucket")
    pairs = q.join(c, "bucket").filter(F.col("vec_id") != F.col("neighbor_id"))
    cos = _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv")))
    scored = pairs.select("vec_id", "neighbor_id", _dround_once(cos, 8).alias("cos_sim"))
    return top_k_per_group(
        scored,
        partition_by=["vec_id"],
        order_by=[F.col("cos_sim").desc(), F.col("neighbor_id").asc()],
        k=k,
        rank_col="rank",
        keep_rank=True,
    ).select("vec_id", F.col("rank").cast("int").alias("rank"), "neighbor_id", "cos_sim")


def _train_pq_codebooks(embeddings, id_col, vec_col, m, ksub, seed, train_sample):
    """Seeded per-subspace k-means codebooks (product quantization): the
    vector space splits into ``m`` contiguous subspaces; each gets its
    own ``ksub``-centroid L2 codebook trained with a few Lloyd
    iterations on a bounded driver sample of UNIT-normalized vectors.
    The sample is the ``train_sample`` LOWEST ids (TakeOrderedAndProject,
    bounded cost) — an un-ordered ``limit`` would depend on partition
    layout and break end-to-end determinism across repartitioning.
    Returns (m, ksub, dim // m) float64 — a few KB, shipped into
    closures by value like the IVF centroids."""
    import numpy as np

    rng = np.random.default_rng(seed)
    sample = (
        embeddings.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.col(id_col))
        .limit(train_sample)
        .select(F.col(vec_col))
        .collect()
    )
    xs = np.array([r[0] for r in sample], dtype=np.float64)
    xs = xs / np.maximum(np.linalg.norm(xs, axis=1, keepdims=True), 1e-12)
    dim = xs.shape[1]
    if dim % m != 0:
        raise ValueError(f"PQ: dim {dim} not divisible by m={m} subspaces")
    dsub = dim // m
    books = np.zeros((m, ksub, dsub), dtype=np.float64)
    for j in range(m):
        sub = xs[:, j * dsub : (j + 1) * dsub]
        cents = sub[rng.choice(len(sub), size=min(ksub, len(sub)), replace=False)]
        for _ in range(8):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(len(cents)):
                members = sub[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books[j, : len(cents)] = cents
    return books


def pq_topk(
    embeddings: DataFrame,
    k: int = 5,
    m: int = 8,
    ksub: int = 16,
    rerank: int | None = None,
    query_filter: Column | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_scale: int = 8,
    seed: int = 42,
    train_sample: int = 2048,
    max_queries: int | None = None,
    books=None,
) -> DataFrame:
    """Product-quantization approximate top-k with exact re-rank —
    the MEMORY-scale ANN path (IVF prunes what is READ, LSH prunes what
    is COMPARED; PQ shrinks what is HELD: ``m`` uint8 codes per vector
    instead of ``dim`` floats, 32x at the defaults for dim=64).

    Per partition: corpus vectors unit-normalize, encode to their
    nearest codebook entry per subspace, and score against each query
    by asymmetric distance computation — an (m x ksub) table of
    query-subvector dot products per query, summed by code lookups
    (this is the scan a PQ-compressed 100 TB index performs: bytes +
    table lookups, no float vectors). The global top ``k + rerank``
    ADC candidates are then re-scored EXACTLY by the shared JVM
    re-rank stage (:func:`_adc_exact_rerank`: survivors broadcast-join
    the float table and score with the codegen fold — the same IEEE op
    sequence as the DuckDB oracle), and the final window ranks by
    exact cosine — so PQ error affects only which candidates survive,
    never the reported similarity of survivors.

    Determinism: the codebooks are layout-independent (seeded k-means
    on the ``train_sample`` LOWEST ids — an ordered take, not an
    un-ordered limit; or caller-supplied via ``books``), every per-row
    step breaks ties deterministically (argmin first-index, id
    tie-breaks), and the candidate set is PARTITION-INDEPENDENT: the
    per-partition heaps order by the ROUNDED ADC score (6dp, so float
    accumulation noise can't flip the ordering) with an id tie-break,
    and a global ADC top-(k+rerank) cut applies before the exact
    re-rank. Each partition's heap holds a superset of its share of
    that global ADC top list, so the cut — and therefore the result —
    is identical under any repartitioning, and an external oracle can
    replay the whole pipeline.

    ``books`` (an (m, ksub, dim//m) array-like) skips k-means training
    and encodes against the given codebooks — e.g. subvectors of the
    lowest-id corpus vectors, which a SQL oracle can reconstruct.

    ``rerank=None`` (the default) SCALES the exact-rerank budget with
    the corpus: ``max(128, ceil(n/16))`` candidates, costing one cheap
    ``count()`` of the corpus frame. A FIXED budget silently loses
    recall as the corpus grows — the r10 SCALING.md re-measure saw
    recall 0.742 → 0.502 at 8x corpus under a pinned ``rerank=128``
    (the ADC candidate pool grew 8x but the exact window did not),
    while n/16 held 0.742 at the base scale and restores it at 8x.
    The rerank is still a vanishing fraction of the ADC scan (1/16 of
    the corpus per query, exact-scored only for heap survivors); for
    sub-linear per-query cost compose with IVF list-pruning
    (``ivf_search``), which bounds the scanned corpus per probe —
    then a fixed budget proportional to the probed-list size is
    appropriate. Pass an explicit int to pin the budget (the graded
    catalog entry pins 128 so its oracle hash is scale-stable).

    The auto budget is CAPPED at 8192: per-query per-partition heap
    memory and the candidate shuffle both scale with ``k + rerank``,
    so an uncapped n/16 would grow them linearly with the corpus (a
    50M-row corpus would mean ~3M-entry heaps per query — executor
    OOM). Past the cap, flat-scan PQ stops being the right tool:
    compose with IVF so the per-probe pool, and hence a fixed budget,
    stays bounded. The one ``count()`` job at call time is the
    documented price of auto-scaling; pass an explicit ``rerank`` to
    stay action-free.
    """
    import numpy as np

    if rerank is None:
        # the shared helper with the PQ floor (128) — pq_search's
        # rerank=None path resolves through the same call, so the
        # logical/physical parity claim holds for the auto budget too
        rerank = _auto_rerank_budget(embeddings.count(), floor=128)

    qrows = _bounded_query_rows(
        embeddings, id_col, vec_col, query_filter, max_queries, "pq_topk"
    )
    if not qrows:
        # also covers the empty-corpus case (queries come from the same
        # frame), so codebook training below always has sample vectors
        schema = "vec_id bigint, rank int, neighbor_id bigint, cos_sim double"
        return embeddings.sparkSession.createDataFrame([], schema)
    if books is not None:
        books = np.asarray(books, dtype=np.float64)
        if books.shape[0] != m or books.shape[1] != ksub:
            raise ValueError(f"books shape {books.shape} != (m={m}, ksub={ksub}, dsub)")
    else:
        books = _train_pq_codebooks(embeddings, id_col, vec_col, m, ksub, seed, train_sample)
    dsub = books.shape[2]
    q_ids = np.array([r[0] for r in qrows], dtype=np.int64)
    qm = np.array([r[1] for r in qrows], dtype=np.float64)
    qm = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-12)
    # ADC lookup tables: (n_queries, m, ksub) — query subvector dots
    # with every codebook entry, built once on the driver
    tables = np.einsum("qjd,jkd->qjk", qm.reshape(len(qm), m, dsub), books)

    keep = k + rerank
    corpus = embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))

    def score_partition(batches):
        import heapq

        import numpy as np
        import pandas as pd

        heaps = {int(qid): [] for qid in q_ids}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cm = np.array(list(pdf["cv"]), dtype=np.float64)
            cm = cm / np.maximum(np.linalg.norm(cm, axis=1, keepdims=True), 1e-12)
            sub = cm.reshape(len(cm), m, dsub)
            # encode: nearest codebook entry per subspace — argmin on
            # the ROUNDED Euclidean distance (8dp, mirroring the
            # oracle's o_round(list_distance) key) so a near-tie can't
            # flip a code between engines; first-index ties = lowest
            # cid, matching the oracle's (dist, cid) window
            codes = np.empty((len(cm), m), dtype=np.int64)
            for j in range(m):
                d2 = ((sub[:, j, None, :] - books[None, j]) ** 2).sum(axis=2)
                codes[:, j] = _nround(np.sqrt(d2)).argmin(axis=1)
            nids = pdf["neighbor_id"].to_numpy()
            js = np.arange(m)
            for qi, qid in enumerate(q_ids):
                # ADC score: sum of table lookups over the m codes —
                # ROUNDED (6dp, half-away like dround) so the heap /
                # global-cut ordering is reproducible across engines and
                # accumulation orders; ties break by neighbor id
                adc = tables[qi][js, codes].sum(axis=1)
                adc = np.sign(adc) * np.floor(np.abs(adc) * 1e6 + 0.5) / 1e6
                heap = heaps[int(qid)]
                floor = heap[0][0] if len(heap) >= keep else -2.0
                for ci in np.nonzero(adc >= floor)[0]:
                    nid = int(nids[ci])
                    if nid == qid:
                        continue
                    item = (float(adc[ci]), -nid)
                    if len(heap) < keep:
                        heapq.heappush(heap, item)
                    elif item > heap[0]:
                        heapq.heapreplace(heap, item)
        out = [
            (int(qid), -neg_nid, adc_r)
            for qid, heap in heaps.items()
            for adc_r, neg_nid in heap
        ]
        yield pd.DataFrame(
            out, columns=["vec_id", "neighbor_id", "adc"]
        ).astype(
            {"vec_id": "int64", "neighbor_id": "int64", "adc": "float64"}
        )

    candidates = corpus.mapInPandas(
        score_partition,
        schema="vec_id bigint, neighbor_id bigint, adc double",
    )
    # global ADC top-(k+rerank) cut first — every partition heap holds a
    # superset of its share of this list, so the cut is
    # partition-independent — then re-rank the survivors by EXACT
    # cosine: ADC only ever chooses candidates, never reported scores.
    # The re-rank is the shared JVM fold stage (r13): identical IEEE op
    # sequence to the DuckDB oracle, no numpy-accumulation boundary risk
    adc_cut = top_k_per_group(
        candidates,
        partition_by=["vec_id"],
        order_by=[F.col("adc").desc(), F.col("neighbor_id").asc()],
        k=keep,
    )
    return _adc_exact_rerank(
        embeddings.sparkSession, adc_cut, qrows, embeddings,
        id_col, vec_col, k, round_scale, cand_bound=len(qrows) * keep,
    )


def pq_build_index(
    embeddings: DataFrame,
    index_path: str,
    m: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    books=None,
    seed: int = 42,
    train_sample: int = 2048,
    n_lists: int | None = None,
    centroids=None,
) -> None:
    """Materialize the PQ physical layout — the classic IVFPQ index
    when composed with ``n_lists`` (Jégou et al. 2011, the canonical
    billion-scale ANN layout): the corpus encoded to
    ``{index_path}/codes`` as (vec_id, codes binary) — ``m`` BYTES per
    vector, a ``dim*8/m``-fold shrink over float64 (64x at the
    defaults for dim=64) — plus the ``{index_path}/books`` codebook
    sidecar (m*ksub rows). This completes the physical symmetry with
    :func:`sq8_build_index`: SQ8's codes cut scan BANDWIDTH 8x keeping
    every dimension; PQ's codes shrink what is HELD far harder at the
    price of a coarse ADC, which is why :func:`pq_search` defaults to
    the corpus-scaled exact-rerank budget.

    Encoding is ONE Arrow pass replaying :func:`pq_topk` bit for bit:
    unit-normalize, per-subspace argmin on the ROUNDED L2 distance
    (8dp, first-index = lowest code ties) — so a physical search
    equals the logical flat scan row for row at the same parameters.

    ``n_lists`` composes the two pruning axes exactly as in
    ``sq8_build_index``: codes additionally carry the coarse-list
    assignment (argmax rounded dot, lowest-list ties; centroids to
    ``{index_path}/centroids``) and write PARTITIONED BY ``list_id``,
    so a probed :func:`pq_search` opens ``n_probe/n_lists`` of the
    FILES and reads ``m`` bytes per held vector — IVF prunes what is
    read, PQ shrinks what is held.

    ``books`` (an (m, ksub, dim//m) array-like) skips the seeded
    k-means trainer, e.g. the lowest-id-subvector books a SQL oracle
    can reconstruct (the ``emb_pq_topk`` treatment).
    """
    import numpy as np

    if books is not None:
        books = np.asarray(books, dtype=np.float64)
        if books.shape[0] != m or books.shape[1] != ksub:
            raise ValueError(
                f"books shape {books.shape} != (m={m}, ksub={ksub}, dsub)"
            )
    else:
        books = _train_pq_codebooks(
            embeddings, id_col, vec_col, m, ksub, seed, train_sample
        )
    dsub = books.shape[2]

    import pyarrow as pa

    _sidecar_write(
        f"{index_path}/books",
        {
            "j": [j for j in range(m) for _ in range(ksub)],
            "cid": [c for _ in range(m) for c in range(ksub)],
            "bv": [
                [float(v) for v in books[j, c]]
                for j in range(m)
                for c in range(ksub)
            ],
        },
        pa.schema(
            [("j", pa.int32()), ("cid", pa.int32()), ("bv", pa.list_(pa.float64()))]
        ),
    )

    cents = None
    if n_lists is not None:
        cents = (
            np.asarray(centroids, dtype=np.float64)
            if centroids is not None
            else _train_centroids(embeddings, vec_col, n_lists, seed, train_sample)
        )
        _write_centroid_sidecar(f"{index_path}/centroids", cents)

    def encode(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            raw = np.array(list(pdf[vec_col]), dtype=np.float64)
            cm = raw / np.maximum(
                np.linalg.norm(raw, axis=1, keepdims=True), 1e-12
            )
            sub = cm.reshape(len(cm), m, dsub)
            codes = np.empty((len(cm), m), dtype=np.uint8)
            for j in range(m):
                d2 = ((sub[:, j, None, :] - books[None, j]) ** 2).sum(axis=2)
                codes[:, j] = _nround(np.sqrt(d2)).argmin(axis=1)
            out = {
                "vec_id": pdf[id_col].to_numpy(),
                "codes": [row.tobytes() for row in codes],
            }
            if cents is not None:
                out["list_id"] = (
                    _nround(cm @ cents.T).argmax(axis=1).astype("int32")
                )
            yield pd.DataFrame(out)

    writer = (
        embeddings.select(
            F.col(id_col).cast("bigint").alias(id_col),
            F.col(vec_col).cast("array<double>").alias(vec_col),
        )
        .mapInPandas(
            encode,
            schema="vec_id bigint, codes binary"
            + (", list_id int" if cents is not None else ""),
        )
        .write.mode("overwrite")
    )
    if cents is not None:
        writer = writer.partitionBy("list_id")
    writer.parquet(f"{index_path}/codes")


def pq_search(
    spark,
    index_path: str,
    queries: DataFrame,
    embeddings: DataFrame,
    k: int = 5,
    rerank: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_scale: int = 8,
    max_queries: int = 10_000,
    n_probe: int | None = None,
) -> DataFrame:
    """Search a materialized PQ index (:func:`pq_build_index`) — IVFPQ
    when the index is list-partitioned: the candidate stage scans ONLY
    (vec_id, codes) at ``m`` bytes per vector, scores by ADC table
    lookups against the broadcast codebook sidecar, and heaps the
    global top-(k+rerank) rounded sums per query; survivors re-rank
    exactly through the shared JVM fold stage
    (:func:`_adc_exact_rerank` — the float table is touched only via
    broadcast joins on the candidate ids). One Python stage: the byte
    scan, exactly like :func:`sq8_search`.

    On a list-partitioned index the probe set prunes both axes:
    ``list_id IN (probes)`` is a partition filter (non-probed
    directories never open) and what IS read is ``m`` bytes per
    vector. ``n_probe`` defaults to 4 there; probing every list
    reproduces the flat answer exactly.

    ``rerank=None`` (the DEFAULT here, unlike ``sq8_search``) applies
    the corpus-scaled budget (:func:`_auto_rerank_budget` with the PQ
    floor of 128, over the probed codes count): PQ's coarse 8-code ADC
    genuinely needs the budget to track the candidate pool (the r10
    lesson — recall 0.742 -> 0.502 at 8x under a pinned 128), where
    SQ8's near-exact ADC does not. Composing with IVF keeps the pool —
    and hence the budget — bounded by the probed fraction.

    Matches :func:`pq_topk` row for row at the same parameters (same
    encode, same rounded-ADC ordering, same partition-independent cut,
    same shared exact re-rank; pinned in tests) — INCLUDING
    ``rerank=None`` on a flat index, where both paths resolve the
    budget through the same helper at the same floor.

    CONTRACT: ``embeddings`` must be the SAME corpus the index was
    built from (the rerank joins survivors back by id), exactly as
    with ``sq8_search``/``ivf_search``.
    """
    import numpy as np

    book_rows = _sidecar_rows(f"{index_path}/books")
    m = max(r["j"] for r in book_rows) + 1
    ksub = max(r["cid"] for r in book_rows) + 1
    dsub = len(book_rows[0]["bv"])
    books = np.zeros((m, ksub, dsub), dtype=np.float64)
    for r in book_rows:
        books[r["j"], r["cid"]] = r["bv"]

    qrows = (
        queries.select(F.col(id_col), F.col(vec_col))
        .limit(max_queries + 1)
        .collect()
    )
    if len(qrows) > max_queries:
        raise ValueError(
            f"pq_search: query set exceeds max_queries={max_queries}; "
            "tighten the queries DataFrame or raise the cap deliberately"
        )
    if not qrows:
        return spark.createDataFrame(
            [], "vec_id bigint, rank int, neighbor_id bigint, cos_sim double"
        )
    q_ids = np.array([r[0] for r in qrows], dtype=np.int64)
    qt = np.array([r[1] for r in qrows], dtype=np.float64)
    qm = qt / np.maximum(np.linalg.norm(qt, axis=1, keepdims=True), 1e-12)
    tables = np.einsum("qjd,jkd->qjk", qm.reshape(len(qm), m, dsub), books)

    corpus = spark.read.parquet(f"{index_path}/codes")
    q_probes = None
    if "list_id" in corpus.columns:
        if n_probe is None:
            n_probe = 4
        cents = _read_centroid_sidecar(f"{index_path}/centroids")
        q_probes = np.argsort(
            -_nround(qm @ cents.T), axis=1, kind="stable"
        )[:, :n_probe]
        probe_union = sorted({int(p) for row in q_probes for p in row})
        corpus = corpus.filter(F.col("list_id").isin(probe_union))
    elif n_probe is not None:
        raise ValueError(
            "pq_search: n_probe given but the index has no list_id "
            "partitions — rebuild with pq_build_index(n_lists=...)"
        )
    if rerank is None:
        # PQ floor (128): same helper + same floor as pq_topk, so the
        # two paths resolve identical budgets at the same scanned count
        rerank = _auto_rerank_budget(corpus.count(), floor=128)
    keep = k + rerank

    def score_partition(batches):
        import heapq

        import numpy as np
        import pandas as pd

        heaps = {int(qid): [] for qid in q_ids}
        probe_sets = (
            None if q_probes is None
            else [set(map(int, row)) for row in q_probes]
        )
        js = np.arange(m)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            codes = np.frombuffer(
                b"".join(pdf["codes"]), dtype=np.uint8
            ).reshape(len(pdf), m).astype(np.int64)
            nids = pdf["vec_id"].to_numpy()
            lids = pdf["list_id"].to_numpy() if probe_sets is not None else None
            for qi, qid in enumerate(q_ids):
                adc = tables[qi][js, codes].sum(axis=1)
                adc = np.sign(adc) * np.floor(np.abs(adc) * 1e6 + 0.5) / 1e6
                heap = heaps[int(qid)]
                floor = heap[0][0] if len(heap) >= keep else -2.0
                for ci in np.nonzero(adc >= floor)[0]:
                    if lids is not None and int(lids[ci]) not in probe_sets[qi]:
                        continue
                    nid = int(nids[ci])
                    if nid == qid:
                        continue
                    item = (float(adc[ci]), -nid)
                    if len(heap) < keep:
                        heapq.heappush(heap, item)
                    elif item > heap[0]:
                        heapq.heapreplace(heap, item)
        out = [
            (int(qid), -neg_nid, adc_r)
            for qid, heap in heaps.items()
            for adc_r, neg_nid in heap
        ]
        yield pd.DataFrame(
            out, columns=["vec_id", "neighbor_id", "adc"]
        ).astype(
            {"vec_id": "int64", "neighbor_id": "int64", "adc": "float64"}
        )

    candidates = corpus.mapInPandas(
        score_partition,
        schema="vec_id bigint, neighbor_id bigint, adc double",
    )
    cand_cut = top_k_per_group(
        candidates,
        partition_by=["vec_id"],
        order_by=[F.col("adc").desc(), F.col("neighbor_id").asc()],
        k=keep,
    )
    return _adc_exact_rerank(
        spark, cand_cut, qrows, embeddings, id_col, vec_col, k,
        round_scale, cand_bound=len(qrows) * keep,
    )


def _np_unit_rounded(m):
    """The 8dp-rounded unit vectors of a (rows, dim) float64 matrix,
    accumulating the norm STRICTLY left-to-right via ``np.cumsum`` —
    the exact IEEE op sequence of both the JVM ``F.aggregate`` fold
    (`_dot`) and DuckDB's ``list_dot_product``, so every downstream
    SQ8 code is bit-identical across engines (a plain ``.sum()`` would
    pairwise-accumulate and could differ by an ulp on the 8dp
    boundary; equality with the JVM fold is pinned in tests). Zero
    vectors clamp like ``_norm``."""
    import numpy as np

    n2 = np.cumsum(m * m, axis=1)[:, -1]
    norm = np.maximum(np.sqrt(n2), 1e-12)
    return _nround(m / norm[:, None])


def _sq8_dim_stats(df: DataFrame, id_col: str, vec_col: str):
    """Per-dimension (mn, mx) float64 arrays over the corpus's rounded
    unit values — the SQ8 training pass. One Arrow scan emitting
    dim-count rows per PARTITION (partial min/max inside the batch
    loop), then a dim-row final aggregate: the shuffle carries
    partitions x dim rows, never data."""
    import numpy as np

    def partial(batches):
        import numpy as np
        import pandas as pd

        lo = hi = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            un = _np_unit_rounded(np.array(list(pdf[vec_col]), dtype=np.float64))
            bl, bh = un.min(axis=0), un.max(axis=0)
            lo = bl if lo is None else np.minimum(lo, bl)
            hi = bh if hi is None else np.maximum(hi, bh)
        if lo is not None:
            yield pd.DataFrame(
                {"pos": np.arange(len(lo), dtype="int32"), "mn": lo, "mx": hi}
            )

    stats = (
        df.select(F.col(vec_col).cast("array<double>").alias(vec_col))
        .mapInPandas(partial, schema="pos int, mn double, mx double")
        .groupBy("pos")
        .agg(F.min("mn").alias("mn"), F.max("mx").alias("mx"))
        .collect()
    )
    dim = max(r["pos"] for r in stats) + 1
    mn = np.zeros(dim, dtype=np.float64)
    mx = np.zeros(dim, dtype=np.float64)
    for r in stats:
        mn[r["pos"]] = r["mn"]
        mx[r["pos"]] = r["mx"]
    return mn, mx


# Above this many candidate rows (|queries| x (k+rerank)), the
# survivor list stops being broadcast-sized: skip the explicit hint
# and let AQE pick the join strategy from the measured size instead.
# ~24 bytes/row puts the hinted ceiling around tens of MB, far from
# driver memory pressure; the documented caps (max_queries=10000 x
# auto-rerank cap 8192) would otherwise hint an ~80M-row broadcast.
_BROADCAST_CAND_ROWS = 1_000_000


def _adc_exact_rerank(
    spark,
    cand_cut: DataFrame,
    qrows,
    float_corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    round_scale: int,
    cand_bound: int | None = None,
) -> DataFrame:
    """The SHARED exact re-rank stage of the quantized scans
    (:func:`pq_topk`, :func:`pq_search`, :func:`sq8_topk`,
    :func:`sq8_search`): join the ADC-survivor list
    (at most |queries| x (k+rerank) ids) against the float table,
    broadcast the collected query vectors, and score with the JVM
    codegen ``_dot``/``_norm`` fold — the same left-to-right IEEE op
    sequence DuckDB's ``list_dot_product`` uses, so the
    ``round_scale``-rounded cosine is identical across engines by
    construction (an accumulation-order ulp on the rounding boundary
    cannot occur; the callers share this code, so their row-for-row
    parity is structural). Full-width vectors are read for candidates
    only, never the corpus.

    ``cand_bound`` is the caller's upper bound on the survivor-list
    rows (|queries| x (k+rerank)). The broadcast hint on the survivor
    join applies only when that bound is known and under
    ``_BROADCAST_CAND_ROWS`` — at the documented caps the list is
    ~80M rows, well past sensible broadcast size, so larger (or
    unknown) bounds leave the strategy to AQE's measured sizes."""
    qdf = spark.createDataFrame(
        [(int(r[0]), [float(v) for v in r[1]]) for r in qrows],
        "vec_id bigint, qv array<double>",
    )
    cv = float_corpus.select(
        F.col(id_col).cast("bigint").alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    cos = _dround_once(
        _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv"))),
        round_scale,
    )
    cand = (
        F.broadcast(cand_cut)
        if cand_bound is not None and cand_bound <= _BROADCAST_CAND_ROWS
        else cand_cut
    )
    scored = (
        cv.join(cand, "neighbor_id")
        .join(F.broadcast(qdf), "vec_id")
        .select("vec_id", "neighbor_id", cos.alias("cos_sim"))
    )
    return top_k_per_group(
        scored,
        partition_by=["vec_id"],
        order_by=[F.col("cos_sim").desc(), F.col("neighbor_id").asc()],
        k=k,
        rank_col="rank",
        keep_rank=True,
    ).select(
        "vec_id", F.col("rank").cast("int").alias("rank"), "neighbor_id", "cos_sim"
    )


def sq8_topk(
    embeddings: DataFrame,
    k: int = 5,
    rerank: int = 32,
    query_filter: Column | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_scale: int = 8,
    max_queries: int | None = None,
) -> DataFrame:
    """Int8 scalar-quantized approximate top-k with exact re-rank — the
    MEMORY-BANDWIDTH path of the ANN family (IVF prunes what is READ,
    LSH prunes what is COMPARED, PQ shrinks what is HELD to ``m``
    codes; SQ8 keeps EVERY dimension but at 1 byte instead of 8:
    per-dimension affine min/max quantization of the unit-normalized
    corpus, so a 100 TB float64 index scans as ~12.5 TB of codes).

    Training is ONE Arrow scan with per-partition partial min/max over
    the ROUNDED unit values (the shuffle carries dim-count rows per
    partition, not data). Each corpus vector then encodes as
    ``code_d = floor((u_d - mn_d) / (mx_d - mn_d) * 255 + 0.5)`` and
    scores against a query by the dot product with the DEQUANTIZED
    vector ``mn_d + code_d * (mx_d - mn_d) / 255`` — the scan a
    byte-compressed index performs (a production deployment persists
    the codes column once and scans bytes + the two 64-float tables;
    the graded entry re-encodes in-scan like ``pq_topk``, and the
    affine form means the scan could equally score
    ``q·mn + (q*scale)·codes`` without materializing the floats).
    The top ``k + rerank`` candidates re-rank EXACTLY, so quantization
    error affects only which candidates survive, never reported
    similarities.

    Determinism (oracle-replayable end to end): the quantization
    INPUT is :func:`_np_unit_rounded` — the norm accumulates strictly
    left-to-right (``np.cumsum``), the exact IEEE op sequence of both
    the JVM ``F.aggregate`` fold and DuckDB's ``list_dot_product``
    twin (pinned equal in tests) — so codes are BIT-IDENTICAL across
    engines, and the per-dim min/max are selections of those shared
    values (no accumulation). The ADC analog rounds at 6dp, the exact
    cosine at ``round_scale``, every ordering breaks ties by id, and
    the candidate cut is partition-independent (per-partition heaps on
    the rounded score hold a superset of the global top-(k+rerank)).
    The exact re-rank itself runs JVM-SIDE (survivors of the global
    ADC cut broadcast-join back to the float table and score with the
    codegen ``_dot``/``_norm`` fold) — the same left-to-right IEEE op
    sequence as DuckDB's ``list_dot_product``, so the 8dp-rounded
    exact value can never differ by a boundary ulp the way a
    numpy/BLAS accumulation could, and :func:`sq8_search` shares the
    stage verbatim (the row-for-row parity claim rests on identical
    code, not on two accumulation orders happening to agree).

    Unlike ``pq_topk`` the default ``rerank`` is a small FIXED 32:
    8-bit-per-dim reconstruction error is tiny (the ADC ordering is
    nearly exact), so the budget does not need to scale with the
    corpus the way PQ's coarse 8-code ADC does.
    """
    import numpy as np

    qrows = _bounded_query_rows(
        embeddings, id_col, vec_col, query_filter, max_queries, "sq8_topk"
    )
    if not qrows:
        schema = "vec_id bigint, rank int, neighbor_id bigint, cos_sim double"
        return embeddings.sparkSession.createDataFrame([], schema)
    # per-dimension min/max of the shared rounded unit values: the one
    # training pass — a dim-row collect after the partial aggregate
    mn, mx = _sq8_dim_stats(embeddings, id_col, vec_col)
    span = mx - mn
    scale = span / 255.0
    nz = span > 0

    q_ids = np.array([r[0] for r in qrows], dtype=np.int64)
    qt = np.array([r[1] for r in qrows], dtype=np.float64)  # true vectors
    qn = _np_unit_rounded(qt)  # rounded unit (the oracle's quantization input)

    keep = k + rerank
    corpus = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )

    def score_partition(batches):
        import heapq

        import numpy as np
        import pandas as pd

        heaps = {int(qid): [] for qid in q_ids}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            raw = np.array(list(pdf["cv"]), dtype=np.float64)
            # encode from the fold-order-exact rounded unit values —
            # same doubles the oracle quantizes, so codes match bit for
            # bit; in a persisted-index deployment this IS the uint8
            # column (sq8_build_index materializes it)
            um = _np_unit_rounded(raw)
            codes = np.zeros_like(um)
            codes[:, nz] = np.floor(
                (um[:, nz] - mn[nz]) / span[nz] * 255.0 + 0.5
            )
            deq = mn + codes * scale
            nids = pdf["neighbor_id"].to_numpy()
            adc_all = qn @ deq.T
            adc_all = np.sign(adc_all) * np.floor(np.abs(adc_all) * 1e6 + 0.5) / 1e6
            for qi, qid in enumerate(q_ids):
                adc = adc_all[qi]
                heap = heaps[int(qid)]
                floor = heap[0][0] if len(heap) >= keep else -2.0
                for ci in np.nonzero(adc >= floor)[0]:
                    nid = int(nids[ci])
                    if nid == qid:
                        continue
                    item = (float(adc[ci]), -nid)
                    if len(heap) < keep:
                        heapq.heappush(heap, item)
                    elif item > heap[0]:
                        heapq.heapreplace(heap, item)
        out = [
            (int(qid), -neg_nid, adc_r)
            for qid, heap in heaps.items()
            for adc_r, neg_nid in heap
        ]
        yield pd.DataFrame(
            out, columns=["vec_id", "neighbor_id", "adc"]
        ).astype(
            {"vec_id": "int64", "neighbor_id": "int64", "adc": "float64"}
        )

    candidates = corpus.mapInPandas(
        score_partition,
        schema="vec_id bigint, neighbor_id bigint, adc double",
    )
    adc_cut = top_k_per_group(
        candidates,
        partition_by=["vec_id"],
        order_by=[F.col("adc").desc(), F.col("neighbor_id").asc()],
        k=keep,
    )
    return _adc_exact_rerank(
        embeddings.sparkSession, adc_cut, qrows, embeddings,
        id_col, vec_col, k, round_scale, cand_bound=len(qrows) * keep,
    )

def sq8_build_index(
    embeddings: DataFrame,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    packed: bool = True,
    n_lists: int | None = None,
    centroids=None,
    seed: int = 42,
    train_sample: int = 2048,
):
    """Materialize the SQ8 physical layout: the corpus encoded to
    ``{index_path}/codes`` as (vec_id, codes array<smallint>) — one
    byte of information per dimension — plus the per-dimension
    ``{index_path}/minmax`` sidecar (dim rows). This is where the
    bandwidth claim becomes physical: :func:`sq8_search` scans ONLY
    the codes files (the float column never appears in its candidate
    stage), the way :func:`ivf_build_index` makes IVF's pruning
    physical. Encoding is one Arrow pass (the fold-order-exact rounded
    unit values + per-dim affine quantization — no shuffle beyond the
    write) after the one partial-aggregate min/max training scan.
    Returns (mn, mx).

    ``packed=True`` (the default) stores each vector's 0..255 codes as
    ONE ``binary`` cell — exactly ``dim`` bytes of payload, decoded in
    the scan by a single ``np.frombuffer`` over the Arrow batch
    instead of per-element list materialization. On DISK parquet's
    bit-packing makes the two layouts near-identical (measured at
    sf0.001); the packed win is decode/transfer cost, not compression.
    ``packed=False`` writes ``array<smallint>`` for layouts a plain
    SQL engine should unnest. :func:`sq8_search` auto-detects either.

    ``n_lists`` COMPOSES the two pruning axes: the codes additionally
    carry an IVF coarse-list assignment and write PARTITIONED BY
    ``list_id`` (centroids to ``{index_path}/centroids`` as in
    :func:`ivf_build_index`), so a probed :func:`sq8_search` reads
    ``n_probe/n_lists`` of the FILES and an eighth of the BYTES —
    IVF prunes what is read, SQ8 shrinks what is scanned.
    ``centroids`` overrides the seeded k-means trainer exactly as in
    ``ivf_build_index``.
    """
    import numpy as np

    mn, mx = _sq8_dim_stats(embeddings, id_col, vec_col)
    span = mx - mn
    nz = span > 0
    dim = len(mn)

    import pyarrow as pa

    _sidecar_write(
        f"{index_path}/minmax",
        {
            "pos": list(range(dim)),
            "mn": [float(v) for v in mn],
            "mx": [float(v) for v in mx],
        },
        pa.schema([("pos", pa.int32()), ("mn", pa.float64()), ("mx", pa.float64())]),
    )

    cents = None
    if n_lists is not None:
        cents = (
            np.asarray(centroids, dtype=np.float64)
            if centroids is not None
            else _train_centroids(embeddings, vec_col, n_lists, seed, train_sample)
        )
        _write_centroid_sidecar(f"{index_path}/centroids", cents)

    def encode(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            raw = np.array(list(pdf[vec_col]), dtype=np.float64)
            um = _np_unit_rounded(raw)
            codes = np.zeros_like(um)
            codes[:, nz] = np.floor(
                (um[:, nz] - mn[nz]) / span[nz] * 255.0 + 0.5
            )
            u8 = codes.astype("uint8")
            out = {
                "vec_id": pdf[id_col].to_numpy(),
                "codes": (
                    [row.tobytes() for row in u8]
                    if packed
                    else list(u8.astype("int16"))
                ),
            }
            if cents is not None:
                # the ivf_build_index assignment: argmax rounded dot of
                # the np-normalized vector, first-index = lowest list
                m = raw / np.maximum(
                    np.linalg.norm(raw, axis=1, keepdims=True), 1e-12
                )
                out["list_id"] = _nround(m @ cents.T).argmax(axis=1).astype("int32")
            yield pd.DataFrame(out)

    schema = (
        "vec_id bigint, codes binary"
        if packed
        else "vec_id bigint, codes array<smallint>"
    )
    writer = (
        embeddings.select(
            F.col(id_col).cast("bigint").alias(id_col),
            F.col(vec_col).cast("array<double>").alias(vec_col),
        )
        .mapInPandas(
            encode,
            schema=schema + (", list_id int" if cents is not None else ""),
        )
        .write.mode("overwrite")
    )
    if cents is not None:
        writer = writer.partitionBy("list_id")
    writer.parquet(f"{index_path}/codes")
    return mn, mx


def _auto_rerank_budget(n_scanned: int, floor: int = 64) -> int:
    """The SHARED corpus-scaled exact-rerank budget of every quantized
    scan, parameterized by what the caller actually SCANS:
    ``max(floor, ceil(n/16))`` capped at 8192 (the executor-memory
    bound). The floor is quantizer-specific: the PQ paths —
    ``pq_topk`` AND ``pq_search`` — pass 128 because the coarse m-code
    ADC genuinely needs the wider exact window (the r10 recall
    regression), so the two resolve IDENTICAL budgets at the same
    scanned count and their row-for-row parity holds at
    ``rerank=None`` too; the SQ8 paths keep the 64 default (their
    near-exact 8-bit ADC is budget-insensitive — the r13 sweep).
    ``pq_search``/``sq8_search`` pass the PROBED codes count, so
    composing with IVF keeps the budget bounded by the probed pool,
    not the corpus."""
    import math

    return max(floor, min(math.ceil(n_scanned / 16), 8192))


def sq8_search(
    spark,
    index_path: str,
    queries: DataFrame,
    embeddings: DataFrame,
    k: int = 5,
    rerank: int | None = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_scale: int = 8,
    max_queries: int = 10_000,
    n_probe: int | None = None,
) -> DataFrame:
    """Search a materialized SQ8 index (:func:`sq8_build_index`): the
    candidate stage scans ONLY (vec_id, codes) — 8x less bandwidth
    than the float64 corpus — dequantizes per Arrow batch against the
    broadcast minmax sidecar and heaps the global top-(k+rerank)
    rounded dequantized dots per query. Survivors then re-rank EXACTLY
    against ``embeddings`` (the float table), which is touched only
    via a BROADCAST join on the |queries| x (k+rerank) candidate ids —
    full-width vectors are read for candidates, never the corpus. The
    exact re-rank runs JVM-side (codegen fold dot products), so the
    whole search has exactly one Python stage: the byte scan.

    On an IVF-composed index (``sq8_build_index(n_lists=...)``) the
    probe set prunes BOTH axes: ``list_id IN (probes)`` is a partition
    filter (non-probed directories never open, as in ``ivf_search``)
    and what IS read is bytes — ``n_probe/n_lists`` of the files at an
    eighth of the width. ``n_probe`` defaults to 4 there; probing
    every list reproduces the flat-index answer exactly.

    ``rerank=None`` applies the PQ-style corpus-scaled budget
    (``pq_topk``'s recipe, scoped to what this search actually scans):
    ``max(64, ceil(n_scanned / 16))`` capped at 8192, where
    ``n_scanned`` is the row count of the PROBED codes frame (the
    partition-pruned scan — one cheap count of a codes-only read), so
    the exact window grows with the candidate pool the way PQ's must.
    Note the scan is pruned to the probe UNION across all queries: a
    large diverse query batch can union every list, making
    ``n_scanned`` the corpus — the budget follows what is READ, which
    upper-bounds every query's own candidate pool.
    Measured honestly (r13 sweep, SCALING.md): on this corpus SQ8's
    8-bit ADC orders nearly exactly, so recall is INSENSITIVE to the
    budget (32 vs 128 identical at every probe setting, 1x and 8x) —
    the recall knob for the composed search is ``n_probe``
    (4/16 -> 0.54, 8/16 -> 0.77, 10/16 -> 0.86-0.91, 12/16 -> 0.94
    across sf0.001..sf0.1 and 8x). The auto budget is the guard rail
    for corpora where per-dim quantization error is material (wider
    dynamic range per dimension), not a recall lever here; a pinned
    int keeps the call action-free and the oracle scale-stable.

    Matches :func:`sq8_topk` row for row at the same parameters — the
    codes are bit-identical by construction (property-pinned in
    tests) and the exact re-rank IS the same code
    (:func:`_adc_exact_rerank`), the way the physical IVF path equals
    its logical twin.

    CONTRACT: ``embeddings`` must be the SAME corpus the index was
    built from (the rerank joins survivors back by id) — a drifted
    float table silently re-scores candidates against different
    vectors; rebuild the index when the corpus changes, exactly as
    with ``ivf_build_index``.
    """
    import numpy as np

    mm = _sidecar_rows(f"{index_path}/minmax")
    dim = max(r["pos"] for r in mm) + 1
    mn = np.zeros(dim, dtype=np.float64)
    mx = np.zeros(dim, dtype=np.float64)
    for r in mm:
        mn[r["pos"]] = r["mn"]
        mx[r["pos"]] = r["mx"]
    scale = (mx - mn) / 255.0

    qrows = (
        queries.select(F.col(id_col), F.col(vec_col))
        .limit(max_queries + 1)
        .collect()
    )
    if len(qrows) > max_queries:
        raise ValueError(
            f"sq8_search: query set exceeds max_queries={max_queries}; "
            "tighten the queries DataFrame or raise the cap deliberately"
        )
    if not qrows:
        return spark.createDataFrame(
            [], "vec_id bigint, rank int, neighbor_id bigint, cos_sim double"
        )
    q_ids = np.array([r[0] for r in qrows], dtype=np.int64)
    qt = np.array([r[1] for r in qrows], dtype=np.float64)
    qn = _np_unit_rounded(qt)

    corpus = spark.read.parquet(f"{index_path}/codes")
    q_probes = None
    if "list_id" in corpus.columns:
        # IVF-composed index: probe like ivf_search — per-query
        # top-n_probe centroid lists (rounded dot, stable lowest-list
        # ties), the probe UNION pushed as a partition filter so
        # non-probed list directories never open
        if n_probe is None:
            n_probe = 4
        cents = _read_centroid_sidecar(f"{index_path}/centroids")
        qm = qt / np.maximum(np.linalg.norm(qt, axis=1, keepdims=True), 1e-12)
        q_probes = np.argsort(
            -_nround(qm @ cents.T), axis=1, kind="stable"
        )[:, :n_probe]
        probe_union = sorted({int(p) for row in q_probes for p in row})
        corpus = corpus.filter(F.col("list_id").isin(probe_union))
    elif n_probe is not None:
        raise ValueError(
            "sq8_search: n_probe given but the index has no list_id "
            "partitions — rebuild with sq8_build_index(n_lists=...)"
        )
    if rerank is None:
        # PQ-style corpus-scaled budget over what this search SCANS:
        # the probed codes frame (partition-pruned, codes-only — the
        # count never touches float vectors). See docstring for the
        # measured honesty note: a guard rail here, not a recall lever.
        rerank = _auto_rerank_budget(corpus.count())
    keep = k + rerank

    def score_partition(batches):
        import heapq

        import numpy as np
        import pandas as pd

        heaps = {int(qid): [] for qid in q_ids}
        probe_sets = (
            None if q_probes is None
            else [set(map(int, row)) for row in q_probes]
        )
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cells = list(pdf["codes"])
            if isinstance(cells[0], (bytes, bytearray)):  # packed layout
                codes = np.frombuffer(
                    b"".join(cells), dtype=np.uint8
                ).reshape(len(cells), -1).astype(np.float64)
            else:
                codes = np.array(cells, dtype=np.float64)
            deq = mn + codes * scale
            nids = pdf["vec_id"].to_numpy()
            lids = pdf["list_id"].to_numpy() if probe_sets is not None else None
            adc_all = qn @ deq.T
            adc_all = np.sign(adc_all) * np.floor(np.abs(adc_all) * 1e6 + 0.5) / 1e6
            for qi, qid in enumerate(q_ids):
                adc = adc_all[qi]
                heap = heaps[int(qid)]
                floor = heap[0][0] if len(heap) >= keep else -2.0
                for ci in np.nonzero(adc >= floor)[0]:
                    if lids is not None and int(lids[ci]) not in probe_sets[qi]:
                        continue  # another query's probe, not this one's
                    nid = int(nids[ci])
                    if nid == qid:
                        continue
                    item = (float(adc[ci]), -nid)
                    if len(heap) < keep:
                        heapq.heappush(heap, item)
                    elif item > heap[0]:
                        heapq.heapreplace(heap, item)
        out = [
            (int(qid), -neg_nid, adc_r)
            for qid, heap in heaps.items()
            for adc_r, neg_nid in heap
        ]
        yield pd.DataFrame(
            out, columns=["vec_id", "neighbor_id", "adc"]
        ).astype(
            {"vec_id": "int64", "neighbor_id": "int64", "adc": "float64"}
        )

    candidates = corpus.mapInPandas(
        score_partition,
        schema="vec_id bigint, neighbor_id bigint, adc double",
    )
    cand_cut = top_k_per_group(
        candidates,
        partition_by=["vec_id"],
        order_by=[F.col("adc").desc(), F.col("neighbor_id").asc()],
        k=keep,
    )
    return _adc_exact_rerank(
        spark, cand_cut, qrows, embeddings, id_col, vec_col, k,
        round_scale, cand_bound=len(qrows) * keep,
    )
