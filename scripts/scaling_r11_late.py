#!/usr/bin/env python
"""r11 late-batch scale evidence.

(a) ``hard_negative_topk`` (100 queries, k=5) at 1x vs 8x corpus
(dim-rolled copies, scripts/scaling_ann.replicate_8x): the corpus-side
scan is the only thing that grows — the query matrix, label vector and
per-partition heaps are fixed — so wall should grow ~linearly with the
corpus (the exact-scan baseline's expected shape), never faster.

(b) ``jl_random_projection`` (64 -> 16) at 1x vs 8x: a zero-shuffle
plan-literal map; wall should grow sub-linearly to ~linearly with rows
and nothing else.

(c) ``kmeans_assign`` E-step at k = 8 / 256 / 2048 on the 8x corpus:
the r11 chunked-centroid path (256 per chunk, running best) keeps peak
memory at batch x 256 x dim for ANY k; wall should grow ~linearly in k
(8 chunks at k=2048) with no OOM — the SemDeDup-scale regime the chunk
rework exists for.

Usage: python scripts/scaling_r11_late.py [sf_dir]   (default sf0.1)
Prints one JSON line; paste into SCALING.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sahithi_metamorph_etl_spark.core.session import get_spark  # noqa: E402
from sahithi_metamorph_etl_spark.llm.clustering import kmeans_assign  # noqa: E402
from sahithi_metamorph_etl_spark.llm.projection import jl_random_projection  # noqa: E402
from sahithi_metamorph_etl_spark.llm.similarity import hard_negative_topk  # noqa: E402
from scripts.scaling_ann import replicate_8x  # noqa: E402


def timed_best(fn, n=3):
    best = None
    for _ in range(n):
        t0 = time.time()
        fn()
        el = round(time.time() - t0, 3)
        best = el if best is None else min(best, el)
    return best


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def run_surface(emb, nrows: int) -> dict:
    from sahithi_metamorph_etl_spark.llm.projection import rp_rerank_topk

    res: dict = {"rows": nrows}
    res["hard_negatives_sec"] = timed_best(
        lambda: noop(hard_negative_topk(emb, k=5, query_filter=F.col("vec_id") < 100))
    )
    res["random_projection_sec"] = timed_best(
        lambda: noop(jl_random_projection(emb, out_dim=16, in_dim=64))
    )
    res["rp_rerank_sec"] = timed_best(
        lambda: noop(rp_rerank_topk(
            emb, k=5, out_dim=32, oversample=8,
            query_filter=F.col("vec_id") < 100, in_dim=64,
        ))
    )
    return res


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="scaling-r11-late")
    work = tempfile.mkdtemp(prefix="scale_r11_late_")
    try:
        emb1 = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        n1 = emb1.count()
        path8 = replicate_8x(spark, sf_dir, work)
        emb8 = spark.read.parquet(path8)
        n8 = emb8.count()

        r1 = run_surface(emb1, n1)
        r8 = run_surface(emb8, n8)

        # (c) E-step wall vs k on the 8x corpus; centroids = first k
        # vectors (values don't matter for cost, only k x dim size)
        seed = [r["embedding"] for r in emb1.limit(2048).collect()]
        kscan = {}
        for k in (8, 256, 2048):
            kscan[f"k{k}_sec"] = timed_best(
                lambda k=k: noop(kmeans_assign(emb8, seed[:k])), n=2
            )
        print(json.dumps({
            "sf_dir": sf_dir, "x1": r1, "x8": r8, "estep_8x_by_k": kscan,
        }))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
