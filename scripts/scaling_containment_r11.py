#!/usr/bin/env python
"""8x scale check for containment_pairs (asymmetric Broder containment).

Protocol = the r10 prefix-Jaccard one (SCALING.md "token-tagged"): each
of the 8 copies has EVERY whitespace token suffixed with "@i", so
within-copy shingles are preserved (pair output must grow exactly 8x)
while cross-copy shingles can never collide — verbatim replication
would instead hand every doc 7 perfect twins and measure an artificial
64x pair clique, a workload exact_dedup is the right operator for.

Writes 32 parquet files per corpus (the scan-parallel layout), warm +
best-of-3 with cache cleared per run (bench.py protocol — the op
persists its shingle index), and asserts the 8x pair count is exactly
8x the 1x count before reporting walls.

Usage: python scripts/scaling_containment_r11.py [sf_dir]  (default sf0.1)
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
from sahithi_metamorph_etl_spark.llm.dedup import containment_pairs  # noqa: E402

_SPARK = None


def timed_best(fn, n=3):
    best = None
    for _ in range(n):
        _SPARK.catalog.clearCache()
        t0 = time.time()
        fn()
        el = round(time.time() - t0, 3)
        best = el if best is None else min(best, el)
    _SPARK.catalog.clearCache()
    return best


def tag_tokens(docs, i: int):
    """Suffix every whitespace token with @i (JVM-only transform)."""
    toks = F.split(F.trim(F.coalesce(F.col("text"), F.lit(""))), r"\s+")
    tagged = F.array_join(
        F.transform(toks, lambda t: F.concat(t, F.lit(f"@{i}"))), " "
    )
    return docs.select(
        (F.col("doc_id") + 1_000_000 * i).alias("doc_id"),
        tagged.alias("text"),
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="scaling_containment_r11")
    global _SPARK
    _SPARK = spark
    work = tempfile.mkdtemp(prefix="scaling_containment_")
    res: dict = {"sf_dir": sf_dir}
    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        big = tag_tokens(docs, 0)
        for i in range(1, 8):
            big = big.unionByName(tag_tokens(docs, i))
        p1 = os.path.join(work, "documents_1x")
        p8 = os.path.join(work, "documents_8x")
        # 1x gets the SAME tagging (copy 0 alone) so tokenize cost per
        # doc is identical across scales
        tag_tokens(docs, 0).repartition(32).write.mode("overwrite").parquet(p1)
        big.repartition(32).write.mode("overwrite").parquet(p8)
        d1 = spark.read.parquet(p1)
        d8 = spark.read.parquet(p8)

        # the graded entry's parameters (queries/llm_q.py doc_containment_pairs)
        n1 = containment_pairs(d1, threshold=0.8).count()
        n8 = containment_pairs(d8, threshold=0.8).count()
        assert n8 == 8 * n1, f"tag protocol broken: {n8} != 8*{n1}"
        np8 = containment_pairs(d8, threshold=0.8, prefix=True).count()
        assert np8 == n8, f"prefix path disagrees at 8x: {np8} != {n8}"
        res["pairs_x1"], res["pairs_x8"] = n1, n8

        for d, tag in ((d1, "x1"), (d8, "x8")):
            for pfx, pname in ((False, "naive"), (True, "prefix")):
                def run():
                    containment_pairs(
                        d, threshold=0.8, prefix=pfx
                    ).write.format("noop").mode("overwrite").save()

                run()  # warm
                res[f"containment_{pname}_{tag}_sec"] = timed_best(run)
        print(json.dumps(res))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
