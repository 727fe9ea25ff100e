#!/usr/bin/env python
"""r11 scale evidence for (a) the SCD2 merge's history-independence
claim and (b) the new seeded k-means operator.

(a) customer_scd2_chain's docstring claims "the merge cost tracks the
CURRENT slice + snapshot, not accumulated history depth" — closed
rows pass through the merge as a shuffle-free union branch. Verify
empirically: merge one day of updates into a dimension carrying 1x vs
8x CLOSED history per key (identical current slice and snapshot).
Expectation: the full-outer-join shuffle volume is identical (same
current x updates), plan shuffle/join counts identical, and wall time
grows only by the extra pass-through scan+write of the bigger
history — far below 8x.

(b) kmeans_lloyd (k=8, 2 iterations) at 1x vs 8x embeddings
(dim-rolled copies, 32 files — scaling_ann.replicate_8x). Per
iteration cost is one scan (E-step, broadcast k x dim closure) plus a
k x dim map-side-reduced shuffle, so wall should grow sub-linearly
with the corpus on a parallel layout.

Usage: python scripts/scaling_scd2_kmeans.py [sf_dir]  (default sf0.1)
Prints one JSON line; paste into SCALING.md.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sahithi_metamorph_etl_spark.core.session import get_spark  # noqa: E402
from sahithi_metamorph_etl_spark.llm.clustering import kmeans_lloyd  # noqa: E402
from sahithi_metamorph_etl_spark.operators.plancheck import plan_summary  # noqa: E402
from sahithi_metamorph_etl_spark.operators.scd import scd2_init, scd2_merge  # noqa: E402
from scripts.scaling_ann import replicate_8x  # noqa: E402


def timed_best(fn, n=3):
    best = None
    for _ in range(n):
        t0 = time.time()
        fn()
        el = round(time.time() - t0, 3)
        best = el if best is None else min(best, el)
    return best


def dim_with_history(cust, depth: int):
    """SCD2 dimension: per key, ``depth`` CLOSED month-long versions
    (balance shifted so rows differ) followed by one open version."""
    cur = scd2_init(
        cust.select("c_custkey", "c_mktsegment", "c_acctbal"),
        ["c_custkey"], ["c_mktsegment", "c_acctbal"], dt.date(2025, 1, 1),
    )
    parts = [cur]
    for i in range(1, depth + 1):
        parts.append(
            cust.select(
                "c_custkey",
                "c_mktsegment",
                (F.col("c_acctbal") + F.lit(float(i))).alias("c_acctbal"),
                F.lit(dt.date(2024, ((12 - i) % 12) + 1, 1)).cast("date").alias("effective_from"),
                F.lit(dt.date(2024, ((13 - i) % 12) + 1, 1)).cast("date").alias("effective_to"),
                F.lit(False).alias("is_current"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="scaling_scd2_kmeans")
    res: dict = {"sf_dir": sf_dir}
    work = tempfile.mkdtemp(prefix="scaling_r11_")
    try:
        cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
        k = F.col("c_custkey")
        updates = cust.filter(k % 3 != 0).select(
            "c_custkey",
            F.when(k % 5 == 0, "MOVED").otherwise(F.col("c_mktsegment")).alias("c_mktsegment"),
            F.when(k % 4 == 0, F.col("c_acctbal") + 50.0)
            .otherwise(F.col("c_acctbal")).alias("c_acctbal"),
        )
        for depth, tag in ((1, "h1"), (8, "h8")):
            # materialize the dimension once (32 files) so the timed
            # merge reads a real layout, not an in-plan union
            path = os.path.join(work, f"dim_{tag}")
            dim_with_history(cust, depth).repartition(32).write.mode(
                "overwrite"
            ).parquet(path)
            dim = spark.read.parquet(path)
            res[f"scd2_{tag}_dim_rows"] = dim.count()

            merged = scd2_merge(
                dim, updates, ["c_custkey"], ["c_mktsegment", "c_acctbal"],
                dt.date(2025, 2, 1), close_missing=True,
            )
            ps = plan_summary(merged)
            res[f"scd2_{tag}_shuffles"] = ps.shuffles
            res[f"scd2_{tag}_smj"] = ps.sort_merge_joins

            def run():
                merged.write.format("noop").mode("overwrite").save()

            run()  # warm
            res[f"scd2_{tag}_merge_sec"] = timed_best(run)

        emb1 = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        emb8 = spark.read.parquet(replicate_8x(spark, sf_dir, work))
        for emb, tag in ((emb1, "x1"), (emb8, "x8")):
            def km():
                kmeans_lloyd(emb, k=8, n_iter=2).write.format("noop").mode(
                    "overwrite"
                ).save()

            km()  # warm
            res[f"kmeans_{tag}_sec"] = timed_best(km)
        print(json.dumps(res))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
