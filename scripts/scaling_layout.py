#!/usr/bin/env python
"""8x scale-up check for the round-7 layout/packing surface (SCALING.md
protocol):

- write_zordered: replicate `orders` 8x (shifted o_orderkey, same
  custkey/price distributions), write the Morton-clustered layout at 1x
  and 8x, and record wall time plus the PRUNING FRACTION
  (admitted_groups / n_groups from parquet footers) for a bottom-5%
  range predicate on each clustered column. The fraction — not the
  absolute group count — is the scale-invariant: a layout that prunes
  ~X% of row groups at 1x should prune ~X% at any size.
- pack_sequences: replicate `documents` 8x (shifted doc_id) and compare
  wall time 1x vs 8x. The operator's global prefix sum is two-phase
  (bucketed cumsums + a 256-row offset window), so the corpus never
  passes through a SinglePartition exchange — wall time should scale
  near-linearly with rows, not superlinearly.

Run AFTER any benchmark finishes (a concurrent bench skews timings).
Usage: python scripts/scaling_layout.py [sf_dir]  (default sf0.1)
Prints one JSON line; paste the numbers into SCALING.md.
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
from sahithi_metamorph_etl_spark.llm.chunking import pack_sequences  # noqa: E402
from sahithi_metamorph_etl_spark.operators.layout import (  # noqa: E402
    parquet_pruning_stats,
    write_zordered,
)


def _zorder_trial(spark, orders_path: str, root: str, label: str) -> dict:
    orders = spark.read.parquet(orders_path).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    b = orders.agg(
        F.min("o_custkey").alias("ck_lo"), F.max("o_custkey").alias("ck_hi"),
        F.min("o_totalprice").alias("tp_lo"), F.max("o_totalprice").alias("tp_hi"),
    ).collect()[0]
    t0 = time.perf_counter()
    zpath = write_zordered(
        orders, f"{root}/z_{label}", ["o_custkey", "o_totalprice"],
        n_files=32, block_size_bytes=256 * 1024,
    )
    write_s = round(time.perf_counter() - t0, 2)
    out = {"write_s": write_s}
    for col, lo, hi in (
        ("o_custkey", float(b["ck_lo"]), b["ck_lo"] + 0.05 * (b["ck_hi"] - b["ck_lo"])),
        ("o_totalprice", float(b["tp_lo"]), b["tp_lo"] + 0.05 * (b["tp_hi"] - b["tp_lo"])),
    ):
        st = parquet_pruning_stats(zpath, col, lo, hi)
        out[f"admitted_frac_{col}"] = round(st["admitted_groups"] / st["n_groups"], 3)
        out[f"n_groups_{col}"] = st["n_groups"]
    return out


def _pack_trial(spark, docs_path: str) -> float:
    docs = spark.read.parquet(docs_path)
    # warm once, then best-of-2
    pack_sequences(docs, budget=512).write.format("noop").mode("overwrite").save()
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        pack_sequences(docs, budget=512).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 2)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="scaling-layout")
    root = tempfile.mkdtemp(prefix="scaling_layout_")
    try:
        # 8x orders: shifted o_orderkey keeps keys unique; custkey/price
        # distributions (what the z-order clusters on) are unchanged
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        n = orders.count()
        shifted = [
            orders.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * 10 * n))
            for i in range(8)
        ]
        big_orders = shifted[0]
        for s in shifted[1:]:
            big_orders = big_orders.unionByName(s)
        big_orders_path = f"{root}/orders8x"
        big_orders.repartition(32).write.parquet(big_orders_path)

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        nd = docs.count()
        dshift = [
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10 * nd))
            for i in range(8)
        ]
        big_docs = dshift[0]
        for s in dshift[1:]:
            big_docs = big_docs.unionByName(s)
        big_docs_path = f"{root}/documents8x"
        big_docs.repartition(32).write.parquet(big_docs_path)

        result = {
            "sf_dir": sf_dir,
            "orders_rows_1x": n,
            "docs_rows_1x": nd,
            "zorder_1x": _zorder_trial(spark, f"{sf_dir}/orders.parquet", root, "1x"),
            "zorder_8x": _zorder_trial(spark, big_orders_path, root, "8x"),
            "pack_1x_s": _pack_trial(spark, f"{sf_dir}/documents.parquet"),
            "pack_8x_s": _pack_trial(spark, big_docs_path),
        }
        print(json.dumps(result))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
