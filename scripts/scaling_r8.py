#!/usr/bin/env python
"""8x scale-up check for the round-8 operator surface (SCALING.md
protocol): replicate the input tables 8x with shifted keys, write as
32 parquet files, and compare wall time at 1x vs 8x for

- apply_bpe        (tokenizer apply: distinct-word map + rejoin —
                    expected ~linear; the fold chain runs on the
                    word-vocabulary frame, which grows sub-linearly),
- mixture_by_token_budget (two-phase grouped cumsum: one corpus
                    shuffle, expected ~linear),
- scd2_merge       (current ⋈ updates full outer on the key: linear),
- blocked_fuzzy_join (block-local pairs: grows with within-block pair
                    density, never all-pairs).

Run AFTER any benchmark finishes (a concurrent bench skews timings).
Usage: python scripts/scaling_r8.py [sf_dir]  (default sf0.1)
Prints one JSON line; paste the numbers into SCALING.md.
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
from sahithi_metamorph_etl_spark.llm.bpe import apply_bpe, learn_bpe  # noqa: E402
from sahithi_metamorph_etl_spark.operators.linkage import blocked_fuzzy_join  # noqa: E402
from sahithi_metamorph_etl_spark.operators.sampling import (  # noqa: E402
    mixture_by_token_budget,
)
from sahithi_metamorph_etl_spark.operators.scd import scd2_init, scd2_merge  # noqa: E402


def replicate_8x(spark, sf_dir: str, table: str, id_col: str, out_dir: str) -> str:
    base = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    n = base.agg(F.max(id_col)).collect()[0][0] + 1
    rep = base
    for i in range(1, 8):
        rep = rep.unionByName(base.withColumn(id_col, F.col(id_col) + i * n))
    path = os.path.join(out_dir, table)
    rep.repartition(32).write.mode("overwrite").parquet(path)
    return path


def timed(fn):
    t0 = time.perf_counter()
    n = fn()
    return round(time.perf_counter() - t0, 2), n


def run_ops(spark, docs, customer, part):
    out = {}
    merges = learn_bpe(docs, n_merges=10)
    out["apply_bpe"], out["apply_bpe_rows"] = timed(
        lambda: apply_bpe(docs, merges).count()
    )
    src = (
        F.when(F.col("doc_id") % 3 == 0, "web")
        .when(F.col("doc_id") % 3 == 1, "books")
        .otherwise("code")
    )
    toks = F.size(F.split(F.trim(F.coalesce(F.col("text"), F.lit(""))), r"\s+")).cast(
        "bigint"
    )
    base = docs.select("doc_id", src.alias("source"), toks.alias("n_tokens"))
    out["mixture"], out["mixture_rows"] = timed(
        lambda: mixture_by_token_budget(
            base, "source", {"web": 0.6, "books": 0.3, "code": 0.1},
            total_budget=500_000, token_col="n_tokens",
        ).count()
    )
    dim = scd2_init(
        customer.select("c_custkey", "c_mktsegment", "c_acctbal"),
        ["c_custkey"], ["c_mktsegment", "c_acctbal"], dt.date(2025, 1, 1),
    )
    upd = customer.filter(F.col("c_custkey") % 2 == 0).select(
        "c_custkey",
        F.when(F.col("c_custkey") % 10 == 0, "RELOCATED")
        .otherwise(F.col("c_mktsegment")).alias("c_mktsegment"),
        F.col("c_acctbal"),
    )
    out["scd2_merge"], out["scd2_rows"] = timed(
        lambda: scd2_merge(
            dim, upd, ["c_custkey"], ["c_mktsegment", "c_acctbal"], dt.date(2025, 2, 1)
        ).count()
    )
    # SKU-prefix blocking (the parts_fuzzy_match design): raw p_name has
    # only 64 distinct values, so name-prefix blocking was MEASURED
    # quadratic per block — 38.6 s / 6.3M pairs at 1x, 100.7 s / 401M
    # (64x = duplicate-group^2) at 8x. The stable unique prefix keeps
    # blocks O(1); that anti-pattern measurement is recorded in
    # SCALING.md as the hot-block exhibit.
    p = part.select(
        "p_partkey",
        F.concat(
            F.substring(F.md5(F.col("p_partkey").cast("string")), 1, 8),
            F.lit(" "), F.col("p_name"),
        ).alias("sku_name"),
    )
    dirty = p.select(
        (F.col("p_partkey") + 50_000_000).alias("d_key"),
        F.concat(F.col("sku_name"), F.lit("x")).alias("d_name"),
    )
    out["fuzzy_join"], out["fuzzy_rows"] = timed(
        lambda: blocked_fuzzy_join(
            p, dirty, "sku_name", "d_name", max_distance=2, block_len=8
        ).count()
    )
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="scaling_r8")
    res = {"sf_dir": sf_dir}
    res["x1"] = run_ops(
        spark,
        spark.read.parquet(f"{sf_dir}/documents.parquet"),
        spark.read.parquet(f"{sf_dir}/customer.parquet"),
        spark.read.parquet(f"{sf_dir}/part.parquet"),
    )
    tmp = tempfile.mkdtemp(prefix="scale_r8_")
    try:
        docs8 = spark.read.parquet(replicate_8x(spark, sf_dir, "documents", "doc_id", tmp))
        cust8 = spark.read.parquet(replicate_8x(spark, sf_dir, "customer", "c_custkey", tmp))
        part8 = spark.read.parquet(replicate_8x(spark, sf_dir, "part", "p_partkey", tmp))
        res["x8"] = run_ops(spark, docs8, cust8, part8)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
