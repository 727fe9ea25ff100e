"""Column profiling: per-column data-quality summary in ONE pass.

The reference's quality surface is a single uniqueness gate
(`utils.py:122-140`); real pipelines profile every landed dataset
(null rates, cardinalities, ranges) before trusting it — the Deequ /
dbt-test capability, expressed as one Spark aggregate.

Shape: a single groupBy-less aggregation computes every metric for
every column in one scan (Catalyst evaluates them all in one partial/
final agg pass; exact count(distinct) columns each add an expand —
bounded by the profiled column list, and the scan still happens once),
then the 1-row wide result is unpivoted driver-side into one row per
column. No shuffle beyond the single aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One row per column: (column_name, n_rows, n_nulls, n_distinct,
    min_value, max_value) — min/max rendered as strings so mixed-type
    frames unpivot into one typed result."""
    cols = cols or df.columns
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"profile_columns: unknown columns {missing}")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"__null_{c}"),
            F.count_distinct(F.col(c)).alias(f"__dist_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("__n").alias("n_rows"),
                F.col(f"__null_{c}").alias("n_nulls"),
                F.col(f"__dist_{c}").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_value"),
                F.col(f"__max_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(per_col).alias("p")).select("p.*")


def key_skew_profile(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Key-distribution diagnostic for join/agg planning — the
    "measure, don't guess" input to the salting decision
    (`operators.skew.salted_join`): one row with
    (n_rows, n_keys, max_key_rows, top_key, skew_ratio) where
    skew_ratio = max_key_rows / mean_key_rows. A ratio near 1 means a
    plain hash shuffle balances; a large ratio says the hot key
    dominates a shuffle partition and needs salting / AQE skew-join.

    Shape: one key-grouped count (the only fact-sized shuffle) + a
    1-row global aggregate; the top key is taken with
    ``max(struct(cnt, key))`` — deterministic tie-break (highest count,
    then lexicographically last key), no ranking window."""
    key_str = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    per_key = (
        df.select(key_str.alias("__k"))
        .groupBy("__k")
        .agg(F.count(F.lit(1)).alias("key_rows"))
    )
    agg = per_key.agg(
        F.sum("key_rows").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("key_rows").alias("max_key_rows"),
        F.max(F.struct(F.col("key_rows"), F.col("__k"))).alias("_top"),
    )
    from ..functions.money import dround

    return agg.select(
        "n_rows",
        "n_keys",
        "max_key_rows",
        F.col("_top.__k").alias("top_key"),
        dround(F.col("max_key_rows") * F.col("n_keys") / F.col("n_rows"), 4).alias("skew_ratio"),
    )


def equi_width_histogram(df: DataFrame, col: str, n_buckets: int = 10) -> DataFrame:
    """Equi-width histogram of a numeric column, entirely in-plan: the
    (min, max) range is a 1-row aggregate broadcast back onto the rows
    (crossJoin), so the whole histogram is ONE job — no driver-side
    min/max action re-running the upstream (the same no-mid-pipeline-
    action design as the customer mart's tier cutoffs).

    Returns (bucket, lo, hi, n_rows) for the non-empty buckets,
    bucket in [0, n_buckets-1]; the max value lands in the last bucket.
    NULLs are excluded. Shape: 1-row agg + broadcast + one
    bucket-keyed shuffle (n_buckets groups)."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    x = F.col(col).cast("double")
    rng = df.agg(
        F.min(x).alias("_lo"), F.max(x).alias("_hi")
    )
    width = (F.col("_hi") - F.col("_lo")) / n_buckets
    # degenerate range (all values equal): everything in bucket 0
    bucket = F.when(F.col("_hi") == F.col("_lo"), F.lit(0)).otherwise(
        F.least(
            F.floor((x - F.col("_lo")) / width).cast("int"), F.lit(n_buckets - 1)
        )
    )
    from ..functions.money import dround

    return (
        df.filter(x.isNotNull())
        .crossJoin(F.broadcast(rng))
        .select(bucket.alias("bucket"), "_lo", "_hi")
        .groupBy("bucket", "_lo", "_hi")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(
            "bucket",
            dround(F.col("_lo") + F.col("bucket") * (F.col("_hi") - F.col("_lo")) / n_buckets, 6).alias("lo"),
            dround(F.col("_lo") + (F.col("bucket") + 1) * (F.col("_hi") - F.col("_lo")) / n_buckets, 6).alias("hi"),
            "n_rows",
        )
    )


def quantile_histogram(
    df: DataFrame, col: str, n_buckets: int = 10, boundary_scale: int = 6
) -> DataFrame:
    """Equi-DEPTH (quantile-bucketed) histogram, in-plan and without a
    global sort: exact percentile boundaries come from ONE 1-row
    aggregate, broadcast back onto the rows; each row's bucket is the
    count of boundaries strictly below its value. Complements
    :func:`equi_width_histogram` (value-sliced) with population-sliced
    buckets — the skew view a partitioner cares about.

    Compared to the ntile() formulation this has no single-partition
    window sort (the 100 TB killer): the only fact-sized operation is
    the final bucket-keyed aggregate. The cost: ties that straddle a
    boundary all land in one bucket — bucket populations are n/k only
    up to tie mass, which is the honest semantics of value-based
    bucketing. Boundaries are rounded (``boundary_scale``) with the
    deterministic cross-engine rounding BEFORE comparison, so a 1-ulp
    interpolation difference between engines cannot flip a row at a
    boundary.

    Returns (bucket, n_rows, lo, hi) for non-empty buckets, bucket in
    [1, n_buckets]; lo/hi are the observed min/max within the bucket.
    NULLs are excluded."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    from ..functions.money import dround

    x = F.col(col).cast("double")
    probs = [i / n_buckets for i in range(1, n_buckets)]
    # ONE percentile aggregate for all k-1 boundaries (array form shares
    # a single value buffer; k-1 separate percentile() calls each build
    # their own copy of the value map — measured ~2x slower at sf0.1,
    # and the duplicated buffers grow with the data)
    bounds = df.agg(
        F.transform(
            F.percentile(x, F.array(*[F.lit(p) for p in probs])),
            lambda b: dround(b, boundary_scale),
        ).alias("_bs")
    )
    bucket = (
        F.lit(1)
        + F.size(F.filter(F.col("_bs"), lambda b: b < dround(x, boundary_scale)))
    ).cast("int")
    return (
        df.filter(x.isNotNull())
        .crossJoin(F.broadcast(bounds))
        .select(bucket.alias("bucket"), x.alias("_x"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("_x").alias("lo"),
            F.max("_x").alias("hi"),
        )
    )


def heavy_hitters_topk(
    df: DataFrame,
    col: str,
    k: int = 5,
    counters: int = 64,
) -> DataFrame:
    """Misra-Gries heavy hitters with EXACT verification — the third
    classic mergeable sketch next to HLL distinct and the percentile
    buffers: find the k most frequent values of ``col`` WITHOUT ever
    hash-shuffling the corpus by that key.

    Phase 1 (one pass, ZERO corpus shuffle): each partition maintains a
    Misra-Gries summary of ``counters`` counters (Arrow ``mapInPandas``;
    per-batch exact value_counts merged into the capped dict with the
    MG decrement — the mergeable-summaries merge op, Agarwal et al.).
    Guarantee: any value with global frequency > N/(counters+1) appears
    in the UNION of the partition summaries (missing from a summary
    bounds its partition frequency; summing the bounds gives the global
    one).

    Phase 2: the candidate set (<= partitions x counters rows, never
    collected) broadcast-joins back to the corpus for EXACT counts —
    map-side combine caps the shuffle at candidates-per-partition. The
    result is the exact top-k over candidates (count desc, value asc),
    each row carrying ``guaranteed = exact_count x (counters+1) >
    n_rows`` — rows where that holds are PROVABLY the true top values,
    so the sketch's answer is oracle-checkable even though the sketch
    state itself is partitioning-dependent.

    At 100 TB this is the skew-diagnosis / hot-key-discovery pass: the
    full groupBy alternative shuffles every distinct key; this shuffles
    ``partitions x counters`` candidate rows plus their combined counts.
    """
    if k < 1 or counters < k:
        raise ValueError("need counters >= k >= 1")

    spark = df.sparkSession
    src = df.select(F.col(col).alias("item"))

    # NULL is the classic hot key in skew diagnosis, so it competes as
    # a candidate like any value: counted via an explicit isna() sum (a
    # lone sentinel key — NaN floats do not hash equal across batches),
    # and exact-counted through a null-safe equi-join below.
    _NULL = object()

    def mg(batches):
        import pandas as pd

        state: dict = {}
        for pdf in batches:
            n_null = int(pdf["item"].isna().sum())
            if n_null:
                state[_NULL] = state.get(_NULL, 0) + n_null
            vc = pdf["item"].value_counts()
            for item, c in vc.items():
                state[item] = state.get(item, 0) + int(c)
            if len(state) > counters:
                vals = sorted(state.values(), reverse=True)
                dec = vals[counters]
                state = {i: c - dec for i, c in state.items() if c > dec}
        yield pd.DataFrame(
            {"item": [None if i is _NULL else i for i in state]}
        )

    item_type = src.schema["item"].dataType.simpleString()
    candidates = src.mapInPandas(mg, schema=f"item {item_type}").distinct()
    total = src.agg(F.count(F.lit(1)).alias("n_rows"))
    cand = F.broadcast(candidates).alias("cand")
    exact = (
        src.alias("src")
        .join(cand, F.col("src.item").eqNullSafe(F.col("cand.item")))
        .groupBy(F.col("cand.item").alias("item"))
        .agg(F.count(F.lit(1)).alias("exact_count"))
    )
    return (
        exact.orderBy(F.desc("exact_count"), F.asc("item"))
        .limit(k)
        .crossJoin(F.broadcast(total))
        .select(
            "item",
            "exact_count",
            "n_rows",
            (F.col("exact_count") * (counters + 1) > F.col("n_rows")).alias("guaranteed"),
        )
    )
