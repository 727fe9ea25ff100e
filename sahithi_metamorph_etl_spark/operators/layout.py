"""Physical layout operators: Z-order (Morton) clustering for
multi-column scan pruning.

Parquet scans prune ROW GROUPS by min/max statistics. A file sorted by
one column prunes range predicates on that column only; a Z-ORDERED
layout interleaves the bits of several columns into one clustering key,
so row groups stay "cubic" in the value space and min/max stats prune
selective predicates on ANY of the participating columns. This is the
standard lakehouse technique (Delta/Iceberg `OPTIMIZE ZORDER BY`)
re-expressed as a plain DataFrame transform + ordered parquet write —
at 100 TB it turns full-table scans for secondary-column predicates
into reads of a few percent of the row groups.

Everything is JVM-side expression arithmetic (shift/mask/sum) — no UDF,
no Python in the path; the min/max normalization bounds come from a
1-row aggregate broadcast back onto the plan (the same
no-mid-plan-driver-action discipline as the histogram operators).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZKEY_COL = "__zkey"


def _normalize(c: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Map a numeric column onto [0, 2^bits) by min/max range scaling
    (nulls -> 0: they cluster together at the low corner)."""
    top = (1 << bits) - 1
    scaled = (c.cast("double") - lo) / F.when(hi != lo, hi - lo).otherwise(F.lit(1.0))
    return F.coalesce(
        F.least(F.floor(scaled * top).cast("bigint"), F.lit(top)), F.lit(0)
    )


def zorder_key(cols: list[Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of pre-normalized integer
    columns into one Morton key (pure shift/mask expression tree; for
    k columns the key uses k*bits bits, so k*bits must be <= 62)."""
    k = len(cols)
    if k < 2:
        raise ValueError("zorder needs at least 2 columns")
    if k * bits > 62:
        raise ValueError(f"{k} columns x {bits} bits exceeds a bigint key")
    key = F.lit(0).cast("bigint")
    for b in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c, b).bitwiseAND(F.lit(1))
            key = key + F.shiftleft(bit, b * k + j)
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 32,
    bits: int = 16,
    block_size_bytes: int | None = None,
) -> str:
    """Write ``df`` as parquet clustered by the Z-order key of ``cols``:
    range-partition on the key (each FILE owns a key range), sort within
    partitions (each ROW GROUP owns a sub-range), drop the key. Scans
    with a selective predicate on any of ``cols`` then prune at both
    granularities via parquet min/max stats.

    ``block_size_bytes`` caps the parquet row-group size (finer groups =
    finer pruning; production default 128 MB is right for clusters,
    tests shrink it to get several groups per file).
    """
    bounds = df.agg(
        *[
            f
            for c in cols
            for f in (
                F.min(F.col(c).cast("double")).alias(f"__lo_{c}"),
                F.max(F.col(c).cast("double")).alias(f"__hi_{c}"),
            )
        ]
    )
    with_bounds = df.crossJoin(F.broadcast(bounds))
    normalized = [
        _normalize(F.col(c), F.col(f"__lo_{c}"), F.col(f"__hi_{c}"), bits) for c in cols
    ]
    keyed = with_bounds.withColumn(ZKEY_COL, zorder_key(normalized, bits)).drop(
        *[f"__lo_{c}" for c in cols], *[f"__hi_{c}" for c in cols]
    )
    writer = (
        keyed.repartitionByRange(n_files, ZKEY_COL)
        .sortWithinPartitions(ZKEY_COL)
        .drop(ZKEY_COL)
        .write.mode("overwrite")
    )
    if block_size_bytes is not None:
        writer = writer.option("parquet.block.size", block_size_bytes)
    writer.parquet(path)
    return path


def parquet_pruning_stats(path: str, col: str, lo: float, hi: float) -> dict:
    """How much of the parquet layout a [lo, hi] predicate on ``col``
    could prune, from footer min/max stats alone (no Spark job): returns
    {n_files, n_groups, admitted_files, admitted_groups}. A row group is
    ADMITTED when its [min, max] intersects the predicate range.

    Recurses into partitioned layouts (``part=.../x.parquet``) so the
    warehouse's partitionBy output audits the same way as flat dirs; an
    empty glob raises instead of returning silent zero-counts (a typo'd
    path must never read as "perfectly pruned")."""
    import glob as _glob

    import pyarrow.parquet as pq

    files = sorted(_glob.glob(f"{path}/**/*.parquet", recursive=True))
    if not files:
        raise FileNotFoundError(f"no parquet files under {path}")
    n_files = n_groups = admitted_files = admitted_groups = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        if col not in idx:
            raise KeyError(f"column {col} not in {f}")
        n_files += 1
        file_admitted = False
        for g in range(md.num_row_groups):
            n_groups += 1
            st = md.row_group(g).column(idx[col]).statistics
            if st is None or not st.has_min_max:
                admitted_groups += 1  # no stats -> cannot prune
                file_admitted = True
                continue
            if float(st.max) >= lo and float(st.min) <= hi:
                admitted_groups += 1
                file_admitted = True
        admitted_files += int(file_admitted)
    return {
        "n_files": n_files,
        "n_groups": n_groups,
        "admitted_files": admitted_files,
        "admitted_groups": admitted_groups,
    }
