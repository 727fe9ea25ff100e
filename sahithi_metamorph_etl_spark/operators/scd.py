"""SCD2 (slowly changing dimension, type 2) merge.

The reference keeps append-only day-partitioned history in its legacy
layer (`DAY_DT` partitions — Metamorph-ETL's `load_to_legacy` tasks);
SCD2 is the warehouse-native representation of the same audit
requirement when consumers need AS-OF semantics per key rather than
full daily snapshots: each key carries interval-versioned rows
(effective_from, effective_to, is_current), and a day's update snapshot
closes changed rows and opens new versions.

SCALE SHAPE: one equi-join between the CURRENT slice and the update
snapshot on the key (broadcastable when the snapshot is small; AQE
decides), with the closed history passing through untouched via union —
history never reshuffles, no matter how many versions accumulate. The
changed/new/kept branches are produced in a SINGLE pass over the join
via an exploded array of row structs (no triple re-execution of the
join, no persist needed).

Determinism: pure function of its inputs; tracked-column comparison is
null-safe (`eqNullSafe`), so NULL->NULL is "unchanged" and NULL->value
is a change — the SQL `IS NOT DISTINCT FROM` semantics an oracle can
replay exactly.
"""

from __future__ import annotations

import datetime as dt
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_init(
    snapshot: DataFrame,
    key_cols: list[str],
    tracked_cols: list[str],
    as_of: dt.date,
    eff_from: str = "effective_from",
    eff_to: str = "effective_to",
    current_flag: str = "is_current",
) -> DataFrame:
    """Initial SCD2 load: every snapshot row becomes an open version
    effective from ``as_of``. The snapshot must be unique per key
    (duplicate keys would create parallel open versions; gate with
    ``validators.validate_unique`` upstream when the source is not
    trusted)."""
    return snapshot.select(
        *key_cols,
        *tracked_cols,
        F.lit(as_of).cast("date").alias(eff_from),
        F.lit(None).cast("date").alias(eff_to),
        F.lit(True).alias(current_flag),
    )


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    tracked_cols: list[str],
    as_of: dt.date,
    eff_from: str = "effective_from",
    eff_to: str = "effective_to",
    current_flag: str = "is_current",
    close_missing: bool = False,
) -> DataFrame:
    """Merge a day's update snapshot into an SCD2 dimension; returns
    the full new state.

    Per current row / update pair (full outer join on the key):

    - tracked attributes differ (null-safe) -> the current row closes
      at ``as_of`` and a new open version starts at ``as_of``;
    - identical -> the current row passes through (re-running the same
      snapshot is idempotent);
    - key only in ``dim`` -> unchanged, unless ``close_missing`` (then
      the key is treated as deleted and its row closes at ``as_of``);
    - key only in ``updates`` -> a new open version.

    Closed history rows pass through untouched. ``updates`` must be
    unique per key and contain ``key_cols + tracked_cols``; ``as_of``
    must not precede any open row's ``eff_from`` (a zero-length
    same-day re-version is representable but a BACKDATED merge is a
    caller error this operator cannot detect without an extra action).
    """
    if not tracked_cols:
        raise ValueError(
            "tracked_cols must be non-empty — a key-presence-only dimension "
            "has no change signal; model it with close_missing + inserts over "
            "at least one tracked attribute"
        )
    up = updates.select(
        *key_cols,
        *[F.col(t).alias(f"__u_{t}") for t in tracked_cols],
        F.lit(True).alias("__u_present"),
    )
    closed = dim.filter(~F.col(current_flag))
    current = dim.filter(F.col(current_flag)).select(
        *key_cols,
        *[F.col(t).alias(f"__c_{t}") for t in tracked_cols],
        F.col(eff_from).alias("__c_from"),
        F.lit(True).alias("__c_present"),
    )
    j = current.join(up, on=key_cols, how="full_outer")

    have_c = F.col("__c_present").isNotNull()
    have_u = F.col("__u_present").isNotNull()
    same = reduce(
        lambda x, y: x & y,
        [F.col(f"__c_{t}").eqNullSafe(F.col(f"__u_{t}")) for t in tracked_cols],
    )

    def row(tr_prefix: str, from_col, to_col, cur: bool):
        return F.struct(
            *[F.col(k).alias(k) for k in key_cols],
            *[F.col(f"{tr_prefix}{t}").alias(t) for t in tracked_cols],
            from_col.cast("date").alias(eff_from),
            to_col.cast("date").alias(eff_to),
            F.lit(cur).alias(current_flag),
        )

    keep = row("__c_", F.col("__c_from"), F.lit(None), True)
    close = row("__c_", F.col("__c_from"), F.lit(as_of), False)
    open_new = row("__u_", F.lit(as_of), F.lit(None), True)

    changed = have_c & have_u & ~same
    out = (
        j.select(
            F.explode(
                F.when(changed, F.array(close, open_new))
                .when(
                    have_c & ~have_u,
                    F.array(close) if close_missing else F.array(keep),
                )
                .when(~have_c, F.array(open_new))
                .otherwise(F.array(keep))
            ).alias("r")
        )
        .select("r.*")
    )
    return closed.select(*out.columns).unionByName(out)


def scd2_snapshot_asof(
    dim: DataFrame,
    as_of: dt.date,
    eff_from: str = "effective_from",
    eff_to: str = "effective_to",
) -> DataFrame:
    """The dimension AS OF a date: rows whose validity interval covers
    ``as_of`` (``eff_from <= as_of < eff_to``, open rows have NULL
    ``eff_to``). The read-side complement of ``scd2_merge`` — a
    point-in-time join feeds facts from this snapshot. Pure filter:
    predicate pushes to the scan, zero shuffle; at 100 TB pair it with
    a partition/Z-order layout on ``eff_from`` for pruning."""
    d = F.lit(as_of).cast("date")
    return dim.filter(
        (F.col(eff_from) <= d)
        & (F.col(eff_to).isNull() | (F.col(eff_to) > d))
    )
