"""Skew mitigation: salted joins.

AQE's skew-join handling (on in core.session) splits oversized
partitions at runtime, but only for sort-merge joins and only after a
stage materializes. Salting is the plan-level fix when a handful of hot
keys dominate a shuffle join: the large side spreads each key over
``n_salts`` sub-keys, the small side is replicated ``n_salts`` times,
and the join runs on (key, salt) — hot keys now occupy ``n_salts``
tasks instead of one.

The salt must be DETERMINISTIC (re-run/retry stability, oracle
comparability): it is derived by hashing a caller-named high-cardinality
column on the large side — never ``rand()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_source_col: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``large ⋈ small`` on ``on`` with the hot-key shuffle
    spread over ``n_salts`` sub-partitions per key.

    ``salt_source_col``: a high-cardinality column of ``large`` (e.g. a
    line/sale id) hashed to pick the salt deterministically.
    Result == ``large.join(small, on, how)`` with the same columns.

    Only large-side-preserving joins are valid: the replicated small
    side would duplicate ITS unmatched rows under right/full/semi
    semantics, so those modes are rejected.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(f"salted_join supports inner/left joins, not {how!r}")
    salted_large = large.withColumn(
        SALT_COL, F.pmod(F.xxhash64(F.col(salt_source_col)), F.lit(n_salts)).cast("int")
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias(SALT_COL)
    replicated_small = small.select("*", salts)
    return salted_large.join(replicated_small, [*on, SALT_COL], how).drop(SALT_COL)
