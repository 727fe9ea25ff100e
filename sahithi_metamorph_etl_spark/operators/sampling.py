"""Deterministic sampling & dataset splitting for training-data
pipelines.

Why not ``df.sample``/``sampleBy``: Spark's samplers draw from a
per-partition seeded RNG, so the selected rows change with the number
of partitions, with AQE coalescing, and across engines — a re-run of
the same pipeline on a differently-partitioned copy of the corpus
yields a DIFFERENT training set, and no external system can reproduce
the selection. Content-hash bucketing fixes all of that: each row's
fate is a pure function of its id and the seed.

Mechanism: ``bucket = substr(md5(seed || ':' || id), 1, 4)`` — 65536
uniform hex buckets, compared as STRINGS against hex thresholds.
String comparison on lowercase hex is identical in every engine
(Spark, DuckDB, Postgres, Python), which makes every operator here
oracle-checkable bit-for-bit, and lets a downstream system re-derive
membership without Spark. All JVM codegen — no UDFs, no shuffle;
assignment is a per-row projection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1 << 16  # 4 hex chars


def _hex_threshold(fraction: float) -> str:
    """Cumulative fraction -> 4-char lowercase hex bucket bound."""
    return format(min(int(fraction * _BUCKETS), _BUCKETS), "05x")[-4:] if fraction < 1.0 else "zzzz"
    # "zzzz" sorts after every hex char, i.e. +inf for string compare


def hash_bucket(id_col: Column, seed: str) -> Column:
    """The 4-hex-char deterministic bucket for a row id."""
    return F.substring(F.md5(F.concat(F.lit(seed), F.lit(":"), id_col.cast("string"))), 1, 4)


def o_hash_bucket(id_expr: str, seed: str) -> str:
    """DuckDB twin of :func:`hash_bucket` (oracle SQL fragment)."""
    return f"substr(md5('{seed}' || ':' || CAST({id_expr} AS varchar)), 1, 4)"


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    seed: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to exactly one named split, deterministically.

    ``weights`` maps split name -> fraction (must sum to ~1). The same
    (id, seed) always lands in the same split — across runs, engines,
    and repartitions — so train/test contamination cannot creep in when
    the corpus is re-processed. Declaration order of ``weights`` fixes
    the bucket ranges; iteration order of the dict is the contract.
    """
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1, got {total}")
    if any(w < 0 for w in weights.values()):
        raise ValueError("split weights must be non-negative")
    bucket = hash_bucket(F.col(id_col), seed)
    expr = None
    cum = 0.0
    for name, w in weights.items():
        cum += w
        cond = bucket < F.lit(_hex_threshold(cum))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    # float round-down on the last threshold could leave a sliver: fold
    # it into the final split
    last = list(weights)[-1]
    return df.withColumn(split_col, expr.otherwise(F.lit(last)))


def o_hash_split(id_expr: str, weights: dict[str, float], seed: str = "split") -> str:
    """DuckDB CASE expression mirroring :func:`hash_split` exactly."""
    b = o_hash_bucket(id_expr, seed)
    parts, cum = [], 0.0
    for name, w in weights.items():
        cum += w
        parts.append(f"WHEN {b} < '{_hex_threshold(cum)}' THEN '{name}'")
    last = list(weights)[-1]
    return "CASE " + " ".join(parts) + f" ELSE '{last}' END"


def select_by_token_budget(
    df: DataFrame,
    budget: int,
    token_col: str,
    group_col: str | None = None,
    order_by: list[Column] | None = None,
    id_col: str = "doc_id",
    cum_col: str = "cum_tokens",
) -> DataFrame:
    """Greedy corpus curation under a token budget: order documents by
    priority (default: id), keep while the running token total per
    group stays <= ``budget``. A document that would overflow the
    budget is dropped entirely (no partial documents). ``id_col`` is
    the deterministic tie-breaker, so the selected set is reproducible.

    The standard "top quality docs until the per-language budget
    fills" step of training-mix construction. Since r8 the running sum
    is ``operators.windows.ranged_prefix_sum`` (range-partitioned
    two-phase), not a per-group window partition — a language at
    corpus scale would otherwise move through ONE task (and
    ``group_col=None`` would be an unpartitioned global window).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    from .windows import ranged_prefix_sum

    order = list(order_by or []) + [F.col(id_col).asc()]
    part = [group_col] if group_col else []
    return ranged_prefix_sum(df, part, order, token_col, out_col=cum_col).filter(
        F.col(cum_col) <= budget
    )


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str,
    id_col: str,
    seed: str = "sample",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum downsampling (e.g. language rebalancing
    in a corpus: keep 100% of low-resource languages, 10% of English).

    Keeps a row iff its hash bucket falls under its stratum's
    threshold. Unlike ``df.sampleBy`` the selection is a pure function
    of (id, seed) — partitioning-independent and reproducible. Strata
    absent from ``fractions`` use ``default_fraction``.
    """
    for k, v in fractions.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"fraction for stratum {k!r} must be in [0,1], got {v}")
    bucket = hash_bucket(F.col(id_col), seed)
    thr = None
    for name, frac in fractions.items():
        cond = F.col(strata_col) == name
        t = F.lit(_hex_threshold(frac))
        thr = F.when(cond, t) if thr is None else thr.when(cond, t)
    thr = F.lit(_hex_threshold(default_fraction)) if thr is None else thr.otherwise(
        F.lit(_hex_threshold(default_fraction))
    )
    return df.filter(bucket < thr)


def o_stratified_sample(
    id_expr: str,
    strata_expr: str,
    fractions: dict[str, float],
    seed: str = "sample",
    default_fraction: float = 0.0,
) -> str:
    """DuckDB WHERE fragment mirroring :func:`stratified_sample`."""
    b = o_hash_bucket(id_expr, seed)
    whens = " ".join(
        f"WHEN '{name}' THEN '{_hex_threshold(frac)}'" for name, frac in fractions.items()
    )
    return f"{b} < (CASE {strata_expr} {whens} ELSE '{_hex_threshold(default_fraction)}' END)"


def mixture_by_token_budget(
    df: DataFrame,
    source_col: str,
    weights: dict[str, float],
    total_budget: int,
    token_col: str,
    id_col: str = "doc_id",
    seed: str = "mixture",
    cum_col: str = "cum_tokens",
) -> DataFrame:
    """Training-mix construction: split ``total_budget`` tokens across
    sources by weight (``budget_s = round(total_budget * w_s / Σw)``)
    and greedily fill each source's share in deterministic
    ``md5(seed:id)`` order — "60% web, 30% books, 10% code" as one
    operator. Documents from sources not in ``weights`` are dropped;
    a document that would overflow its source's budget is dropped
    entirely (no partial documents), same contract as
    :func:`select_by_token_budget`.

    SCALE: per-source running totals come from
    ``operators.windows.bucketed_prefix_sum`` (md5-prefix bucketed
    two-phase), NOT a per-source window partition — a 100 TB corpus
    with three sources would otherwise funnel a third of the corpus
    through one task.
    """
    if total_budget <= 0:
        raise ValueError("total_budget must be positive")
    if not weights or any(w < 0 for w in weights.values()) or sum(weights.values()) <= 0:
        raise ValueError("weights must be non-empty, non-negative, positive-sum")
    from .windows import bucketed_prefix_sum

    total_w = sum(weights.values())
    budgets = {s: int(round(total_budget * w / total_w)) for s, w in weights.items()}
    key = F.md5(
        F.concat(F.lit(seed), F.lit(":"), F.col(id_col).cast("string"))
    )
    d = df.withColumn("__k", key)
    c = bucketed_prefix_sum(d, [source_col], "__k", id_col, token_col, cum_col)
    budget_expr = None
    for s, b in budgets.items():
        cond = F.col(source_col) == s
        budget_expr = (
            F.when(cond, b) if budget_expr is None else budget_expr.when(cond, b)
        )
    budget_expr = budget_expr.otherwise(F.lit(-1))  # unknown source: always dropped
    return c.filter(F.col(cum_col) <= budget_expr).drop("__k")
