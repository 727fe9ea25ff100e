"""Query catalog: every operator/query the engine claims, as a named
entry with (a) a Spark DataFrame implementation taking (spark, sf_dir)
and (b) — where SQL-expressible — an equivalent DuckDB oracle SQL over
the same parquet tables. This is the driver's correctness surface
(`__spark_entry__.py` re-exports it) and doubles as the engine's
regression suite via tests/test_oracle_parity.py.

Column names are aliased identically on both sides: the driver's compare
sorts columns by name before hashing values.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class CatalogQuery:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None => rows-only check (non-SQL-expressible)
    doc: str = ""


_REGISTRY: dict[str, CatalogQuery] = {}

# submodules that register queries on import
_MODULES = (
    "relational",
    "marts_q",
    "recon_q",
    "llm_q",
    "events_q",
)


def register(name: str, oracle: str | None = None, doc: str = ""):
    def deco(fn):
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name}")
        _REGISTRY[name] = CatalogQuery(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def _load() -> None:
    for mod in _MODULES:
        importlib.import_module(f"{__package__}.{mod}")


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load()
    return {name: q.fn for name, q in _REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load()
    return {name: q.oracle for name, q in _REGISTRY.items() if q.oracle is not None}


def get_query(name: str) -> CatalogQuery:
    _load()
    return _REGISTRY[name]
