"""Driver-contract smoke: __spark_entry__ exposes the three functions
with consistent keys and a working flagship entry."""

from __future__ import annotations

import importlib.util
import os

_ENTRY = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__spark_entry__.py")


def _load():
    spec = importlib.util.spec_from_file_location("__spark_entry__", _ENTRY)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_contract_shape():
    mod = _load()
    q, o = mod.queries(), mod.oracle_sql()
    assert len(q) >= 30
    assert set(o) <= set(q)
    # every oracle is non-trivial SQL
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in o.values())


def test_entry_runs(spark):
    mod = _load()
    df = mod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) == 7
