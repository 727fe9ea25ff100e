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


def test_priority_rotation_satisfies_policy():
    """The catalog's priority-50 must honor the documented rotation
    policy against the shipped external-check history: anchors always
    in, never-checked entries in, and no entry out more than two
    consecutive completed rounds (scripts/rotation_plan.py is the same
    audit as a CLI). A round that adds catalog entries or forgets to
    rotate fails here instead of silently starving an entry of external
    verification."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "rotation_plan",
        os.path.join(os.path.dirname(__file__), "..", "scripts", "rotation_plan.py"),
    )
    rp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rp)

    from sahithi_metamorph_etl_spark.queries import catalog

    errs, info = rp.audit(catalog._PRIORITY, list(catalog.all_queries()))
    assert not errs, errs
