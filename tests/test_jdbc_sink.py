"""JDBC serving sink (S7) + schema-bootstrap hook (S9) tests.

No database exists in the sandbox, so these check the pure option
builder, the DDL statement construction via an injected runner, and the
serve_jdbc wiring (hook fires before the write) — the actual
``save()`` is integration-only (skip-marked)."""

from __future__ import annotations

import pytest

from sahithi_metamorph_etl_spark.sinks import jdbc as jdbc_sink
from sahithi_metamorph_etl_spark.sinks.jdbc import ensure_schema, jdbc_options
from sahithi_metamorph_etl_spark.sinks.warehouse import LayeredWarehouse

URL = "jdbc:postgresql://db:5432/meta_morph"


def test_jdbc_options_defaults_and_knobs():
    opts = jdbc_options(URL, "legacy.suppliers", user="u", password="p")
    assert opts["url"] == URL
    assert opts["dbtable"] == "legacy.suppliers"
    assert opts["driver"] == "org.postgresql.Driver"
    # scale knobs present by default: batched inserts, bounded writers
    assert opts["batchsize"] == "10000"
    assert opts["numPartitions"] == "16"
    assert opts["truncate"] == "false"

    opts = jdbc_options(URL, "t", batchsize=500, truncate=True, num_partitions=None)
    assert opts["batchsize"] == "500"
    assert opts["truncate"] == "true"
    assert "numPartitions" not in opts


@pytest.mark.parametrize("bad", [0, -1])
def test_jdbc_options_rejects_bad_batchsize(bad):
    with pytest.raises(ValueError):
        jdbc_options(URL, "t", batchsize=bad)


def test_ensure_schema_injected_runner(spark):
    ran = []
    stmt = ensure_schema(spark, "legacy", ddl_runner=ran.append)
    assert stmt == "CREATE SCHEMA IF NOT EXISTS legacy"
    assert ran == [stmt]


def test_ensure_schema_rejects_injection(spark):
    with pytest.raises(ValueError):
        ensure_schema(spark, "legacy; DROP TABLE x", ddl_runner=lambda s: None)


def test_serve_jdbc_runs_hook_then_write(spark, tmp_path, monkeypatch):
    order = []
    monkeypatch.setattr(
        jdbc_sink, "write_jdbc",
        lambda df, url, table, mode="append", **opts: order.append(("write", table, mode, opts)),
    )
    wh = LayeredWarehouse(str(tmp_path))
    df = spark.range(3)
    wh.serve_jdbc(
        df, URL, "legacy.suppliers",
        schema="legacy", user="u", password="p",
        ddl_runner=lambda s: order.append(("ddl", s)),
    )
    assert order[0] == ("ddl", "CREATE SCHEMA IF NOT EXISTS legacy")
    assert order[1][0] == "write" and order[1][1] == "legacy.suppliers"
    assert order[1][2] == "overwrite"
    # ddl_runner must not leak into the JDBC option map
    assert "ddl_runner" not in order[1][3]


@pytest.mark.skip(reason="integration: needs a reachable JDBC database + driver jar")
def test_serve_jdbc_end_to_end(spark):  # pragma: no cover
    wh = LayeredWarehouse("/tmp/wh")
    wh.serve_jdbc(spark.range(10), URL, "public.smoke", user="postgres", password="pw")
