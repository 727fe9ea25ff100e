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


@pytest.mark.skip(reason="integration: needs a reachable Postgres + driver jar "
                         "(the embedded round-trip below covers S4/S7 live against Derby)")
def test_serve_jdbc_end_to_end(spark):  # pragma: no cover
    wh = LayeredWarehouse("/tmp/wh")
    wh.serve_jdbc(spark.range(10), URL, "public.smoke", user="postgres", password="pw")


# ---- LIVE JDBC round-trip against embedded Derby ---------------------------
#
# Spark ships Derby jars on its classpath (for the Hive metastore), which
# makes a real in-JVM database available with zero extra dependencies:
# jdbc:derby:memory: runs entirely inside the driver/executor JVM. These
# tests exercise the ACTUAL JDBC write path (S7: batched INSERTs through
# the DataSource, overwrite mode, numPartitions cap) and the partitioned
# read path (S4: partitionColumn/bounds fan-out), not mocks.

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _derby_url(name: str) -> str:
    return f"jdbc:derby:memory:{name};create=true"


def test_jdbc_live_write_and_partitioned_read_roundtrip(spark):
    from pyspark.sql import functions as F

    from sahithi_metamorph_etl_spark.sinks.jdbc import write_jdbc
    from sahithi_metamorph_etl_spark.sources.readers import (
        jdbc_query_source,
        read_jdbc_partitioned,
    )

    url = _derby_url("roundtrip")
    df = spark.range(0, 100).select(
        F.col("id").cast("bigint").alias("k"),
        (F.col("id") % 7).cast("double").alias("v"),
        F.concat(F.lit("row"), F.col("id").cast("string")).alias("s"),
    )
    # S7: real write — batched inserts, bounded writer connections
    write_jdbc(df, url, "rt_table", mode="overwrite",
               driver=DERBY_DRIVER, batchsize=25, num_partitions=4)

    # S4: real partitioned read back (4 bound-ranged connections)
    props = {"driver": DERBY_DRIVER}
    back = read_jdbc_partitioned(
        spark, url, "rt_table", props,
        partition_column="k", lower_bound=0, upper_bound=100, num_partitions=4,
    )
    assert back.rdd.getNumPartitions() == 4
    got = sorted((r.k, r.v, r.s) for r in back.collect())
    want = sorted((r.k, r.v, r.s) for r in df.collect())
    assert got == want

    # append mode accumulates; overwrite+truncate resets without DROP
    write_jdbc(df, url, "rt_table", mode="append",
               driver=DERBY_DRIVER, num_partitions=2)
    assert read_jdbc_partitioned(spark, url, "rt_table", props).count() == 200
    write_jdbc(df.limit(10), url, "rt_table", mode="overwrite",
               driver=DERBY_DRIVER, truncate=True, num_partitions=1)
    assert read_jdbc_partitioned(spark, url, "rt_table", props).count() == 10


def test_jdbc_live_query_pushdown(spark):
    """S5 live: the wrapped query executes in the DATABASE; only its
    result crosses into Spark."""
    from pyspark.sql import functions as F

    from sahithi_metamorph_etl_spark.sinks.jdbc import write_jdbc
    from sahithi_metamorph_etl_spark.sources.readers import (
        jdbc_query_source,
        read_jdbc_partitioned,
    )

    url = _derby_url("pushdown")
    df = spark.range(0, 50).select(
        F.col("id").cast("bigint").alias("k"), (F.col("id") * 2).cast("bigint").alias("dbl")
    )
    write_jdbc(df, url, "pd_table", mode="overwrite",
               driver=DERBY_DRIVER, num_partitions=1)
    # Spark's JDBC writer creates case-sensitive (quoted) column names,
    # so the database-side query must quote them too
    q = jdbc_query_source('SELECT "k", "dbl" FROM pd_table WHERE "k" >= 40')
    out = read_jdbc_partitioned(spark, url, q, {"driver": DERBY_DRIVER})
    assert sorted(r.k for r in out.collect()) == list(range(40, 50))


def test_jdbc_live_ddl_hook_via_drivermanager(spark):
    """The DriverManager DDL path (S9) against a live embedded database.
    Derby has no CREATE SCHEMA IF NOT EXISTS, so the portable statement
    ensure_schema emits is exercised for construction + injection
    elsewhere; here the same one-shot-connection plumbing runs a
    Derby-dialect DDL and the created table is visible to a subsequent
    JDBC read — proving the JVM DriverManager path is real."""
    from sahithi_metamorph_etl_spark.sources.readers import read_jdbc_partitioned

    url = _derby_url("ddlhook")
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.createStatement()
        try:
            st.execute("CREATE TABLE ddl_made (k INT PRIMARY KEY, s VARCHAR(10))")
            st.execute("INSERT INTO ddl_made VALUES (1, 'a'), (2, 'b')")
        finally:
            st.close()
    finally:
        conn.close()
    out = read_jdbc_partitioned(spark, url, "ddl_made", {"driver": DERBY_DRIVER})
    assert sorted((r.K, r.S) for r in out.collect()) == [(1, "a"), (2, "b")]
