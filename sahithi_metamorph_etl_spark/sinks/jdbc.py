"""JDBC serving sink + schema-bootstrap DDL hook (reference S7/S9).

Reference: `ETL_Airflow/dags/tasks/utils.py:145-163` (`load_to_postgres`
— plain ``df.write.jdbc(url, table, mode, properties)``) and the
vendored Raptor `Raptor.py:41-57` (`_ensure_schema_exists` — a
driver-side psycopg2 ``CREATE SCHEMA IF NOT EXISTS`` before writes).

Spark-first redesign, with the scale knobs the reference leaves at
defaults:

- ``batchsize`` (rows per INSERT batch executed by each task; the
  default 1000 round-trips ~50x more than needed on a LAN-local DB);
- ``truncate=true`` with ``mode="overwrite"`` keeps the table's DDL
  (indexes, grants) instead of DROP+CREATE — the reference's overwrite
  silently drops indexes every run;
- ``numPartitions`` caps concurrent connections: a 1000-executor
  cluster writing with per-task connections is a connection-pool DoS
  on any Postgres; coalesce to a bounded writer count;
- the DDL hook goes through the JVM's ``java.sql.DriverManager`` (no
  psycopg2 dependency — the JDBC driver jar is already required for
  the write itself) and is injectable for tests/alternate drivers.

No database exists in this sandbox: the options builder and DDL
statement construction are pure and unit-tested; the end-to-end write
is exercised only when a reachable ``url`` is supplied.
"""

from __future__ import annotations

import re
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _check_ident(name: str, what: str) -> str:
    """Reject identifiers that would escape quoting in driver-side DDL
    (the reference interpolates ``schema`` raw into SQL — an injection
    the moment the value is configuration-controlled)."""
    if not _IDENT.match(name):
        raise ValueError(f"{what} {name!r} is not a plain SQL identifier")
    return name


def jdbc_options(
    url: str,
    table: str,
    user: str | None = None,
    password: str | None = None,
    driver: str = "org.postgresql.Driver",
    batchsize: int = 10_000,
    truncate: bool = False,
    num_partitions: int | None = 16,
    isolation_level: str = "READ_COMMITTED",
    **extra: str,
) -> dict[str, str]:
    """Pure builder for the JDBC DataSource option map (unit-testable
    without a database). ``num_partitions`` bounds concurrent writer
    connections; None leaves the DataFrame's partitioning in charge."""
    if batchsize <= 0:
        raise ValueError(f"batchsize must be positive, got {batchsize}")
    opts: dict[str, str] = {
        "url": url,
        "dbtable": table,
        "driver": driver,
        "batchsize": str(batchsize),
        "truncate": str(truncate).lower(),
        "isolationLevel": isolation_level,
    }
    if user is not None:
        opts["user"] = user
    if password is not None:
        opts["password"] = password
    if num_partitions is not None:
        if num_partitions <= 0:
            raise ValueError(f"num_partitions must be positive, got {num_partitions}")
        opts["numPartitions"] = str(num_partitions)
    opts.update({k: str(v) for k, v in extra.items()})
    return opts


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    **options,
) -> None:
    """Serving extract to a JDBC table (reference `utils.py:145-163`,
    call sites `ingestion_task.py:59-60`).

    ``mode="overwrite"`` + ``truncate=True`` preserves target DDL;
    otherwise Spark drops and re-creates the table. All kwargs flow
    through :func:`jdbc_options`.
    """
    opts = jdbc_options(url, table, **options)
    df.write.format("jdbc").options(**opts).mode(mode).save()


def ensure_schema(
    spark: SparkSession,
    schema: str,
    url: str | None = None,
    user: str | None = None,
    password: str | None = None,
    ddl_runner: Callable[[str], None] | None = None,
) -> str:
    """Schema-bootstrap DDL hook (reference `Raptor.py:41-57`):
    ``CREATE SCHEMA IF NOT EXISTS <schema>`` executed driver-side
    before the first write into a fresh database.

    ``ddl_runner`` injects the statement executor (tests, or a
    non-JDBC control plane); the default opens a one-shot JVM
    ``java.sql.DriverManager`` connection — same driver jar the write
    path already needs, no Python DB client dependency. Returns the
    statement executed.
    """
    stmt = f'CREATE SCHEMA IF NOT EXISTS {_check_ident(schema, "schema")}'
    if ddl_runner is not None:
        ddl_runner(stmt)
        return stmt
    if url is None:
        raise ValueError("ensure_schema needs a JDBC url when no ddl_runner is injected")
    jvm = spark._jvm  # driver-side only; never serialized to executors
    conn = jvm.java.sql.DriverManager.getConnection(url, user or "", password or "")
    try:
        st = conn.createStatement()
        try:
            st.execute(stmt)
        finally:
            st.close()
    finally:
        conn.close()
    return stmt
