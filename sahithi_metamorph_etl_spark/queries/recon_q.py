"""Reconciliation queries (reference Q2-Q5, the Raptor capability).

Scenario: source = ``orders``; target = a deterministically perturbed
derivation of it (values changed on keys % 7 and % 11, rows dropped on
% 101, extra rows injected on % 103) — so the diff has known, non-empty
results on every scale factor. The same derivation is expressed in the
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.money import o_round
from ..reconcile import diff
from ..sources.readers import read_testdata
from .catalog import register

_COMPARE = ["o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"]

_TARGET_CTE = """
target AS (
    SELECT o_orderkey, o_custkey,
           CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1.5 ELSE o_totalprice END AS o_totalprice,
           o_orderdate,
           CASE WHEN o_orderkey % 11 = 0 THEN 'X-PERTURBED' ELSE o_orderpriority END AS o_orderpriority,
           o_orderstatus
    FROM orders WHERE o_orderkey % 101 <> 0
    UNION ALL
    SELECT o_orderkey + 10000000, o_custkey, o_totalprice, o_orderdate, o_orderpriority, o_orderstatus
    FROM orders WHERE o_orderkey % 103 = 0
)
""".strip()

_COMMON_CTE = """
common AS (
    SELECT s.o_orderkey,
           s.o_custkey      AS s1, t.o_custkey      AS t1,
           s.o_orderstatus  AS s2, t.o_orderstatus  AS t2,
           s.o_totalprice   AS s3, t.o_totalprice   AS t3,
           s.o_orderdate    AS s4, t.o_orderdate    AS t4,
           s.o_orderpriority AS s5, t.o_orderpriority AS t5
    FROM orders s JOIN target t ON s.o_orderkey = t.o_orderkey
)
""".strip()


def _perturbed_target(spark, sf_dir):
    o = read_testdata(spark, sf_dir, "orders")
    kept = o.filter(F.col("o_orderkey") % 101 != 0).select(
        "o_orderkey",
        "o_custkey",
        F.when(F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + 1.5)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        "o_orderdate",
        F.when(F.col("o_orderkey") % 11 == 0, F.lit("X-PERTURBED"))
        .otherwise(F.col("o_orderpriority"))
        .alias("o_orderpriority"),
        "o_orderstatus",
    )
    extra = o.filter(F.col("o_orderkey") % 103 == 0).select(
        (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
        "o_custkey",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
        "o_orderstatus",
    )
    return kept.unionByName(extra)


def _diff(spark, sf_dir):
    source = read_testdata(spark, sf_dir, "orders")
    return diff(source, _perturbed_target(spark, sf_dir), keys=["o_orderkey"], compare_cols=_COMPARE)


_COLMM_ORACLE = f"""
WITH {_TARGET_CTE},
{_COMMON_CTE},
m AS (
    SELECT 'o_custkey' AS column_name, count(*) FILTER (WHERE s1 IS DISTINCT FROM t1) AS n_mismatch, count(*) AS c FROM common
    UNION ALL SELECT 'o_orderstatus', count(*) FILTER (WHERE s2 IS DISTINCT FROM t2), count(*) FROM common
    UNION ALL SELECT 'o_totalprice', count(*) FILTER (WHERE s3 IS DISTINCT FROM t3), count(*) FROM common
    UNION ALL SELECT 'o_orderdate', count(*) FILTER (WHERE s4 IS DISTINCT FROM t4), count(*) FROM common
    UNION ALL SELECT 'o_orderpriority', count(*) FILTER (WHERE s5 IS DISTINCT FROM t5), count(*) FROM common
)
SELECT column_name, n_mismatch, {o_round('n_mismatch * 100.0 / c', 4)} AS pct_of_common FROM m
"""


@register("recon_column_mismatches", oracle=_COLMM_ORACLE,
          doc="Per-column mismatch counts + pct (Raptor Q3/Q5 summary)")
def recon_column_mismatches(spark, sf_dir):
    return _diff(spark, sf_dir).column_mismatches


_SUMMARY_ORACLE = f"""
WITH {_TARGET_CTE},
{_COMMON_CTE}
SELECT (SELECT count(*) FROM orders) AS source_total,
       (SELECT count(*) FROM target) AS target_total,
       (SELECT count(*) FROM common) AS common,
       (SELECT count(*) FROM orders s WHERE NOT EXISTS
            (SELECT 1 FROM target t WHERE t.o_orderkey = s.o_orderkey)) AS source_only,
       (SELECT count(*) FROM target t WHERE NOT EXISTS
            (SELECT 1 FROM orders s WHERE s.o_orderkey = t.o_orderkey)) AS target_only,
       (SELECT count(*) FROM common
        WHERE s1 IS DISTINCT FROM t1 OR s2 IS DISTINCT FROM t2 OR s3 IS DISTINCT FROM t3
           OR s4 IS DISTINCT FROM t4 OR s5 IS DISTINCT FROM t5) AS mismatched_rows
"""


@register("recon_row_summary", oracle=_SUMMARY_ORACLE,
          doc="Source/target/common/extra/mismatch row counts (Raptor Q4/Q5)")
def recon_row_summary(spark, sf_dir):
    return _diff(spark, sf_dir).summary


_CELLS_ORACLE = f"""
WITH {_TARGET_CTE},
{_COMMON_CTE}
SELECT o_orderkey, 'o_custkey' AS column_name, CAST(s1 AS varchar) AS source_value, CAST(t1 AS varchar) AS target_value
FROM common WHERE s1 IS DISTINCT FROM t1
UNION ALL
SELECT o_orderkey, 'o_orderstatus', CAST(s2 AS varchar), CAST(t2 AS varchar) FROM common WHERE s2 IS DISTINCT FROM t2
UNION ALL
SELECT o_orderkey, 'o_totalprice', CAST(s3 AS varchar), CAST(t3 AS varchar) FROM common WHERE s3 IS DISTINCT FROM t3
UNION ALL
SELECT o_orderkey, 'o_orderdate', CAST(s4 AS varchar), CAST(t4 AS varchar) FROM common WHERE s4 IS DISTINCT FROM t4
UNION ALL
SELECT o_orderkey, 'o_orderpriority', CAST(s5 AS varchar), CAST(t5 AS varchar) FROM common WHERE s5 IS DISTINCT FROM t5
"""


@register("recon_mismatched_cells", oracle=_CELLS_ORACLE,
          doc="Cell-level mismatch unpivot (Raptor Q2+Q3, typed array/explode form)")
def recon_mismatched_cells(spark, sf_dir):
    return _diff(spark, sf_dir).mismatched_cells


_SAMPLE_ORACLE = f"""
WITH {_TARGET_CTE},
{_COMMON_CTE},
cells AS (
    SELECT o_orderkey, 'o_custkey' AS column_name, CAST(s1 AS varchar) AS source_value, CAST(t1 AS varchar) AS target_value
    FROM common WHERE s1 IS DISTINCT FROM t1
    UNION ALL SELECT o_orderkey, 'o_orderstatus', CAST(s2 AS varchar), CAST(t2 AS varchar) FROM common WHERE s2 IS DISTINCT FROM t2
    UNION ALL SELECT o_orderkey, 'o_totalprice', CAST(s3 AS varchar), CAST(t3 AS varchar) FROM common WHERE s3 IS DISTINCT FROM t3
    UNION ALL SELECT o_orderkey, 'o_orderdate', CAST(s4 AS varchar), CAST(t4 AS varchar) FROM common WHERE s4 IS DISTINCT FROM t4
    UNION ALL SELECT o_orderkey, 'o_orderpriority', CAST(s5 AS varchar), CAST(t5 AS varchar) FROM common WHERE s5 IS DISTINCT FROM t5
), ranked AS (
    SELECT *, row_number() OVER (PARTITION BY column_name ORDER BY o_orderkey) AS rnk FROM cells
)
SELECT column_name, o_orderkey, source_value, target_value FROM ranked WHERE rnk = 1
"""


@register("recon_sample_mismatches", oracle=_SAMPLE_ORACLE,
          doc="One example mismatch per column (Raptor W2 report sampling: "
              "row_number per mismatch_column_name, deterministic key order)")
def recon_sample_mismatches(spark, sf_dir):
    from ..operators.windows import top_k_per_group

    cells = _diff(spark, sf_dir).mismatched_cells
    return top_k_per_group(
        cells,
        partition_by=["column_name"],
        order_by=[F.col("o_orderkey").asc()],
        k=1,
    ).select("column_name", "o_orderkey", "source_value", "target_value")


@register(
    "recon_extra_rows",
    oracle=f"""
WITH {_TARGET_CTE}
SELECT 'source_only' AS side, o_orderkey, o_custkey FROM orders s
WHERE NOT EXISTS (SELECT 1 FROM target t WHERE t.o_orderkey = s.o_orderkey)
UNION ALL
SELECT 'target_only', o_orderkey, o_custkey FROM target t
WHERE NOT EXISTS (SELECT 1 FROM orders s WHERE s.o_orderkey = t.o_orderkey)
""",
    doc="Extra rows both directions via left_anti (Raptor Q4)",
)
def recon_extra_rows(spark, sf_dir):
    d = _diff(spark, sf_dir)
    so = d.source_only.select(F.lit("source_only").alias("side"), "o_orderkey", "o_custkey")
    to = d.target_only.select(F.lit("target_only").alias("side"), "o_orderkey", "o_custkey")
    return so.unionByName(to)
