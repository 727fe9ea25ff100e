"""The three reference marts as catalog queries (SURVEY.md §3 entry
points), run over the adapted TPC-H entities with a fixed run_date.
Each oracle SQL rebuilds the identical computation in DuckDB, starting
from the shared entity CTEs (marts.adapters.ORACLE_ENTITY_CTES)."""

from __future__ import annotations

from ..marts import (
    RUN_DATE,
    ORACLE_ENTITY_CTES,
    build_customer_sales_report,
    build_product_performance,
    build_supplier_performance,
    tpch_entities,
)
from ..functions.money import o_dsum, o_from_units, o_round, o_usum
from .catalog import register

_D = RUN_DATE.isoformat()

# Shared mart-level CTE fragments (DuckDB) ---------------------------------

_SUPPLIER_MART_CTES = f"""
fil AS (SELECT * FROM sales WHERE ORDER_STATUS <> 'Cancelled'),
jnr AS (
    SELECT f.QUANTITY, f.DISCOUNT, f.SALE_ID,
           p.PRODUCT_ID, p.SUPPLIER_ID, p.PRODUCT_NAME, p.SELLING_PRICE
    FROM fil f JOIN products p ON f.PRODUCT_ID = p.PRODUCT_ID
),
jnr2 AS (
    SELECT j.PRODUCT_ID, j.PRODUCT_NAME, j.QUANTITY, j.SELLING_PRICE, j.DISCOUNT, j.SALE_ID,
           s.SUPPLIER_ID, s.SUPPLIER_NAME,
           (j.SELLING_PRICE - j.SELLING_PRICE * j.DISCOUNT / 100) * j.QUANTITY AS REVENUE
    FROM jnr j JOIN suppliers s ON trim(s.SUPPLIER_ID) = trim(j.SUPPLIER_ID)
),
prod_agg AS (
    SELECT SUPPLIER_ID, PRODUCT_ID, PRODUCT_NAME,
           count(SALE_ID) AS agg_product_sales_count,
           {o_usum('REVENUE')} AS agg_product_revenue_u,
           sum(QUANTITY)  AS agg_stock_sold
    FROM jnr2 GROUP BY 1, 2, 3
),
supp_agg AS (
    SELECT SUPPLIER_ID,
           CAST({o_round(o_from_units('sum(agg_product_revenue_u)'), 2)} AS double)  AS agg_total_revenue,
           CAST(sum(agg_product_sales_count) AS bigint)  AS agg_total_products_sold,
           CAST(sum(agg_stock_sold) AS bigint)           AS agg_total_stock_sold
    FROM prod_agg GROUP BY 1
),
top_prod AS (
    SELECT SUPPLIER_ID, PRODUCT_NAME AS TOP_SELLING_PRODUCT FROM (
        SELECT SUPPLIER_ID, PRODUCT_NAME,
               row_number() OVER (PARTITION BY SUPPLIER_ID
                                  ORDER BY {o_round(o_from_units('agg_product_revenue_u'), 2)} DESC, PRODUCT_ID) AS rnk
        FROM prod_agg) WHERE rnk = 1
),
supplier_performance AS (
    SELECT DATE '{_D}' AS DAY_DT,
           s.SUPPLIER_ID, s.SUPPLIER_NAME,
           CAST(coalesce(a.agg_total_revenue, 0) AS double)      AS TOTAL_REVENUE,
           CAST(coalesce(a.agg_total_products_sold, 0) AS bigint) AS TOTAL_PRODUCTS_SOLD,
           CAST(coalesce(a.agg_total_stock_sold, 0) AS bigint)    AS TOTAL_STOCK_SOLD,
           nullif(t.TOP_SELLING_PRODUCT, '')                      AS TOP_SELLING_PRODUCT
    FROM suppliers s
    LEFT JOIN supp_agg a ON trim(s.SUPPLIER_ID) = trim(a.SUPPLIER_ID)
    LEFT JOIN top_prod t ON trim(s.SUPPLIER_ID) = trim(t.SUPPLIER_ID)
)
""".strip()

_SUPPLIER_MART_ORACLE = f"""
WITH {ORACLE_ENTITY_CTES},
{_SUPPLIER_MART_CTES}
SELECT * FROM supplier_performance
"""


@register("mart_supplier_performance", oracle=_SUPPLIER_MART_ORACLE,
          doc="Reference entry point 2: supplier performance mart end-to-end")
def mart_supplier_performance(spark, sf_dir):
    e = tpch_entities(spark, sf_dir)
    return build_supplier_performance(e["sales"], e["products"], e["suppliers"], RUN_DATE)


_PRODUCT_MART_ORACLE = f"""
WITH {ORACLE_ENTITY_CTES},
fil AS (SELECT * FROM sales WHERE ORDER_STATUS <> 'Cancelled'),
jnr AS (
    SELECT p.PRODUCT_ID, p.COST_PRICE, p.PRODUCT_NAME, p.SELLING_PRICE, p.CATEGORY,
           p.STOCK_QUANTITY, p.REORDER_LEVEL, f.QUANTITY, f.DISCOUNT
    FROM products p LEFT JOIN fil f ON p.PRODUCT_ID = f.PRODUCT_ID
),
metrics AS (
    SELECT PRODUCT_ID, PRODUCT_NAME, CATEGORY, STOCK_QUANTITY, REORDER_LEVEL,
           coalesce(QUANTITY, 0) AS QUANTITY,
           coalesce(SELLING_PRICE * (1 - DISCOUNT / 100) * QUANTITY, 0) AS REVENUE,
           coalesce((SELLING_PRICE * (1 - DISCOUNT / 100) - COST_PRICE) * QUANTITY, 0) AS PROFIT
    FROM jnr
),
agg AS (
    SELECT PRODUCT_ID, PRODUCT_NAME, CATEGORY, STOCK_QUANTITY, REORDER_LEVEL,
           {o_dsum('REVENUE', 2)}            AS TOTAL_SALES_AMOUNT,
           CAST(sum(QUANTITY) AS bigint)     AS TOTAL_QUANTITY_SOLD,
           {o_dsum('PROFIT', 2)}             AS PROFIT
    FROM metrics GROUP BY 1, 2, 3, 4, 5
)
SELECT DATE '{_D}' AS DAY_DT,
       PRODUCT_ID, PRODUCT_NAME,
       CAST(TOTAL_SALES_AMOUNT AS double) AS TOTAL_SALES_AMOUNT,
       TOTAL_QUANTITY_SOLD,
       CAST(CASE WHEN TOTAL_QUANTITY_SOLD > 0
                 THEN {o_round('TOTAL_SALES_AMOUNT / TOTAL_QUANTITY_SOLD', 2)}
                 ELSE 0.0 END AS double) AS AVG_SALE_PRICE,
       STOCK_QUANTITY, REORDER_LEVEL,
       CASE WHEN STOCK_QUANTITY - TOTAL_QUANTITY_SOLD < REORDER_LEVEL
            THEN 'Below Reorder Level' ELSE 'Sufficient Stock' END AS STOCK_LEVEL_STATUS,
       CAST(PROFIT AS double) AS PROFIT,
       CATEGORY
FROM agg
"""


@register("mart_product_performance", oracle=_PRODUCT_MART_ORACLE,
          doc="Product performance mart end-to-end")
def mart_product_performance(spark, sf_dir):
    e = tpch_entities(spark, sf_dir)
    return build_product_performance(e["sales"], e["products"], RUN_DATE)


_CSR_BODY = f"""
csr_fil AS (SELECT * FROM sales WHERE ORDER_STATUS <> 'Cancelled'),
csr_jnr AS (
    SELECT f.SALE_ID, f.CUSTOMER_ID, f.PRODUCT_ID, f.QUANTITY, f.DISCOUNT, f.SALE_DATE,
           f.ORDER_STATUS, p.PRODUCT_NAME, p.CATEGORY, p.SELLING_PRICE
    FROM csr_fil f LEFT JOIN products p ON f.PRODUCT_ID = p.PRODUCT_ID
),
alldata AS (
    SELECT j.*, c.NAME, c.CITY
    FROM csr_jnr j JOIN customers c ON j.CUSTOMER_ID = c.CUSTOMER_ID
),
metrics AS (
    SELECT SALE_ID, CUSTOMER_ID, PRODUCT_ID, QUANTITY, DISCOUNT, ORDER_STATUS,
           PRODUCT_NAME, CATEGORY, SELLING_PRICE, NAME, CITY,
           DATE '{_D}' AS DAY_DT,
           coalesce(SALE_DATE, DATE '{_D}' - 1) AS SALE_DATE,
           monthname(coalesce(SALE_DATE, DATE '{_D}' - 1)) AS SALE_MONTH,
           CAST(year(coalesce(SALE_DATE, DATE '{_D}' - 1)) AS int) AS SALE_YEAR,
           SELLING_PRICE * (1 - DISCOUNT / 100) AS PRICE,
           {o_round('QUANTITY * SELLING_PRICE * (1 - DISCOUNT / 100)', 2)} AS SALE_AMOUNT
    FROM alldata
),
cust_agg AS (
    SELECT CUSTOMER_ID, {o_dsum('SALE_AMOUNT', 2)} AS AGG_SALES_AMOUNT
    FROM metrics GROUP BY 1
),
cuts AS (
    SELECT quantile_cont(AGG_SALES_AMOUNT, 0.5) AS silver,
           quantile_cont(AGG_SALES_AMOUNT, 0.8) AS gold
    FROM cust_agg
),
tiers AS (
    SELECT CUSTOMER_ID,
           CASE WHEN AGG_SALES_AMOUNT > (SELECT gold FROM cuts) THEN 'GOLD'
                WHEN AGG_SALES_AMOUNT BETWEEN (SELECT silver FROM cuts) AND (SELECT gold FROM cuts) THEN 'SILVER'
                ELSE 'BRONZE' END AS LOYALTY_TIER
    FROM cust_agg
),
top_sellers AS (
    SELECT DISTINCT TOP_SELLING_PRODUCT, 'true' AS TOP_PERFORMER
    FROM supplier_performance
    WHERE DAY_DT = DATE '{_D}' AND TOP_SELLING_PRODUCT IS NOT NULL
)
SELECT m.DAY_DT,
       m.CUSTOMER_ID,
       m.NAME AS CUSTOMER_NAME,
       m.SALE_ID,
       m.CITY,
       m.PRODUCT_NAME,
       m.CATEGORY,
       m.SALE_DATE,
       m.SALE_MONTH,
       m.SALE_YEAR,
       m.QUANTITY,
       {o_round('m.PRICE', 2)} AS PRICE,
       m.SALE_AMOUNT,
       coalesce(ts.TOP_PERFORMER, 'false') AS TOP_PERFORMER,
       t.LOYALTY_TIER,
       TIMESTAMP '{_D} 00:00:00' AS LOAD_TSTMP
FROM metrics m
LEFT JOIN tiers t ON m.CUSTOMER_ID = t.CUSTOMER_ID
LEFT JOIN top_sellers ts ON m.PRODUCT_NAME = ts.TOP_SELLING_PRODUCT
"""

_CSR_ORACLE = f"""
WITH {ORACLE_ENTITY_CTES},
{_SUPPLIER_MART_CTES},
{_CSR_BODY}
"""


@register("mart_customer_sales_report", oracle=_CSR_ORACLE,
          doc="Customer sales report mart (quantile loyalty tiers, top-performer flag)")
def mart_customer_sales_report(spark, sf_dir):
    from ..marts.supplier_performance import build_top_selling_products

    e = tpch_entities(spark, sf_dir)
    # the CSR consumes ONE column of the supplier mart (the distinct
    # top-product names); derive just that instead of composing the
    # full mart in-plan — same values (oracle replays the full-mart
    # derivation), ~1 s cheaper at sf0.1
    tp = build_top_selling_products(e["sales"], e["products"], e["suppliers"])
    return build_customer_sales_report(
        e["sales"], e["products"], e["customers"], None, RUN_DATE, top_products=tp
    )


# --- full-pipeline composition (reference entry point 1) --------------------
#
# The flow's ingest stage deduplicates SALE_ID deterministically before
# the Q1 gate (marts/flow.py), so the oracle's `sales` CTE is the entity
# CTE wrapped in the same keep-first row_number — survivor = first row
# under all-payload-columns ASC NULLS LAST, matching
# operators.aggregates.dedupe_by_key's default ordering.
_DEDUP_ORDER = ", ".join(
    f"{c} ASC NULLS LAST"
    for c in ["CUSTOMER_ID", "PRODUCT_ID", "SALE_DATE", "QUANTITY",
              "DISCOUNT", "SHIPPING_COST", "ORDER_STATUS", "PAYMENT_MODE"]
)
_ENTITY_CTES_DEDUP = ORACLE_ENTITY_CTES.replace("sales AS (", "sales_all AS (", 1) + f""",
sales AS (
    SELECT SALE_ID, CUSTOMER_ID, PRODUCT_ID, SALE_DATE, QUANTITY,
           DISCOUNT, SHIPPING_COST, ORDER_STATUS, PAYMENT_MODE
    FROM (SELECT *, row_number() OVER (PARTITION BY SALE_ID ORDER BY {_DEDUP_ORDER}) AS __rn
          FROM sales_all)
    WHERE __rn = 1
)"""

_PIPELINE_ORACLE = f"""
WITH {_ENTITY_CTES_DEDUP},
{_SUPPLIER_MART_CTES},
{_CSR_BODY}
"""


@register("pipeline_customer_sales_report", oracle=_PIPELINE_ORACLE,
          doc="Reference entry point 1 END-TO-END: run_pipeline executes the full DAG "
              "([suppliers,products,customers] >> sales >> 3 marts) with Q1 gates into a "
              "layered warehouse; returns the landed customer mart slice read back with "
              "partition pruning")
def pipeline_customer_sales_report(spark, sf_dir):
    import hashlib
    import os
    import tempfile

    from ..marts.flow import run_metamorph_pipeline
    from ..sinks.warehouse import LayeredWarehouse

    # stable per-sf root under the system temp dir: every layer write is
    # mode=overwrite, so reruns replace files instead of accumulating
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = os.path.join(tempfile.gettempdir(), f"metamorph_wh_{tag}")
    run_metamorph_pipeline(spark, sf_dir, root, RUN_DATE)
    wh = LayeredWarehouse(root)
    out = wh.read_legacy(spark, "customer_sales_report", RUN_DATE)
    # project to the mart's declared column order (the partition column
    # comes back last from a partitioned read)
    cols = ["DAY_DT", "CUSTOMER_ID", "CUSTOMER_NAME", "SALE_ID", "CITY",
            "PRODUCT_NAME", "CATEGORY", "SALE_DATE", "SALE_MONTH", "SALE_YEAR",
            "QUANTITY", "PRICE", "SALE_AMOUNT", "TOP_PERFORMER", "LOYALTY_TIER",
            "LOAD_TSTMP"]
    return out.select(*cols)
