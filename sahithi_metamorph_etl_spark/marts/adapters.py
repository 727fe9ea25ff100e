"""TPC-H testdata → reference entity model, deterministically.

The reference warehouse ingests four entities — suppliers, products,
customers, sales (`ingestion_task.py`, contracts in core.contracts) —
while the driver's testdata is TPC-H-ish (TESTDATA.md). This module maps
one onto the other with pure, deterministic expressions so the marts run
unchanged on the driver's data and a DuckDB oracle can reproduce every
value bit-for-bit:

- supplier  -> suppliers   (S-prefixed zero-padded ids)
- part      -> products    (cost = 70% of retail; stock/reorder derived
                            from p_partkey so they are stable; supplier
                            assignment p_partkey % |supplier|)
- customer  -> customers
- lineitem ⋈ orders -> sales (one sale per line item; order status
                            P/O/F → Cancelled/Open/Completed; discount
                            rescaled to percent 0-100 per the reference
                            formula `m_supplier_performance_task.py:116`;
                            ~1/211 of sales get a NULL SALE_DATE to
                            exercise the null-imputation path
                            `m_customer_sales_report_task.py:143-152`)

``ORACLE_ENTITY_CTES`` is the same mapping as DuckDB SQL — the single
source of truth for oracle queries in the catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.money import dround, o_round
from ..sources.readers import read_testdata


def _tagged_id(prefix: str, col, width: int):
    return F.concat(F.lit(prefix), F.lpad(col.cast("string"), width, "0"))


def tpch_entities(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Return {'suppliers','products','customers','sales'} DataFrames."""
    supplier = read_testdata(spark, sf_dir, "supplier")
    part = read_testdata(spark, sf_dir, "part")
    customer = read_testdata(spark, sf_dir, "customer")
    lineitem = read_testdata(spark, sf_dir, "lineitem")
    orders = read_testdata(spark, sf_dir, "orders")

    # |supplier| is needed for the p_partkey % n_supp assignment. Keep it
    # in-plan: a 1-row count aggregate broadcast-cross-joined onto part,
    # so building the products frame stays lazy (no driver action here,
    # nothing to re-fire on retries).
    n_supp_scalar = F.broadcast(supplier.agg(F.count(F.lit(1)).alias("__n_supp")))

    suppliers = supplier.select(
        _tagged_id("S", F.col("s_suppkey"), 6).alias("SUPPLIER_ID"),
        F.col("s_name").alias("SUPPLIER_NAME"),
        F.col("s_suppkey").cast("string").alias("CONTACT_DETAILS"),
        F.col("s_nationkey").cast("string").alias("REGION"),
    )

    products = part.crossJoin(n_supp_scalar).select(
        _tagged_id("P", F.col("p_partkey"), 6).alias("PRODUCT_ID"),
        F.col("p_name").alias("PRODUCT_NAME"),
        F.col("p_type").alias("CATEGORY"),
        F.col("p_retailprice").alias("SELLING_PRICE"),
        dround(F.col("p_retailprice") * 0.7, 2).alias("COST_PRICE"),
        ((F.col("p_partkey") % 97) * 25 + F.col("p_size")).cast("bigint").alias("STOCK_QUANTITY"),
        ((F.col("p_partkey") % 13) * 40).cast("bigint").alias("REORDER_LEVEL"),
        _tagged_id("S", F.col("p_partkey") % F.col("__n_supp"), 6).alias("SUPPLIER_ID"),
    )

    customers = customer.select(
        _tagged_id("C", F.col("c_custkey"), 6).alias("CUSTOMER_ID"),
        F.col("c_name").alias("NAME"),
        F.col("c_mktsegment").alias("CITY"),
        F.concat(F.lit("c"), F.col("c_custkey").cast("string"), F.lit("@example.com")).alias("EMAIL"),
        F.col("c_custkey").cast("string").alias("PHONE_NUMBER"),
    )

    sales = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey, "inner")
        .select(
            _tagged_id("SL", F.col("l_orderkey") * 10 + F.col("l_linenumber"), 9).alias("SALE_ID"),
            _tagged_id("C", F.col("o_custkey"), 6).alias("CUSTOMER_ID"),
            _tagged_id("P", F.col("l_partkey"), 6).alias("PRODUCT_ID"),
            F.when(F.col("l_orderkey") % 211 == 0, F.lit(None).cast("date"))
            .otherwise(F.col("l_shipdate").cast("date"))
            .alias("SALE_DATE"),
            F.col("l_quantity").cast("bigint").alias("QUANTITY"),
            (F.col("l_discount") * 100).alias("DISCOUNT"),
            dround(F.col("l_tax") * F.col("l_extendedprice"), 2).alias("SHIPPING_COST"),
            F.when(F.col("o_orderstatus") == "P", "Cancelled")
            .when(F.col("o_orderstatus") == "O", "Open")
            .otherwise("Completed")
            .alias("ORDER_STATUS"),
            F.when(F.col("l_returnflag") == "R", "Card")
            .when(F.col("l_returnflag") == "A", "UPI")
            .otherwise("Cash")
            .alias("PAYMENT_MODE"),
        )
    )

    return {"suppliers": suppliers, "products": products, "customers": customers, "sales": sales}


# DuckDB twin of tpch_entities — keep in lockstep with the DataFrame code
# above. Uppercase aliases match the Spark-side column names exactly
# (the driver's compare is column-name sensitive).
ORACLE_ENTITY_CTES = f"""
suppliers AS (
    SELECT 'S' || lpad(CAST(s_suppkey AS varchar), 6, '0') AS SUPPLIER_ID,
           s_name AS SUPPLIER_NAME,
           CAST(s_suppkey AS varchar) AS CONTACT_DETAILS,
           CAST(s_nationkey AS varchar) AS REGION
    FROM supplier
),
products AS (
    SELECT 'P' || lpad(CAST(p_partkey AS varchar), 6, '0') AS PRODUCT_ID,
           p_name AS PRODUCT_NAME,
           p_type AS CATEGORY,
           p_retailprice AS SELLING_PRICE,
           {o_round('p_retailprice * 0.7', 2)} AS COST_PRICE,
           CAST((p_partkey % 97) * 25 + p_size AS bigint) AS STOCK_QUANTITY,
           CAST((p_partkey % 13) * 40 AS bigint) AS REORDER_LEVEL,
           'S' || lpad(CAST(p_partkey % (SELECT count(*) FROM supplier) AS varchar), 6, '0') AS SUPPLIER_ID
    FROM part
),
customers AS (
    SELECT 'C' || lpad(CAST(c_custkey AS varchar), 6, '0') AS CUSTOMER_ID,
           c_name AS NAME,
           c_mktsegment AS CITY,
           'c' || CAST(c_custkey AS varchar) || '@example.com' AS EMAIL,
           CAST(c_custkey AS varchar) AS PHONE_NUMBER
    FROM customer
),
sales AS (
    SELECT 'SL' || lpad(CAST(l_orderkey * 10 + l_linenumber AS varchar), 9, '0') AS SALE_ID,
           'C' || lpad(CAST(o_custkey AS varchar), 6, '0') AS CUSTOMER_ID,
           'P' || lpad(CAST(l_partkey AS varchar), 6, '0') AS PRODUCT_ID,
           CASE WHEN l_orderkey % 211 = 0 THEN NULL ELSE CAST(l_shipdate AS date) END AS SALE_DATE,
           CAST(l_quantity AS bigint) AS QUANTITY,
           l_discount * 100 AS DISCOUNT,
           {o_round('l_tax * l_extendedprice', 2)} AS SHIPPING_COST,
           CASE o_orderstatus WHEN 'P' THEN 'Cancelled' WHEN 'O' THEN 'Open' ELSE 'Completed' END AS ORDER_STATUS,
           CASE l_returnflag WHEN 'R' THEN 'Card' WHEN 'A' THEN 'UPI' ELSE 'Cash' END AS PAYMENT_MODE
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
)
""".strip()
