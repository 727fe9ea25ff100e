"""Explicit StructType schema contracts.

The reference infers every schema (CSV ``inferSchema=True`` at
`ingestion_task.py:207-212`, ``createDataFrame`` dict inference at
`ingestion_task.py:38-39`, JDBC catalog at `utils.py:185`) and renames
columns positionally. This engine inverts that: every source has an
explicit ``StructType`` contract; drift handling is an explicit operator
(see ``operators.projection``), not an accident of inference.

Two families:

- ENTITY_*: the reference warehouse's four ingested entities
  (`ingestion_task.py:42-53,100-115,159-170,215-232`).
- TESTDATA: the driver's TPC-H-ish synthetic tables (TESTDATA.md).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- reference entity contracts -------------------------------------------

ENTITY_SUPPLIERS = T.StructType(
    [
        T.StructField("SUPPLIER_ID", T.StringType(), False),
        T.StructField("SUPPLIER_NAME", T.StringType(), True),
        T.StructField("CONTACT_DETAILS", T.StringType(), True),
        T.StructField("REGION", T.StringType(), True),
    ]
)

ENTITY_PRODUCTS = T.StructType(
    [
        T.StructField("PRODUCT_ID", T.StringType(), False),
        T.StructField("PRODUCT_NAME", T.StringType(), True),
        T.StructField("CATEGORY", T.StringType(), True),
        T.StructField("SELLING_PRICE", T.DoubleType(), True),
        T.StructField("COST_PRICE", T.DoubleType(), True),
        T.StructField("STOCK_QUANTITY", T.LongType(), True),
        T.StructField("REORDER_LEVEL", T.LongType(), True),
        T.StructField("SUPPLIER_ID", T.StringType(), True),
    ]
)

ENTITY_CUSTOMERS = T.StructType(
    [
        T.StructField("CUSTOMER_ID", T.StringType(), False),
        T.StructField("NAME", T.StringType(), True),
        T.StructField("CITY", T.StringType(), True),
        T.StructField("EMAIL", T.StringType(), True),
        T.StructField("PHONE_NUMBER", T.StringType(), True),
    ]
)

ENTITY_SALES = T.StructType(
    [
        T.StructField("SALE_ID", T.StringType(), False),
        T.StructField("CUSTOMER_ID", T.StringType(), True),
        T.StructField("PRODUCT_ID", T.StringType(), True),
        T.StructField("SALE_DATE", T.DateType(), True),
        T.StructField("QUANTITY", T.LongType(), True),
        T.StructField("DISCOUNT", T.DoubleType(), True),
        T.StructField("SHIPPING_COST", T.DoubleType(), True),
        T.StructField("ORDER_STATUS", T.StringType(), True),
        T.StructField("PAYMENT_MODE", T.StringType(), True),
    ]
)

# --- driver testdata contracts (TPC-H-ish) --------------------------------

TESTDATA = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType(), False),
            T.StructField("r_name", T.StringType(), True),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType(), False),
            T.StructField("n_name", T.StringType(), True),
            T.StructField("n_regionkey", T.IntegerType(), True),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType(), False),
            T.StructField("c_name", T.StringType(), True),
            T.StructField("c_nationkey", T.IntegerType(), True),
            T.StructField("c_acctbal", T.DoubleType(), True),
            T.StructField("c_mktsegment", T.StringType(), True),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType(), False),
            T.StructField("s_name", T.StringType(), True),
            T.StructField("s_nationkey", T.IntegerType(), True),
            T.StructField("s_acctbal", T.DoubleType(), True),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType(), False),
            T.StructField("p_name", T.StringType(), True),
            T.StructField("p_brand", T.StringType(), True),
            T.StructField("p_type", T.StringType(), True),
            T.StructField("p_size", T.IntegerType(), True),
            T.StructField("p_retailprice", T.DoubleType(), True),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType(), False),
            T.StructField("o_custkey", T.LongType(), True),
            T.StructField("o_orderstatus", T.StringType(), True),
            T.StructField("o_totalprice", T.DoubleType(), True),
            T.StructField("o_orderdate", T.TimestampType(), True),
            T.StructField("o_orderpriority", T.StringType(), True),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType(), False),
            T.StructField("l_partkey", T.LongType(), True),
            T.StructField("l_suppkey", T.LongType(), True),
            T.StructField("l_linenumber", T.IntegerType(), True),
            T.StructField("l_quantity", T.DoubleType(), True),
            T.StructField("l_extendedprice", T.DoubleType(), True),
            T.StructField("l_discount", T.DoubleType(), True),
            T.StructField("l_tax", T.DoubleType(), True),
            T.StructField("l_returnflag", T.StringType(), True),
            T.StructField("l_linestatus", T.StringType(), True),
            T.StructField("l_shipdate", T.TimestampType(), True),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType(), False),
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("props", T.StringType(), True),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("text", T.StringType(), True),
            T.StructField("lang", T.StringType(), True),
            T.StructField("source", T.StringType(), True),
            T.StructField("n_chars", T.LongType(), True),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType(), False),
            T.StructField("embedding", T.ArrayType(T.FloatType()), True),
            T.StructField("label", T.IntegerType(), True),
        ]
    ),
}

TESTDATA_TABLES = tuple(TESTDATA)
