"""Product performance mart.

Re-expression of `ETL_Airflow/dags/tasks/m_product_performance_task.py:10-171`:
products LEFT JOIN non-cancelled sales (unsold products survive with null
metrics) → discounted price / revenue / profit per row → null→0 →
product-level aggregate → derived metrics (avg sale price, stock status).

Prod-variant semantics per SURVEY.md §7: profit uses the discounted
price minus cost (`m_product_performance_task.py:98`), NOT the adhoc
variant's undiscounted formula.

Scale notes: the join keeps the fact on the probe side; products is the
(smaller) build side but must be on the LEFT for outer semantics, so we
broadcast it and let Spark flip build sides (broadcast right outer is
handled by AQE/BroadcastNestedLoop avoidance — it stays a broadcast hash
join because the condition is equi).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.money import dround, dsum


def build_product_performance(
    sales: DataFrame,
    products: DataFrame,
    run_date: dt.date,
) -> DataFrame:
    sq_sales = sales.select("ORDER_STATUS", "PRODUCT_ID", "QUANTITY", "DISCOUNT")
    sq_products = products.select(
        "PRODUCT_ID", "COST_PRICE", "PRODUCT_NAME", "SELLING_PRICE", "CATEGORY", "STOCK_QUANTITY", "REORDER_LEVEL"
    )

    fil = sq_sales.filter(F.col("ORDER_STATUS") != "Cancelled")

    joined = sq_products.join(fil, on="PRODUCT_ID", how="left").select(
        sq_products.PRODUCT_ID,
        sq_products.COST_PRICE,
        sq_products.PRODUCT_NAME,
        sq_products.SELLING_PRICE,
        sq_products.CATEGORY,
        sq_products.STOCK_QUANTITY,
        sq_products.REORDER_LEVEL,
        fil.QUANTITY,
        fil.DISCOUNT,
    )

    discounted = F.col("SELLING_PRICE") * (1 - F.col("DISCOUNT") / 100)
    metrics = (
        joined.withColumn("DISCOUNTED_PRICE", discounted)
        .withColumn("REVENUE", F.col("DISCOUNTED_PRICE") * F.col("QUANTITY"))
        .withColumn("PROFIT", (F.col("DISCOUNTED_PRICE") - F.col("COST_PRICE")) * F.col("QUANTITY"))
        .withColumn("QUANTITY", F.coalesce(F.col("QUANTITY"), F.lit(0)))
        .withColumn("REVENUE", F.coalesce(F.col("REVENUE"), F.lit(0)))
        .withColumn("PROFIT", F.coalesce(F.col("PROFIT"), F.lit(0)))
    )

    agg = metrics.groupBy("PRODUCT_ID", "PRODUCT_NAME", "CATEGORY", "STOCK_QUANTITY", "REORDER_LEVEL").agg(
        dsum(F.col("REVENUE"), 2).alias("TOTAL_SALES_AMOUNT"),
        F.sum("QUANTITY").alias("TOTAL_QUANTITY_SOLD"),
        dsum(F.col("PROFIT"), 2).alias("PROFIT"),
    )

    final = (
        agg.withColumn(
            "AVG_SALE_PRICE",
            F.when(
                F.col("TOTAL_QUANTITY_SOLD") > 0,
                dround(F.col("TOTAL_SALES_AMOUNT") / F.col("TOTAL_QUANTITY_SOLD"), 2),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn("AVAILABLE_STOCK", F.col("STOCK_QUANTITY") - F.col("TOTAL_QUANTITY_SOLD"))
        .withColumn(
            "STOCK_LEVEL_STATUS",
            F.when(F.col("AVAILABLE_STOCK") < F.col("REORDER_LEVEL"), "Below Reorder Level").otherwise(
                "Sufficient Stock"
            ),
        )
        .withColumn("DAY_DT", F.lit(run_date.isoformat()).cast("date"))
    )

    return final.select(
        "DAY_DT",
        "PRODUCT_ID",
        "PRODUCT_NAME",
        F.col("TOTAL_SALES_AMOUNT").cast("double").alias("TOTAL_SALES_AMOUNT"),
        F.col("TOTAL_QUANTITY_SOLD").cast("bigint").alias("TOTAL_QUANTITY_SOLD"),
        F.col("AVG_SALE_PRICE").cast("double").alias("AVG_SALE_PRICE"),
        "STOCK_QUANTITY",
        "REORDER_LEVEL",
        "STOCK_LEVEL_STATUS",
        F.col("PROFIT").cast("double").alias("PROFIT"),
        "CATEGORY",
    )
