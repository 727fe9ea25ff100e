"""Product performance mart.

Re-expression of `ETL_Airflow/dags/tasks/m_product_performance_task.py:10-171`:
products LEFT JOIN non-cancelled sales (unsold products survive with null
metrics) → discounted price / revenue / profit per row → null→0 →
product-level aggregate → derived metrics (avg sale price, stock status).

Prod-variant semantics per SURVEY.md §7: profit uses the discounted
price minus cost (`m_product_performance_task.py:98`), NOT the adhoc
variant's undiscounted formula.

Scale notes: the reference's products-LEFT-JOIN-fact forces a sort-merge
shuffle of BOTH sides (the outer dim side cannot be the broadcast build
side). Rewritten as the equivalent inner join (fact probe side,
broadcast products) → per-product aggregate (ONE fact shuffle,
map-side partial) → broadcast the small aggregate back onto the full
product dim with null→0 defaults. Row-level arithmetic is unchanged, so
results are bit-identical to the reference shape.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.money import checked_sum, dround


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

    # fact stays the probe side; per-row arithmetic identical to the
    # reference's left-join form (only rows with sales contribute terms)
    sold = fil.join(
        F.broadcast(sq_products.select("PRODUCT_ID", "SELLING_PRICE", "COST_PRICE")),
        on="PRODUCT_ID",
        how="inner",
    )
    discounted = F.col("SELLING_PRICE") * (1 - F.col("DISCOUNT") / 100)
    metrics = sold.withColumn("REVENUE", discounted * F.col("QUANTITY")).withColumn(
        "PROFIT", (discounted - F.col("COST_PRICE")) * F.col("QUANTITY")
    )

    # PER-PRODUCT totals are scale-invariant (sale lines per product is
    # a fixed ratio, ~30 x <=1e5 each ⇒ <=~3e6), so the declared 1e8
    # bound holds at any SF and checked_sum provably keeps the bigint
    # micro-unit fast path
    sold_agg = metrics.groupBy("PRODUCT_ID").agg(
        checked_sum(F.col("REVENUE"), max_abs_total=1e8, scale=2).alias("TOTAL_SALES_AMOUNT"),
        F.sum("QUANTITY").alias("TOTAL_QUANTITY_SOLD"),
        checked_sum(F.col("PROFIT"), max_abs_total=1e8, scale=2).alias("PROFIT"),
    )

    # join the small per-product aggregate back onto the full dimension:
    # unsold products survive with null metrics -> 0 defaults (reference
    # P9 semantics: their single all-null joined row also summed to 0)
    agg = (
        sq_products.select(
            "PRODUCT_ID", "PRODUCT_NAME", "CATEGORY", "STOCK_QUANTITY", "REORDER_LEVEL"
        )
        .join(F.broadcast(sold_agg), on="PRODUCT_ID", how="left")
        .select(
            "PRODUCT_ID",
            "PRODUCT_NAME",
            "CATEGORY",
            "STOCK_QUANTITY",
            "REORDER_LEVEL",
            F.coalesce(F.col("TOTAL_SALES_AMOUNT"), F.lit(0.0)).alias("TOTAL_SALES_AMOUNT"),
            F.coalesce(F.col("TOTAL_QUANTITY_SOLD"), F.lit(0)).alias("TOTAL_QUANTITY_SOLD"),
            F.coalesce(F.col("PROFIT"), F.lit(0.0)).alias("PROFIT"),
        )
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
