import datetime as _dt

# Fixed, explicit run date used wherever the reference called
# current_date()/current_timestamp() inside a plan (nondeterminism hazard,
# SURVEY.md §4). Pipelines take run_date as a parameter; this is only the
# default used by the driver-facing query catalog so results are stable.
RUN_DATE = _dt.date(2026, 1, 1)

from .adapters import tpch_entities, ORACLE_ENTITY_CTES  # noqa: E402
from .supplier_performance import (  # noqa: E402
    build_supplier_performance,
    build_top_selling_products,
)
from .product_performance import build_product_performance  # noqa: E402
from .customer_sales_report import build_customer_sales_report  # noqa: E402

__all__ = [
    "RUN_DATE",
    "tpch_entities",
    "ORACLE_ENTITY_CTES",
    "build_supplier_performance",
    "build_top_selling_products",
    "build_product_performance",
    "build_customer_sales_report",
]
