"""Connector tests: CSV contract scan with corrupt-record capture (S1)
and the REST/JSON record source (S2/S3) with key drift."""

from __future__ import annotations

from pyspark.sql import types as T

from sahithi_metamorph_etl_spark.sources.readers import CORRUPT_COL, read_csv
from sahithi_metamorph_etl_spark.sources.rest import rows_from_records

_SCHEMA = T.StructType(
    [
        T.StructField("PRODUCT_ID", T.StringType(), True),
        T.StructField("SELLING_PRICE", T.DoubleType(), True),
        T.StructField("STOCK_QUANTITY", T.LongType(), True),
    ]
)


def test_read_csv_captures_corrupt_rows(spark, tmp_path):
    p = tmp_path / "products.csv"
    p.write_text(
        "PRODUCT_ID,SELLING_PRICE,STOCK_QUANTITY\n"
        "P00001,19.99,100\n"
        "P00002,not_a_price,50\n"  # type drift -> corrupt, not poisoned
        "P00003,5.00,7\n"
    )
    df = read_csv(spark, str(p), _SCHEMA).cache()
    good = df.filter(df[CORRUPT_COL].isNull())
    bad = df.filter(df[CORRUPT_COL].isNotNull())
    assert good.count() == 2
    assert bad.count() == 1
    assert bad.first()["PRODUCT_ID"] == "P00002"  # typed cols kept where parseable


def test_read_csv_without_capture(spark, tmp_path):
    p = tmp_path / "ok.csv"
    p.write_text("PRODUCT_ID,SELLING_PRICE,STOCK_QUANTITY\nP1,1.5,2\n")
    df = read_csv(spark, str(p), _SCHEMA, capture_corrupt=False)
    assert df.columns == ["PRODUCT_ID", "SELLING_PRICE", "STOCK_QUANTITY"]
    assert df.count() == 1


def test_rows_from_records_normalizes_drifting_keys(spark):
    records = [
        {" product id ": "P1", "Selling Price": 9.5, "STOCK_QUANTITY": 3},
        {"PRODUCT_ID": "P2", "SELLING_PRICE": 1.0},  # missing field -> null
    ]
    df = rows_from_records(spark, records, _SCHEMA)
    rows = {r["PRODUCT_ID"]: r for r in df.collect()}
    assert rows["P1"]["SELLING_PRICE"] == 9.5
    assert rows["P1"]["STOCK_QUANTITY"] == 3
    assert rows["P2"]["STOCK_QUANTITY"] is None


def test_rows_from_records_callable_source(spark):
    df = rows_from_records(
        spark, lambda: [{"PRODUCT_ID": "P9", "SELLING_PRICE": 2.5, "STOCK_QUANTITY": 1}], _SCHEMA
    )
    assert df.count() == 1
