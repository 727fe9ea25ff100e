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


# --- TokenClient (S2 auth, reference utils.py:65-105) -----------------------


class _FakeResp:
    def __init__(self, status, payload=None, text=""):
        self.status_code = status
        self._payload = payload
        self.text = text

    def json(self):
        if isinstance(self._payload, Exception):
            raise self._payload
        return self._payload


class _FakeTransport:
    def __init__(self, token_resp, get_resps):
        self.token_resp = token_resp
        self.get_resps = list(get_resps)
        self.calls = []

    def post(self, url, data=None):
        self.calls.append(("post", url, data))
        return self.token_resp

    def get(self, url, headers=None):
        self.calls.append(("get", url, headers))
        return self.get_resps.pop(0)


def _client(token_resp, get_resps):
    from sahithi_metamorph_etl_spark.sources.rest import TokenClient

    t = _FakeTransport(token_resp, get_resps)
    return TokenClient("http://api/", "u", "pw", transport=t), t


def test_token_client_bearer_flow_and_cache(spark):
    cli, t = _client(
        _FakeResp(200, {"access_token": "tok123"}),
        [_FakeResp(200, [{"PRODUCT_ID": "P1", "SELLING_PRICE": 1.0, "STOCK_QUANTITY": 2}]),
         _FakeResp(200, [])],
    )
    df = rows_from_records(spark, cli.records("v2/products"), _SCHEMA)
    assert df.count() == 1
    cli.fetch("v2/products")  # second call: token is cached, no second POST
    posts = [c for c in t.calls if c[0] == "post"]
    gets = [c for c in t.calls if c[0] == "get"]
    assert len(posts) == 1
    assert posts[0][1] == "http://api/token"
    assert posts[0][2] == {"username": "u", "password": "pw"}
    assert all(g[2] == {"Authorization": "Bearer tok123"} for g in gets)
    assert gets[0][1] == "http://api/v2/products"


def test_token_client_refreshes_once_on_401():
    cli, t = _client(
        _FakeResp(200, {"access_token": "tokA"}),
        [_FakeResp(401, text="expired"), _FakeResp(200, {"ok": True})],
    )
    assert cli.fetch("v2/customers") == {"ok": True}
    assert len([c for c in t.calls if c[0] == "post"]) == 2  # initial + refresh


def test_token_client_errors():
    import pytest

    from sahithi_metamorph_etl_spark.sources.rest import RestApiError

    cli, _ = _client(_FakeResp(500, text="boom"), [])
    with pytest.raises(RestApiError, match="token generation failed"):
        cli.token()

    cli, _ = _client(_FakeResp(200, {}), [])
    with pytest.raises(RestApiError, match="token not found"):
        cli.token()

    cli, _ = _client(_FakeResp(200, {"access_token": "t"}), [_FakeResp(404)])
    with pytest.raises(RestApiError, match="not found"):
        cli.fetch("missing")

    cli, _ = _client(
        _FakeResp(200, {"access_token": "t"}),
        [_FakeResp(200, ValueError("bad json"))],
    )
    with pytest.raises(RestApiError, match="parse JSON"):
        cli.fetch("v2/products")


# --- dated paths (reference daily sales drop) + JDBC query pushdown ---------


def test_dated_path_and_read_dated_csv(spark, tmp_path):
    import datetime as dt

    from sahithi_metamorph_etl_spark.sources.readers import dated_path, read_dated_csv

    d = dt.date(2026, 3, 7)
    assert (
        dated_path("gs://bucket/{YYYYMMDD}/sales_{YYYYMMDD}.csv", d)
        == "gs://bucket/20260307/sales_20260307.csv"
    )
    import pytest

    with pytest.raises(ValueError, match="does not contain"):
        dated_path("gs://bucket/sales.csv", d)

    day_dir = tmp_path / "20260307"
    day_dir.mkdir()
    (day_dir / "sales_20260307.csv").write_text(
        "PRODUCT_ID,SELLING_PRICE,STOCK_QUANTITY\nP1,9.99,5\n"
    )
    df = read_dated_csv(spark, str(tmp_path / "{YYYYMMDD}" / "sales_{YYYYMMDD}.csv"), d, _SCHEMA)
    assert df.count() == 1
    assert df.first()["PRODUCT_ID"] == "P1"


def test_jdbc_query_source_wraps_for_pushdown():
    from sahithi_metamorph_etl_spark.sources.readers import jdbc_query_source

    assert (
        jdbc_query_source("SELECT id, amount FROM sales WHERE day = '2026-01-01';")
        == "(SELECT id, amount FROM sales WHERE day = '2026-01-01') q"
    )


# ---- paged-REST Python DataSource (partition-per-page) ---------------------


def _write_pages(tmp_path, pages):
    import json

    d = tmp_path / "api_snapshot"
    d.mkdir()
    for i, recs in enumerate(pages):
        (d / f"page_{i}.json").write_text(json.dumps(recs))
    return str(d)


def test_paged_rest_fans_out_one_partition_per_page(spark, tmp_path):
    from sahithi_metamorph_etl_spark.sources.paged_rest import PagedRestDataSource

    spark.dataSource.register(PagedRestDataSource)
    fixture = _write_pages(
        tmp_path,
        [
            [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}],
            [{"id": 3, "name": "c"}],
            [],  # an empty page is fine
            [{"id": 4}],  # missing key -> NULL under the contract
        ],
    )
    df = (
        spark.read.format("paged_rest")
        .schema("id bigint, name string")
        .option("fixture_dir", fixture)
        .option("n_pages", "6")  # generous upper bound: pages 4-5 absent
        .load()
    )
    assert df.rdd.getNumPartitions() == 6  # the fan-out IS the partitioning
    rows = {r.id: r.name for r in df.collect()}
    assert rows == {1: "a", 2: "b", 3: "c", 4: None}


def test_paged_rest_records_path_and_coercion(spark, tmp_path):
    import json

    from sahithi_metamorph_etl_spark.sources.paged_rest import PagedRestDataSource

    spark.dataSource.register(PagedRestDataSource)
    d = tmp_path / "wrapped"
    d.mkdir()
    (d / "page_0.json").write_text(json.dumps(
        {"data": {"items": [{"id": "7", "score": "1.5", "ok": 1, "meta": {"k": 2}}]}}
    ))
    df = (
        spark.read.format("paged_rest")
        .schema("id bigint, score double, ok boolean, meta string")
        .option("fixture_dir", str(d))
        .option("n_pages", "1")
        .option("records_path", "data.items")
        .load()
    )
    r = df.collect()[0]
    assert (r.id, r.score, r.ok) == (7, 1.5, True)
    assert '"k": 2' in r.meta  # nested objects land as JSON text


def test_paged_rest_requires_schema_and_pages(spark, tmp_path):
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import AnalysisException

    from sahithi_metamorph_etl_spark.sources.paged_rest import PagedRestDataSource, PagedRestReader

    spark.dataSource.register(PagedRestDataSource)
    with pytest.raises(Exception, match="explicit schema"):
        spark.read.format("paged_rest").option("n_pages", "1").load()
    with pytest.raises(ValueError, match="n_pages"):
        PagedRestReader(None, {"n_pages": "0"})


def test_paged_rest_coercion_is_strict_with_context():
    """Non-integral numbers in integer fields and non-numeric strings in
    numeric fields must raise PagedRestCoercionError naming the page and
    field — never silently truncate (1.9 -> 1) or surface a bare
    mid-partition ValueError with no record context."""
    import pytest
    from pyspark.sql import types as T

    from sahithi_metamorph_etl_spark.sources.paged_rest import (
        PagedRestCoercionError,
        _coerce,
    )

    fields = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("score", T.DoubleType()),
            T.StructField("name", T.StringType()),
        ]
    ).fields

    # valid coercions, including numeric strings and nested objects
    assert _coerce({"id": "12", "score": "3.5", "name": {"a": 1}}, fields, page=0) == (
        12,
        3.5,
        '{"a": 1}',
    )
    assert _coerce({"id": 7.0, "score": 1, "name": None}, fields, page=0) == (7, 1.0, None)

    with pytest.raises(PagedRestCoercionError, match=r"page 3: field 'id'.*1\.9"):
        _coerce({"id": 1.9}, fields, page=3)
    with pytest.raises(PagedRestCoercionError, match=r"page 5: field 'score'.*'abc'"):
        _coerce({"score": "abc"}, fields, page=5)
