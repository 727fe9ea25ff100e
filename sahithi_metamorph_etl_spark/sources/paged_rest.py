"""Paged-REST DataSource (SURVEY.md §4's named custom-source candidate).

The reference ingests REST APIs driver-side (`utils.py:34-105`: fetch
everything into Python lists, then ``createDataFrame``), which caps
ingestion at one machine's bandwidth and memory. This module implements
the real fix on Spark 4's Python DataSource API
(``pyspark.sql.datasource``): **one input partition per page**, fetched
ON THE EXECUTORS — a 1000-page API pulls through the cluster, not
through the driver, and Spark's scheduler gives retry/speculation per
page for free.

Usage::

    spark.dataSource.register(PagedRestDataSource)
    df = (spark.read.format("paged_rest")
          .schema("id bigint, name string")
          .option("base_url", "https://api.example.com")
          .option("endpoint", "items")
          .option("n_pages", "40")
          .option("bearer_token", token)   # minted driver-side, e.g. TokenClient
          .load())

Transports:
- default: HTTP GET via ``requests`` (imported lazily on the executor),
  ``{base_url}/{endpoint}?{page_param}={i}&{size_param}={page_size}``
  with optional bearer auth. Responses are a JSON array of records, or
  an object holding one under ``records_path``.
- ``fixture_dir``: offline replay — each page read from
  ``{fixture_dir}/page_{i}.json``. This is not only the test seam: a
  captured API snapshot replays through the identical partition fan-out.

Auth note: a bearer token is minted ONCE driver-side (see
``rest.TokenClient``) and shipped as an option; executors never hold
credentials beyond it. For token lifetimes shorter than the read, front
the API with a gateway — per-task re-auth would hammer the token
endpoint from every partition.

``n_pages`` is explicit: the planner must know the fan-out without an
API round trip (a count endpoint or a generous upper bound both work —
pages past the end yield empty arrays and cost one request).
"""

from __future__ import annotations

import json
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class PagePartition(InputPartition):
    def __init__(self, page: int):
        self.page = page


class PagedRestCoercionError(ValueError):
    """A JSON value that cannot represent its schema type, with the
    page/field context a per-task stack trace otherwise loses."""


def _coerce(record: dict, fields, page: int | None = None) -> tuple:
    """Project a JSON record onto the schema's column order; missing
    keys become NULL (the explicit-contract discipline of
    sources.readers.read_csv — no inference, no reordering surprises).

    Coercion is strict, never lossy: a non-integral number in an
    integer-typed field (1.9), or a non-numeric string in a numeric
    field, raises :class:`PagedRestCoercionError` naming the page and
    field instead of silently truncating or failing mid-partition with
    a bare ValueError."""
    out = []
    for f in fields:
        v = record.get(f.name)
        if v is not None:
            t = f.dataType.typeName()
            try:
                if t in ("long", "integer", "short", "byte"):
                    iv = int(v)  # raises for non-numeric strings
                    if isinstance(v, float) and iv != v:
                        raise ValueError(f"non-integral value {v!r}")  # 1.9 -> 1 loses data
                    v = iv
                elif t in ("double", "float"):
                    v = float(v)
                elif t == "string" and not isinstance(v, str):
                    v = json.dumps(v)  # nested objects land as JSON text
                elif t == "boolean":
                    v = bool(v)
            except (TypeError, ValueError) as e:
                raise PagedRestCoercionError(
                    f"page {page}: field {f.name!r} ({t}): cannot coerce {v!r}: {e}"
                ) from e
        out.append(v)
    return tuple(out)


class PagedRestReader(DataSourceReader):
    def __init__(self, schema, options: dict):
        self.schema_ = schema
        self.options = options
        n_pages = int(options.get("n_pages", "0"))
        if n_pages <= 0:
            raise ValueError(
                "paged_rest requires n_pages > 0 (an upper bound is fine: "
                "pages past the end yield empty arrays)"
            )
        self.n_pages = n_pages

    def partitions(self) -> Sequence[InputPartition]:
        return [PagePartition(p) for p in range(self.n_pages)]

    # runs ON THE EXECUTOR, one call per page partition
    def read(self, partition: PagePartition) -> Iterator[tuple]:
        opts = self.options
        page = partition.page
        fixture_dir = opts.get("fixture_dir")
        if fixture_dir:
            import os

            path = os.path.join(fixture_dir, f"page_{page}.json")
            if not os.path.exists(path):
                return
            with open(path, encoding="utf-8") as fh:
                payload = json.load(fh)
        else:
            import requests  # lazy: executors without the dep fail loudly here

            base = opts["base_url"].rstrip("/")
            endpoint = opts.get("endpoint", "").lstrip("/")
            params = {
                opts.get("page_param", "page"): str(page),
            }
            if "page_size" in opts:
                params[opts.get("size_param", "page_size")] = opts["page_size"]
            headers = {}
            if opts.get("bearer_token"):
                headers["Authorization"] = f"Bearer {opts['bearer_token']}"
            resp = requests.get(f"{base}/{endpoint}", params=params, headers=headers,
                                timeout=float(opts.get("timeout_sec", "30")))
            if resp.status_code != 200:
                raise RuntimeError(
                    f"paged_rest: page {page} returned HTTP {resp.status_code}"
                )
            payload = resp.json()
        records_path = self.options.get("records_path")
        if records_path:
            for key in records_path.split("."):
                payload = payload[key]
        if not isinstance(payload, list):
            raise ValueError(
                f"paged_rest: page {page} did not yield a JSON array "
                f"(got {type(payload).__name__}; set records_path?)"
            )
        fields = self.schema_.fields
        for rec in payload:
            yield _coerce(rec, fields, page=page)


class PagedRestDataSource(DataSource):
    """``spark.read.format("paged_rest")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "paged_rest"

    def schema(self) -> str:
        # no inference by design: the caller's .schema(...) is the
        # contract. A "schema" option is accepted as a fallback.
        s = self.options.get("schema")
        if not s:
            raise ValueError(
                "paged_rest needs an explicit schema: pass .schema(ddl) on the "
                "reader or a schema option — the source does not infer"
            )
        return s

    def reader(self, schema) -> PagedRestReader:
        return PagedRestReader(schema, dict(self.options))
