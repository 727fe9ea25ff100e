"""Pipeline runner (reference entry point 1) tests: the generic DAG
executor's ordering/retry/skip semantics, plus the full
ingestion→marts flow end-to-end on sf0.001 with the Q1 quality gates."""

from __future__ import annotations

import pytest

from sahithi_metamorph_etl_spark.core.pipeline import (
    PipelineFailure,
    PipelineTask,
    run_pipeline,
)
from sahithi_metamorph_etl_spark.marts import RUN_DATE
from sahithi_metamorph_etl_spark.marts import flow as flow_mod
from sahithi_metamorph_etl_spark.marts.flow import run_metamorph_pipeline
from sahithi_metamorph_etl_spark.sinks.warehouse import LayeredWarehouse
from sahithi_metamorph_etl_spark.validators.checks import DuplicateKeyError


def _t(name, fn, deps=(), **kw):
    return PipelineTask(name, fn, deps=tuple(deps), **kw)


def test_runs_in_dependency_order_and_passes_results():
    log = []
    runs = run_pipeline(
        [
            # declared out of order on purpose
            _t("c", lambda up: log.append("c") or up["a"] + up["b"], deps=["a", "b"]),
            _t("a", lambda up: log.append("a") or 1),
            _t("b", lambda up: log.append("b") or 2),
        ]
    )
    assert log == ["a", "b", "c"]
    assert runs["c"].result == 3
    assert all(r.status == "success" for r in runs.values())


def test_retries_then_succeeds():
    calls = []

    def flaky(_):
        calls.append(1)
        if len(calls) < 3:
            raise RuntimeError("transient")
        return "ok"

    runs = run_pipeline([_t("x", flaky, retries=3, retry_delay_s=60)], sleep=lambda s: None)
    assert runs["x"].status == "success"
    assert runs["x"].attempts == 3


def test_failure_skips_downstream_but_runs_independent_branch():
    ran = []

    def boom(_):
        raise RuntimeError("hard failure")

    with pytest.raises(PipelineFailure) as ei:
        run_pipeline(
            [
                _t("bad", boom, retries=1),
                _t("child", lambda up: ran.append("child"), deps=["bad"]),
                _t("grandchild", lambda up: ran.append("gc"), deps=["child"]),
                _t("other", lambda up: ran.append("other")),
            ]
        )
    runs = ei.value.runs
    assert runs["bad"].status == "failed" and runs["bad"].attempts == 2
    assert runs["child"].status == "skipped"
    assert runs["grandchild"].status == "skipped"
    assert runs["other"].status == "success"
    assert ran == ["other"]


def test_cycle_and_unknown_dep_rejected():
    with pytest.raises(ValueError, match="cycle"):
        run_pipeline([_t("a", lambda u: 1, deps=["b"]), _t("b", lambda u: 1, deps=["a"])])
    with pytest.raises(ValueError, match="unknown"):
        run_pipeline([_t("a", lambda u: 1, deps=["ghost"])])
    with pytest.raises(ValueError, match="duplicate"):
        run_pipeline([_t("a", lambda u: 1), _t("a", lambda u: 2)])


def test_metamorph_pipeline_end_to_end(spark, sf_dir, tmp_path):
    root = str(tmp_path / "wh")
    runs = run_metamorph_pipeline(spark, sf_dir, root, RUN_DATE)
    assert [n for n, r in runs.items() if r.status == "success"] == [
        "ingest_suppliers",
        "ingest_products",
        "ingest_customers",
        "ingest_sales",
        "supplier_performance",
        "product_performance",
        "customer_sales_report",
    ]
    wh = LayeredWarehouse(root)
    report = wh.read_legacy(spark, "customer_sales_report", RUN_DATE)
    assert report.limit(1).count() == 1
    for c in ("CUSTOMER_ID", "LOYALTY_TIER", "DAY_DT"):
        assert c in report.columns
    # the supplier mart slice the customer mart consumed is also landed
    assert wh.read_legacy(spark, "supplier_performance", RUN_DATE).limit(1).count() == 1


def test_metamorph_pipeline_q1_gate_fires(spark, sf_dir, tmp_path, monkeypatch):
    real = flow_mod.tpch_entities

    def with_dup_suppliers(s, d):
        e = real(s, d)
        e["suppliers"] = e["suppliers"].unionAll(e["suppliers"].limit(1))
        return e

    monkeypatch.setattr(flow_mod, "tpch_entities", with_dup_suppliers)
    with pytest.raises(PipelineFailure) as ei:
        run_metamorph_pipeline(spark, sf_dir, str(tmp_path / "wh2"), RUN_DATE)
    runs = ei.value.runs
    assert runs["ingest_suppliers"].status == "failed"
    assert isinstance(runs["ingest_suppliers"].error, DuplicateKeyError)
    # sales depends on ALL ingests -> skipped; independent ingests ran
    assert runs["ingest_sales"].status == "skipped"
    assert runs["customer_sales_report"].status == "skipped"
    assert runs["ingest_products"].status == "success"


def test_upsert_legacy_merges_keys_and_preserves_other_days(spark, sf_dir, tmp_path):
    """Keyed MERGE into one legacy day: same-key rows replaced, other
    keys kept, new keys inserted, OTHER day partitions untouched, and
    the bootstrap path (no table yet) just writes."""
    import datetime as dt

    from pyspark.sql import functions as F

    from sahithi_metamorph_etl_spark.sinks.warehouse import LayeredWarehouse

    wh = LayeredWarehouse(str(tmp_path / "wh"))
    d1, d2 = dt.date(2025, 7, 1), dt.date(2025, 7, 2)
    base = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderkey", "o_totalprice")
        .limit(200)
    )
    # bootstrap (empty root) + a second, must-stay-untouched day
    wh.upsert_legacy(base, "orders_state", ["o_orderkey"], d1)
    wh.append_legacy(base.limit(50), "orders_state", d2)

    updates = (
        base.filter(F.col("o_orderkey") % 3 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") + 100)
    )
    inserts = base.limit(10).select(
        (F.col("o_orderkey") + 100_000_000).alias("o_orderkey"),
        (F.col("o_totalprice") + 1000).alias("o_totalprice"),
    )
    wh.upsert_legacy(updates.unionByName(inserts), "orders_state", ["o_orderkey"], d1)

    day1 = wh.read_legacy(spark, "orders_state", run_date=d1)
    n_base, n_upd, n_ins = base.count(), updates.count(), 10
    assert day1.count() == n_base + n_ins
    # updated keys carry the new price
    merged = {r["o_orderkey"]: r["o_totalprice"] for r in day1.collect()}
    for r in base.collect():
        want = r["o_totalprice"] + 100 if r["o_orderkey"] % 3 == 0 else r["o_totalprice"]
        assert abs(merged[r["o_orderkey"]] - want) < 1e-9
    # other day untouched
    assert wh.read_legacy(spark, "orders_state", run_date=d2).count() == 50
    # layout guard still applies (no silent mixing with stream layout)
    import pytest as _pytest

    q = wh.stream_to_legacy.__doc__  # doc presence sanity
    assert "INCOMPATIBLE" in q
    with _pytest.raises(ValueError):
        wh2 = LayeredWarehouse(str(tmp_path / "wh"))
        wh2._assert_legacy_layout(spark, "orders_state", batched=True)


def test_read_legacy_merge_schema_evolution(spark, sf_dir, tmp_path):
    """Additive schema evolution across days: a column added on day 2
    must surface (null-backfilled) for day-1 rows under
    merge_schema=True, and day-2 reads must carry it either way."""
    import datetime as dt

    from pyspark.sql import functions as F

    from sahithi_metamorph_etl_spark.sinks.warehouse import LayeredWarehouse

    wh = LayeredWarehouse(str(tmp_path / "wh"))
    base = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    ).limit(20)
    wh.append_legacy(base, "orders_evo", dt.date(2025, 7, 1))
    wh.append_legacy(
        base.withColumn("o_channel", F.lit("web")), "orders_evo", dt.date(2025, 7, 2)
    )

    merged = wh.read_legacy(spark, "orders_evo", merge_schema=True)
    assert "o_channel" in merged.columns
    assert merged.count() == 40
    d1 = merged.filter(F.col("DAY_DT") == "2025-07-01")
    assert d1.filter(F.col("o_channel").isNull()).count() == 20
    d2 = merged.filter(F.col("DAY_DT") == "2025-07-02")
    assert d2.filter(F.col("o_channel") == "web").count() == 20


def test_upsert_legacy_refuses_stray_day_rows(spark, sf_dir, tmp_path):
    """An incoming frame carrying rows for a DIFFERENT day than the
    merge target must be refused: dynamic overwrite would replace that
    whole other day with just the strays (silent data loss)."""
    import datetime as dt

    import pytest as _pytest
    from pyspark.sql import functions as F

    from sahithi_metamorph_etl_spark.sinks.warehouse import LayeredWarehouse

    wh = LayeredWarehouse(str(tmp_path / "wh"))
    d1, d2 = dt.date(2025, 7, 1), dt.date(2025, 7, 2)
    base = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    ).limit(20)
    wh.upsert_legacy(base, "t", ["o_orderkey"], d1)
    wh.append_legacy(base, "t", d2)

    mixed = base.limit(2).withColumn(
        "DAY_DT",
        F.when(F.col("o_orderkey") % 2 == 0, F.lit(d2.isoformat()))
        .otherwise(F.lit(d1.isoformat()))
        .cast("date"),
    )
    with _pytest.raises(ValueError, match="different"):
        wh.upsert_legacy(mixed, "t", ["o_orderkey"], d1)
    # both days intact after the refusal
    assert wh.read_legacy(spark, "t", run_date=d1).count() == 20
    assert wh.read_legacy(spark, "t", run_date=d2).count() == 20


def test_upsert_legacy_null_day_and_mixed_layout_guards(spark, sf_dir, tmp_path):
    """NULL DAY_DT rows must trip the stray-day guard (plain != lets
    NULL through into the hive default partition), and an externally
    mixed-layout table must be refused by every writer regardless of
    directory listing order."""
    import datetime as dt
    import os

    import pytest as _pytest
    from pyspark.sql import functions as F

    from sahithi_metamorph_etl_spark.sinks.warehouse import LayeredWarehouse

    wh = LayeredWarehouse(str(tmp_path / "wh"))
    d1 = dt.date(2025, 7, 1)
    base = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    ).limit(10)
    wh.upsert_legacy(base, "t", ["o_orderkey"], d1)

    with_null = base.limit(2).withColumn(
        "DAY_DT",
        F.when(F.col("o_orderkey") % 2 == 0, F.lit(None)).otherwise(
            F.lit(d1.isoformat())
        ).cast("date"),
    )
    with _pytest.raises(ValueError, match="different"):
        wh.upsert_legacy(with_null, "t", ["o_orderkey"], d1)

    # corrupt the table into a mixed layout: add a batched-looking day
    legacy_root = str(tmp_path / "wh" / "legacy" / "t")
    fake = os.path.join(legacy_root, "DAY_DT=2025-07-09", "__BATCH_ID=0")
    os.makedirs(fake)
    assert wh._legacy_layout(spark, "t") == "mixed"
    for attempt in (
        lambda: wh.append_legacy(base, "t", d1),
        lambda: wh.upsert_legacy(base, "t", ["o_orderkey"], d1),
        lambda: wh.write_legacy(base, "t", d1),
    ):
        with _pytest.raises(ValueError, match="mixes"):
            attempt()


def test_upsert_legacy_preserves_schema_evolution(spark, sf_dir, tmp_path):
    """Merging into a day whose files carry an evolved column must keep
    that column (mergeSchema read), and an incoming frame introducing a
    NEW column must persist it null-backfilled for kept rows."""
    import datetime as dt

    from pyspark.sql import functions as F

    from sahithi_metamorph_etl_spark.sinks.warehouse import LayeredWarehouse

    wh = LayeredWarehouse(str(tmp_path / "wh"))
    d1 = dt.date(2025, 7, 1)
    base = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    ).limit(10)
    # day lands in two appends with different schemas (additive evolution)
    wh.append_legacy(base.limit(5), "t", d1)
    wh.append_legacy(
        base.filter(F.col("o_orderkey") > 0).exceptAll(base.limit(5))
        .withColumn("o_channel", F.lit("web")),
        "t", d1,
    )
    # upsert brings a brand-new column of its own
    upd = base.limit(2).withColumn("o_note", F.lit("merged"))
    wh.upsert_legacy(upd, "t", ["o_orderkey"], d1)
    back = wh.read_legacy(spark, "t", run_date=d1, merge_schema=True)
    assert {"o_channel", "o_note"} <= set(back.columns)
    assert back.count() == 10
    assert back.filter(F.col("o_note") == "merged").count() == 2
    assert back.filter(F.col("o_channel") == "web").count() == 5


def test_top_selling_products_matches_full_mart_derivation(spark, sf_dir):
    """build_top_selling_products (the r10 trimmed path the customer
    mart composes) must produce EXACTLY the distinct non-null
    TOP_SELLING_PRODUCT set of the full supplier mart — the claim its
    docstring makes and the CSR oracle implicitly hash-checks."""
    import datetime as dt

    from pyspark.sql import functions as F

    from sahithi_metamorph_etl_spark.marts import tpch_entities
    from sahithi_metamorph_etl_spark.marts.supplier_performance import (
        build_supplier_performance,
        build_top_selling_products,
    )

    e = tpch_entities(spark, sf_dir)
    full = sorted(
        r[0]
        for r in build_supplier_performance(
            e["sales"], e["products"], e["suppliers"], dt.date(2026, 1, 1)
        )
        .select("TOP_SELLING_PRODUCT")
        .where(F.col("TOP_SELLING_PRODUCT").isNotNull())
        .distinct()
        .collect()
    )
    trimmed = sorted(
        r[0]
        for r in build_top_selling_products(
            e["sales"], e["products"], e["suppliers"]
        ).collect()
    )
    assert trimmed == full and len(full) > 0
