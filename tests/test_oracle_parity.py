"""Every catalog query with an oracle must hash-match DuckDB at sf0.001
(fast inner loop; the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from sahithi_metamorph_etl_spark.queries.catalog import all_queries, get_query
from .oracle import assert_matches_oracle

_NAMES = sorted(all_queries())


@pytest.mark.parametrize("name", _NAMES)
def test_query_matches_oracle(spark, sf_dir, name):
    q = get_query(name)
    df = q.fn(spark, sf_dir)
    if q.oracle is None:
        # rows-only check, mirroring the driver's weaker gate
        n = df.count()
        assert n >= 0 and len(df.schema.fields) > 0
    else:
        assert_matches_oracle(df, q.oracle, sf_dir, name=name)
