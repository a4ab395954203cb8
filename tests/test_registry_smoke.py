"""Every registered query runs at sf0.001 and returns a stable schema.

This is the cheap half of the correctness gate (the driver's entry()
smoke); the oracle comparison lives in test_oracle_parity.py.
"""

from __future__ import annotations

import pytest

from datafusion_spark.queries import ORACLES, QUERIES
from tests.conftest import SF_SMALL


def test_registry_nonempty():
    assert len(QUERIES) >= 80
    # every oracle belongs to a registered query
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs(spark, name):
    df = QUERIES[name](spark, SF_SMALL)
    rows = df.collect()
    assert rows is not None
    assert len(df.columns) > 0
    # stable schema: re-planning yields identical columns
    df2 = QUERIES[name](spark, SF_SMALL)
    assert df.columns == df2.columns
