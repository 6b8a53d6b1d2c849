"""Local replica of the driver's correctness gate: every queries() entry
must match its oracle_sql() under DuckDB at sf0.001 (driver runs sf0.01)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from tests.parity import compare_query  # noqa: E402

SF = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")
QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_registry_consistency():
    assert set(ORACLES) <= set(QUERIES)
    assert len(QUERIES) >= 20


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.limit(5).collect()
    assert df.schema is not None and len(rows) > 0


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    if name not in ORACLES:
        pytest.skip("rows-only query (no SQL oracle)")
    diff = compare_query(spark, SF, QUERIES[name], ORACLES[name])
    assert diff is None, f"{name}: {diff}"
