"""Every oracle-checkable query must match DuckDB exactly at sf0.001 —
the local mirror of the driver's sf0.01 gate."""

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMALL
from tests.oracle_harness import compare

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, name):
    assert name in QUERIES, f"oracle {name} has no query"
    df = QUERIES[name](spark, SF_SMALL)
    ok, msg = compare(df, ORACLES[name], SF_SMALL)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_SMALL)
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
