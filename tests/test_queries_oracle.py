"""Local twin of the driver's correctness gate: every registry query must
match its DuckDB oracle (row count, schema, order-insensitive values) at
sf0.001; entries without an oracle must at least run and return rows."""

import pytest

from blabel_spark.oracle_harness import compare
from blabel_spark.queries import ORACLES, QUERIES

SF = "/root/testdata/sf0.001"


def test_every_query_has_registry_consistency():
    # every registered query has a driver-checkable oracle
    assert set(ORACLES) == set(QUERIES)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    ok, detail = compare(spark, SF, name)
    assert ok, f"{name}: {detail}"


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod
    df = entrymod.entry(spark)
    assert df.columns == ["graph_id", "subj", "pred", "obj"]
    assert df.count() > 0
