"""Oracle-differential test over the whole query registry at sf0.001.

This is the same gate the driver applies at sf0.01 (row-count + schema +
order-insensitive exact values vs DuckDB), run at smoke scale so the
suite stays fast. Queries without an oracle get a rows-run check.
"""

import pytest

from bigdata06_spark.queries import load_all_queries
from tests.conftest import SF_SMOKE
from tests.oracle_utils import assert_matches_oracle, duck_connection

SPECS = load_all_queries()


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_SMOKE)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(name, spark, duck):
    spec = SPECS[name]
    df = spec.fn(spark, SF_SMOKE)
    if spec.oracle is None:
        # rows-only: must run and produce a stable schema
        rows = df.collect()
        assert df.columns, f"{name}: no columns"
        assert rows is not None
    else:
        assert_matches_oracle(df, duck, spec.oracle)
