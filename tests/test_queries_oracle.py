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


#: Queries whose TRUE answer is legitimately empty at the driver's
#: sf0.01 — each entry needs an in-code justification (VERDICT r8 #7:
#: the gate exists because two vacuity incidents — r6 phash, r8 heavy
#: hitters — shipped oracle-green rows that never exercised a
#: non-empty extraction at bench scale).
NONVACUITY_ALLOWLIST = {
    # Canonical TPC-H Q20 with its reference substitution parameters:
    # at sf<=0.01 no supplier holds excess stock of the named part
    # family in the pinned year. Changing the parameters would break
    # parity with the published query; non-empty from sf0.1 up.
    "q20_excess_suppliers",
}


def test_every_oracle_nonempty_at_driver_sf():
    """Registry-wide non-vacuity gate (VERDICT r8 #7): every oracle
    query must return >= 1 row at sf0.01 — the SF the external driver
    hash-gates — unless explicitly allowlisted with a justification.
    DuckDB-only (the differential test already proves Spark == oracle,
    so oracle non-empty implies query non-empty); whole-registry sweep
    runs in seconds."""
    con = duck_connection("/root/testdata/sf0.01")
    empty = [
        name
        for name, spec in sorted(SPECS.items())
        if spec.oracle is not None
        and name not in NONVACUITY_ALLOWLIST
        and not con.sql(f"SELECT 1 FROM ({spec.oracle}) LIMIT 1").fetchall()
    ]
    con.close()
    assert not empty, (
        f"oracle queries with an EMPTY true answer at sf0.01 (vacuous "
        f"driver gate — fix the fixture/threshold or justify in "
        f"NONVACUITY_ALLOWLIST): {empty}"
    )
