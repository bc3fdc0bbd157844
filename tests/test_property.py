"""Property-based tests (hypothesis): semantics that must hold for
ARBITRARY inputs, not just the fixture corpus. Each example ships a
whole LIST of rows through one Spark job (per-example JVM round-trips
dominate, so few examples × many rows beats many × few); deadlines are
off because Spark job latency is noisy.
"""

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

PROP = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

# doubles on the exact-decimal grid the engine's determinism rules
# assume (≤6 decimals, bounded magnitude — money-like values)
money = st.integers(min_value=-(10**12), max_value=10**12).map(lambda i: i / 1e6)


@PROP
@given(vals=st.lists(money, min_size=1, max_size=60), n=st.integers(0, 6))
def test_rnd_matches_duckdb_halfup(spark, vals, n):
    """`qutil.rnd` (the floor(x·10^n + 0.5)/10^n half-up) must be
    bit-identical in Spark and DuckDB for every representable input —
    the invariant every rounded oracle in the registry leans on."""
    from bigdata06_spark.queries.qutil import rnd, rnd_sql

    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    got = [r.y for r in df.select(rnd(F.col("x"), n).alias("y")).collect()]
    con = duckdb.connect()
    exp = [
        con.sql(f"SELECT {rnd_sql('x', n)} AS y FROM (SELECT unnest(?::DOUBLE[]) AS x)",
                params=[vals]).df()["y"].tolist()
    ][0]
    assert got == exp


@PROP
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 1000), st.integers(-100, 100)),
        min_size=1,
        max_size=80,
    )
)
def test_dedup_first_wins_is_min_by_order(spark, rows):
    """R1 determinism: for any multiset of (key, order, value) rows,
    dedup keeps exactly the row with the smallest (order, value) per
    key — the reference's arrival-order 'first', made reproducible."""
    from bigdata06_spark.operators.relational import dedup_first_wins

    df = spark.createDataFrame(rows, ["k", "ord", "v"])
    got = {
        (r.k, r.ord, r.v)
        for r in dedup_first_wins(df, ["k"], [F.col("ord"), F.col("v")]).collect()
    }
    expected = {}
    for k, o, v in sorted(rows, key=lambda t: (t[1], t[2])):
        expected.setdefault(k, (k, o, v))
    assert got == set(expected.values())


@PROP
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(-1000, 1000)), min_size=1, max_size=100
    ),
    n_salts=st.integers(2, 9),
)
def test_salted_agg_equals_direct(spark, rows, n_salts):
    """Skew salting must be a pure plan transformation: two-phase
    salted aggregation == direct groupBy for ANY input and salt
    count (including heavily duplicated hot keys)."""
    from bigdata06_spark.operators.scale import salted_agg

    df = spark.createDataFrame(rows, ["k", "v"])
    direct = {
        (r.k, r.v_sum, r.v_count, r.v_min, r.v_max)
        for r in df.groupBy("k")
        .agg(
            F.sum("v").alias("v_sum"),
            F.count("v").alias("v_count"),
            F.min("v").alias("v_min"),
            F.max("v").alias("v_max"),
        )
        .collect()
    }
    salted = {
        (r.k, r.v_sum, r.v_count, r.v_min, r.v_max)
        for r in salted_agg(
            df, "k", {"v": "sum"}, n_salts=n_salts
        ).join(
            salted_agg(df, "k", {"v": "count"}, n_salts=n_salts), "k"
        ).join(
            salted_agg(df, "k", {"v": "min"}, n_salts=n_salts), "k"
        ).join(
            salted_agg(df, "k", {"v": "max"}, n_salts=n_salts), "k"
        ).collect()
    }
    assert salted == direct
