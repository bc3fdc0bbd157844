"""Property-based DIFFERENTIAL fuzzing of the relational core
(VERDICT r10 next #8).

The registry's 323 hand-written oracles prove the operators we thought
to write; this suite generates random COMPOSITIONS —
scan → join → filter → derive → aggregate/window → project — emitting
each plan BOTH as DataFrame operator chains (the engine surface under
test) and as ANSI SQL for DuckDB, then compares results with the same
canonical order-insensitive exact-value compare the driver gate uses.

Determinism discipline (the same rules the registry queries obey, see
queries/__init__.py): no double AGGREGATION (per-row IEEE arithmetic is
bit-identical across engines, float summation order is not), integer
arithmetic widened to BIGINT before +/-/* (Spark runs ANSI mode — an
int32 overflow would throw, and DuckDB widens differently), window
functions restricted to tie-stable ranks (rank/dense_rank by value,
never row_number without a unique key), and ORDER/PARTITION columns
restricted to non-nullable provenance (Spark sorts NULLS FIRST by
default where DuckDB sorts NULLS LAST).

Any divergence this suite ever finds gets minimized and pinned below in
`test_fuzz_regressions` (none found yet — the section exists so the
first finding has a home).
"""

from __future__ import annotations

import random

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bigdata06_spark.catalog import load_table
from tests.oracle_utils import assert_matches_oracle, duck_connection

SF = "/root/testdata/sf0.001"

# kinds: i=integer, d=double, s=string, t=timestamp.  nonneg marks raw
# integer columns safe under `%` (both engines truncate toward zero,
# which only agrees trivially when operands are non-negative).
TABLES = {
    "lineitem": {
        "l_orderkey": "i", "l_partkey": "i", "l_suppkey": "i",
        "l_linenumber": "i", "l_quantity": "d", "l_extendedprice": "d",
        "l_discount": "d", "l_tax": "d", "l_returnflag": "s",
        "l_linestatus": "s", "l_shipdate": "t",
    },
    "orders": {
        "o_orderkey": "i", "o_custkey": "i", "o_orderstatus": "s",
        "o_totalprice": "d", "o_orderdate": "t", "o_orderpriority": "s",
    },
    "customer": {
        "c_custkey": "i", "c_name": "s", "c_nationkey": "i",
        "c_acctbal": "d", "c_mktsegment": "s",
    },
    "supplier": {
        "s_suppkey": "i", "s_name": "s", "s_nationkey": "i",
        "s_acctbal": "d",
    },
    "part": {
        "p_partkey": "i", "p_name": "s", "p_brand": "s", "p_type": "s",
        "p_size": "i", "p_retailprice": "d",
    },
    "nation": {"n_nationkey": "i", "n_name": "s", "n_regionkey": "i"},
}

# (fact, dim, fact_key, dim_key) — column names are disjoint across
# TPC-H tables, so a join never shadows anything.
FKS = [
    ("lineitem", "orders", "l_orderkey", "o_orderkey"),
    ("lineitem", "part", "l_partkey", "p_partkey"),
    ("lineitem", "supplier", "l_suppkey", "s_suppkey"),
    ("orders", "customer", "o_custkey", "c_custkey"),
    ("customer", "nation", "c_nationkey", "n_nationkey"),
    ("supplier", "nation", "s_nationkey", "n_nationkey"),
]

_LOWCARD = {"l_returnflag", "l_linestatus", "o_orderstatus",
            "o_orderpriority", "c_mktsegment", "p_brand", "n_name"}


class Col:
    def __init__(self, name: str, kind: str, nullable: bool, nonneg: bool):
        self.name, self.kind = name, kind
        self.nullable, self.nonneg = nullable, nonneg


class Rel:
    """One plan state: the DataFrame chain and the equivalent SQL text."""

    def __init__(self, df: DataFrame, sql: str, cols: list[Col]):
        self.df, self.sql, self.cols = df, sql, cols

    def of_kind(self, *kinds: str, nonnull: bool = False) -> list[Col]:
        return [c for c in self.cols
                if c.kind in kinds and not (nonnull and c.nullable)]


def _base(spark, rng: random.Random, table: str) -> Rel:
    cols = [Col(n, k, nullable=False, nonneg=(k == "i"))
            for n, k in TABLES[table].items()]
    return Rel(load_table(spark, table, SF),
               f"SELECT * FROM {table}", cols)


def _join(spark, rng: random.Random, rel: Rel, base_table: str) -> Rel:
    opts = [fk for fk in FKS if fk[0] == base_table]
    if not opts:
        return rel
    _, dim, lk, rk = rng.choice(opts)
    how = rng.choice(["inner", "left", "left_semi", "left_anti"])
    right = _base(spark, rng, dim)
    if how in ("left_semi", "left_anti"):
        df = rel.df.join(right.df, rel.df[lk] == right.df[rk], how)
        neg = "NOT " if how == "left_anti" else ""
        sql = (f"SELECT * FROM ({rel.sql}) fz_l WHERE {neg}EXISTS "
               f"(SELECT 1 FROM ({right.sql}) fz_r WHERE fz_l.{lk} = fz_r.{rk})")
        return Rel(df, sql, rel.cols)
    df = rel.df.join(right.df, rel.df[lk] == right.df[rk], how)
    null_right = how == "left"
    cols = rel.cols + [Col(c.name, c.kind, c.nullable or null_right,
                           c.nonneg and not null_right)
                       for c in right.cols]
    sql = (f"SELECT * FROM ({rel.sql}) fz_l {how.upper()} JOIN "
           f"({right.sql}) fz_r ON fz_l.{lk} = fz_r.{rk}")
    return Rel(df, sql, cols)


def _filter(rng: random.Random, rel: Rel) -> Rel:
    cands = rel.cols
    c = rng.choice(cands)
    op = rng.choice(["<", "<=", ">", ">=", "=", "<>"])
    if c.kind == "i":
        if c.nonneg and rng.random() < 0.5:
            k, r = rng.randint(2, 9), rng.randint(0, 1)
            pred_sql = f"{c.name} % {k} {op} {r}"
            pred_df = _op(F.col(c.name) % k, op, F.lit(r))
        else:
            v = rng.choice([0, 1, 3, 7, 25, 100, 1000, 5000])
            pred_sql = f"{c.name} {op} {v}"
            pred_df = _op(F.col(c.name), op, F.lit(v))
    elif c.kind == "d":
        v = rng.choice([0.02, 0.05, 10.5, 900.0, 4500.25, 50000.0])
        pred_sql = f"{c.name} {op} {v!r}"
        pred_df = _op(F.col(c.name), op, F.lit(v))
    elif c.kind == "s":
        if rng.random() < 0.5:
            v = rng.choice("ABFMNOPR")
            pred_sql = f"{c.name} {op} '{v}'"
            pred_df = _op(F.col(c.name), op, F.lit(v))
        else:
            k, r = rng.randint(2, 5), rng.randint(0, 1)
            pred_sql = f"length({c.name}) % {k} {op} {r}"
            pred_df = _op(F.length(F.col(c.name)) % k, op, F.lit(r))
    else:  # timestamp
        v = rng.choice(["1993-06-30", "1995-03-15", "1997-01-01"])
        pred_sql = f"{c.name} {op} TIMESTAMP '{v} 00:00:00'"
        pred_df = _op(F.col(c.name), op, F.lit(v).cast("timestamp"))
    df = rel.df.filter(pred_df)
    sql = f"SELECT * FROM ({rel.sql}) fz_w WHERE {pred_sql}"
    return Rel(df, sql, rel.cols)


def _op(lhs, op: str, rhs):
    return {"<": lhs < rhs, "<=": lhs <= rhs, ">": lhs > rhs,
            ">=": lhs >= rhs, "=": lhs == rhs, "<>": lhs != rhs}[op]


def _derive(rng: random.Random, rel: Rel) -> Rel:
    """Add 1-2 derived columns (kept alongside everything)."""
    adds_df, adds_sql, new_cols = [], [], []
    for i in range(rng.randint(1, 2)):
        name = f"fz_d{i}"
        choice = rng.randint(0, 4)
        ints = rel.of_kind("i")
        dbls = rel.of_kind("d")
        strs = rel.of_kind("s")
        if choice == 0 and len(ints) >= 2:
            a, b = rng.sample(ints, 2)
            sym = rng.choice(["+", "-", "*"])
            adds_df.append(_op2(F.col(a.name).cast("long"), sym,
                                F.col(b.name).cast("long")).alias(name))
            adds_sql.append(f"CAST({a.name} AS BIGINT) {sym} "
                            f"CAST({b.name} AS BIGINT) AS {name}")
            new_cols.append(Col(name, "i", a.nullable or b.nullable, False))
        elif choice == 1 and dbls:
            a = rng.choice(dbls)
            b = rng.choice(dbls)
            sym = rng.choice(["+", "-", "*"])
            adds_df.append(_op2(F.col(a.name), sym, F.col(b.name)).alias(name))
            adds_sql.append(f"{a.name} {sym} {b.name} AS {name}")
            new_cols.append(Col(name, "d", a.nullable or b.nullable, False))
        elif choice == 2 and ints:
            a = rng.choice(ints)
            k = rng.randint(2, 9)
            adds_df.append(
                F.when(F.col(a.name).cast("long") % k == 0, F.lit("zero"))
                .otherwise(F.lit("rest")).alias(name))
            adds_sql.append(f"CASE WHEN CAST({a.name} AS BIGINT) % {k} = 0 "
                            f"THEN 'zero' ELSE 'rest' END AS {name}")
            new_cols.append(Col(name, "s", False, False))
        elif choice == 3 and strs:
            a = rng.choice(strs)
            fn = rng.choice(["upper", "lower"])
            adds_df.append(getattr(F, fn)(F.col(a.name)).alias(name))
            adds_sql.append(f"{fn}({a.name}) AS {name}")
            new_cols.append(Col(name, "s", a.nullable, False))
        elif strs:
            a = rng.choice(strs)
            adds_df.append(F.length(F.col(a.name)).cast("long").alias(name))
            adds_sql.append(f"CAST(length({a.name}) AS BIGINT) AS {name}")
            new_cols.append(Col(name, "i", a.nullable, True))
    if not adds_df:
        return rel
    df = rel.df.select("*", *adds_df)
    sql = f"SELECT *, {', '.join(adds_sql)} FROM ({rel.sql}) fz_p"
    return Rel(df, sql, rel.cols + new_cols)


def _op2(lhs, sym, rhs):
    return {"+": lhs + rhs, "-": lhs - rhs, "*": lhs * rhs}[sym]


def _aggregate(rng: random.Random, rel: Rel) -> Rel:
    keys = []
    key_pool = ([c for c in rel.cols if c.name in _LOWCARD]
                or rel.of_kind("s"))
    if key_pool and rng.random() < 0.9:
        keys = rng.sample(key_pool, min(len(key_pool), rng.randint(1, 2)))
    # optional derived integer bucket key
    gexprs_df = [F.col(k.name) for k in keys]
    gexprs_sql = [k.name for k in keys]
    out_cols = [Col(k.name, k.kind, k.nullable, k.nonneg) for k in keys]
    ints = rel.of_kind("i")
    if ints and rng.random() < 0.4:
        a = rng.choice(ints)
        k = rng.randint(2, 6)
        gexprs_df.append((F.col(a.name).cast("long") % k).alias("fz_gk"))
        gexprs_sql.append(f"CAST({a.name} AS BIGINT) % {k} AS fz_gk")
        out_cols.append(Col("fz_gk", "i", a.nullable, False))
    aggs_df, aggs_sql = [], []
    for i in range(rng.randint(1, 3)):
        name = f"fz_a{i}"
        pick = rng.randint(0, 3)
        if pick == 0:
            aggs_df.append(F.count(F.lit(1)).alias(name))
            aggs_sql.append(f"CAST(count(*) AS BIGINT) AS {name}")
            out_cols.append(Col(name, "i", False, True))
        elif pick == 1 and ints:
            a = rng.choice(ints)
            aggs_df.append(F.sum(F.col(a.name).cast("long")).alias(name))
            aggs_sql.append(f"CAST(sum(CAST({a.name} AS BIGINT)) "
                            f"AS BIGINT) AS {name}")
            out_cols.append(Col(name, "i", True, False))
        elif pick == 2:
            a = rng.choice(rel.cols)
            fn = rng.choice(["min", "max"])
            aggs_df.append(getattr(F, fn)(F.col(a.name)).alias(name))
            aggs_sql.append(f"{fn}({a.name}) AS {name}")
            out_cols.append(Col(name, a.kind, True, False))
        else:
            a = rng.choice(rel.cols)
            aggs_df.append(F.countDistinct(F.col(a.name)).alias(name))
            aggs_sql.append(f"CAST(count(DISTINCT {a.name}) AS BIGINT) "
                            f"AS {name}")
            out_cols.append(Col(name, "i", False, True))
    if gexprs_df:
        df = rel.df.groupBy(*gexprs_df).agg(*aggs_df)
        sql = (f"SELECT {', '.join(gexprs_sql + aggs_sql)} FROM "
               f"({rel.sql}) fz_g GROUP BY "
               f"{', '.join(str(i + 1) for i in range(len(gexprs_sql)))}")
    else:
        df = rel.df.agg(*aggs_df)
        sql = f"SELECT {', '.join(aggs_sql)} FROM ({rel.sql}) fz_g"
    return Rel(df, sql, out_cols)


def _window(rng: random.Random, rel: Rel) -> Rel:
    """Tie-stable ranking only: rank/dense_rank are functions of the
    ORDER-BY VALUE, so the (row, rank) multiset is deterministic even
    under ties — row_number is not, without a unique key."""
    parts = [c for c in rel.cols if c.name in _LOWCARD and not c.nullable]
    orders = rel.of_kind("i", "d", "t", nonnull=True)
    if not parts or not orders:
        return rel
    p, o = rng.choice(parts), rng.choice(orders)
    fn = rng.choice(["rank", "dense_rank"])
    desc = rng.random() < 0.5
    w = Window.partitionBy(p.name).orderBy(
        F.col(o.name).desc() if desc else F.col(o.name))
    df = rel.df.withColumn("fz_w", getattr(F, fn)().over(w).cast("long"))
    sql = (f"SELECT *, CAST({fn}() OVER (PARTITION BY {p.name} ORDER BY "
           f"{o.name}{' DESC' if desc else ''}) AS BIGINT) AS fz_w "
           f"FROM ({rel.sql}) fz_v")
    return Rel(df, sql, rel.cols + [Col("fz_w", "i", False, True)])


def _project(rng: random.Random, rel: Rel) -> Rel:
    keep = rng.sample(rel.cols, min(len(rel.cols), rng.randint(1, 6)))
    df = rel.df.select(*[c.name for c in keep])
    sql = f"SELECT {', '.join(c.name for c in keep)} FROM ({rel.sql}) fz_f"
    return Rel(df, sql, keep)


def build_plan(spark, seed: int) -> Rel:
    rng = random.Random(seed)
    base = rng.choice(list(TABLES))
    rel = _base(spark, rng, base)
    if rng.random() < 0.6:
        rel = _join(spark, rng, rel, base)
    for _ in range(rng.randint(0, 2)):
        rel = _filter(rng, rel)
    if rng.random() < 0.5:
        rel = _derive(rng, rel)
    branch = rng.random()
    if branch < 0.55:
        rel = _aggregate(rng, rel)
    elif branch < 0.8:
        rel = _window(rng, rel)
    if rng.random() < 0.7:
        rel = _project(rng, rel)
    return rel


_N_PLANS = 200


@settings(max_examples=_N_PLANS, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(seed=st.integers(min_value=0, max_value=2**32 - 1))
def test_fuzz_relational_matches_duckdb(spark, seed):
    con = _con_cache(spark)
    rel = build_plan(spark, seed)
    assert_matches_oracle(rel.df, con, rel.sql)


_CON = {}


def _con_cache(spark):
    if "con" not in _CON:
        _CON["con"] = duck_connection(SF)
    return _CON["con"]


# ---------------------------------------------------------------- pinned
# Minimized regressions from fuzz findings land here as deterministic
# seeds/plans.  None found yet.
def test_fuzz_regressions(spark):
    con = _con_cache(spark)
    for seed in []:  # populated if the fuzzer ever finds a divergence
        rel = build_plan(spark, seed)
        assert_matches_oracle(rel.df, con, rel.sql)
