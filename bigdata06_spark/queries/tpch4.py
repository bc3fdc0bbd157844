"""Fourth wave of TPC-H-shaped queries — the remaining six shapes
(Q2, Q8, Q11, Q15, Q16, Q20), completing adapted coverage of all 22.

The driver schema has no `partsupp`, so part↔supplier relationships
are derived from the lineitem bridge (`SELECT DISTINCT l_partkey,
l_suppkey FROM lineitem`) and supply cost/stock metrics are proxied by
lineitem revenue/quantity. Every query keeps the ORIGINAL'S plan
shape: correlated-min decorrelation (Q2), two-level share aggregation
(Q8), scalar-threshold semijoin (Q11), max-of-aggregate selection
(Q15), NOT-IN + count-distinct grouping (Q16), nested IN with a
HAVING-style quantity floor (Q20).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata06_spark.catalog import load_table
from bigdata06_spark.queries import register
from bigdata06_spark.queries.qutil import dsum, dsum_sql

_PS_BRIDGE_SQL = "SELECT DISTINCT l_partkey, l_suppkey FROM lineitem"


def _ps_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The part↔supplier bridge (stand-in for partsupp): distinct
    (partkey, suppkey) pairs observed in lineitem. One shuffle on the
    pair; at 100 TB this is the materialize-once candidate (bucketed by
    partkey) since every Q2/Q16/Q20-family query reuses it."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.select("l_partkey", "l_suppkey").distinct()


@register(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH ps AS ({_PS_BRIDGE_SQL}),
    cand AS (
      SELECT ps.l_partkey, s.s_name, s.s_acctbal, n.n_name
      FROM ps JOIN supplier s ON ps.l_suppkey = s.s_suppkey
              JOIN nation n ON s.s_nationkey = n.n_nationkey
    ),
    m AS (SELECT l_partkey, min(s_acctbal) AS min_bal FROM cand GROUP BY l_partkey)
    SELECT p.p_partkey, p.p_name, c.s_name, c.s_acctbal, c.n_name
    FROM part p
      JOIN cand c ON c.l_partkey = p.p_partkey
      JOIN m ON m.l_partkey = p.p_partkey AND c.s_acctbal = m.min_bal
    WHERE p.p_size = 25 AND p.p_type = 'STANDARD'
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each qualifying part, the supplier(s) with
    the minimum balance among its suppliers — a correlated MIN subquery
    decorrelated as a WINDOW min over the candidate relation (one
    shuffle on partkey) rather than aggregate-plus-self-join (which
    shuffles the same relation twice more on compound keys); ties kept
    like the original. part is pre-filtered then broadcast. (Cost
    proxy: s_acctbal for ps_supplycost — no partsupp in the driver
    schema.)"""
    from pyspark.sql import Window

    p = load_table(spark, "part", sf_dir).filter(
        (F.col("p_size") == 25) & (F.col("p_type") == "STANDARD")
    )
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    cand = (
        _ps_bridge(spark, sf_dir)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("l_partkey", "s_name", "s_acctbal", "n_name")
    )
    w = Window.partitionBy("l_partkey")
    return (
        cand.withColumn("min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .select("p_partkey", "p_name", "s_name", "s_acctbal", "n_name")
    )


@register(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           {dsum_sql("CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0.0 END")}
             / {dsum_sql('volume')} AS mkt_share
    FROM (
      SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
        JOIN region r ON n1.n_regionkey = r.r_regionkey
        JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of PROMO-part revenue sold into
    ASIA customers, per year — conditional-sum ratio over a 7-table
    star. Every dimension broadcasts (region→nation pre-join prunes
    customers map-side); lineitem⋈orders is the single real shuffle."""
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir).filter(F.col("p_type") == "PROMO")
    o = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    c = load_table(spark, "customer", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA")
    n1 = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        F.col("n_nationkey").alias("cust_nkey")
    )
    n2 = n.select(F.col("n_nationkey").alias("supp_nkey"), F.col("n_name").alias("supp_nation"))
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    flat = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("cust_nkey"), "left_semi")
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("supp_nkey"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            volume.alias("volume"),
            "supp_nation",
        )
    )
    nation_vol = F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(F.lit(0.0))
    return flat.groupBy("o_year").agg(
        (dsum(nation_vol) / dsum(F.col("volume"))).alias("mkt_share")
    )


@register(
    "q11_important_parts",
    oracle=f"""
    WITH v AS (
      SELECT l.l_partkey, {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS value
      FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_5'
      GROUP BY l.l_partkey
    ),
    t AS (SELECT CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) * 0.001 AS thr FROM v)
    SELECT v.l_partkey AS p_partkey, v.value
    FROM v, t WHERE v.value > t.thr
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose (one nation's) revenue exceeds a
    fraction of that nation's total — a scalar-subquery threshold over
    a grouped aggregate. The per-part aggregate is computed ONCE; its
    own re-aggregation gives the threshold (broadcast as a 1-row cross
    join). Value proxy: lineitem revenue for ps_supplycost*ps_availqty."""
    li = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir).filter(F.col("n_name") == "NATION_5")
    v = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey, "left_semi")
        .groupBy("l_partkey")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("value"))
    )
    t = v.agg(
        (F.sum(F.col("value").cast("decimal(25,6)")).cast("double") * 0.001).alias("thr")
    )
    return (
        v.crossJoin(F.broadcast(t))
        .filter(F.col("value") > F.col("thr"))
        .select(F.col("l_partkey").alias("p_partkey"), "value")
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey, {dsum_sql('l_extendedprice * (1 - l_discount)')} AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    ),
    m AS (SELECT max(total_rev) AS mx FROM rev)
    SELECT s.s_suppkey, s.s_name, rev.total_rev
    FROM supplier s JOIN rev ON s.s_suppkey = rev.l_suppkey, m
    WHERE rev.total_rev = m.mx
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue — the
    view + scalar MAX subquery shape (ties preserved, unlike an
    orderBy/limit 1). The revenue aggregate is computed once; the max
    re-aggregates it and broadcasts back. Decimal sums make the
    equality comparison exact cross-engine."""
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    s = load_table(spark, "supplier", sf_dir)
    rev = li.groupBy("l_suppkey").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_rev")
    )
    m = rev.agg(F.max("total_rev").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(m))
        .filter(F.col("total_rev") == F.col("mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev")
    )


@register(
    "q16_supplier_count",
    oracle=f"""
    WITH ps AS ({_PS_BRIDGE_SQL})
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT ps.l_suppkey) AS supplier_cnt
    FROM ps JOIN part p ON p.p_partkey = ps.l_partkey
    WHERE p.p_brand <> 'Brand#5'
      AND p.p_size IN (1, 5, 10, 15, 20, 25)
      AND ps.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per (brand, type,
    size) excluding flagged suppliers — NOT IN as a broadcast anti-join
    (the excluded set is small by construction; an anti-join is the
    NULL-safe decorrelation since s_suppkey is non-null). Exclusion
    proxy: negative balance for the original's complaint-comment scan."""
    p = load_table(spark, "part", sf_dir).filter(
        (F.col("p_brand") != "Brand#5") & F.col("p_size").isin(1, 5, 10, 15, 20, 25)
    )
    bad = (
        load_table(spark, "supplier", sf_dir)
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    return (
        _ps_bridge(spark, sf_dir)
        .join(F.broadcast(bad), "l_suppkey", "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_excess_suppliers",
    oracle="""
    WITH qty AS (
      SELECT l_partkey, l_suppkey, sum(l_quantity) AS q
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_partkey, l_suppkey
    )
    SELECT s.s_name, n.n_name
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name IN ('NATION_2', 'NATION_7')
      AND s.s_suppkey IN (
        SELECT qty.l_suppkey FROM qty
        JOIN part p ON p.p_partkey = qty.l_partkey
        WHERE p.p_name LIKE 'red%' AND qty.q > 60
      )
    """,
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers (in given nations) who moved more
    than a quantity floor of a part family — nested IN subqueries
    becoming a chain of semi-joins over a grouped lineitem aggregate.
    The part filter broadcasts into the aggregate's input (prune before
    shuffle); the qualifying-supplier set broadcasts into the supplier
    scan."""
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    p = load_table(spark, "part", sf_dir).filter(F.col("p_name").like("red%"))
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir).filter(F.col("n_name").isin("NATION_2", "NATION_7"))
    qualifying = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 60)
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(qualifying), s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_name", "n_name")
    )
