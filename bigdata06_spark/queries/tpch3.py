"""Third wave of TPC-H-shaped queries: the selective-scan and
multi-way-join shapes the first two waves didn't cover — simple
filter-aggregate (Q6), bi-directional nation volume (Q7), profit
decomposition (Q9), CASE-counting (Q12), correlated scalar-average
filter (Q17), disjunctive multi-clause predicates (Q19), and the
one-late-supplier-per-order analysis (Q21).

Adapted to the driver schema (no partsupp / l_shipmode / l_commitdate /
l_receiptdate): cost in Q9 is proxied by `p_retailprice`, "late" in
Q12/Q21 is shipping >N days after `o_orderdate`, Q12 groups by
`l_linestatus` instead of ship mode. The SQL *shape* (and therefore the
plan shape Catalyst must handle) is preserved; docstrings note each
adaptation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata06_spark.catalog import load_table
from bigdata06_spark.queries import register
from bigdata06_spark.queries.qutil import davg_sql, dsum, dsum_sql


@register(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {dsum_sql('l_extendedprice * l_discount')} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure filter + single-row aggregate, no joins. The
    canonical pushdown probe: all three predicates reach the parquet
    scan (PushedFilters), only 4 columns are read (ReadSchema), and the
    aggregate is a partial→final pair with no data shuffle beyond the
    1-row partials. At 100 TB this is I/O-bound by design — min/max
    row-group statistics on l_shipdate prune most of the scan."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & F.col("l_discount").between(0.03, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))


@register(
    "q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year, {dsum_sql('volume')} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: trade volume between two nations in both directions.
    Five joins, but four sides are dims (supplier/customer/nation×2) →
    all broadcast; the only shuffle is lineitem⋈orders on orderkey.
    The disjunctive nation pair is applied after both nation joins
    (it references both sides), but each nation dim is pre-filtered to
    the 2-row subset first, which makes the semi-filtering implicit."""
    pair = ("NATION_1", "NATION_2")
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    o = load_table(spark, "orders", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    n = load_table(spark, "nation", sf_dir).filter(F.col("n_name").isin(*pair))
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == pair[0]) & (F.col("cust_nation") == pair[1]))
            | ((F.col("supp_nation") == pair[1]) & (F.col("cust_nation") == pair[0]))
        )
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum(F.col("volume")).alias("revenue"))
    )


@register(
    "q9_profit_by_nation",
    oracle=f"""
    SELECT nation, o_year, {dsum_sql('amount')} AS sum_profit
    FROM (
      SELECT n.n_name AS nation,
             CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) - p.p_retailprice * 0.1 * l.l_quantity
               AS amount
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      WHERE p.p_name LIKE '%ring%'
    )
    GROUP BY nation, o_year
    """,
)
def q9_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier-nation per year for a part
    family. Adaptation: no partsupp table in the driver schema, so
    supply cost is proxied as `0.1 * p_retailprice` (same expression
    shape: revenue minus cost*quantity). part is pre-filtered by the
    LIKE before its join → small broadcast; lineitem⋈orders is the one
    real shuffle."""
    p = load_table(spark, "part", sf_dir).filter(F.col("p_name").like("%ring%"))
    li = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.lit(0.1) * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dsum(F.col("amount")).alias("sum_profit"))
    )


@register(
    "q12_late_lines",
    oracle="""
    SELECT l.l_linestatus,
           count(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END)
             AS high_line_count,
           count(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END)
             AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_linestatus
    """,
)
def q12_late_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: priority breakdown of late shipments via
    conditional counting (CASE inside count). Adaptation: the driver
    schema has no l_shipmode/l_commitdate/l_receiptdate, so the group
    key is l_linestatus and "late" is shipping >60 days after the order
    date (an inter-table predicate, evaluated post-join)."""
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    o = load_table(spark, "orders", sf_dir)
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


@register(
    "q17_small_quantity_revenue",
    oracle=f"""
    WITH pq AS (
      SELECT l_partkey, 0.5 * ({davg_sql('l_quantity')}) AS half_avg
      FROM lineitem GROUP BY l_partkey
    )
    SELECT {dsum_sql('l.l_extendedprice')} / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pq ON pq.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3' AND l.l_quantity < pq.half_avg
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue lost to small-quantity orders — a correlated
    scalar subquery (per-part average quantity) decorrelated into an
    aggregate + self-join on partkey. The per-part average uses the
    decimal-sum/count form so the `<` comparison lands identically in
    both engines (a raw double avg differs in the last ulp and can flip
    the boundary row). lineitem shuffles once on partkey, reused by the
    aggregate and the join under AQE; part broadcasts."""
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir).filter(F.col("p_brand") == "Brand#3")
    half_avg = (
        li.groupBy(F.col("l_partkey").alias("pq_partkey"))
        .agg(
            (
                F.lit(0.5)
                * (
                    F.sum(F.col("l_quantity").cast("decimal(25,6)")).cast("double")
                    / F.count(F.lit(1))
                )
            ).alias("half_avg")
        )
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(half_avg, li.l_partkey == half_avg.pq_partkey)
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg((dsum(F.col("l_extendedprice")) / 7.0).alias("avg_yearly"))
    )


@register(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: three-clause disjunctive predicate mixing columns from
    both join sides. Catalyst extracts the common part-side implication
    (brand ∈ {1,2,3}) as a pushable pre-join filter via constraint
    propagation; the full disjunction evaluates post-join. part
    broadcasts, so the whole query is one scan + map-side join."""
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir)
    clause = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(clause("Brand#1", 15, 1, 11) | clause("Brand#2", 25, 10, 20) | clause("Brand#3", 35, 20, 30))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@register(
    "q21_waiting_supplier",
    oracle="""
    WITH per_supp AS (
      SELECT l.l_orderkey, l.l_suppkey,
             max(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                      THEN 1 ELSE 0 END) AS is_late
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
      GROUP BY l.l_orderkey, l.l_suppkey
    ), per_order AS (
      SELECT l_orderkey, count(*) AS n_supp, sum(is_late) AS n_late
      FROM per_supp GROUP BY l_orderkey
    )
    SELECT s.s_name, count(*) AS numwait
    FROM per_supp ps
    JOIN per_order po ON ps.l_orderkey = po.l_orderkey
    JOIN supplier s ON ps.l_suppkey = s.s_suppkey
    WHERE ps.is_late = 1 AND po.n_supp > 1 AND po.n_late = 1
    GROUP BY s.s_name
    """,
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper in a
    multi-supplier order. The classic form is EXISTS(other supplier) AND
    NOT EXISTS(other late supplier) — two correlated self-joins of
    lineitem. Implemented (and decorrelated in the oracle identically)
    as per-supplier lateness on the (orderkey, suppkey) grain, then
    per-order supplier/late counts as WINDOW aggregates over orderkey
    instead of a second groupBy + self-join. One explicit
    repartition(l_orderkey) up front satisfies the clustering
    requirement of BOTH the (orderkey, suppkey) hash-aggregate (a
    superset-key grouping is co-partitioned by the subset key) and the
    orderkey window, so the whole query runs in 2 exchanges (partition
    on orderkey, final groupBy s_name) instead of the 5 the
    agg+join formulation costs — the difference between one and three
    passes over the fact table at 100 TB.
    Adaptation: "late" = shipped >90 days after o_orderdate (driver
    schema has no commit/receipt dates)."""
    from pyspark.sql import Window

    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir).filter(F.col("o_orderstatus") == "F")
    s = load_table(spark, "supplier", sf_dir)
    late = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"), 1
    ).otherwise(0)
    per_supp = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .repartition("l_orderkey")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("is_late"))
    )
    w = Window.partitionBy("l_orderkey")
    return (
        per_supp.withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn("n_late", F.sum("is_late").over(w))
        .filter((F.col("is_late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
