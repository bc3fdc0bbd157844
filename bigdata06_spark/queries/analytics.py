"""Core analytics operators (SURVEY.md §2.B batch): join surface,
aggregation surface, window functions, set operations, sessionization.

Every query is paired with DuckDB oracle SQL. Determinism rules from
`qutil` apply: decimal-backed sums for doubles (window sums included —
DuckDB computes window aggregates over segment trees, so float window
sums are reassociated there too), BIGINT casts for integer-producing
functions, key tiebreaks on every ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata06_spark.catalog import load_table
from bigdata06_spark.queries import register
from bigdata06_spark.queries.qutil import davg_sql, dsum, dsum_sql, epoch_us

# ---------------------------------------------------------------- joins


@register(
    "join_inner",
    oracle="""
    SELECT s.s_suppkey, s.s_name, n.n_name
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join, both sides small → broadcast hash join, no shuffle."""
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    return s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", "s_name", "n_name"
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_totalprice > 450000
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with a selective ON-clause predicate (kept in the
    join condition, NOT pushed as a filter — outer-join semantics).
    Scale: shuffle-free if customer broadcasts; at 100 TB both sides
    shuffle on the key once."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    return c.join(
        o, (c.c_custkey == o.o_custkey) & (o.o_totalprice > 450000), "left"
    ).select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


@register(
    "join_full_outer",
    oracle="""
    WITH buyers AS (SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 400000),
         rich   AS (SELECT c_custkey FROM customer WHERE c_acctbal > 8000)
    SELECT b.o_custkey AS buyer_key, r.c_custkey AS rich_key
    FROM buyers b FULL OUTER JOIN rich r ON b.o_custkey = r.c_custkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two derived key sets. Plans sort-merge (full
    outer can't broadcast); one shuffle each side on the key."""
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    buyers = o.filter(F.col("o_totalprice") > 400000).select("o_custkey").distinct()
    rich = c.filter(F.col("c_acctbal") > 8000).select("c_custkey")
    return buyers.join(rich, buyers.o_custkey == rich.c_custkey, "full").select(
        F.col("o_custkey").alias("buyer_key"), F.col("c_custkey").alias("rich_key")
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join = EXISTS. Probe side streams; no row duplication,
    no payload from the build side — cheapest join shape at scale."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir).filter(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderpriority = '1-URGENT')
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join = NOT EXISTS (customers with no URGENT orders —
    the plain no-orders predicate is true of nobody below sf0.1 on the
    synthetic tables, so the r9 non-vacuity gate pins a variant whose
    answer is populated at every SF)."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "join_cross",
    oracle="""
    SELECT r1.r_name AS from_region, r2.r_name AS to_region
    FROM region r1 CROSS JOIN region r2
    WHERE r1.r_regionkey <> r2.r_regionkey
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join (explicit — tiny dimension only; a cross join of fact
    tables is a design bug at any scale)."""
    r1 = load_table(spark, "region", sf_dir).select(
        F.col("r_regionkey").alias("k1"), F.col("r_name").alias("from_region")
    )
    r2 = load_table(spark, "region", sf_dir).select(
        F.col("r_regionkey").alias("k2"), F.col("r_name").alias("to_region")
    )
    return r1.crossJoin(r2).filter(F.col("k1") != F.col("k2")).select("from_region", "to_region")


@register(
    "join_nonequi",
    oracle="""
    SELECT n1.n_name AS nation_a, n2.n_name AS nation_b, n1.n_regionkey AS region
    FROM nation n1 JOIN nation n2
      ON n1.n_regionkey = n2.n_regionkey AND n1.n_nationkey < n2.n_nationkey
    """,
)
def join_nonequi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join: equi-part on region (hashable → shuffle/broadcast) +
    non-equi residual predicate. Catalyst plans the equi conjunct as the
    join key and applies `<` as a post-join filter — the scalable shape
    for mixed predicates (pure theta would be nested-loop)."""
    n1 = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("k1"), F.col("n_name").alias("nation_a"),
        F.col("n_regionkey").alias("region"),
    )
    n2 = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("k2"), F.col("n_name").alias("nation_b"),
        F.col("n_regionkey").alias("r2"),
    )
    return (
        n1.join(n2, (F.col("region") == F.col("r2")) & (F.col("k1") < F.col("k2")))
        .select("nation_a", "nation_b", "region")
    )


@register(
    "join_asof",
    oracle="""
    WITH views AS (
      SELECT user_id, ts, event_id,
             row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
      FROM events WHERE event_type = 'view'
    ), v AS (SELECT user_id, ts, event_id FROM views WHERE rn = 1),
    purchases AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.value, v.event_id AS view_event_id
    FROM purchases p ASOF LEFT JOIN v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (Spark has no native one — SURVEY.md §2.B): for each
    purchase, the latest view at-or-before it for the same user.

    Implementation is the union-marker trick: tag both streams, union,
    sort per user by (ts, tag), and carry the last non-null view id
    forward with `last(ignorenulls)`. ONE shuffle on user_id and a
    per-partition sort — same cost as a window, fully distributed,
    no per-group pandas. Ties (same user, same ts) are pinned by
    ordering views before purchases and keeping the max view event_id.
    """
    e = load_table(spark, "events", sf_dir)
    views = (
        e.filter(F.col("event_type") == "view")
        .select("user_id", "ts", F.col("event_id").alias("view_event_id"))
        .withColumn("tag", F.lit(0))
        .withColumn("event_id", F.lit(None).cast("long"))
        .withColumn("value", F.lit(None).cast("double"))
    )
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .select("user_id", "ts", "event_id", "value")
        .withColumn("tag", F.lit(1))
        .withColumn("view_event_id", F.lit(None).cast("long"))
    )
    unioned = views.unionByName(purchases)
    # views sort before purchases at equal ts (tag 0 < 1); among views at
    # equal ts the max event_id wins (ordered ascending → last carried)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("tag"), F.col("view_event_id").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        unioned.withColumn("matched_view", F.last("view_event_id", ignorenulls=True).over(w))
        .filter(F.col("tag") == 1)
        .select("event_id", "user_id", "value", F.col("matched_view").alias("view_event_id"))
    )


# ---------------------------------------------------------- aggregations


@register(
    "agg_group_stats",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n,
           {dsum_sql('o_totalprice')} AS total,
           CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) / count(*) AS avg_price,
           min(o_totalprice) AS min_price,
           max(o_totalprice) AS max_price
    FROM orders GROUP BY o_orderstatus, o_orderpriority
    """,
)
def agg_group_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash aggregation: count/sum/avg/min/max over two keys. Map-side
    partial agg shrinks the shuffle to (#groups × #tasks) rows."""
    o = load_table(spark, "orders", sf_dir)
    return o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(F.col("o_totalprice")).alias("total"),
        (F.sum(F.col("o_totalprice").cast("decimal(25,6)")).cast("double") / F.count(F.lit(1))).alias("avg_price"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


@register(
    "agg_count_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_part,
           count(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column COUNT DISTINCT — Spark plans expand + two-phase agg;
    the expensive-but-exact path (`agg_approx_distinct` is the sketch
    alternative for 100 TB)."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "agg_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           TRUE AS parts_in_bound,
           TRUE AS orders_in_bound
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++, rsd=1%) — the scale path for
    distinct counts: constant memory, one pass, mergeable sketches.

    Sketch estimates are engine-specific, so the raw estimate can't be
    hash-compared to DuckDB. The driver-checkable contract instead:
    emit the exact distinct count plus a boolean certifying the HLL++
    estimate landed within 5×rsd (5σ of the sketch's documented
    relative-standard-deviation guarantee, miss odds ~3e-7 per cell) of
    it; the oracle computes the exact side and asserts the bound holds
    (TRUE literal). A sketch regression now turns the row red instead
    of being invisible. At 100 TB only the sketch side survives — the
    exact count here is the certificate, not the product."""
    li = load_table(spark, "lineitem", sf_dir)
    rsd = 0.01
    out = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.approx_count_distinct("l_partkey", rsd).alias("_ap"),
        F.approx_count_distinct("l_orderkey", rsd).alias("_ao"),
    )
    tol = 5 * rsd
    return out.select(
        "l_returnflag",
        "exact_parts",
        "exact_orders",
        (F.abs(F.col("_ap") - F.col("exact_parts")) <= F.col("exact_parts") * tol).alias(
            "parts_in_bound"
        ),
        (F.abs(F.col("_ao") - F.col("exact_orders")) <= F.col("exact_orders") * tol).alias(
            "orders_in_bound"
        ),
    )


@register(
    "agg_approx_percentile",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.5)  AS exact_p50,
           quantile_cont(l_extendedprice, 0.95) AS exact_p95,
           TRUE AS p50_in_bound,
           TRUE AS p95_in_bound,
           count(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx (single-pass mergeable GK quantile sketch,
    accuracy 10000) — the scale path for percentiles next to the exact
    `agg_percentiles`: constant memory per group vs a full sort.

    Sketch output is an actual sample whose RANK is within
    n/accuracy = 1e-4·n of the target rank (engine-specific which
    sample), so the raw value can't be hash-compared to DuckDB. The
    driver-checkable contract: emit the exact interpolated percentile
    (Spark `percentile` ≡ DuckDB `quantile_cont`, bit-identical) plus a
    boolean certifying the sketch value lies between the exact
    percentiles at p ± 10×(1/accuracy) — a 10× margin on the sketch's
    rank guarantee, monotonicity making the value bracket valid. The
    oracle computes the exact side and asserts the bound (TRUE). At
    100 TB only the sketch survives; the exact values here are the
    certificate."""
    li = load_table(spark, "lineitem", sf_dir)
    out = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("_a50"),
        F.percentile_approx("l_extendedprice", 0.95, 10000).alias("_a95"),
        F.expr(
            "percentile(l_extendedprice, array(0.5, 0.95, 0.499, 0.501, 0.949, 0.951))"
        ).alias("_q"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return out.select(
        "l_returnflag",
        F.col("_q")[0].alias("exact_p50"),
        F.col("_q")[1].alias("exact_p95"),
        F.col("_a50").between(F.col("_q")[2], F.col("_q")[3]).alias("p50_in_bound"),
        F.col("_a95").between(F.col("_q")[4], F.col("_q")[5]).alias("p95_in_bound"),
        "n_rows",
    )


@register(
    "agg_rollup",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n, {dsum_sql('o_totalprice')} AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP: hierarchical subtotals (status, priority) → (status) → ().
    Spark plans one Expand node feeding a single hash agg — the rollup
    costs one extra shuffle row per grouping set, not extra scans."""
    o = load_table(spark, "orders", sf_dir)
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), dsum(F.col("o_totalprice")).alias("total")
    )


@register(
    "agg_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n, {dsum_sql('l_extendedprice')} AS total
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^k grouping sets in one Expand+agg pass."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), dsum(F.col("l_extendedprice")).alias("total")
    )


@register(
    "agg_pivot",
    oracle=f"""
    SELECT o_orderpriority,
           {dsum_sql("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END")} AS F,
           {dsum_sql("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END")} AS O,
           {dsum_sql("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END")} AS P
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with explicit values (explicit list keeps it one pass — value
    discovery would need an extra job). Compiles to conditional
    aggregation, same as the oracle's CASE form."""
    o = load_table(spark, "orders", sf_dir)
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(dsum(F.col("o_totalprice")))
    )


# --------------------------------------------------------------- windows


@register(
    "window_ranking",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal,
           CAST(row_number() OVER w AS BIGINT) AS rn,
           CAST(rank()       OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           CAST(ntile(4)     OVER w AS BIGINT) AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC)
    """,
)
def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window functions. One shuffle on the partition key + sort
    within partitions; total order pinned by the c_custkey tiebreak."""
    c = load_table(spark, "customer", sf_dir)
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return c.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


@register(
    "window_lag_lead",
    oracle="""
    SELECT event_id, user_id, ts, value,
           lag(value)  OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           first_value(value) OVER w AS first_value,
           nth_value(value, 2) OVER w AS second_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window functions (lag/lead/first/nth) per user ordered
    by time. No arithmetic → values bit-exact; nth_value uses the
    default running frame on both engines (null until 2 rows seen)."""
    e = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return e.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.first("value").over(w).alias("first_value"),
        F.nth_value("value", 2).over(w).alias("second_value"),
    )


@register(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(sum(CAST(o_totalprice AS DECIMAL(25,6)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_total,
           count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_so_far
    FROM orders
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum per customer over order history (rows frame).
    Decimal accumulation: DuckDB evaluates window sums over a segment
    tree, so even sequential-looking float window sums reassociate."""
    o = load_table(spark, "orders", sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(25,6)")).over(w).cast("double").alias("running_total"),
        F.count(F.lit(1)).over(w).alias("n_so_far"),
    )


@register(
    "window_range_frame",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(sum(CAST(value AS DECIMAL(25,6)))
                OVER (PARTITION BY user_id ORDER BY epoch_us(ts) ASC
                      RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS sum_24h,
           count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts) ASC
                          RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW) AS n_24h
    FROM events
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE frame: per-user trailing-24h rolling sum/count.
    Ordered on epoch microseconds so the frame bound is an exact integer
    range in both engines."""
    e = load_table(spark, "events", sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch_us(F.col("ts")))
        .rangeBetween(-86_400_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(F.col("value").cast("decimal(25,6)")).over(w).cast("double").alias("sum_24h"),
        F.count(F.lit(1)).over(w).alias("n_24h"),
    )


@register(
    "topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k (generalizes reference R4 from global to grouped):
    top-3 orders by price per customer. row_number + filter — one
    shuffle; with AQE the rank filter prunes early per partition."""
    o = load_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


# ---------------------------------------------------------------- set ops


@register(
    "setop_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): customers with both a finished and an open
    order. Plans as an aggregate + semi-join under the hood."""
    o = load_table(spark, "orders", sf_dir)
    f = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    op = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.intersect(op)


@register(
    "setop_except_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics — multiplicity preserved)."""
    o = load_table(spark, "orders", sf_dir)
    f = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    p = o.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    return f.exceptAll(p)


@register(
    "setop_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct): nations having customers or suppliers."""
    c = load_table(spark, "customer", sf_dir).select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, "supplier", sf_dir).select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


# --------------------------------------------------------- sessionization


@register(
    "sessionize_events",
    oracle="""
    WITH gaps AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                    OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
                  > 1800000000 OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) IS NULL
                  THEN 1 ELSE 0 END AS is_start
      FROM events
    ), sessions AS (
      SELECT user_id, ts, event_id, value,
             CAST(sum(is_start) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM gaps
    )
    SELECT user_id, session_id,
           count(*) AS n_events,
           min(ts) AS session_start,
           max(ts) AS session_end,
           CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS session_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (30-min inactivity gap): lag → gap flag →
    running count = session id → per-session aggregate. Two window
    passes over ONE shuffle on user_id (same partitioning reused), then
    the groupBy reuses it again — no extra exchange under AQE."""
    e = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    gap_us = epoch_us(F.col("ts")) - epoch_us(F.lag("ts").over(w))
    is_start = F.when(gap_us.isNull() | (gap_us > 1_800_000_000), 1).otherwise(0)
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        e.withColumn("is_start", is_start)
        .withColumn("session_id", F.sum("is_start").over(cum).cast("long"))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            dsum(F.col("value")).alias("session_value"),
        )
    )


@register(
    "window_distribution",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           percent_rank() OVER w AS pct_rank,
           cume_dist()    OVER w AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution analytic functions: percent_rank ((rank-1)/(N-1))
    and cume_dist (rows≤current / N) per market segment. Both are exact
    small-integer ratios in double — bit-identical cross-engine. The
    tiebreak on c_custkey pins rank determinism. One shuffle on the
    partition key."""
    c = load_table(spark, "customer", sf_dir)
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@register(
    "join_range_events",
    oracle="""
    SELECT p.event_id AS purchase_id, v.event_id AS view_id, p.user_id
    FROM events p JOIN events v
      ON p.event_type = 'purchase' AND v.event_type = 'view'
     AND v.user_id = p.user_id
     AND v.ts >= p.ts - INTERVAL 5 MINUTE
     AND v.ts <= p.ts
    """,
)
def join_range_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join on events.ts (SURVEY.md §2.B joins): views within 5
    minutes before each purchase, same user. Implemented as a BANDED
    equi-join (operators/relational.py:banded_range_join): coarse
    ts-buckets + user_id become the hash keys, ≤2 probes/row, exact
    interval predicate as residual — linear shuffle volume where the
    naive theta join is a quadratic nested loop. The oracle is the
    naive form (DuckDB's IEJoin handles it at test scale)."""
    from bigdata06_spark.operators.relational import banded_range_join

    ev = load_table(spark, "events", sf_dir)
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts")
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), F.col("user_id"), F.col("ts").alias("v_ts")
    )
    return banded_range_join(
        p, v, "p_ts", "v_ts", band_seconds=300, extra_keys=["user_id"]
    ).select("purchase_id", "view_id", "user_id")


@register(
    "events_hypertable_rollup",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS bucket_ts, event_type,
             count(*) AS n_events,
             sum(CAST(value AS DECIMAL(25,6))) AS tv
      FROM events GROUP BY 1, 2
    ), daily AS (
      SELECT date_trunc('day', bucket_ts) AS bucket_ts, event_type,
             CAST(sum(n_events) AS BIGINT) AS n_events, sum(tv) AS tv
      FROM hourly GROUP BY 1, 2
    )
    SELECT 'hour' AS resolution, bucket_ts, event_type, n_events,
           CAST(tv AS DOUBLE) AS total_value
    FROM hourly
    UNION ALL
    SELECT 'day' AS resolution, bucket_ts, event_type, n_events,
           CAST(tv AS DOUBLE) AS total_value
    FROM daily
    """,
)
def events_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-resolution rollup (continuous-aggregate
    shape) in ONE fact pass: GROUPING SETS ((hour, et), (day, et)) scans
    events once, Expand emits each row into both resolutions, and the
    map-side partial aggregate collapses to ~|buckets| rows before the
    single shuffle. The naive union-of-two-groupBys plans TWO full
    scans + three exchanges (exchange reuse does not fire across the
    union branches); at 100 TB a second fact pass dwarfs the 2× Expand
    of a projected 3-column relation. Sums stay in DECIMAL (exact +
    associative → aggregation order can't perturb values; see qutil
    docstring), cast to double only at the output edge."""
    e = load_table(spark, "events", sf_dir)
    hour_b = F.date_trunc("hour", F.col("ts"))
    prepared = e.select(
        hour_b.alias("hour_b"),
        F.date_trunc("day", hour_b).alias("day_b"),
        "event_type",
        F.col("value").cast("decimal(25,6)").alias("v"),
    )
    rolled = prepared.groupingSets(
        [["hour_b", "event_type"], ["day_b", "event_type"]],
        "hour_b",
        "day_b",
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("v").alias("tv"),
        (F.grouping("hour_b") == 0).alias("is_hour"),
    )
    is_hour = F.col("is_hour")
    return rolled.select(
        F.when(is_hour, F.lit("hour")).otherwise(F.lit("day")).alias("resolution"),
        F.when(is_hour, F.col("hour_b")).otherwise(F.col("day_b")).alias("bucket_ts"),
        "event_type",
        "n_events",
        F.col("tv").cast("double").alias("total_value"),
    )


# ---------------------------------------------------------------- CDC merge


@register(
    "cdc_scd1_merge",
    oracle="""
    WITH latest AS (
      SELECT user_id, event_type, value
      FROM (SELECT user_id, event_type, value,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events)
      WHERE rn = 1
    )
    SELECT coalesce(c.c_custkey, l.user_id) AS custkey,
           c.c_name AS name,
           CASE WHEN l.user_id IS NOT NULL THEN l.value ELSE c.c_acctbal END AS balance,
           CASE WHEN l.user_id IS NOT NULL THEN 'changelog' ELSE 'snapshot' END AS src
    FROM customer c FULL OUTER JOIN latest l ON l.user_id = c.c_custkey
    WHERE l.user_id IS NULL OR l.event_type <> 'error'
    """,
)
def cdc_scd1_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC upsert (SCD type-1 MERGE): apply a changelog to a snapshot,
    last-writer-wins. The event stream is the changelog on user_id
    (version = (ts, event_id); latest 'error' entry = tombstone →
    DELETE; any other latest entry = UPSERT of its value); customer is
    the snapshot. Full-outer merge covers all three MERGE legs: update
    (key in both), insert (changelog-only), keep (snapshot-only);
    tombstoned keys drop.

    Scale: changelog compaction is one window over user_id — at 100 TB
    that shuffle carries only (key, version, value), and the compacted
    relation is |distinct keys|-sized. The merge join is left unhinted
    on purpose: compacted-changelog size is data-dependent, so AQE
    picks broadcast vs sort-merge at runtime from the real post-window
    size. Stored doubles pass through unchanged (bit-exact), no
    rounding needed."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    latest = (
        ev.select("user_id", "event_type", "value", "ts", "event_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "value")
    )
    c = load_table(spark, "customer", sf_dir).select("c_custkey", "c_name", "c_acctbal")
    in_log = F.col("user_id").isNotNull()
    return (
        c.join(latest, c["c_custkey"] == latest["user_id"], "full_outer")
        .filter(F.col("user_id").isNull() | (F.col("event_type") != "error"))
        .select(
            F.coalesce(F.col("c_custkey"), F.col("user_id")).alias("custkey"),
            F.col("c_name").alias("name"),
            F.when(in_log, F.col("value")).otherwise(F.col("c_acctbal")).alias("balance"),
            F.when(in_log, F.lit("changelog")).otherwise(F.lit("snapshot")).alias("src"),
        )
    )


# ---------------------------------------------------------------- gap-fill


@register(
    "events_gapfill_locf",
    oracle=f"""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS bucket_ts, event_type,
             count(*) AS n_events,
             {davg_sql('value')} AS avg_value
      FROM events GROUP BY 1, 2
    ),
    bounds AS (SELECT min(bucket_ts) AS lo, max(bucket_ts) AS hi FROM hourly),
    spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket_ts, t.event_type
      FROM bounds CROSS JOIN (SELECT DISTINCT event_type FROM events) t
    )
    SELECT s.event_type, s.bucket_ts,
           CAST(coalesce(h.n_events, 0) AS BIGINT) AS n_events,
           h.bucket_ts IS NULL AS filled,
           last_value(h.avg_value IGNORE NULLS) OVER (
             PARTITION BY s.event_type ORDER BY s.bucket_ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS avg_value
    FROM spine s LEFT JOIN hourly h USING (bucket_ts, event_type)
    """,
)
def events_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap-fill with last-observation-carried-forward (the
    hypertable `time_bucket_gapfill` + `locf` shape): a dense hourly
    spine per event_type, observed buckets carrying their aggregate,
    missing buckets flagged and filled with the most recent prior
    value (leading gaps stay null).

    Scale: the fact table is touched ONCE (the hourly groupBy); the
    spine is generated, not scanned — bounds are a 1-row aggregate of
    the already-bucket-sized hourly relation, exploded into
    |hours|×|types| rows. Every post-scan relation is bucket-sized, so
    spine join and LOCF window are negligible at any corpus size. The
    LOCF is one window per type ordered by bucket (`last` ignorenulls,
    running frame). Averages use the decimal-sum form (see qutil), so
    carried values are cross-engine exact."""
    from bigdata06_spark.queries.qutil import davg

    e = load_table(spark, "events", sf_dir)
    hourly = e.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("bucket_ts"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"), davg(F.col("value")).alias("avg_value"))
    bounds = hourly.agg(F.min("bucket_ts").alias("lo"), F.max("bucket_ts").alias("hi"))
    spine = (
        bounds.select(
            F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("bucket_ts")
        )
        .crossJoin(e.select("event_type").distinct())
    )
    joined = spine.join(
        hourly.withColumnRenamed("bucket_ts", "h_bucket"),
        (F.col("bucket_ts") == F.col("h_bucket"))
        & (spine["event_type"] == hourly["event_type"]),
        "left",
    ).select(
        spine["event_type"],
        "bucket_ts",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.col("h_bucket").isNull().alias("filled"),
        "avg_value",
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.withColumn("avg_value", F.last("avg_value", ignorenulls=True).over(w))


@register(
    "events_zscore_outliers",
    oracle="""
    WITH st AS (
      SELECT event_type,
             CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS s,
             CAST(sum(CAST(value AS DECIMAL(15,6)) * CAST(value AS DECIMAL(15,6))) AS DOUBLE) AS ss
      FROM events GROUP BY 1
    )
    SELECT e.event_id, e.event_type, e.value,
           floor((e.value - s / n) / sqrt((ss - s * s / n) / (n - 1.0)) * 1000000.0 + 0.5)
             / 1000000.0 AS z
    FROM events e JOIN st USING (event_type)
    WHERE abs(floor((e.value - s / n) / sqrt((ss - s * s / n) / (n - 1.0)) * 1000000.0 + 0.5)
                / 1000000.0) >= 3.0
    """,
)
def events_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score outlier detection: events more than 3 sample
    standard deviations from their type's mean.

    Cross-engine determinism: `value` lands exactly on the 6-decimal
    grid, so sum and sum-of-squares are EXACT decimal aggregates
    ((15,6)² = (31,12) fits decimal128 in both engines); mean/variance
    /z are then derived in double with a textually identical formula
    on both sides — identical IEEE ops on identical inputs, 6dp
    half-up rounding at the end.

    Scale: one shuffle for the per-type stats (map-side combined,
    |types| rows out), stats broadcast back onto the fact scan — the
    events table is read twice but never shuffled; at 100 TB the
    second scan beats caching the raw fact and both beat a window over
    a global partitionBy(type) (catastrophic skew: one partition per
    type)."""
    e = load_table(spark, "events", sf_dir)
    st = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("value").cast("decimal(25,6)")).cast("double").alias("s"),
        F.sum(F.col("value").cast("decimal(15,6)") * F.col("value").cast("decimal(15,6)"))
        .cast("double")
        .alias("ss"),
    )
    from bigdata06_spark.queries.qutil import rnd

    mean = F.col("s") / F.col("n")
    sd = F.sqrt((F.col("ss") - F.col("s") * F.col("s") / F.col("n")) / (F.col("n") - F.lit(1.0)))
    z = rnd((F.col("value") - mean) / sd, 6)
    return (
        e.join(F.broadcast(st), "event_type")
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) >= 3.0)
        .select("event_id", "event_type", "value", "z")
    )


@register(
    "nest_order_documents",
    oracle="""
    WITH lines AS (
      SELECT l_orderkey,
             l_linenumber || ':' || l_quantity || ':' ||
               CAST(CAST(l_extendedprice AS DECIMAL(25,2)) AS VARCHAR) AS line_repr
      FROM lineitem
    ),
    nested AS (
      SELECT l_orderkey AS o_orderkey,
             count(*) AS n_lines,
             string_agg(line_repr, '|' ORDER BY line_repr) AS lines_repr
      FROM lines GROUP BY 1
    )
    SELECT o.o_orderkey, o.o_custkey, n.n_lines, n.lines_repr
    FROM orders o JOIN nested n USING (o_orderkey)
    WHERE o.o_orderkey % 50 = 0
    """,
)
def nest_order_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational → nested-document assembly (the REVERSE of the
    reference's flattening, Spotify_API3.py:381-390): each order
    gathers its lines into an ordered serialized array — the
    export-to-training-format shape (JSONL of nested records). The
    nested payload is serialized to a canonical string (sorted,
    '|'-joined, prices re-quantized to 2dp text) so the cross-engine
    hash compares byte-for-byte where raw nested types would diverge
    in repr.

    Scale: collect_list after a map-side-light shuffle on orderkey
    (group sizes are ≤7 lines — bounded, no skew), then one join with
    orders on the same key; the modulus filter stands in for whatever
    export partition predicate the real pipeline pushes down."""
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir).filter(F.col("o_orderkey") % 50 == 0)
    line_repr = F.concat_ws(
        ":",
        F.col("l_linenumber").cast("string"),
        F.col("l_quantity").cast("string"),
        F.col("l_extendedprice").cast("decimal(25,2)").cast("string"),
    )
    nested = (
        li.select(F.col("l_orderkey").alias("o_orderkey"), line_repr.alias("line_repr"))
        .groupBy("o_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.array_join(F.array_sort(F.collect_list("line_repr")), "|").alias("lines_repr"),
        )
    )
    return o.select("o_orderkey", "o_custkey").join(nested, "o_orderkey")


@register(
    "events_transition_matrix",
    oracle="""
    WITH nxt AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts ASC, event_id ASC) AS next_type
      FROM events
    )
    SELECT event_type, next_type, count(*) AS n
    FROM nxt WHERE next_type IS NOT NULL
    GROUP BY 1, 2
    """,
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral transition matrix: for every event, the same user's
    next event (lead over the per-user timeline), counted per
    (from, to) pair — the Markov-chain input of product analytics.
    One shuffle on user_id for the window; the groupBy on the tiny
    (from, to) key space is map-side-combined to |types|² rows.
    Deterministic ordering: ties within a timestamp break on
    event_id."""
    e = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return (
        e.select("user_id", "event_type", F.lead("event_type").over(w).alias("next_type"))
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "feature_quantile_bins",
    oracle="""
    WITH binned AS (
      SELECT l_orderkey, l_linenumber, l_extendedprice,
             ntile(10) OVER (ORDER BY l_extendedprice ASC, l_orderkey ASC,
                             l_linenumber ASC) AS bin
      FROM lineitem
    )
    SELECT bin, count(*) AS n,
           min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
    FROM binned GROUP BY 1
    """,
)
def feature_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency feature binning (decile bucketing of a numeric
    feature) + per-bin ranges — the classic ML feature-engineering
    discretizer, exact. Deterministic: the ntile order is pinned with
    the unique (price, orderkey, linenumber) key so boundary rows land
    identically cross-engine.

    Scale caveat, stated honestly: global ntile is a single-partition
    sort — fine for fitting bin EDGES on a sample, wrong for scoring
    100 TB. The scale path is percentile_approx edges + a broadcast
    range lookup (see agg_approx_percentile); this operator is the
    exact-fit reference for it."""
    li = load_table(spark, "lineitem", sf_dir)
    w = Window.orderBy(F.asc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber"))
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice", F.ntile(10).over(w).alias("bin"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("l_extendedprice").alias("lo"),
            F.max("l_extendedprice").alias("hi"),
        )
    )


@register(
    "encode_categoricals",
    oracle="""
    WITH counts AS (
      SELECT p_brand, count(*) AS n FROM part GROUP BY 1
    )
    SELECT p_brand,
           CAST(n AS BIGINT) AS n,
           CAST(row_number() OVER (ORDER BY n DESC, p_brand ASC) - 1 AS BIGINT) AS brand_idx
    FROM counts
    """,
)
def encode_categoricals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical → dense-integer encoding by frequency rank
    (StringIndexer semantics, relationally): most frequent value gets
    index 0, ties alphabetical. The vocabulary relation is
    |distinct values|-sized; at scale it broadcasts back onto the fact
    for the actual encode join — the fit is one map-side-combined
    aggregation plus a vocabulary-sized window, never a fact sort."""
    p = load_table(spark, "part", sf_dir)
    counts = p.groupBy("p_brand").agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy(F.desc("n"), F.asc("p_brand"))
    return counts.select(
        "p_brand", "n", (F.row_number().over(w) - 1).cast("long").alias("brand_idx")
    )


@register(
    "agg_skew_salted",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS l_quantity_sum,
           count(*) AS l_orderkey_count
    FROM lineitem GROUP BY 1
    """,
)
def agg_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation (operators/scale.py:salted_agg)
    over a 3-value group key — the worst-case skew shape: every key is
    hot. The oracle is the DIRECT aggregation; identical output is the
    operator's contract. l_quantity summed via the decimal path for
    cross-engine exactness (the salt phase changes combine order,
    which float sums would feel)."""
    from bigdata06_spark.operators.scale import salted_agg

    li = load_table(spark, "lineitem", sf_dir).withColumn(
        "l_quantity", F.col("l_quantity").cast("decimal(25,6)")
    )
    out = salted_agg(li, "l_returnflag", {"l_quantity": "sum", "l_orderkey": "count"})
    return out.select(
        "l_returnflag",
        F.col("l_quantity_sum").cast("double").alias("l_quantity_sum"),
        "l_orderkey_count",
    )


_SQL_INTERFACE_TEXT = """
    WITH rev AS (
      SELECT n.n_name, r.r_name,
             sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(25,6))) AS rev_dec
      FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY n.n_name, r.r_name
    ),
    tot AS (SELECT r_name, sum(rev_dec) AS tot_dec FROM rev GROUP BY r_name)
    SELECT rev.n_name, rev.r_name,
           CAST(rev.rev_dec AS DOUBLE) AS revenue,
           floor(CAST(rev.rev_dec AS DOUBLE) / CAST(t.tot_dec AS DOUBLE) * 1e6 + CAST(0.5 AS DOUBLE))
             / 1e6 AS region_share
    FROM rev JOIN tot t ON rev.r_name = t.r_name
"""


@register("sql_interface", oracle=_SQL_INTERFACE_TEXT)
def sql_interface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL entry path end-to-end: register the driver tables as
    temp views and run ONE SQL text — the literal same string is the
    DuckDB oracle, so this query also proves the engine's ANSI-SQL
    dialect compatibility (CTEs, multi-join, decimal casts, window-free
    share via a second aggregation level; decimals stay decimal until
    the final projection so no float reassociates anywhere).

    Shared-text gotcha: Spark SQL parses decimal-dot literals
    (1000000.0) as DECIMAL where DuckDB and the DataFrame API use
    DOUBLE — the rounding must use 1e6 (scientific notation is DOUBLE
    in both dialects) or the result column comes back decimal-typed."""
    from bigdata06_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL_INTERFACE_TEXT)


@register(
    "events_retention_daily",
    oracle="""
    WITH act AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    ret AS (
      SELECT a.d, count(*) AS active,
             CAST(count(b.user_id) AS BIGINT) AS retained
      FROM act a LEFT JOIN act b
        ON b.user_id = a.user_id AND b.d = a.d + INTERVAL 1 DAY
      GROUP BY a.d
    )
    SELECT CAST(d AS VARCHAR) AS activity_date, CAST(active AS BIGINT) AS active_users, retained,
           floor(CAST(retained AS DOUBLE) / active * 1e6 + 0.5) / 1e6 AS retention_rate
    FROM ret
    """,
)
def events_retention_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day retention (cohort analysis): of the users active on
    day D, the share also active on D+1. The activity relation is the
    DISTINCT (user, day) set — one dedup shuffle collapses the raw fact
    to |users×days| rows, and the self-join joins that small relation
    on user_id, so the event volume never enters the join. Integer
    ratio → exact cross-engine with the shared 6dp rounding."""
    e = load_table(spark, "events", sf_dir)
    act = e.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    b = act.select(F.col("user_id"), F.date_sub(F.col("d"), 1).alias("d"))
    ret = (
        act.join(b.withColumnRenamed("user_id", "b_user"),
                 (act.user_id == F.col("b_user")) & (act.d == b.d), "left")
        .groupBy(act.d)
        .agg(
            F.count(F.lit(1)).alias("active_users"),
            F.count("b_user").alias("retained"),
        )
    )
    return ret.select(
        F.col("d").cast("string").alias("activity_date"),
        "active_users",
        "retained",
        (F.floor(F.col("retained").cast("double") / F.col("active_users") * 1e6 + F.lit(0.5))
         / 1e6).alias("retention_rate"),
    )


@register(
    "events_trending_decay",
    oracle="""
    WITH mx AS (SELECT max(ts) AS tmax FROM events),
    scored AS (
      SELECT e.event_type,
             CAST(floor(exp(-0.01 * (epoch_us(mx.tmax) - epoch_us(e.ts)) / 3600000000.0)
                        * 1e6 + 0.5) / 1e6 AS DECIMAL(25,6)) AS w
      FROM events e CROSS JOIN mx
    )
    SELECT event_type,
           CAST(sum(w) AS DOUBLE) AS trend_score,
           count(*) AS n_events
    FROM scored GROUP BY 1
    """,
)
def events_trending_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-decayed trending score per event type: each event
    contributes exp(-0.01 x age_hours) relative to the newest event —
    recency-weighted popularity without a window cutoff. Per-event
    weights are floor-rounded to the 6dp grid BEFORE the decimal sum
    (exp differs in final ulps across libm builds; a float sum would
    also reassociate), so the aggregate is bit-exact cross-engine.
    One 1-row max-ts broadcast + one map-side-combined aggregation."""
    from bigdata06_spark.queries.qutil import epoch_us, rnd

    e = load_table(spark, "events", sf_dir)
    mx = e.agg(F.max("ts").alias("tmax"))
    age_h = (epoch_us(F.col("tmax")) - epoch_us(F.col("ts"))) / 3_600_000_000.0
    w = rnd(F.exp(-0.01 * age_h), 6).cast("decimal(25,6)")
    return (
        e.crossJoin(F.broadcast(mx))
        .select("event_type", w.alias("w"))
        .groupBy("event_type")
        .agg(F.sum("w").cast("double").alias("trend_score"), F.count(F.lit(1)).alias("n_events"))
    )


@register(
    "feature_bins_lookup",
    oracle="""
    WITH ranked AS (
      SELECT l_extendedprice,
             ntile(10) OVER (ORDER BY l_extendedprice ASC, l_orderkey ASC,
                             l_linenumber ASC) AS bin
      FROM lineitem
    ),
    edges AS (
      SELECT bin, max(l_extendedprice) AS edge FROM ranked WHERE bin <= 9 GROUP BY 1
    ),
    scored AS (
      SELECT l.l_orderkey, l.l_linenumber,
             1 + (SELECT count(*) FROM edges e WHERE l.l_extendedprice > e.edge) AS bucket
      FROM lineitem l
    )
    SELECT bucket, count(*) AS n
    FROM scored GROUP BY 1
    """,
)
def feature_bins_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale path promised by feature_quantile_bins: decile EDGES
    are fit once (here from the exact ntile reference; on 100 TB from
    percentile_approx or a sample), then every row is scored by a
    BROADCAST edge lookup — count of edges strictly below the value —
    so the scoring pass is a scan-stage expression over 9 numbers and
    never sorts the fact. Ties land in the lower bucket on both
    engines (strict >)."""
    li = load_table(spark, "lineitem", sf_dir)
    w = Window.orderBy(F.asc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber"))
    edges = (
        li.select("l_extendedprice", "l_orderkey", "l_linenumber",
                  F.ntile(10).over(w).alias("bin"))
        .filter(F.col("bin") <= 9)
        .groupBy("bin")
        .agg(F.max("l_extendedprice").alias("edge"))
        .agg(F.sort_array(F.collect_list("edge")).alias("edges"))
    )
    bucket = F.lit(1) + F.size(
        F.filter(F.col("edges"), lambda e: F.col("l_extendedprice") > e)
    )
    return (
        li.crossJoin(F.broadcast(edges))
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "agg_histogram",
    oracle="""
    SELECT CAST(floor(value / 50.0) AS BIGINT) AS bucket,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total
    FROM events GROUP BY 1
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of event values (width 50): bucketing is a
    scan-stage floor division, so the histogram is one
    map-side-combined aggregation — the constant-memory profile
    builder; decimal sums keep per-bucket totals exact."""
    e = load_table(spark, "events", sf_dir)
    return (
        e.select(F.floor(F.col("value") / 50.0).cast("long").alias("bucket"), "value")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(25,6)")).cast("double").alias("total"),
        )
    )


@register(
    "agg_equidepth_histogram",
    oracle="""
    WITH t AS (
      SELECT o_totalprice AS v,
             ntile(8) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
      FROM orders
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           min(v) AS lo, max(v) AS hi
    FROM t GROUP BY 1
    """,
)
def agg_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EQUI-DEPTH histogram of order totals (new r11) — the quantile
    complement to `agg_histogram`'s fixed-width buckets: ntile(8)
    assigns each row to one of 8 equal-POPULATION buckets, and the
    rollup reports each bucket's count and [lo, hi] value bounds —
    the structure query optimizers keep for selectivity estimation
    (equi-depth bounds adapt to skew; equi-width buckets go empty or
    hot). ntile's split rule (earlier buckets take the remainder) is
    identical in Spark and DuckDB, and the (value, key) ORDER pins a
    total order, so bucket assignment is deterministic; bounds are
    stored doubles projected unchanged (bit-exact, no rounding
    needed).

    Scale: ntile over a global ORDER is a full sort — the honest cost
    of an exact equi-depth histogram (Spark range-partitions the sort;
    no single-machine bottleneck); the approximate path at 100 TB is
    `agg_approx_percentile`/`agg_quantile_twopass` computing the 9
    boundary quantiles directly."""
    o = load_table(spark, "orders", sf_dir)
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        o.select(F.col("o_totalprice").alias("v"),
                 F.ntile(8).over(w).alias("bucket"))
        .groupBy(F.col("bucket").cast("long").alias("bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"),
             F.min("v").alias("lo"), F.max("v").alias("hi"))
    )


@register(
    "events_activity_heatmap",
    oracle="""
    SELECT CAST(dayofweek(ts) AS BIGINT) AS dow,
           CAST(hour(ts) AS BIGINT) AS hod,
           count(*) AS n,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY 1, 2
    """,
)
def events_activity_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour-of-day activity heatmap with distinct users
    per cell — the usage-pattern rollup. 168-cell output; the distinct
    count is the only reason this shuffles raw (user, cell) pairs, and
    at 100 TB swaps for approx_count_distinct per the aggregation
    family budget. DuckDB dayofweek is 0-6 Sunday-first; Spark's
    dayofweek is 1-7, so the expression subtracts 1 to match."""
    e = load_table(spark, "events", sf_dir)
    return (
        e.select(
            (F.dayofweek("ts") - 1).cast("long").alias("dow"),
            F.hour("ts").cast("long").alias("hod"),
            "user_id",
        )
        .groupBy("dow", "hod")
        .agg(F.count(F.lit(1)).alias("n"), F.count_distinct("user_id").alias("n_users"))
    )


@register(
    "events_funnel_steps",
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY 1
    ),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN s1 ON s1.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1
    ),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN s2 ON s2.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1
    )
    SELECT 'view' AS step, CAST(1 AS BIGINT) AS step_no, count(*) AS n_users FROM s1
    UNION ALL
    SELECT 'view>click', CAST(2 AS BIGINT), count(*) FROM s2
    UNION ALL
    SELECT 'view>click>purchase', CAST(3 AS BIGINT), count(*) FROM s3
    """,
)
def events_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-step funnel (view → click → purchase): a user counts
    at step k only with a strictly-later event than their step-k-1
    entry — the product-analytics funnel with ORDER enforced, not mere
    set intersection. Each stage is a filtered min-aggregate joined to
    the previous stage's (user, ts) relation: per-stage shuffles are
    user-keyed and the stage relations shrink monotonically, so at
    scale stage k joins broadcast against stage k-1's survivors."""
    e = load_table(spark, "events", sf_dir)

    def stage(df_events, etype, prev):
        j = df_events.filter(F.col("event_type") == etype)
        if prev is not None:
            j = j.join(prev, "user_id").filter(F.col("ts") > F.col("t_prev"))
        return j.groupBy("user_id").agg(F.min("ts").alias("t_prev"))

    s1 = stage(e, "view", None)
    s2 = stage(e, "click", s1.select("user_id", "t_prev"))
    s3 = stage(e, "purchase", s2.select("user_id", "t_prev"))
    rows = [
        s1.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit("view").alias("step"), F.lit(1).cast("long").alias("step_no"), "n_users"
        ),
        s2.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit("view>click").alias("step"), F.lit(2).cast("long").alias("step_no"), "n_users"
        ),
        s3.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit("view>click>purchase").alias("step"),
            F.lit(3).cast("long").alias("step_no"),
            "n_users",
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


@register(
    "events_lateness_profile",
    oracle="""
    WITH r AS (
      SELECT user_id, ts,
             max(ts) OVER (PARTITION BY user_id ORDER BY event_id ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_max
      FROM events
    )
    SELECT CAST((epoch_us(run_max) - epoch_us(ts)) // 600000000 AS BIGINT) AS late_bucket_10m,
           count(*) AS n
    FROM r GROUP BY 1
    """,
)
def events_lateness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-orderness profile: how far behind its user's running-max
    event time each arriving event is (arrival order = event_id),
    bucketed in 10-minute steps — THE empirical input for choosing a
    watermark delay (the bucket covering ~P99 lateness is your bound;
    everything beyond is data a that watermark would drop). One
    user-keyed window (the same distribution keyed streaming state
    uses) + a tiny bucket aggregation. On the driver fixture events
    arrive in-order per user, so the profile collapses to bucket 0 —
    which is itself the finding (a minimal watermark suffices)."""
    e = load_table(spark, "events", sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run_max = F.max("ts").over(w)
    lateness_us = epoch_us(run_max) - epoch_us(F.col("ts"))
    return (
        e.select((lateness_us / 600_000_000).cast("long").alias("late_bucket_10m"))
        .groupBy("late_bucket_10m")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "orders_rfm_segments",
    oracle="""
    WITH mx AS (SELECT max(o_orderdate) AS dmax FROM orders),
    base AS (
      SELECT o.o_custkey,
             CAST(date_diff('day', max(o.o_orderdate), mx.dmax) AS BIGINT) AS recency_days,
             count(*) AS frequency,
             CAST(sum(CAST(o.o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS monetary
      FROM orders o CROSS JOIN mx
      GROUP BY o.o_custkey, mx.dmax
    )
    SELECT o_custkey, recency_days, CAST(frequency AS BIGINT) AS frequency, monetary,
           CAST(ntile(5) OVER (ORDER BY recency_days ASC, o_custkey ASC) AS BIGINT) AS r_score,
           CAST(ntile(5) OVER (ORDER BY frequency DESC, o_custkey ASC) AS BIGINT) AS f_score,
           CAST(ntile(5) OVER (ORDER BY monetary DESC, o_custkey ASC) AS BIGINT) AS m_score
    FROM base
    """,
)
def orders_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per customer, days since last order (vs the
    corpus max date), order count, and decimal-exact lifetime spend,
    each quintile-scored (ntile, customer-key tiebreaks). The base
    aggregation is one customer-keyed shuffle; the three global ntile
    windows run on the |customers| relation — at 100 TB swap them for
    the feature_bins_lookup edge-broadcast pattern, which this query's
    exact scores calibrate."""
    o = load_table(spark, "orders", sf_dir)
    mx = o.agg(F.max("o_orderdate").alias("dmax"))
    base = (
        o.crossJoin(F.broadcast(mx))
        .groupBy("o_custkey", "dmax")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(25,6)")).cast("double").alias("monetary"),
        )
        .select(
            "o_custkey",
            F.datediff(F.col("dmax"), F.col("last_order")).cast("long").alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    wr = Window.orderBy(F.asc("recency_days"), F.asc("o_custkey"))
    wf = Window.orderBy(F.desc("frequency"), F.asc("o_custkey"))
    wm = Window.orderBy(F.desc("monetary"), F.asc("o_custkey"))
    return base.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(5).over(wr).cast("long").alias("r_score"),
        F.ntile(5).over(wf).cast("long").alias("f_score"),
        F.ntile(5).over(wm).cast("long").alias("m_score"),
    )


@register(
    "setop_intersect_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics): each customer key appears
    min(#finished, #open) times — the multiplicity-preserving variant
    completing the set-op surface next to intersect/exceptAll."""
    o = load_table(spark, "orders", sf_dir)
    f = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    op = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.intersectAll(op)


def _recursive_spine_sql(str_type: str, level_clause: str = "") -> str:
    """Shared recursive-CTE text; the dialect splits are the
    unparameterized string type name (Spark: STRING, DuckDB: VARCHAR)
    and Spark's MAX RECURSION LEVEL clause (the data spans ~116 months,
    past Spark's default 100-step guard; DuckDB has no such clause)."""
    return f"""
    WITH RECURSIVE bounds AS (
      SELECT CAST(date_trunc('month', max(o_orderdate)) AS DATE) AS mx FROM orders
    ),
    months(m){level_clause} AS (
      SELECT CAST('1992-01-01' AS DATE)
      UNION ALL
      SELECT m + INTERVAL 1 MONTH FROM months CROSS JOIN bounds WHERE m < bounds.mx
    )
    SELECT CAST(months.m AS {str_type}) AS month_start,
           CAST(count(o.o_orderkey) AS BIGINT) AS n_orders
    FROM months
      LEFT JOIN orders o
        ON CAST(date_trunc('month', o.o_orderdate) AS DATE) = months.m
    GROUP BY months.m
"""


@register("sql_recursive_cte", oracle=_recursive_spine_sql("VARCHAR"))
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE (new in Spark 4): a month spine generated by the
    recursive anchor/step pattern, left-joined to per-month order
    counts — empty months survive as zero rows, the gap-fill shape
    `events_gapfill_locf` builds with `sequence()` expressed in pure
    recursive SQL instead. The SAME statement text runs on DuckDB as
    the oracle up to one type-name spelling (STRING vs VARCHAR), so
    this also pins cross-dialect recursive-CTE compatibility (DATE
    anchor, INTERVAL step, scalar-subquery recursion bound). Recursion
    depth = #months (bounded by the data's date span); each step is one
    tiny union branch — the spine never shuffles more than its own
    rows."""
    from bigdata06_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_recursive_spine_sql("STRING", " MAX RECURSION LEVEL 500"))


_MONTHLY_REV_SQL = """
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mo,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS cents,
             row_number() OVER (ORDER BY CAST(date_trunc('month', o_orderdate) AS DATE))
               AS i
      FROM orders GROUP BY CAST(date_trunc('month', o_orderdate) AS DATE)
"""


def _unrolled_recursion(m_body: str, mat: str, level_clause: str,
                        rel: str, val_col: str, init_expr: str,
                        step_tmpl: str, K: int = 8) -> str:
    """UNROLLED recursive-CTE body (VERDICT r4 #6): each engine
    iteration advances K months at once — the sequential recurrence
    is nested K-deep inside one select (integer-exact, so unrolling
    is pure algebra), the K emitted rows come from a VALUES cross
    join, and only the k=K row carries the recursion forward (the
    `carrier` flag gates the next step's join). Depth drops from
    #months to ⌈#months/K⌉; measured at sf0.1 the per-iteration
    machinery dominated (8.3s for 80 steps), so K=8 cut
    forecast_exp_smoothing to ~2.5s warm. The tail (months not
    divisible by K) falls out of the LEFT joins: row k emits only if
    month i+k exists, and a missing month k=K simply yields no
    carrier — recursion ends.

    `step_tmpl` is the one-month state update with `{prev}` and `{k}`
    placeholders (e.g. `(3 * ({prev}) + m{k}.cents) {idiv} 4`)."""
    s_exprs = [step_tmpl.format(prev="sm.s", k=1)]
    for k in range(2, K + 1):
        s_exprs.append(step_tmpl.format(prev=s_exprs[-1], k=k))

    def case_of(fmt: str) -> str:
        whens = " ".join(f"WHEN {k} THEN {fmt.format(k=k)}" for k in range(1, K))
        return f"CASE k.k {whens} ELSE {fmt.format(k=K)} END"

    s_whens = " ".join(f"WHEN {k} THEN {s_exprs[k - 1]}" for k in range(1, K))
    joins = "JOIN m m1 ON m1.i = sm.i + 1 AND sm.carrier\n      " + "\n      ".join(
        f"LEFT JOIN m m{k} ON m{k}.i = sm.i + {k}" for k in range(2, K + 1)
    )
    vals = ", ".join(f"({k})" for k in range(1, K + 1))
    return f"""
    WITH RECURSIVE m AS{mat} ({m_body}),
    {rel}(i, mo, {val_col}, s, carrier){level_clause} AS (
      SELECT i, mo, {val_col}, {init_expr}, TRUE FROM m WHERE i = 1
      UNION ALL
      SELECT sm.i + k.k,
             {case_of("m{k}.mo")},
             {case_of("m{k}." + val_col)},
             CASE k.k {s_whens} ELSE {s_exprs[K - 1]} END,
             k.k = {K}
      FROM {rel} sm
      {joins}
      CROSS JOIN (VALUES {vals}) k(k)
      WHERE {case_of("m{k}.i IS NOT NULL")}
    )"""


def _exp_smoothing_sql(str_type: str, idiv: str, level_clause: str = "",
                       m_source: str | None = None) -> str:
    """Shared recursive exponential-smoothing text. Dialect splits:
    string type name, integer-division spelling (Spark `div`, DuckDB
    `//` — identical on the positive cents here, where floor = trunc),
    and Spark's MAX RECURSION LEVEL clause. `m_source` swaps the
    monthly-aggregate CTE body for a PRE-MATERIALIZED relation on the
    Spark side: each recursion step references `m`, and without
    materialization the engine re-runs the fact aggregate once PER
    MONTH STEP — measured 24-45s at sf0.1 vs ~7-9s anchored on an
    80-row checkpointed view (DuckDB gets AS MATERIALIZED for the
    same reason). The remaining per-iteration machinery cost is cut
    8× by `_unrolled_recursion` (K=8 months per engine step; the
    IDENTICAL unrolled text runs on both engines)."""
    m_body = m_source or _MONTHLY_REV_SQL
    mat = "" if m_source else " MATERIALIZED"
    spine = _unrolled_recursion(
        m_body, mat, level_clause, "sm", "cents", "cents",
        f"(3 * ({{prev}}) + m{{k}}.cents) {idiv} 4",
    )
    return f"""{spine}
    SELECT CAST(mo AS {str_type}) AS month_start,
           CAST(cents AS BIGINT) AS revenue_cents,
           CAST(s AS BIGINT) AS smoothed_cents
    FROM sm
"""


@register(
    "forecast_exp_smoothing",
    oracle=_exp_smoothing_sql("VARCHAR", "//"),
)
def forecast_exp_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STATEFUL time-series recursion as a recursive CTE: integer
    exponential smoothing of monthly revenue — s₁ = x₁,
    sₜ = ⌊(3·sₜ₋₁ + xₜ)/4⌋ (α = 1/4 as exact rational arithmetic on
    cents) — the trend-following smoother behind capacity forecasts,
    expressed with NO driver loop: the recursion itself runs in the
    engine (Spark 4 WITH RECURSIVE), one month per step over the
    80-row monthly aggregate, never the fact table. The oracle is the
    SAME statement up to dialect spelling (`div` vs `//`, identical on
    positive operands; STRING vs VARCHAR), extending the recursive-CTE
    parity pin (`sql_recursive_cte`) from spine GENERATION to genuine
    sequential STATE. Depth = #months — bounded by the data's date
    span, not its size; the fact scan is one month-keyed aggregate."""
    from bigdata06_spark.catalog import register_views

    register_views(spark, sf_dir)
    # materialize the 80-row monthly aggregate ONCE; the recursion
    # anchors on the checkpointed view instead of re-aggregating the
    # fact per step (see _exp_smoothing_sql)
    spark.sql(f"SELECT * FROM ({_MONTHLY_REV_SQL})").localCheckpoint(
        eager=True
    ).createOrReplaceTempView("monthly_rev_cents")
    return spark.sql(
        _exp_smoothing_sql(
            "STRING", "div", " MAX RECURSION LEVEL 500",
            m_source="SELECT * FROM monthly_rev_cents",
        )
    )


def _monthly_net_sql(idiv: str) -> str:
    return f"""
      SELECT mo,
             net - ((sum(net) OVER ()) {idiv} (count(*) OVER ())) AS delta,
             row_number() OVER (ORDER BY mo) AS i
      FROM (
        SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS mo,
               CAST(sum(CASE WHEN l_returnflag = 'R'
                             THEN -CAST(l_quantity AS BIGINT)
                             ELSE CAST(l_quantity AS BIGINT) END) AS BIGINT) AS net
        FROM lineitem GROUP BY CAST(date_trunc('month', l_shipdate) AS DATE)
      ) m0
"""


def _clamped_running_sum_sql(str_type: str, idiv: str,
                             level_clause: str = "",
                             m_source: str | None = None) -> str:
    """Shared recursive clamped-running-sum text (dialect splits and
    the `m_source` pre-materialization lever as `_exp_smoothing_sql`).
    Inventory semantics: monthly net movement (shipped minus returned
    units, centered on the mean month so the series oscillates),
    accumulated under a [0, 5000] clamp."""
    m_body = m_source or _monthly_net_sql(idiv)
    mat = "" if m_source else " MATERIALIZED"
    spine = _unrolled_recursion(
        m_body, mat, level_clause, "inv", "delta",
        "greatest(0, least(5000, delta))",
        "greatest(0, least(5000, ({prev}) + m{k}.delta))",
    )
    return f"""{spine}
    SELECT CAST(mo AS {str_type}) AS month_start,
           CAST(delta AS BIGINT) AS net_delta,
           CAST(s AS BIGINT) AS stock_level
    FROM inv
"""


@register(
    "inventory_clamped_running_sum",
    oracle=_clamped_running_sum_sql("VARCHAR", "//"),
)
def inventory_clamped_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CLAMPED running sum — the textbook sequential computation a
    window CANNOT express (each month's stock level depends on whether
    EARLIER clamps bound: levelₜ = max(0, min(cap, levelₜ₋₁ + Δₜ)),
    warehouse capacity on top / stock-out at 0 below — a cumulative
    `sum() OVER` has no way to re-anchor after saturation). Runs as a
    recursive CTE in the engine, one step per month over the 83-row
    monthly aggregate; on this data both clamps genuinely bind (6
    stock-outs, 15 capacity saturations), so the oracle match proves
    the sequential semantics, not just an unclamped cumsum. Dialect
    parity as `forecast_exp_smoothing`."""
    from bigdata06_spark.catalog import register_views

    register_views(spark, sf_dir)
    spark.sql(f"SELECT * FROM ({_monthly_net_sql('div')})").localCheckpoint(
        eager=True
    ).createOrReplaceTempView("monthly_net_units")
    return spark.sql(
        _clamped_running_sum_sql(
            "STRING", "div", " MAX RECURSION LEVEL 500",
            m_source="SELECT * FROM monthly_net_units",
        )
    )


@register(
    "sql_scripting_block",
    oracle="""
    WITH params AS (
      SELECT floor(avg(o_totalprice) * 100 + 0.5) / 100 AS threshold FROM orders
    )
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_above,
           floor(min(o.o_totalprice) * 100 + 0.5) / 100 AS min_above
    FROM orders o CROSS JOIN params p
    WHERE o.o_totalprice > p.threshold
    GROUP BY o.o_orderpriority
    """,
)
def sql_scripting_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scripting (new in Spark 4): a BEGIN…END compound with a
    DECLAREd session variable assigned from a scalar subquery, consumed
    by the block's final SELECT — the procedural-parameter pattern
    (thresholds, as-of dates) without driver round-trips: the variable
    binds inside the engine, so at cluster scale the scalar never
    leaves the JVM between statements. DuckDB has no scripting surface;
    the oracle expresses the same parameterization relationally (the
    threshold as a 1-row CTE cross-joined in), which also documents the
    de-sugaring."""
    from bigdata06_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        BEGIN
          DECLARE threshold DOUBLE;
          SET threshold = (
            SELECT floor(avg(o_totalprice) * 100 + 0.5) / 100 FROM orders
          );
          SELECT o_orderpriority,
                 count(*) AS n_above,
                 floor(min(o_totalprice) * 100 + 0.5) / 100 AS min_above
          FROM orders
          WHERE o_totalprice > threshold
          GROUP BY o_orderpriority;
        END
        """
    )


@register(
    "agg_freq_items_sketch",
    oracle="""
    WITH t AS (SELECT count(*) AS total FROM lineitem),
    c AS (
      SELECT l_linenumber, count(*) AS cnt FROM lineitem GROUP BY l_linenumber
    )
    SELECT c.l_linenumber, CAST(c.cnt AS BIGINT) AS cnt, TRUE AS covered
    FROM c CROSS JOIN t
    WHERE c.cnt > 0.1 * t.total
    """,
)
def agg_freq_items_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via the frequent-items sketch (`df.stat.freqItems`,
    Karp/Shenker/Papadimitriou lossy counting): single pass, memory
    O(1/support), mergeable — the scale path for "which keys dominate"
    where an exact groupBy's key cardinality is itself the hazard.

    The sketch's contract is one-sided: it returns a SUPERSET of every
    item with frequency > support·n (false positives possible, false
    negatives not). Like the approx-distinct/percentile queries, the
    driver-checkable form is self-certifying: compute the exact heavy
    hitters (groupBy + total), flag each as `covered` iff it appears in
    the sketch's item set (relational join against the exploded sketch
    output — no driver collect), and let the oracle pin the exact side
    plus the TRUE certificate. A sketch regression (lost true heavy
    hitter) turns the row red."""
    li = load_table(spark, "lineitem", sf_dir)
    total = li.agg(F.count(F.lit(1)).alias("total"))
    exact = (
        li.groupBy("l_linenumber")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") > 0.1 * F.col("total"))
    )
    sketch = (
        li.stat.freqItems(["l_linenumber"], 0.1)
        .select(F.explode("l_linenumber_freqItems").alias("l_linenumber"))
        .withColumn("_hit", F.lit(True))
    )
    return exact.join(F.broadcast(sketch), "l_linenumber", "left").select(
        "l_linenumber",
        "cnt",
        F.coalesce(F.col("_hit"), F.lit(False)).alias("covered"),
    )


@register(
    "agg_median_mode",
    oracle="""
    WITH c AS (
      SELECT l_returnflag, l_linenumber, count(*) AS cnt
      FROM lineitem GROUP BY l_returnflag, l_linenumber
    ),
    m AS (SELECT l_returnflag, max(cnt) AS mx FROM c GROUP BY l_returnflag),
    md AS (
      SELECT c.l_returnflag, min(c.l_linenumber) AS mode_ln,
             CAST(max(c.cnt) AS BIGINT) AS mode_cnt
      FROM c JOIN m ON c.l_returnflag = m.l_returnflag AND c.cnt = m.mx
      GROUP BY c.l_returnflag
    ),
    med AS (
      SELECT l_returnflag, median(l_quantity) AS med_qty,
             median(l_extendedprice) AS med_price
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT md.l_returnflag, md.mode_ln, md.mode_cnt,
           TRUE AS builtin_mode_is_argmax, med.med_qty, med.med_price
    FROM md JOIN med ON md.l_returnflag = med.l_returnflag
    """,
)
def agg_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact MEDIAN and MODE per group — the order-statistics aggregates
    the rest of the agg surface doesn't cover.

    Median uses the built-in `median` (exact interpolated 0.5-percentile
    — identical interpolation to DuckDB's `median`, and the inputs are
    exact-decimal doubles, so the midpoint average is bit-exact).

    Mode is NOT hash-comparable as a built-in: both engines return an
    arbitrary member of the argmax set under ties. The deterministic
    form here is min-of-argmax (smallest value among the most frequent),
    computed relationally — count per (group, value), max count per
    group, min value at that count. The built-in `F.mode` still runs,
    but what's emitted is a CERTIFICATE (its value's count equals the
    max count — TRUE on both sides), the same self-certifying pattern
    as the sketch queries. Scale: two map-side-combined aggregates on
    uniform keys plus tiny argmax joins."""
    li = load_table(spark, "lineitem", sf_dir)
    c = li.groupBy("l_returnflag", "l_linenumber").agg(F.count(F.lit(1)).alias("cnt"))
    md = c.groupBy("l_returnflag").agg(
        F.min_by("l_linenumber", F.struct(-F.col("cnt"), F.col("l_linenumber"))).alias("mode_ln"),
        F.max("cnt").alias("mode_cnt"),
    )
    builtin = li.groupBy("l_returnflag").agg(F.mode("l_linenumber").alias("_bm"))
    bm_cnt = builtin.join(
        c.select(F.col("l_returnflag"), F.col("l_linenumber").alias("_bm"), F.col("cnt").alias("_bmc")),
        ["l_returnflag", "_bm"],
    )
    med = li.groupBy("l_returnflag").agg(
        F.median("l_quantity").alias("med_qty"),
        F.median("l_extendedprice").alias("med_price"),
    )
    return (
        md.join(bm_cnt, "l_returnflag")
        .join(med, "l_returnflag")
        .select(
            "l_returnflag",
            "mode_ln",
            "mode_cnt",
            (F.col("_bmc") == F.col("mode_cnt")).alias("builtin_mode_is_argmax"),
            "med_qty",
            "med_price",
        )
    )


@register(
    "agg_hll_sketch_rollup",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS union_in_bound
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup: HLL sketches built per FINE group
    (`hll_sketch_agg` on (returnflag, linestatus)), then UNIONED to the
    coarse group (`hll_union_agg` per returnflag) and estimated — the
    re-aggregation property that makes sketches the 100 TB path:
    pre-aggregated daily/partition sketches roll up to any coarser
    grain without touching raw data, which exact distinct counts
    fundamentally cannot do (distincts don't sum).

    Like `agg_approx_distinct`, the estimate itself is engine-specific,
    so the driver-checkable contract is the exact distinct count plus a
    certificate that the unioned estimate lands within 5σ of it
    (lgConfigK=12 → rsd = 1.04/√4096 ≈ 1.6%, 5σ ≈ 8%). A regression in
    the sketch/merge path turns the row red."""
    li = load_table(spark, "lineitem", sf_dir)
    fine = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.hll_sketch_agg("l_partkey", F.lit(12)).alias("sk")
    )
    coarse = fine.groupBy("l_returnflag").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk", F.lit(False))).alias("_est")
    )
    exact = li.groupBy("l_returnflag").agg(F.countDistinct("l_partkey").alias("exact_parts"))
    tol = 0.08
    return exact.join(coarse, "l_returnflag").select(
        "l_returnflag",
        "exact_parts",
        (F.abs(F.col("_est") - F.col("exact_parts")) <= F.col("exact_parts") * tol).alias(
            "union_in_bound"
        ),
    )


@register(
    "cdc_scd2_history",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(event_type) OVER w IS NULL
                    OR lag(event_type) OVER w <> event_type
                  THEN 1 ELSE 0 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    runs AS (
      SELECT user_id, ts, event_type,
             sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS run
      FROM seq
    ),
    hist AS (
      SELECT user_id, run, event_type,
             min(ts) AS valid_from, count(*) AS n_events
      FROM runs GROUP BY user_id, run, event_type
    )
    SELECT user_id, event_type, valid_from,
           lead(valid_from) OVER (PARTITION BY user_id ORDER BY run) AS valid_to,
           CAST(n_events AS BIGINT) AS n_events,
           lead(valid_from) OVER (PARTITION BY user_id ORDER BY run) IS NULL AS is_current
    FROM hist
    """,
)
def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 dimension history: collapse each user's event_type
    timeline into validity intervals — one row per consecutive RUN of
    the same attribute value, with [valid_from, valid_to) bounds,
    open-ended (NULL / is_current) on the latest run. The companion to
    `cdc_scd1_merge`: type 1 keeps only the latest value, type 2 keeps
    the full history as intervals — the warehouse pattern for
    slowly-changing dimensions built from a changelog.

    Classic gaps-and-islands: a window lag marks value changes, a
    running sum turns change-marks into run ids, a groupBy collapses
    runs, a lead closes each interval with the next run's start. Order
    is pinned by (ts, event_id) so runs are deterministic under equal
    timestamps.

    Scale: every window/groupBy here partitions by user_id — ONE
    shuffle on the natural key, then all four steps ride the same
    exchange (no per-step re-partitioning). State per key is a scalar,
    never the row history."""
    ev = load_table(spark, "events", sf_dir).select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(w)
    seq = ev.withColumn(
        "chg", F.when(prev.isNull() | (prev != F.col("event_type")), 1).otherwise(0)
    )
    runs = seq.withColumn(
        "run",
        F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    hist = runs.groupBy("user_id", "run", "event_type").agg(
        F.min("ts").alias("valid_from"), F.count(F.lit(1)).alias("n_events")
    )
    w_run = Window.partitionBy("user_id").orderBy("run")
    valid_to = F.lead("valid_from").over(w_run)
    return hist.select(
        "user_id",
        "event_type",
        "valid_from",
        valid_to.alias("valid_to"),
        "n_events",
        valid_to.isNull().alias("is_current"),
    )


def _pagerank_oracle(iters: int = 3, scale: int = 10**12, d_num: int = 85, d_den: int = 100) -> str:
    """Unrolled integer-PageRank replay (see `graph_pagerank`)."""
    teleport = scale * (d_den - d_num) // d_den
    parts = [
        f"""
    WITH pairs AS (
      SELECT event_type AS src,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
      FROM events
    ),
    edges AS (SELECT src, dst, count(*) AS w FROM pairs WHERE dst IS NOT NULL GROUP BY src, dst),
    outw AS (SELECT src, sum(w) AS ow FROM edges GROUP BY src),
    e AS (SELECT edges.src, edges.dst, edges.w, outw.ow FROM edges JOIN outw ON edges.src = outw.src),
    nodes AS (SELECT DISTINCT event_type AS node FROM events),
    nn AS (SELECT count(*) AS n FROM nodes),
    r0 AS (SELECT node, CAST({scale} // n AS BIGINT) AS r FROM nodes CROSS JOIN nn)"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f""",
    s{i} AS (SELECT e.dst AS node, CAST(sum((r{i-1}.r * e.w) // e.ow) AS BIGINT) AS sc
             FROM e JOIN r{i-1} ON e.src = r{i-1}.node GROUP BY e.dst),
    r{i} AS (SELECT nodes.node,
                    CAST({teleport} // nn.n + (coalesce(s{i}.sc, 0) * {d_num}) // {d_den} AS BIGINT) AS r
             FROM nodes CROSS JOIN nn LEFT JOIN s{i} ON s{i}.node = nodes.node)"""
        )
    parts.append(f"\n    SELECT node, r AS rank_scaled FROM r{iters}")
    return "".join(parts)


@register("graph_pagerank", oracle=_pagerank_oracle())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the event-type transition graph — the
    iterative-propagation companion to `dedup_components` (min-label)
    and `events_transition_matrix` (the one-step matrix): rank flows
    along observed transition edges, damped, for a fixed 3 iterations.

    Exactness across engines: all arithmetic is INTEGER on ranks scaled
    by 1e12 — floor-div edge contributions r·w/out_w, 85/100 damping,
    floor-div teleport — so the DuckDB replay (unrolled CTEs) is
    bit-identical; no float reassociation anywhere (same trick as
    `embedding_kmeans`). Dangling-node mass is dropped (not
    redistributed) on both sides, documented semantics.

    Scale shape: per iteration one join of ranks to edges on src plus
    one groupBy on dst — the textbook distributed PageRank step. Edges
    partition by src once and every iteration reuses that exchange;
    rank state is (node, long), never the adjacency. The driver loop is
    control flow only (fixed depth, no convergence collect). Node count
    here is tiny, but nothing in the plan is node-count-bounded."""
    S, D_NUM, D_DEN, ITERS = 10**12, 85, 100, 3
    ev = load_table(spark, "events", sf_dir).select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.withColumn("dst", F.lead("event_type").over(w)).filter(F.col("dst").isNotNull())
    edges = pairs.groupBy(F.col("event_type").alias("src"), "dst").agg(
        F.count(F.lit(1)).alias("w")
    )
    outw = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    e = edges.join(outw, "src")
    nodes = ev.select(F.col("event_type").alias("node")).distinct()
    cnt = nodes.agg(F.count(F.lit(1)).alias("n"))
    teleport = S * (D_DEN - D_NUM) // D_DEN
    ranks = nodes.crossJoin(F.broadcast(cnt)).select(
        "node", F.expr(f"CAST({S} AS BIGINT) DIV n").alias("r")
    )
    for _ in range(ITERS):
        contrib = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"), F.expr("(r * w) DIV ow").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("sc"))
        )
        ranks = (
            nodes.crossJoin(F.broadcast(cnt))
            .join(contrib, "node", "left")
            .select(
                "node",
                F.expr(
                    f"CAST({teleport} AS BIGINT) DIV n + (coalesce(sc, CAST(0 AS BIGINT)) * {D_NUM}) DIV {D_DEN}"
                ).alias("r"),
            )
        )
    return ranks.select("node", F.col("r").alias("rank_scaled"))


_PPR_SEED = "purchase"


def _ppr_oracle(seed: str = _PPR_SEED, iters: int = 4, scale: int = 10**12,
                d_num: int = 85, d_den: int = 100) -> str:
    """Unrolled integer personalized-PageRank replay (see
    `graph_personalized_pagerank`): identical to `_pagerank_oracle`
    except r0 and the restart mass both concentrate on the seed."""
    teleport = scale * (d_den - d_num) // d_den
    parts = [
        f"""
    WITH pairs AS (
      SELECT event_type AS src,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
      FROM events
    ),
    edges AS (SELECT src, dst, count(*) AS w FROM pairs WHERE dst IS NOT NULL GROUP BY src, dst),
    outw AS (SELECT src, sum(w) AS ow FROM edges GROUP BY src),
    e AS (SELECT edges.src, edges.dst, edges.w, outw.ow FROM edges JOIN outw ON edges.src = outw.src),
    nodes AS (SELECT DISTINCT event_type AS node FROM events),
    r0 AS (SELECT node, CAST(CASE WHEN node = '{seed}' THEN {scale} ELSE 0 END AS BIGINT) AS r
           FROM nodes)"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f""",
    s{i} AS (SELECT e.dst AS node, CAST(sum((r{i-1}.r * e.w) // e.ow) AS BIGINT) AS sc
             FROM e JOIN r{i-1} ON e.src = r{i-1}.node GROUP BY e.dst),
    r{i} AS (SELECT nodes.node,
                    CAST(CASE WHEN nodes.node = '{seed}' THEN {teleport} ELSE 0 END
                         + (coalesce(s{i}.sc, 0) * {d_num}) // {d_den} AS BIGINT) AS r
             FROM nodes LEFT JOIN s{i} ON s{i}.node = nodes.node)"""
        )
    parts.append(f"\n    SELECT node, r AS rank_scaled FROM r{iters}")
    return "".join(parts)


@register("graph_personalized_pagerank", oracle=_ppr_oracle())
def graph_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERSONALIZED PageRank from the '{purchase}' seed (new r11) —
    the query-biased variant of `graph_pagerank` and the primitive
    behind related-item / similar-node recommendation: all restart
    mass returns to the SEED instead of spreading uniformly, so ranks
    measure proximity TO THE SEED under damped random walks (nodes
    the seed can't reach decay to 0), not global centrality. Same
    event-type transition graph, 4 fixed iterations.

    Exactness: the `graph_pagerank` integer discipline verbatim —
    1e12-scaled BIGINT ranks, floor-div contributions and damping, so
    the unrolled DuckDB replay is bit-identical; the only deltas are
    r0 (seed-concentrated) and the restart term (seed-only), both
    pure CASE expressions.

    Scale shape: identical per-iteration join+groupBy as PageRank —
    personalization changes only two scalar expressions, which is the
    point: the distributed plan is seed-independent, so one prepared
    pipeline serves any seed (or any seed VECTOR, by making r0 a
    relation)."""
    S, D_NUM, D_DEN, ITERS = 10**12, 85, 100, 4
    ev = load_table(spark, "events", sf_dir).select(
        "user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.withColumn("dst", F.lead("event_type").over(w)).filter(
        F.col("dst").isNotNull())
    edges = pairs.groupBy(F.col("event_type").alias("src"), "dst").agg(
        F.count(F.lit(1)).alias("w"))
    outw = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    e = edges.join(outw, "src")
    nodes = ev.select(F.col("event_type").alias("node")).distinct()
    teleport = S * (D_DEN - D_NUM) // D_DEN
    seed_r = F.when(F.col("node") == _PPR_SEED, F.lit(S)).otherwise(F.lit(0))
    ranks = nodes.select("node", seed_r.cast("long").alias("r"))
    restart = F.when(F.col("node") == _PPR_SEED, F.lit(teleport)).otherwise(
        F.lit(0)).cast("long")
    for _ in range(ITERS):
        contrib = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"),
                    F.expr("(r * w) DIV ow").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("sc"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (restart
                 + F.expr(f"(coalesce(sc, CAST(0 AS BIGINT)) * {D_NUM}) DIV {D_DEN}")
                 ).cast("long").alias("r"),
            )
        )
    return ranks.select("node", F.col("r").alias("rank_scaled"))


@register(
    "sql_pipe_syntax",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE)
             AS disc_revenue,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4 `|>` operators): the linear
    FROM → WHERE → AGGREGATE dataflow form of the q1-style pricing
    summary. Same Catalyst plan as the nested form — the surface is
    sugar, so the oracle is the equivalent ANSI text; decimal-backed
    sums keep the hash exact."""
    from bigdata06_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql("""
        FROM lineitem
        |> WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |> AGGREGATE CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty,
                     CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE)
                       AS disc_revenue,
                     count(*) AS n
           GROUP BY l_returnflag, l_linestatus
        |> SELECT l_returnflag, l_linestatus, sum_qty, disc_revenue, n
    """)


@register(
    "sql_parameterized",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total
    FROM orders
    WHERE o_totalprice > 150000.0
    GROUP BY o_orderpriority
    """,
)
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL with named markers and an IDENTIFIER() table
    reference — the injection-safe form of templated queries (values
    bind as literals AFTER parsing; identifiers resolve through the
    catalog, not string splicing). The oracle inlines the same
    bindings."""
    from bigdata06_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority,
               count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total
        FROM IDENTIFIER(:tbl)
        WHERE o_totalprice > :minp
        GROUP BY o_orderpriority
        """,
        args={"tbl": "orders", "minp": 150000.0},
    )


# Shared final-projection text for agg_corr_moments: identical
# expression TREES on identical decimal-sourced inputs give identical
# IEEE doubles in both engines; the 6dp rounding absorbs nothing in
# practice but documents the guarantee boundary.
_MOMENTS_FINAL = """
    SELECT l_returnflag, n,
           floor((sxy - sx * sy / n) / n * 1e6 + 0.5) / 1e6 AS cov_pop,
           floor((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) * 1e6 + 0.5) / 1e6 AS corr,
           floor(sqrt((sxx - sx * sx / n) / (n - 1)) * 1e6 + 0.5) / 1e6 AS stddev_x,
           floor((sxxx / n - 3 * (sx / n) * (sxx / n) + 2 * (sx / n) * (sx / n) * (sx / n))
                 / pow((sxx - sx * sx / n) / n, 1.5) * 1e6 + 0.5) / 1e6 AS skew_x
    FROM moments
"""


@register(
    "agg_corr_moments",
    oracle=f"""
    WITH moments AS (
      SELECT l_returnflag,
             CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sx,
             CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sy,
             CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
             CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS syy,
             CAST(sum(CAST(l_extendedprice * l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
             CAST(sum(CAST(l_extendedprice * l_extendedprice * l_extendedprice
                           AS DECIMAL(38,6))) AS DOUBLE) AS sxxx
      FROM lineitem GROUP BY l_returnflag
    )
    {_MOMENTS_FINAL}
    """,
)
def agg_corr_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlation, covariance, stddev, and skewness per group — the
    statistical-moment aggregates (`corr`/`covar_pop`/`stddev`/
    `skewness` built-ins), computed EXACTLY across engines.

    The built-ins are float-reassociation-sensitive (each engine's
    partial-aggregate tree sums in a different order), so they can
    never hash-match. Instead: aggregate the raw POWER SUMS in
    DECIMAL(38,6) — the inputs are exact 2-decimal values, so x², xy,
    x³ are exact ≤6-decimal values and decimal addition is associative
    — then derive every statistic in ONE shared final-projection SQL
    text run verbatim by both engines on those bit-identical sums.
    Same two-phase shape Spark's own Welford-style moment aggregates
    use (partial + combine), so the shuffle carries one 8-number row
    per group either way; this is how to get deterministic moments at
    100 TB, not a test trick."""
    li = load_table(spark, "lineitem", sf_dir)
    d38 = "decimal(38,6)"
    moments = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("l_extendedprice").cast(d38)).cast("double").alias("sx"),
        F.sum(F.col("l_quantity").cast(d38)).cast("double").alias("sy"),
        F.sum((F.col("l_extendedprice") * F.col("l_extendedprice")).cast(d38))
        .cast("double").alias("sxx"),
        F.sum((F.col("l_quantity") * F.col("l_quantity")).cast(d38)).cast("double").alias("syy"),
        F.sum((F.col("l_extendedprice") * F.col("l_quantity")).cast(d38))
        .cast("double").alias("sxy"),
        F.sum(
            (F.col("l_extendedprice") * F.col("l_extendedprice") * F.col("l_extendedprice")).cast(d38)
        ).cast("double").alias("sxxx"),
    )
    moments.createOrReplaceTempView("moments")
    return spark.sql(_MOMENTS_FINAL)


@register(
    "agg_percentile_disc",
    oracle="""
    SELECT l_returnflag,
           quantile_disc(l_extendedprice, 0.25) AS p25_disc,
           quantile_disc(l_extendedprice, 0.5)  AS p50_disc,
           quantile_disc(l_extendedprice, 0.9)  AS p90_disc,
           min(l_extendedprice) AS p_min,
           max(l_extendedprice) AS p_max
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISCRETE percentiles (an actual data value, no interpolation) —
    `percentile_disc` semantics match DuckDB's `quantile_disc`
    (smallest value whose cumulative rank ≥ p), so stored doubles pass
    through bit-exact with no rounding discipline needed, unlike the
    continuous variant. Exact percentiles buffer values per group; the
    scale path is the mergeable sketch (`agg_approx_percentile`) —
    this is its exact reference."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY l_extendedprice)").alias("p25_disc"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)").alias("p50_disc"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY l_extendedprice)").alias("p90_disc"),
        F.min("l_extendedprice").alias("p_min"),
        F.max("l_extendedprice").alias("p_max"),
    )


@register(
    "agg_bitmap_exact_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts_rolled
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_bitmap_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via mergeable bitmaps — the third point
    on the distinct-count spectrum: `count(DISTINCT)` (exact, expand +
    two-phase shuffle of the raw keys), HLL sketches (approximate,
    mergeable, constant size), and THIS (exact AND mergeable: a
    roaring-style bucketed bitmap per group; re-aggregation unions
    bitmaps with `bitmap_or_agg`, never re-reading raw data).

    Keys are bucketed by `bitmap_bucket_number` (32768 bits per
    bucket), each (group, bucket) aggregates bit positions into one
    binary bitmap, `bitmap_count` + a sum gives the exact count, and
    the same bitmaps rolled up from the FINE grain
    ((returnflag, linestatus) → returnflag, bitmap_or_agg) prove the
    merge path equals the direct count — the property the oracle pins
    with two identical exact columns. Shuffle carries bitmaps
    (≤4 KB/bucket), not keys: at 100 TB per-partition/day bitmaps are
    precomputed state and any coarser distinct is a cheap OR."""
    li = load_table(spark, "lineitem", sf_dir)
    direct = (
        li.select("l_returnflag", F.col("l_partkey").alias("k"))
        .groupBy("l_returnflag", F.bitmap_bucket_number(F.col("k")).alias("b"))
        .agg(F.bitmap_construct_agg(F.bitmap_bit_position(F.col("k"))).alias("bm"))
        .groupBy("l_returnflag")
        .agg(F.sum(F.bitmap_count(F.col("bm"))).alias("n_parts"))
    )
    fine = (
        li.select("l_returnflag", "l_linestatus", F.col("l_partkey").alias("k"))
        .groupBy("l_returnflag", "l_linestatus", F.bitmap_bucket_number(F.col("k")).alias("b"))
        .agg(F.bitmap_construct_agg(F.bitmap_bit_position(F.col("k"))).alias("bm"))
    )
    rolled = (
        fine.groupBy("l_returnflag", "b")
        .agg(F.bitmap_or_agg(F.col("bm")).alias("bm"))
        .groupBy("l_returnflag")
        .agg(F.sum(F.bitmap_count(F.col("bm"))).alias("n_parts_rolled"))
    )
    return direct.join(rolled, "l_returnflag").select(
        "l_returnflag", "n_parts", "n_parts_rolled"
    )


@register(
    "agg_listagg",
    oracle="""
    SELECT o_orderpriority,
           string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
           count(*) AS n
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (`listagg` ... WITHIN GROUP, Spark 4)
    — deterministic because the ORDER BY pins concatenation order on
    both engines (an unordered listagg is partition-order-dependent and
    could never hash-match). DISTINCT keeps the payload bounded by the
    status domain, not the row count."""
    o = load_table(spark, "orders", sf_dir)
    return o.groupBy("o_orderpriority").agg(
        F.expr(
            "listagg(DISTINCT o_orderstatus, ',') WITHIN GROUP (ORDER BY o_orderstatus)"
        ).alias("statuses"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "mv_incremental_refresh",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total,
           CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) / count(*) AS avg_v,
           min(value) AS mn,
           max(value) AS mx
    FROM events GROUP BY event_type
    """,
)
def mv_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: a stored aggregate
    over HISTORY merged with a partial aggregate over the DELTA batch
    — produce the refreshed aggregate WITHOUT re-reading history. The
    oracle is the full recompute over all rows: merge ≡ recompute is
    the whole contract, and it's what makes daily 100 TB rollups
    affordable (cost per refresh is O(delta + groups), not O(corpus)).

    Mechanics: keep only RE-COMBINABLE partials in the view state —
    count, decimal sum, min, max (avg is DERIVED at read time from
    sum/count; a stored avg can't merge). Decimal sums make the merge
    order-insensitive and bit-exact, so even the float-sensitive avg
    matches the recompute exactly. Same principle as the HLL/bitmap
    rollups, applied to plain aggregates."""
    ev = load_table(spark, "events", sf_dir)
    history = ev.filter(F.col("event_id") % 5 != 0)
    delta = ev.filter(F.col("event_id") % 5 == 0)

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(25,6)")).alias("total_dec"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )

    merged = (
        partials(history)
        .unionByName(partials(delta))
        .groupBy("event_type")
        .agg(
            F.sum("n").alias("n"),
            F.sum("total_dec").alias("total_dec"),
            F.min("mn").alias("mn"),
            F.max("mx").alias("mx"),
        )
    )
    return merged.select(
        "event_type",
        "n",
        F.col("total_dec").cast("double").alias("total"),
        (F.col("total_dec").cast("double") / F.col("n")).alias("avg_v"),
        "mn",
        "mx",
    )


@register(
    "events_anomaly_mad",
    oracle="""
    WITH med AS (
      SELECT event_type, median(value) AS med FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_type, e.value, abs(e.value - m.med) AS adev, m.med
      FROM events e JOIN med m ON e.event_type = m.event_type
    ),
    mad AS (
      SELECT event_type, median(adev) AS mad FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           any_value(d.med) AS med,
           any_value(mad.mad) AS mad,
           CAST(count(*) FILTER (WHERE d.adev > 4.4478 * mad.mad) AS BIGINT) AS n_outliers,
           count(*) AS n
    FROM dev d JOIN mad ON d.event_type = mad.event_type
    GROUP BY d.event_type
    """,
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via MEDIAN ABSOLUTE DEVIATION — the
    companion to `events_zscore_outliers` that a few extreme values
    can't poison (mean/stddev break down at 1 contaminated point;
    median/MAD tolerate 50%). Flags |x - med| > 3σ-equivalent
    (4.4478 = 3 × 1.4826, the normal-consistency constant, as ONE
    literal so both engines compare identical doubles).

    Two exact interpolated medians (value, then absolute deviation)
    with the per-group median broadcast back — two group shuffles plus
    a broadcast join. At 100 TB swap the exact medians for
    `percentile_approx` (same shape, bounded memory)."""
    ev = load_table(spark, "events", sf_dir).select("event_type", "value")
    med = ev.groupBy("event_type").agg(F.median("value").alias("med"))
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(F.median("adev").alias("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.any_value("med").alias("med"),
            F.any_value("mad").alias("mad"),
            F.sum(
                F.when(F.col("adev") > F.lit(4.4478) * F.col("mad"), 1).otherwise(0)
            ).cast("long").alias("n_outliers"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "agg_transpose_crosstab",
    oracle="""
    WITH ct AS (
      SELECT l_returnflag,
             CAST(count(*) FILTER (WHERE l_linestatus = 'F') AS BIGINT) AS F,
             CAST(count(*) FILTER (WHERE l_linestatus = 'O') AS BIGINT) AS O
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT 'F' AS l_linestatus,
           CAST(max(CASE WHEN l_returnflag = 'A' THEN F END) AS BIGINT) AS A,
           CAST(max(CASE WHEN l_returnflag = 'N' THEN F END) AS BIGINT) AS N,
           CAST(max(CASE WHEN l_returnflag = 'R' THEN F END) AS BIGINT) AS R
    FROM ct
    UNION ALL
    SELECT 'O',
           CAST(max(CASE WHEN l_returnflag = 'A' THEN O END) AS BIGINT),
           CAST(max(CASE WHEN l_returnflag = 'N' THEN O END) AS BIGINT),
           CAST(max(CASE WHEN l_returnflag = 'R' THEN O END) AS BIGINT)
    FROM ct
    """,
)
def agg_transpose_crosstab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`df.stat.crosstab` (contingency table) composed with Spark 4's
    `DataFrame.transpose` — the matrix flip that turns the
    (returnflag × linestatus) count table into (linestatus ×
    returnflag) without a hand-written pivot. Transposed cells take the
    least-common type of the value columns (all-long counts stay
    LONG); both ops are driver-light sugar
    over pivot/unpivot plans. Bounded-cardinality only — a transpose's
    output width is the input's ROW count."""
    li = load_table(spark, "lineitem", sf_dir)
    ct = (
        li.stat.crosstab("l_returnflag", "l_linestatus")
        .withColumnRenamed("l_returnflag_l_linestatus", "l_returnflag")
        .orderBy("l_returnflag")
    )
    out = ct.transpose(F.col("l_returnflag"))
    return out.withColumnRenamed("key", "l_linestatus")


@register(
    "window_ignore_nulls",
    oracle="""
    SELECT event_id,
           v,
           last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf,
           first_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS backfill
    FROM (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
      FROM events
    )
    """,
)
def window_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS window variants: last-non-null over the preceding
    frame (LOCF — per-row, the window-function form of the bucketed
    `events_gapfill_locf`) and first-non-null over the following frame
    (backfill) — the sparse-sensor imputation pair. Error events' null
    values carry forward/backward within each user's timeline; order
    pinned by (ts, event_id); stored doubles pass through bit-exact.
    One shuffle on user_id serves both frames."""
    ev = load_table(spark, "events", sf_dir)
    v = F.when(F.col("event_type") == "error", F.lit(None)).otherwise(F.col("value"))
    base = ev.select("user_id", "ts", "event_id", v.alias("v"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    locf = F.last("v", ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    backfill = F.first("v", ignorenulls=True).over(
        w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    return base.select(
        "event_id", "v", locf.alias("locf"), backfill.alias("backfill")
    )


@register(
    "events_cumulative_distinct",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS d FROM events GROUP BY user_id
    ),
    daily AS (SELECT d, count(*) AS new_users FROM first_seen GROUP BY d)
    SELECT CAST(d AS VARCHAR) AS activity_date,
           CAST(new_users AS BIGINT) AS new_users,
           CAST(sum(new_users) OVER (ORDER BY d
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumulative_users
    FROM daily
    """,
)
def events_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per day — the growth-curve metric. The
    naive form (count(DISTINCT user) over an expanding window) re-scans
    every prefix: O(days × users). The scale form used here is the
    FIRST-SEEN rewrite: distinct count of an expanding window ≡ running
    sum of first-appearance counts — one groupBy per user, one tiny
    daily rollup, one integer cumsum over |days| rows. Same rewrite
    powers incremental 'new vs returning' dashboards at any scale."""
    ev = load_table(spark, "events", sf_dir)
    first_seen = ev.groupBy("user_id").agg(F.min(F.col("ts").cast("date")).alias("d"))
    daily = first_seen.groupBy("d").agg(F.count(F.lit(1)).alias("new_users"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        F.col("d").cast("string").alias("activity_date"),
        "new_users",
        F.sum("new_users").over(w).alias("cumulative_users"),
    )


@register(
    "events_concurrency_profile",
    oracle="""
    WITH sessions AS (
      SELECT user_id, ts AS start_ts, ts + INTERVAL 30 MINUTE AS end_ts FROM events
    ),
    deltas AS (
      SELECT start_ts AS t, 1 AS delta FROM sessions
      UNION ALL
      SELECT end_ts AS t, -1 AS delta FROM sessions
    ),
    merged AS (SELECT t, sum(delta) AS net FROM deltas GROUP BY t),
    running AS (
      SELECT t, CAST(sum(net) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS concurrent
      FROM merged
    )
    SELECT CAST(max(concurrent) AS BIGINT) AS peak_concurrency,
           count(*) AS n_change_points
    FROM running
    """,
)
def events_concurrency_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency over interval data (each event opens a 30-min
    presence window): the +1/-1 DELTA-SWEEP rewrite — emit a +1 at
    every start and a -1 at every end, collapse equal timestamps, and
    a running integer sum IS the concurrency curve; its max is the
    peak. The naive interval self-join is O(N²); this is two scans and
    one sorted cumsum, the standard trick for 'how many sessions were
    open at once' at any scale (capacity planning, license counting).
    Integer arithmetic end-to-end → exact."""
    ev = load_table(spark, "events", sf_dir)
    sess = ev.select(
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("end_ts"),
    )
    deltas = sess.select(F.col("start_ts").alias("t"), F.lit(1).alias("delta")).unionByName(
        sess.select(F.col("end_ts").alias("t"), F.lit(-1).alias("delta"))
    )
    merged = deltas.groupBy("t").agg(F.sum("delta").alias("net"))
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    running = merged.select(F.sum("net").over(w).alias("concurrent"))
    return running.agg(
        F.max("concurrent").alias("peak_concurrency"),
        F.count(F.lit(1)).alias("n_change_points"),
    )


@register(
    "orders_abc_pareto",
    oracle="""
    WITH rev AS (
      SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(25,6))) AS rev
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT o_custkey, rev,
             sum(rev) OVER (ORDER BY rev DESC, o_custkey ASC
                            ROWS UNBOUNDED PRECEDING) AS cum_rev,
             sum(rev) OVER () AS tot_rev
      FROM rev
    ),
    classed AS (
      SELECT o_custkey,
             CASE WHEN cum_rev <= tot_rev * 0.5 THEN 'A'
                  WHEN cum_rev <= tot_rev * 0.8 THEN 'B'
                  ELSE 'C' END AS cls,
             rev
      FROM ranked
    )
    SELECT cls, count(*) AS n_customers,
           CAST(sum(rev) AS DOUBLE) AS class_revenue
    FROM classed GROUP BY cls
    """,
)
def orders_abc_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification: customers sorted by revenue, class A
    = the head covering 50% of cumulative revenue, B to 80%, C the
    tail — the 80/20 segmentation behind inventory and account
    prioritization. The cumulative sum runs in DECIMAL (window sums of
    doubles reassociate differently per engine — DuckDB folds a
    segment tree), so class boundaries are exact and the oracle
    hash-matches. One groupBy plus one global-order window over the
    |customers| relation (ranked, not raw orders)."""
    o = load_table(spark, "orders", sf_dir)
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(25,6)")).alias("rev")
    )
    w_cum = Window.orderBy(F.desc("rev"), F.asc("o_custkey")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ranked = rev.select(
        "o_custkey",
        "rev",
        F.sum("rev").over(w_cum).alias("cum_rev"),
        F.sum("rev").over(w_all).alias("tot_rev"),
    )
    cls = (
        F.when(F.col("cum_rev") <= F.col("tot_rev") * 0.5, "A")
        .when(F.col("cum_rev") <= F.col("tot_rev") * 0.8, "B")
        .otherwise("C")
    )
    return (
        ranked.select(cls.alias("cls"), "rev")
        .groupBy("cls")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("rev").cast("double").alias("class_revenue"),
        )
    )


@register(
    "agg_boolean_argmax",
    oracle="""
    WITH ranked AS (
      SELECT o_orderstatus, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderstatus
                                ORDER BY o_totalprice ASC, o_orderkey ASC) AS r_min,
             row_number() OVER (PARTITION BY o_orderstatus
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS r_max
      FROM orders
    )
    SELECT o_orderstatus,
           CAST(count(*) FILTER (WHERE o_totalprice > 200000) AS BIGINT) AS n_big,
           bool_and(o_totalprice > 0)       AS all_positive,
           bool_or(o_totalprice > 400000)   AS any_huge,
           min(CASE WHEN r_min = 1 THEN o_orderkey END) AS cheapest_order,
           min(CASE WHEN r_max = 1 THEN o_orderkey END) AS priciest_order
    FROM ranked GROUP BY o_orderstatus
    """,
)
def agg_boolean_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean and arg-extremum aggregates: count_if, every/bool_and,
    some/bool_or, min_by/max_by — the predicate-summary surface.
    min_by/max_by pin ties with a (value, key) struct (price
    duplicates within a group would otherwise make the returned key
    engine-arbitrary); the oracle expresses the same argmin/argmax as
    tiebroken window ranks."""
    o = load_table(spark, "orders", sf_dir)
    return o.groupBy("o_orderstatus").agg(
        F.count_if(F.col("o_totalprice") > 200000).alias("n_big"),
        F.every(F.col("o_totalprice") > 0).alias("all_positive"),
        F.some(F.col("o_totalprice") > 400000).alias("any_huge"),
        F.min_by("o_orderkey", F.struct("o_totalprice", "o_orderkey")).alias("cheapest_order"),
        F.min_by(
            "o_orderkey", F.struct(-F.col("o_totalprice"), F.col("o_orderkey"))
        ).alias("priciest_order"),
    )


@register(
    "join_asof_nearest",
    oracle="""
    WITH tagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'error' THEN event_id END AS err_id,
             CASE WHEN event_type = 'error' THEN epoch_us(ts) END AS err_us,
             (event_type = 'purchase') AS is_left
      FROM events WHERE event_type IN ('purchase', 'error')
    ),
    walked AS (
      SELECT user_id, ts, event_id, is_left,
             last_value(err_id IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_err,
             last_value(err_us IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_us,
             first_value(err_id IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_err,
             first_value(err_us IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_us
      FROM tagged
    )
    SELECT user_id, event_id,
           CASE
             WHEN prev_err IS NULL THEN next_err
             WHEN next_err IS NULL THEN prev_err
             WHEN epoch_us(ts) - prev_us <= next_us - epoch_us(ts) THEN prev_err
             ELSE next_err
           END AS nearest_error_id
    FROM walked WHERE is_left
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-in-time as-of join: each purchase matched to the closest
    error event of the same user in EITHER direction (backward-only is
    `join_asof`; nearest is what sensor-alignment and incident
    attribution actually want). Ties (equidistant) take the earlier
    side.

    Same union-marker plan as the backward variant, extended with both
    frames: one sort per user over the merged stream, last-non-null
    (backward candidate) + first-non-null (forward candidate), pick by
    time distance — O(n log n) per user partition, never the O(n·m)
    per-row range scan, and still ONE shuffle on user_id."""
    ev = load_table(spark, "events", sf_dir).filter(
        F.col("event_type").isin("purchase", "error")
    )
    is_err = F.col("event_type") == "error"
    tagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(is_err, F.col("event_id")).alias("err_id"),
        F.when(is_err, epoch_us(F.col("ts"))).alias("err_us"),
        (F.col("event_type") == "purchase").alias("is_left"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    back = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fwd = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    walked = tagged.select(
        "user_id",
        "ts",
        "event_id",
        "is_left",
        F.last("err_id", ignorenulls=True).over(back).alias("prev_err"),
        F.last("err_us", ignorenulls=True).over(back).alias("prev_us"),
        F.first("err_id", ignorenulls=True).over(fwd).alias("next_err"),
        F.first("err_us", ignorenulls=True).over(fwd).alias("next_us"),
    )
    nearest = (
        F.when(F.col("prev_err").isNull(), F.col("next_err"))
        .when(F.col("next_err").isNull(), F.col("prev_err"))
        .when(
            epoch_us(F.col("ts")) - F.col("prev_us") <= F.col("next_us") - epoch_us(F.col("ts")),
            F.col("prev_err"),
        )
        .otherwise(F.col("next_err"))
    )
    return walked.filter(F.col("is_left")).select(
        "user_id", "event_id", nearest.alias("nearest_error_id")
    )


@register(
    "session_window_dynamic_gap",
    oracle="""
    WITH base AS (
      SELECT user_id, ts, event_id,
             epoch_us(ts) AS us,
             epoch_us(ts) + CASE WHEN event_type = 'error'
                                 THEN 300000000 ELSE 1800000000 END AS end_prop
      FROM events
    ),
    marked AS (
      SELECT user_id, ts, us, end_prop,
             CASE WHEN max(end_prop) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                    OR us >= max(end_prop) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  THEN 1 ELSE 0 END AS brk
      FROM base
    ),
    islands AS (
      SELECT user_id, ts, end_prop,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts, us, end_prop
                            ROWS UNBOUNDED PRECEDING) AS island
      FROM marked
    )
    SELECT user_id, min(ts) AS session_start, max(end_prop) AS session_end_us,
           count(*) AS n_events
    FROM islands GROUP BY user_id, island
    """,
)
def session_window_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a PER-EVENT gap (`session_window(ts, expr)`)
    — error events hold a session open only 5 minutes, everything else
    30: the form real session semantics take when activity types have
    different dwell expectations. Sessions merge while an event starts
    before the running max of proposed ends; the oracle replays that
    merge as gaps-and-islands (running-max break marks + island sum).
    The session end is reported in epoch micros (the merged
    max(ts+gap)) so both engines agree exactly. One shuffle on
    user_id."""
    ev = load_table(spark, "events", sf_dir)
    gap = F.when(F.col("event_type") == "error", F.lit("5 minutes")).otherwise(
        F.lit("30 minutes")
    )
    sw = ev.groupBy(F.session_window(F.col("ts"), gap).alias("sw"), "user_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return sw.select(
        "user_id",
        F.col("sw.start").alias("session_start"),
        epoch_us(F.col("sw.end")).alias("session_end_us"),
        "n_events",
    )


@register(
    "stats_bootstrap_ci",
    oracle="""
    WITH reps AS (SELECT unnest([i for i in range(1, 21)]) AS b),
    weighted AS (
      SELECT r.b,
             CASE
               WHEN CAST(('0x' || substr(md5(CAST(o.o_orderkey AS VARCHAR) || '#' ||
                      CAST(r.b AS VARCHAR)), 1, 8)) AS UBIGINT) / 4294967296.0
                    < 0.36787944117144233 THEN 0
               WHEN CAST(('0x' || substr(md5(CAST(o.o_orderkey AS VARCHAR) || '#' ||
                      CAST(r.b AS VARCHAR)), 1, 8)) AS UBIGINT) / 4294967296.0
                    < 0.7357588823428847 THEN 1
               WHEN CAST(('0x' || substr(md5(CAST(o.o_orderkey AS VARCHAR) || '#' ||
                      CAST(r.b AS VARCHAR)), 1, 8)) AS UBIGINT) / 4294967296.0
                    < 0.9196986029286058 THEN 2
               WHEN CAST(('0x' || substr(md5(CAST(o.o_orderkey AS VARCHAR) || '#' ||
                      CAST(r.b AS VARCHAR)), 1, 8)) AS UBIGINT) / 4294967296.0
                    < 0.9810118431238462 THEN 3
               ELSE 4
             END AS w,
             o.o_totalprice AS x
      FROM orders o CROSS JOIN reps r
    ),
    means AS (
      SELECT b,
             CAST(sum(CAST(w * x AS DECIMAL(25,6))) AS DOUBLE)
               / CAST(sum(w) AS DOUBLE) AS m
      FROM weighted GROUP BY b
    ),
    point AS (
      SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) / count(*) AS pm
      FROM orders
    )
    SELECT point.pm AS point_mean,
           quantile_cont(means.m, 0.05) AS boot_p05,
           quantile_cont(means.m, 0.5)  AS boot_p50,
           quantile_cont(means.m, 0.95) AS boot_p95,
           count(*) AS n_replicates
    FROM means CROSS JOIN point
    GROUP BY point.pm
    """,
)
def stats_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap confidence interval for the mean — DETERMINISTIC
    Poisson bootstrap: each (row, replicate) draws a Poisson(1) resample
    weight by inverting the CDF at a hash-uniform u =
    md5(key#replicate)/2³² (the trick that makes distributed bootstrap
    reproducible across engines, retries, and partitionings — no RNG
    state anywhere). Poisson weights ≡ resampling-with-replacement for
    large n (how production systems bootstrap a stream they can't
    index); 20 replicate means summarized by exact interpolated
    percentiles. Decimal-weighted sums keep every replicate mean
    bit-identical cross-engine.

    Scale: the replicate dimension is an explode (rows × B), weights
    are scan-stage expressions, each replicate is one
    map-side-combined aggregate — embarrassingly parallel; B and the
    hash are the only state."""
    o = load_table(spark, "orders", sf_dir)
    reps = o.crossJoin(
        F.broadcast(
            o.sparkSession.range(1, 21).select(F.col("id").cast("int").alias("b"))
        )
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("o_orderkey").cast("string"), F.lit("#"),
                               F.col("b").cast("string"))), 1, 8
            ),
            16, 10,
        ).cast("double")
        / F.lit(4294967296.0)
    )
    w = (
        F.when(u < 0.36787944117144233, 0)
        .when(u < 0.7357588823428847, 1)
        .when(u < 0.9196986029286058, 2)
        .when(u < 0.9810118431238462, 3)
        .otherwise(4)
    )
    means = (
        reps.select("b", w.alias("w"), F.col("o_totalprice").alias("x"))
        .groupBy("b")
        .agg(
            (
                F.sum((F.col("w") * F.col("x")).cast("decimal(25,6)")).cast("double")
                / F.sum("w").cast("double")
            ).alias("m")
        )
    )
    point = o.agg(
        (F.sum(F.col("o_totalprice").cast("decimal(25,6)")).cast("double") / F.count(F.lit(1))).alias(
            "pm"
        )
    )
    return (
        means.crossJoin(F.broadcast(point))
        .groupBy("pm")
        .agg(
            F.expr("percentile(m, array(0.05, 0.5, 0.95))").alias("_q"),
            F.count(F.lit(1)).alias("n_replicates"),
        )
        .select(
            F.col("pm").alias("point_mean"),
            F.col("_q")[0].alias("boot_p05"),
            F.col("_q")[1].alias("boot_p50"),
            F.col("_q")[2].alias("boot_p95"),
            "n_replicates",
        )
    )


@register(
    "stats_ab_welch_ttest",
    oracle="""
    WITH assigned AS (
      SELECT CASE WHEN CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
                       AS UBIGINT) % 2 = 0 THEN 'A' ELSE 'B' END AS grp,
             o_totalprice AS x
      FROM orders
    ),
    moments AS (
      SELECT grp,
             CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(x AS DECIMAL(25,6))) AS DOUBLE) AS sx,
             CAST(sum(CAST(x * x AS DECIMAL(38,6))) AS DOUBLE) AS sxx
      FROM assigned GROUP BY grp
    ),
    wide AS (
      SELECT max(CASE WHEN grp = 'A' THEN n END) AS na,
             max(CASE WHEN grp = 'A' THEN sx END) AS sxa,
             max(CASE WHEN grp = 'A' THEN sxx END) AS sxxa,
             max(CASE WHEN grp = 'B' THEN n END) AS nb,
             max(CASE WHEN grp = 'B' THEN sx END) AS sxb,
             max(CASE WHEN grp = 'B' THEN sxx END) AS sxxb
      FROM moments
    )
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           floor((sxa / na - sxb / nb) * 1e6 + 0.5) / 1e6 AS mean_diff,
           floor((sxa / na - sxb / nb)
                 / sqrt((sxxa - sxa * sxa / na) / (na - 1) / na
                      + (sxxb - sxb * sxb / nb) / (nb - 1) / nb) * 1e6 + 0.5) / 1e6
             AS t_stat,
           abs((sxa / na - sxb / nb)
               / sqrt((sxxa - sxa * sxa / na) / (na - 1) / na
                    + (sxxb - sxb * sxb / nb) / (nb - 1) / nb)) > 1.96 AS significant
    FROM wide
    """,
)
def stats_ab_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: hash-based 50/50 assignment (the same
    reproducible-bucketing discipline as the split/bootstrap queries)
    and a Welch t-statistic computed from DECIMAL power sums — the
    engine's exact-moment technique applied to the most common
    decision query in analytics. The final statistic is one shared
    expression tree over bit-identical sums, 6dp-rounded; the
    significance flag compares |t| to the 1.96 two-sided 5% critical
    value (df is in the thousands — the normal approximation is the
    honest one). Two map-side-combined aggregates, a two-row pivot,
    zero data-size dependence after the scan."""
    o = load_table(spark, "orders", sf_dir)
    grp = F.when(
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10)
        .cast("long") % 2 == 0,
        "A",
    ).otherwise("B")
    moments = (
        o.select(grp.alias("grp"), F.col("o_totalprice").alias("x"))
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum(F.col("x").cast("decimal(25,6)")).cast("double").alias("sx"),
            F.sum((F.col("x") * F.col("x")).cast("decimal(38,6)")).cast("double").alias("sxx"),
        )
    )
    wide = moments.agg(
        F.max(F.when(F.col("grp") == "A", F.col("n"))).alias("na"),
        F.max(F.when(F.col("grp") == "A", F.col("sx"))).alias("sxa"),
        F.max(F.when(F.col("grp") == "A", F.col("sxx"))).alias("sxxa"),
        F.max(F.when(F.col("grp") == "B", F.col("n"))).alias("nb"),
        F.max(F.when(F.col("grp") == "B", F.col("sx"))).alias("sxb"),
        F.max(F.when(F.col("grp") == "B", F.col("sxx"))).alias("sxxb"),
    )
    wide.createOrReplaceTempView("_ab_wide")
    return spark.sql("""
        SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
               floor((sxa / na - sxb / nb) * 1e6 + 0.5) / 1e6 AS mean_diff,
               floor((sxa / na - sxb / nb)
                     / sqrt((sxxa - sxa * sxa / na) / (na - 1) / na
                          + (sxxb - sxb * sxb / nb) / (nb - 1) / nb) * 1e6 + 0.5) / 1e6
                 AS t_stat,
               abs((sxa / na - sxb / nb)
                   / sqrt((sxxa - sxa * sxa / na) / (na - 1) / na
                        + (sxxb - sxb * sxb / nb) / (nb - 1) / nb)) > 1.96 AS significant
        FROM _ab_wide
    """)


@register(
    "orders_trend_ols",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS DOUBLE)
               AS d,
             CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS rev
      FROM orders GROUP BY 1
    ),
    s AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(d AS DECIMAL(25,6))) AS DOUBLE) AS sx,
             CAST(sum(CAST(rev AS DECIMAL(25,6))) AS DOUBLE) AS sy,
             CAST(sum(CAST(d * d AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
             CAST(sum(CAST(d * rev AS DECIMAL(38,6))) AS DOUBLE) AS sxy
      FROM daily
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           floor((n * sxy - sx * sy) / (n * sxx - sx * sx) * 1e6 + 0.5) / 1e6 AS slope,
           floor((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n * 1e6 + 0.5)
             / 1e6 AS intercept
    FROM s
    """,
)
def orders_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinary-least-squares revenue trend (slope + intercept of daily
    revenue over time): closed-form OLS from decimal power sums — the
    two-pass-free regression every dashboard trendline is. x is
    day-since-epoch-start (exact small integers as doubles), y the
    decimal-summed daily revenue; the normal-equation arithmetic is a
    shared expression tree, 6dp-rounded. One daily rollup + one 5-sum
    aggregate; nothing downstream depends on data size."""
    o = load_table(spark, "orders", sf_dir)
    daily = o.groupBy(
        F.date_diff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp"))
        .cast("double")
        .alias("d")
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(25,6)")).cast("double").alias("rev"))
    s = daily.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("d").cast("decimal(25,6)")).cast("double").alias("sx"),
        F.sum(F.col("rev").cast("decimal(25,6)")).cast("double").alias("sy"),
        F.sum((F.col("d") * F.col("d")).cast("decimal(38,6)")).cast("double").alias("sxx"),
        F.sum((F.col("d") * F.col("rev")).cast("decimal(38,6)")).cast("double").alias("sxy"),
    )
    s.createOrReplaceTempView("_ols_sums")
    return spark.sql("""
        SELECT CAST(n AS BIGINT) AS n_days,
               floor((n * sxy - sx * sy) / (n * sxx - sx * sx) * 1e6 + 0.5) / 1e6 AS slope,
               floor((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n * 1e6 + 0.5)
                 / 1e6 AS intercept
        FROM _ols_sums
    """)


@register(
    "orders_forecast_ses",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS rev
      FROM orders GROUP BY 1
    ),
    arr AS (SELECT count(*) AS n, list(rev ORDER BY d) AS xs FROM daily)
    SELECT CAST(n AS BIGINT) AS n_days,
           floor(list_reduce(xs, (s, x) -> 0.3 * x + 0.7 * s) * 1e6 + 0.5) / 1e6
             AS ses_forecast
    FROM arr
    """,
)
def orders_forecast_ses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simple exponential smoothing (α=0.3) over the daily-revenue
    series — a RECURRENCE (each state depends on the previous), which
    no parallel aggregate can express: the ordered-array fold technique
    (see `corpus_diversity_metrics`) runs the same sequential
    left-to-right reduction in both engines, seeded with the first
    observation, so the smoothed forecast is bit-deterministic. The
    series is |days|-sized after the rollup — bounded state, exactly
    like production forecasting over pre-aggregated series. (For
    per-key recurrences at scale, the same fold runs inside a groupBy
    over each key's sorted array.)"""
    o = load_table(spark, "orders", sf_dir)
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(25,6)")).cast("double").alias("rev")
    )
    arr = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("d", "rev"))), lambda s: s["rev"]
        ).alias("xs"),
    )
    return arr.selectExpr(
        "CAST(n AS BIGINT) AS n_days",
        "floor(aggregate(slice(xs, 2, size(xs) - 1), CAST(xs[1] AS DOUBLE),"
        " (s, x) -> 0.3 * x + 0.7 * s) * 1e6 + 0.5) / 1e6 AS ses_forecast",
    )


@register(
    "supplier_affinity_graph",
    oracle="""
    WITH sp0 AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem),
    heavy AS (SELECT p FROM sp0 GROUP BY p HAVING count(*) > 33),
    sp AS (SELECT s, p FROM sp0 WHERE p NOT IN (SELECT p FROM heavy)),
    sz AS (SELECT s, count(*) AS n FROM sp GROUP BY s),
    shared AS (
      SELECT a.s AS s_a, b.s AS s_b, count(*) AS shared_parts
      FROM sp a JOIN sp b ON a.p = b.p AND a.s < b.s
      GROUP BY a.s, b.s
    )
    SELECT s_a, s_b, shared_parts, affinity FROM (
      SELECT sh.s_a, sh.s_b, CAST(sh.shared_parts AS BIGINT) AS shared_parts,
             floor(CAST(sh.shared_parts AS DOUBLE)
                   / (za.n + zb.n - sh.shared_parts) * 1e6 + 0.5) / 1e6 AS affinity
      FROM shared sh
        JOIN sz za ON za.s = sh.s_a
        JOIN sz zb ON zb.s = sh.s_b
    ) ORDER BY affinity DESC, s_a, s_b LIMIT 50
    """,
)
def supplier_affinity_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartite projection: the 50 strongest edges of the supplier-
    supplier affinity graph from the supplier↔part relation —
    co-supply overlap scored by Jaccard, ranked (6dp, pair tiebreak).
    Exactly the dedup engine's inverted-index self-join machinery
    (`jaccard_pairs`) applied to RELATIONAL entity resolution instead
    of text shingles: the part key is the index key, the quadratic
    blowup confined to per-part buckets, affinity an exact integer
    ratio. The pattern behind co-purchase graphs, entity matching,
    and collaborative filtering candidate generation. Top-k rather
    than a fixed threshold (r9 non-vacuity gate): co-supply density
    dilutes as the corpus grows, so any fixed affinity cutoff empties
    at some SF while top-k stays populated and SF-insensitive. The
    hot-part degree cap is ON here too (review r10 — the uncapped
    form measured 3.9× on 10× data at the sf1 probe, the pair-density
    term): every join bucket bounded at max_deg² pairs, Jaccard exact
    over non-hot parts, same cap as the `_capped` twin so the two
    forms now differ only in threshold-vs-top-k selection."""
    return _affinity_graph(
        load_table(spark, "lineitem", sf_dir), top_k=50, max_deg=33
    )


def _affinity_graph(li: DataFrame, threshold: float = 0.3,
                    max_deg: int | None = None,
                    top_k: int | None = None) -> DataFrame:
    """Supplier-supplier Jaccard affinity from the supplier↔part
    bipartite relation. `max_deg` is the hot-key skew lever (VERDICT
    r3 #1): parts supplied by more than `max_deg` suppliers are
    dropped from the index BEFORE the self-join, bounding every join
    bucket at max_deg² pairs — without it one hot part contributes
    O(d²) pairs to a single bucket at real-world skew. The degree
    pass is itself skew-proof: groupBy.count (map-side partial
    aggregation collapses a hot part to one row per input partition
    before any shuffle) + broadcast anti-join — never a window on the
    part key (the `operators/dedup.py:shingle_index` max_df pattern).
    Per-supplier sizes are computed on the FILTERED relation, so the
    result is exactly "Jaccard over non-hot parts" — deterministic
    and oracle-expressible. Principled at scale: a part half the
    market supplies carries ~zero Jaccard signal, same as a stop-word
    shingle.

    r11: the projection uses the `_cosupply_mutual_edges` rewrite —
    one groupBy(p).collect_set(s) replaces distinct + degree count +
    anti-join + the p-key self-join (2 exchanges, no join; pair
    counts bit-identical — combinations of the per-part distinct
    supplier set == the a.s < b.s self-join output; same measured
    numbers and skew trade as documented there). Per-supplier sizes
    come from one explode of the same capped sets."""
    if max_deg is not None:
        # r12: salted two-level pre-drop — heavy parts never assemble
        # a full set anywhere (see _capped_part_supplier_sets). The
        # EAGER checkpoint matters here: the two consumers (sizes,
        # pairs) otherwise re-execute the guarded two-aggregate chain
        # (interleaved 6-rep A/B at sf0.1, min/med: no-checkpoint
        # 2.97/3.24 s vs eager 2.71/2.91 s; unguarded baseline
        # 2.28/2.52 — the delta is the guard's documented price).
        parts_sets = _capped_part_supplier_sets(li, max_deg).localCheckpoint(
            eager=True
        )
    else:
        # unguarded path keeps the single exchange; the two consumers
        # share it via runtime exchange reuse
        parts_sets = li.groupBy(F.col("l_partkey").alias("p")).agg(
            F.array_sort(F.collect_set(F.col("l_suppkey"))).alias("ss")
        )
    sz = (
        parts_sets.select(F.explode("ss").alias("s"))
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    shared = (
        parts_sets.select(F.posexplode("ss").alias("i", "s_a"), F.col("ss"))
        .select(
            "s_a",
            F.explode(F.expr("slice(ss, i + 2, size(ss))")).alias("s_b"),
        )
        .groupBy("s_a", "s_b")
        .agg(F.count(F.lit(1)).alias("shared_parts"))
    )
    from bigdata06_spark.queries.qutil import rnd

    aff = F.col("shared_parts") / (F.col("n_a") + F.col("n_b") - F.col("shared_parts"))
    scored = shared.join(
        sz.select(F.col("s").alias("s_a"), F.col("n").alias("n_a")), "s_a"
    ).join(sz.select(F.col("s").alias("s_b"), F.col("n").alias("n_b")), "s_b")
    if top_k is not None:
        # top-k strongest edges overall (6dp-rounded affinity, pair
        # tiebreak) — SF-insensitive, unlike a fixed threshold whose
        # qualifying set empties as co-supply density dilutes
        return (
            scored.select(
                "s_a", "s_b", "shared_parts", rnd(aff, 6).alias("affinity")
            )
            .orderBy(F.desc("affinity"), "s_a", "s_b")
            .limit(top_k)
        )
    return scored.filter(aff >= threshold).select(
        "s_a", "s_b", "shared_parts", rnd(aff, 6).alias("affinity")
    )


@register(
    "supplier_affinity_graph_capped",
    oracle="""
    WITH sp0 AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem),
    heavy AS (SELECT p FROM sp0 GROUP BY p HAVING count(*) > 33),
    sp AS (SELECT s, p FROM sp0 WHERE p NOT IN (SELECT p FROM heavy)),
    sz AS (SELECT s, count(*) AS n FROM sp GROUP BY s),
    shared AS (
      SELECT a.s AS s_a, b.s AS s_b, count(*) AS shared_parts
      FROM sp a JOIN sp b ON a.p = b.p AND a.s < b.s
      GROUP BY a.s, b.s
    )
    SELECT sh.s_a, sh.s_b, CAST(sh.shared_parts AS BIGINT) AS shared_parts,
           floor(CAST(sh.shared_parts AS DOUBLE)
                 / (za.n + zb.n - sh.shared_parts) * 1e6 + 0.5) / 1e6 AS affinity
    FROM shared sh
      JOIN sz za ON za.s = sh.s_a
      JOIN sz zb ON zb.s = sh.s_b
    WHERE CAST(sh.shared_parts AS DOUBLE) / (za.n + zb.n - sh.shared_parts) >= 0.15
    """,
)
def supplier_affinity_graph_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The affinity graph with the hot-part degree cap ON
    (max_deg=33): no join bucket can exceed max_deg² pairs, making
    the bipartite projection's shuffle bounded under arbitrary part
    skew — the shape that survives a 100× fact with hot keys. Degree
    pass via groupBy-count + broadcast anti-join (skew-proof, plan-
    pinned in tests/test_plans.py); per-supplier sizes on the capped
    relation so the Jaccard is exact over non-hot parts and the
    DuckDB oracle reproduces it bit-for-bit."""
    return _affinity_graph(
        load_table(spark, "lineitem", sf_dir), threshold=0.15, max_deg=33
    )


@register(
    "orders_dow_seasonality",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(dayofweek(o_orderdate) AS BIGINT) + 1 AS dow,
             CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS rev
      FROM orders GROUP BY 1, 2
    ),
    per_dow AS (
      SELECT dow, CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(CAST(rev AS DECIMAL(25,6))) AS DOUBLE) AS dow_rev
      FROM daily GROUP BY dow
    ),
    overall AS (
      SELECT CAST(sum(CAST(rev AS DECIMAL(25,6))) AS DOUBLE) AS tot,
             CAST(count(*) AS BIGINT) AS all_days
      FROM daily
    )
    SELECT p.dow, p.n_days,
           floor(p.dow_rev / p.n_days * 1e2 + 0.5) / 1e2 AS avg_daily_rev,
           floor((p.dow_rev / p.n_days) / (o.tot / o.all_days) * 1e6 + 0.5) / 1e6
             AS seasonality_index
    FROM per_dow p CROSS JOIN overall o
    """,
)
def orders_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality index: average daily revenue per weekday
    divided by the overall average daily revenue — the multiplicative
    seasonal factor (index 1.0 = typical day) behind staffing and
    forecast adjustment. Decimal daily sums, shared final expression;
    the DOW convention bridge (+1 on the oracle) matches
    `scalar_date_funcs`. Two tiny aggregates over the daily rollup."""
    o = load_table(spark, "orders", sf_dir)
    daily = o.groupBy(
        F.col("o_orderdate").cast("date").alias("d"),
        F.dayofweek("o_orderdate").cast("long").alias("dow"),
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(25,6)")).cast("double").alias("rev"))
    per_dow = daily.groupBy("dow").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.col("rev").cast("decimal(25,6)")).cast("double").alias("dow_rev"),
    )
    overall = daily.agg(
        F.sum(F.col("rev").cast("decimal(25,6)")).cast("double").alias("tot"),
        F.count(F.lit(1)).alias("all_days"),
    )
    from bigdata06_spark.queries.qutil import rnd

    return per_dow.crossJoin(F.broadcast(overall)).select(
        "dow",
        "n_days",
        rnd(F.col("dow_rev") / F.col("n_days"), 2).alias("avg_daily_rev"),
        rnd((F.col("dow_rev") / F.col("n_days")) / (F.col("tot") / F.col("all_days")), 6).alias(
            "seasonality_index"
        ),
    )


@register(
    "customer_cohort_ltv",
    oracle="""
    WITH firsts AS (
      SELECT o_custkey,
             min(date_trunc('month', o_orderdate)) AS cohort_month
      FROM orders GROUP BY o_custkey
    ),
    facts AS (
      SELECT f.cohort_month,
             CAST(date_diff('month', f.cohort_month,
                            date_trunc('month', o.o_orderdate)) AS BIGINT) AS month_age,
             o.o_totalprice AS x
      FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
    ),
    sizes AS (SELECT cohort_month, count(*) AS cohort_size FROM firsts GROUP BY cohort_month),
    per_age AS (
      SELECT cohort_month, month_age,
             sum(CAST(x AS DECIMAL(25,6))) AS rev_dec
      FROM facts GROUP BY cohort_month, month_age
    ),
    cum AS (
      SELECT cohort_month, month_age,
             sum(rev_dec) OVER (PARTITION BY cohort_month ORDER BY month_age
                                ROWS UNBOUNDED PRECEDING) AS cum_dec
      FROM per_age
    )
    SELECT strftime(c.cohort_month, '%Y-%m') AS cohort,
           c.month_age,
           s.cohort_size,
           floor(CAST(c.cum_dec AS DOUBLE) / s.cohort_size * 1e2 + 0.5) / 1e2
             AS cum_ltv_per_customer
    FROM cum c JOIN sizes s ON c.cohort_month = s.cohort_month
    """,
)
def customer_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime value: customers grouped by first-order month,
    cumulative revenue per customer tracked by months-since-acquisition
    — THE retention-economics table (each cohort's LTV curve read along
    its row). Decimal sums end-to-end including the cumulative window
    (window sums of doubles reassociate in DuckDB's segment tree — the
    ABC query's lesson); division by cohort size happens once at the
    end. Shuffles: first-order per customer, one (cohort, age) rollup,
    one cohort-partitioned cumsum over the tiny rollup."""
    o = load_table(spark, "orders", sf_dir)
    firsts = o.groupBy("o_custkey").agg(
        F.min(F.date_trunc("month", F.col("o_orderdate"))).alias("cohort_month")
    )
    facts = o.join(firsts, "o_custkey").select(
        "cohort_month",
        F.months_between(
            F.date_trunc("month", F.col("o_orderdate")), F.col("cohort_month")
        ).cast("long").alias("month_age"),
        F.col("o_totalprice").alias("x"),
    )
    sizes = firsts.groupBy("cohort_month").agg(F.count(F.lit(1)).alias("cohort_size"))
    per_age = facts.groupBy("cohort_month", "month_age").agg(
        F.sum(F.col("x").cast("decimal(25,6)")).alias("rev_dec")
    )
    w = Window.partitionBy("cohort_month").orderBy("month_age").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per_age.select(
        "cohort_month", "month_age", F.sum("rev_dec").over(w).alias("cum_dec")
    )
    from bigdata06_spark.queries.qutil import rnd

    return cum.join(sizes, "cohort_month").select(
        F.date_format("cohort_month", "yyyy-MM").alias("cohort"),
        "month_age",
        "cohort_size",
        rnd(F.col("cum_dec").cast("double") / F.col("cohort_size"), 2).alias(
            "cum_ltv_per_customer"
        ),
    )


@register(
    "events_path_analysis",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_type || ' > ' || e2 || ' > ' || e3 AS path,
           count(*) AS n
    FROM seq WHERE e3 IS NOT NULL
    GROUP BY 1
    ORDER BY n DESC, path ASC
    LIMIT 10
    """,
)
def events_path_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user paths: the most frequent 3-step event sequences —
    product-analytics path mining, the n-gram model applied to
    behavioral streams (generalizes `events_transition_matrix` from
    bigrams to trigram journeys). Two leads over one (user, time)
    window, a count, a top-k with full tiebreak; one shuffle on
    user_id plus the path rollup."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e3").isNotNull())
    return (
        seq.select(
            F.concat_ws(" > ", "event_type", "e2", "e3").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("path"))
        .limit(10)
    )


@register(
    "events_match_recognize",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS tus,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts), event_id) AS rn
      FROM events
    ),
    v AS (
      SELECT user_id, rn, tus,
             rn - row_number() OVER (PARTITION BY user_id ORDER BY rn)
               AS island
      FROM seq WHERE event_type = 'view'
    ),
    runs AS (
      SELECT user_id, CAST(min(rn) AS BIGINT) AS v_start_rn,
             CAST(max(rn) AS BIGINT) AS v_end_rn,
             CAST(count(*) AS BIGINT) AS n_views,
             min(tus) AS start_us
      FROM v GROUP BY user_id, island
    )
    SELECT r.user_id, r.v_start_rn AS match_start_rn, r.n_views,
           CAST((e2.tus - r.start_us) // 1000000 AS BIGINT) AS span_sec
    FROM runs r
      JOIN seq e1 ON e1.user_id = r.user_id AND e1.rn = r.v_end_rn + 1
                 AND e1.event_type = 'click'
      JOIN seq e2 ON e2.user_id = r.user_id AND e2.rn = r.v_end_rn + 2
                 AND e2.event_type = 'purchase'
    """,
)
def events_match_recognize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROW-PATTERN MATCHING (SQL:2016 MATCH_RECOGNIZE, which Spark
    lacks natively) for the quantified pattern `view+ click purchase`
    per user stream: one-or-more consecutive views, immediately
    followed by a click, immediately followed by a purchase — one row
    per GREEDY match (maximal view run), with the view count the
    quantifier absorbed and the wall-clock span from first view to
    purchase. Trigram leads (`events_path_analysis`) cannot express
    the unbounded `+` quantifier; this is the gaps-and-islands
    compilation every MATCH_RECOGNIZE engine performs under the hood:
    consecutive same-type runs become islands (rn minus a per-type
    row_number is constant within a run), then the pattern tail is
    verified by POSITION joins (rn+1, rn+2) on the numbered stream.

    Scale: two windows over the (user, time) ordering — partition
    sizes bounded by per-user activity, the same distribution every
    sessionization query here rides — then equi-joins on
    (user_id, rn); match count is output-sized. No self-join on
    time, no cross product."""
    from bigdata06_spark.queries.qutil import epoch_us

    ev = load_table(spark, "events", sf_dir)
    wo = Window.partitionBy("user_id").orderBy(epoch_us(F.col("ts")), "event_id")
    seq = ev.select(
        "user_id", "event_id", "event_type",
        epoch_us(F.col("ts")).alias("tus"),
        F.row_number().over(wo).alias("rn"),
    ).localCheckpoint(eager=True)  # numbered stream fans into 3 branches
    wv = Window.partitionBy("user_id").orderBy("rn")
    v = seq.filter(F.col("event_type") == "view").select(
        "user_id", "rn", "tus",
        (F.col("rn") - F.row_number().over(wv)).alias("island"),
    )
    runs = v.groupBy("user_id", "island").agg(
        F.min("rn").cast("long").alias("match_start_rn"),
        F.max("rn").cast("long").alias("v_end_rn"),
        F.count(F.lit(1)).cast("long").alias("n_views"),
        F.min("tus").alias("start_us"),
    )
    e1 = seq.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("u1"), F.col("rn").alias("rn1")
    )
    e2 = seq.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("u2"), F.col("rn").alias("rn2"),
        F.col("tus").alias("t2"),
    )
    m = (
        runs.join(
            e1,
            (F.col("user_id") == F.col("u1"))
            & (F.col("rn1") == F.col("v_end_rn") + 1),
        )
        .join(
            e2,
            (F.col("user_id") == F.col("u2"))
            & (F.col("rn2") == F.col("v_end_rn") + 2),
        )
    )
    return m.select(
        "user_id", "match_start_rn", "n_views",
        ((F.col("t2") - F.col("start_us")) / F.lit(1000000))
        .cast("long")
        .alias("span_sec"),
    )


@register(
    "sql_defined_functions",
    oracle="""
    SELECT o_orderkey,
           floor(o_totalprice * 0.93 * 1e2 + 0.5) / 1e2 AS discounted,
           CASE WHEN o_totalprice >= 300000 THEN 'high'
                WHEN o_totalprice >= 100000 THEN 'mid'
                ELSE 'low' END AS band
    FROM orders WHERE o_orderkey <= 1000
    """,
)
def sql_defined_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined UDFs (Spark 4 `CREATE FUNCTION ... RETURN expr`):
    reusable business logic declared IN SQL — unlike Python UDFs these
    inline into the plan at analysis time (full codegen, pushdown
    through them, zero serialization), making them the right home for
    shared derivations. The oracle is the hand-inlined expression —
    which is literally what Catalyst does with the function."""
    from bigdata06_spark.catalog import register_views

    register_views(spark, sf_dir)
    spark.sql("""
        CREATE OR REPLACE TEMPORARY FUNCTION discounted(p DOUBLE)
        RETURNS DOUBLE RETURN floor(p * 0.93 * 1e2 + 0.5) / 1e2
    """)
    spark.sql("""
        CREATE OR REPLACE TEMPORARY FUNCTION price_band(p DOUBLE)
        RETURNS STRING RETURN
          CASE WHEN p >= 300000 THEN 'high'
               WHEN p >= 100000 THEN 'mid'
               ELSE 'low' END
    """)
    return spark.sql("""
        SELECT o_orderkey,
               discounted(o_totalprice) AS discounted,
               price_band(o_totalprice) AS band
        FROM orders WHERE o_orderkey <= 1000
    """)


@register(
    "scalar_generator_funcs",
    oracle="""
    WITH src AS (
      SELECT s_suppkey, s_name, s_acctbal FROM supplier
    )
    SELECT s_suppkey, 'name' AS attr, s_name AS val FROM src
    UNION ALL
    SELECT s_suppkey, 'acctbal', CAST(CAST(s_acctbal AS DECIMAL(18,2)) AS VARCHAR) FROM src
    """,
)
def scalar_generator_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator functions beyond explode: `stack(n, k1, v1, k2, v2)`
    turns columns into attribute rows (the generator form of unpivot —
    compare `unpivot_measures`, the operator form). Scan-stage row
    expansion, no shuffle. DuckDB spells the same thing as UNION ALL
    branches — which is also its logical expansion.

    Cross-engine float-to-string caveat: doubles render differently
    ('1.0' vs '1'), so the stacked value column stringifies acctbal
    via a DECIMAL cast pinned to 2 places on both sides."""
    s = load_table(spark, "supplier", sf_dir)
    return s.select(
        "s_suppkey",
        F.expr(
            "stack(2, 'name', s_name, 'acctbal',"
            " CAST(CAST(s_acctbal AS DECIMAL(18,2)) AS STRING)) AS (attr, val)"
        ),
    )


@register(
    "sort_offset_pagination",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 20 OFFSET 40
    """,
)
def sort_offset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic pagination: page 3 of the price-ranked orders via
    ORDER BY + OFFSET + LIMIT — the engine form of the reference's
    offset/limit page loop (SURVEY S5), with the tiebreak that makes
    pages STABLE (an untiebroken ORDER BY can tear equal-valued rows
    across page boundaries differently per run). Note the scale
    caveat: OFFSET is O(offset) — deep pagination belongs to keyset
    continuation (WHERE key > last_seen), which is what the connector's
    cursor-based streaming source implements."""
    o = load_table(spark, "orders", sf_dir)
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .offset(40)
        .limit(20)
    )


_LATERAL_SQL = """
    SELECT o.o_orderkey, o.o_totalprice, t.l_linenumber, t.l_extendedprice
    FROM orders o,
         LATERAL (
           SELECT l.l_linenumber, l.l_extendedprice
           FROM lineitem l
           WHERE l.l_orderkey = o.o_orderkey
           ORDER BY l.l_extendedprice DESC, l.l_linenumber ASC
           LIMIT 2
         ) t
    WHERE o.o_orderkey <= 200
"""


@register("join_lateral_topk", oracle=_LATERAL_SQL)
def join_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL join: per order, its top-2 most expensive
    line items as a dependent subquery — the SQL-standard form of
    per-group top-k (the window row_number form is `topk_per_group`;
    this is the same result through the decorrelation path). The
    IDENTICAL SQL text runs on both engines. Catalyst decorrelates
    the lateral into a ranked join — per-key top-k never becomes a
    per-row re-scan; plan shape matches the window form at scale."""
    from bigdata06_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_SQL)


@register(
    "join_null_safe",
    oracle="""
    WITH keyed AS (
      SELECT event_id,
             CASE WHEN event_type = 'error' THEN NULL ELSE event_type END AS k,
             value
      FROM events
    ),
    dim AS (
      SELECT DISTINCT CASE WHEN event_type = 'error' THEN NULL ELSE event_type END AS k,
             CASE WHEN event_type = 'error' THEN 'unattributed' ELSE event_type END AS label
      FROM events
    )
    SELECT keyed.event_id, dim.label
    FROM keyed JOIN dim ON keyed.k IS NOT DISTINCT FROM dim.k
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-SAFE equi-join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    match each OTHER instead of silently dropping — the semantics
    dirty-dimension joins actually need (an 'unknown' bucket must
    still enrich), and the join-surface gap plain `=` leaves: under
    standard equality every NULL-keyed fact row vanishes from an inner
    join with no error. Still a hash join (NULL hashes as a regular
    key value under null-safe equality) — same plan shape and
    broadcast rules as `join_inner`."""
    ev = load_table(spark, "events", sf_dir)
    k = F.when(F.col("event_type") == "error", F.lit(None)).otherwise(F.col("event_type"))
    keyed = ev.select("event_id", k.alias("k"))
    dim = (
        ev.select(
            k.alias("k"),
            F.when(F.col("event_type") == "error", F.lit("unattributed"))
            .otherwise(F.col("event_type"))
            .alias("label"),
        )
        .distinct()
    )
    return keyed.join(F.broadcast(dim), keyed["k"].eqNullSafe(dim["k"])).select(
        "event_id", "label"
    )


@register(
    "agg_grouping_id",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
           CAST(GROUPING(l_returnflag) AS BIGINT) AS is_flag_rolled,
           count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`grouping_id()` / `grouping(col)` over a rollup: the bit vector
    that tells NULL-as-subtotal apart from NULL-as-data in multi-level
    aggregates — without it a rollup over nullable group keys is
    ambiguous (the reason every BI tool emits it alongside
    super-aggregate rows). Both engines produce the same bit order
    (left column = most significant)."""
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.grouping("l_returnflag").cast("long").alias("is_flag_rolled"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "is_flag_rolled", "n")
    )


@register(
    "agg_pivot_multi",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) FILTER (WHERE l_linestatus = 'F') AS BIGINT) AS F_n,
           CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) FILTER (WHERE l_linestatus = 'F')
                AS DOUBLE) AS F_qty,
           CAST(count(*) FILTER (WHERE l_linestatus = 'O') AS BIGINT) AS O_n,
           CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) FILTER (WHERE l_linestatus = 'O')
                AS DOUBLE) AS O_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_pivot_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with MULTIPLE aggregates per pivot value (count + decimal
    sum per line status) — the wide-report form one step past
    `agg_pivot`'s single measure. Explicit pivot values keep the
    schema static (no distinct-scan planning pass), and the aggregate
    aliases give deterministic `{value}_{alias}` column names the
    oracle mirrors with FILTER clauses. Still one Expand + one
    exchange."""
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(25,6)")).cast("double").alias("qty"),
        )
    )


@register(
    "join_fuzzy_entity_resolution",
    oracle="""
    WITH b AS (
      SELECT p_partkey, p_name, string_split(p_name, ' ')[1] AS blk FROM part
    )
    SELECT a.p_partkey,
           min(c.p_partkey) AS canonical,
           (min(c.p_partkey) < a.p_partkey) AS is_dup
    FROM b a JOIN b c
      ON a.blk = c.blk AND levenshtein(a.p_name, c.p_name) <= 1
    GROUP BY a.p_partkey
    """,
)
def join_fuzzy_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FUZZY entity resolution: resolve each part to a canonical
    entity id — the min partkey among same-block names within edit
    distance 1 (self included, so singletons canonicalize to
    themselves). The similarity join is BLOCKED on the name's first
    token: an equi-join whose quadratic term is confined to per-block
    buckets (the ER analogue of the dedup engine's inverted index —
    never a name×name cartesian, plan-pinned), with `levenshtein` as
    the in-bucket verifier. Output stays |parts|-sized regardless of
    duplicate density."""
    p = load_table(spark, "part", sf_dir).select("p_partkey", "p_name")
    b = p.withColumn("blk", F.split("p_name", " ")[0])
    a = b.select(F.col("p_partkey").alias("pk_a"), F.col("p_name").alias("nm_a"), "blk")
    c = b.select(F.col("p_partkey").alias("pk_c"), F.col("p_name").alias("nm_c"), "blk")
    return (
        a.join(c, "blk")
        .filter(F.levenshtein("nm_a", "nm_c") <= 1)
        .groupBy(F.col("pk_a").alias("p_partkey"))
        .agg(F.min("pk_c").alias("canonical"))
        .withColumn("is_dup", F.col("canonical") < F.col("p_partkey"))
    )


#: hot-part degree cap shared by every co-supply consumer (graph
#: family + the affinity graphs): parts supplied by more than this
#: many suppliers are dropped from the index BEFORE the part-key
#: self-join, bounding every join bucket at max_deg² pairs. 33 is the
#: same cap `supplier_affinity_graph_capped` ships; at TPC-H skew it
#: trims only the long tail (p99 part degree is 36/43 at sf0.01/0.1)
#: while at real-world skew it is what keeps the projection from
#: going quadratic on one hot key (VERDICT r9 missing #1).
_COSUPPLY_MAX_DEG = 33


def _capped_part_supplier_sets(li: DataFrame, max_deg: int,
                               nsalt: int = 64) -> DataFrame:
    """(p, ss): the per-part sorted distinct-supplier array, with
    parts above `max_deg` distinct suppliers DROPPED BEFORE any full
    set is ever assembled — the r12 heavy-key pre-drop (VERDICT r11
    next #4; guide §2.5 two-level aggregation). The r11 form's
    groupBy(p).collect_set built a hot part's ENTIRE supplier set in
    one unspillable aggregation buffer at one reducer before the
    size() filter discarded it — at adversarial skew (deg ~ 1e6+)
    that is a straggler/OOM, not a cap.

    Two-level cap-or-null shape: suppliers salt by hash into `nsalt`
    buckets, so stage 1's per-(p, salt) partial sets are bounded at
    ~deg/nsalt each, a hot key's MERGE work spreads over nsalt
    reducers, and map-side partial aggregation still combines before
    the exchange (raw row volume never concentrates — the property a
    plain repartition-by-p guard would lose, which is why that
    bench-cheaper variant was rejected despite measuring ~0% here).
    Each distinct supplier lands in EXACTLY one bucket, so the
    per-part sum of partial-set sizes IS the exact distinct degree.
    Stage 2 then NULLS any partial larger than max_deg before
    collecting: a heavy part contributes only its sizes, so the
    merge buffer is bounded at nsalt·max_deg entries REGARDLESS of
    skew, the _deg filter drops heavy parts, and for survivors
    (deg <= max_deg ⇒ every partial kept, disjoint) the flatten+sort
    is bit-identical to array_sort(collect_set). No window, no join.

    Measured (sf0.1, one session, 6 interleaved reps, min/med of the
    full kcore / affinity pipelines): unguarded 3.87/4.38 & 2.28/2.52;
    this form + eager checkpoint at the call sites 4.33/4.98 &
    2.71/2.91 (~+10-15%, the guard's price); the r11-window variant
    5.02/— & 3.10/— (rejected, extra sort + third aggregate); count +
    broadcast-anti-join +79% (rejected, pays the partial aggregate
    twice plus a join); repartition('p') single-exchange 3.84/4.12
    (rejected as above — raw-row shuffle reintroduces the straggler
    at adversarial skew)."""
    salt = F.pmod(F.xxhash64(F.col("l_suppkey")), F.lit(nsalt))
    partial = (
        li.groupBy(F.col("l_partkey").alias("p"), salt.alias("_salt"))
        .agg(F.collect_set(F.col("l_suppkey")).alias("pss"))
    )
    kept = partial.select(
        "p",
        F.size("pss").alias("psz"),
        F.when(F.size("pss") <= max_deg, F.col("pss")).alias("keep"),
    )
    return (
        kept.groupBy("p")
        .agg(
            F.sum("psz").alias("_deg"),
            F.flatten(F.collect_list("keep")).alias("_fl"),
        )
        .filter(F.col("_deg") <= max_deg)
        .select("p", F.array_sort("_fl").alias("ss"))
    )


def _cosupply_mutual_edges(li: DataFrame, checkpoint: bool = True,
                           sf_dir: str | None = None) -> DataFrame:
    """The mutual-top-5 co-supply edge relation (sa < sb) every graph
    query shares (triangle census, LPA, community components, k-core
    — ONE Spark-side definition, review r9; the SQL twin is
    `_COSUPPLY_EDGE_CTES`): distinct supplier↔part pairs, HOT parts
    (> _COSUPPLY_MAX_DEG suppliers) dropped before the self-join
    (review r10 — the degree pass is skew-proof: groupBy.count
    map-side-combines a hot part to one row per input partition, then
    a broadcast anti-join; never a window on the part key), co-supply
    counts by part-key self-join, per-supplier top-5 by (count desc,
    id), kept only when MUTUAL. The kNN edge list is <= 5·|nodes| rows
    but its lineage (distinct + self-join + window) is the expensive
    part and every caller fans it into several branches — both the
    top-5 list and the mutual edges localCheckpoint so the co-supply
    join runs once (measured 23s → ~4s at sf0.1).

    r11 optimization-round note: a mid-build revision memoized the
    checkpointed edge list in a module dict keyed on (applicationId,
    sf_dir) so the six consumer queries shared one build. REMOVED
    (r11): a module-level memo keyed on the data directory means a
    benched query's warm reps serve a cached intermediate instead of
    computing from the parquet inputs — exactly the cross-invocation
    caching the bench methodology forbids. Every caller now rebuilds
    the projection inside its own timed region; sharing happens only
    WITHIN one query plan (the localCheckpoints below). On a real
    cluster the six consumers would read a materialized view with
    explicit refresh semantics — that lifecycle belongs in the
    lakehouse MV operator (`lakehouse_mv_join_incremental`), not a
    process-global dict. `sf_dir` stays in the signature (callers
    pass it; harmless) so the call sites did not churn."""
    # r11 optimization (guide §2.2/§3.5): the former pipeline was
    # distinct(s,p) -> degree groupBy(p) -> broadcast anti-join ->
    # p-key SELF-JOIN -> pair groupBy — four exchanges plus a join.
    # One groupBy(p).collect_set(s) replaces all of the first three:
    # the set dedups (s,p) pairs, size(set) IS the exact distinct
    # degree (the > _COSUPPLY_MAX_DEG drop happens before any
    # explode), and the ordered pairs come from an in-partition
    # combination expansion over the sorted set — the self-join
    # disappears entirely. Exchanges: (p) + (x,y) = 2, was 4 + join.
    # Pair counts are bit-identical (combinations of the distinct
    # supplier set per part == the a.s < b.s self-join output).
    # Expansion form matters: posexplode + slice explode (codegen'd
    # generators) measured 2.05 s vs 3.38 s for the equivalent nested
    # transform/flatten lambda (higher-order array functions are
    # interpreted — the minhash_signatures lesson) vs 2.77 s for the
    # old self-join, at sf0.1 min-of-3.
    # r12: the r11 skew trade (hot part's full set assembled at one
    # reducer before the cap) is closed — the heavy-key pre-drop now
    # runs as the salted two-level aggregation in
    # `_capped_part_supplier_sets` (see its docstring for the
    # exactness argument and measurements). Eager checkpoint: the
    # unionAll below consumes co_half twice, which would re-execute
    # the guarded chain past exchange reuse (kcore A/B min/med:
    # checkpointed 4.33/4.98 vs plain 4.69/5.06).
    parts_sets = _capped_part_supplier_sets(
        li, _COSUPPLY_MAX_DEG
    ).localCheckpoint(eager=True)
    co_half = (
        parts_sets.select(F.posexplode("ss").alias("i", "x"), F.col("ss"))
        .select(
            "x",
            F.explode(F.expr("slice(ss, i + 2, size(ss))")).alias("y"),
        )
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    co = co_half.select(
        F.col("x").alias("sa"), F.col("y").alias("sb"), "c"
    ).unionAll(co_half.select(
        F.col("y").alias("sa"), F.col("x").alias("sb"), "c"
    ))
    w = Window.partitionBy("sa").orderBy(F.desc("c"), F.asc("sb"))
    d = (
        co.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("sa", "sb")
        .localCheckpoint(eager=True)
    )
    e = (
        d.alias("d")
        .join(d.alias("m"), F.expr("m.sa = d.sb AND m.sb = d.sa"))
        .filter(F.expr("d.sa < d.sb"))
        .select(F.col("d.sa").alias("sa"), F.col("d.sb").alias("sb"))
    )
    return e.localCheckpoint(eager=True) if checkpoint else e


@register(
    "graph_triangle_census",
    oracle="""
    WITH sp0 AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem),
    heavy AS (SELECT p FROM sp0 GROUP BY p HAVING count(*) > 33),
    sp AS (SELECT s, p FROM sp0 WHERE p NOT IN (SELECT p FROM heavy)),
    -- MATERIALIZED: d/e are referenced multiple times (mutuality
    -- join, three triangle legs, degrees, counts); inlining would
    -- replay the 18M-row co-supply join per reference (measured
    -- ~80 GB of DuckDB spill at sf0.1). The relations are tiny.
    co AS MATERIALIZED (
      SELECT a.s AS sa, b.s AS sb, count(*) AS c
      FROM sp a JOIN sp b ON a.p = b.p AND a.s <> b.s GROUP BY a.s, b.s
    ),
    rk AS (
      SELECT sa, sb,
             row_number() OVER (PARTITION BY sa ORDER BY c DESC, sb ASC) AS rn
      FROM co
    ),
    d AS MATERIALIZED (SELECT sa, sb FROM rk WHERE rn <= 5),
    e AS MATERIALIZED (
      SELECT d.sa, d.sb FROM d JOIN d m ON m.sa = d.sb AND m.sb = d.sa
      WHERE d.sa < d.sb
    ),
    deg AS (
      SELECT v, count(*) AS dg FROM (
        SELECT sa AS v FROM e UNION ALL SELECT sb AS v FROM e) GROUP BY v
    ),
    tri AS (
      SELECT count(*) AS n FROM e e1
        JOIN e e2 ON e2.sa = e1.sb
        JOIN e e3 ON e3.sa = e1.sa AND e3.sb = e2.sb
    )
    SELECT CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
           CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
           CAST((SELECT sum(dg * (dg - 1) / 2) FROM deg) AS BIGINT) AS n_wedges,
           CAST((SELECT n FROM tri) AS BIGINT) AS n_triangles,
           CASE WHEN (SELECT sum(dg * (dg - 1) / 2) FROM deg) = 0 THEN 0.0
                ELSE floor(3.0 * (SELECT n FROM tri)
                           / (SELECT sum(dg * (dg - 1) / 2) FROM deg)
                           * 1000000.0 + 0.5) / 1000000.0
           END AS clustering
    """,
)
def graph_triangle_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census over the MUTUAL-top-5 co-supply graph: each
    supplier keeps its 5 strongest co-supply partners (shared-part
    count, deterministic tie-break), edges require mutuality — a
    degree-bounded kNN graph, so the edge set stays ≤ 2.5·|nodes| at
    ANY corpus size (the raw co-supply graph is complete on this data
    and would be quadratic). Triangles by the ordered two-join
    (a<b<c — each triangle counted once); wedges from degrees; global
    clustering coefficient = 3·triangles/wedges. The standard
    distributed graph-statistics pattern (edge joins, no
    vertex-centric framework needed); completes the graph family
    (PageRank, components, label propagation, census)."""
    from bigdata06_spark.queries.qutil import rnd

    li = load_table(spark, "lineitem", sf_dir)
    e = _cosupply_mutual_edges(li, sf_dir=sf_dir)
    deg = (
        e.select(F.col("sa").alias("v"))
        .unionAll(e.select(F.col("sb").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("dg"))
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.expr("e2.sa = e1.sb"))
        .join(e3, F.expr("e3.sa = e1.sa AND e3.sb = e2.sb"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    stats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        (F.sum(F.col("dg") * (F.col("dg") - 1)) / 2).cast("long").alias("n_wedges"),
    )
    n_edges = e.agg(F.count(F.lit(1)).alias("n_edges"))
    out = stats.crossJoin(n_edges).crossJoin(tri)
    clustering = F.when(F.col("n_wedges") == 0, F.lit(0.0)).otherwise(
        rnd(F.lit(3.0) * F.col("n") / F.col("n_wedges"), 6)
    )
    return out.select(
        "n_nodes",
        F.col("n_edges").cast("long").alias("n_edges"),
        "n_wedges",
        F.col("n").cast("long").alias("n_triangles"),
        clustering.alias("clustering"),
    )


def _lpa_oracle(n_iter: int = 4) -> str:
    """Unrolled SQL replay of synchronous label propagation over the
    mutual-top-5 co-supply graph (same edge CTEs as
    `graph_triangle_census`; same algorithm as
    `graph_label_propagation`)."""
    ctes = ["""sp0 AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem),
    heavy AS (SELECT p FROM sp0 GROUP BY p HAVING count(*) > 33),
    sp AS (SELECT s, p FROM sp0 WHERE p NOT IN (SELECT p FROM heavy)),
    co AS MATERIALIZED (
      SELECT a.s AS sa, b.s AS sb, count(*) AS c
      FROM sp a JOIN sp b ON a.p = b.p AND a.s <> b.s GROUP BY a.s, b.s
    ),
    rk AS (
      SELECT sa, sb,
             row_number() OVER (PARTITION BY sa ORDER BY c DESC, sb ASC) AS rn
      FROM co
    ),
    d AS MATERIALIZED (SELECT sa, sb FROM rk WHERE rn <= 5),
    e AS MATERIALIZED (
      SELECT d.sa, d.sb FROM d JOIN d m ON m.sa = d.sb AND m.sb = d.sa
      WHERE d.sa < d.sb
    ),
    ed AS MATERIALIZED (
      SELECT sa AS src, sb AS dst FROM e
      UNION ALL SELECT sb AS src, sa AS dst FROM e
    ),
    l0 AS (SELECT DISTINCT src AS v, src AS lab FROM ed)"""]
    for t in range(1, n_iter + 1):
        ctes.append(f"""m{t} AS (
      SELECT ed.dst AS v, l.lab, count(*) AS c
      FROM ed JOIN l{t-1} l ON l.v = ed.src GROUP BY 1, 2
    ),
    l{t} AS MATERIALIZED (
      SELECT v, lab FROM (
        SELECT m{t}.*, row_number() OVER (PARTITION BY v
                                          ORDER BY c DESC, lab ASC) AS rn
        FROM m{t})
      WHERE rn = 1
    )""")
    return (
        "WITH " + ",\n    ".join(ctes)
        + f"\n    SELECT v AS s, lab AS community FROM l{n_iter}"
    )


@register("graph_label_propagation", oracle=_lpa_oracle())
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan
    et al. 2007) over the same mutual-top-5 co-supply graph as
    `graph_triangle_census`: every node starts as its own label; each
    of 4 unrolled rounds relabels every node to its neighbors'
    plurality label (count desc, min-label tie-break — fully
    deterministic, so the run replays under the unrolled SQL oracle).
    Completes the graph family: PageRank (centrality), connected
    components (reachability), triangle census (statistics), LPA
    (communities).

    Scale: each round is one edge⋈label equi-join + one (node, label)
    count + one per-node argmax window — all keyed shuffles on the
    degree-bounded edge list (≤5·|nodes| rows by construction, never
    the quadratic co-supply graph). Labels localCheckpoint per round
    (|nodes| rows) so round t doesn't replay rounds 1..t-1 — the same
    iterative-lineage policy as `embedding_power_iteration`."""
    li = load_table(spark, "lineitem", sf_dir)
    e = _cosupply_mutual_edges(li, sf_dir=sf_dir)
    ed = (
        e.select(F.col("sa").alias("src"), F.col("sb").alias("dst"))
        .unionAll(e.select(F.col("sb").alias("src"), F.col("sa").alias("dst")))
        .localCheckpoint(eager=True)
    )
    labels = ed.select(F.col("src").alias("v")).distinct().select(
        "v", F.col("v").alias("lab")
    )
    wv = Window.partitionBy("v").orderBy(F.desc("c"), F.asc("lab"))
    for _ in range(4):
        msg = ed.join(labels.withColumnRenamed("v", "src"), "src").select(
            F.col("dst").alias("v"), "lab"
        )
        cnt = msg.groupBy("v", "lab").agg(F.count(F.lit(1)).alias("c"))
        labels = (
            cnt.withColumn("rn", F.row_number().over(wv))
            .filter(F.col("rn") == 1)
            .select("v", "lab")
            .localCheckpoint(eager=True)
        )
    return labels.select(F.col("v").alias("s"), F.col("lab").alias("community"))


@register(
    "dq_expectations",
    oracle="""
    SELECT
      CAST((SELECT count(*) FROM orders) AS BIGINT) AS orders_rows,
      CAST((SELECT count(*) - count(DISTINCT o_orderkey) FROM orders) AS BIGINT)
        AS orders_pk_dupes,
      CAST((SELECT count(*) FROM orders WHERE o_custkey IS NULL) AS BIGINT)
        AS orders_null_custkey,
      CAST((SELECT count(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
        AS orders_orphan_custkey,
      CAST((SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
        AS lineitem_orphan_orderkey,
      CAST((SELECT count(*) FROM lineitem
            WHERE l_quantity <= 0 OR l_discount < 0 OR l_discount > 1) AS BIGINT)
        AS lineitem_range_violations,
      CAST((SELECT count(*) FROM lineitem
            WHERE l_returnflag NOT IN ('A', 'N', 'R')) AS BIGINT)
        AS lineitem_domain_violations
    """,
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectation suite (the Great-Expectations /
    dbt-test audit, as ONE relational plan): primary-key uniqueness,
    null checks, referential integrity (anti-joins — never EXISTS
    subquery loops), numeric range and categorical domain constraints
    — each expectation a counter in a single result row, so the whole
    audit is one job and a CI gate can diff it against all-zeros.
    Anti-joins broadcast the key side when small; every leg is a scan
    + aggregate, no O(N²) anywhere."""
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)

    orders_rows = o.agg(
        F.count(F.lit(1)).alias("orders_rows"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("orders_pk_dupes"),
        F.sum(F.col("o_custkey").isNull().cast("long")).alias("orders_null_custkey"),
    )
    orphan_o = (
        o.join(c, o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("orders_orphan_custkey"))
    )
    orphan_li = (
        li.join(o, li.l_orderkey == o.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("lineitem_orphan_orderkey"))
    )
    li_checks = li.agg(
        F.sum(
            (
                (F.col("l_quantity") <= 0)
                | (F.col("l_discount") < 0)
                | (F.col("l_discount") > 1)
            ).cast("long")
        ).alias("lineitem_range_violations"),
        F.sum((~F.col("l_returnflag").isin("A", "N", "R")).cast("long")).alias(
            "lineitem_domain_violations"
        ),
    )
    return (
        orders_rows.crossJoin(orphan_o).crossJoin(orphan_li).crossJoin(li_checks)
    )


@register(
    "dq_observed_metrics",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null_returnflag,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty_units,
           CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_discount_violations
    FROM lineitem
    """,
)
def dq_observed_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INLINE observed metrics (`df.observe` / the Observation API):
    data-quality counters computed ON THE SAME PASS as a real
    consuming pipeline — the scan that feeds a revenue aggregate also
    emits row count, null count, an integer volume total, and a range
    violation count, with NO second scan of the fact (at 100 TB the
    audit otherwise doubles the I/O bill; this is also the only
    metrics path available inside a structured-streaming query).
    Deterministic integer metrics, so the oracle recomputes them
    directly; the pipeline's own aggregate is executed (that action
    is what materializes the observation) and discarded."""
    from pyspark.sql import Observation

    li = load_table(spark, "lineitem", sf_dir)
    obs = Observation("dq")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_returnflag").isNull().cast("long")).alias("n_null_returnflag"),
        F.sum(F.col("l_quantity").cast("long")).alias("total_qty_units"),
        F.sum(
            ((F.col("l_discount") < 0) | (F.col("l_discount") > 1)).cast("long")
        ).alias("n_discount_violations"),
    )
    # the consuming pipeline — its action materializes the metrics
    observed.groupBy("l_returnflag").agg(
        F.sum("l_extendedprice").alias("revenue")
    ).collect()
    m = obs.get
    return spark.createDataFrame(
        [
            (
                m["n_rows"],
                m["n_null_returnflag"],
                m["total_qty_units"],
                m["n_discount_violations"],
            )
        ],
        "n_rows long, n_null_returnflag long, total_qty_units long, "
        "n_discount_violations long",
    )


_CMS_MOD = 1_000_000_007
_CMS_WIDTH = 512
_CMS_DEPTH = 4


def _cms_consts(depth: int = _CMS_DEPTH) -> list[tuple[int, int]]:
    """Per-row mixer constants for the count-min sketch, from a FIXED
    LCG so the Spark expressions and the generated DuckDB oracle embed
    identical literals (the portable-hash recipe of
    operators/dedup.py:_poly_bit_consts). a < 9·10⁸ keeps
    (key mod p)·a < 2⁶⁰ — BIGINT-safe on both engines."""
    out, x = [], 987654321
    for _ in range(depth):
        x = (x * 1103515245 + 12345) % (1 << 31)
        a = (x % 899_999_999) + 1
        x = (x * 1103515245 + 12345) % (1 << 31)
        b = x % _CMS_MOD
        out.append((a, b))
    return out


def _cms_oracle() -> str:
    cell_sel = " UNION ALL ".join(
        f"SELECT {d} AS d, (((user_id % {_CMS_MOD}) * {a} + {b})"
        f" % {_CMS_MOD}) % {_CMS_WIDTH} AS bkt FROM events"
        for d, (a, b) in enumerate(_cms_consts())
    )
    probe_sel = " UNION ALL ".join(
        f"SELECT user_id, {d} AS d, (((user_id % {_CMS_MOD}) * {a} + {b})"
        f" % {_CMS_MOD}) % {_CMS_WIDTH} AS bkt FROM probes"
        for d, (a, b) in enumerate(_cms_consts())
    )
    return f"""
    WITH cells AS (
      SELECT d, bkt, count(*) AS cnt FROM ({cell_sel}) GROUP BY d, bkt
    ),
    probes AS (
      SELECT user_id, count(*) AS exact FROM events
      WHERE user_id % 13 = 0 GROUP BY user_id
    ),
    pb AS ({probe_sel}),
    est AS (
      SELECT pb.user_id, min(c.cnt) AS est
      FROM pb JOIN cells c ON c.d = pb.d AND c.bkt = pb.bkt
      GROUP BY pb.user_id
    )
    SELECT p.user_id, CAST(e.est AS BIGINT) AS est,
           CAST(p.exact AS BIGINT) AS exact,
           CAST(e.est - p.exact AS BIGINT) AS overestimate
    FROM probes p JOIN est e ON e.user_id = p.user_id
    """


@register("agg_count_min_sketch", oracle=_cms_oracle())
def agg_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT-MIN SKETCH point-frequency estimation over the events
    stream: a depth-4 × width-512 counter grid (one integer-hash
    bucket per row per depth), probed for every user in a fixed
    sample — estimate = min over depths, always ≥ the exact count
    (one-sided error ≤ e·N/width with prob 1−e^−depth). Completes the
    mergeable-sketch family (HLL distinct, KMV set ops, freq-items,
    bitmap): CMS cells ADD across partitions, days, and streams, so a
    100 TB ingest keeps 2048 integers per shard and merges by cell
    sum — the heavy-hitter / rate-limiter primitive.

    Scale shape: ONE events scan → 4-way explode → groupBy over at
    most depth×width = 2048 cells (map-side combine collapses each
    partition to ≤2048 rows before the shuffle); the probe lookup
    broadcasts the 2048-cell grid. Portable integer hashing (fixed
    LCG literals, BIGINT-safe) makes every cell bit-identical in
    DuckDB — the estimate column is exact-compared, not bounded."""
    e = load_table(spark, "events", sf_dir)
    consts = _cms_consts()

    def bkt(col, a: int, b: int):
        return (((col % _CMS_MOD) * a + b) % _CMS_MOD) % _CMS_WIDTH

    cells = (
        e.select(F.explode(F.array(*[
            F.struct(F.lit(d).alias("d"),
                     bkt(F.col("user_id"), a, b).alias("bkt"))
            for d, (a, b) in enumerate(consts)
        ])).alias("c"))
        .groupBy(F.col("c.d").alias("d"), F.col("c.bkt").alias("bkt"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    probes = (
        e.filter(F.col("user_id") % 13 == 0)
        .groupBy("user_id").agg(F.count(F.lit(1)).alias("exact"))
    )
    pb = probes.select("user_id", F.explode(F.array(*[
        F.struct(F.lit(d).alias("d"),
                 bkt(F.col("user_id"), a, b).alias("bkt"))
        for d, (a, b) in enumerate(consts)
    ])).alias("c")).select("user_id", "c.d", "c.bkt")
    est = (
        pb.join(F.broadcast(cells), ["d", "bkt"])
        .groupBy("user_id").agg(F.min("cnt").alias("est"))
    )
    return (
        probes.join(est, "user_id")
        .select(
            "user_id",
            F.col("est").cast("long").alias("est"),
            F.col("exact").cast("long").alias("exact"),
            (F.col("est") - F.col("exact")).cast("long").alias("overestimate"),
        )
    )


@register(
    "agg_kmv_sketch_setops",
    oracle="""
    WITH m AS (
      SELECT DISTINCT o_custkey AS ck, year(o_orderdate) AS yr
      FROM orders WHERE year(o_orderdate) IN (1996, 1997)
    ), h AS (
      SELECT ck, yr,
             CAST(CAST(('0x' || substr(md5(CAST(ck AS VARCHAR)), 1, 8))
                       AS UBIGINT) AS BIGINT) AS h
      FROM m
    ), per_set AS (
      SELECT yr, h, row_number() OVER (PARTITION BY yr ORDER BY h) AS r
      FROM (SELECT DISTINCT yr, h FROM h)
    ), set_est AS (
      SELECT yr,
             max(CASE WHEN r = 256 THEN h END) AS mk,
             count(*) AS cnt
      FROM per_set GROUP BY yr
    ), se AS (
      SELECT yr, CASE WHEN cnt <= 256 THEN cnt
                      ELSE (255 * 4294967296) // mk END AS est
      FROM set_est
    ), uh AS (
      SELECT h, count(DISTINCT yr) AS ns,
             row_number() OVER (ORDER BY h) AS r,
             count(*) OVER () AS cnt_u
      FROM (SELECT h, yr FROM h GROUP BY h, yr)
      GROUP BY h
      QUALIFY true
    ), union_est AS (
      SELECT max(CASE WHEN r = 256 THEN h END) AS mk,
             max(cnt_u) AS cnt_u,
             sum(CASE WHEN r <= 256 AND ns = 2 THEN 1 ELSE 0 END) AS j
      FROM uh
    ), ue AS (
      SELECT CASE WHEN cnt_u <= 256 THEN cnt_u
                  ELSE (255 * 4294967296) // mk END AS est_union,
             cnt_u, j
      FROM union_est
    ), exact AS (
      SELECT
        (SELECT count(DISTINCT ck) FROM m WHERE yr = 1996) AS exact_a,
        (SELECT count(DISTINCT ck) FROM m WHERE yr = 1997) AS exact_b,
        (SELECT count(DISTINCT ck) FROM m) AS exact_union,
        (SELECT count(*) FROM (SELECT ck FROM m GROUP BY ck
                               HAVING count(DISTINCT yr) = 2)) AS exact_inter
    )
    SELECT CAST(256 AS BIGINT) AS k,
           CAST((SELECT est FROM se WHERE yr = 1996) AS BIGINT) AS est_a,
           CAST((SELECT est FROM se WHERE yr = 1997) AS BIGINT) AS est_b,
           CAST(ue.est_union AS BIGINT) AS est_union,
           CAST(CASE WHEN ue.cnt_u <= 256 THEN ue.j
                     ELSE (ue.j * ue.est_union) // 256 END AS BIGINT) AS est_inter,
           CAST(exact.exact_a AS BIGINT) AS exact_a,
           CAST(exact.exact_b AS BIGINT) AS exact_b,
           CAST(exact.exact_union AS BIGINT) AS exact_union,
           CAST(exact.exact_inter AS BIGINT) AS exact_inter
    FROM ue, exact
    """,
)
def agg_kmv_sketch_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) DISTINCT SKETCH with set operations —
    the mergeable-sketch answer to "distinct users per segment AND
    the overlap between segments" that HLL union alone can't give
    (HLL has no intersection): keep the k smallest 32-bit md5 hashes
    per set; est = (k-1)·2³²/h₍ₖ₎ (exact when the set fits in the
    sketch); the UNION sketch is the k smallest of the merged streams
    (mergeability = a min-heap merge, so per-shard sketches combine
    associatively on a 1000-executor cluster — each sketch is k longs
    regardless of data size); the INTERSECTION estimate is the
    standard KMV ratio j/k of union-sketch members present in both
    sets, scaled by the union estimate. Sets here: custkeys ordering
    in 1996 vs 1997. Every estimator term is integer arithmetic on
    the SAME deterministic hash both engines compute (`div` floor
    division), so the oracle matches hash-exactly — estimates AND
    exact counts side by side. Plan shape: one fact scan → distinct
    (set, hash) → per-set window rank (parallel across sets) + one
    TakeOrdered for the union; no collect."""
    K = 256
    o = load_table(spark, "orders", sf_dir)
    m = (
        o.select(
            F.col("o_custkey").alias("ck"), F.year("o_orderdate").alias("yr")
        )
        .filter(F.col("yr").isin(1996, 1997))
        .distinct()
    )
    h = m.withColumn(
        "h",
        F.conv(F.substring(F.md5(F.col("ck").cast("string")), 1, 8), 16, 10)
        .cast("long"),
    )
    per_set = h.select("yr", "h").distinct()
    ranked = per_set.withColumn(
        "r", F.row_number().over(Window.partitionBy("yr").orderBy("h"))
    )
    se = (
        ranked.groupBy("yr")
        .agg(
            F.max(F.when(F.col("r") == K, F.col("h"))).alias("mk"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .withColumn(
            "est",
            F.when(F.col("cnt") <= K, F.col("cnt")).otherwise(
                F.expr(f"({K - 1} * 4294967296L) div mk")
            ),
        )
    )
    ests = se.agg(
        F.max(F.when(F.col("yr") == 1996, F.col("est"))).alias("est_a"),
        F.max(F.when(F.col("yr") == 1997, F.col("est"))).alias("est_b"),
    )
    uh = per_set.groupBy("h").agg(F.count_distinct("yr").alias("ns"))
    ur = uh.withColumn("r", F.row_number().over(Window.orderBy("h")))
    ue = (
        ur.agg(
            F.max(F.when(F.col("r") == K, F.col("h"))).alias("mk"),
            F.count(F.lit(1)).alias("cnt_u"),
            F.sum(
                ((F.col("r") <= K) & (F.col("ns") == 2)).cast("long")
            ).alias("j"),
        )
        .withColumn(
            "est_union",
            F.when(F.col("cnt_u") <= K, F.col("cnt_u")).otherwise(
                F.expr(f"({K - 1} * 4294967296L) div mk")
            ),
        )
        .withColumn(
            "est_inter",
            F.when(F.col("cnt_u") <= K, F.col("j")).otherwise(
                F.expr(f"(j * est_union) div {K}")
            ),
        )
    )
    exact = (
        m.groupBy("ck")
        .agg(F.count_distinct("yr").alias("nyr"), F.collect_set("yr").alias("yrs"))
        .agg(
            F.sum(F.array_contains("yrs", 1996).cast("long")).alias("exact_a"),
            F.sum(F.array_contains("yrs", 1997).cast("long")).alias("exact_b"),
            F.count(F.lit(1)).alias("exact_union"),
            F.sum((F.col("nyr") == 2).cast("long")).alias("exact_inter"),
        )
    )
    return (
        ests.crossJoin(ue.select("est_union", "est_inter"))
        .crossJoin(exact)
        .select(
            F.lit(K).cast("long").alias("k"),
            F.col("est_a").cast("long"),
            F.col("est_b").cast("long"),
            F.col("est_union").cast("long"),
            F.col("est_inter").cast("long"),
            F.col("exact_a").cast("long"),
            F.col("exact_b").cast("long"),
            F.col("exact_union").cast("long"),
            F.col("exact_inter").cast("long"),
        )
    )


# --------------------------------------------- round-8: runtime filters,
# exact heavy hitters, nonparametric stats, one-pass profiling

_BLOOM_BITS = 1 << 13  # 8192 bits = 128 BIGINT words
_BLOOM_SEEDS = (2654435769, 2246822519, 3266489917)  # xxhash64 mix seeds


@register(
    "join_bloom_prune",
    oracle=f"""
    SELECT o.o_orderpriority,
           count(*) AS n_orders,
           {dsum_sql('o.o_totalprice')} AS revenue
    FROM orders o JOIN customer c
      ON o.o_custkey = c.c_custkey AND c.c_acctbal > 9000
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def join_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime Bloom-filter semi-join reduction — the classic 100 TB
    shuffle saver: build an 8192-bit / 3-hash Bloom filter over the
    SELECTIVE dim keys (customers with c_acctbal > 9000 — ~10% of the
    dim, measured 153/1500 at sf0.01),
    broadcast it as 128 BIGINT literals, and prune the fact scan with
    pure JVM bit arithmetic BEFORE any join machinery runs. Blooms
    have no false negatives (every inserted key's bits are set, the
    hashes are deterministic), so pruned-join == plain-join and the
    oracle is the unfiltered SQL join; false positives are removed by
    the exact broadcast join that follows.

    Scale: the filter costs O(build) once (a groupBy onto <=128 bitmap
    words — a bounded, documented driver pull), then every fact row is
    3 hashes + 3 bit probes at scan stage, inside whole-stage codegen.
    At 1000 executors this is what Spark's own runtime bloom join
    (spark.sql.optimizer.runtime.bloomFilter.enabled) injects; here it
    is explicit so the mechanism is testable and the fpp/bits/hashes
    are first-class knobs. Fact rows that would shuffle only to be
    dropped by the join never leave the scan."""
    from bigdata06_spark.operators.relational import bloom_probe_expr

    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    rich = c.filter(F.col("c_acctbal") > 9000).select("c_custkey")
    pruned = o.filter(
        bloom_probe_expr(
            rich, "c_custkey", "o_custkey", bits=_BLOOM_BITS, seeds=_BLOOM_SEEDS
        )
    )
    return (
        pruned.join(F.broadcast(rich), pruned.o_custkey == rich.c_custkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


_HH_PHI_NUM, _HH_PHI_DEN = 5, 10000  # phi = 0.0005
_HH_CAPACITY = 4096  # >= 2/phi: candidate recall is guaranteed
#: Zipf-ish derived key (VERDICT r8 #3 — de-vacuify): z = M // (1+u)
#: with u a multiplicative-hash of l_orderkey, uniform on [0, M). The
#: share of key z is ~1/(z(z+1)) — SCALE-FREE, so "which keys exceed
#: phi" is non-empty (~43 keys) at EVERY sf, unlike raw l_partkey
#: whose per-key share shrinks ~1/K (true answer empty above sf0.01,
#: r8 vacuity flag). Knuth's multiplier; the orderkey is reduced mod a
#: prime < 1e9 BEFORE multiplying (ADVICE r9: the unreduced product
#: overflows 2^63 above ~sf300, where non-ANSI Spark wraps silently
#: while DuckDB raises — a silent cross-engine divergence). With the
#: reduction the product stays < 1e9 x 2.7e9 < 2^62 at ANY SF; at
#: fixture SFs (orderkey << the prime) the reduction is an identity,
#: so values are unchanged.
_HH_KEY = "10000 DIV (1 + ((l_orderkey % 999999937) * 2654435761) % 10000)"
_HH_KEY_SQL = "10000 // (1 + ((l_orderkey % 999999937) * 2654435761) % 10000)"


@register(
    "agg_heavy_hitters",
    oracle=f"""
    WITH k AS (SELECT {_HH_KEY_SQL} AS hh_key FROM lineitem
               WHERE l_orderkey IS NOT NULL),
    t AS (SELECT count(hh_key) AS total FROM k)
    SELECT hh_key, count(*) AS n_lines
    FROM k, t
    GROUP BY hh_key, t.total
    HAVING count(*) >= ({_HH_PHI_NUM} * t.total + {_HH_PHI_DEN - 1})
                       // {_HH_PHI_DEN}
    ORDER BY n_lines DESC, hh_key
    """,
)
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distributed heavy hitters (keys with frequency >= phi*N)
    via the two-pass Misra-Gries pattern: pass 1 builds per-partition
    MG summaries of capacity 2/phi (bounded memory, any key cardinality
    — see operators/relational.py:misra_gries_candidates for the
    superset proof), pass 2 recounts ONLY the candidate keys with an
    exact broadcast-semi-join + groupBy and applies the threshold.

    The answer is deterministic and partitioning-independent — the
    sketch can only widen the candidate set, never lose a true heavy
    hitter, and the recount is exact — so the oracle is the plain
    GROUP BY ... HAVING. The keyed column is the Zipf-ish DERIVED key
    `_HH_KEY` (simulating token/URL frequency): its share distribution
    is scale-free, so the answer is non-empty (~43 keys) at every sf —
    raw l_partkey's uniform shares emptied the true answer above
    sf0.01 (r8 vacuity flag). The threshold is INTEGER-pinned on both
    sides (ceil(phi*N) as (5N + 9999) // 10000) and totals count only
    non-null keys, matching misra_gries_candidates' "frequency over
    present keys" semantics (ADVICE r8). Eviction realism stays pinned
    by tests/test_operators_unit.py's constructed Zipf stream and the
    hypothesis superset property test.

    Scale: pass 1 shuffles <= partitions x capacity candidate rows
    instead of the key space (billions of keys -> thousands of rows);
    pass 2's scan filters through a broadcast hash set, so non-
    candidate keys never enter the aggregation hash map."""
    from bigdata06_spark.operators.relational import misra_gries_candidates

    li = load_table(spark, "lineitem", sf_dir).filter(
        F.col("l_orderkey").isNotNull()
    ).select(F.expr(_HH_KEY).alias("hh_key"))
    # localCheckpoint the bounded summary (<= partitions x (capacity+1)
    # rows) so the candidate branch and the total branch read ONE
    # materialized MG pass — two uncached consumers would re-run the
    # Arrow scan of every row (the query's only linear term) twice
    summ = misra_gries_candidates(li, "hh_key", _HH_CAPACITY).localCheckpoint()
    cand = summ.filter(~F.col("is_sentinel")).select("hh_key").distinct()
    total = summ.filter(F.col("is_sentinel")).agg(
        F.sum("mg_count").alias("total")
    )
    return (
        li.join(F.broadcast(cand), "hh_key", "left_semi")
        .groupBy("hh_key")
        .agg(F.count(F.lit(1)).alias("n_lines"))
        .crossJoin(F.broadcast(total))
        .filter(
            F.col("n_lines")
            >= F.expr(
                f"({_HH_PHI_NUM} * total + {_HH_PHI_DEN - 1}) DIV {_HH_PHI_DEN}"
            )
        )
        .select("hh_key", "n_lines")
        .orderBy(F.desc("n_lines"), "hh_key")
    )


@register(
    "stats_chi_square",
    oracle="""
    WITH cells AS (
      SELECT o_orderpriority AS r, o_orderstatus AS c, count(*) AS n
      FROM orders GROUP BY 1, 2
    ),
    tot AS (
      SELECT CAST(sum(n) AS DOUBLE) AS tn,
             CAST(count(DISTINCT r) AS BIGINT) AS nr,
             CAST(count(DISTINCT c) AS BIGINT) AS nc
      FROM cells
    ),
    rt AS (SELECT r, CAST(sum(n) AS DOUBLE) AS rn FROM cells GROUP BY r),
    ct AS (SELECT c, CAST(sum(n) AS DOUBLE) AS cn FROM cells GROUP BY c),
    terms AS (
      -- full r x c grid: a combination with ZERO observed rows still
      -- contributes its expected count E to the statistic
      SELECT tot.tn, tot.nr, tot.nc,
             floor(pow(coalesce(cells.n, 0) - rt.rn * ct.cn / tot.tn, 2)
                   / (rt.rn * ct.cn / tot.tn) * 1e6 + 0.5) / 1e6 AS term
      FROM rt CROSS JOIN ct
        LEFT JOIN cells ON cells.r = rt.r AND cells.c = ct.c
        CROSS JOIN tot
    )
    SELECT CAST(sum(CAST(term AS DECIMAL(25,6))) AS DOUBLE) AS chi2,
           (nr - 1) * (nc - 1) AS dof,
           floor(sqrt(CAST(sum(CAST(term AS DECIMAL(25,6))) AS DOUBLE)
                      / (tn * least(nr - 1, nc - 1))) * 1e6 + 0.5) / 1e6
             AS cramers_v,
           CAST(tn AS BIGINT) AS n
    FROM terms GROUP BY tn, nr, nc
    """,
)
def stats_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between two categoricals
    (order priority x order status) plus Cramer's V effect size — the
    categorical counterpart to the Welch t-test query. The term table
    is the FULL r x c grid (margins cross-joined, observed counts
    LEFT-joined): a combination with zero observed rows contributes
    its expected count E — omitting empty cells would understate the
    statistic precisely when the association is strongest. All inputs
    are exact integer margins, so expected counts are deterministic
    double arithmetic; each cell term is 6dp-quantized and
    decimal-summed (the qutil discipline) so the reduction order can't
    flip a bit cross-engine.

    Scale: one map-side-combined groupBy over r x c cells (15 here;
    bounded by the categorical product generally), then margins and
    the statistic are computed on the CELL table — data volume touches
    only the first aggregate."""
    from bigdata06_spark.queries.qutil import rnd

    o = load_table(spark, "orders", sf_dir)
    # ONE scan: every downstream relation (margins, totals, grid)
    # derives from the bounded r x c cell table — localCheckpoint it
    # so tot/rt/ct/grid don't re-run the orders aggregate 4x
    cells = (
        o.groupBy(
            F.col("o_orderpriority").alias("r"), F.col("o_orderstatus").alias("c")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )
    tot = cells.agg(
        F.sum("n").cast("double").alias("tn"),
        F.countDistinct("r").cast("long").alias("nr"),
        F.countDistinct("c").cast("long").alias("nc"),
    )
    rt = cells.groupBy("r").agg(F.sum("n").cast("double").alias("rn"))
    ct = cells.groupBy("c").agg(F.sum("n").cast("double").alias("cn"))
    exp = F.col("rn") * F.col("cn") / F.col("tn")
    # full r x c grid (margins cross-joined, observed LEFT-joined):
    # an absent combination still contributes (0-E)^2/E = E — dropping
    # zero cells would understate chi2 exactly when the association is
    # strongest
    terms = (
        rt.crossJoin(ct)
        .join(cells, ["r", "c"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "tn", "nr", "nc",
            rnd(
                F.pow(F.coalesce(F.col("n"), F.lit(0)) - exp, F.lit(2)) / exp, 6
            ).alias("term"),
        )
    )
    chi2 = F.sum(F.col("term").cast("decimal(25,6)")).cast("double")
    return (
        terms.groupBy("tn", "nr", "nc")
        .agg(chi2.alias("chi2"))
        .select(
            "chi2",
            ((F.col("nr") - 1) * (F.col("nc") - 1)).alias("dof"),
            rnd(
                F.sqrt(
                    F.col("chi2")
                    / (F.col("tn") * F.least(F.col("nr") - 1, F.col("nc") - 1))
                ),
                6,
            ).alias("cramers_v"),
            F.col("tn").cast("long").alias("n"),
        )
    )


@register(
    "stats_mann_whitney",
    oracle="""
    WITH vals AS (
      SELECT o_totalprice AS x,
             count(*) AS t,
             CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                  AS BIGINT) AS t1
      FROM orders WHERE o_orderstatus IN ('F', 'O')
      GROUP BY o_totalprice
    ),
    ranked AS (
      SELECT x, t, t1,
             coalesce(sum(t) OVER (ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
      FROM vals
    ),
    s AS (
      SELECT CAST(sum(t1) AS DOUBLE) AS n1,
             CAST(sum(t - t1) AS DOUBLE) AS n2,
             CAST(sum(CAST(t1 * (below + (t + 1) / 2.0) AS DECIMAL(25,6)))
                  AS DOUBLE) AS r1,
             CAST(sum(t * t * t - t) AS DOUBLE) AS ties
      FROM ranked
    )
    SELECT CAST(n1 AS BIGINT) AS n_f, CAST(n2 AS BIGINT) AS n_o,
           r1 - n1 * (n1 + 1) / 2.0 AS u_stat,
           floor((r1 - n1 * (n1 + 1) / 2.0 - n1 * n2 / 2.0)
                 / sqrt(n1 * n2 / 12.0 * ((n1 + n2 + 1)
                        - ties / ((n1 + n2) * (n1 + n2 - 1.0)))) * 1e6 + 0.5)
             / 1e6 AS z_stat,
           abs((r1 - n1 * (n1 + 1) / 2.0 - n1 * n2 / 2.0)
               / sqrt(n1 * n2 / 12.0 * ((n1 + n2 + 1)
                      - ties / ((n1 + n2) * (n1 + n2 - 1.0))))) > 1.96
             AS significant
    FROM s
    """,
)
def stats_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test (finished 'F' vs open 'O' order
    totals) — the nonparametric sibling of the Welch query: no
    normality assumption, driven entirely by ranks. Ranks are NOT
    computed row-at-a-time: values collapse to a per-value table first
    (groupBy x -> tie size t, group-1 share t1), average ranks come
    from a running sum over that aggregate, and the rank-sum R1 is a
    decimal-exact sum of t1 * avgrank terms (avg ranks live on the 0.5
    grid, so DECIMAL(25,6) is exact). Tie-corrected normal z.

    Scale: the window runs over DISTINCT values, not rows — for
    continuous measures the scale path is pre-binning to a fixed
    quantile grid (feature_quantile_bins) before ranking, which caps
    the window input regardless of N."""
    from bigdata06_spark.queries.qutil import rnd

    o = load_table(spark, "orders", sf_dir)
    vals = (
        o.filter(F.col("o_orderstatus").isin("F", "O"))
        .groupBy(F.col("o_totalprice").alias("x"))
        .agg(
            F.count(F.lit(1)).alias("t"),
            F.sum((F.col("o_orderstatus") == "F").cast("long")).alias("t1"),
        )
    )
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)
    ranked = vals.select(
        "t", "t1", F.coalesce(F.sum("t").over(w), F.lit(0)).alias("below")
    )
    s = ranked.agg(
        F.sum("t1").cast("double").alias("n1"),
        F.sum(F.col("t") - F.col("t1")).cast("double").alias("n2"),
        F.sum(
            (F.col("t1") * (F.col("below") + (F.col("t") + 1) / 2.0)).cast(
                "decimal(25,6)"
            )
        )
        .cast("double")
        .alias("r1"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("double")
        .alias("ties"),
    )
    u1 = F.col("r1") - F.col("n1") * (F.col("n1") + 1) / 2.0
    mu = F.col("n1") * F.col("n2") / 2.0
    nn = F.col("n1") + F.col("n2")
    sigma = F.sqrt(
        F.col("n1") * F.col("n2") / 12.0
        * ((nn + 1) - F.col("ties") / (nn * (nn - 1.0)))
    )
    return s.select(
        F.col("n1").cast("long").alias("n_f"),
        F.col("n2").cast("long").alias("n_o"),
        u1.alias("u_stat"),
        rnd((u1 - mu) / sigma, 6).alias("z_stat"),
        (F.abs((u1 - mu) / sigma) > 1.96).alias("significant"),
    )


@register(
    "dq_profile_columns",
    oracle="""
    SELECT 'o_orderkey' AS col_name,
           CAST(count(*) - count(o_orderkey) AS BIGINT) AS n_nulls,
           CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
           CAST(min(o_orderkey) AS VARCHAR) AS min_str,
           CAST(max(o_orderkey) AS VARCHAR) AS max_str
    FROM orders
    UNION ALL
    SELECT 'o_custkey',
           CAST(count(*) - count(o_custkey) AS BIGINT),
           CAST(count(DISTINCT o_custkey) AS BIGINT),
           CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus',
           CAST(count(*) - count(o_orderstatus) AS BIGINT),
           CAST(count(DISTINCT o_orderstatus) AS BIGINT),
           min(o_orderstatus), max(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice',
           CAST(count(*) - count(o_totalprice) AS BIGINT),
           CAST(count(DISTINCT o_totalprice) AS BIGINT),
           printf('%.2f', min(o_totalprice)), printf('%.2f', max(o_totalprice))
    FROM orders
    UNION ALL
    SELECT 'o_orderdate',
           CAST(count(*) - count(o_orderdate) AS BIGINT),
           CAST(count(DISTINCT o_orderdate) AS BIGINT),
           strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S'),
           strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S')
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority',
           CAST(count(*) - count(o_orderpriority) AS BIGINT),
           CAST(count(DISTINCT o_orderpriority) AS BIGINT),
           min(o_orderpriority), max(o_orderpriority)
    FROM orders
    ORDER BY col_name
    """,
)
def dq_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE-PASS column profiler — the dq family's discovery tool: for
    every column of a table, null count, exact distinct count, and
    min/max rendered with type-pinned formatting (%.2f for the
    2-decimal money grid, yyyy-MM-dd HH:mm:ss for timestamps, plain
    casts for integers/strings — each chosen so Spark's and DuckDB's
    string renderings are bit-identical; a bare double->string cast is
    NOT, the two engines disagree on scientific-notation cutoffs).

    Scale: TWO aggregates over two scans (then one cross join of two
    1-row frames + stack()). r11 split (guide §2.3, plan evidence in
    plans/r11/dq_profile_columns_*.txt): the former single aggregate
    mixed the six exact countDistincts with string/timestamp min/max
    — Catalyst's multi-distinct rewrite EXPANDs every row 7x and
    groups by all six distinct columns, and the var-length min/max
    buffers disqualify HashAggregate, so the whole 7x-expanded
    relation went through SortAggregate with two full sorts (3.7 s
    for 150k rows at sf0.1). Split, the distinct-count aggregate
    keeps only long buffers (Expand -> HashAggregate, no sort) and
    the null/min/max aggregate is keyless (SortAggregate WITHOUT a
    sort, one pass, map-side combined). 3.7 -> ~0.9 s; identical
    24 measures, and a 100 TB profile still costs O(2 scans), never
    per-column re-scans."""
    o = load_table(spark, "orders", sf_dir)
    cols = [
        ("o_orderkey", "int"),
        ("o_custkey", "int"),
        ("o_orderstatus", "str"),
        ("o_totalprice", "money"),
        ("o_orderdate", "ts"),
        ("o_orderpriority", "str"),
    ]
    nd_aggs = [
        F.countDistinct(F.col(name)).alias(f"nd_{name}") for name, _ in cols
    ]
    mm_aggs = []
    for name, kind in cols:
        c = F.col(name)
        mm_aggs.append(F.sum(c.isNull().cast("long")).alias(f"nn_{name}"))
        if kind == "money":
            mn = F.format_string("%.2f", F.min(c))
            mx = F.format_string("%.2f", F.max(c))
        elif kind == "ts":
            mn = F.date_format(F.min(c), "yyyy-MM-dd HH:mm:ss")
            mx = F.date_format(F.max(c), "yyyy-MM-dd HH:mm:ss")
        else:
            mn = F.min(c).cast("string")
            mx = F.max(c).cast("string")
        mm_aggs.append(mn.alias(f"mn_{name}"))
        mm_aggs.append(mx.alias(f"mx_{name}"))
    wide = o.agg(*nd_aggs).crossJoin(F.broadcast(o.agg(*mm_aggs)))
    stack = ", ".join(
        f"'{name}', nn_{name}, nd_{name}, mn_{name}, mx_{name}"
        for name, _ in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack}) AS "
        "(col_name, n_nulls, n_distinct, min_str, max_str)"
    ).orderBy("col_name")


@register(
    "join_skew_salted",
    oracle=f"""
    SELECT o.o_orderpriority,
           count(*) AS n_lines,
           {dsum_sql('l.l_extendedprice')} AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resilient salted JOIN under the oracle — the join twin of
    `agg_skew_salted`: the fact side carries a hashed-positional salt,
    the dim side replicates n_salts times, and the equi-join runs on
    (key, salt) so one hot key's rows spread over n_salts reducers
    instead of one straggler task (operators/scale.py:salted_join —
    max-partition bound and plain-join equality are plan-test-pinned
    with the broadcast threshold disabled). The oracle is the DIRECT
    join: identical output is the operator's contract.

    Scale: use when a hot key dominates a shuffle join and the dim is
    above the broadcast threshold; the cost is dim × n_salts shuffle
    volume, the win is capping any reducer at hot/n_salts rows. The
    decimal-summed revenue keeps the salt phase's combine order
    invisible cross-engine."""
    from bigdata06_spark.operators.scale import salted_join

    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_extendedprice"
    )
    o = load_table(spark, "orders", sf_dir).select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    return (
        salted_join(li, o, "l_orderkey")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum(F.col("l_extendedprice")).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


_Q2P_BINS = 2048
_Q2P_QS = (0.5, 0.9, 0.99)


@register(
    "agg_quantile_twopass",
    oracle="""
    WITH ranked AS (
      SELECT l_extendedprice AS x,
             row_number() OVER (ORDER BY l_extendedprice) AS r,
             count(*) OVER () AS n
      FROM lineitem
    )
    SELECT CAST(max(n) AS BIGINT) AS n,
           max(CASE WHEN r = (n + 1) // 2 THEN x END) AS p50,
           max(CASE WHEN r = (9 * n + 9) // 10 THEN x END) AS p90,
           max(CASE WHEN r = (99 * n + 99) // 100 THEN x END) AS p99
    FROM ranked
    """,
)
def agg_quantile_twopass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distributed quantiles (discrete: value at rank ceil(q·n))
    via histogram refinement — the scale path where both a global sort
    and Spark's exact `percentile` (which buffers every value in the
    aggregation state) stop being options. Pass 1: count/min/max. Pass
    2: 2048 equal-width bin counts (map-side combined; the driver pull
    is <= 2048 rows). Pass 3: only the bin containing each target rank
    is re-read — the bin membership is the SAME floor expression the
    histogram used (so float boundary rounding can't disagree), and a
    redundant WIDENED range predicate on x rides along so the parquet
    scan can prune row groups by min/max stats. The kth-smallest
    inside a bin is a TakeOrderedAndProject (heap of k, no sort).

    The oracle pins the discrete-quantile definition explicitly
    (row_number = ceil(q·n), computed as INTEGER arithmetic
    (q_num·n + q_num) // q_den on both sides — a float ceil(0.9·n)
    can land on either side of an exact multiple) rather than trusting
    either engine's quantile flavor; the answer is an order statistic,
    so every engine/partitioning/binning choice must land on the
    identical stored double.

    Scale: 2 full scans + one bin-sized scan per quantile, O(bins)
    driver state — at 100 TB with a pathological bin you recurse the
    same narrowing inside the bin instead of lifting k."""
    li = load_table(spark, "lineitem", sf_dir).select(
        F.col("l_extendedprice").alias("x")
    )
    stats = li.agg(
        F.count(F.lit(1)).alias("n"), F.min("x").alias("mn"), F.max("x").alias("mx")
    ).collect()[0]  # bounded: one row
    n, mn, mx = stats["n"], float(stats["mn"]), float(stats["mx"])
    width = (mx - mn) / _Q2P_BINS or 1.0
    bin_expr = F.least(
        F.floor((F.col("x") - F.lit(mn)) / F.lit(width)).cast("int"),
        F.lit(_Q2P_BINS - 1),
    )
    hist = dict(
        (r["b"], r["c"])
        for r in li.select(bin_expr.alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()  # bounded: <= _Q2P_BINS rows by construction
    )
    out_vals = []
    for q_num, q_den in ((1, 2), (9, 10), (99, 100)):
        rank = (q_num * n + q_den - 1) // q_den  # ceil(q*n), exact int math
        rank = max(1, min(n, rank))
        cum = 0
        for b in range(_Q2P_BINS):
            c = hist.get(b, 0)
            if cum + c >= rank:
                break
            cum += c
        k = rank - cum
        lo, hi = mn + (b - 1) * width, mn + (b + 2) * width  # widened, pushable
        val = (
            li.filter((F.col("x") >= lo) & (F.col("x") <= hi))
            .filter(bin_expr == b)
            .orderBy("x")
            .limit(k)
            .agg(F.max("x").alias("v"))
            .collect()[0]["v"]  # bounded: one row
        )
        out_vals.append(float(val))
    return spark.createDataFrame(
        [(n, *out_vals)], "n long, p50 double, p90 double, p99 double"
    )


@register(
    "events_attribution_last_touch",
    oracle=f"""
    WITH touched AS (
      SELECT event_type, value,
             last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS touch
      FROM events
    )
    SELECT coalesce(touch, 'no_touch') AS touch,
           count(*) AS n_conversions,
           {dsum_sql('value')} AS attributed_value
    FROM touched WHERE event_type = 'purchase'
    GROUP BY 1 ORDER BY 1
    """,
)
def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch conversion attribution — the composed business form
    of the as-of lookup: every 'purchase' event is credited to the
    user's most recent NON-purchase event before it (first event of a
    session converts with no prior touch → the 'no_touch' bucket), and
    attributed conversion value rolls up per touch channel. One
    user-keyed window (last_value IGNORE NULLS over the preceding
    frame) does the per-conversion lookup — no self-join, no per-row
    probe.

    Scale: a single exchange on user_id; the window walks each user's
    timeline once with O(1) carried state (the running last non-
    conversion type), so 100 TB of events costs one shuffle + one
    ordered pass — the same shape as sessionization. Tiebreak on
    (ts, event_id) pins simultaneous events deterministically."""
    e = load_table(spark, "events", sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    return (
        e.select("event_type", "value", touch.alias("touch"))
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce(F.col("touch"), F.lit("no_touch")).alias("touch"))
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            dsum(F.col("value")).alias("attributed_value"),
        )
        .orderBy("touch")
    )


@register(
    "events_attribution_linear",
    oracle="""
    WITH ev AS (
      SELECT user_id, ts, event_id, event_type,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS vcents,
             coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS wid
      FROM events
    ),
    touches AS (
      SELECT user_id, wid, event_type AS touch FROM ev
      WHERE event_type <> 'purchase'
    ),
    tcount AS (
      SELECT user_id, wid, count(*) AS k FROM touches GROUP BY 1, 2
    ),
    purch AS (
      SELECT ev.user_id, ev.wid, ev.vcents, tcount.k
      FROM ev LEFT JOIN tcount USING (user_id, wid)
      WHERE ev.event_type = 'purchase'
    ),
    credits AS (
      SELECT t.touch, (p.vcents * 1000) // p.k AS millicents
      FROM purch p JOIN touches t USING (user_id, wid)
      WHERE p.k IS NOT NULL
      UNION ALL
      SELECT 'no_touch' AS touch, vcents * 1000 AS millicents
      FROM purch WHERE k IS NULL
    )
    SELECT touch, CAST(count(*) AS BIGINT) AS n_credits,
           CAST(sum(millicents) AS BIGINT) AS attributed_millicents
    FROM credits GROUP BY 1 ORDER BY 1
    """,
)
def events_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINEAR MULTI-TOUCH attribution (new r11) — the fractional-credit
    complement to `events_attribution_last_touch`: every purchase
    splits its value EQUALLY across all of the user's touches since
    the previous purchase (the conversion window), instead of crediting
    only the final one — the model marketing teams A/B against
    last-touch. A purchase with no preceding touches in its window
    keeps full credit under 'no_touch'.

    Exactness: credit arithmetic is all-INTEGER — value in summed
    cents, per-touch credit = (cents·1000) DIV n_touches. Spark `DIV`
    truncates toward zero while DuckDB `//` floors — identical on the
    NON-NEGATIVE event values this table carries (pinned: min(value)
    >= 0 at every fixture SF; a table with negative conversion values
    would need floor() on the Spark side) — so attributed totals are
    BIGINT-exact on both engines, no float allocation anywhere.
    Window ids come from a purchase-count running sum with the
    (ts, event_id) tiebreak.

    Scale: one user-keyed window pass + two joins keyed (user_id,
    window_id) — co-partitioned by the same exchange, no broadcast of
    anything unbounded; per-window touch counts are the only
    intermediate state. The same shape at 100 TB is exactly this plan
    with more partitions."""
    e = load_table(spark, "events", sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ev = e.select(
        "user_id", "event_type",
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("vcents"),
        F.coalesce(
            F.sum(F.when(F.col("event_type") == "purchase", 1)).over(w),
            F.lit(0),
        ).alias("wid"),
    )
    touches = ev.filter(F.col("event_type") != "purchase").select(
        "user_id", "wid", F.col("event_type").alias("touch"))
    tcount = touches.groupBy("user_id", "wid").agg(
        F.count(F.lit(1)).alias("k"))
    purch = (
        ev.filter(F.col("event_type") == "purchase")
        .join(tcount, ["user_id", "wid"], "left")
        .select("user_id", "wid", "vcents", "k")
    )
    credited = (
        purch.filter(F.col("k").isNotNull())
        .join(touches, ["user_id", "wid"])
        .select("touch", F.expr("(vcents * 1000) DIV k").alias("millicents"))
        .unionAll(
            purch.filter(F.col("k").isNull())
            .select(F.lit("no_touch").alias("touch"),
                    (F.col("vcents") * 1000).alias("millicents"))
        )
    )
    return (
        credited.groupBy("touch")
        .agg(F.count(F.lit(1)).cast("long").alias("n_credits"),
             F.sum("millicents").cast("long").alias("attributed_millicents"))
        .orderBy("touch")
    )


_BASKET_MIN_SUPPORT = 2  # absolute pair-support floor
_BASKET_TOP_K = 50


@register(
    "orders_basket_rules",
    oracle=f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    ),
    n AS (SELECT count(DISTINCT ok) AS n_orders FROM items),
    freq AS (
      SELECT pk, count(*) AS cnt FROM items GROUP BY pk
      HAVING count(*) >= {_BASKET_MIN_SUPPORT}
    ),
    fitems AS (SELECT i.ok, i.pk FROM items i JOIN freq USING (pk)),
    pairs AS (
      SELECT a.pk AS pa, b.pk AS pb, count(*) AS cnt
      FROM fitems a JOIN fitems b
        ON a.ok = b.ok AND a.pk < b.pk
      GROUP BY 1, 2
      HAVING count(*) >= {_BASKET_MIN_SUPPORT}
    ),
    rules AS (
      SELECT pa AS antecedent, pb AS consequent, cnt FROM pairs
      UNION ALL
      SELECT pb, pa, cnt FROM pairs
    )
    SELECT r.antecedent, r.consequent,
           CAST(r.cnt AS BIGINT) AS pair_orders,
           floor(r.cnt / CAST(n.n_orders AS DOUBLE) * 1e6 + 0.5) / 1e6
             AS support,
           floor(r.cnt / CAST(fa.cnt AS DOUBLE) * 1e6 + 0.5) / 1e6
             AS confidence,
           floor(r.cnt * CAST(n.n_orders AS DOUBLE)
                 / (CAST(fa.cnt AS DOUBLE) * fc.cnt) * 1e6 + 0.5) / 1e6
             AS lift
    FROM rules r
      JOIN freq fa ON fa.pk = r.antecedent
      JOIN freq fc ON fc.pk = r.consequent
      CROSS JOIN n
    ORDER BY lift DESC, antecedent, consequent
    LIMIT {_BASKET_TOP_K}
    """,
)
def orders_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules (support / confidence / lift)
    over parts co-purchased in an order — the apriori shape done
    relationally: (1) distinct (order, part) item sets, (2) APRIORI
    PRUNING — parts below the absolute support floor can never form a
    frequent pair, so they exit before the pair join (the pass that
    keeps 100 TB tractable: the pair explosion only sees frequent
    items), (3) per-order pair generation as a self-equi-join on the
    order key with pk< ordering (per-order cost k², k = lines/order,
    bounded by basket size — never a global cross join), (4) both rule
    directions scored from exact integer counts, top-50 by lift with
    full key tiebreaks.

    Scale: one exchange keyed by order for the pair join, one by part
    for the margins; a hot basket (huge k) is the skew lever — cap k
    per order (top-m by frequency) at ingest, exactly as the capped
    affinity-graph query does."""
    from bigdata06_spark.queries.qutil import rnd

    li = load_table(spark, "lineitem", sf_dir)
    items = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    n_orders = items.select("ok").distinct().count()  # bounded: one scalar
    freq = (
        items.groupBy("pk")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= _BASKET_MIN_SUPPORT)
    )
    fitems = items.join(F.broadcast(freq.select("pk")), "pk")
    a = fitems.select(F.col("ok"), F.col("pk").alias("pa"))
    b = fitems.select(F.col("ok"), F.col("pk").alias("pb"))
    pairs = (
        a.join(b, ["ok"])
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= _BASKET_MIN_SUPPORT)
    )
    # both rule directions via ONE explode — a unionAll of two selects
    # over `pairs` would re-run the whole item/pair join chain twice
    rules = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("pa").alias("antecedent"),
                    F.col("pb").alias("consequent"),
                ),
                F.struct(
                    F.col("pb").alias("antecedent"),
                    F.col("pa").alias("consequent"),
                ),
            )
        ).alias("r"),
        "cnt",
    ).select("r.antecedent", "r.consequent", "cnt")
    fa = freq.select(F.col("pk").alias("antecedent"), F.col("cnt").alias("ca"))
    fc = freq.select(F.col("pk").alias("consequent"), F.col("cnt").alias("cc"))
    return (
        rules.join(F.broadcast(fa), "antecedent")
        .join(F.broadcast(fc), "consequent")
        .select(
            "antecedent",
            "consequent",
            F.col("cnt").cast("long").alias("pair_orders"),
            rnd(F.col("cnt") / F.lit(float(n_orders)), 6).alias("support"),
            rnd(F.col("cnt") / F.col("ca").cast("double"), 6).alias("confidence"),
            rnd(
                F.col("cnt") * F.lit(float(n_orders))
                / (F.col("ca").cast("double") * F.col("cc")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "antecedent", "consequent")
        .limit(_BASKET_TOP_K)
    )


_PSI_BINS = 10


@register(
    "dq_benford_test",
    oracle="""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                              AS VARCHAR), 1, 1) AS BIGINT) AS d
      FROM orders WHERE o_totalprice >= 1
    ),
    obs AS (SELECT d, CAST(count(*) AS BIGINT) AS n FROM digits GROUP BY d),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM obs),
    scored AS (
      SELECT obs.d, obs.n, tot.total,
             log10(1.0 + 1.0 / obs.d) AS p,
             floor(CAST(obs.n AS DOUBLE) / tot.total * 1e6 + 0.5) / 1e6
               AS observed_frac,
             floor(log10(1.0 + 1.0 / obs.d) * 1e6 + 0.5) / 1e6
               AS benford_frac
      FROM obs CROSS JOIN tot
    )
    SELECT d, n, observed_frac, benford_frac,
           floor((n - total * p) * (n - total * p) / (total * p)
                 * 1e6 + 0.5) / 1e6 AS chi2_contrib
    FROM scored ORDER BY d
    """,
)
def dq_benford_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BENFORD'S-LAW first-digit screen on order totals — the classic
    data-quality / fraud-detection test (fabricated or truncated
    numeric columns deviate from P(d) = log10(1 + 1/d); auditors and
    pipeline DQ monitors both run exactly this): per leading digit,
    the observed count, observed vs Benford fraction, and the
    chi-square contribution (n − N·p)²/(N·p). TPC-H totalprice is
    uniform-ish, NOT Benford — the test's value here is the exact
    cross-engine statistic, and the uniform data gives large
    contributions (a realistic 'alarm' output shape). Leading digit
    extracted from the integer part's decimal string (identical
    floor + string path both engines — no float log10 on the value
    itself, which could round differently at magnitude boundaries).

    Scale: one scan → 9-row aggregate (map-side combined); everything
    downstream is digit-domain arithmetic."""
    from bigdata06_spark.queries.qutil import rnd

    o = load_table(spark, "orders", sf_dir).filter(F.col("o_totalprice") >= 1)
    digits = o.select(
        F.substring(
            F.floor(F.col("o_totalprice")).cast("long").cast("string"), 1, 1
        )
        .cast("long")
        .alias("d")
    )
    obs = digits.groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = obs.agg(F.sum("n").cast("long").alias("total"))
    p = F.log10(1.0 + 1.0 / F.col("d"))
    dev = F.col("n") - F.col("total") * p
    return (
        obs.crossJoin(F.broadcast(tot))
        .select(
            "d", "n",
            rnd(F.col("n").cast("double") / F.col("total"), 6)
            .alias("observed_frac"),
            rnd(p, 6).alias("benford_frac"),
            rnd(dev * dev / (F.col("total") * p), 6).alias("chi2_contrib"),
        )
        .orderBy("d")
    )


@register(
    "dq_distribution_drift",
    oracle=f"""
    WITH s AS (
      SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx FROM orders
    ),
    binned AS (
      SELECT o_orderkey % 2 AS grp,
             least(CAST(floor((o_totalprice - s.mn)
                              / ((s.mx - s.mn) / {float(_PSI_BINS)})) AS BIGINT),
                   {_PSI_BINS - 1}) AS bin
      FROM orders, s
    ),
    margins AS (
      SELECT grp, CAST(count(*) AS BIGINT) AS n FROM binned GROUP BY grp
    ),
    grid AS (
      SELECT unnest(range(0, {_PSI_BINS})) AS bin
    ),
    cells AS (
      SELECT g.bin,
             CAST(sum(CASE WHEN b.grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
             CAST(sum(CASE WHEN b.grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
      FROM grid g LEFT JOIN binned b ON b.bin = g.bin
      GROUP BY g.bin
    ),
    probs AS (
      SELECT c.bin,
             (c.c0 + 1) / (CAST(m0.n AS DOUBLE) + {_PSI_BINS}) AS pa,
             (c.c1 + 1) / (CAST(m1.n AS DOUBLE) + {_PSI_BINS}) AS pb
      FROM cells c
        JOIN margins m0 ON m0.grp = 0
        JOIN margins m1 ON m1.grp = 1
    ),
    terms AS (
      SELECT floor((pa - pb) * ln(pa / pb) * 1e6 + 0.5) / 1e6 AS term
      FROM probs
    )
    SELECT CAST(sum(CAST(term AS DECIMAL(25,6))) AS DOUBLE) AS psi,
           (SELECT n FROM margins WHERE grp = 0) AS n_baseline,
           (SELECT n FROM margins WHERE grp = 1) AS n_current
    FROM terms
    """,
)
def dq_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POPULATION STABILITY INDEX — the ML-monitoring drift metric:
    o_totalprice's distribution compared between a baseline and a
    current slice (hash-split halves here; in production, training
    snapshot vs serving window) over 10 shared equal-width bins.
    Laplace-smoothed shares (+1/bin) keep empty bins finite — and the
    FULL bin grid participates (the chi-square lesson: absent bins
    carry signal). Each (pa-pb)·ln(pa/pb) term rounds onto the 6dp
    grid before the decimal sum (ln ulps + reassociation — the
    corpus_source_kl discipline). PSI ≈ 0 here (the halves are
    exchangeable); the wired threshold convention is 0.1 watch /
    0.25 act.

    Scale: one scan bins everything (the bin expression is scan-stage
    arithmetic on broadcast min/max), one groupBy on (grp, bin) ≤ 20
    cells — drift monitoring at 100 TB costs the scan it shares with
    ingest."""
    from bigdata06_spark.queries.qutil import rnd

    o = load_table(spark, "orders", sf_dir)
    s = o.agg(
        F.min("o_totalprice").alias("mn"), F.max("o_totalprice").alias("mx")
    )
    binned = o.crossJoin(F.broadcast(s)).select(
        (F.col("o_orderkey") % 2).alias("grp"),
        F.least(
            F.floor(
                (F.col("o_totalprice") - F.col("mn"))
                / ((F.col("mx") - F.col("mn")) / float(_PSI_BINS))
            ).cast("long"),
            F.lit(_PSI_BINS - 1).cast("long"),
        ).alias("bin"),
    )
    # ONE scan collapses to <= 2 x bins rows; margins and the full-grid
    # cells both derive from this bounded relation
    gb = (
        binned.groupBy("grp", "bin").agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )
    margins = gb.groupBy("grp").agg(F.sum("n").alias("n"))
    grid = spark.range(_PSI_BINS).select(F.col("id").alias("bin"))
    cells = (
        grid.join(gb, "bin", "left")
        .groupBy("bin")
        .agg(
            F.sum(F.when(F.col("grp") == 0, F.col("n")).otherwise(0)).alias("c0"),
            F.sum(F.when(F.col("grp") == 1, F.col("n")).otherwise(0)).alias("c1"),
        )
    )
    m0 = margins.filter(F.col("grp") == 0).select(F.col("n").alias("n0"))
    m1 = margins.filter(F.col("grp") == 1).select(F.col("n").alias("n1"))
    probs = (
        cells.crossJoin(F.broadcast(m0))
        .crossJoin(F.broadcast(m1))
        .select(
            ((F.col("c0") + 1) / (F.col("n0").cast("double") + _PSI_BINS)).alias("pa"),
            ((F.col("c1") + 1) / (F.col("n1").cast("double") + _PSI_BINS)).alias("pb"),
            "n0", "n1",
        )
    )
    terms = probs.select(
        rnd((F.col("pa") - F.col("pb")) * F.log(F.col("pa") / F.col("pb")), 6).alias(
            "term"
        ),
        "n0", "n1",
    )
    return terms.groupBy("n0", "n1").agg(
        F.sum(F.col("term").cast("decimal(25,6)")).cast("double").alias("psi")
    ).select(
        "psi",
        F.col("n0").cast("long").alias("n_baseline"),
        F.col("n1").cast("long").alias("n_current"),
    )


@register(
    "events_changepoint_cusum",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', o_orderdate) AS d,
             CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS rev
      FROM orders GROUP BY 1
    ),
    m AS (
      SELECT CAST(sum(CAST(rev AS DECIMAL(25,6))) AS DOUBLE) / count(*) AS mu,
             CAST(count(*) AS BIGINT) AS n
      FROM daily
    ),
    dev AS (
      SELECT d, CAST(floor((rev - m.mu) * 1e6 + 0.5) / 1e6
                     AS DECIMAL(25,6)) AS dv, m.n
      FROM daily CROSS JOIN m
    ),
    cus AS (
      SELECT d, n,
             CAST(sum(dv) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS DOUBLE) AS cusum
      FROM dev
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           strftime(d, '%Y-%m-%d') AS changepoint_date,
           floor(abs(cusum) * 1e6 + 0.5) / 1e6 AS cusum_stat
    FROM cus
    ORDER BY floor(abs(cusum) * 1e6 + 0.5) / 1e6 DESC, d LIMIT 1
    """,
)
def events_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM CHANGEPOINT detection on the daily revenue series — the
    sequential-drift member of the anomaly family (MAD and z-score
    flag outlier POINTS; CUSUM finds where the LEVEL shifted): the
    running sum of mean-deviations peaks in magnitude at the most
    likely changepoint. Deviations are 6dp-quantized and the running
    sum is DECIMAL (window float sums reassociate in DuckDB's segment
    trees — the qutil discipline applied to a cumulative window); the
    argmax pins ties to the earliest day.

    Scale: the series collapses to one row per day before any window
    (the hypertable-rollup shape); the cumulative window runs over
    DAYS, not rows — bounded by the calendar, not the data."""
    from bigdata06_spark.queries.qutil import rnd

    o = load_table(spark, "orders", sf_dir)
    daily = o.groupBy(F.date_trunc("day", F.col("o_orderdate")).alias("d")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(25,6)")).cast("double").alias("rev")
    )
    m = daily.agg(
        (
            F.sum(F.col("rev").cast("decimal(25,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mu"),
        F.count(F.lit(1)).alias("n"),
    )
    dev = daily.crossJoin(F.broadcast(m)).select(
        "d", "n", rnd(F.col("rev") - F.col("mu"), 6).cast("decimal(25,6)").alias("dv")
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cus = dev.select(
        "d", "n", F.sum("dv").over(w).cast("double").alias("cusum")
    )
    return (
        cus.select(
            F.col("n").cast("long").alias("n_days"),
            F.date_format("d", "yyyy-MM-dd").alias("changepoint_date"),
            rnd(F.abs(F.col("cusum")), 6).alias("cusum_stat"),
        )
        .orderBy(F.desc(F.col("cusum_stat")), "changepoint_date")
        .limit(1)
    )


@register(
    "stats_ks_test",
    oracle="""
    WITH vals AS (
      SELECT o_totalprice AS x,
             CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                  AS BIGINT) AS t1,
             CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
                  AS BIGINT) AS t2
      FROM orders WHERE o_orderstatus IN ('F', 'O')
      GROUP BY o_totalprice
    ),
    cum AS (
      SELECT x,
             CAST(sum(t1) OVER w AS BIGINT) AS c1,
             CAST(sum(t2) OVER w AS BIGINT) AS c2,
             CAST(sum(t1) OVER () AS BIGINT) AS n1,
             CAST(sum(t2) OVER () AS BIGINT) AS n2
      FROM vals
      WINDOW w AS (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW)
    ),
    top AS (
      SELECT * FROM cum
      ORDER BY abs(c1 * n2 - c2 * n1) DESC, x LIMIT 1
    )
    SELECT CAST(n1 AS BIGINT) AS n_f, CAST(n2 AS BIGINT) AS n_o,
           floor(abs(c1 * n2 - c2 * n1) / (CAST(n1 AS DOUBLE) * n2)
                 * 1e6 + 0.5) / 1e6 AS d_stat,
           abs(c1 * n2 - c2 * n1) / (CAST(n1 AS DOUBLE) * n2)
             * sqrt(CAST(n1 AS DOUBLE) * n2 / (n1 + n2)) > 1.358
             AS significant
    FROM top
    """,
)
def stats_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KOLMOGOROV-SMIRNOV test (finished vs open order
    totals) — the distribution-shape member of the stats family
    (Welch compares means, Mann-Whitney compares ranks, KS compares
    the WHOLE ECDF): D = sup |F1 - F2| evaluated at every sample
    value. The supremum search is PURE INTEGER — |F1-F2| maximized as
    |c1*n2 - c2*n1| over cumulative counts, no float enters until the
    final statistic — so the argmax is bit-free cross-engine by
    construction (no rounding-at-the-boundary risk at all). The
    significance flag compares D*sqrt(n1*n2/(n1+n2)) to the 5%
    Smirnov critical value 1.358.

    Scale: like the rank-sum test, the ECDF runs over DISTINCT values
    (per-value aggregate first); continuous measures pre-bin to a
    quantile grid to cap the window input."""
    o = load_table(spark, "orders", sf_dir)
    vals = (
        o.filter(F.col("o_orderstatus").isin("F", "O"))
        .groupBy(F.col("o_totalprice").alias("x"))
        .agg(
            F.sum((F.col("o_orderstatus") == "F").cast("long")).alias("t1"),
            F.sum((F.col("o_orderstatus") == "O").cast("long")).alias("t2"),
        )
    )
    wc = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cum = vals.select(
        "x",
        F.sum("t1").over(wc).alias("c1"),
        F.sum("t2").over(wc).alias("c2"),
        F.sum("t1").over(wall).alias("n1"),
        F.sum("t2").over(wall).alias("n2"),
    )
    d_int = F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1"))
    top = cum.orderBy(d_int.desc(), "x").limit(1)
    d_stat = d_int / (F.col("n1").cast("double") * F.col("n2"))
    lam = d_stat * F.sqrt(
        F.col("n1").cast("double") * F.col("n2") / (F.col("n1") + F.col("n2"))
    )
    from bigdata06_spark.queries.qutil import rnd

    return top.select(
        F.col("n1").cast("long").alias("n_f"),
        F.col("n2").cast("long").alias("n_o"),
        rnd(d_stat, 6).alias("d_stat"),
        (lam > 1.358).alias("significant"),
    )


@register(
    "stats_spearman_corr",
    oracle="""
    WITH rows_ AS (
      SELECT l_quantity AS x, floor(l_extendedprice) AS y FROM lineitem
      WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
    ),
    rx AS (
      SELECT x, 2 * sum(count(*)) OVER (ORDER BY x) - count(*) + 1 AS r2x
      FROM rows_ GROUP BY x
    ),
    ry AS (
      SELECT y, 2 * sum(count(*)) OVER (ORDER BY y) - count(*) + 1 AS r2y
      FROM rows_ GROUP BY y
    ),
    j AS (
      SELECT rx.r2x, ry.r2y FROM rows_
        JOIN rx ON rx.x = rows_.x
        JOIN ry ON ry.y = rows_.y
    ),
    s AS (
      SELECT CAST(count(*) AS DECIMAL(38,0)) AS n,
             CAST(sum(CAST(r2x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
             CAST(sum(CAST(r2y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
             CAST(sum(CAST(r2x * r2x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxx,
             CAST(sum(CAST(r2y * r2y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS syy,
             CAST(sum(CAST(r2x * r2y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxy
      FROM j
    )
    SELECT CAST(n AS BIGINT) AS n,
           floor(CAST(n * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE)) * 1e6 + 0.5) / 1e6
             AS spearman_rho,
           abs(CAST(n * sxy - sx * sy AS DOUBLE)
               / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                      * CAST(n * syy - sy * sy AS DOUBLE))
               * sqrt(CAST(n AS DOUBLE) - 1.0)) > 1.96 AS significant
    FROM s
    """,
)
def stats_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPEARMAN rank correlation (lineitem quantity vs extended price)
    — the monotone-association member of the stats family (VERDICT r8
    #8: stats was the thinnest analytic family). Average ranks for
    ties come from the Mann-Whitney per-value-aggregate pattern, kept
    INTEGER by carrying 2*avg_rank = 2*cum - t + 1 (the 0.5 grid
    doubled); the factor of 2 cancels in the correlation. Pearson-on-
    ranks runs over DECIMAL(38,0) sums — exact cross-engine at any N
    the fixture reaches (n*sxy <= n^2*(2n)^2 ~ 1e38 caps n at ~1e7 per
    partition-free proof; the sf1 probe's 6M rows sit well inside) —
    and only the final rho division is floating point (6dp-rounded).
    z = rho*sqrt(n-1) against 1.96 flags significance.

    Scale: ranks are computed over DISTINCT values (per-value
    aggregate + running sum), so the window input is the value domain,
    not N — and the domain must actually be bounded for that to hold
    (ADVICE r9: raw l_extendedprice is near-continuous, distinct count
    ~O(N), funneling the running-sum window onto one partition). The
    near-continuous measure is therefore PRE-BINNED to whole dollars
    (floor — exact on the identical parquet doubles both engines
    read), capping the rank window at the ~110k-value price domain at
    ANY corpus size; quantity's 50-value domain needs no binning. The
    statistic is "Spearman over dollar-binned price", stated and
    mirrored in the oracle."""
    from bigdata06_spark.queries.qutil import rnd

    li = load_table(spark, "lineitem", sf_dir)
    rows_ = li.filter(
        F.col("l_quantity").isNotNull() & F.col("l_extendedprice").isNotNull()
    ).select(
        F.col("l_quantity").alias("x"),
        F.floor("l_extendedprice").alias("y"),
    )

    def rank2(df: DataFrame, col: str, out: str) -> DataFrame:
        wc = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        return (
            df.groupBy(col)
            .agg(F.count(F.lit(1)).alias("t"))
            .select(
                col,
                (2 * F.sum("t").over(wc) - F.col("t") + 1).alias(out),
            )
        )

    j = rows_.join(rank2(rows_, "x", "r2x"), "x").join(rank2(rows_, "y", "r2y"), "y")
    dec = "decimal(38,0)"
    s = j.agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum(F.col("r2x").cast(dec)).cast(dec).alias("sx"),
        F.sum(F.col("r2y").cast(dec)).cast(dec).alias("sy"),
        F.sum((F.col("r2x") * F.col("r2x")).cast(dec)).cast(dec).alias("sxx"),
        F.sum((F.col("r2y") * F.col("r2y")).cast(dec)).cast(dec).alias("syy"),
        F.sum((F.col("r2x") * F.col("r2y")).cast(dec)).cast(dec).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    rho = num / den
    return s.select(
        F.col("n").cast("long").alias("n"),
        rnd(rho, 6).alias("spearman_rho"),
        (F.abs(rho * F.sqrt(F.col("n").cast("double") - 1.0)) > 1.96).alias(
            "significant"
        ),
    )


@register(
    "stats_kendall_tau",
    oracle="""
    WITH cells AS (
      SELECT l_quantity AS x, l_discount AS y, count(*) AS c
      FROM lineitem
      WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
      GROUP BY 1, 2
    ),
    pq AS (
      SELECT
        CAST(coalesce(sum(CASE WHEN a.x < b.x AND a.y < b.y
                               THEN a.c * b.c END), 0) AS BIGINT) AS conc,
        CAST(coalesce(sum(CASE WHEN a.x < b.x AND a.y > b.y
                               THEN a.c * b.c END), 0) AS BIGINT) AS disc
      FROM cells a, cells b
    ),
    m AS (
      SELECT CAST(sum(c) AS BIGINT) AS n,
             CAST(sum(c) * (sum(c) - 1) / 2 AS BIGINT) AS n0,
             CAST((SELECT sum(tx * (tx - 1) / 2) FROM
                   (SELECT sum(c) AS tx FROM cells GROUP BY x)) AS BIGINT) AS n1,
             CAST((SELECT sum(ty * (ty - 1) / 2) FROM
                   (SELECT sum(c) AS ty FROM cells GROUP BY y)) AS BIGINT) AS n2
      FROM cells
    )
    SELECT m.n, pq.conc, pq.disc,
           floor((pq.conc - pq.disc)
                 / sqrt(CAST(m.n0 - m.n1 AS DOUBLE) * (m.n0 - m.n2))
                 * 1e6 + 0.5) / 1e6 AS tau_b
    FROM pq, m
    """,
)
def stats_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KENDALL tau-b (lineitem quantity vs discount) — the ordinal-
    concordance member of the stats family. The naive statistic is an
    O(N^2) pair scan; here both columns live on SMALL VALUE DOMAINS,
    so the JOINT distribution collapses to a (x, y, count) cell table
    bounded by |X|*|Y| (~550 cells) REGARDLESS of N, and concordant/
    discordant pair counts are an exact integer double-sum over cell
    pairs (each unordered row pair counted once via a.x < b.x). Tie
    margins n1/n2 come from the cell margins; everything is BIGINT
    until the final tau division (6dp-rounded).

    Scale: one groupBy onto the bounded cell table, then a broadcast
    self-join of ~550 rows — N never enters the quadratic term. For
    continuous columns, pre-bin to a quantile grid first (the same
    domain-capping rule as the rank tests)."""
    from bigdata06_spark.queries.qutil import rnd

    li = load_table(spark, "lineitem", sf_dir)
    cells = (
        li.filter(F.col("l_quantity").isNotNull() & F.col("l_discount").isNotNull())
        .groupBy(F.col("l_quantity").alias("x"), F.col("l_discount").alias("y"))
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()  # bounded: |X|*|Y| cells by construction
    )
    a, b = cells.alias("a"), F.broadcast(cells.alias("b"))
    pq = a.crossJoin(b).agg(
        F.coalesce(
            F.sum(
                F.when(
                    (F.col("a.x") < F.col("b.x")) & (F.col("a.y") < F.col("b.y")),
                    F.col("a.c") * F.col("b.c"),
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("conc"),
        F.coalesce(
            F.sum(
                F.when(
                    (F.col("a.x") < F.col("b.x")) & (F.col("a.y") > F.col("b.y")),
                    F.col("a.c") * F.col("b.c"),
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("disc"),
    )
    tx = cells.groupBy("x").agg(F.sum("c").alias("tx"))
    ty = cells.groupBy("y").agg(F.sum("c").alias("ty"))
    m = (
        cells.agg(
            F.sum("c").cast("long").alias("n"),
            (F.sum("c") * (F.sum("c") - 1) / 2).cast("long").alias("n0"),
        )
        .crossJoin(
            F.broadcast(
                tx.agg((F.sum(F.col("tx") * (F.col("tx") - 1) / 2)).cast("long").alias("n1"))
            )
        )
        .crossJoin(
            F.broadcast(
                ty.agg((F.sum(F.col("ty") * (F.col("ty") - 1) / 2)).cast("long").alias("n2"))
            )
        )
    )
    tau = (F.col("conc") - F.col("disc")) / F.sqrt(
        (F.col("n0") - F.col("n1")).cast("double") * (F.col("n0") - F.col("n2"))
    )
    return pq.crossJoin(F.broadcast(m)).select(
        "n", "conc", "disc", rnd(tau, 6).alias("tau_b")
    )


_COSUPPLY_EDGE_CTES = """sp0 AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem),
    heavy AS (SELECT p FROM sp0 GROUP BY p HAVING count(*) > 33),
    sp AS (SELECT s, p FROM sp0 WHERE p NOT IN (SELECT p FROM heavy)),
    co AS MATERIALIZED (
      SELECT a.s AS sa, b.s AS sb, count(*) AS c
      FROM sp a JOIN sp b ON a.p = b.p AND a.s <> b.s GROUP BY a.s, b.s
    ),
    rk AS (
      SELECT sa, sb,
             row_number() OVER (PARTITION BY sa ORDER BY c DESC, sb ASC) AS rn
      FROM co
    ),
    d AS MATERIALIZED (SELECT sa, sb FROM rk WHERE rn <= 5),
    e AS MATERIALIZED (
      SELECT d.sa, d.sb FROM d JOIN d m ON m.sa = d.sb AND m.sb = d.sa
      WHERE d.sa < d.sb
    )"""


@register(
    "graph_community_components",
    oracle=f"""
    WITH RECURSIVE
    {_COSUPPLY_EDGE_CTES},
    ed AS (SELECT sa AS src, sb AS dst FROM e
           UNION ALL SELECT sb AS src, sa AS dst FROM e),
    nodes AS (SELECT DISTINCT src AS v FROM ed),
    comp(node, label) AS (
      SELECT v, v FROM nodes
      UNION
      SELECT ed.dst, c.label FROM comp c JOIN ed ON ed.src = c.node
    ),
    lab AS (SELECT node, min(label) AS community FROM comp GROUP BY node),
    sz AS (SELECT community, CAST(count(*) AS BIGINT) AS n_members
           FROM lab GROUP BY community),
    ec AS (SELECT l.community, CAST(count(*) AS BIGINT) AS n_edges
           FROM e JOIN lab l ON l.node = e.sa GROUP BY l.community)
    SELECT sz.community, sz.n_members, ec.n_edges,
           floor(2.0 * ec.n_edges / (sz.n_members * (sz.n_members - 1.0))
                 * 1e6 + 0.5) / 1e6 AS density
    FROM sz JOIN ec USING (community)
    ORDER BY n_members DESC, community
    """,
)
def graph_community_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMMUNITY ROLLUP by connected components over the mutual-top-5
    co-supply graph (the same edge relation as `graph_triangle_census`
    and `graph_label_propagation`): each supplier joins the component
    of its lowest reachable id; the output is one row per community —
    size, internal (undirected) edge count, and edge density — the
    fraud-ring / cluster-audit summary (VERDICT r8 #8: graph was a
    thin family). Components come from the SAME fixpoint min-label
    propagation operator the dedup family uses
    (operators/dedup.py:connected_components — converges in
    O(diameter) rounds, fails loud past max_iter); every internal edge
    lands in exactly one community (both endpoints share a label by
    definition of components), so n_edges is a single keyed count.

    Scale: edge construction is the degree-bounded mutual-top-k list
    (<= 5*|nodes| rows, never the quadratic co-supply relation); each
    propagation round is one edges-to-labels join + min-agg on uniform
    keys; the rollup is two groupBys on the community key. Giant-
    diameter graphs switch to connected_components_star (O(log n)
    rounds, same join primitive)."""
    from bigdata06_spark.operators.dedup import connected_components
    from bigdata06_spark.queries.qutil import rnd

    li = load_table(spark, "lineitem", sf_dir)
    e = _cosupply_mutual_edges(li, sf_dir=sf_dir)
    nodes = (
        e.select(F.col("sa").alias("v"))
        .unionAll(e.select(F.col("sb").alias("v")))
        .distinct()
    )
    lab = connected_components(
        e.select(F.col("sa").alias("doc_a"), F.col("sb").alias("doc_b")),
        nodes,
        id_col="v",
    ).select(F.col("v").alias("node"), F.col("component").alias("community"))
    sz = lab.groupBy("community").agg(F.count(F.lit(1)).alias("n_members"))
    ec = (
        e.join(lab.withColumnRenamed("node", "sa"), "sa")
        .groupBy("community")
        .agg(F.count(F.lit(1)).alias("n_edges"))
    )
    return (
        sz.join(ec, "community")
        .select(
            "community",
            F.col("n_members").cast("long").alias("n_members"),
            F.col("n_edges").cast("long").alias("n_edges"),
            rnd(
                2.0 * F.col("n_edges")
                / (F.col("n_members") * (F.col("n_members") - 1.0)),
                6,
            ).alias("density"),
        )
        .orderBy(F.desc("n_members"), "community")
    )


@register(
    "stats_anova_oneway",
    oracle="""
    WITH x AS (
      SELECT o_orderpriority AS g, o_totalprice AS p,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders WHERE o_totalprice IS NOT NULL
    ),
    cells AS (
      SELECT g, CAST(count(*) AS BIGINT) AS n_g,
             CAST(sum(cents) AS BIGINT) AS s_g,
             CAST(sum(CAST(floor(p * p * 100.0 + 0.5) / 100.0
                           AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS q_g
      FROM x GROUP BY g
    ),
    terms AS (
      SELECT n_g, s_g, q_g,
             floor((CAST(s_g AS DOUBLE) / 100.0) * (CAST(s_g AS DOUBLE) / 100.0)
                   / n_g * 100.0 + 0.5) / 100.0 AS term
      FROM cells
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(n_g) AS BIGINT) AS n,
             CAST(sum(s_g) AS DOUBLE) / 100.0 AS s_all,
             CAST(sum(q_g) AS DOUBLE) AS q_all,
             CAST(sum(CAST(term AS DECIMAL(38,6))) AS DOUBLE) AS ssb_part
      FROM terms
    )
    SELECT k, n,
           floor((ssb_part - s_all * s_all / n) / (k - 1)
                 / ((q_all - ssb_part) / (n - k)) * 1e6 + 0.5) / 1e6
             AS f_stat,
           (ssb_part - s_all * s_all / n) / (k - 1)
             / ((q_all - ssb_part) / (n - k)) > 2.372 AS significant
    FROM s
    """,
)
def stats_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE-WAY ANOVA (order totals across the 5 order priorities) —
    the k-group mean-comparison member of the stats family (Welch
    covers 2 groups). Numeric discipline is the chi-square pattern:
    group sums ride integer CENTS (floor(x*100+0.5) of identical
    doubles — exact BIGINT both engines), sums of squares ride
    DECIMAL(38,6) over 2dp-rounded p*p (floor-based half-up rounding —
    identical bits both engines; a raw double->decimal cast rounds
    HALF_UP in Spark but not DuckDB, measured divergent), each
    group's between-term (s_g/100)^2/n_g is 2dp-rounded (6dp would
    push floor()'s LONG range in Spark at 1e13-scale terms) then
    DECIMAL-summed
    (decimal addition is associative — the k-row aggregation order
    cannot flip a bit), and only the final
    F = (SSB/(k-1))/(SSW/(N-k)) is floating point. Significance at
    the F(4, inf) 5% critical value 2.372.

    Scale: ONE groupBy collapses N rows to k cells (map-side
    combined); everything downstream is k-row arithmetic."""
    from bigdata06_spark.queries.qutil import rnd

    o = load_table(spark, "orders", sf_dir).filter(
        F.col("o_totalprice").isNotNull()
    )
    x = o.select(
        F.col("o_orderpriority").alias("g"),
        F.col("o_totalprice").alias("p"),
        F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    cells = x.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("cents").cast("long").alias("s_g"),
        F.sum(
            F.expr(
                "CAST(floor(p * p * 100.0 + 0.5) / 100.0 AS DECIMAL(38,6))"
            )
        )
        .cast("decimal(38,6)")
        .alias("q_g"),
    )
    sd = F.col("s_g").cast("double") / 100.0
    terms = cells.select(
        "n_g", "s_g", "q_g", rnd(sd * sd / F.col("n_g"), 2).alias("term")
    )
    s = terms.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n_g").cast("long").alias("n"),
        (F.sum("s_g").cast("double") / 100.0).alias("s_all"),
        F.sum("q_g").cast("double").alias("q_all"),
        F.sum(F.col("term").cast("decimal(38,6)")).cast("double").alias("ssb_part"),
    )
    ssb = F.col("ssb_part") - F.col("s_all") * F.col("s_all") / F.col("n")
    ssw = F.col("q_all") - F.col("ssb_part")
    f_stat = (ssb / (F.col("k") - 1)) / (ssw / (F.col("n") - F.col("k")))
    return s.select(
        "k", "n", rnd(f_stat, 6).alias("f_stat"), (f_stat > 2.372).alias("significant")
    )


@register(
    "stats_mann_kendall",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ),
    pairs AS (
      SELECT CAST(sum(CASE WHEN b.cents > a.cents THEN 1
                           WHEN b.cents < a.cents THEN -1
                           ELSE 0 END) AS BIGINT) AS s,
             CAST(count(*) AS BIGINT) AS n_pairs
      FROM daily a JOIN daily b ON a.d < b.d
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily)
    SELECT n.n, pairs.s,
           floor((pairs.s - CASE WHEN pairs.s > 0 THEN 1
                                 WHEN pairs.s < 0 THEN -1 ELSE 0 END)
                 / sqrt(n.n * (n.n - 1.0) * (2.0 * n.n + 5.0) / 18.0)
                 * 1e6 + 0.5) / 1e6 AS z,
           abs((pairs.s - CASE WHEN pairs.s > 0 THEN 1
                               WHEN pairs.s < 0 THEN -1 ELSE 0 END)
               / sqrt(n.n * (n.n - 1.0) * (2.0 * n.n + 5.0) / 18.0)) > 1.96
             AS significant
    FROM n CROSS JOIN pairs
    """,
)
def stats_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MANN-KENDALL TREND TEST on daily order revenue — the
    nonparametric is-there-a-monotonic-trend member of the stats
    family (complements `events_changepoint_cusum`, which finds WHERE
    a level shifted; MK says WHETHER the series drifts at all, with no
    distributional assumption). S = Σ_{i<j} sgn(x_j − x_i) over the
    day-ordered series (integer-exact: daily revenue rides summed
    cents); Z applies the standard continuity correction and the
    no-ties variance n(n−1)(2n+5)/18 (revenue cents make exact ties
    measure-zero; any tie contributes 0 to S identically on both
    engines, and the variance convention is pinned here and in the
    oracle).

    Scale: the pairwise relation is DOMAIN-bounded, not data-bounded —
    one groupBy collapses N orders to ≤ |calendar| daily rows (~2.4k
    at every TPC-H SF), and the all-pairs join runs on that bounded
    relation (the `stats_kendall_tau` cells argument). At a truly
    unbounded time domain, S computes from a merge-rank pass instead;
    the day-domain form is the exact reference."""
    from bigdata06_spark.queries.qutil import rnd

    o = load_table(spark, "orders", sf_dir)
    daily = (
        o.groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(
            F.sum(F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
            .cast("long")
            .alias("cents")
        )
        .localCheckpoint(eager=True)  # bounded: one row per calendar day
    )
    a = daily.select(F.col("d").alias("da"), F.col("cents").alias("xa"))
    b = daily.select(F.col("d").alias("db"), F.col("cents").alias("xb"))
    pairs = (
        a.join(b, F.col("da") < F.col("db"))
        .agg(
            F.sum(F.signum(F.col("xb") - F.col("xa")).cast("long"))
            .cast("long")
            .alias("s"),
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
        )
    )
    n = daily.agg(F.count(F.lit(1)).cast("long").alias("n"))
    sc = F.col("s") - F.signum(F.col("s")).cast("long")
    var = (
        F.col("n").cast("double") * (F.col("n") - 1.0) * (2.0 * F.col("n") + 5.0)
        / 18.0
    )
    z = sc.cast("double") / F.sqrt(var)
    return (
        n.crossJoin(F.broadcast(pairs))
        .select("n", "s", rnd(z, 6).alias("z"),
                (F.abs(z) > 1.96).alias("significant"))
    )


@register(
    "stats_theil_sen",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ),
    slopes AS (
      SELECT CAST(b.cents - a.cents AS DOUBLE) / (b.d - a.d) AS slope
      FROM daily a JOIN daily b ON a.d < b.d
    ),
    ranked AS (
      SELECT slope, row_number() OVER (ORDER BY slope) AS rn,
             count(*) OVER () AS np FROM slopes
    )
    SELECT CAST((SELECT count(*) FROM daily) AS BIGINT) AS n_days,
           CAST(max(np) AS BIGINT) AS n_pairs,
           sum(slope) / count(*) AS slope_cents_per_day
    FROM ranked
    WHERE rn IN ((np + 1) // 2, (np + 2) // 2)
    """,
)
def stats_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THEIL-SEN ROBUST TREND SLOPE on daily order revenue — the
    estimator companion to `stats_mann_kendall` (MK answers WHETHER a
    monotone trend exists; Theil-Sen answers HOW STEEP, with a 29%
    breakdown point vs least-squares' zero): the MEDIAN of all
    pairwise slopes (cents_j − cents_i)/(d_j − d_i) over the
    day-ordered series.

    Exactness across engines: daily revenue rides summed integer
    CENTS (the `stats_mann_kendall` trick), each slope is ONE IEEE
    division of exact integers — bit-identical in Spark, DuckDB and
    numpy float64 — and the median is taken by EXPLICIT RANK (rows
    (n+1)//2 and (n+2)//2 of the ascending sort, averaged with the
    same sum/2 expression on both sides), never an engine `median()`
    whose interpolation convention could differ. Equal slope values
    make the rank tiebreak value-irrelevant.

    r11 execution shape (guide §2.1/§5): the DISTRIBUTED part of this
    statistic is the daily cents rollup — one map-side-combined
    aggregate over 100 TB of orders collapsing to ≤ |calendar| rows
    (~2.4k at every TPC-H SF; the fixture calendar is 1992-1998 at
    any SF). The pair/median phase runs on that DOMAIN-BOUNDED
    relation, so it is bounded driver state (the q2p-histogram /
    pocket-count pull class) and is computed in-process: the original
    form built the ~2.9M-row pair relation distributively and ranked
    it through a row_number() over a GLOBAL single-partition sort
    window — all pair rows through one task, 3.5 s at sf0.1 for what
    is 0.2 s of in-memory arithmetic. A two-pass histogram refinement
    (`agg_quantile_twopass`) was measured as the distributed
    alternative: 2.9-4.5 s — every pass pays job+shuffle overhead on
    a relation that fits in one task's memory by construction. The
    day-domain guard FAILS LOUD past 2^12 days (~11 calendar years;
    pairs then exceed the bounded-pull budget): an unbounded time
    domain needs the merge-rank / two-pass-quantile path over the
    distributed slope relation, not a silent driver blowup."""
    import numpy as np

    o = load_table(spark, "orders", sf_dir)
    daily = (
        o.groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(
            F.sum(F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
            .cast("long")
            .alias("cents")
        )
    )
    rows = daily.collect()  # bounded: one row per calendar day
    # guard at 2^12 days (~11 calendar years; TPC-H spans ~2.4k). The
    # r11 2^13 bound was an honest-headroom error (VERDICT r11 #5):
    # np.triu_indices at 8192 days is ~33.5M index pairs x 3 arrays
    # ~ 800 MB of driver RAM — not the "bounded pull" the docstring
    # claims. 4096 days caps the pair buffers at ~200 MB.
    if len(rows) > 4096:
        raise RuntimeError(
            f"stats_theil_sen: {len(rows)} days exceeds the 4096-day "
            "bounded-driver budget; an unbounded time domain needs the "
            "distributed two-pass quantile over the slope relation "
            "(see agg_quantile_twopass)"
        )
    di = np.array([r["d"].toordinal() for r in rows], dtype=np.int64)
    cents = np.array([r["cents"] for r in rows], dtype=np.int64)
    order = np.argsort(di)
    di, cents = di[order], cents[order]
    n = len(di)
    iu, ju = np.triu_indices(n, k=1)
    slopes = (cents[ju] - cents[iu]).astype(np.float64) / (
        di[ju] - di[iu]
    ).astype(np.float64)
    slopes.sort()
    np_pairs = slopes.size
    v1 = slopes[(np_pairs + 1) // 2 - 1]
    v2 = slopes[(np_pairs + 2) // 2 - 1]
    return spark.createDataFrame(
        [(n, int(np_pairs), float((v1 + v2) / 2.0))],
        "n_days long, n_pairs long, slope_cents_per_day double",
    )


@register(
    "stats_levene",
    oracle="""
    WITH x AS (
      SELECT o_orderpriority AS g,
             CAST(floor(o_totalprice + 0.5) AS BIGINT) AS dollars
      FROM orders WHERE o_totalprice IS NOT NULL
    ),
    med AS (SELECT g, quantile_disc(dollars, 0.5) AS m FROM x GROUP BY g),
    z AS (SELECT x.g, abs(x.dollars - med.m) AS z
          FROM x JOIN med USING (g)),
    cells AS (
      SELECT g, CAST(count(*) AS BIGINT) AS n_g,
             CAST(sum(z) AS BIGINT) AS s_g,
             CAST(sum(CAST(z * z AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS q_g
      FROM z GROUP BY g
    ),
    terms AS (
      SELECT n_g, s_g, q_g,
             CAST(floor(CAST(s_g AS DOUBLE) * s_g / n_g + 0.5)
                  AS DECIMAL(38,6)) AS term
      FROM cells
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(n_g) AS BIGINT) AS n,
             CAST(sum(s_g) AS DOUBLE) AS s_all,
             CAST(sum(q_g) AS DOUBLE) AS q_all,
             CAST(sum(term) AS DOUBLE) AS ssb_part
      FROM terms
    )
    SELECT k, n,
           floor(((ssb_part - s_all * s_all / n) / (k - 1))
                 / ((q_all - ssb_part) / (n - k)) * 1e6 + 0.5) / 1e6
             AS w_stat,
           ((ssb_part - s_all * s_all / n) / (k - 1))
             / ((q_all - ssb_part) / (n - k)) > 2.372 AS significant
    FROM s
    """,
)
def stats_levene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEVENE'S TEST, Brown-Forsythe variant (median-centered): are
    the order-total VARIANCES equal across the 5 order priorities —
    the homogeneity-of-variance check that guards `stats_anova_oneway`
    (ANOVA's F assumes it) and the robust member of the spread-
    comparison family. W = ANOVA-F computed on z = |x - median_g|;
    the median (not the mean) centering is what makes it robust to
    heavy tails.

    Numeric discipline: x rides whole DOLLARS (floor(p+0.5) of
    identical parquet doubles — exact BIGINT both engines; coarser
    than ANOVA's cents ON PURPOSE, so the between-group term
    floor(s_g²/n_g + 0.5) stays inside LONG range to ~sf10000 where a
    cents-scale 2dp rounding overflowed at sf0.1-scale magnitudes);
    per-group medians are DISCRETE percentiles (an actual data value,
    integer both engines); z and Σz are exact BIGINT; Σz² rides
    DECIMAL(38,0) (exact, associative); only the final W division is
    floating point. Significance at the F(4, inf) 5% critical value.

    Scale: one groupBy for the medians (exact percentile per group —
    the k-cell buffer path; the mergeable-sketch variant swaps in
    approx_percentile), one broadcast join of k medians, one combine
    to k cells; everything downstream is k-row arithmetic."""
    from bigdata06_spark.queries.qutil import rnd

    o = load_table(spark, "orders", sf_dir).filter(
        F.col("o_totalprice").isNotNull()
    )
    x = o.select(
        F.col("o_orderpriority").alias("g"),
        F.expr("CAST(floor(o_totalprice + 0.5) AS BIGINT)").alias("dollars"),
    )
    med = x.groupBy("g").agg(
        F.expr(
            "percentile_disc(0.5) WITHIN GROUP (ORDER BY dollars)"
        ).alias("m")
    )
    z = x.join(F.broadcast(med), "g").select(
        "g", F.abs(F.col("dollars") - F.col("m")).alias("z")
    )
    cells = z.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("z").cast("long").alias("s_g"),
        F.sum((F.col("z") * F.col("z")).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("q_g"),
    )
    sd = F.col("s_g").cast("double")
    terms = cells.select(
        "n_g", "s_g", "q_g",
        F.floor(sd * sd / F.col("n_g") + 0.5).cast("decimal(38,6)").alias("term"),
    )
    s = terms.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n_g").cast("long").alias("n"),
        F.sum("s_g").cast("double").alias("s_all"),
        F.sum("q_g").cast("double").alias("q_all"),
        F.sum("term").cast("double").alias("ssb_part"),
    )
    ssb = F.col("ssb_part") - F.col("s_all") * F.col("s_all") / F.col("n")
    ssw = F.col("q_all") - F.col("ssb_part")
    w_stat = (ssb / (F.col("k") - 1)) / (ssw / (F.col("n") - F.col("k")))
    return s.select(
        "k", "n", rnd(w_stat, 6).alias("w_stat"),
        (w_stat > 2.372).alias("significant"),
    )


_KCORE_K = 2
_KCORE_MAX_ROUNDS = 16


def _kcore_oracle(k: int = _KCORE_K, rounds: int = _KCORE_MAX_ROUNDS) -> str:
    """Unrolled peeling replay: each round recomputes degrees over the
    surviving subgraph and drops nodes below k. Peeling is MONOTONE —
    once stable, further rounds are identities — so unrolling a FIXED
    `rounds` equals the engine's converge-then-stop fixpoint whenever
    the engine converges within `rounds` (it raises loud otherwise,
    so the two sides can never silently disagree)."""
    ctes = [f"""ed0 AS MATERIALIZED (
      SELECT sa AS src, sb AS dst FROM e
      UNION ALL SELECT sb AS src, sa AS dst FROM e
    )"""]
    for t in range(1, rounds + 1):
        ctes.append(f"""keep{t} AS MATERIALIZED (
      SELECT src AS v FROM ed{t-1} GROUP BY src HAVING count(*) >= {k}
    ),
    ed{t} AS MATERIALIZED (
      SELECT ed.src, ed.dst FROM ed{t-1} ed
        JOIN keep{t} a ON a.v = ed.src
        JOIN keep{t} b ON b.v = ed.dst
    )""")
    return (
        f"WITH {_COSUPPLY_EDGE_CTES},\n    "
        + ",\n    ".join(ctes)
        + f"""
    SELECT src AS s, CAST(count(*) AS BIGINT) AS core_degree
    FROM ed{rounds} GROUP BY src ORDER BY core_degree DESC, s"""
    )


@register("graph_kcore", oracle=_kcore_oracle())
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-CORE decomposition (k=2) of the mutual-top-5 co-supply graph
    — the cohesion member of the graph family (PageRank: centrality,
    components: reachability, triangles: statistics, LPA:
    communities, k-core: the maximal subgraph where every member
    keeps >= k ties — the standard dense-cluster / bot-ring screen;
    k=2 strips every tree/pendant and keeps the cyclic cores, the
    largest k whose core is non-empty at every fixture SF on this
    degree-<=5 mutual graph — measured peeling depth 0/2/5 rounds at
    sf0.001/0.01/0.1 against the 16-round fail-loud cap).
    Iterative peeling: drop every node with degree < k, recompute
    degrees on the survivors, repeat to fixpoint. The engine loops
    with a convergence check and FAILS LOUD past `_KCORE_MAX_ROUNDS`;
    the oracle unrolls exactly that many rounds — peeling is monotone,
    so extra unrolled rounds are identities and the two sides agree
    whenever the engine didn't raise.

    Scale: each round is one groupBy(degree) + two semi-join prunes
    on the degree-bounded edge list (<= 5 per node by construction);
    round count is bounded by the peeling depth, not N. Labels
    localCheckpoint per round (the iterative-lineage policy)."""
    li = load_table(spark, "lineitem", sf_dir)
    e = _cosupply_mutual_edges(li, sf_dir=sf_dir)
    ed = (
        e.select(F.col("sa").alias("src"), F.col("sb").alias("dst"))
        .unionAll(e.select(F.col("sb").alias("src"), F.col("sa").alias("dst")))
        .localCheckpoint(eager=True)
    )
    n_edges = ed.count()
    for _ in range(_KCORE_MAX_ROUNDS):
        keep = (
            ed.groupBy("src")
            .agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") >= _KCORE_K)
            .select(F.col("src").alias("v"))
        )
        ed2 = (
            ed.join(keep.withColumnRenamed("v", "src"), "src", "left_semi")
            .join(keep.withColumnRenamed("v", "dst"), "dst", "left_semi")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        n2 = ed2.count()  # bounded: one scalar per round (control flow)
        ed = ed2
        if n2 == n_edges:
            break
        n_edges = n2
    else:
        raise RuntimeError(
            f"k-core peeling did not converge in {_KCORE_MAX_ROUNDS} rounds; "
            f"raise _KCORE_MAX_ROUNDS (and regenerate the unrolled oracle)"
        )
    return (
        ed.groupBy("src")
        .agg(F.count(F.lit(1)).cast("long").alias("core_degree"))
        .select(F.col("src").alias("s"), "core_degree")
        .orderBy(F.desc("core_degree"), "s")
    )


@register(
    "graph_link_prediction",
    oracle=f"""
    WITH {_COSUPPLY_EDGE_CTES},
    ed AS (SELECT sa AS src, sb AS dst FROM e
           UNION ALL SELECT sb AS src, sa AS dst FROM e),
    cand AS (
      SELECT e1.src AS a, e2.dst AS c, count(*) AS common_neighbors
      FROM ed e1 JOIN ed e2 ON e2.src = e1.dst
      WHERE e1.src < e2.dst
      GROUP BY 1, 2
    ),
    pred AS (
      SELECT cand.a, cand.c, CAST(common_neighbors AS BIGINT)
               AS common_neighbors
      FROM cand
        LEFT JOIN e ON e.sa = cand.a AND e.sb = cand.c
      WHERE e.sa IS NULL
    )
    SELECT a AS s_a, c AS s_b, common_neighbors
    FROM pred ORDER BY common_neighbors DESC, a, c LIMIT 20
    """,
)
def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINK PREDICTION by common-neighbor count (Liben-Nowell &
    Kleinberg's strongest simple baseline) over the mutual-top-5
    co-supply graph — the PREDICTION member of the graph family
    (PageRank: centrality, components: reachability, triangles:
    statistics, LPA: communities, k-core: cohesion, this: which edge
    forms next). Candidates are NON-adjacent pairs at distance 2
    (two hops through a shared neighbor), scored by how many
    neighbors they share; top-20 with full (score desc, pair)
    tie-break.

    Scale: the two-hop join fans out ≤ deg² per node on the
    DEGREE-BOUNDED edge list (deg ≤ 5 by the mutual-top-5
    construction + the r10 hot-part cap underneath), so candidates
    are ≤ 25·|nodes| — linear in the graph, never |nodes|². The
    anti-join against existing edges and the global top-20
    (TakeOrderedAndProject) are both candidate-sized.

    At the sf0.001 fixture the tiny mutual graph has no non-adjacent
    distance-2 pairs and the TRUE answer is empty (both engines agree;
    verified) — the driver's non-vacuity gate runs at sf0.01, where
    the answer is 20 rows."""
    li = load_table(spark, "lineitem", sf_dir)
    e = _cosupply_mutual_edges(li, sf_dir=sf_dir)
    ed = e.select(F.col("sa").alias("src"), F.col("sb").alias("dst")).unionAll(
        e.select(F.col("sb").alias("src"), F.col("sa").alias("dst"))
    )
    cand = (
        ed.alias("e1")
        .join(ed.alias("e2"), F.expr("e2.src = e1.dst"))
        .filter(F.expr("e1.src < e2.dst"))
        .groupBy(
            F.col("e1.src").alias("a"), F.col("e2.dst").alias("c")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("common_neighbors"))
    )
    pred = cand.join(
        e,
        (cand["a"] == e["sa"]) & (cand["c"] == e["sb"]),
        "left_anti",
    )
    return (
        pred.select(
            F.col("a").alias("s_a"), F.col("c").alias("s_b"),
            "common_neighbors",
        )
        .orderBy(F.desc("common_neighbors"), "s_a", "s_b")
        .limit(20)
    )


@register(
    "events_funnel_time_to_convert",
    oracle="""
    WITH s AS (
      SELECT user_id, min(epoch_us(ts)) AS t_sign
      FROM events WHERE event_type = 'signup' GROUP BY 1
    ),
    p AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS t_conv
      FROM events e JOIN s ON s.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s.t_sign
      GROUP BY 1
    ),
    tt AS (
      SELECT s.user_id,
             strftime(make_timestamp(s.t_sign), '%Y-%m') AS cohort,
             CAST((p.t_conv - s.t_sign) // 1000000 AS BIGINT) AS tt_sec
      FROM s LEFT JOIN p USING (user_id)
    )
    SELECT cohort,
           CAST(count(*) AS BIGINT) AS n_signed,
           CAST(count(tt_sec) AS BIGINT) AS n_converted,
           floor(CAST(count(tt_sec) AS DOUBLE) / count(*) * 1e6 + 0.5) / 1e6
             AS conv_rate,
           CAST(quantile_disc(tt_sec, 0.5) AS BIGINT) AS median_tt_sec,
           CAST(quantile_disc(tt_sec, 0.9) AS BIGINT) AS p90_tt_sec
    FROM tt GROUP BY cohort ORDER BY cohort
    """,
)
def events_funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-TO-CONVERT per signup cohort — the funnel family's latency
    member (`events_funnel_steps` counts WHO converts; this measures
    HOW FAST): each user's first signup anchors their cohort month,
    the first strictly-later purchase closes the conversion, and the
    per-cohort rollup reports conversion rate plus discrete median/p90
    latency (percentile_disc — an actual data value, bit-exact cross-
    engine; non-converters count in the denominator and NULL out of
    the latency percentiles on both engines identically). Latencies
    are integer epoch-microsecond differences floored to seconds.

    Scale: two min-aggregates keyed on user_id (map-side combined),
    one user-keyed join, then a cohort-keyed rollup — the exact
    percentile buffers per cohort; the scale path at extreme cohort
    sizes is the mergeable sketch (`agg_approx_percentile`'s pattern),
    kept exact here as its reference."""
    ev = load_table(spark, "events", sf_dir)
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(epoch_us(F.col("ts"))).alias("t_sign"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", epoch_us(F.col("ts")).alias("t_ev"))
        .join(s, "user_id")
        .filter(F.col("t_ev") > F.col("t_sign"))
        .groupBy("user_id")
        .agg(F.min("t_ev").alias("t_conv"))
    )
    tt = s.join(p, "user_id", "left").select(
        F.date_format(
            (F.col("t_sign") / 1_000_000).cast("timestamp"), "yyyy-MM"
        ).alias("cohort"),
        ((F.col("t_conv") - F.col("t_sign")) / 1_000_000)
        .cast("long")
        .alias("tt_sec"),
    )
    from bigdata06_spark.queries.qutil import rnd

    return (
        tt.groupBy("cohort")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_signed"),
            F.count("tt_sec").cast("long").alias("n_converted"),
            rnd(
                F.count("tt_sec").cast("double") / F.count(F.lit(1)), 6
            ).alias("conv_rate"),
            F.expr(
                "percentile_disc(0.5) WITHIN GROUP (ORDER BY tt_sec)"
            ).cast("long").alias("median_tt_sec"),  # Spark's disc
            # percentile returns DOUBLE even on integer input — pin
            F.expr(
                "percentile_disc(0.9) WITHIN GROUP (ORDER BY tt_sec)"
            ).cast("long").alias("p90_tt_sec"),
        )
        .orderBy("cohort")
    )
