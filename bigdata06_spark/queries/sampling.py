"""Deterministic sampling operators — the training-data-pipeline
subsetting surface (corpus down-sampling, per-class balancing).

Cross-engine note: seeded RNG sampling (`df.sample`, `TABLESAMPLE`)
can never hash-match another engine (different generators), so the
oracle-checked queries use the two standard DETERMINISTIC designs —
systematic (key-modulus) and stratified-by-rank — which are also what
you want at 100 TB: reproducible across runs, re-runnable per
partition, no RNG state. `df.sample` is still exercised (rows-only
semantics) in the unit tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata06_spark.catalog import load_table
from bigdata06_spark.queries import register


@register(
    "sample_systematic",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders WHERE o_orderkey % 20 = 0
    """,
)
def sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic 1-in-20 sample by key modulus: deterministic,
    partition-local (no shuffle), and stable under re-runs/appends —
    the properties RNG sampling lacks. The predicate stays in the scan
    stage (evaluated post-decode but pre-shuffle; narrow)."""
    o = load_table(spark, "orders", sf_dir)
    return o.filter(F.col("o_orderkey") % 20 == 0).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


@register(
    "sample_stratified",
    oracle="""
    SELECT o_orderstatus, o_orderkey, o_totalprice
    FROM (
      SELECT o_orderstatus, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 50
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified fixed-quota sample: exactly min(50, |stratum|) orders
    per status, chosen by deterministic rank (smallest keys) — per-class
    balancing for training sets. One shuffle on the stratum key. At
    100 TB with few strata, the per-stratum window sort is the
    bottleneck → swap rank for `o_orderkey % k = 0` within strata
    (systematic-within-stratum) to stay sort-free."""
    o = load_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_orderstatus").orderBy("o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 50)
        .select("o_orderstatus", "o_orderkey", "o_totalprice")
    )


@register(
    "sample_weighted",
    oracle="""
    SELECT doc_id, n_chars,
           CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) AS DOUBLE)
             / n_chars AS priority
    FROM documents
    ORDER BY priority ASC, doc_id ASC
    LIMIT 100
    """,
)
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sample (priority sampling, Duffield-
    Lund-Thorup style): each doc gets priority u/w where u is a
    32-bit hash-uniform of its id and w its weight (n_chars — the
    domain-upweighting knob in corpus mixing); keep the k smallest.
    Inclusion odds scale with weight, yet the draw is a pure function
    of the stable id: re-runs, retries, and late shards agree with no
    RNG state. Exact cross-engine: u is integer-exact from the md5 hex
    prefix, and one double division of exact integers is the same IEEE
    op on both engines; ties (impossible short of hash collision)
    break on doc_id. Plan: single scan + TakeOrderedAndProject — no
    shuffle at any corpus size."""
    d = load_table(spark, "documents", sf_dir)
    u = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast("double")
    return (
        d.select("doc_id", "n_chars", (u / F.col("n_chars")).alias("priority"))
        .orderBy(F.asc("priority"), F.asc("doc_id"))
        .limit(100)
    )


@register(
    "sample_bernoulli_certified",
    oracle="""
    SELECT count(*) AS n_total, TRUE AS sample_in_bound
    FROM documents
    """,
)
def sample_bernoulli_certified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sampling (`df.sample(fraction, seed)`) — the
    engine-native random subset. Which rows land in the sample is
    engine-specific (XORShift per partition), so rows can't
    hash-match an oracle; the driver-checkable contract is the
    self-certifying pattern used for sketches: emit the exact
    population count plus a boolean that the sample size landed within
    5σ of n·f (binomial σ = √(n·f·(1-f)), miss odds ~3e-7 for a
    correct sampler). A broken sampler (wrong fraction, seed drift,
    double-sampling) turns the row red."""
    d = load_table(spark, "documents", sf_dir)
    f_ = 0.2
    total = d.agg(F.count(F.lit(1)).alias("n_total"))
    samp = d.sample(fraction=f_, seed=42).agg(F.count(F.lit(1)).alias("n_samp"))
    return total.crossJoin(samp).select(
        "n_total",
        (
            F.abs(F.col("n_samp") - F.col("n_total") * f_)
            <= 5.0 * F.sqrt(F.col("n_total") * f_ * (1.0 - f_))
        ).alias("sample_in_bound"),
    )
