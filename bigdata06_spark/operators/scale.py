"""Scale-hygiene operators (SURVEY.md §4.2, §7 M5): the partitioning
tools that keep the 100 TB plan healthy — bucketing for repeated
co-located joins, salting for skewed join keys.

These complement what AQE already does (broadcast selection, skew-join
splitting, partition coalescing — all ON in session.py): bucketing
removes the shuffle AQE can't (a sort-merge join between two large
tables that are re-joined on the same key every run), and salting
handles skew in aggregations/joins where AQE's post-shuffle splitting
is too late or disabled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rebalance_for_amplification(df: DataFrame, *keys: str) -> DataFrame:
    """Give a compute-amplifying stage (explode ×100s, wide aggregates,
    per-row HOF transforms) enough partitions to use every core.

    Scan parallelism follows input SPLITS, but shingling/exploding a
    document multiplies work ~500× past the scan — a corpus that fits
    one parquet row group (small files, early pipeline stages) runs its
    whole dedup signature job on ONE core unless we repartition first.
    This helper hash-repartitions on `keys` to the cluster's default
    parallelism, but only when the incoming plan has fewer partitions
    than that — at 100 TB the scan already yields thousands of splits
    and this is a no-op (no exchange added). Partitioning by the
    downstream groupBy key also lets the post-explode aggregation reuse
    the exchange instead of shuffling the amplified rows.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    try:
        current = df.rdd.getNumPartitions()
    except Exception:  # noqa: BLE001 — un-plannable input; be safe, rebalance
        current = 1
    if current >= target:
        return df
    if keys:
        return df.repartition(target, *[F.col(k) for k in keys])
    return df.repartition(target)


def write_bucketed(df: DataFrame, name: str, path: str, key: str, n_buckets: int = 16) -> None:
    """Persist `df` bucketed (and sorted) by `key`: each bucket file
    holds one hash-slice of the key space. Two tables bucketed the same
    way join with ZERO shuffle (and zero sort, since bucket files are
    sorted) — the physical layout replaces the per-query exchange.
    The table is external (explicit path) so tests and pipelines
    control storage."""
    (
        df.write.format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(name)
    )


def salted_join(big: DataFrame, small: DataFrame, key: str, n_salts: int = 8,
                how: str = "inner") -> DataFrame:
    """Skew-resilient equi-join: the big (skewed) side gets a
    deterministic salt in [0, n_salts) derived from its full row hash;
    the small side is replicated n_salts times — so one hot key's rows
    spread over n_salts reducers instead of one straggler task.

    Trade-off: small side shuffles n_salts× its size. Use when a hot
    key dominates (e.g. one customer with 1% of a 100 TB fact) and the
    small side is modest but above the broadcast threshold; below the
    threshold, `F.broadcast` is strictly better (no shuffle at all).
    Result is identical to the unsalted join for any join type where
    the salted side is preserved (inner/left with big on the left).

    The salt comes from a HASH of the row's position
    (xxhash64(monotonically_increasing_id())), not its content:
    duplicate-heavy hot keys (exact-repeat rows) would all hash to one
    salt under a content hash, leaving the skew unsplit. Hashing the
    position (rather than `pmod(position, n)`) matters too: a hot key
    whose rows occur in a positional PATTERN (every 2nd row — think
    interleaved event types) would otherwise land on the pattern's
    stride of salts only, re-concentrating the skew (measured: a
    50%-hot key at stride 2 spread over 4 of 8 salts). The hash
    decorrelates salt from any arrival pattern."""
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)).alias("_salt")
    b = big.select("*", salt)
    s = small.withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    return b.join(s, [key, "_salt"], how).drop("_salt")


def salted_agg(df: DataFrame, key: str, aggs: dict[str, str], n_salts: int = 8) -> DataFrame:
    """Skew-resilient two-phase aggregation: partial-aggregate on
    (key, salt) — spreading one hot key over n_salts reducers — then
    combine the partials per key.

    When it matters: map-side partial aggregation already collapses
    uniform keys, but a key owning a large share of ALL partitions
    still funnels #tasks partial rows into one reducer whose combine
    is single-threaded; at 10⁶ tasks that final combine is the
    straggler. The salt phase caps any reducer's input at
    #tasks/n_salts rows per hot key.

    `aggs`: {column: 'sum'|'count'|'min'|'max'} — the re-combinable
    aggregates (avg = sum+count composed by the caller). `count` is
    COUNT(col) — non-null rows, matching the per-column `{c}_count`
    alias; pass a non-nullable column for COUNT(*) semantics. Result is
    row-identical to the direct groupBy (test-pinned).

    Hashed-positional salt (not a content hash): exact-duplicate rows
    of a hot key must spread across salts, and hashing the row's
    columns would send them all to one reducer; hashing the POSITION
    also decorrelates the salt from positional arrival patterns (see
    `salted_join`)."""
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)).alias("_salt")
    first = {"sum": F.sum, "count": lambda c: F.count(F.col(c)), "min": F.min, "max": F.max}
    second = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    partial = (
        df.select("*", salt)
        .groupBy(key, "_salt")
        .agg(*[first[fn](c).alias(f"_p_{c}_{fn}") for c, fn in aggs.items()])
    )
    return partial.groupBy(key).agg(
        *[second[fn](f"_p_{c}_{fn}").alias(f"{c}_{fn}") for c, fn in aggs.items()]
    )
