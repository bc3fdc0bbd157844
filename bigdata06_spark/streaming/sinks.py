"""Streaming sinks beyond the memory-table test harness: the
`foreachBatch` pattern every production pipeline ends in.

Structured Streaming's file sinks only append; real pipelines need
arbitrary batch-side writes (upserts, multi-table fan-out, JDBC) with
EXACTLY-ONCE effects. The engine's contract for that is
`foreach_batch_parquet`: each micro-batch lands in a
`batch_id=<epoch>` partition directory written with dynamic partition
overwrite, so a replayed epoch (post-crash restart re-delivers the
last uncommitted batch with the SAME batch_id) overwrites its own
partition instead of duplicating rows — idempotence makes at-least-once
delivery exactly-once on disk. The checkpoint tracks which epochs
committed; the batch_id column doubles as the lineage/audit key.

Scale: the writer is a normal batch write per epoch — partition count,
file sizing, and compaction follow the batch-sink rules; nothing here
serializes through the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def foreach_batch_parquet(result: DataFrame, path: str, checkpoint: str):
    """Drain a streaming DataFrame via foreachBatch into parquet
    partitioned by batch_id, idempotently (dynamic partition
    overwrite). Returns the completed StreamingQuery (availableNow —
    processes everything available, then stops; a live pipeline drops
    the trigger)."""
    spark = result.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .parquet(path)
        )

    q = (
        result.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def foreach_batch_lakehouse_merge(result: "DataFrame", path: str, key: str,
                                  checkpoint: str, op_col: str | None = None,
                                  seq_col: str | None = None,
                                  auto_compact_files: int | None = None):
    """Streaming CDC apply: each micro-batch UPSERTs into a versioned
    lakehouse table (`bigdata06_spark/lakehouse.py`) — existing keys
    take the batch's column values (COW rewrite of overlapping files
    only), new keys append as fresh files. One table version per
    micro-batch, so the table's log doubles as the stream's apply
    history, and `read_version` time-travels through the ingest.
    Every merge carries `txn=(checkpoint, batch_id)` — the table's
    idempotent-transaction ledger (Delta's txnAppId/txnVersion) — so
    a REPLAYED batch (post-crash restart re-delivers the last
    uncommitted epoch) is SKIPPED outright: true exactly-once, not
    just a no-op-shaped re-apply, and no spurious table version.

    A micro-batch may carry SEVERAL ops for one key (d then u, u then
    u): applying them as independent delete/upsert legs is wrong —
    the legs run against the same pre-batch snapshot, so a d→u pair
    makes the row vanish and a u→u pair trips merge's duplicate-key
    guard. `auto_compact_files=N` (Delta's autoCompact) runs one
    OPTIMIZE version whenever a batch leaves the table at ≥ N live
    files — the valve that keeps a one-file-per-micro-batch ingest
    from accumulating thousands of small files. With `seq_col` (a CDC sequence/offset — every real
    changelog has one) each batch is pre-reduced to the LAST op per
    key, which is the net effect of applying the ops in order against
    a snapshot-isolated table. Without `seq_col` there is no defined
    order, so multiple ops for one key in a batch fail loudly rather
    than guessing."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from bigdata06_spark import lakehouse as LH

    def apply_batch(batch_df: "DataFrame", batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        _apply_rows(batch_df, batch_id)
        if auto_compact_files is not None:
            LH.maybe_compact(batch_df.sparkSession, path, key,
                             max_files=auto_compact_files)

    def _apply_rows(batch_df: "DataFrame", batch_id: int) -> None:
        # the seq_col reduction applies in BOTH modes: a plain-upsert
        # stream (op_col=None) with several rows per key in one batch
        # has the same in-batch ordering problem as a changelog, and
        # seq_col must never land in the table as a data column
        if seq_col is not None:
            w = Window.partitionBy(key).orderBy(F.col(seq_col).desc())
            batch_df = (
                batch_df.withColumn("_cdc_rn", F.row_number().over(w))
                .filter(F.col("_cdc_rn") == 1)
                .drop("_cdc_rn", seq_col)
            )
        if op_col is None:
            LH.merge(
                batch_df.sparkSession, path, key,
                updates=batch_df, inserts=batch_df,
                txn=(checkpoint, batch_id),
            )
            return
        if seq_col is None:
            dup = (
                batch_df.groupBy(key).count().filter(F.col("count") > 1).limit(1).count()
            )
            if dup:
                raise ValueError(
                    "micro-batch contains multiple ops for one key and no "
                    "seq_col was given to order them; pass seq_col (CDC "
                    "sequence/offset) so the last op per key wins"
                )
        # op-column changelog (Debezium-style): 'd' rows delete by
        # key, everything else upserts; the op column itself never
        # lands in the table
        deletes = batch_df.filter(F.col(op_col) == "d").select(key)
        upserts = batch_df.filter(F.col(op_col) != "d").drop(op_col)
        LH.merge(
            batch_df.sparkSession, path, key,
            updates=upserts if not upserts.isEmpty() else None,
            inserts=upserts if not upserts.isEmpty() else None,
            delete_keys=deletes if not deletes.isEmpty() else None,
            txn=(checkpoint, batch_id),
        )

    return (
        result.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
