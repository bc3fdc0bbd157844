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
