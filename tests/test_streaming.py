"""Streaming batch-equivalence tests (SURVEY.md §5.2): the events table
replayed through Structured Streaming must equal the same computation
done in batch on the same rows."""

from pyspark.sql import functions as F

from bigdata06_spark.catalog import load_table
from bigdata06_spark.streaming import ops as SO
from bigdata06_spark.streaming.stateful import running_user_totals


def test_tumbling_equals_batch(spark, sf_dir):
    streamed = SO.run_to_table(SO.tumbling_counts(SO.stream_events(spark, sf_dir)), "complete")
    batch = (
        load_table(spark, "events", sf_dir)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(25,6)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )
    assert sorted(map(tuple, streamed.collect())) == sorted(map(tuple, batch.collect()))


def test_session_window_equals_batch_sessionization(spark, sf_dir):
    streamed = SO.run_to_table(SO.session_windows(SO.stream_events(spark, sf_dir)), "complete")
    # independent batch check: number of sessions == number of >30min gaps + users
    e = load_table(spark, "events", sf_dir)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    from bigdata06_spark.queries.qutil import epoch_us

    gaps = e.withColumn(
        "gap_us", epoch_us(F.col("ts")) - epoch_us(F.lag("ts").over(w))
    )
    n_sessions_batch = gaps.filter(
        F.col("gap_us").isNull() | (F.col("gap_us") > 1_800_000_000)
    ).count()
    assert streamed.count() == n_sessions_batch
    assert streamed.agg(F.sum("n_events")).first()[0] == e.count()


def test_stateful_running_totals_consistency(spark, sf_dir):
    out = SO.run_to_table(running_user_totals(SO.stream_events(spark, sf_dir)), "update")
    e = load_table(spark, "events", sf_dir)
    # final per-user counts must equal the batch counts
    final = (
        out.groupBy("user_id").agg(F.max("n_events").alias("n")).orderBy("user_id").collect()
    )
    batch = (
        e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).orderBy("user_id").collect()
    )
    assert [(r.user_id, r.n) for r in final] == [(r.user_id, r.n) for r in batch]


def test_watermark_append_drops_open_windows(spark, sf_dir):
    streamed = SO.run_to_table(
        SO.watermarked_tumbling(SO.stream_events(spark, sf_dir)), "append"
    )
    batch_windows = (
        load_table(spark, "events", sf_dir)
        .select(F.window("ts", "1 hour").alias("w"))
        .select(F.col("w.start"))
        .distinct()
        .count()
    )
    # append mode emits only watermark-closed windows: strictly fewer or
    # equal, and nonzero (the replay spans ~30 days)
    n = streamed.select("window_start").distinct().count()
    assert 0 < n <= batch_windows


def test_foreach_batch_parquet_sink(spark, sf_dir, tmp_path):
    """foreachBatch sink: drain the event stream into parquet via the
    per-microbatch callback — the escape hatch for sinks Structured
    Streaming lacks natively (JDBC upserts, dual writes). Total rows
    written across batches must equal the batch-mode count."""
    import glob

    from bigdata06_spark.streaming import ops as SO

    out_dir = str(tmp_path / "fb_out")
    ev = SO.stream_events(spark, sf_dir)

    def write_batch(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        ev.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", str(tmp_path / "fb_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert glob.glob(out_dir + "/part-*"), "no files written"
    from bigdata06_spark.catalog import load_table

    n_batchmode = load_table(spark, "events", sf_dir).count()
    assert spark.read.parquet(out_dir).count() == n_batchmode


def test_foreach_batch_idempotent_replay(spark, sf_dir, tmp_path):
    """The production sink contract (streaming/sinks.py): batches land
    in batch_id partitions with dynamic partition overwrite, so a
    replayed epoch (same batch_id — the crash-recovery redelivery case)
    overwrites its own partition instead of appending duplicates."""
    from pyspark.sql import functions as F

    from bigdata06_spark.streaming import ops as SO
    from bigdata06_spark.streaming.sinks import foreach_batch_parquet

    out = str(tmp_path / "fb2_out")
    agg = SO.tumbling_counts(
        SO.as_event_time(SO.stream_events(spark, sf_dir)).withWatermark("ts", "1 hour")
    )
    foreach_batch_parquet(
        agg.select(F.col("window_start").cast("string").alias("ws"), "event_type", "n"),
        out,
        str(tmp_path / "fb2_ckpt"),
    )
    first = spark.read.parquet(out)
    n1 = first.count()
    batch_ids = [r.batch_id for r in first.select("batch_id").distinct().collect()]
    assert n1 > 0 and len(batch_ids) >= 1

    # simulate the redelivery: rewrite one epoch's rows under its
    # existing batch_id — dynamic overwrite must replace, not append
    replay = first.filter(F.col("batch_id") == batch_ids[0])
    replay.write.mode("overwrite").partitionBy("batch_id").parquet(out)
    assert spark.read.parquet(out).count() == n1


def test_page_stream_source_resumes_from_checkpoint(spark, tmp_path):
    """The custom streaming data source (S5 pagination as streaming
    offsets): each availableNow run drains one page; re-running with
    the SAME checkpoint resumes from the committed cursor — the
    incremental-API-sync contract. Three runs cover the 120-item
    collection exactly once; a fourth adds nothing."""
    from bigdata06_spark.sources import spotify_datasource as DS

    DS.register_stream(spark)
    out, ckpt = str(tmp_path / "pages_out"), str(tmp_path / "pages_ckpt")

    def run_once():
        q = (
            spark.readStream.format("spotify_pages")
            .option("page_size", "50")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    counts = []
    for _ in range(4):
        run_once()
        counts.append(spark.read.parquet(out).count())
    assert counts == [50, 100, 120, 120]
    final = spark.read.parquet(out)
    assert final.select("offset").distinct().count() == 120  # no re-fetch overlap
    assert final.filter("popularity <> (offset * 13) % 101").count() == 0


def test_transform_with_state_user_peaks(spark, sf_dir):
    """transformWithStateInPandas (Spark 4 stateful API): per-user
    count + running max with a typed ValueState handle on RocksDB.
    Requires protobuf (the API's state wire format), absent in this
    container — the test activates wherever it exists; the construction
    path (plan building, schema validation) runs unconditionally."""
    import pytest

    from bigdata06_spark.streaming import ops as SO
    from bigdata06_spark.streaming.stateful import user_peak_totals

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    # plan construction + analysis must succeed regardless of protobuf
    plan = user_peak_totals(SO.stream_events(spark, sf_dir))
    assert plan.schema.simpleString() == (
        "struct<user_id:bigint,n_events:bigint,max_value:double>"
    )
    try:
        import google.protobuf.descriptor  # noqa: F401
    except ImportError:
        pytest.skip("protobuf not available: transformWithState cannot execute here")

    out = SO.run_to_table(plan, "update")
    final = {r.user_id: (r.n_events, r.max_value) for r in out.collect()}
    e = load_table(spark, "events", sf_dir)
    batch = {
        r.user_id: (r.n, r.mx)
        for r in e.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("value").alias("mx"))
        .collect()
    }
    assert final == batch


def test_state_store_reader_inspects_checkpoint(spark, sf_dir, tmp_path):
    """The state data source (Spark 4 ops surface): a finished query's
    checkpoint opened RELATIONALLY — `state-metadata` lists the
    stateful operators, `statestore` exposes key/value state rows.
    The inspected state must equal the batch-mode per-user counts:
    state debugging without replaying the stream."""
    from bigdata06_spark.streaming import ops as SO

    ev = SO.as_event_time(SO.stream_events(spark, sf_dir)).withWatermark("ts", "1 hour")
    agg = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    ckpt = str(tmp_path / "ss_ckpt")
    q = (
        agg.writeStream.outputMode("update")
        .format("memory")
        .queryName("ss_inspect")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    meta = spark.read.format("state-metadata").load(ckpt)
    assert "stateStoreAggregate" in {r.operatorName for r in meta.collect()} or meta.count() >= 1

    state = spark.read.format("statestore").load(ckpt)
    got = {r.key.user_id: r.value[0] for r in state.collect()}
    batch = {
        r.user_id: r.n
        for r in load_table(spark, "events", sf_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == batch


def test_agg_state_recovers_across_restart(spark, sf_dir, tmp_path):
    """Exactly-once across a STOP/RESTART: half the events land, the
    query runs to completion and stops; the rest land, and a brand-new
    query with the SAME checkpoint continues — the final aggregate
    equals the batch answer over all rows (state restored, first half
    neither lost nor double-counted). This is the recovery contract a
    24/7 production stream runs on."""
    ev = load_table(spark, "events", sf_dir).select("event_id", "ts", "event_type", "value")
    first = ev.filter(F.col("event_id") % 2 == 0)
    second = ev.filter(F.col("event_id") % 2 == 1)
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    first.write.parquet(src)

    def run(name):
        q = (
            spark.readStream.schema(ev.schema).parquet(src)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("value").cast("decimal(25,6)")).cast("double").alias("total"),
            )
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return {r.event_type: (r.n, r.total) for r in spark.table(name).collect()}

    got1 = run("ckpt_restart_run1")
    exp1 = {
        r.event_type: (r.n, r.total)
        for r in first.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(25,6)")).cast("double").alias("total"),
        )
        .collect()
    }
    assert got1 == exp1

    second.write.mode("append").parquet(src)
    got2 = run("ckpt_restart_run2")
    exp2 = {
        r.event_type: (r.n, r.total)
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(25,6)")).cast("double").alias("total"),
        )
        .collect()
    }
    assert got2 == exp2


def test_rocksdb_state_store_equals_batch(spark, sf_dir):
    """The RocksDB state-store provider (the LARGE-state path: state
    spills to local disk instead of living on the JVM heap — how a
    100 TB stream keeps millions of windows without OOM) must produce
    byte-identical aggregates to the default HDFS-backed provider."""
    key = "spark.sql.streaming.stateStore.providerClass"
    saved = spark.conf.get(key, None)
    try:
        spark.conf.set(
            key,
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        streamed = SO.run_to_table(
            SO.tumbling_counts(SO.stream_events(spark, sf_dir)), "complete"
        )
        batch = (
            load_table(spark, "events", sf_dir)
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("value").cast("decimal(25,6)")).cast("double").alias("total_value"),
            )
            .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
        )
        assert sorted(map(tuple, streamed.collect())) == sorted(map(tuple, batch.collect()))
    finally:
        if saved is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, saved)


def test_dynamic_gap_session_stream_equals_batch(spark, sf_dir):
    """Dynamic-gap session windows (per-event gap expression) must
    produce the same merged sessions whether the events arrive as a
    stream (state-store merge) or a batch (sort-based merge) — the
    equivalence that licenses prototyping session logic in batch and
    deploying it streaming."""
    gap = F.when(F.col("event_type") == "error", F.lit("5 minutes")).otherwise(
        F.lit("30 minutes")
    )

    def sessions(df):
        return df.groupBy(F.session_window(F.col("ts"), gap).alias("sw"), "user_id").agg(
            F.count(F.lit(1)).alias("n_events")
        ).select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )

    streamed = SO.run_to_table(sessions(SO.stream_events(spark, sf_dir)), "complete")
    batch = sessions(load_table(spark, "events", sf_dir))
    assert sorted(map(tuple, streamed.collect())) == sorted(map(tuple, batch.collect()))


def test_tws_event_time_timers_fire(spark, sf_dir):
    """transformWithStateInPandas EVENT-TIME TIMERS: each user's
    processor registers a timer at its first-seen event time; when the
    watermark passes it (end of the availableNow replay), Spark runs
    the timer batch and handleExpiredTimer emits a closure row per
    user. Asserts the timer path actually executes: every user whose
    first event precedes the final watermark emits exactly one
    timer row. Completes the TWS surface (typed state ×3 + timers)."""
    import pandas as pd

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import LongType, StructField, StructType

    from bigdata06_spark.compat import activate_protobuf_for_session
    from bigdata06_spark.streaming import ops as SO

    activate_protobuf_for_session(spark)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )

    class FirstSeenTimer(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._armed = handle.getValueState(
                "armed", StructType([StructField("ts_ms", LongType())])
            )

        def handleInputRows(self, key, rows, timerValues):
            for pdf in rows:
                if not self._armed.exists():
                    first_ms = int(pdf["ts"].min().value // 1_000_000)
                    self._handle.registerTimer(first_ms)
                    self._armed.update((first_ms,))
            return iter(())

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "fired_at_ms": [expiredTimerInfo.getExpiryTimeInMs()],
                }
            )

        def close(self) -> None:
            pass

    ev = SO.as_event_time(SO.stream_events(spark, sf_dir)).withWatermark("ts", "0 seconds")
    plan = ev.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=FirstSeenTimer(),
        outputStructType="user_id long, fired_at_ms long",
        outputMode="Append",
        timeMode="EventTime",
    )
    out = SO.run_to_table(plan, "append")
    fired = {r.user_id for r in out.collect()}
    batch = load_table(spark, "events", sf_dir)
    users = {r.user_id for r in batch.select("user_id").distinct().collect()}
    max_ts = batch.agg(F.max("ts")).first()[0]
    expected = {
        r.user_id
        for r in batch.groupBy("user_id").agg(F.min("ts").alias("first_ts")).collect()
        if r.first_ts < max_ts
    }
    assert fired, "no timers fired"
    assert fired == expected, (len(fired), len(expected), len(users))


def test_tws_initial_state_seeding(spark, sf_dir):
    """transformWithStateInPandas INITIAL STATE: a batch relation
    seeds per-key state before the first micro-batch (the warm-start
    path for migrating a batch-computed table into streaming state).
    Seed = 1000 per user for even users; final per-user count must be
    seed + stream count."""
    import pandas as pd

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import LongType, StructField, StructType

    from bigdata06_spark.compat import activate_protobuf_for_session
    from bigdata06_spark.streaming import ops as SO

    activate_protobuf_for_session(spark)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )

    class SeededCount(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._n = handle.getValueState("n", StructType([StructField("n", LongType())]))

        def handleInitialState(self, key, initialState, timerValues) -> None:
            self._n.update((int(initialState["seed"].iloc[0]),))

        def handleInputRows(self, key, rows, timerValues):
            n = self._n.get()[0] if self._n.exists() else 0
            for pdf in rows:
                n += len(pdf)
            self._n.update((n,))
            yield pd.DataFrame({"user_id": [key[0]], "n": [n]})

        def close(self) -> None:
            pass

    batch = load_table(spark, "events", sf_dir)
    seeds = (
        batch.select("user_id").distinct()
        .filter(F.col("user_id") % 2 == 0)
        .withColumn("seed", F.lit(1000).cast("long"))
        .groupBy("user_id")
    )
    plan = SO.stream_events(spark, sf_dir).groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=SeededCount(),
        outputStructType="user_id long, n long",
        outputMode="Update",
        timeMode="None",
        initialState=seeds,
    )
    out = SO.run_to_table(plan, "update")
    final = {
        r.user_id: r.n
        for r in out.groupBy("user_id").agg(F.max("n").alias("n")).collect()
    }
    expected = {
        r.user_id: r.n + (1000 if r.user_id % 2 == 0 else 0)
        for r in batch.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert final == expected


def test_foreach_batch_lakehouse_cdc_upsert(spark, sf_dir, tmp_path):
    """Streaming CDC apply: a changelog stream upserts into the
    versioned lakehouse table micro-batch by micro-batch (foreachBatch
    → COW merge; updates rewrite overlapping files, new keys append).
    Two-file source + maxFilesPerTrigger=1 forces ≥2 real increments;
    the final snapshot must equal the batch-applied expectation and
    the log must hold one version per applied batch."""
    from bigdata06_spark import lakehouse as LH
    from bigdata06_spark.catalog import load_table
    from bigdata06_spark.streaming.sinks import foreach_batch_lakehouse_merge

    o = load_table(spark, "orders", sf_dir)
    key = "o_orderkey"
    base = o.filter(F.col(key) % 3 != 0)
    table = str(tmp_path / "cdc_table")
    LH.table_init(base, table, key, n_files=4)

    updates = (
        o.filter((F.col(key) % 3 != 0) & (F.col(key) % 5 == 0))
        .withColumn("o_totalprice", F.lit(999.0))
    )
    inserts = o.filter(F.col(key) % 3 == 0)
    changes_dir = str(tmp_path / "changes")
    updates.unionByName(inserts).repartition(2).write.parquet(changes_dir)

    stream = (
        spark.readStream.schema(o.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(changes_dir)
    )
    q = foreach_batch_lakehouse_merge(stream, table, key, str(tmp_path / "ckpt"))
    q.awaitTermination(180)

    assert LH.current_version(table) >= 2  # v0 init + ≥2 batch merges
    got = sorted(map(tuple, LH.read_version(spark, table, LH.current_version(table)).collect()))
    expected = sorted(
        map(
            tuple,
            o.withColumn(
                "o_totalprice",
                F.when(
                    (F.col(key) % 3 != 0) & (F.col(key) % 5 == 0), F.lit(999.0)
                ).otherwise(F.col("o_totalprice")),
            ).collect(),
        )
    )
    assert got == expected


def test_foreach_batch_auto_compact(spark, tmp_path):
    """auto_compact_files (Delta's autoCompact): a one-file-per-batch
    ingest crosses the threshold and the sink runs an OPTIMIZE version
    — post-drain live file count is bounded by the compaction target,
    rows are intact, and the log shows at least one OPTIMIZE entry.
    The same drain WITHOUT the option accumulates a file per batch."""
    from bigdata06_spark import lakehouse as LH
    from bigdata06_spark.streaming.sinks import foreach_batch_lakehouse_merge

    src_dir = str(tmp_path / "chg")
    for b in range(6):  # 6 single-row files → 6 micro-batches
        spark.createDataFrame([(100 + b, float(b))], "k long, v double") \
            .coalesce(1).write.mode("append").parquet(src_dir)

    def drain(table, ckpt, **kw):
        LH.table_init(
            spark.createDataFrame([(0, 0.0)], "k long, v double"),
            table, "k", n_files=1)
        stream = (
            spark.readStream.schema("k long, v double")
            .option("maxFilesPerTrigger", "1").parquet(src_dir)
        )
        q = foreach_batch_lakehouse_merge(stream, table, "k", ckpt, **kw)
        q.awaitTermination(180)
        v = LH.current_version(table)
        return (len(LH.files_at_version(table, v)),
                LH.read_version(spark, table, v).count(),
                [e.get("op") for _v, e in LH._iter_log_entries(table)])

    nf_plain, rows_plain, _ = drain(
        str(tmp_path / "t_plain"), str(tmp_path / "ck1"))
    nf_auto, rows_auto, ops = drain(
        str(tmp_path / "t_auto"), str(tmp_path / "ck2"),
        auto_compact_files=4)
    assert rows_plain == rows_auto == 7
    assert nf_plain == 7                 # init + one file per batch
    assert nf_auto <= 4                  # the valve engaged
    assert "OPTIMIZE" in ops


def test_foreach_batch_cdc_with_deletes(spark, sf_dir, tmp_path):
    """Op-column changelog (Debezium shape): 'd' rows delete by key,
    'u' rows upsert — applied per micro-batch into the versioned
    table; final snapshot equals the batch-applied expectation."""
    from bigdata06_spark import lakehouse as LH
    from bigdata06_spark.catalog import load_table
    from bigdata06_spark.streaming.sinks import foreach_batch_lakehouse_merge

    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_totalprice")
    key = "o_orderkey"
    table = str(tmp_path / "cdc_ops")
    LH.table_init(o, table, key, n_files=4)

    upserts = (
        o.filter(F.col(key) % 7 == 0)
        .withColumn("o_totalprice", F.lit(555.0))
        .withColumn("op", F.lit("u"))
    )
    deletes = (
        o.filter((F.col(key) % 11 == 3) & (F.col(key) % 7 != 0))
        .withColumn("op", F.lit("d"))
    )
    changes_dir = str(tmp_path / "changes")
    upserts.unionByName(deletes).repartition(2).write.parquet(changes_dir)

    stream = (
        spark.readStream.schema(upserts.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(changes_dir)
    )
    q = foreach_batch_lakehouse_merge(
        stream, table, key, str(tmp_path / "ckpt"), op_col="op"
    )
    q.awaitTermination(180)

    got = sorted(
        map(tuple, LH.read_version(spark, table, LH.current_version(table)).collect())
    )
    expected = sorted(
        map(
            tuple,
            o.filter(~((F.col(key) % 11 == 3) & (F.col(key) % 7 != 0)))
            .withColumn(
                "o_totalprice",
                F.when(F.col(key) % 7 == 0, F.lit(555.0)).otherwise(
                    F.col("o_totalprice")
                ),
            )
            .collect(),
        )
    )
    assert got == expected


def test_foreach_batch_cdc_multiple_ops_per_key(spark, sf_dir, tmp_path):
    """A micro-batch carrying SEVERAL ops for one key (d→u, u→u)
    must net out to the LAST op per key (by the CDC sequence column):
    a delete followed by an upsert leaves the upserted row, not a
    vanished one; u→u keeps the later value instead of tripping the
    duplicate-key guard."""
    from pyspark.sql import functions as F

    from bigdata06_spark import lakehouse as LH
    from bigdata06_spark.catalog import load_table
    from bigdata06_spark.streaming.sinks import foreach_batch_lakehouse_merge

    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_totalprice")
    key = "o_orderkey"
    table = str(tmp_path / "cdc_multi")
    LH.table_init(o, table, key, n_files=4)
    keys = [r[0] for r in o.orderBy(key).limit(3).collect()]
    k_del_then_up, k_up_up, k_del = keys
    batch = spark.createDataFrame(
        [
            (k_del_then_up, None, "d", 1),
            (k_del_then_up, 777.0, "u", 2),   # later upsert wins → row survives
            (k_up_up, 100.0, "u", 1),
            (k_up_up, 200.0, "u", 2),         # later value wins
            (k_del, None, "d", 1),            # plain delete
        ],
        f"{key} long, o_totalprice double, op string, seq int",
    )
    changes_dir = str(tmp_path / "changes")
    batch.coalesce(1).write.parquet(changes_dir)  # one file → one micro-batch
    stream = spark.readStream.schema(batch.schema).parquet(changes_dir)
    q = foreach_batch_lakehouse_merge(
        stream, table, key, str(tmp_path / "ckpt"), op_col="op", seq_col="seq"
    )
    q.awaitTermination(180)

    cur = LH.read_version(spark, table, LH.current_version(table))
    got = {r[0]: r[1] for r in cur.filter(F.col(key).isin(keys)).collect()}
    assert got == {k_del_then_up: 777.0, k_up_up: 200.0}


def test_foreach_batch_cdc_multi_op_without_seq_fails_loud(spark, sf_dir, tmp_path):
    """Without seq_col there is no defined order for multiple ops on
    one key — the batch must fail loudly, not guess."""
    import pytest
    from pyspark.sql import functions as F  # noqa: F401

    from bigdata06_spark import lakehouse as LH
    from bigdata06_spark.catalog import load_table
    from bigdata06_spark.streaming.sinks import foreach_batch_lakehouse_merge

    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_totalprice")
    key = "o_orderkey"
    table = str(tmp_path / "cdc_noseq")
    LH.table_init(o, table, key, n_files=2)
    k = o.agg({key: "min"}).first()[0]
    batch = spark.createDataFrame(
        [(k, None, "d"), (k, 5.0, "u")], f"{key} long, o_totalprice double, op string"
    )
    changes_dir = str(tmp_path / "changes")
    batch.coalesce(1).write.parquet(changes_dir)
    stream = spark.readStream.schema(batch.schema).parquet(changes_dir)
    with pytest.raises(Exception, match="seq_col"):
        q = foreach_batch_lakehouse_merge(
            stream, table, key, str(tmp_path / "ckpt"), op_col="op"
        )
        q.awaitTermination(180)


def test_streaming_progress_listener_accounting(spark, sf_dir):
    """StreamingQueryListener observability: the recorded progress
    must account for EXACTLY the input rows the replay processed, and
    a stateful (windowed) query must surface bounded state-operator
    metrics — the leak-detection signal the 100 TB designs watch."""
    import time

    from pyspark.sql import functions as F

    from bigdata06_spark.catalog import load_table
    from bigdata06_spark.streaming import ops as SO
    from bigdata06_spark.streaming.monitor import ProgressRecorder

    rec = ProgressRecorder()
    spark.streams.addListener(rec)
    try:
        SO.run_to_table(
            SO.tumbling_counts(SO.stream_events(spark, sf_dir)), "complete"
        )
        # listener events are delivered asynchronously on the driver
        deadline = time.time() + 30
        n_events = load_table(spark, "events", sf_dir).count()
        while time.time() < deadline and rec.total_input_rows() < n_events:
            time.sleep(0.5)
    finally:
        spark.streams.removeListener(rec)
    assert rec.started, "onQueryStarted never fired"
    assert rec.total_input_rows() == n_events
    assert rec.max_state_rows() > 0, "stateful agg surfaced no state metrics"
    assert all(p["batchId"] is not None for p in rec.progress)


def test_lakehouse_cdf_stream_source_incremental(spark, sf_dir, tmp_path):
    """The lakehouse table as a STREAMING SOURCE: availableNow drains
    version 0; after a merge commits version 1, resuming from the same
    checkpoint emits ONLY version 1's added rows (with their
    _commit_version) — the Delta-streaming-source contract, so tables
    chain into incremental pipelines."""
    from pyspark.sql import functions as F

    from bigdata06_spark import lakehouse as LH
    from bigdata06_spark.catalog import load_table
    from bigdata06_spark.sources import lakehouse_datasource as LDS

    table = str(tmp_path / "lh_src")
    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_totalprice").limit(200)
    n0 = o.count()
    LH.table_init(o, table, "o_orderkey", n_files=2)
    LDS.register(spark)

    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def drain():
        q = (
            spark.readStream.format("lakehouse_cdf")
            .option("path", table)
            .load()
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    drain()
    got0 = spark.read.parquet(out_dir)
    assert got0.count() == n0
    assert got0.agg(F.max("_commit_version")).first()[0] == 0

    hi = o.agg(F.max("o_orderkey")).first()[0]
    batch = spark.createDataFrame(
        [(hi + 1, 1.5), (hi + 2, 2.5)], "o_orderkey long, o_totalprice double"
    )
    v1 = LH.merge(spark, table, "o_orderkey", inserts=batch)
    drain()
    got1 = spark.read.parquet(out_dir)
    new = got1.filter(F.col("_commit_version") == v1)
    assert got1.count() == n0 + 2
    assert sorted((r.o_orderkey, r.o_totalprice) for r in new.collect()) == [
        (hi + 1, 1.5),
        (hi + 2, 2.5),
    ]

    # idle resume: nothing new → no extra rows
    drain()
    assert spark.read.parquet(out_dir).count() == n0 + 2


def test_lakehouse_table_to_table_incremental_pipeline(spark, sf_dir, tmp_path):
    """END-TO-END incremental pipeline: table A streams out through
    the CDF source, a transformation runs per micro-batch, and the
    result MERGEs into table B — the medallion (bronze→silver) chain.
    After an append to A and a resumed run, B must equal the full
    recompute over A's current state, having processed only A's new
    version."""
    from pyspark.sql import functions as F

    from bigdata06_spark import lakehouse as LH
    from bigdata06_spark.catalog import load_table
    from bigdata06_spark.sources import lakehouse_datasource as LDS
    from bigdata06_spark.streaming.sinks import foreach_batch_lakehouse_merge

    a_path = str(tmp_path / "bronze")
    b_path = str(tmp_path / "silver")
    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_totalprice").limit(100)
    LH.table_init(o, a_path, "o_orderkey", n_files=2)
    LDS.register(spark)
    # silver starts from bronze v0's transform
    t0 = o.select("o_orderkey", (F.col("o_totalprice") * 2).alias("doubled"))
    LH.table_init(t0.limit(0), b_path, "o_orderkey", n_files=1)

    ckpt = str(tmp_path / "ckpt")

    def run_pipeline():
        stream = (
            spark.readStream.format("lakehouse_cdf")
            .option("path", a_path)
            .load()
            .select("o_orderkey", (F.col("o_totalprice") * 2).alias("doubled"))
        )
        q = foreach_batch_lakehouse_merge(stream, b_path, "o_orderkey", ckpt)
        q.awaitTermination(180)

    run_pipeline()
    b1 = LH.read_version(spark, b_path, LH.current_version(b_path))
    assert b1.count() == 100

    hi = o.agg(F.max("o_orderkey")).first()[0]
    batch = spark.createDataFrame(
        [(hi + 1, 10.0), (hi + 2, 20.0)], "o_orderkey long, o_totalprice double"
    )
    LH.merge(spark, a_path, "o_orderkey", inserts=batch)
    run_pipeline()

    got = sorted(
        map(tuple, LH.read_version(spark, b_path, LH.current_version(b_path)).collect())
    )
    want = sorted(
        map(
            tuple,
            LH.read_version(spark, a_path, LH.current_version(a_path))
            .select("o_orderkey", (F.col("o_totalprice") * 2).alias("doubled"))
            .collect(),
        )
    )
    assert got == want


def test_foreach_batch_plain_upsert_with_seq_col(spark, sf_dir, tmp_path):
    """ADVICE r4: a plain-upsert stream (op_col=None) with seq_col and
    MULTIPLE rows per key in one micro-batch must reduce to the
    last-by-seq row — previously the seq column leaked into the table
    as a data column and the duplicate keys tripped merge's guard."""
    from pyspark.sql import functions as F

    from bigdata06_spark import lakehouse as LH
    from bigdata06_spark.catalog import load_table
    from bigdata06_spark.streaming.sinks import foreach_batch_lakehouse_merge

    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_totalprice")
    key = "o_orderkey"
    table = str(tmp_path / "upsert_seq")
    LH.table_init(o, table, key, n_files=4)
    k = o.agg(F.min(key)).first()[0]
    batch = spark.createDataFrame(
        [(k, 100.0, 1), (k, 250.0, 2)],  # same key twice → last seq wins
        f"{key} long, o_totalprice double, seq int",
    )
    changes_dir = str(tmp_path / "changes")
    batch.coalesce(1).write.parquet(changes_dir)
    stream = spark.readStream.schema(batch.schema).parquet(changes_dir)
    q = foreach_batch_lakehouse_merge(
        stream, table, key, str(tmp_path / "ckpt"), seq_col="seq"
    )
    q.awaitTermination(180)

    cur = LH.read_version(spark, table, LH.current_version(table))
    assert "seq" not in cur.columns  # ordering column never lands in the table
    assert cur.filter(F.col(key) == k).first().o_totalprice == 250.0


def test_lakehouse_stream_sink_exactly_once(spark, tmp_path):
    """`writeStream.format("lakehouse")`: each micro-batch = one OCC
    APPEND version carrying a (txnAppId, batchId) ledger entry.
    Two-file source + maxFilesPerTrigger=1 → one version per batch;
    snapshot equals the input; a REPLAYED batchId is a true no-op
    (the crash-between-sink-commit-and-checkpoint window); restart
    with the same checkpoint commits nothing; a new file commits
    exactly one more version."""
    import json as _json
    import os as _os

    from bigdata06_spark import lakehouse as LH
    from bigdata06_spark.sources.lakehouse_datasource import (
        LakehouseCommit,
        LakehouseStreamWriter,
        register as register_ds,
    )

    register_ds(spark)
    src = str(tmp_path / "in")
    _os.makedirs(src)
    a = spark.range(0, 100).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    b = spark.range(100, 250).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    a.coalesce(1).write.parquet(str(tmp_path / "a"))
    b.coalesce(1).write.parquet(str(tmp_path / "b"))
    import glob as _glob
    import shutil as _shutil

    for i, f in enumerate(sorted(
            _glob.glob(str(tmp_path / "[ab]" / "part-*.parquet")))):
        _shutil.copy(f, f"{src}/f{i}.parquet")

    tbl = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")

    def run():
        q = (
            spark.readStream.schema("k long, v double")
            .option("maxFilesPerTrigger", 1).parquet(src)
            .writeStream.format("lakehouse").outputMode("append")
            .option("checkpointLocation", ckpt)
            .option("txnAppId", "t-sink")
            .trigger(availableNow=True).start(tbl)
        )
        q.awaitTermination(120)

    run()
    v = LH.current_version(tbl)
    assert v == 1  # two files, one batch each → versions 0 and 1
    got = LH.read_version(spark, tbl, v)
    assert got.count() == 250
    assert got.agg(F.sum("k")).first()[0] == sum(range(250))
    # per-version commits carry the op tag and the ledger entry
    entry = _json.load(open(f"{tbl}/_log/1.json"))
    assert entry["op"] == "STREAMING APPEND"
    assert entry["txn"] == {"app": "t-sink", "version": 1}
    assert LH.table_txns(tbl) == {"t-sink": 1}

    # restart on the same checkpoint: no data, no commits
    run()
    assert LH.current_version(tbl) == v

    # direct replay of a stale batchId: ledger makes it a no-op
    w = LakehouseStreamWriter(
        {"path": tbl, "txnAppId": "t-sink"}, got.schema, False)
    w.commit([LakehouseCommit(["data/phantom.parquet"])], batchId=0)
    assert LH.current_version(tbl) == v
    # and the phantom file was NOT logged
    assert "data/phantom.parquet" not in LH.files_at_version(tbl, v)

    # one new file → exactly one more version
    c = spark.range(250, 300).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    c.coalesce(1).write.parquet(str(tmp_path / "c"))
    _shutil.copy(_glob.glob(str(tmp_path / "c" / "part-*.parquet"))[0],
                 f"{src}/f9.parquet")
    run()
    assert LH.current_version(tbl) == v + 1
    assert LH.read_version(spark, tbl, v + 1).count() == 300

    # time travel composes with the sink's versions (the file source
    # doesn't promise batch order, so v0 is one of the two files)
    assert LH.read_version(spark, tbl, 0).count() in (100, 150)


def test_lakehouse_stream_sink_guards(spark, tmp_path):
    """Sink guards: complete output mode is rejected (append-only
    sink); a table with Spark-side invariants (partition columns) is
    loud-rejected; abort removes the batch's files."""
    import os as _os

    import pytest as _pytest

    from bigdata06_spark import lakehouse as LH
    from bigdata06_spark.sources.lakehouse_datasource import (
        LakehouseCommit,
        LakehouseStreamWriter,
    )

    df = spark.range(50).selectExpr(
        "id AS k", "CAST(id % 3 AS INT) AS part", "CAST(id AS DOUBLE) AS v")
    with _pytest.raises(ValueError, match="append"):
        LakehouseStreamWriter({"path": str(tmp_path / "x")}, df.schema, True)

    part_tbl = str(tmp_path / "pt")
    LH.table_init(df, part_tbl, "k", n_files=1, partition_by=["part"])
    with _pytest.raises(ValueError, match="partition columns"):
        LakehouseStreamWriter({"path": part_tbl}, df.schema, False)

    tbl = str(tmp_path / "t2")
    w = LakehouseStreamWriter({"path": tbl}, df.schema, False)
    d = _os.path.join(tbl, "data", "stream-dead")
    _os.makedirs(d)
    open(_os.path.join(d, "part-0.parquet"), "wb").close()
    w.abort([LakehouseCommit(["data/stream-dead/part-0.parquet"])], batchId=0)
    assert not _os.path.exists(d)


def test_mg_streaming_state_merges_across_batches(spark, tmp_path):
    """stream_heavy_hitters' state path under REAL multi-batch replay:
    the driver's events table is a single file (one availableNow
    batch), so this test forces 3 micro-batches (3 source files +
    maxFilesPerTrigger=1) and asserts (a) the per-bucket MG state
    merges across batches — final candidates ⊇ every phi-heavy key —
    and (b) the seq-stamped final emission + exact recount equals the
    direct batch GROUP BY, independent of batching."""
    from pyspark.sql import Window

    from bigdata06_spark.streaming import ops as SO
    from bigdata06_spark.streaming.stateful import mg_bucket_candidates

    # 3 files: a heavy key (42) spread thin across ALL files so no
    # single batch makes it heavy — only merged state finds it
    src = str(tmp_path / "src")
    rows = []
    for b in range(3):
        part = [(42, b)] * 20 + [(1000 + b * 100 + i, b) for i in range(40)]
        rows.append(part)
    for b, part in enumerate(rows):
        spark.createDataFrame(part, "user_id long, f long").coalesce(1) \
            .write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("user_id long, f long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .select("user_id")
    )
    sink = SO.run_to_table(
        mg_bucket_candidates(stream, "user_id", n_buckets=4, capacity=8),
        "update",
    )
    batches_seen = sink.agg(F.max("seq")).collect()[0][0]
    assert batches_seen >= 3, f"expected >=3 micro-batches, got {batches_seen}"
    w = Window.partitionBy("bucket")
    cand = {
        r["k"]
        for r in sink.withColumn("mx", F.max("seq").over(w))
        .filter(F.col("seq") == F.col("mx"))
        .collect()
    }
    # 60 occurrences of key 42 out of 180 rows: heavy at phi = 1/9
    # (capacity 8 >= buckets/phi would need 36 — but 42's bucket sees
    # only ~its own rows + collisions, and 20/batch >> any singleton)
    assert 42 in cand, f"heavy key lost across batches: {sorted(cand)[:10]}"
    # exact recount over candidates == direct batch answer at phi
    all_rows = spark.read.parquet(src)
    total = all_rows.count()
    thresh = (total + 8) // 9  # ceil(total/9)
    direct = {
        (r["user_id"], r["n"])
        for r in all_rows.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= thresh)
        .collect()
    }
    cand_df = spark.createDataFrame([(k,) for k in cand], "user_id long")
    recount = {
        (r["user_id"], r["n"])
        for r in all_rows.join(cand_df, "user_id", "left_semi")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= thresh)
        .collect()
    }
    assert recount == direct


def test_pattern_dfa_state_carries_across_batches(spark, tmp_path):
    """stream_match_recognize's DFA under REAL multi-batch replay: a
    `view+ click purchase` match SPLIT across three time-ordered
    micro-batches (views in batch 1, click in batch 2, purchase in
    batch 3) must still count — only carried ValueState can see it —
    and a pattern broken by an interleaved event must not. Also pins
    the within-batch (ts, event_id) sort: batch-2 rows are written
    out of time order."""
    import datetime as dt

    from pyspark.sql import Window

    from bigdata06_spark.streaming import ops as SO
    from bigdata06_spark.streaming.stateful import user_pattern_matches

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    t0 = dt.datetime(2024, 1, 1)

    def ev(eid, user, etype, sec):
        return (eid, t0 + dt.timedelta(seconds=sec), user, etype)

    # user 1: views (b1) -> click (b2) -> purchase (b3)  => 1 match, 2 views
    # user 2: view (b1) -> error (b2) -> click+purchase (b3) => broken, 0
    # user 3: complete match inside b2, written OUT of ts order
    batches = [
        [ev(1, 1, "view", 0), ev(2, 1, "view", 1), ev(3, 2, "view", 0)],
        [ev(6, 3, "purchase", 12), ev(4, 3, "view", 10), ev(5, 3, "click", 11),
         ev(7, 1, "click", 2), ev(8, 2, "error", 1)],
        [ev(9, 1, "purchase", 3), ev(10, 2, "click", 2),
         ev(11, 2, "purchase", 3)],
    ]
    src = str(tmp_path / "src")
    for i, part in enumerate(batches):
        spark.createDataFrame(
            part, "event_id long, ts timestamp, user_id long, event_type string"
        ).coalesce(1).write.mode("append").parquet(src)
        # maxFilesPerTrigger=1 replays in (mtime, path) order; equal
        # mtimes on a coarse-timestamp fs fall back to RANDOM part
        # names (ADVICE r10 flake source). Pin write order with
        # explicit strictly-increasing mtimes.
        import glob as _glob
        import os as _os

        for f in _glob.glob(f"{src}/*.parquet"):
            st = _os.stat(f)
            if st.st_mtime < 1_000_000_000 + i:
                continue  # already pinned by an earlier iteration
            _os.utime(f, (1_000_000_000 + i, 1_000_000_000 + i))
    stream = (
        spark.readStream
        .schema("event_id long, ts timestamp, user_id long, event_type string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = SO.run_to_table(user_pattern_matches(stream), "update")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("n_matches"), F.desc("views_matched"))
    final = {
        r["user_id"]: (r["n_matches"], r["views_matched"])
        for r in out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1).collect()
    }
    assert final[1] == (1, 2), f"cross-batch match lost: {final}"
    assert final[2] == (0, 0), f"broken pattern counted: {final}"
    assert final[3] == (1, 1), f"out-of-order batch mis-sorted: {final}"
