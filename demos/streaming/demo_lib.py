"""Structured Streaming demos (SURVEY.md §2.I, T3 — not driver-graded).

Each demo replays the `events` fixture through a file stream (chunked files +
maxFilesPerTrigger) so event-time semantics that only exist in streaming —
watermark late-data drops, stream-stream joins, arbitrary stateful ops — run
for real. Batch-checkable twins of these semantics live in
queries/events_windows.py with DuckDB oracles.

Scale notes: identical code runs against a Kafka source by swapping
`readStream.parquet` for `readStream.format("kafka")` (the reference's
RabbitMQ analog, SURVEY.md §2.A); watermarks bound state size, which is what
makes the 100 TB/day stream tractable.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from swallow_spark.io import load


def chunked_replay_source(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    n_chunks: int = 8,
    late_chunk: bool = False,
    dup_chunk: bool = False,
) -> DataFrame:
    """Write events as n_chunks timestamp-ordered files; optionally append a
    final chunk containing only the OLDEST rows again (late data), then open
    a file stream over the directory with one file per micro-batch.

    Files are renamed to chunk-NNN.parquet so the file source's listing
    order — and therefore micro-batch order and watermark advancement — is
    DETERMINISTIC across runs (randomized part-file UUID names are not).
    """
    import glob
    import os

    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    e = load(spark, sf_dir, "events").withColumn(
        "chunk", F.ntile(n_chunks).over(Window.orderBy("ts"))
    )

    # ONE partitioned write for all base chunks (the per-chunk
    # filter+coalesce loop used to re-sort the whole table n_chunks times);
    # files are then renamed into the deterministic chunk-NNN listing order.
    tmp = f"{out_dir}/_tmp"
    e.repartition(n_chunks, "chunk").write.mode("overwrite").partitionBy(
        "chunk"
    ).parquet(tmp)
    # The file stream source orders ties by modification time, and one write
    # job stamps every part identically — assign strictly increasing mtimes
    # in chunk order so micro-batch order stays deterministic.
    import time as _time

    base_mtime = _time.time() - 3600
    for i in range(1, n_chunks + 1):
        parts = sorted(glob.glob(f"{tmp}/chunk={i}/part-*.parquet"))
        for m, part in enumerate(parts):
            dst = f"{out_dir}/chunk-{i:03d}-{m}.parquet"
            os.rename(part, dst)
            os.utime(dst, (base_mtime + i, base_mtime + i))
    shutil.rmtree(tmp, ignore_errors=True)

    def write_chunk(df, idx: int) -> None:
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        dst = f"{out_dir}/chunk-{idx:03d}-0.parquet"
        os.rename(part, dst)
        os.utime(dst, (base_mtime + idx, base_mtime + idx))
        shutil.rmtree(tmp, ignore_errors=True)

    if late_chunk:
        # replay the very first rows again — they are now far behind the
        # max event time the stream has seen → watermark-droppable
        write_chunk(
            e.filter(F.col("chunk") == 1).drop("chunk").orderBy("event_id").limit(50),
            n_chunks + 1,
        )
    if dup_chunk:
        # replay the NEWEST chunk again — duplicates arriving while their
        # originals are still inside the dedup watermark state
        write_chunk(
            e.filter(F.col("chunk") == n_chunks).drop("chunk"), n_chunks + 2
        )
    schema = load(spark, sf_dir, "events").schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{out_dir}/chunk-*.parquet")
    )


def run_watermark_tumbling(spark: SparkSession, sf_dir: str, work_dir: str) -> dict:
    """Tumbling 1h counts with a 10-minute watermark, append mode.

    Returns {"with_late": rows, "total_input": n} — in append mode a window
    only emits once it is below the watermark; the late replayed rows fall
    into windows already finalized and are dropped.
    """
    src = chunked_replay_source(spark, sf_dir, f"{work_dir}/replay", late_chunk=True)
    agg = (
        src.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("wstart"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("wm_tumbling")
        .outputMode("append")
        .option("checkpointLocation", f"{work_dir}/ckpt")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    out = spark.sql("SELECT * FROM wm_tumbling").collect()
    total_in = load(spark, sf_dir, "events").count()
    return {"emitted_windows": len(out), "emitted_rows": sum(r.n for r in out), "total_input": total_in + 50}


def run_stream_stream_join(spark: SparkSession, sf_dir: str, work_dir: str) -> int:
    """Self-join two replays of the event stream: purchases joined to clicks
    of the same user within the following 5 minutes, both sides watermarked.
    Returns the number of joined pairs."""
    # 4 chunks: cross-micro-batch join state is exercised from the second
    # batch on; more batches only multiply state-store round trips.
    left = chunked_replay_source(spark, sf_dir, f"{work_dir}/replay_l", n_chunks=4)
    right = (
        spark.readStream.schema(load(spark, sf_dir, "events").schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{work_dir}/replay_l")
    )
    clicks = (
        left.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("event_id").alias("c_id"),
        )
        .withWatermark("c_ts", "10 minutes")
    )
    purchases = (
        right.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("p_id"),
        )
        .withWatermark("p_ts", "10 minutes")
    )
    joined = purchases.join(
        clicks,
        F.expr(
            "p_user = c_user AND c_ts >= p_ts AND c_ts <= p_ts + INTERVAL 5 MINUTES"
        ),
        "inner",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_join")
        .outputMode("append")
        .option("checkpointLocation", f"{work_dir}/ckpt_join")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql("SELECT count(*) AS n FROM ss_join").collect()[0].n


def run_stateful_counter(spark: SparkSession, sf_dir: str, work_dir: str) -> dict:
    """Arbitrary stateful op: running per-user event counter via
    applyInPandasWithState (GroupState survives across micro-batches)."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    src = chunked_replay_source(spark, sf_dir, f"{work_dir}/replay_state", n_chunks=4)

    def count_events(key, pdf_iter, state: GroupState):
        total = state.get[0] if state.exists else 0
        for pdf in pdf_iter:
            total += len(pdf)
        state.update((total,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [total]})

    counted = src.groupBy("user_id").applyInPandasWithState(
        count_events,
        outputStructType="user_id long, n_events long",
        stateStructType="n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        counted.writeStream.format("memory")
        .queryName("stateful_counter")
        .outputMode("update")
        .option("checkpointLocation", f"{work_dir}/ckpt_state")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    # last update per user == total events per user
    final = spark.sql(
        """
        SELECT user_id, max(n_events) AS n FROM stateful_counter GROUP BY user_id
        """
    )
    truth = load(spark, sf_dir, "events").groupBy("user_id").count()
    cmp = final.join(truth, "user_id").filter(F.col("n") != F.col("count")).count()
    return {"users": final.count(), "mismatched_users": cmp}

def run_dropdup_watermark(spark: SparkSession, sf_dir: str, work_dir: str) -> dict:
    """Streaming deduplication: dropDuplicatesWithinWatermark(event_id) over a
    replay whose final micro-batch is an exact copy of the newest chunk.

    The duplicate rows arrive while their originals are still inside the
    30-minute dedup state, so every one of them is suppressed — emitted rows
    equal the distinct event_id count of the base fixture. State is bounded
    by the watermark (keys older than max_event_time - 30min are evicted),
    which is what keeps this tractable on an unbounded 100 TB/day stream.
    """
    src = chunked_replay_source(
        spark, sf_dir, f"{work_dir}/replay_dd", n_chunks=4, dup_chunk=True
    )
    deduped = src.withWatermark("ts", "30 minutes").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("dropdup_wm")
        .outputMode("append")
        .option("checkpointLocation", f"{work_dir}/ckpt_dd")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    emitted = spark.sql("SELECT count(*) AS n FROM dropdup_wm").collect()[0].n
    base = load(spark, sf_dir, "events").select("event_id").distinct().count()
    return {"emitted": emitted, "distinct_base": base}


def run_tws_user_stats(spark: SparkSession, sf_dir: str, work_dir: str) -> dict:
    """Spark-4 transformWithStateInPandas: per-user running (count, max_value)
    kept in a ValueState across micro-batches — the modern replacement for
    applyInPandasWithState, with typed state primitives (value/list/map
    state, timers) and RocksDB-backed state stores on a real cluster.

    Returns {"users": n, "mismatched_users": m} — m must be 0: the final
    update per user equals the batch groupBy(count, max) ground truth.
    """
    import pandas as pd

    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    src = chunked_replay_source(spark, sf_dir, f"{work_dir}/replay_tws", n_chunks=4)

    class UserStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.stats = handle.getValueState("stats", "n LONG, max_amt DOUBLE")

        def handleInputRows(self, key, rows, timerValues):
            n, max_amt = (
                self.stats.get() if self.stats.exists() else (0, float("-inf"))
            )
            for pdf in rows:
                n += len(pdf)
                if len(pdf):
                    max_amt = max(max_amt, float(pdf["value"].max()))
            self.stats.update((n, max_amt))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "max_amount": [max_amt]}
            )

        def close(self) -> None:
            pass

    out = src.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserStats(),
        outputStructType="user_id LONG, n_events LONG, max_amount DOUBLE",
        outputMode="Update",
        timeMode="None",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("tws_user_stats")
        .outputMode("update")
        .option("checkpointLocation", f"{work_dir}/ckpt_tws")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    final = spark.sql(
        """
        SELECT user_id, max(n_events) AS n, max(max_amount) AS max_amt
        FROM tws_user_stats GROUP BY user_id
        """
    )
    truth = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("tn"), F.max("value").alias("tmax"))
    )
    bad = (
        final.join(truth, "user_id")
        .filter((F.col("n") != F.col("tn")) | (F.col("max_amt") != F.col("tmax")))
        .count()
    )
    return {"users": final.count(), "mismatched_users": bad}


def run_incremental_availablenow(spark: SparkSession, sf_dir: str, work_dir: str) -> dict:
    """Incremental ingestion with Trigger.AvailableNow + a shared
    checkpoint: run 1 drains the 3 initial files and stops; a 4th file
    lands; run 2 restarts from the SAME checkpoint and processes ONLY the
    new file. This is the batch-cadence incremental pattern for a 100 TB
    landing zone — exactly-once file tracking without an always-on cluster.

    Returns per-run processed row counts plus the ground-truth splits.
    """
    import glob
    import os

    src_dir = f"{work_dir}/landing"
    shutil.rmtree(src_dir, ignore_errors=True)
    os.makedirs(src_dir, exist_ok=True)
    e = load(spark, sf_dir, "events").withColumn(
        "chunk", F.ntile(4).over(Window.orderBy("ts"))
    )

    def write_chunk(df, idx: int) -> None:
        tmp = f"{src_dir}/_tmp"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        os.rename(part, f"{src_dir}/chunk-{idx:03d}.parquet")
        shutil.rmtree(tmp, ignore_errors=True)

    for i in range(1, 4):
        write_chunk(e.filter(F.col("chunk") == i).drop("chunk"), i)
    n_total = e.count()
    n_last = e.filter(F.col("chunk") == 4).count()

    schema = load(spark, sf_dir, "events").schema
    counts: list[int] = []

    def run_once() -> int:
        counts.clear()

        def sink(bdf, _bid):
            counts.append(bdf.count())

        q = (
            spark.readStream.schema(schema)
            .parquet(f"{src_dir}/chunk-*.parquet")
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", f"{work_dir}/ckpt_incr")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sum(counts)

    run1 = run_once()
    write_chunk(e.filter(F.col("chunk") == 4).drop("chunk"), 4)  # new arrival
    run2 = run_once()
    return {
        "run1": run1,
        "run2": run2,
        "expected_run1": n_total - n_last,
        "expected_run2": n_last,
    }


def run_foreachbatch_upsert(spark: SparkSession, sf_dir: str, work_dir: str) -> dict:
    """Streaming UPSERT sink via foreachBatch: each micro-batch merges into
    a keyed parquet table (latest event per user wins, tiebreak max
    event_id) using versioned-directory swaps — the exactly-once MERGE
    pattern a lakehouse sink (Delta/Iceberg MERGE INTO) runs per batch,
    spelled out with plain parquet so the semantics are inspectable.

    The final table must equal the batch twin computed directly over all
    events — asserted by the caller. Scale note: per batch this is one
    broadcast-or-shuffle join of (existing keys × batch keys); with a real
    table format the directory swap becomes the format's atomic commit and
    the join becomes MERGE INTO, pruned by partition/file stats.
    """
    import glob
    import os

    src = chunked_replay_source(spark, sf_dir, f"{work_dir}/replay", n_chunks=4)
    state_root = f"{work_dir}/target"
    os.makedirs(state_root, exist_ok=True)
    version = {"n": 0}

    def latest_per_user(df: DataFrame) -> DataFrame:
        w = Window.partitionBy("user_id").orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    def merge_batch(bdf: DataFrame, _bid: int) -> None:
        cur_dir = f"{state_root}/v{version['n']}"
        if version["n"] > 0:
            cur = bdf.sparkSession.read.parquet(cur_dir)
            merged = latest_per_user(cur.unionByName(bdf))
        else:
            merged = latest_per_user(bdf)
        version["n"] += 1
        merged.write.mode("overwrite").parquet(f"{state_root}/v{version['n']}")

    q = (
        src.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", f"{work_dir}/ckpt_upsert")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    final = spark.read.parquet(f"{state_root}/v{version['n']}")
    twin = latest_per_user(load(spark, sf_dir, "events"))
    n_final = final.count()
    n_twin = twin.count()
    # exact content equality, both directions
    diff = final.exceptAll(twin).count() + twin.exceptAll(final).count()
    return {"rows": n_final, "twin_rows": n_twin, "diff": diff,
            "n_batches": version["n"]}


def run_stream_stream_left_outer(
    spark: SparkSession, sf_dir: str, work_dir: str
) -> dict:
    """LEFT OUTER watermarked stream-stream join — the semantics the inner
    variant cannot show: a purchase with NO click in its 5-minute window is
    held in state until the GLOBAL watermark (min across both sides) passes
    its eviction bound, then emitted once with NULL click columns.

    A bounded replay never advances the watermark past its own tail, so the
    last unmatched purchases would stay in state forever; a SENTINEL chunk
    (one far-future click + one far-future purchase, so BOTH watermark
    operators advance) flushes them deterministically. The sentinel
    purchase itself stays in state (nothing ever evicts it) and is excluded
    from the returned counts by its known event_id.

    Returns {"matched": n, "null_rows": n} — asserted against the exact
    batch computation by the caller/test.
    """
    import os
    import time as _time

    src_dir = f"{work_dir}/replay_outer"
    left = chunked_replay_source(spark, sf_dir, src_dir, n_chunks=4)

    # sentinel chunk: far-future click + purchase advance BOTH sides'
    # watermarks past every real event, flushing unmatched join state
    e = load(spark, sf_dir, "events")
    max_ts = e.agg(F.max("ts")).collect()[0][0]
    sent = spark.createDataFrame(
        [
            (10_000_001, max_ts, 0, "click", 0.0, "{}"),
            (10_000_002, max_ts, 0, "purchase", 0.0, "{}"),
        ],
        e.schema,
    ).withColumn("ts", F.col("ts") + F.expr("INTERVAL 2 DAYS"))
    sent.coalesce(1).write.mode("overwrite").parquet(f"{src_dir}/_sent")
    import glob as _glob

    part = sorted(_glob.glob(f"{src_dir}/_sent/part-*.parquet"))[0]
    dst = f"{src_dir}/chunk-9999.parquet"
    os.replace(part, dst)
    os.utime(dst, (int(_time.time()) + 60, int(_time.time()) + 60))

    right = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    clicks = (
        left.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("event_id").alias("c_id"),
        )
        .withWatermark("c_ts", "10 minutes")
    )
    purchases = (
        right.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("p_id"),
        )
        .withWatermark("p_ts", "10 minutes")
    )
    joined = purchases.join(
        clicks,
        F.expr(
            "p_user = c_user AND c_ts >= p_ts AND c_ts <= p_ts + INTERVAL 5 MINUTES"
        ),
        "leftOuter",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_outer")
        .outputMode("append")
        .option("checkpointLocation", f"{work_dir}/ckpt_outer")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    row = spark.sql(
        "SELECT SUM(CASE WHEN c_id IS NOT NULL THEN 1 ELSE 0 END) AS matched,"
        "       SUM(CASE WHEN c_id IS NULL THEN 1 ELSE 0 END) AS null_rows"
        " FROM ss_outer WHERE p_id < 10000000"
    ).collect()[0]
    return {"matched": row.matched or 0, "null_rows": row.null_rows or 0}


def run_incremental_dedup(spark: SparkSession, sf_dir: str, work_dir: str) -> dict:
    """Incremental corpus dedup — the production shape: documents ARRIVE in
    micro-batches, and each batch is deduped (a) within itself and (b)
    against the PERSISTED signature store of everything already accepted,
    then appends its new signatures to the store (foreachBatch). The
    surviving set must equal the batch twin exactly: global
    min-doc_id-per-content-hash (dedup_exact's survivor rule), because
    chunks replay in doc_id order.

    Scale notes: the store is a parquet table keyed by content hash — at
    100 TB it would be bucketed by hash so the anti-join is co-partitioned;
    the per-batch cost is |batch| + |store-side of the join|, never a
    corpus rescan.
    """
    import glob
    import os
    import time as _time

    src_dir = f"{work_dir}/docs_replay"
    store = f"{work_dir}/sig_store"
    out = f"{work_dir}/kept"
    shutil.rmtree(src_dir, ignore_errors=True)
    os.makedirs(src_dir, exist_ok=True)

    d = load(spark, sf_dir, "documents")
    chunked = d.withColumn("chunk", F.ntile(4).over(Window.orderBy("doc_id")))
    tmp = f"{src_dir}/_tmp"
    chunked.repartition(4, "chunk").write.mode("overwrite").partitionBy("chunk").parquet(tmp)
    base_mtime = _time.time() - 3600
    n_chunks = 0
    for i in range(1, 5):
        parts = sorted(glob.glob(f"{tmp}/chunk={i}/part-*.parquet"))
        for m, part in enumerate(parts):
            dst = f"{src_dir}/chunk-{i:03d}-{m:02d}.parquet"
            os.replace(part, dst)
            os.utime(dst, (base_mtime + i, base_mtime + i))
            n_chunks += 1
    shutil.rmtree(tmp, ignore_errors=True)

    stream = (
        spark.readStream.schema(d.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )

    def handle(batch_df, batch_id):
        b = batch_df.select(
            "doc_id", F.sha2(F.coalesce(F.col("text"), F.lit("")), 256).alias("h")
        )
        w = Window.partitionBy("h").orderBy("doc_id")
        b = b.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")
        if os.path.isdir(store) and glob.glob(f"{store}/*.parquet"):
            seen = batch_df.sparkSession.read.parquet(store).select("h")
            b = b.join(seen, "h", "left_anti")
        b = b.localCheckpoint(eager=True)  # freeze before the store grows
        b.select("h").write.mode("append").parquet(store)
        b.select("doc_id", "h").write.mode("append").parquet(out)

    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", f"{work_dir}/ckpt_dedup")
        .start()
    )
    q.processAllAvailable()
    q.stop()

    kept = {r.doc_id for r in spark.read.parquet(out).select("doc_id").collect()}
    twin = {
        r.survivor
        for r in d.select(
            "doc_id", F.sha2(F.coalesce(F.col("text"), F.lit("")), 256).alias("h")
        )
        .groupBy("h")
        .agg(F.min("doc_id").alias("survivor"))
        .collect()
    }
    return {
        "kept": len(kept),
        "twin": len(twin),
        "set_equal": kept == twin,
        "n_files": n_chunks,
    }
