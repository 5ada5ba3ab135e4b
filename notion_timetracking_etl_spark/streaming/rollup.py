"""Streaming windowed rollups over the events table.

Design for scale: the stream shuffles once per aggregation on the group keys;
watermarks bound state (late events beyond the delay are dropped, closed
windows are evicted). ``availableNow`` runs drain the full backlog in bounded
micro-batches — the cloud pattern for catch-up processing over a parquet lake.
"""

from __future__ import annotations

import uuid

from pyspark.sql import Column, DataFrame, SparkSession
import pyspark.sql.functions as F


def _dsum(col: Column) -> Column:
    """queries.helpers.dsum's convention, restated locally: importing the
    queries package from here would make executor-side unpickling of the
    stateful operator re-enter queries/__init__ → queries.streaming → this
    package while partially initialized (circular import)."""
    return F.sum(col.cast("decimal(38,6)")).cast("double")


def _is_directory(spark: SparkSession, path: str) -> bool:
    """Directory-layout detection that works for ANY Hadoop-visible
    filesystem (s3a://, hdfs://, file://), not just the driver's local disk.
    A driver-local ``os.path.isdir`` returns False for every remote URI and
    would silently route a directory-layout lake table into the
    single-file glob fallback — streaming 0 rows. Falls back to ``os.path``
    only when the JVM gateway is unavailable (Spark Connect), where remote
    listing isn't possible from the client anyway."""
    try:
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        return bool(fs.getFileStatus(hpath).isDirectory())
    except Exception:
        import os

        return os.path.isdir(path)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``readStream`` over the events parquet with the batch reader's schema
    contract (TIMESTAMP(NANOS) arrives as long nanos under
    ``spark.sql.legacy.parquet.nanosAsLong`` → truncate to micros)."""
    from ..sources.tpch import ensure_nanos_readable

    ensure_nanos_readable(spark)
    path = f"{sf_dir}/events.parquet"
    raw_schema = spark.read.parquet(path).schema
    if _is_directory(spark, path):
        # directory layout (a real lake table): stream the directory itself
        stream = spark.readStream.schema(raw_schema).parquet(path)
    else:
        # single-file layout (the driver's testdata): the file source needs
        # a directory to list, so stream the parent filtered to this file
        stream = (
            spark.readStream.schema(raw_schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return stream


def hourly_rollup(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Tumbling 1-hour windows per event_type: count + exact-decimal value sum.

    The watermark bounds aggregation state at (now - 1h) worth of open
    windows; at 100 TB/day this is what keeps state size independent of
    backlog depth.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _dsum(F.col("value")).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_rollup(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Sliding (overlapping) windows per event_type: each event lands in
    window/slide = 4 concurrent windows, so the rate metric updates every
    15 minutes with a full hour of context. State is (windows open within
    the watermark) x types — the overlap factor multiplies state row count,
    not event volume (events are aggregated map-side per window)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            F.col("n_events").cast("bigint").alias("n_events"),
        )
    )


def session_window_rollup(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Native session windows per user: a session closes after ``gap`` of
    inactivity. Spark's session_window end = last event + gap."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            F.date_format(F.col("w.end"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_end"
            ),
            "n_events",
        )
    )


def run_stream_to_table(
    stream_df: DataFrame,
    output_mode: str = "complete",
    timeout_s: int = 300,
    state_partitions: int | None = 8,
    latest_by: tuple[list[str], str] | None = None,
) -> DataFrame:
    """Drain a streaming DataFrame with ``Trigger.AvailableNow`` into a memory
    sink and return the result as a batch DataFrame.

    Complete mode emits every window once the backlog is drained — the
    deterministic choice for finite input (append mode would withhold windows
    newer than the final watermark). In production the sink would be a Delta /
    Kafka / foreachBatch writer; the memory sink is the local[] test stand-in.

    In ``update`` mode the memory sink APPENDS each micro-batch's updates, so
    a multi-batch drain (multi-file table, maxFilesPerTrigger) leaves stale
    intermediate rows per key. ``latest_by=(keys, monotone_col)`` keeps only
    the final update per key — the row maximizing ``monotone_col`` (e.g. a
    running count, which strictly increases for every key a batch re-emits).

    ``state_partitions`` pins ``spark.sql.shuffle.partitions`` for the drain
    (restored after): a stateful stream creates one state store — and for
    Python-stateful ops one worker — PER shuffle partition, per micro-batch.
    The partition count is frozen into the checkpoint at first start, so it
    must be sized to key cardinality / throughput up front; the default here
    suits the local drain, a 100 TB deployment passes its own (hundreds).
    ``None`` leaves the session setting untouched.
    """
    spark = stream_df.sparkSession
    name = f"stream_out_{uuid.uuid4().hex[:12]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        try:
            finished = q.awaitTermination(timeout_s)
        finally:
            if q.isActive:
                q.stop()
        if not finished:
            # ADVICE r7: an availableNow drain that outlives its timeout has
            # NOT committed every pending micro-batch — the memory sink would
            # hold a plausible-but-wrong snapshot. Raise instead of returning
            # partial state; the caller sizes timeout_s to the workload.
            raise TimeoutError(
                f"stream drain '{name}' did not finish within {timeout_s}s; "
                "partial sink contents discarded"
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    out = spark.table(name)
    if latest_by is not None:
        from pyspark.sql.window import Window

        keys, monotone_col = latest_by
        w = Window.partitionBy(*keys).orderBy(F.col(monotone_col).desc())
        out = (
            out.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    return out


def trending_rollup(
    events: DataFrame,
    window: str = "6 hours",
    watermark: str = "1 hour",
) -> DataFrame:
    """Tumbling windowed per-type counts sized for trending reports.

    The stream side stays a pure windowed aggregation (one keyed shuffle,
    watermark-bounded state); the top-k CUT is applied batch-side after the
    drain — ranking inside a streaming aggregation would need arbitrary
    stateful processing, and the counts table (windows x types) is exactly
    the right small handoff surface between the two."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            F.col("n_events").cast("bigint").alias("n_events"),
        )
    )
