"""True Structured Streaming jobs — the streaming twins of
`streaming.batch_windows`, driven by the same events parquet as a file
stream with event-time watermarks.

These return live streaming queries (memory sink) for tests; the driver's
batch contract can't compare a running sink, so correctness is
established two ways: (a) the batch twins hash-match DuckDB, and (b)
tests/test_streaming.py runs these to completion and diffs against the
batch results.

Scale posture: watermarks bound state; `complete` mode is used only for
the bounded-cardinality count demo; real deployments use append +
checkpointing to an object store, with `foreachBatch` for exactly-once
sinks.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import register

# Nominal events schema (documentation/tests). The stream reader below does
# NOT trust this: it derives the real schema from a batch read of the same
# file and applies catalog.load_table's ts normalization, so a regenerated
# events.parquet with nanos-long or tz-adjusted timestamps cannot silently
# diverge batch vs streaming (ADVICE r2).
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),  # parquet TIMESTAMP(µs)
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def events_stream_dir(sf_dir: str) -> str:
    """The file-stream source monitors a *directory*; expose the single
    events parquet through a temp-dir symlink (at scale this is the
    landing directory new files arrive into)."""
    d = tempfile.mkdtemp(prefix="dmrs_stream_")
    # abspath: a relative sf_dir would otherwise become a relative symlink
    # TARGET, which resolves against the /tmp dir, not the caller's cwd
    os.symlink(
        os.path.abspath(os.path.join(sf_dir, "events.parquet")),
        os.path.join(d, "events.parquet"),
    )
    return d


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet, ts normalized to a
    session-TZ µs timestamp exactly like sources.catalog.load_table —
    one normalization policy for batch and streaming."""
    schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_stream_dir(sf_dir))
    )
    ts_type = schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        # nanosAsLong path: integer div keeps µs precision
        return stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    if not isinstance(ts_type, T.TimestampType):
        return stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def tumbling_counts(events: DataFrame) -> DataFrame:
    """5-minute tumbling windows with a 10-minute watermark — identical
    aggregation to batch_windows.events_tumbling_window."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


def streaming_dedup(events: DataFrame) -> DataFrame:
    """Watermarked dropDuplicates — one state row per (user, type, ts)."""
    return events.withWatermark("ts", "30 minutes").dropDuplicates(
        ["user_id", "event_type", "ts"]
    )


def run_to_completion(spark: SparkSession, agg: DataFrame, name: str, mode: str = "complete") -> DataFrame:
    """Drive a bounded file stream to completion through a memory sink and
    return the final result table (test harness path)."""
    q = (
        agg.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def click_purchase_join(events: DataFrame) -> DataFrame:
    """Stream-stream interval join: clicks joined to same-user purchases
    within the following hour. Both sides carry watermarks so Spark can
    GC join state — clicks are held at most (1h band + 2h watermark);
    purchases likewise. The batch twin (same predicate, same columns) is
    batch_windows.events_click_to_purchase."""
    c = (
        events.filter(F.col("event_type") == "click")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
    )
    p = (
        events.filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("user_id"),
            F.col("ts").alias("purchase_ts"),
            F.round("value", 2).alias("purchase_value"),
        )
    )
    return c.join(
        p,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")),
    ).select("click_id", "purchase_id", "user_id", "click_ts", "purchase_ts", "purchase_value")


def enriched_segment_windows(events: DataFrame, customer: DataFrame) -> DataFrame:
    """Stream-static enrichment: join the event stream against a static
    dimension (customer keyed by user_id) and aggregate purchase value
    per (market segment, 15-minute window).

    The static side needs NO watermark — Spark broadcasts/rescans it per
    micro-batch and the join adds no streaming state; only the windowed
    aggregate keeps state, bounded by the 30-minute watermark. This is
    the canonical 'enrich events with a slowly-changing dim' topology;
    at scale the dim side is a broadcast (or a Delta/parquet snapshot
    re-read per trigger for freshness).
    """
    dim = customer.select(
        F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("segment")
    )
    return (
        events.filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "30 minutes")
        .join(F.broadcast(dim), "user_id")  # stream-static: no state added
        .groupBy(F.window("ts", "15 minutes").alias("w"), "segment")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(F.sum("value"), 2).alias("segment_revenue"),
        )
        .select(F.col("w.start").alias("window_start"), "segment", "n_purchases", "segment_revenue")
    )


def idempotent_batch_sink(path: str):
    """foreachBatch writer with replay-safe (exactly-once) semantics:
    each micro-batch lands in its own `batch_id=N` partition with
    dynamic-overwrite, so re-delivery of a batch after a crash
    OVERWRITES its own partition instead of appending duplicates —
    batch_id is Spark's replay-stable epoch. This plus checkpointed
    offsets is the standard exactly-once file-sink recipe; at 100 TB the
    same function targets an object store and the overwrite is a
    partition-scoped atomic commit."""

    def write(batch_df, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(path)
        )

    return write


def session_values(events: DataFrame) -> DataFrame:
    """Streaming session windows (30-minute gap) per user with a
    10-minute watermark — identical aggregation to
    batch_windows.events_session_window; state is merged session ranges
    per user, GC'd as the watermark passes each session's close."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "session_value",
        )
    )


def incremental_view_sink(path: str):
    """foreachBatch maintainer for a streaming materialized view: each
    micro-batch's per-user (count, cents) partial aggregate MERGES into
    the standing parquet view — read old, union, re-aggregate, overwrite
    — so refresh cost scales with |batch| + |view|, never with history.
    The same count/sum-monoid algebra as
    operators.joins.cdc_incremental_join_agg, driven by real streaming
    epochs; at 100 TB the overwrite targets a keyed Delta MERGE instead
    of a full view rewrite, with identical semantics."""

    def write(batch_df, batch_id: int) -> None:
        spark = batch_df.sparkSession
        delta = (
            batch_df.groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"),
            )
        )
        # First batch only: the view doesn't exist yet. Any OTHER read
        # failure (transient IO, partial file) must propagate — a bare
        # fallback here would silently reset the view to one batch's
        # delta and lose all accumulated history (ADVICE r03).
        if os.path.isdir(path):
            old = spark.read.parquet(path)
            merged = (
                old.unionByName(delta)
                .groupBy("user_id")
                .agg(
                    F.sum("n_events").alias("n_events"),
                    F.sum("cents").alias("cents"),
                )
            )
        else:
            merged = delta
        # Never overwrite the path we just read in place: write the new
        # view generation to a temp dir, then swap via rename. A crash
        # between the renames leaves either the old or the new complete
        # view, never a torn one. (On object stores this step becomes a
        # Delta/Iceberg commit; rename is the local-FS equivalent.)
        tmp = f"{path}.__tmp_b{batch_id}"
        retired = f"{path}.__old_b{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.isdir(path):
            os.rename(path, retired)
        os.rename(tmp, path)
        shutil.rmtree(retired, ignore_errors=True)

    return write


def _replayed_events(events: DataFrame) -> DataFrame:
    """Simulate at-least-once delivery: every third event is delivered
    twice (a second copy unioned in). Both copies are identical rows —
    exactly what a retried producer or a replayed Kafka offset emits."""
    return events.unionByName(events.filter(F.col("event_id") % 3 == 0))


def dedup_within_watermark(events: DataFrame) -> DataFrame:
    """dropDuplicatesWithinWatermark on event_id over the replayed
    stream: exactly-once restoration from at-least-once delivery. Unlike
    plain dropDuplicates (streaming_dedup above), the WithinWatermark
    variant GC's each key's state once the watermark passes it, so state
    is bounded by the dup-arrival horizon, not the stream's lifetime key
    cardinality — the form that survives an unbounded deployment."""
    return (
        _replayed_events(events)
        .withWatermark("ts", "30 minutes")
        .dropDuplicatesWithinWatermark(["event_id"])
    )


@register(
    "stream_dedup_replay_exactly_once",
    tags=("streaming", "dedup"),
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_unique,
       CAST(count(*) + sum(CASE WHEN event_id % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_delivered
FROM events
GROUP BY event_type
""",
)
def stream_dedup_replay_exactly_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once from at-least-once: replay every third event (dup
    delivery), dedupe with dropDuplicatesWithinWatermark(event_id), and
    count per event_type. Post-dedup counts must equal the clean batch
    group-by — the oracle also pins the delivered (with-dup) volume the
    dedup had to absorb, computed arithmetically from the replay rule.

    The dedup emits in append mode (each event exactly once across all
    micro-batches); counts aggregate the completed memory-sink table as
    a batch, so the returned DataFrame is a stable 5-row summary."""
    events = read_events_stream(spark, sf_dir)
    deduped = run_to_completion(
        spark, dedup_within_watermark(events), "dedup_replay_eo", mode="append"
    )
    delivered = F.when(F.col("event_id") % 3 == 0, 2).otherwise(1)
    return deduped.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_unique"),
        F.sum(delivered).cast("bigint").alias("n_delivered"),
    )


@register(
    "stream_incremental_view_maintenance",
    tags=("streaming", "ivm", "sink"),
    oracle="""
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
FROM events
GROUP BY user_id
""",
)
def stream_incremental_view_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming materialized-view maintenance, end to end and
    oracle-checked: the event stream drives `incremental_view_sink`
    (foreachBatch partial-agg merge with atomic temp-dir swap) to
    completion, and the FINAL standing view must equal the one-shot
    batch group-by — proving the per-epoch merge algebra
    (count/sum-monoid union + re-aggregate) loses nothing across
    micro-batch boundaries. Refresh cost per epoch is |batch| + |view|,
    never history; the swap leaves old-or-new complete, never torn."""
    view_dir = tempfile.mkdtemp(prefix="dmrs_ivm_")
    view = os.path.join(view_dir, "user_totals_view")
    stream = read_events_stream(spark, sf_dir)
    q = (
        stream.writeStream.foreachBatch(incremental_view_sink(view))
        .option("checkpointLocation", os.path.join(view_dir, "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.read.parquet(view).select(
        "user_id",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.col("cents").cast("bigint").alias("cents"),
    )


@register(
    "stream_trigger_available_now",
    tags=("streaming",),
    oracle="""
SELECT time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)) AS window_start,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY 1, 2
""",
)
def stream_trigger_available_now(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigger.AvailableNow (Spark 3.3+): the production way to drain a
    bounded backlog — the query plans ALL currently-available input
    into rate-limited micro-batches, then STOPS ON ITS OWN (unlike
    processAllAvailable, which is a test-harness wait on a running
    query, and unlike the deprecated Trigger.Once, which ignored rate
    limits). The scheduled nightly catch-up job over a file/Kafka
    backlog is exactly this form. Complete-mode tumbling counts over
    the drained stream must equal the batch group-by (the oracle)."""
    events = read_events_stream(spark, sf_dir)
    agg = tumbling_counts(events)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("avail_now_drain")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()  # self-terminates once the backlog is drained
    return spark.table("avail_now_drain")


@register(
    "stream_trending_topk",
    tags=("streaming", "topk"),
    oracle="""
WITH counts AS (
  SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS window_start,
         event_type, CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
)
SELECT window_start, event_type, n_events, rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY window_start
                               ORDER BY n_events DESC, event_type) AS rnk
  FROM counts
) WHERE rnk <= 3
""",
)
def stream_trending_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming trending-items leaderboard: hourly windowed counts per
    event type maintained by the streaming engine (complete-mode state),
    ranked to a per-window top-3 AFTER the drain — the composition a
    trending dashboard runs every refresh (rank over the live
    aggregation state, not inside it: ranking is not an incremental
    streaming operator, so production puts it in the read path /
    foreachBatch, exactly as modeled here). The drained leaderboard must
    equal the batch rank over the same counts."""
    from pyspark.sql import Window

    events = read_events_stream(spark, sf_dir)
    counts = (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )
    drained = run_to_completion(spark, counts, "trending_counts", mode="complete")
    w = Window.partitionBy("window_start").orderBy(
        F.col("n_events").desc(), F.col("event_type")
    )
    return (
        drained.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= 3)
    )


def cdc_apply_sink(path: str):
    """foreachBatch CDC applier: each micro-batch reduces to its latest
    op per key, then merges into the standing state by max-seq — an
    ORDER-INSENSITIVE merge (max is commutative/associative), so any
    micro-batch arrival order yields the same state. Tombstones are
    KEPT in state rather than dropped: a delete must keep shadowing
    earlier puts that might arrive in later (replayed/out-of-order)
    batches — dropping it would resurrect the key. The read path
    filters them. Same atomic temp-dir swap as incremental_view_sink."""

    def write(batch_df, batch_id: int) -> None:
        from pyspark.sql import Window

        spark = batch_df.sparkSession
        w = Window.partitionBy("key").orderBy(F.col("seq").desc())
        latest = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        if os.path.isdir(path):
            old = spark.read.parquet(path)
            merged = (
                old.unionByName(latest)
                .withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
        else:
            merged = latest
        tmp = f"{path}.__tmp_b{batch_id}"
        retired = f"{path}.__old_b{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.isdir(path):
            os.rename(path, retired)
        os.rename(tmp, path)
        shutil.rmtree(retired, ignore_errors=True)

    return write


@register(
    "stream_cdc_apply_changes",
    tags=("streaming", "cdc", "kv"),
    oracle="""
WITH ops AS (
  SELECT CAST(user_id AS VARCHAR) AS key,
         CASE WHEN event_type = 'error' THEN 'delete' ELSE 'put' END AS op,
         round(value, 4) AS value,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events
)
SELECT key, value FROM ops WHERE rn = 1 AND op <> 'delete'
""",
)
def stream_cdc_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC apply — the micro-batch twin of the batch
    `kv_cdc_tombstone_apply`: the change feed (put/delete per key,
    seq-ordered) is staged as FOUR range files so the file source
    genuinely delivers four epochs, `cdc_apply_sink` folds each into
    the standing store state by commutative max-seq merge (tombstones
    retained in-state so later batches cannot resurrect deleted keys),
    and the final live view must hash-match the one-shot batch window.
    Per-epoch cost is |batch| + |state| — the Delta `APPLY CHANGES` /
    Debezium-sink shape; at 100 TB the swap becomes a keyed MERGE
    commit with identical algebra."""
    from ..sources import load_table

    work = tempfile.mkdtemp(prefix="dmrs_cdc_")
    landing = os.path.join(work, "landing")
    state = os.path.join(work, "state")
    ev = load_table(spark, sf_dir, "events")
    ops = ev.select(
        F.col("user_id").cast("string").alias("key"),
        F.when(F.col("event_type") == "error", "delete").otherwise("put").alias("op"),
        F.round("value", 4).alias("value"),
        F.col("event_id").alias("seq"),
    )
    ops.repartitionByRange(4, "seq").write.parquet(landing)
    stream = (
        spark.readStream.schema("key string, op string, value double, seq bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    q = (
        stream.writeStream.foreachBatch(cdc_apply_sink(state))
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (
        spark.read.parquet(state)
        .filter(F.col("op") != "delete")
        .select("key", "value")
    )
