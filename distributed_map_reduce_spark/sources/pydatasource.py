"""Custom connector via the Python DataSource API (Spark 4,
`pyspark.sql.datasource`) — the user-defined source/sink surface.

The reference exposes pluggable dataset groups whose contents any node
can materialize (`store.js` groups); Spark's equivalent extension point
for *new formats* is the DataSource API: a pure-Python class whose
reader declares partitions (the parallelism contract) and yields rows
per partition on executors, Arrow-batched back into the scan.

`HashRangeDataSource` is a deterministic synthetic-table generator —
(id, bucket, score) derived from md5(id) — so the DuckDB oracle can
reproduce every value from `generate_series` + the same md5 arithmetic:
the connector's partition planning, executor-side generation, and
Arrow hand-off are all exercised with a hash-checkable result. At 100 TB
the same class shape wraps any external system (REST pages, message
queues, proprietary formats): one InputPartition per shard/page, reads
stream per-partition with zero driver materialization.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from ..registry import register

_U32 = 4294967296.0  # 2^32: md5-prefix → exact uniform in [0, 1)


class _HashRangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class HashRangeReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 10_000))
        self.num_partitions = int(options.get("partitions", 8))

    def partitions(self):
        """Contiguous id ranges — one InputPartition per Spark task, the
        split contract that makes the source scale-out instead of a
        single-threaded generator."""
        per = -(-self.rows // self.num_partitions)  # ceil
        return [
            _HashRangePartition(lo, min(lo + per, self.rows))
            for lo in range(0, self.rows, per)
        ]

    def read(self, partition):
        # Runs ON EXECUTORS, one call per partition; rows stream back via
        # Arrow batches — the driver never sees the data.
        for i in range(partition.start, partition.end):
            h = hashlib.md5(str(i).encode()).hexdigest()
            yield (i, int(h[8:10], 16) % 16, int(h[:8], 16))


class HashRangeDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "hash_range"

    def schema(self) -> str:
        return "id bigint, bucket int, score_raw bigint"

    def reader(self, schema):
        return HashRangeReader(self.options)


def register_datasource(spark: SparkSession) -> None:
    spark.dataSource.register(HashRangeDataSource)


@register(
    "source_python_datasource",
    tags=("source", "connector"),
    oracle=f"""
WITH src AS (
  SELECT i AS id,
         CAST(CAST('0x' || substr(md5(CAST(i AS VARCHAR)), 9, 2) AS BIGINT) % 16
              AS INTEGER) AS bucket,
         CAST('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 8) AS BIGINT) AS score_raw
  FROM generate_series(0, 9999) AS t(i)
)
SELECT bucket,
       count(*) AS n,
       min(id) AS min_id,
       max(id) AS max_id,
       round(sum(score_raw) / {_U32!r} / count(*), 6) AS avg_score
FROM src
GROUP BY bucket
""",
)
def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read through the registered Python DataSource (8 partitions × md5
    row generator) and aggregate per bucket. score_raw stays an exact
    BIGINT through the sum (no float accumulation order to disagree on);
    the single division to a [0,1) mean happens after aggregation."""
    register_datasource(spark)
    df = (
        spark.read.format("hash_range")
        .option("rows", 10_000)
        .option("partitions", 8)
        .load()
    )
    return df.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("id").alias("min_id"),
        F.max("id").alias("max_id"),
        F.round(F.sum("score_raw") / F.lit(_U32) / F.count(F.lit(1)), 6).alias(
            "avg_score"
        ),
    )


class HashRangeStreamReader(SimpleDataSourceStreamReader):
    """Offset-based micro-batch reader over the same deterministic
    md5 row generator: each poll serves the next `batch_rows` ids until
    `rows` is exhausted, then reports no-new-data (offset stops
    advancing) so a bounded drain terminates. The offset is a plain
    row counter — the replayable progress marker Spark checkpoints;
    re-reading any [start, end) span yields identical rows, which is
    the exactly-once replay contract a real connector (Kafka offsets,
    Kinesis sequence numbers, REST cursors) must honor."""

    def __init__(self, options):
        self.rows = int(options.get("rows", 1_000))
        self.batch_rows = int(options.get("batchRows", 250))

    def initialOffset(self):
        return {"next": 0}

    def read(self, start):
        lo = int(start["next"])
        hi = min(lo + self.batch_rows, self.rows)
        return (iter(self._gen(lo, hi)), {"next": hi})

    def readBetweenOffsets(self, start, end):
        # Replay path after restart: regenerate the exact span.
        return iter(self._gen(int(start["next"]), int(end["next"])))

    @staticmethod
    def _gen(lo: int, hi: int):
        # A list iterator, not a generator: Spark's simple-reader
        # prefetch cache both next()s and copy.copy()s what read()
        # returns, and generators are not copyable.
        return [
            (i, int(h[8:10], 16) % 16, int(h[:8], 16))
            for i in range(lo, hi)
            for h in (hashlib.md5(str(i).encode()).hexdigest(),)
        ]


class HashRangeStreamSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "hash_range_stream"

    def schema(self) -> str:
        return "id bigint, bucket int, score_raw bigint"

    def simpleStreamReader(self, schema):
        return HashRangeStreamReader(self.options)


@register(
    "stream_python_datasource",
    tags=("source", "connector", "streaming"),
    oracle=f"""
WITH src AS (
  SELECT i AS id,
         CAST(CAST('0x' || substr(md5(CAST(i AS VARCHAR)), 9, 2) AS BIGINT) % 16
              AS INTEGER) AS bucket,
         CAST('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 8) AS BIGINT) AS score_raw
  FROM generate_series(0, 999) AS t(i)
)
SELECT bucket,
       count(*) AS n,
       min(id) AS min_id,
       max(id) AS max_id,
       round(sum(score_raw) / {_U32!r} / count(*), 6) AS avg_score
FROM src
GROUP BY bucket
""",
)
def stream_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING Python data source (Spark 4
    `SimpleDataSourceStreamReader`): the custom connector surface for
    systems that are feeds, not files. The same deterministic md5
    generator as `source_python_datasource` arrives as four offset-run
    micro-batches (250 rows each); a complete-mode aggregation over the
    drained bounded stream must equal the one-shot batch read — which
    is exactly the replayability property (read = f(offsets), no
    hidden state) the API's checkpoint/commit cycle assumes."""
    from ..streaming.jobs import run_to_completion

    spark.dataSource.register(HashRangeStreamSource)
    df = (
        spark.readStream.format("hash_range_stream")
        .option("rows", 1_000)
        .option("batchRows", 250)
        .load()
    )
    agg = df.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("id").alias("min_id"),
        F.max("id").alias("max_id"),
        F.round(F.sum("score_raw") / F.lit(_U32) / F.count(F.lit(1)), 6).alias(
            "avg_score"
        ),
    )
    return run_to_completion(spark, agg, "python_stream_src", mode="complete")
