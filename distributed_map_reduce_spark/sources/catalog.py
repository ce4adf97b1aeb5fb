"""Table catalog over the driver's parquet fixtures.

The reference's data plane is named groups of (key, value) pairs placed on
nodes by hash (`/root/reference/distribution/all/store.js:106-121`); in
Spark the catalog + parquet scans subsume naming and placement entirely
(SURVEY.md §1.1/§1.4). Tables register as temp views with the same names
DuckDB pre-registers, so oracle SQL and Spark SQL see one namespace.

Scale posture: `spark.read.parquet` gives us columnar scans with predicate
pushdown and column pruning for free; at 100 TB the same call reads a
partitioned directory tree and Catalyst prunes partitions — nothing here
assumes single files.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # Normalize events.ts to a session-TZ (UTC) µs timestamp whatever
        # the parquet writer produced: TIMESTAMP(NANOS) arrives as an
        # epoch-nanos long (spark.sql.legacy.parquet.nanosAsLong),
        # TIMESTAMP(MICROS, isAdjustedToUTC=false) as timestamp_ntz.
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            # integer `div` (not `/`): float division of epoch-nanos loses µs
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif not isinstance(ts_type, T.TimestampType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view named like the DuckDB oracle's
    views, so the same SQL text can run on both engines."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
