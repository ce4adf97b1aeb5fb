"""Unit tests for the round-2 operator wave: as-of join semantics on a
hand-built fixture, salted aggregation equivalence, stateful streaming
vs batch, and sink round-trips."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from distributed_map_reduce_spark.operators.skew import salted_agg
from distributed_map_reduce_spark.operators.temporal import asof_join
from distributed_map_reduce_spark.registry import all_queries


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


def test_asof_join_semantics(spark):
    """Backward as-of: latest right row with ts <= left ts, per key;
    equal timestamps match; no earlier right row -> null."""
    left = spark.createDataFrame(
        [(1, _ts(10), "p1"), (1, _ts(30), "p2"), (2, _ts(5), "p3")],
        "k long, ts timestamp, name string",
    )
    right = spark.createDataFrame(
        [(1, _ts(10), 100.0), (1, _ts(20), 200.0), (2, _ts(7), 300.0)],
        "k long, ts timestamp, quote double",
    )
    out = asof_join(left, right, key="k", ts="ts", right_cols=["quote"])
    got = {r["name"]: r["asof_quote"] for r in out.collect()}
    assert got == {"p1": 100.0, "p2": 200.0, "p3": None}


def test_salted_agg_matches_direct(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    direct = {
        r["l_returnflag"]: (r["s"], r["n"])
        for r in li.groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    salted = {
        r["l_returnflag"]: (r["s"], r["n"])
        for r in salted_agg(
            li, "l_returnflag", {"s": ("l_quantity", "sum"), "n": ("l_quantity", "count")}
        ).collect()
    }
    assert salted == direct


def test_stateful_stream_matches_batch(spark, sf_dir):
    got = {
        r["user_id"]: r["n_events"]
        for r in all_queries()["stream_stateful_user_totals"].fn(spark, sf_dir).collect()
    }
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    want = {r["user_id"]: r["n"] for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == want


def test_sink_roundtrip_preserves_values(spark, sf_dir):
    out = all_queries()["sink_parquet_roundtrip"].fn(spark, sf_dir)
    rows = out.collect()
    assert len(rows) > 0
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp")
    )
    assert sum(r["n"] for r in rows) == li.count()
