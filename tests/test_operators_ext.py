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


def test_pack_sequences_invariants(spark, sf_dir):
    """Packing conserves tokens, seq ids are contiguous per shard, and
    every sequence starts before its budget boundary (a doc may straddle
    — greedy first-fit by start offset)."""
    from distributed_map_reduce_spark.operators.pipeline import SEQ_BUDGET
    from distributed_map_reduce_spark.registry import all_queries

    rows = all_queries()["pipeline_pack_sequences"].fn(spark, sf_dir).collect()
    by_shard = {}
    total = 0
    for r in rows:
        by_shard.setdefault(r["shard"], {})[r["seq_id"]] = r["seq_tokens"]
        total += r["seq_tokens"]
        assert r["n_docs"] >= 1
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    import pyspark.sql.functions as F

    want_total = docs.select(
        F.sum(F.size(F.filter(F.split("text", " "), lambda w: F.trim(w) != "")))
    ).collect()[0][0]
    assert total == want_total  # conservation
    for shard, seqs in by_shard.items():
        ids = sorted(seqs)
        assert ids == list(range(len(ids)))  # contiguous bins
        # all but the last bin must reach the budget boundary (a bin ends
        # only when the running total crosses it)
        for sid in ids[:-1]:
            assert sum(seqs[s] for s in range(sid + 1)) >= (sid + 1) * SEQ_BUDGET


def test_domain_mix_budget_never_exceeded(spark, sf_dir):
    from distributed_map_reduce_spark.operators.pipeline import MIX_BUDGET
    from distributed_map_reduce_spark.registry import all_queries

    rows = all_queries()["pipeline_domain_mix"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r["tokens_kept"] <= MIX_BUDGET
