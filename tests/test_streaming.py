"""Structured Streaming twins: drive the bounded file stream to
completion and diff against the batch window results (the batch results
themselves hash-match the DuckDB oracle)."""

from __future__ import annotations

from distributed_map_reduce_spark.registry import all_queries
from distributed_map_reduce_spark.streaming.jobs import (
    read_events_stream,
    run_to_completion,
    streaming_dedup,
    tumbling_counts,
)


def test_streaming_tumbling_matches_batch(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    result = run_to_completion(
        spark, tumbling_counts(stream), "t_tumbling", mode="complete"
    )
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in result.collect()
    }
    batch = all_queries()["events_tumbling_window"].fn(spark, sf_dir)
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in batch.collect()
    }
    assert got == want


def test_streaming_dedup_runs(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    result = run_to_completion(spark, streaming_dedup(stream), "t_dedup", mode="append")
    n = result.count()
    total = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert 0 < n <= total
