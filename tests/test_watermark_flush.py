"""Watermark-flush streaming queries: append-mode windows drained to a
final answer by the flush sentinels must equal their batch twins
(which themselves hash-match the DuckDB oracles)."""

from __future__ import annotations

from distributed_map_reduce_spark.registry import all_queries


def _rows(df, keys):
    return sorted(tuple(r[k] for k in keys) for r in df.collect())


def test_session_flush_matches_batch(spark, sf_dir):
    stream = all_queries()["stream_session_flush_final"].fn(spark, sf_dir)
    batch = all_queries()["events_session_window"].fn(spark, sf_dir)
    keys = ["user_id", "session_start", "n_events", "session_value"]
    assert _rows(stream, keys) == _rows(batch, keys)


def test_sliding_flush_matches_batch(spark, sf_dir):
    stream = all_queries()["stream_sliding_flush_final"].fn(spark, sf_dir)
    batch = all_queries()["events_sliding_window"].fn(spark, sf_dir)
    keys = ["window_start", "event_type", "n_events", "avg_value"]
    assert _rows(stream, keys) == _rows(batch, keys)


def test_chained_windows_emit_once(spark, sf_dir):
    """Chained 5min→1h rollup: every (hour, type) appears exactly once
    (append-mode emit-once), and the per-hour bucket counts are sane."""
    out = all_queries()["stream_chained_time_windows"].fn(spark, sf_dir)
    rows = out.collect()
    assert rows, "flush must drain the hourly layer"
    seen = [(r["hour_start"], r["event_type"]) for r in rows]
    assert len(seen) == len(set(seen))
    for r in rows:
        assert 1 <= r["n_buckets"] <= 12  # ≤ twelve 5-min buckets per hour
        assert r["max_5min_events"] <= r["total_events"]


def test_segment_enrichment_matches_batch(spark, sf_dir):
    stream = all_queries()["stream_segment_enrichment_final"].fn(spark, sf_dir)
    batch = all_queries()["events_segment_enrichment"].fn(spark, sf_dir)
    keys = ["window_start", "segment", "n_purchases", "segment_revenue"]
    assert _rows(stream, keys) == _rows(batch, keys)
