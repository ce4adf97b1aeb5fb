"""Round-7 regression pins: the ADVICE r6 fix surfaces.

1. ``adaptive_bucketed``'s corpus probe must survive degenerate
   embedding frames (empty, all-null, dim-0) instead of crashing on an
   unlucky first-pick, and must read the dim deterministically.
2. ``dedup_mllib_minhash_join`` must surface its input cap in the
   output schema (slab_docs / corpus_docs on every pair row) so capped
   output can't be mistaken for full-corpus coverage.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_map_reduce_spark.registry import all_queries


def test_adaptive_bucketed_degenerate_frames(spark):
    """Empty frame, all-null vectors, and a dim-0 vector must all
    degrade to the single-bucket fallback; a null row mixed into a real
    corpus must not poison the dim probe (ADVICE r6 #1: the old
    F.first(F.size(v)) crashed int(None) on a null first-pick)."""
    from distributed_map_reduce_spark.operators.similarity import (
        adaptive_bucketed,
    )

    schema = "vec_id bigint, v array<double>"
    empty = spark.createDataFrame([], schema)
    assert adaptive_bucketed(empty).count() == 0

    nulls = spark.createDataFrame([(1, None), (2, None)], schema)
    got = {r["bucket"] for r in adaptive_bucketed(nulls).collect()}
    assert got == {0}

    dim0 = spark.createDataFrame([(1, []), (2, [])], schema)
    got = {r["bucket"] for r in adaptive_bucketed(dim0).collect()}
    assert got == {0}

    mixed = spark.createDataFrame(
        [(1, [1.0, -2.0]), (2, None), (3, [0.5, 0.5])], schema
    )
    out = adaptive_bucketed(mixed)
    # the probe must not crash, and non-null rows get real buckets
    rows = {r["vec_id"]: r["bucket"] for r in out.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1] is not None and rows[3] is not None


def test_mllib_slab_columns_surface_the_cap(spark, sf_dir):
    """Every output pair carries slab_docs (docs actually hashed, after
    the 2000-doc cap) and corpus_docs (full corpus size), so the
    library-demo posture is visible in the data (ADVICE r6 #2)."""
    df = all_queries()["dedup_mllib_minhash_join"].fn(spark, sf_dir)
    assert {"slab_docs", "corpus_docs"} <= set(df.columns)
    row = df.limit(1).collect()
    if row:  # sf0.001 fixture yields pairs; guard stays honest anyway
        r = row[0]
        corpus = (
            spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        )
        assert r["corpus_docs"] == corpus
        assert r["slab_docs"] == min(corpus, 2000)


def test_adaptive_dim_probe_is_min_over_nonnull(spark):
    """With mixed dims the probe must pick the MIN (deterministic,
    matching the oracle's min(len(v))), never an arbitrary first."""
    from distributed_map_reduce_spark.operators.similarity import (
        adaptive_bucketed,
    )

    df = spark.createDataFrame(
        [(1, [1.0] * 8), (2, [1.0] * 4), (3, None)],
        "vec_id bigint, v array<double>",
    )
    # dim=4 hyperplanes dot 8-wide vectors fine (first 4 components);
    # the point is it must not crash and must be reproducible
    a = {r["vec_id"]: r["bucket"] for r in adaptive_bucketed(df).collect()}
    b = {r["vec_id"]: r["bucket"] for r in adaptive_bucketed(df).collect()}
    assert a == b
