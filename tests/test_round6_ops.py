"""Round-6 regression pins for the ADVICE r5 fix classes.

Each test targets a failure mode the sf0.01 differential gate cannot
reach — either because the fixtures never enter the regime (Erlang-C
offered load stays under the old factorial cliff) or because the bug
lives in a formula BOTH engines share (the MMD doubled-mean class,
invisible to any Spark-vs-DuckDB compare)."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F


def _erlang_python(a: float, c: int) -> float:
    """Independent Erlang-C p_wait via the same running-product
    recurrence (term_k = term_{k-1} * a / k), pure Python floats."""
    t, s = 1.0, 0.0
    for k in range(1, c + 1):
        s = s + t
        t = t * a / k
    top = t
    return top / ((1 - a / c) * s + top)


def test_erlang_c_fold_survives_large_offered_load(spark):
    """ADVICE r5: the old pow/factorial form silently NULLed p_wait on
    Spark once c > 20 (factorial() range) — a regime the fixtures never
    reach. The running-product struct fold must stay finite and match
    an independent Python implementation at a = 25 and a = 45 Erlangs
    (c up to 51, far past both engines' factorial ranges)."""
    rows = [(25.0, c) for c in range(26, 32)] + [(45.0, c) for c in range(46, 52)]
    df = spark.createDataFrame(rows, "a double, c int")
    out = (
        df.withColumn(
            "st",
            F.expr(
                "aggregate(sequence(1, cast(c as int)), "
                "named_struct('t', cast(1.0 as double), 's', cast(0.0 as double)), "
                "(acc, k) -> named_struct('t', acc.t * a / k, 's', acc.s + acc.t))"
            ),
        )
        .select(
            "a",
            "c",
            (
                F.col("st.t")
                / ((1 - F.col("a") / F.col("c")) * F.col("st.s") + F.col("st.t"))
            ).alias("p_wait"),
        )
        .collect()
    )
    assert len(out) == 12
    for r in out:
        assert r["p_wait"] is not None and math.isfinite(r["p_wait"])
        expected = _erlang_python(r["a"], r["c"])
        assert abs(r["p_wait"] - expected) < 1e-12, (r["a"], r["c"])
        assert 0.0 < r["p_wait"] < 1.0


def test_soundex_unbounded_tail_matches_duckdb(spark):
    """ADVICE r5: _soundex_spark truncated the collapsed digit string at
    101 chars while the DuckDB twin was unbounded. A token whose digit
    tail exceeds that cap (alternating consonant groups, no run
    collapse) must now code identically on both engines."""
    from distributed_map_reduce_spark.operators.dedup import (
        _soundex_spark,
        _soundex_sql,
    )

    long_token = "r" + "bl" * 160  # digits: 6 then alternating 14 — 321 chars
    tokens = [("abc",), (long_token,), ("pfister",), ("tymczak",)]
    got = {
        r["t"]: r["sx"]
        for r in spark.createDataFrame(tokens, "t string")
        .select("t", _soundex_spark(F.col("t")).alias("sx"))
        .collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE toks (t VARCHAR)")
    con.executemany("INSERT INTO toks VALUES (?)", tokens)
    want = dict(
        con.execute(f"SELECT t, {_soundex_sql('t')} AS sx FROM toks").fetchall()
    )
    assert got == want
    assert len(want[long_token]) == 4


def test_mmd_means_are_unordered_pair_means(spark, sf_dir):
    """ADVICE r5 (the shared-formula bug class): mean_k_aa/mean_k_bb
    reported 2x the within-sample kernel mean, and the oracle shared
    the factor so the differential gate passed. Pin the emitted means
    against an INDEPENDENT pure-Python computation over the same
    first-64-per-label vectors."""
    from distributed_map_reduce_spark.operators.similarity import (
        MMD_GAMMA,
        MMD_N,
    )
    from distributed_map_reduce_spark.registry import all_queries
    from distributed_map_reduce_spark.sources import load_table

    row = all_queries()["similarity_mmd_drift"].fn(spark, sf_dir).collect()[0]

    e = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "label", F.col("embedding").cast("array<double>").alias("v"))
        .collect()
    )

    def sample(label):
        return [
            r["v"] for r in sorted(
                (r for r in e if r["label"] == label), key=lambda r: r["vec_id"]
            )
        ][:MMD_N]

    def k(x, y):
        d2 = sum((a - b) * (a - b) for a, b in zip(x, y))
        return math.exp(-MMD_GAMMA * d2)

    def mean_self(vs):
        pairs = [
            k(vs[i], vs[j]) for i in range(len(vs)) for j in range(i + 1, len(vs))
        ]
        return sum(pairs) / len(pairs)

    a, b = sample(0), sample(1)
    maa, mbb = mean_self(a), mean_self(b)
    mab = sum(k(x, y) for x in a for y in b) / (len(a) * len(b))
    assert abs(row["mean_k_aa"] - maa) < 1e-5
    assert abs(row["mean_k_bb"] - mbb) < 1e-5
    assert abs(row["mean_k_ab"] - mab) < 1e-5
    assert abs(row["mmd2"] - (maa + mbb - 2 * mab)) < 1e-5


def test_adaptive_n_planes_formula():
    """The family-wide knob: floors at the historical static value so
    fixture outputs are unchanged, then +1 plane per corpus doubling."""
    from distributed_map_reduce_spark.operators.similarity import (
        adaptive_n_planes,
    )

    assert adaptive_n_planes(0) == 8
    assert adaptive_n_planes(500) == 8
    assert adaptive_n_planes(2000) == 8
    assert adaptive_n_planes(20000) == 9
    assert adaptive_n_planes(40000) == 10
    assert adaptive_n_planes(20000, target=32) == 10
    assert adaptive_n_planes(500, floor=4) == 4
    # doubling the corpus adds exactly one plane once past the floor
    assert adaptive_n_planes(2 * 10**6) == adaptive_n_planes(10**6) + 1


def test_nib_extra_bits_formula():
    """Quantizer sharpening: 0 at fixture scale (driver rows unchanged),
    then ceil(log2(N/500)/4) — 1 at 5k docs, 2 at 50k."""
    from distributed_map_reduce_spark.operators.multimodal import _nib_extra_bits

    assert _nib_extra_bits(0) == 0
    assert _nib_extra_bits(500) == 0
    assert _nib_extra_bits(5000) == 1
    assert _nib_extra_bits(50000) == 2
    assert _nib_extra_bits(8000) == 1  # exact power boundary: log2(16)/4 == 1


def test_integer_fold_money_totals_are_cent_integral(spark, sf_dir):
    """The seven queries the fourth-scale (sf1) gate migrated from
    round(sum(double)) to exact integer-cents folds must emit money
    columns that are EXACT multiples of a cent — the property the fold
    guarantees and the raw-double form only approximates. A regression
    back to a float sum would reintroduce sub-cent residue here (and
    cross-engine drift at sf1) before any driver row could see it."""
    from distributed_map_reduce_spark.registry import all_queries

    qs = all_queries()
    cases = {
        "agg_grouping_sets": "total",
        "agg_grouping_id": "total",
        "q9_product_profit": "profit",
        "udf_runtime_registered": "discounted_total",
        "privacy_pseudonymize_consistent": "total",
    }
    for name, col in cases.items():
        for r in qs[name].fn(spark, sf_dir).select(col).collect():
            v = r[col]
            assert v is not None, (name, col)
            # Exact pin, scale-independent (ADVICE r6 #3): every fold
            # renders as bigint_cents / 100.0, so v must be EXACTLY the
            # correctly-rounded double of integer_cents/100 — i.e. the
            # round-trip v -> round(v*100) -> /100 reproduces v bit-for-
            # bit. A float-sum regression lands hundreds of ulps off the
            # cents/100 double at any magnitude, so this discriminates
            # where the old abs(v*100 - round(v*100)) < 1e-6 tolerance
            # went blind (totals past ~2^40 cents).
            cents = round(v * 100)
            assert v == cents / 100, (name, col, v, cents)
    # the Holt/Kalman input series are whole dollars by construction
    for name in ("temporal_holt_smoothing", "temporal_kalman_local_level"):
        row = qs[name].fn(spark, sf_dir).collect()[0]
        assert row[0] > 0  # n periods — fold ran over a non-empty series
