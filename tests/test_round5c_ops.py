"""Property tests for the late round-5 operator waves (the oracle gate
proves engine parity; these pin the semantic invariants parity can't)."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_map_reduce_spark.registry import all_queries
from distributed_map_reduce_spark.sources import load_table


def test_spearman_bounds_and_direction(spark, sf_dir):
    out = all_queries()["stats_spearman_corr"].fn(spark, sf_dir).collect()
    assert len(out) == 1
    r = out[0]
    assert -1.0 <= r["rho"] <= 1.0
    # order value and total quantity are strongly positively associated
    assert r["rho"] > 0.5
    assert r["significant"] == 1
    assert r["n_orders"] > 100


def test_spearman_matches_python_recompute(spark, sf_dir):
    """rho must match a direct Python rank-and-corr on the same pairs."""
    r = all_queries()["stats_spearman_corr"].fn(spark, sf_dir).collect()[0]
    li = load_table(spark, sf_dir, "lineitem")
    pairs = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1.0 - F.col("l_discount")) * 100
                )
            )
            .cast("bigint")
            .alias("x"),
            F.sum("l_quantity").cast("bigint").alias("y"),
        )
        .collect()
    )

    def avg_ranks(vals):
        pos = {}
        for i, v in enumerate(sorted(vals), 1):
            pos.setdefault(v, []).append(i)
        return {v: sum(ps) / len(ps) for v, ps in pos.items()}

    xs = [p["x"] for p in pairs]
    ys = [p["y"] for p in pairs]
    rx_map, ry_map = avg_ranks(xs), avg_ranks(ys)
    rx = [rx_map[v] for v in xs]
    ry = [ry_map[v] for v in ys]
    n = len(pairs)
    mx, my = sum(rx) / n, sum(ry) / n
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    den = (
        sum((a - mx) ** 2 for a in rx) * sum((b - my) ** 2 for b in ry)
    ) ** 0.5
    assert abs(r["rho"] - num / den) < 1e-4


def test_ljung_box_monotone_q_and_consistent_flags(spark, sf_dir):
    out = sorted(
        all_queries()["stats_ljung_box"].fn(spark, sf_dir).collect(),
        key=lambda r: r["k"],
    )
    assert [r["k"] for r in out] == [1, 2, 3, 4, 5]
    qs = [r["q_stat"] for r in out]
    # Q is a cumulative sum of non-negative terms
    assert all(b >= a - 1e-9 for a, b in zip(qs, qs[1:]))
    assert all(q >= 0 for q in qs)
    assert all(-1.0 <= r["acf"] <= 1.0 for r in out)
    crit = {1: 3.841, 2: 5.991, 3: 7.815, 4: 9.488, 5: 11.07}
    for r in out:
        assert r["significant"] == int(r["q_stat"] > crit[r["k"]])


def test_jarque_bera_rejects_uniform_quantity(spark, sf_dir):
    out = all_queries()["stats_jarque_bera"].fn(spark, sf_dir).collect()
    assert len(out) == 1
    r = out[0]
    # l_quantity is uniform on 1..50: near-zero skew, platykurtic
    assert abs(r["skewness"]) < 0.2
    assert -1.5 < r["excess_kurtosis"] < -0.8
    assert r["jb_stat"] > 5.991 and r["significant"] == 1
